"""Deduplication operators: exact, shingle-set, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale shapes (ray_guide.md "Aggregation at scale" / SURVEY.md §2.5):

- exact dedup: hash column added in a vectorized ``map_batches``, then
  ``groupby(hash)`` aggregate (Min doc_id + Count) — one shuffle of tiny
  (hash, id) pairs, never the payload.
- MinHash+LSH: per-batch shingle→minhash signatures (map), explode to
  (band, band_hash, doc_id) rows, ``groupby(band_hash)`` → candidate pairs →
  exact Jaccard verification with an integer threshold test
  (``2*|A∩B| >= |A∪B|`` ⇔ J ≥ 0.5 — exact, no float compare).
- SimHash: 32-bit signature from md5-derived feature bits (md5 keeps the SQL
  oracle bit-identical; swap in a faster 64-bit hash at production scale —
  the pipeline shape is unchanged).
- Embedding near-dup: label-blocked pairwise cosine (blocking keeps the
  pairing quadratic only within a block).

Hashes are md5-based so every step is replicable in DuckDB SQL.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import ENGLISH_STOP_WORDS
from .text import normalize

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

_SHINGLE_CTES = """
norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t FROM documents
),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, greatest(length(t) - {K} + 1, 1))) AS i
  FROM norm WHERE t <> ''
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN length(t) <= {K} THEN t ELSE substr(t, i, {K}) END AS sh
  FROM pos
)"""

SHINGLE_K = 8
N_PERM = 32
BAND_R = 4  # minhashes per band → N_PERM/BAND_R bands (b=8, r=4: s* ≈ 0.59)
JACCARD_NUM = 1  # threshold J >= 1/2 as integer test: 2*inter >= union


def _docs(sf_dir: str):
    # every dedup consumer reads exactly (doc_id, text) — prune at the read
    from .io import sized_read

    return sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(sf_dir: str) -> pa.Table:
    """(content_md5, kept_doc_id, group_size): first (min doc_id) per exact
    content hash — `updateDocument`-by-unique-key analog (SURVEY.md §2.5)."""
    import ray.data
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "content_md5": pa.array(h, pa.string()),
                "doc_id": batch["doc_id"].cast(pa.int64()),
            }
        )

    ds = _docs(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    out = ds.groupby("content_md5").aggregate(
        Min("doc_id", alias_name="kept_doc_id"), Count(alias_name="group_size")
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "content_md5": tbl["content_md5"].cast(pa.string()),
            "kept_doc_id": tbl["kept_doc_id"].cast(pa.int64()),
            "group_size": tbl["group_size"].cast(pa.int64()),
        }
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_md5, CAST(min(doc_id) AS BIGINT) AS kept_doc_id,
       CAST(count(*) AS BIGINT) AS group_size
FROM documents GROUP BY md5(text) ORDER BY kept_doc_id
"""


# ---------------------------------------------------------------------------
# shingles (shared by shingle-set dedup + minhash)
# ---------------------------------------------------------------------------


def _shingles(text: str) -> set[str]:
    t = normalize(text)
    if len(t) <= SHINGLE_K:
        return {t} if t else set()
    return {t[i : i + SHINGLE_K] for i in range(len(t) - SHINGLE_K + 1)}


def dedup_shingle_set(sf_dir: str) -> pa.Table:
    """(set_md5, kept_doc_id, group_size): docs with the identical distinct
    shingle SET — order/whitespace-insensitive near-exact dedup."""
    import ray.data
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        hs = []
        for t in batch["text"].to_pylist():
            sh = sorted(_shingles(t or ""))
            hs.append(hashlib.md5("|".join(sh).encode("utf-8")).hexdigest())
        return pa.table(
            {
                "set_md5": pa.array(hs, pa.string()),
                "doc_id": batch["doc_id"].cast(pa.int64()),
            }
        )

    ds = _docs(sf_dir).map_batches(add_hash, batch_format="pyarrow")
    out = ds.groupby("set_md5").aggregate(
        Min("doc_id", alias_name="kept_doc_id"), Count(alias_name="group_size")
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "set_md5": tbl["set_md5"].cast(pa.string()),
            "kept_doc_id": tbl["kept_doc_id"].cast(pa.int64()),
            "group_size": tbl["group_size"].cast(pa.int64()),
        }
    )


SQL_DEDUP_SHINGLE_SET = f"""
WITH {_SHINGLE_CTES.format(K=SHINGLE_K)},
sets AS (
  SELECT doc_id, md5(string_agg(sh, '|' ORDER BY sh)) AS set_md5 FROM sh GROUP BY doc_id
)
SELECT set_md5, CAST(min(doc_id) AS BIGINT) AS kept_doc_id, CAST(count(*) AS BIGINT) AS group_size
FROM sets GROUP BY set_md5 ORDER BY kept_doc_id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup pairs
# ---------------------------------------------------------------------------
#
# Vectorized MinHash (Broder 1997): each shingle is hashed ONCE to a 32-bit
# polynomial value (one numpy pass over the codepoints), then all N_PERM
# multiply-shift permutations run as a single (N_PERM × n_shingles) uint64 op
# — no per-(perm, shingle) Python hashing (the round-1 scale-killer). All
# constants are integer literals injected into the DuckDB oracle verbatim, so
# both sides stay bit-identical.

_P = 4294967291  # largest prime < 2^32: products stay < 2^64 (uint64-exact)
_B_BASE = 1000003
_PW = np.array([pow(_B_BASE, j, _P) for j in range(SHINGLE_K)], dtype=np.uint64)
_PERM_A = np.array([(2654435761 * (p + 1)) % _P for p in range(N_PERM)], dtype=np.uint64)
_PERM_B = np.array([(2246822519 * (p + 1)) % _P for p in range(N_PERM)], dtype=np.uint64)


def shingle_hashes(t: str) -> np.ndarray:
    """uint64 hashes of every K-char shingle of (already normalized) ``t``:
    h = Σ_j codepoint(s_j)·B^j mod P. One vectorized pass; multiset (min is
    set-insensitive). Short texts (≤K chars) hash as a single whole-string
    shingle, matching the SQL shingle CTE."""
    if not t:
        return np.empty(0, dtype=np.uint64)
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    L = len(cp)
    if L <= SHINGLE_K:
        return np.array([int((cp * _PW[:L]).sum() % _P)], dtype=np.uint64)
    n = L - SHINGLE_K + 1
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(SHINGLE_K):
        acc += cp[j : j + n] * _PW[j]
    return acc % _P


def minhash_signature(h: np.ndarray) -> np.ndarray:
    """N_PERM multiply-shift minima over the shingle hashes → uint64[N_PERM]."""
    v = (_PERM_A[:, None] * h[None, :] + _PERM_B[:, None]) % _P
    return v.min(axis=1)


def batch_signatures(hash_arrays: list[np.ndarray]) -> np.ndarray:
    """Signatures for a whole batch in N_PERM vectorized passes over the
    concatenated shingle hashes (per-perm ``minimum.reduceat`` segment
    minima) — no per-doc temporaries. → uint64[(n_docs, N_PERM)]."""
    if not hash_arrays:
        return np.empty((0, N_PERM), dtype=np.uint64)
    H = np.concatenate(hash_arrays)
    offs = np.zeros(len(hash_arrays), dtype=np.int64)
    np.cumsum([len(a) for a in hash_arrays[:-1]], out=offs[1:])
    out = np.empty((len(hash_arrays), N_PERM), dtype=np.uint64)
    for p in range(N_PERM):
        v = (_PERM_A[p] * H + _PERM_B[p]) % _P
        out[:, p] = np.minimum.reduceat(v, offs)
    return out


def _shingle_u8(t: str) -> np.ndarray:
    """Normalized text → unique shingles as a sorted ``<U8`` numpy array
    (fixed-width exact strings; K == 8 chars == one U8 slot)."""
    if not t:
        return np.empty(0, dtype="<U8")
    if len(t) <= SHINGLE_K:
        return np.array([t], dtype="<U8")
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    win = np.lib.stride_tricks.sliding_window_view(cp, SHINGLE_K)
    return np.unique(np.ascontiguousarray(win).view("<U8").reshape(-1))


_BAND_COLS = [f"h{j}" for j in range(BAND_R)]


#: cap on DISTINCT-text members of one LSH bucket entering the self-join —
#: a safety valve against adversarial near-identical (but not identical)
#: boilerplate; over-cap buckets are dropped WITH A LOGGED COUNT (no silent
#: caps). Exact duplicates never hit this: they collapse to one
#: representative before banding.
MAX_BUCKET_REPS = 2048

#: stats of the most recent minhash_lsh_pairs run (for tests / observability)
LAST_RUN_STATS: dict = {}


def minhash_lsh_pairs(sf_dir: str,
                      max_bucket_reps: int = MAX_BUCKET_REPS) -> pa.Table:
    """(doc_a, doc_b): LSH candidates (equal band signature) verified at exact
    Jaccard >= 0.5 via the integer test 2*inter >= union.

    Scale shape — every corpus-sized stage distributed, quadratic bucket
    blow-ups bounded (round-3 review: a mega-bucket of B near-identical docs
    emits B*(B-1)/2 join rows — fatal when 10^6 boilerplate docs share a
    bucket), and the stage count kept minimal (each Ray all-to-all costs
    ~1.5 s of fixed overhead at bench scale — the first cut of the cap spent
    3x wall-time on extra joins/shuffles):

    1. ONE corpus pass -> (doc_id, band, h0..h{r-1}) int rows, with the
       exact-dup key (md5 of normalized text) riding ONLY on each doc's
       band-0 row (one key per doc, not per band row).
    2. exact-dup pre-collapse: ``groupby(key)`` over the band-0 rows finds
       duplicate-text groups; only MULTI-member groups matter and their
       member lists are DUP-VOLUME-sized — strictly smaller than this
       function's own gathered output (every member appears in an output
       pair), so gathering them to the driver / broadcasting the non-rep id
       set via ``ray.put`` introduces no new bound (same class as
       dedup_clusters' union-find; documented). Non-representative dup
       members are dropped from the signature rows by a broadcast-filter
       ``map_batches`` — NO corpus-sized join.
    3. bucket census over the rep-only rows: ``groupby(band, h0..h3)``;
       only OVER-CAP bucket keys (normally zero, adversarially a handful)
       are gathered, logged (no silent caps) and filtered out per batch.
    4. pair-gen: one vectorized SELF-JOIN on the bucket key (Arrow hash
       join; a per-bucket ``map_groups`` costs ~10 ms of Python per group —
       23 s at a few thousand buckets; singleton buckets survive the join
       harmlessly, their lone self-pair dropped by doc_a < doc_b).
    5. cross-band dedup: BLOCK-LOCAL (np.unique per batch); global dedup
       happens on the gathered verified pairs — verification is idempotent,
       so the pair-dedup all-to-all of the first cut is unnecessary (the
       same trick ngram_jaccard_pairs documents).
    6. verify: ``map_batches``; each batch does ONE predicate-pushdown read
       of exactly its candidate docs' texts and the vectorized fixed-width
       Jaccard test — never a driver-side dict of the corpus.
    7. exact-dup expansion on the gathered (dup-volume-sized) results:
       within-group all-pairs + verified-rep-pair x member-list cartesian —
       output-sized work, done in numpy on the driver.
    """
    import logging

    import ray
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    from ray.data.aggregate import Count, Min

    from .io import safe_join

    n_bands = N_PERM // BAND_R
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    key_cols = ["band", *_BAND_COLS]
    LAST_RUN_STATS.clear()
    LAST_RUN_STATS.update(dropped_buckets=0, dropped_rows=0)

    def done(tbl: pa.Table) -> pa.Table:
        _PAIRS_CACHE.clear()
        # cap is part of the identity: a low-cap run must not serve its
        # reduced-recall pairs to a default-cap consumer
        _PAIRS_CACHE[(_pairs_cache_key(sf_dir), max_bucket_reps)] = tbl
        return tbl

    # --- 1. one corpus pass: band rows + band-0 exact-dup key -----------
    def sigs(batch: pa.Table) -> pa.Table:
        ids, hs, keys = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            nt = normalize(t or "")
            if not nt:
                continue  # empty docs join no group and no bucket
            h = shingle_hashes(nt)
            if len(h) == 0:
                continue
            ids.append(d)
            hs.append(h)
            keys.append(hashlib.md5(nt.encode("utf-8")).hexdigest())
        sig = batch_signatures(hs).astype(np.int64)  # (n, N_PERM)
        n = len(ids)
        key_col = np.full(n * n_bands, "", dtype=object)
        key_col[0::n_bands] = keys  # band-0 row carries the doc's key
        cols = {
            "doc_id": pa.array(np.repeat(np.asarray(ids, dtype=np.int64), n_bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int64), n), pa.int64()),
        }
        for j in range(BAND_R):
            cols[f"h{j}"] = pa.array(sig[:, j::BAND_R].reshape(-1), pa.int64())
        cols["key"] = pa.array(key_col, pa.string())
        return pa.table(cols)

    sig_full = _docs(sf_dir).map_batches(
        sigs, batch_format="pyarrow").materialize()  # reused 3x
    if sig_full.count() == 0:
        return done(empty)

    # --- 2. exact-dup groups over the band-0 rows ------------------------
    def band0(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["band"], 0)).select(
            ["doc_id", "key"])

    reps = sig_full.map_batches(band0, batch_format="pyarrow").groupby(
        "key").aggregate(Min("doc_id", alias_name="rep"),
                         Count(alias_name="gsize"))
    multi_batches = [
        b for b in reps.map_batches(
            lambda b: b.filter(pc.greater_equal(b["gsize"], 2)),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    bmap: dict[str, int] = {}  # key -> rep, MULTI groups only (dup-group-#)
    for b in multi_batches:
        bmap.update(zip(b["key"].to_pylist(), b["rep"].to_pylist()))

    groups: dict[int, np.ndarray] = {}  # rep -> sorted member ids
    sig_f = sig_full
    if bmap:
        bmap_ref = ray.put(bmap)

        def multi_members(batch: pa.Table) -> pa.Table:
            bm = ray.get(bmap_ref)
            t = batch.filter(pc.equal(batch["band"], 0))
            sel = [i for i, k in enumerate(t["key"].to_pylist()) if k in bm]
            t = t.take(pa.array(sel, pa.int64()))
            return pa.table({
                "doc_id": t["doc_id"].cast(pa.int64()),
                "rep": pa.array([bm[k] for k in t["key"].to_pylist()],
                                pa.int64()),
            })

        memb_batches = [
            b for b in sig_full.map_batches(
                multi_members, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow") if b.num_rows
        ]  # dup-volume-sized gather (bounded by this function's own output)
        memb = pa.concat_tables(memb_batches)
        m_doc = memb["doc_id"].to_numpy().astype(np.int64)
        m_rep = memb["rep"].to_numpy().astype(np.int64)
        for r in np.unique(m_rep):
            groups[int(r)] = np.sort(m_doc[m_rep == r])
        nonrep_ref = ray.put(np.sort(m_doc[m_doc != m_rep]))

        def rep_only(batch: pa.Table) -> pa.Table:
            nr = ray.get(nonrep_ref)
            ids = batch["doc_id"].to_numpy()
            return batch.filter(pa.array(~np.isin(ids, nr)))

        sig_f = sig_full.map_batches(rep_only, batch_format="pyarrow")

    # --- 3. bucket census -> over-cap keys only (normally zero) ----------
    counts = sig_f.groupby(key_cols).count()
    over_batches = [
        b for b in counts.map_batches(
            lambda b: b.filter(pc.greater(b["count()"], max_bucket_reps)),
            batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    if over_batches:
        over_tbl = pa.concat_tables(over_batches)
        dropped_rows = int(pc.sum(over_tbl["count()"]).as_py() or 0)
        LAST_RUN_STATS.update(dropped_buckets=over_tbl.num_rows,
                              dropped_rows=dropped_rows)
        logging.getLogger(__name__).warning(
            "minhash_lsh_pairs: dropped %d over-cap LSH buckets "
            "(%d rep rows > max_bucket_reps=%d) — candidate recall is "
            "reduced for those buckets",
            over_tbl.num_rows, dropped_rows, max_bucket_reps)
        over_keys = over_tbl.select(key_cols)
        over_ref = ray.put(over_keys)

        def drop_over(batch: pa.Table) -> pa.Table:
            ov = ray.get(over_ref)
            keep = np.ones(batch.num_rows, dtype=bool)
            band = batch["band"].to_numpy()
            hv = [batch[c].to_numpy() for c in _BAND_COLS]
            for i in range(ov.num_rows):  # exact tuple match per over-cap key
                m = band == ov["band"][i].as_py()
                for c, col in zip(_BAND_COLS, hv):
                    m &= col == ov[c][i].as_py()
                keep &= ~m
            return batch.filter(pa.array(keep))

        sig_f = sig_f.map_batches(drop_over, batch_format="pyarrow")

    def drop_key(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", *key_cols])

    sig_j = sig_f.map_batches(
        drop_key, batch_format="pyarrow").materialize()  # both join sides

    # --- 4-6. self-join -> block-local dedup -> verify -------------------
    def ordered(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less(batch["doc_id"], batch["doc_id_r"]))
        a = t["doc_id"].to_numpy().astype(np.int64)
        b = t["doc_id_r"].to_numpy().astype(np.int64)
        uniq = np.unique(np.stack([a, b], axis=1), axis=0) if len(a) else \
            np.empty((0, 2), dtype=np.int64)  # block-local dedup
        return pa.table({"doc_a": pa.array(uniq[:, 0], pa.int64()),
                         "doc_b": pa.array(uniq[:, 1], pa.int64())})

    doc_path = f"{sf_dir}/documents.parquet"

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        a = batch["doc_a"].to_numpy().astype(np.int64)
        b = batch["doc_b"].to_numpy().astype(np.int64)
        cand = np.unique(np.concatenate([a, b])).tolist()
        docs = pads.dataset(doc_path).to_table(
            columns=["doc_id", "text"], filter=pc.field("doc_id").isin(cand)
        )
        sh_of = {
            int(d): _shingle_u8(normalize(t or ""))
            for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        }
        keep_a, keep_b = [], []
        for x, y in zip(a, b):
            A, B = sh_of[int(x)], sh_of[int(y)]
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            if union and 2 * inter >= union:
                keep_a.append(int(x))
                keep_b.append(int(y))
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(keep_a, dtype=np.int64), pa.int64()),
                "doc_b": pa.array(np.asarray(keep_b, dtype=np.int64), pa.int64()),
            }
        )

    paired = safe_join(sig_j, sig_j, "inner", num_partitions=8,
                       on=tuple(key_cols), left_suffix="", right_suffix="_r")
    va = np.empty(0, dtype=np.int64)
    vb = np.empty(0, dtype=np.int64)
    if paired is not None:
        verified = paired.map_batches(
            ordered, batch_format="pyarrow").map_batches(
            verify, batch_format="pyarrow")
        vparts = [b for b in verified.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
        if vparts:
            vt = pa.concat_tables(vparts)
            pairs2 = np.unique(np.stack(  # global cross-block dedup
                [vt["doc_a"].to_numpy().astype(np.int64),
                 vt["doc_b"].to_numpy().astype(np.int64)], axis=1), axis=0)
            va, vb = pairs2[:, 0], pairs2[:, 1]

    # --- 7. exact-dup expansion (output-sized, driver numpy) -------------
    out_a, out_b = [], []
    if groups:
        multi_reps = np.fromiter(groups.keys(), dtype=np.int64,
                                 count=len(groups))
        has_multi = np.isin(va, multi_reps) | np.isin(vb, multi_reps)
        out_a.append(va[~has_multi])
        out_b.append(vb[~has_multi])
        for x, y in zip(va[has_multi], vb[has_multi]):
            A = groups.get(int(x), np.array([x], dtype=np.int64))
            B = groups.get(int(y), np.array([y], dtype=np.int64))
            ga = np.repeat(A, len(B))
            gb = np.tile(B, len(A))
            out_a.append(np.minimum(ga, gb))
            out_b.append(np.maximum(ga, gb))
        for mem in groups.values():  # within-group all-pairs (Jaccard 1)
            iu, ju = np.triu_indices(len(mem), k=1)
            out_a.append(mem[iu])
            out_b.append(mem[ju])
    else:
        out_a.append(va)
        out_b.append(vb)
    a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    order = np.lexsort((b, a))
    return done(pa.table({"doc_a": pa.array(a[order], pa.int64()),
                          "doc_b": pa.array(b[order], pa.int64())}))


def ngram_jaccard_pairs(sf_dir: str) -> pa.Table:
    """(doc_a, doc_b): ALL pairs with exact word-trigram Jaccard ≥ 0.5 — no
    LSH approximation — via PREFIX FILTERING (Bayardo, Ma & Srikant,
    "Scaling Up All Pairs Similarity Search", WWW 2007): under ANY global
    total order of the gram universe, two sets with J ≥ t must share an
    element among each set's first ``|x| − ⌈t·|x|⌉ + 1`` elements, so
    candidate generation joins only those prefixes.

    Grams are WORD n-grams (NGRAM_W=3), the document-dedup convention
    (Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" §4.2 uses word n-gram Jaccard for NearDup) — word grams are
    far more discriminative than this module's char-8 shingles, which is
    what makes prefix filtering effective: on the sf0.1 corpus char-8
    shingles give a 13k vocab shared by every doc (prefix join fan-out
    128M rows, 8.8M candidate pairs ≈ all-pairs), word trigrams a 27k
    vocab with max df 25 (fan-out ~1M, candidates ≈ true near-dups).

    Scale shape (all distributed, same machinery as minhash_lsh_pairs):
    1. df pass: explode per-doc DISTINCT gram hashes → ``groupby(h).count``
       — the global document frequency of every gram (tiny integer rows
       through the shuffle).
    2. per-batch prefix emit: each doc's grams sort by (df, hash)
       ascending — the canonical order MUST be df-ascending for pruning:
       rare grams land in prefixes, so join fan-out collapses to the true
       near-dup clusters instead of df² per boilerplate gram. The df table
       broadcasts via ``ray.put`` as two sorted numpy arrays (vocab-sized —
       fine per node; at 10⁹ docs this becomes a distributed join of the
       explode against the df table + a per-doc rank, same algebra).
    3. candidate pairs: ONE hash self-join on the prefix gram hash +
       doc_a < doc_b filter + BLOCK-LOCAL dedup (no global pair shuffle —
       cross-block duplicates are removed after the verify gather, since
       verification is idempotent per pair).
    4. verify: per-batch predicate-pushdown read of ONLY candidate docs,
       exact gram-set Jaccard with the integer test 2·|A∩B| ≥ |A∪B|.
    The (df, hash) prefix order here and the oracle's brute-force full
    join produce DIFFERENT candidate supersets, but the prefix theorem
    guarantees ours contains every true pair — verified outputs match."""
    import ray
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    def explode(batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            gh = _word_gram_hashes(normalize(t or ""))
            if len(gh) == 0:
                continue
            ids.append(np.full(len(gh), d, dtype=np.int64))
            hs.append(gh)
        if not ids:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({
            "h": pa.array(np.concatenate(hs), pa.int64()),
            "doc_id": pa.array(np.concatenate(ids), pa.int64()),
        })

    df_tbl = pa.concat_tables(
        _docs(sf_dir).map_batches(explode, batch_format="pyarrow")
        .groupby("h").count()
        .iter_batches(batch_format="pyarrow")
    )
    vocab = df_tbl["h"].to_numpy().astype(np.int64)
    vorder = np.argsort(vocab)
    df_ref = ray.put((vocab[vorder],
                      df_tbl["count()"].to_numpy().astype(np.int64)[vorder]))

    def prefix_explode(batch: pa.Table) -> pa.Table:
        vh, vdf = ray.get(df_ref)
        ids, hs = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            gh = _word_gram_hashes(normalize(t or ""))
            n = len(gh)
            if n == 0:
                continue
            dfs = vdf[np.searchsorted(vh, gh)]
            p = n - int(np.ceil(0.5 * n)) + 1
            pre = gh[np.lexsort((gh, dfs))[:p]]
            ids.append(np.full(len(pre), d, dtype=np.int64))
            hs.append(pre)
        if not ids:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        return pa.table({
            "h": pa.array(np.concatenate(hs), pa.int64()),
            "doc_id": pa.array(np.concatenate(ids), pa.int64()),
        })

    pre_ds = _docs(sf_dir).map_batches(
        prefix_explode, batch_format="pyarrow").materialize()
    paired = pre_ds.join(
        pre_ds, "inner", num_partitions=8, on=("h",),
        left_suffix="", right_suffix="_r",
    )

    def ordered(batch: pa.Table) -> pa.Table:
        # order + BLOCK-LOCAL dedup (pairs sharing several prefix grams
        # repeat inside a join partition); cross-block duplicates survive
        # and are removed after the verify gather — verification is
        # idempotent per pair, so no global pair shuffle is needed
        m = pc.less(batch["doc_id"], batch["doc_id_r"])
        t = batch.filter(m)
        t = pa.table({
            "doc_a": t["doc_id"].cast(pa.int64()),
            "doc_b": t["doc_id_r"].cast(pa.int64()),
        })
        return pa.TableGroupBy(t, ["doc_a", "doc_b"]).aggregate([])

    uniq = paired.map_batches(ordered, batch_format="pyarrow")

    doc_path = f"{sf_dir}/documents.parquet"
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})

    def verify(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        a = batch["doc_a"].to_numpy().astype(np.int64)
        b = batch["doc_b"].to_numpy().astype(np.int64)
        cand = np.unique(np.concatenate([a, b])).tolist()
        docs = pads.dataset(doc_path).to_table(
            columns=["doc_id", "text"], filter=pc.field("doc_id").isin(cand)
        )
        gh_of = {
            int(d): _word_gram_hashes(normalize(t or ""))
            for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        }
        keep_a, keep_b = [], []
        for x, y in zip(a, b):
            A, B = gh_of[int(x)], gh_of[int(y)]
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            if union and 2 * inter >= union:
                keep_a.append(int(x))
                keep_b.append(int(y))
        return pa.table({
            "doc_a": pa.array(np.asarray(keep_a, dtype=np.int64), pa.int64()),
            "doc_b": pa.array(np.asarray(keep_b, dtype=np.int64), pa.int64()),
        })

    verified = uniq.select_columns(["doc_a", "doc_b"]).map_batches(
        verify, batch_format="pyarrow")
    tbl = pa.concat_tables([empty, *verified.iter_batches(batch_format="pyarrow")])
    # drop cross-block duplicate pairs, then sort (verified set is small)
    tbl = pa.TableGroupBy(tbl, ["doc_a", "doc_b"]).aggregate([])
    order = np.lexsort((tbl["doc_b"].to_numpy(), tbl["doc_a"].to_numpy()))
    return tbl.take(order)


NGRAM_W = 3  # word n-gram width for ngram_jaccard_pairs


def _word_gram_hashes(t: str) -> np.ndarray:
    """Sorted distinct md5-derived 63-bit hashes of word NGRAM_W-grams of
    already-normalized text; texts shorter than NGRAM_W words hash as one
    whole-text gram (mirrors the char-shingle convention and the oracle)."""
    if not t:
        return np.empty(0, dtype=np.int64)
    ws = t.split(" ")
    if len(ws) <= NGRAM_W:
        grams = {" ".join(ws)}
    else:
        grams = {" ".join(ws[i:i + NGRAM_W]) for i in range(len(ws) - NGRAM_W + 1)}
    return np.unique(np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big") >> 1
         for g in grams),
        dtype=np.int64, count=len(grams)))


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
),
words AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm WHERE t <> ''),
grams AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(ws) <= {{W}} THEN array_to_string(ws, ' ')
              ELSE array_to_string(ws[i:i + {{W}} - 1], ' ') END AS g
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws) - {{W}} + 1, 1))) AS i
        FROM words)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT CAST(n.doc_a AS BIGINT) AS doc_a, CAST(n.doc_b AS BIGINT) AS doc_b
FROM inter n
JOIN sizes sa ON sa.doc_id = n.doc_a
JOIN sizes sb ON sb.doc_id = n.doc_b
WHERE 2 * n.i >= sa.sz + sb.sz - n.i
ORDER BY doc_a, doc_b
""".replace("{W}", str(3))



# per-process verified-pairs cache (single entry): documents.parquet is
# immutable per sf_dir, and dedup_clusters re-derives the same pair set —
# keyed by (path, mtime, size) like the reader caches
_PAIRS_CACHE: dict = {}


def _pairs_cache_key(sf_dir: str):
    import os

    st = os.stat(f"{sf_dir}/documents.parquet")
    return (sf_dir, st.st_mtime_ns, st.st_size)


def minhash_lsh_pairs_cached(sf_dir: str) -> pa.Table:
    # only a DEFAULT-cap run can satisfy the cache — a low-cap run's
    # reduced-recall pairs must never be served here
    hit = _PAIRS_CACHE.get((_pairs_cache_key(sf_dir), MAX_BUCKET_REPS))
    return hit if hit is not None else minhash_lsh_pairs(sf_dir)


# h = Σ_j unicode(sh[j])·B^j mod P — same polynomial as shingle_hashes;
# per-term products < 2^53 so BIGINT suffices, the permutation product needs
# HUGEINT (operands < 2^32 → product < 2^64)
_SH_HASH_SQL = "(" + " + ".join(
    f"CASE WHEN length(sh) >= {j + 1} "
    f"THEN CAST(unicode(substr(sh, {j + 1}, 1)) AS BIGINT) * {int(_PW[j])} ELSE 0 END"
    for j in range(SHINGLE_K)
) + f") % {_P}"

SQL_MINHASH_LSH_PAIRS = f"""
WITH {_SHINGLE_CTES.format(K=SHINGLE_K)},
shh AS (SELECT doc_id, {_SH_HASH_SQL} AS h FROM sh),
mh AS (
  SELECT doc_id, p,
         min((CAST((2654435761 * (p + 1)) % {_P} AS HUGEINT) * h
              + (2246822519 * (p + 1)) % {_P}) % {_P}) AS mh
  FROM shh, (SELECT unnest(generate_series(0, {N_PERM - 1})) AS p) perms
  GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, p // {BAND_R} AS band,
         CAST(max(CASE WHEN p % {BAND_R} = 0 THEN mh END) AS BIGINT) AS h0,
         CAST(max(CASE WHEN p % {BAND_R} = 1 THEN mh END) AS BIGINT) AS h1,
         CAST(max(CASE WHEN p % {BAND_R} = 2 THEN mh END) AS BIGINT) AS h2,
         CAST(max(CASE WHEN p % {BAND_R} = 3 THEN mh END) AS BIGINT) AS h3
  FROM mh GROUP BY doc_id, p // {BAND_R}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.h0 = b.h0 AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c JOIN sh x ON x.doc_id = c.doc_a JOIN sh y ON y.doc_id = c.doc_b AND x.sh = y.sh
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE 2 * i.i >= (sa.n + sb.n - i.i)
ORDER BY doc_a, doc_b
"""

#: same CTE chain, reusable under WITH RECURSIVE for the clusters oracle
_PAIRS_CTES = SQL_MINHASH_LSH_PAIRS.strip()[len("WITH "):].rsplit("SELECT i.doc_a, i.doc_b", 1)[0].rstrip().rstrip(",")
_PAIRS_SELECT = (
    "SELECT i.doc_a, i.doc_b FROM inter i "
    "JOIN sizes sa ON sa.doc_id = i.doc_a JOIN sizes sb ON sb.doc_id = i.doc_b "
    "WHERE 2 * i.i >= (sa.n + sb.n - i.i)"
)

SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_PAIRS_CTES},
edges AS ({_PAIRS_SELECT}),
nodes AS (SELECT doc_a AS n FROM edges UNION SELECT doc_b FROM edges),
bidir AS (SELECT doc_a AS a, doc_b AS b FROM edges UNION SELECT doc_b, doc_a FROM edges),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, b.b FROM reach r JOIN bidir b ON b.a = r.m
),
rep AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n)
SELECT CAST(r.doc_id AS BIGINT) AS doc_id, CAST(r.cluster_rep AS BIGINT) AS cluster_rep,
       CAST(c.sz AS BIGINT) AS cluster_size
FROM rep r JOIN (SELECT cluster_rep, count(*) AS sz FROM rep GROUP BY cluster_rep) c
  USING (cluster_rep)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(sf_dir: str) -> pa.Table:
    """(doc_id, simhash) — 32-bit SimHash (Charikar 2002) over analyzer
    tokens, tf-weighted: bit b set iff Σ tf·(±1 by md5-bit-b of the token) > 0.

    Vectorized: md5 runs once per DISTINCT term in the batch (dictionary
    encode), the per-doc ±1 vote accumulation is two numpy cumsum/gather ops —
    no per-token Python (round-1 hotspot)."""
    from ..analysis.tokenizer import analyze_batch

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        stats = analyze_batch(batch["text"].to_pylist())
        n = len(batch)
        offsets = np.asarray(stats.offsets, dtype=np.int64)
        sims = np.zeros(n, dtype=np.int64)
        if offsets[-1] > 0:
            dict_arr = pc.dictionary_encode(stats.terms)
            if isinstance(dict_arr, pa.ChunkedArray):
                dict_arr = dict_arr.combine_chunks()
            codes = dict_arr.indices.to_numpy().astype(np.int64)
            uniq = dict_arr.dictionary.to_pylist()
            h32 = np.array(
                [int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8], 16) for u in uniq],
                dtype=np.int64,
            )
            contrib = 2 * ((h32[:, None] >> np.arange(32)) & 1) - 1  # (U, 32) ±1
            tfs = np.asarray(stats.tfs, dtype=np.int64)
            per_tok = contrib[codes] * tfs[:, None]  # (T, 32)
            cs = np.vstack([np.zeros((1, 32), dtype=np.int64), np.cumsum(per_tok, axis=0)])
            votes = cs[offsets[1:]] - cs[offsets[:-1]]  # (n, 32) segment sums
            sims = ((votes > 0).astype(np.int64) << np.arange(32)).sum(axis=1)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "simhash": pa.array(sims, pa.int64()),
            }
        )

    import ray.data

    ds = _docs(sf_dir).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


SQL_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
kept AS (SELECT doc_id, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({_STOPLIST_SQL})),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM kept GROUP BY doc_id, tok),
hashed AS (
  SELECT doc_id, tok, tf,
         (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 268435456
       + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16777216
       + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 1048576
       + (strpos('0123456789abcdef', substr(md5(tok), 4, 1)) - 1) * 65536
       + (strpos('0123456789abcdef', substr(md5(tok), 5, 1)) - 1) * 4096
       + (strpos('0123456789abcdef', substr(md5(tok), 6, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(tok), 7, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(tok), 8, 1)) - 1) AS h32
  FROM tf
),
votes AS (
  SELECT doc_id, b.b AS bit,
         sum(tf * (2 * ((h32 >> b.b) & 1) - 1)) AS v
  FROM hashed, (SELECT unnest(generate_series(0, 31)) AS b) b
  GROUP BY doc_id, b.b
)
SELECT d.doc_id,
       CAST(coalesce(sum(CASE WHEN v.v > 0 THEN 1 << v.bit ELSE 0 END), 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
GROUP BY d.doc_id ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (label-blocked)
# ---------------------------------------------------------------------------

COSINE_DUP_TAU = 0.95


def embed_dup_pairs(sf_dir: str) -> pa.Table:
    """(vec_a, vec_b): same-label pairs with cosine ≥ 0.95. Blocking by label
    bounds the quadratic join; per-block work is one numpy matmul."""
    import ray.data

    from .io import sized_read

    ds = sized_read(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding", "label"])

    TILE = 2048  # bounds the sims matrix to TILE x TILE regardless of label size

    def block_pairs(group: pa.Table) -> pa.Table:
        from ..util.vectors import vec_matrix

        ids = group["vec_id"].to_numpy()
        mat = vec_matrix(group["embedding"])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n = len(ids)
        out_a, out_b = [], []
        # tiled upper-triangle scan: memory O(TILE^2), works for hot labels
        # (one label = one map_groups task; sub-blocking caps the matmul)
        for i0 in range(0, n, TILE):
            a_blk = mat[i0 : i0 + TILE]
            for j0 in range(i0, n, TILE):
                sims = a_blk @ mat[j0 : j0 + TILE].T
                ai, bi = np.nonzero(sims >= COSINE_DUP_TAU)
                gi, gj = ai + i0, bi + j0
                keep = gi < gj  # strict upper triangle in global index space
                gi, gj = gi[keep], gj[keep]
                a, b = ids[gi], ids[gj]
                out_a.append(np.minimum(a, b))
                out_b.append(np.maximum(a, b))
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        return pa.table({"vec_a": pa.array(a, pa.int64()), "vec_b": pa.array(b, pa.int64())})

    out = ds.groupby("label").map_groups(block_pairs, batch_format="pyarrow")
    empty = pa.table({"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())})
    tbl = pa.concat_tables([empty, *out.iter_batches(batch_format="pyarrow")])
    return tbl.sort_by([("vec_a", "ascending"), ("vec_b", "ascending")])


SQL_EMBED_DUP_PAIRS = f"""
SELECT CAST(a.vec_id AS BIGINT) AS vec_a, CAST(b.vec_id AS BIGINT) AS vec_b
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_DUP_TAU}
ORDER BY vec_a, vec_b
"""


def dedup_clusters(sf_dir: str) -> pa.Table:
    """(doc_id, cluster_rep, cluster_size) — connected components over the
    verified MinHash near-dup pairs; rep = min doc id in the component (the
    doc a dedup pass would keep).

    Scale shape: the pair set is ≪ corpus (near-dup rarity — the same
    assumption the pair generator documents), so union-find runs where the
    pairs land. At 100 TB this becomes iterated min-label propagation over a
    hash-partitioned edge list; the pair volume, not the corpus, bounds it."""
    pairs = minhash_lsh_pairs_cached(sf_dir)
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by min id so the root IS the representative
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    reps = [find(n) for n in nodes]
    from collections import Counter

    sizes = Counter(reps)
    return pa.table({
        "doc_id": pa.array(nodes, pa.int64()),
        "cluster_rep": pa.array(reps, pa.int64()),
        "cluster_size": pa.array([sizes[r] for r in reps], pa.int64()),
    })


def dedup_keep_best(sf_dir: str) -> pa.Table:
    """(cluster_rep, kept_doc_id, cluster_size, n_chars) — canonical-document
    selection: per near-dup cluster, keep the highest-quality member
    (max n_chars, ties → min doc_id). The standard training-data dedup step
    after clustering: drop every member except the kept one.

    Scale shape: cluster membership ≪ corpus (same bound as
    dedup_clusters), so the member-quality lookup is a broadcast-filtered
    pruned read — only member rows leave the scan — and the argmax runs on
    the cluster-sized table."""
    import ray
    import pyarrow.compute as pc

    from .io import sized_read

    clusters = dedup_clusters(sf_dir)
    if clusters.num_rows == 0:
        return pa.table({
            "cluster_rep": pa.array([], pa.int64()),
            "kept_doc_id": pa.array([], pa.int64()),
            "cluster_size": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
        })
    bref = ray.put(clusters["doc_id"].cast(pa.int64()).combine_chunks())

    def members_only(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["doc_id"].cast(pa.int64()), value_set=ray.get(bref))
        return batch.filter(m)

    nch = pa.concat_tables(
        sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        .map_batches(members_only, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    df = clusters.to_pandas().merge(nch.to_pandas(), on="doc_id")
    df = df.sort_values(["cluster_rep", "n_chars", "doc_id"],
                        ascending=[True, False, True])
    best = df.groupby("cluster_rep", as_index=False).first()
    return pa.table({
        "cluster_rep": pa.array(best["cluster_rep"].astype("int64"), pa.int64()),
        "kept_doc_id": pa.array(best["doc_id"].astype("int64"), pa.int64()),
        "cluster_size": pa.array(best["cluster_size"].astype("int64"), pa.int64()),
        "n_chars": pa.array(best["n_chars"].astype("int64"), pa.int64()),
    })


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE {_PAIRS_CTES},
edges AS ({_PAIRS_SELECT}),
nodes AS (SELECT doc_a AS n FROM edges UNION SELECT doc_b FROM edges),
bidir AS (SELECT doc_a AS a, doc_b AS b FROM edges UNION SELECT doc_b, doc_a FROM edges),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, b.b FROM reach r JOIN bidir b ON b.a = r.m
),
rep AS (SELECT n AS doc_id, min(m) AS cluster_rep FROM reach GROUP BY n),
scored AS (
  SELECT r.cluster_rep, r.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY r.cluster_rep
                            ORDER BY d.n_chars DESC, r.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY r.cluster_rep) AS sz
  FROM rep r JOIN documents d ON d.doc_id = r.doc_id
)
SELECT CAST(cluster_rep AS BIGINT) AS cluster_rep,
       CAST(doc_id AS BIGINT) AS kept_doc_id,
       CAST(sz AS BIGINT) AS cluster_size,
       CAST(n_chars AS BIGINT) AS n_chars
FROM scored WHERE rn = 1 ORDER BY cluster_rep
"""


# ---------------------------------------------------------------------------
# substring-level dedup (duplicated token windows)
# ---------------------------------------------------------------------------
#
# "Deduplicating Training Data Makes Language Models Better" (Lee et al.
# 2021) removes any substring that occurs verbatim elsewhere in the corpus.
# The suffix-array formulation is replaced by the equivalent fixed-width
# token-window fingerprint pass (their EXACTSUBSTR with windows of
# SUBSTR_W tokens): a window duplicated anywhere in the corpus — another doc
# OR another position of the same doc — marks its position as duplicated.

SUBSTR_W = 8  # tokens per window (Lee et al. use 50 at full scale)


def _substr_tokens(text: str) -> list[str]:
    """Lowercased \\w+ token stream — bit-identical to the oracle's
    ``regexp_extract_all(lower(text), '[\\p{L}\\p{N}_]+')``."""
    from ..analysis.tokenizer import TOKEN_RE

    return TOKEN_RE.findall((text or "").lower())


def _substr_windows(text: str) -> list[str]:
    """md5 fingerprints of every SUBSTR_W-token window (stride 1); docs
    shorter than SUBSTR_W tokens have no windows. Matches the oracle's
    list-slice + md5 CTE.

    The W-token window strings are SLICES of the single space-joined
    token buffer (byte offsets via one cumsum) — one encode + one md5 per
    window over a memoryview, no per-window list-slice + join (the
    per-window join was the dominant dedup_substring cost)."""
    toks = _substr_tokens(text)
    n = len(toks)
    if n < SUBSTR_W:
        return []
    data = " ".join(toks).encode("utf-8")
    lens = np.fromiter((len(t.encode("utf-8")) for t in toks), dtype=np.int64,
                       count=n)
    # byte offset of token i in data: sum(lens[:i]) + i separator spaces
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens + 1, out=off[1:])  # +1 per trailing space
    starts = off[: n - SUBSTR_W + 1]
    ends = off[SUBSTR_W:] - 1  # drop the window's trailing space
    view = memoryview(data)
    return [
        hashlib.md5(view[int(s):int(e)]).hexdigest()
        for s, e in zip(starts, ends)
    ]


def dedup_substring(sf_dir: str) -> pa.Table:
    """(doc_id, n_windows, n_dup_windows): per doc, how many of its token
    windows occur ≥2 times corpus-wide.

    Shape: explode (window_md5, doc_id) pairs and FINALIZE the per-doc
    occurrence counts map-side with an Arrow ``group_by`` inside the same
    batch — every output row of one input doc lives in one batch, so the
    (wh, doc_id) counts are exact with NO shuffle. Then pure aggregates:
    ``groupby(wh).sum`` (corpus-wide group sizes — the single wh-keyed
    shuffle, moving only (hash, doc, count) rows), an inner
    ``Dataset.join`` of occ ⋈ sizes on ``wh`` filtered to size ≥ 2, and a
    final tiny ``groupby(doc_id).sum``. No ``map_groups`` anywhere: a
    Python callable per distinct window (~10⁶ groups at sf0.1, ~10¹² at
    100 TB) was the dominant cost — vectorized aggregate kernels replace
    it wholesale. The per-doc window totals ride a shuffle-free side
    aggregate; the final decoration is a DISTRIBUTED left-outer hash
    join of totals ⟕ dup-counts — the driver only gathers the joined
    result rows (at 100 TB this tail becomes ``write_parquet``; no
    driver-side ``pa.Table.join`` over the corpus anywhere)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def explode_occ(batch: pa.Table) -> pa.Table:
        ids, whs = [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ws = _substr_windows(t)
            ids.extend([did] * len(ws))
            whs.extend(ws)
        w = pa.table(
            {"wh": pa.array(whs, pa.string()), "doc_id": pa.array(ids, pa.int64())}
        )
        # all windows of a doc are batch-local → exact per-doc counts here
        g = pa.TableGroupBy(w, ["wh", "doc_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["wh", "doc_id", "c"])

    occ = _docs(sf_dir).map_batches(explode_occ, batch_format="pyarrow")
    occ = occ.materialize()  # consumed twice: sizes aggregate + join probe
    sizes = occ.groupby("wh").aggregate(Sum("c", alias_name="gsize"))

    def dup_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["gsize"], 2))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "dups": t["c"].cast(pa.int64()),
            }
        )

    dup = (
        occ.join(sizes.materialize(), "inner", num_partitions=8, on=("wh",))
        .map_batches(dup_only, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("dups", alias_name="n_dup_windows"))
    )

    def totals(batch: pa.Table) -> pa.Table:
        # count-only pass: window count is len(tokens)-W+1, no re-hashing
        ns = [
            max(0, len(_substr_tokens(t)) - SUBSTR_W + 1)
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_windows": pa.array(ns, pa.int64()),
            }
        )

    tot = _docs(sf_dir).map_batches(totals, batch_format="pyarrow")
    joined = tot.join(dup, "left_outer", num_partitions=8, on=("doc_id",))
    out_batches = [
        pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n_windows": b["n_windows"].cast(pa.int64()),
                "n_dup_windows": b["n_dup_windows"]
                .combine_chunks().fill_null(0).cast(pa.int64()),
            }
        )
        for b in joined.iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    if not out_batches:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_windows": pa.array([], pa.int64()),
                "n_dup_windows": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(out_batches).sort_by("doc_id")


SQL_DEDUP_SUBSTRING = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS tk
  FROM documents
),
w AS (
  SELECT doc_id, md5(array_to_string(tk[i:i+{SUBSTR_W - 1}], ' ')) AS wh
  FROM toks, unnest(generate_series(1, len(tk) - {SUBSTR_W} + 1)) AS t(i)
  WHERE len(tk) >= {SUBSTR_W}
),
c AS (SELECT wh, count(*) AS n FROM w GROUP BY wh),
per AS (
  SELECT w.doc_id, count(*) AS nw,
         sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS nd
  FROM w JOIN c USING (wh) GROUP BY w.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.nw, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(per.nd, 0) AS BIGINT) AS n_dup_windows
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""
