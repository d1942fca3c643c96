"""Text-analysis operators over the ``documents`` table: token counting,
language ID (stopword-hit heuristic), quality scoring, fingerprinting.

Each entry returns a pyarrow Table matching its ``SQL_*`` oracle exactly.
Ray side: one vectorized ``map_batches`` per entry (analysis is per-row regex
+ numpy/pandas folds; stateless → task pool). Scale shape: all entries are
embarrassingly parallel maps + (for nothing here) no shuffle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analysis.tokenizer import ENGLISH_STOP_WORDS, analyze_batch

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

# pinned to RE2's ASCII \s class ([\t\n\f\r ]) so normalize() stays
# bit-identical to the DuckDB oracles on text containing Unicode whitespace
# (Python's \s would also match U+00A0, U+2028, ... — ADVICE r1)
_WS = re.compile(r"[\t\n\f\r ]+")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "was"),
    "es": ("el", "los", "y", "es", "una", "en", "que", "por", "del", "las"),
    "fr": ("le", "les", "et", "est", "dans", "pour", "ce", "ne", "pas", "vous"),
}


def _docs(sf_dir: str, columns: list | None = None):
    """Documents-table read; pass ``columns=`` at every call site that does
    not tokenize so wide ``text`` bytes never leave the parquet footer —
    especially ahead of a shuffle (pack_greedy / split_assign / sample_mix)."""
    import ray.data

    from .io import sized_read

    return sized_read(f"{sf_dir}/documents.parquet", columns=columns)


def token_count(sf_dir: str) -> pa.Table:
    """(doc_id, n_tokens) with the engine's full analysis chain
    (lower → \\w+ → maxlen 255 → stopwords)."""

    def fn(batch: pa.Table) -> pa.Table:
        stats = analyze_batch(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(stats.field_lens.astype(np.int64), pa.int64()),
            }
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


SQL_TOKEN_COUNT = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
kept AS (SELECT doc_id, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({_STOPLIST_SQL}))
SELECT d.doc_id, CAST(count(k.tok) AS BIGINT) AS n_tokens
FROM documents d LEFT JOIN kept k ON d.doc_id = k.doc_id
GROUP BY d.doc_id ORDER BY d.doc_id
"""


def lang_id(sf_dir: str) -> pa.Table:
    """(doc_id, pred_lang) — argmax of per-language marker-word hits; ties go
    to the lexicographically smallest code; all-zero → 'und'.

    Vectorized (round-1 hotspot was a per-token Python loop): one Arrow
    regex split per batch (``[^\p{L}\p{N}_]+`` complement ≡ ``\w+``
    boundaries), then per-language ``is_in`` masks + ``bincount`` over the
    flat token stream; the argmax over the (langs × docs) count matrix picks
    the first (lexicographically smallest) max."""
    langs = sorted(LANG_MARKERS)
    marker_arrs = {lang: pa.array(sorted(LANG_MARKERS[lang]), pa.string()) for lang in langs}

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        flat, doc_idx = _flat_tokens(batch)
        counts = np.zeros((len(langs), n), dtype=np.int64)
        for i, lang in enumerate(langs):
            m = pc.is_in(flat, value_set=marker_arrs[lang]).to_numpy(zero_copy_only=False)
            counts[i] = np.bincount(doc_idx[m], minlength=n)
        best = np.argmax(counts, axis=0)  # first max → smallest code on ties
        best_c = counts[best, np.arange(n)]
        pred = np.where(best_c > 0, np.asarray(langs, dtype=object)[best], "und")
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "pred_lang": pa.array(pred.tolist(), pa.string()),
            }
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


def _lang_count_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"count(*) FILTER (tok IN ({words}))"


SQL_LANG_ID = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
hits AS (
  SELECT d.doc_id,
         {_lang_count_sql('de')} AS c_de,
         {_lang_count_sql('en')} AS c_en,
         {_lang_count_sql('es')} AS c_es,
         {_lang_count_sql('fr')} AS c_fr
  FROM documents d LEFT JOIN toks t ON d.doc_id = t.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id,
       CASE WHEN c_de > 0 AND c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
            WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_fr THEN 'en'
            WHEN c_es > 0 AND c_es >= c_fr THEN 'es'
            WHEN c_fr > 0 THEN 'fr'
            ELSE 'und' END AS pred_lang
FROM hits ORDER BY doc_id
"""


def quality(sf_dir: str) -> pa.Table:
    """(doc_id, n_chars, n_alpha, n_digit, n_tokens, quality_bucket) —
    integer quality features + a bucketed verdict (threshold rules)."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        n_chars = texts.str.len().to_numpy(dtype=np.int64)
        n_alpha = texts.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
        n_digit = texts.str.count(r"[0-9]").to_numpy(dtype=np.int64)
        stats = analyze_batch(texts.tolist())
        n_tokens = stats.field_lens.astype(np.int64)
        bucket = np.where(
            n_tokens < 5, "too_short",
            np.where(n_alpha * 2 < n_chars, "low_alpha", "ok"),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_alpha": pa.array(n_alpha, pa.int64()),
                "n_digit": pa.array(n_digit, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "quality_bucket": pa.array(bucket.tolist(), pa.string()),
            }
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


SQL_QUALITY = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
kept AS (SELECT doc_id, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({_STOPLIST_SQL})),
tc AS (
  SELECT d.doc_id, count(k.tok) AS n_tokens FROM documents d
  LEFT JOIN kept k ON d.doc_id = k.doc_id GROUP BY d.doc_id
)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       CAST(length(regexp_replace(d.text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
       CAST(tc.n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN tc.n_tokens < 5 THEN 'too_short'
            WHEN length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) * 2 < length(d.text)
              THEN 'low_alpha'
            ELSE 'ok' END AS quality_bucket
FROM documents d JOIN tc ON d.doc_id = tc.doc_id ORDER BY d.doc_id
"""


def normalize(text: str) -> str:
    """Whitespace-collapsed lowercase text (shared with dedup shingling).
    ASCII-whitespace collapse + space-only strip == DuckDB
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))`` exactly."""
    return _WS.sub(" ", (text or "").lower()).strip(" ")


def fingerprint(sf_dir: str) -> pa.Table:
    """(doc_id, fp) — md5 document fingerprint of normalized text."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5(normalize(t).encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "fp": pa.array(fps, pa.string()),
            }
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


SQL_FINGERPRINT = """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents ORDER BY doc_id
"""


_SCRUB_EMAIL = re.compile(r"[A-Za-z0-9_.]+@[A-Za-z0-9_.]+")
_SCRUB_NUM = re.compile(r"[0-9]{6,}")


def scrub(sf_dir: str) -> pa.Table:
    """(doc_id, content_md5, n_masked) — PII-style masking pass (emails →
    ``<EMAIL>`` then long digit runs → ``<NUM>``; ASCII classes so Python and
    RE2 agree). The oracle compares the scrubbed text via md5, so the whole
    transform is verified byte-for-byte."""

    def fn(batch: pa.Table) -> pa.Table:
        out_h, out_n = [], []
        for t in batch["text"].to_pylist():
            t = t or ""
            s1, n1 = _SCRUB_EMAIL.subn("<EMAIL>", t)
            s2, n2 = _SCRUB_NUM.subn("<NUM>", s1)
            out_h.append(hashlib.md5(s2.encode("utf-8")).hexdigest())
            out_n.append(n1 + n2)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "content_md5": pa.array(out_h, pa.string()),
            "n_masked": pa.array(out_n, pa.int64()),
        })

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


SQL_SCRUB = """
SELECT doc_id,
       md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<EMAIL>', 'g'),
                          '[0-9]{6,}', '<NUM>', 'g')) AS content_md5,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+'))
            + len(regexp_extract_all(regexp_replace(text, '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<EMAIL>', 'g'),
                                     '[0-9]{6,}')) AS BIGINT) AS n_masked
FROM documents
"""


SPLIT_PCTS = (80, 10)  # train < 80, valid < 90, else test


def split_assign(sf_dir: str) -> pa.Table:
    """(doc_id, split) — deterministic hash split (train/valid/test by md5
    bucket; reproducible at any parallelism, the standard training-data
    split idiom)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        buckets = [int(hashlib.md5(f"split|{d}".encode()).hexdigest()[:15], 16) % 100
                   for d in ids]
        split = ["train" if b < SPLIT_PCTS[0]
                 else "valid" if b < SPLIT_PCTS[0] + SPLIT_PCTS[1]
                 else "test" for b in buckets]
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "split": pa.array(split, pa.string()),
        })

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


SQL_SPLIT_ASSIGN = """
SELECT doc_id,
       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
FROM (SELECT doc_id,
             CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
      FROM documents)
"""


PACK_CAPACITY = 2000  # chars per packed training sequence


def pack_greedy(sf_dir: str) -> pa.Table:
    """(doc_id, source, bin_id) — greedy sequence packing for training:
    within each source (doc_id order), documents accumulate into bins of
    PACK_CAPACITY chars; overflow starts the next bin. Packing is inherently
    sequential, so the partitioning contract is: sequential WITHIN a source
    group, parallel ACROSS groups (``groupby(source).map_groups``) — at
    100 TB the group key is the shard key."""
    import pandas as pd

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        bins = np.empty(len(g), dtype=np.int64)
        acc, b = 0, 0
        for i, n in enumerate(g["n_chars"].tolist()):
            if acc + n > PACK_CAPACITY and acc > 0:
                b += 1
                acc = n
            else:
                acc += n
            bins[i] = b
        return pd.DataFrame({"doc_id": g["doc_id"].values,
                             "source": g["source"].values, "bin_id": bins})

    # prune to the three packing columns BEFORE the groupby all-to-all —
    # the shuffle must move (doc_id, source, n_chars), never the text bytes
    ds = (
        _docs(sf_dir, columns=["doc_id", "source", "n_chars"])
        .groupby("source")
        .map_groups(pack, batch_format="pandas")
    )
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return pa.table({
        "doc_id": tbl["doc_id"].cast(pa.int64()),
        "source": tbl["source"].cast(pa.string()),
        "bin_id": tbl["bin_id"].cast(pa.int64()),
    })


SQL_PACK_GREEDY = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
st(source, rn, doc_id, acc, bin) AS (
  SELECT source, rn, doc_id, n_chars, 0 FROM d WHERE rn = 1
  UNION ALL
  SELECT d.source, d.rn, d.doc_id,
         CASE WHEN st.acc + d.n_chars > {PACK_CAPACITY} AND st.acc > 0
              THEN d.n_chars ELSE st.acc + d.n_chars END,
         CASE WHEN st.acc + d.n_chars > {PACK_CAPACITY} AND st.acc > 0
              THEN st.bin + 1 ELSE st.bin END
  FROM st JOIN d ON d.source = st.source AND d.rn = st.rn + 1
)
SELECT doc_id, source, CAST(bin AS BIGINT) AS bin_id FROM st
"""


BIGRAM_TOPK = 50


def bigram_stats(sf_dir: str) -> pa.Table:
    """Top-BIGRAM_TOPK corpus bigrams (collocation / n-gram-LM counts) over
    the raw lowercase token stream (stopwords kept — LM counts want them).
    Vectorized: one Arrow regex split per batch, adjacency = (flat[:-1],
    flat[1:]) masked at document boundaries; per-block pair-count partials
    move, the driver merges tiny partials → (w1, w2, n)."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, docs_np = _flat_tokens(batch)
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        # dictionary-encode once: the pair count runs on int codes (the
        # decontaminate trick) — no per-token Python objects in the hot path
        de = pc.dictionary_encode(flat)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy().astype(np.int64)
        vocab = de.dictionary
        V = np.int64(len(vocab))
        same = docs_np[:-1] == docs_np[1:]
        pair = codes[:-1][same] * V + codes[1:][same]
        upair, n = np.unique(pair, return_counts=True)
        return pa.table({
            "w1": pc.take(vocab, pa.array(upair // V, pa.int64())).cast(pa.string()),
            "w2": pc.take(vocab, pa.array(upair % V, pa.int64())).cast(pa.string()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Sum

    # distributed final aggregate + top-k: the per-block pair partials are
    # heavy-tailed (vocabulary²), so summing them on the driver is a 100-TB
    # materialization hazard — the groupby shuffle reduces them where the
    # data is and only BIGRAM_TOPK rows reach the driver (r5; the former
    # driver-side concat+TableGroupBy was the entry's scale smell)
    ds = _docs(sf_dir, columns=["text"]).map_batches(fn, batch_format="pyarrow", batch_size=None)
    top = (
        ds.groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n"))
        .sort(["n", "w1", "w2"], descending=[True, False, False])
        .limit(BIGRAM_TOPK)
    )
    tbl = pa.concat_tables(top.iter_batches(batch_format="pyarrow"))
    return pa.table({
        "w1": tbl["w1"].cast(pa.string()),
        "w2": tbl["w2"].cast(pa.string()),
        "n": tbl["n"].cast(pa.int64()),
    })


SQL_BIGRAM_STATS = f"""
WITH rawt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS toks
  FROM documents
),
tpos AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(toks), 1))) AS i, toks
  FROM rawt WHERE len(toks) > 1
),
pairs AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM tpos WHERE i < len(toks)
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY w1, w2
ORDER BY n DESC, w1 ASC, w2 ASC LIMIT {BIGRAM_TOPK}
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs a broadcast eval set)
# ---------------------------------------------------------------------------

#: n-gram size — the synthetic docs are ~54 tokens, so 3 keeps the overlap
#: non-trivial; real pipelines use 8–13 (the op is N-agnostic)
DECON_N = 3
#: benchmark/eval membership: doc_id % DECON_MOD == 0 (deterministic stand-in
#: for an external eval set — no external data in this sandbox)
DECON_MOD = 97


def _flat_tokens(batch: pa.Table) -> tuple["pa.Array", np.ndarray]:
    """One Arrow regex split over the batch's lowercase text → (flat
    StringArray of nonempty tokens, per-token batch-row indices int64).
    The shared tokenize-flatten step for every raw-token-stream op in this
    module (empty split artifacts removed; offsets re-based for sliced
    columns)."""
    import pyarrow.compute as pc

    arr = batch["text"].combine_chunks()
    n = len(arr)
    low = pc.utf8_lower(pc.fill_null(arr, ""))
    toks = pc.split_pattern_regex(low, pattern=r"[^\p{L}\p{N}_]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.values
    offs = toks.offsets.to_numpy().astype(np.int64)
    if offs[0] != 0 or len(flat) != offs[-1] - offs[0]:
        flat = flat.slice(offs[0], offs[-1] - offs[0])
        offs = offs - offs[0]
    keep = pc.greater(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))[keep_np]
    flat = pc.filter(flat, keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return flat, row_idx


def _batch_ngrams(batch: pa.Table, n_gram: int):
    """(per-gram batch-row indices int64, grams StringArray) — vectorized:
    shared tokenize-flatten, then shifted ``binary_join_element_wise``
    masked at document boundaries (the same shifted-slice trick as the
    analyzer's ShingleFilter)."""
    import pyarrow.compute as pc

    flat, row_idx = _flat_tokens(batch)
    L = len(flat) - n_gram + 1
    if L <= 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    valid = row_idx[:L] == row_idx[n_gram - 1 :]
    cols = [flat.slice(i, L).cast(pa.string()) for i in range(n_gram)]
    joined = pc.binary_join_element_wise(*cols, " ")
    return row_idx[:L][valid], pc.filter(joined, pa.array(valid))


def decontaminate(sf_dir: str) -> pa.Table:
    """Training-data decontamination: flag documents that share any DECON_N
    token n-gram with the benchmark set (doc_id % DECON_MOD == 0).

    Scale shape: the benchmark gram set is collected once (eval sets are
    small by definition), broadcast via ``ray.put``, and every corpus batch
    does ONE vectorized Arrow ``is_in`` against it — no shuffle, the big side
    streams. A doc's grams never straddle batches (rows are atomic), so the
    per-batch distinct-hit counts are final. At 100 TB the broadcast is the
    eval-set size; hash grams to 16-byte digests if the string set outgrows
    the worker heap. → (doc_id, n_hits) for contaminated non-benchmark docs,
    n_hits = count of DISTINCT shared grams."""
    import pyarrow.compute as pc
    import ray

    def bench_fn(batch: pa.Table) -> pa.Table:
        rows, grams = _batch_ngrams(batch, DECON_N)
        dids = batch["doc_id"].to_numpy().astype(np.int64)[rows]
        mask = pa.array(dids % DECON_MOD == 0)
        return pa.table({"gram": pc.unique(pc.filter(grams, mask))})

    bench: set[str] = set()
    for b in (
        _docs(sf_dir, columns=["doc_id", "text"])
        .map_batches(bench_fn, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        bench.update(b["gram"].to_pylist())
    value_set = pa.array(sorted(bench), pa.string())
    bref = ray.put(value_set)

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
    )

    class Flag:
        def __init__(self):
            self.value_set = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows, grams = _batch_ngrams(batch, DECON_N)
            dids = batch["doc_id"].to_numpy().astype(np.int64)[rows]
            if len(dids) == 0 or len(self.value_set) == 0:
                return empty
            hit = pc.is_in(grams, value_set=self.value_set).to_numpy(
                zero_copy_only=False
            )
            sel = (dids % DECON_MOD != 0) & hit
            if not sel.any():
                return empty
            de = pc.dictionary_encode(pc.filter(grams, pa.array(sel)))
            if isinstance(de, pa.ChunkedArray):
                de = de.combine_chunks()
            codes = de.indices.to_numpy().astype(np.int64)
            V = np.int64(len(de.dictionary))
            u = np.unique(dids[sel] * V + codes)  # distinct (doc, gram)
            udoc, n_hits = np.unique(u // V, return_counts=True)
            return pa.table(
                {
                    "doc_id": pa.array(udoc, pa.int64()),
                    "n_hits": pa.array(n_hits.astype(np.int64), pa.int64()),
                }
            )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        Flag, batch_format="pyarrow", concurrency=(1, 8), max_restarts=0
    )
    parts = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")) or [empty])
    return parts.sort_by("doc_id")


SQL_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts) - {DECON_N - 2}, 1)),
         i -> array_to_string(ts[i:i+{DECON_N - 1}], ' '))) AS gram
  FROM toks
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {DECON_MOD} = 0)
SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
       CAST(count(DISTINCT g.gram) AS BIGINT) AS n_hits
FROM grams g JOIN bench b USING (gram)
WHERE g.doc_id % {DECON_MOD} <> 0
GROUP BY g.doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Gopher-style repetition quality signals
# ---------------------------------------------------------------------------


def gopher_quality(sf_dir: str) -> pa.Table:
    """Per-doc repetition signals (Rae et al. 2021 "Gopher" quality rules):
    duplicate-line fraction, top-bigram fraction (share of bigram slots taken
    by the single most frequent bigram), duplicate-trigram fraction.
    Embarrassingly parallel map; all counting is dictionary-encode +
    integer-key folds, float64 division once per doc."""
    import pyarrow.compute as pc

    def _per_doc_gram_stats(batch: pa.Table, n_gram: int):
        """(max_count, distinct, total) per row for n_gram-token grams."""
        n = len(batch)
        rows, grams = _batch_ngrams(batch, n_gram)
        mx = np.zeros(n, np.int64)
        uq = np.zeros(n, np.int64)
        tot = np.zeros(n, np.int64)
        if len(rows) == 0:
            return mx, uq, tot
        de = pc.dictionary_encode(grams)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy().astype(np.int64)
        V = np.int64(len(de.dictionary))
        u, c = np.unique(rows * V + codes, return_counts=True)
        urow = (u // V).astype(np.int64)
        np.maximum.at(mx, urow, c)
        uq = np.bincount(urow, minlength=n).astype(np.int64)
        tot = np.bincount(rows, minlength=n).astype(np.int64)
        return mx, uq, tot

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arr = pc.fill_null(batch["text"].combine_chunks(), "")
        lines = pc.split_pattern(arr, pattern="\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        offs = lines.offsets.to_numpy().astype(np.int64)
        flat = lines.values
        if offs[0] != 0 or len(flat) != offs[-1] - offs[0]:
            flat = flat.slice(offs[0], offs[-1] - offs[0])
            offs = offs - offs[0]
        counts = np.diff(offs)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        de = pc.dictionary_encode(flat.cast(pa.string()))
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy().astype(np.int64)
        V = np.int64(len(de.dictionary))
        uniq_lines = np.bincount(
            (np.unique(rows * V + codes) // V).astype(np.int64), minlength=n
        )
        dup_line = 1.0 - uniq_lines.astype(np.float64) / counts.astype(np.float64)

        bi_mx, _bi_uq, bi_tot = _per_doc_gram_stats(batch, 2)
        top_bi = np.where(
            bi_tot > 0, bi_mx.astype(np.float64) / bi_tot.astype(np.float64), 0.0
        )
        _t_mx, tri_uq, tri_tot = _per_doc_gram_stats(batch, 3)
        dup_tri = np.where(
            tri_tot > 0,
            1.0 - tri_uq.astype(np.float64) / tri_tot.astype(np.float64),
            0.0,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "dup_line_frac": pa.array(dup_line, pa.float64()),
                "top_bigram_frac": pa.array(top_bi, pa.float64()),
                "dup_trigram_frac": pa.array(dup_tri, pa.float64()),
            }
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("doc_id")


SQL_GOPHER_QUALITY = """
WITH lines AS (
  SELECT doc_id,
         len(str_split(coalesce(text, ''), chr(10))) AS n_lines,
         len(list_distinct(str_split(coalesce(text, ''), chr(10)))) AS n_uniq
  FROM documents
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(coalesce(text, '')), '[\\p{L}\\p{N}_]+') AS ts
  FROM documents
),
bi AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts), 1)),
         i -> array_to_string(ts[i:i+1], ' '))) AS g
  FROM toks
),
bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g),
bistat AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM bic GROUP BY doc_id),
tri AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
         i -> array_to_string(ts[i:i+2], ' '))) AS g
  FROM toks
),
tristat AS (SELECT doc_id, count(DISTINCT g) AS uniq, count(*) AS tot FROM tri GROUP BY doc_id)
SELECT d.doc_id,
       CAST(1.0 - CAST(l.n_uniq AS DOUBLE) / CAST(l.n_lines AS DOUBLE) AS DOUBLE) AS dup_line_frac,
       CAST(coalesce(CAST(b.mx AS DOUBLE) / CAST(b.tot AS DOUBLE), 0.0) AS DOUBLE) AS top_bigram_frac,
       CAST(coalesce(1.0 - CAST(t.uniq AS DOUBLE) / CAST(t.tot AS DOUBLE), 0.0) AS DOUBLE) AS dup_trigram_frac
FROM documents d
JOIN lines l USING (doc_id)
LEFT JOIN bistat b ON d.doc_id = b.doc_id
LEFT JOIN tristat t ON d.doc_id = t.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# FreeTextSuggester (suggest/analyzing/FreeTextSuggester.java) — bigram
# stupid-backoff next-token suggestion
# ---------------------------------------------------------------------------

FT_ALPHA = 0.4  # FreeTextSuggester.ALPHA (:133)
FT_CONTEXTS = ["merge", "table", "window"]
FT_PREFIX = "s"
FT_SUGGEST_K = 10


def freetext_suggest(sf_dir: str) -> pa.Table:
    """Next-token suggestion with the stupid-backoff bigram LM
    (FreeTextSuggester.lookup:506-669): for candidate w completing FT_PREFIX
    after context c, score = count(c w)/count(c) when the bigram exists,
    else ALPHA · count(w)/totTokens (:557,664). Highest order wins per
    candidate; rank (score desc, word asc), top FT_SUGGEST_K per context.

    Scale shape: per-batch partial counts are PRE-FILTERED to the query —
    bigrams only for w1 ∈ contexts, unigrams only for prefix matches or
    context words — so partials stay tiny regardless of corpus size; one
    driver-side merge of small tables, no shuffle."""
    import pyarrow.compute as pc

    ctx_set = pa.array(sorted(FT_CONTEXTS), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        flat, doc_idx = _flat_tokens(batch)
        total = len(flat)
        is_ctx = pc.is_in(flat, value_set=ctx_set).to_numpy(zero_copy_only=False)
        is_pref = pc.starts_with(flat, pattern=FT_PREFIX).to_numpy(zero_copy_only=False)
        out_w1, out_w2, out_n = [], [], []
        # tokens cross the Arrow→object boundary ONCE, only when a partial
        # actually needs them
        flat_np: np.ndarray | None = None

        def _flat_np() -> np.ndarray:
            nonlocal flat_np
            if flat_np is None:
                flat_np = np.asarray(flat.to_pylist(), dtype=object)
            return flat_np

        # unigram partials (w1 = '' sentinel): prefix matches + context words
        um = is_ctx | is_pref
        if um.any():
            import pandas as pd

            uni = pd.Series(_flat_np()[um]).value_counts()
            out_w1.extend([""] * len(uni))
            out_w2.extend(uni.index.tolist())
            out_n.extend(int(x) for x in uni.values)
        # bigram partials: w1 ∈ contexts, adjacency within a doc
        if total >= 2:
            same = doc_idx[:-1] == doc_idx[1:]
            bm = is_ctx[:-1] & is_pref[1:] & same
            if bm.any():
                import pandas as pd

                w1 = _flat_np()[:-1][bm]
                w2 = _flat_np()[1:][bm]
                g = pd.DataFrame({"w1": w1, "w2": w2}).groupby(["w1", "w2"]).size()
                for (a, b), c in g.items():
                    out_w1.append(a)
                    out_w2.append(b)
                    out_n.append(int(c))
        # totals sentinel row
        out_w1.append("\x00total")
        out_w2.append("")
        out_n.append(total)
        return pa.table({
            "w1": pa.array(out_w1, pa.string()),
            "w2": pa.array(out_w2, pa.string()),
            "n": pa.array(out_n, pa.int64()),
        })

    ds = _docs(sf_dir, columns=["text"]).map_batches(fn, batch_format="pyarrow")
    parts = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    merged = pa.TableGroupBy(parts, ["w1", "w2"]).aggregate([("n", "sum")]).to_pandas()
    tot = int(merged.loc[merged.w1 == "\x00total", "n_sum"].sum())
    uni = dict(
        merged.loc[merged.w1 == ""].set_index("w2")["n_sum"].astype(int)
    )
    bi = {
        (r.w1, r.w2): int(r.n_sum)
        for r in merged.loc[~merged.w1.isin(["", "\x00total"])].itertuples()
    }
    cands = sorted(w for w in uni if w.startswith(FT_PREFIX))
    out = []
    for c in FT_CONTEXTS:
        ctx_count = uni.get(c, 0)
        scored = []
        for w in cands:
            b = bi.get((c, w), 0)
            if b > 0 and ctx_count > 0:
                s = float(b) / float(ctx_count)
            else:
                s = FT_ALPHA * float(uni[w]) / float(tot)
            scored.append((s, w))
        scored.sort(key=lambda t: (-t[0], t[1]))
        top = scored[:FT_SUGGEST_K]
        out.append(pa.table({
            "context": pa.array([c] * len(top), pa.string()),
            "rank": pa.array(np.arange(len(top), dtype=np.int64), pa.int64()),
            "word": pa.array([w for _, w in top], pa.string()),
            "score": pa.array([s for s, _ in top], pa.float64()),
        }))
    return pa.concat_tables(out)


def _sql_freetext_one(c: str) -> str:
    return f"""
SELECT '{c}' AS context,
       CAST(row_number() OVER (ORDER BY score DESC, word ASC) - 1 AS BIGINT) AS rank,
       word, score
FROM (
  SELECT u.tok AS word,
         CASE WHEN coalesce(b.n, 0) > 0 AND (SELECT n FROM uni WHERE tok = '{c}') > 0
              THEN CAST(b.n AS DOUBLE) / CAST((SELECT n FROM uni WHERE tok = '{c}') AS DOUBLE)
              ELSE {FT_ALPHA!r} * CAST(u.n AS DOUBLE) / CAST((SELECT t FROM tot) AS DOUBLE)
         END AS score
  FROM uni u LEFT JOIN bi b ON b.w1 = '{c}' AND b.w2 = u.tok
  WHERE u.tok LIKE '{FT_PREFIX}%'
)
ORDER BY score DESC, word ASC LIMIT {FT_SUGGEST_K}"""


SQL_FREETEXT_SUGGEST = f"""
WITH rawt AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS ts FROM documents
),
toks AS (SELECT doc_id, unnest(ts) AS tok FROM rawt),
tot AS (SELECT count(*) AS t FROM toks),
uni AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
tpos AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(ts), 1))) AS i, ts
  FROM rawt WHERE len(ts) > 1
),
bi AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2, count(*) AS n
  FROM tpos WHERE i < len(ts) GROUP BY 1, 2
)
{" UNION ALL ".join(f"({_sql_freetext_one(c)})" for c in FT_CONTEXTS)}
"""


# ---------------------------------------------------------------------------
# Domain-mixture sampling (per-source rates — training-mix reweighting)
# ---------------------------------------------------------------------------

#: per-source keep percentages; sources not listed use MIX_DEFAULT_PCT
MIX_RATES: dict[str, int] = {"src0": 100, "src1": 75, "src2": 50, "src3": 25, "src4": 0}
MIX_DEFAULT_PCT = 60


def sample_mix(sf_dir: str) -> pa.Table:
    """(doc_id, source) rows kept by the domain-mixture sampler: keep iff
    md5('mix|'+doc_id) % 100 < rate(source). Deterministic at any
    parallelism (hash of the row key, not RNG state) — the standard way to
    reweight training-data domains; embarrassingly parallel map."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        srcs = batch["source"].to_pylist()
        keep = [
            int(hashlib.md5(f"mix|{d}".encode()).hexdigest()[:15], 16) % 100
            < MIX_RATES.get(s, MIX_DEFAULT_PCT)
            for d, s in zip(ids, srcs)
        ]
        m = pa.array(keep)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()).filter(m),
            "source": batch["source"].cast(pa.string()).filter(m),
        })

    ds = _docs(sf_dir, columns=["doc_id", "source"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("doc_id")


_MIX_CASE = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {r}" for s, r in sorted(MIX_RATES.items())
) + f" ELSE {MIX_DEFAULT_PCT} END"

SQL_SAMPLE_MIX = f"""
SELECT doc_id, source
FROM (SELECT doc_id, source,
             CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
      FROM documents)
WHERE b < {_MIX_CASE}
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Token-window chunking (context-length splitting for training / retrieval)
# ---------------------------------------------------------------------------

CHUNK_W = 32   # tokens per chunk
CHUNK_S = 24   # stride (8-token overlap)


def chunk_windows(sf_dir: str) -> pa.Table:
    """(doc_id, chunk_id, n_tokens, chunk_text): overlapping token windows
    of CHUNK_W tokens at stride CHUNK_S over the raw lowercase token stream
    — the standard context-window splitter for training corpora and
    retrieval chunking. Vectorized: one Arrow split per batch, window
    extraction via numpy gather over the flat token stream."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        flat, row_idx = _flat_tokens(batch)
        words = np.asarray(flat.to_pylist(), dtype=object)
        counts = np.bincount(row_idx, minlength=n)
        starts_per_doc = np.maximum(1, -(-np.maximum(counts - CHUNK_W, 0) // CHUNK_S) + 1)
        starts_per_doc[counts == 0] = 0
        doc_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=doc_start[1:])
        out_doc, out_chunk, out_n, out_text = [], [], [], []
        doc_ids = batch["doc_id"].to_numpy().astype(np.int64)
        for d in range(n):
            c = int(counts[d])
            base = int(doc_start[d])
            for ci in range(int(starts_per_doc[d])):
                s0 = ci * CHUNK_S
                seg = words[base + s0 : base + min(s0 + CHUNK_W, c)]
                out_doc.append(doc_ids[d])
                out_chunk.append(ci)
                out_n.append(len(seg))
                out_text.append(" ".join(seg))
        return pa.table({
            "doc_id": pa.array(out_doc, pa.int64()),
            "chunk_id": pa.array(out_chunk, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
        })

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending"), ("chunk_id", "ascending")]
    )


SQL_CHUNK_WINDOWS = f"""
WITH rawt AS (
  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+'),
                             t -> t <> '') AS ts
  FROM documents
),
nw AS (
  SELECT doc_id, ts, len(ts) AS c,
         CASE WHEN len(ts) = 0 THEN 0
              ELSE 1 + CAST(ceil(greatest(len(ts) - {CHUNK_W}, 0) / {CHUNK_S}.0) AS BIGINT)
         END AS n_chunks
  FROM rawt
)
SELECT doc_id,
       CAST(ci - 1 AS BIGINT) AS chunk_id,
       CAST(least((ci - 1) * {CHUNK_S} + {CHUNK_W}, c) - (ci - 1) * {CHUNK_S} AS BIGINT) AS n_tokens,
       array_to_string(ts[(ci - 1) * {CHUNK_S} + 1 : least((ci - 1) * {CHUNK_S} + {CHUNK_W}, c)], ' ') AS chunk_text
FROM nw, unnest(generate_series(1, n_chunks)) AS t(ci)
WHERE n_chunks > 0
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# BPE: distributed word counts → driver-trained merges → broadcast encode
# ---------------------------------------------------------------------------
#
# Byte-pair-encoding subword tokenization (Sennrich et al. 2016), the token
# counter a training-data pipeline actually runs. The classic formulation
# trains on the WORD-FREQUENCY table, not the corpus: the distributed part is
# one combiner-pattern word count; training then runs on that small table
# driver-side (vocab ≪ corpus — the standard scale path), and encoding
# broadcasts the learned merge ranks to an actor pool with a per-actor
# word→tokens cache (Zipf makes the cache hit rate ~size of the vocab).

BPE_MERGES = 20  # small: the synthetic corpus vocab is tiny; real corpora use 10-50k
BPE_EOW = "</w>"  # end-of-word marker (Sennrich et al. §3.2)

from ..analysis.tokenizer import TOKEN_RE as _TOKEN_RE  # noqa: E402 — oracle token class


def bpe_word_counts(sf_dir: str) -> pa.Table:
    """(word, n) corpus word-frequency table — per-batch Counter partials,
    one groupby-sum shuffle of (word, count) pairs."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(_TOKEN_RE.findall((t or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    ds = _docs(sf_dir, columns=["text"]).map_batches(partial, batch_format="pyarrow")
    out = ds.groupby("word").aggregate(Sum("n", alias_name="n"))
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow"))


def bpe_train(word_counts: pa.Table, n_merges: int = BPE_MERGES) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, n) table. Deterministic:
    ties on pair frequency break to the lexicographically smallest pair.
    Words are char sequences with BPE_EOW appended to the last char."""
    from collections import Counter

    vocab: dict[tuple[str, ...], int] = {}
    for w, n in zip(word_counts["word"].to_pylist(), word_counts["n"].to_pylist()):
        if not w:
            continue
        syms = tuple(list(w[:-1]) + [w[-1] + BPE_EOW])
        vocab[syms] = vocab.get(syms, 0) + int(n)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge loop (the GPT-2 ``bpe()`` algorithm —
    equivalent to replaying the learned merges in order)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + BPE_EOW]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_token_count(sf_dir: str) -> pa.Table:
    """(doc_id, n_words, n_bpe_tokens): BPE subword token counts per doc with
    merges trained on this corpus's word-frequency table. Rows-only driver
    check (BPE is iterative, not SQL-expressible); the trainer/encoder are
    pinned by golden pytest (Sennrich-style hand-checked merges)."""
    import ray

    merges = bpe_train(bpe_word_counts(sf_dir))
    ranks = {p: i for i, p in enumerate(merges)}
    rref = ray.put(ranks)

    class Encoder:
        def __init__(self):
            self.ranks = ray.get(rref)
            self.cache: dict[str, int] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_w, out_t = [], []
            for t in batch["text"].to_pylist():
                words = _TOKEN_RE.findall((t or "").lower())
                total = 0
                for w in words:
                    n = self.cache.get(w)
                    if n is None:
                        n = len(bpe_encode_word(w, self.ranks))
                        self.cache[w] = n
                    total += n
                out_w.append(len(words))
                out_t.append(total)
            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "n_words": pa.array(out_w, pa.int64()),
                    "n_bpe_tokens": pa.array(out_t, pa.int64()),
                }
            )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        Encoder, batch_format="pyarrow", concurrency=(1, 8), max_restarts=0
    )
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("doc_id")


# ---------------------------------------------------------------------------
# dictionary text tagging (Solr TaggerRequestHandler, overlaps=ALL)
# ---------------------------------------------------------------------------

#: tag dictionary: surface → token sequence (entity-linking style gazetteer)
TAG_DICT = (
    "window join",
    "stream column",
    "big order scan",
    "part join table",
    "order fast",
    "merge",
)


def ft_tag(sf_dir: str) -> pa.Table:
    """(doc_id, tag, n): dictionary phrase tagging — the Solr Text Tagger
    (``solr/core/src/java/org/apache/solr/handler/tagger/
    TaggerRequestHandler.java``) in ``overlaps=ALL`` mode: every occurrence
    of every dictionary phrase in the raw lowercased token stream counts
    (no stop filtering — taggers match surface forms).

    Vectorized: the batch's docs flatten to ONE token array + doc-index
    array; each dictionary phrase of length L is one shifted-equality mask
    chain (L numpy compares) + a same-doc guard + ``bincount`` — no per-token
    Python. Docs live wholly inside their batch, so counts are final without
    any shuffle (embarrassingly parallel, like the reference's per-request
    FST walk)."""
    phrases = [(t, t.split(" ")) for t in TAG_DICT]

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks_per_doc = [
            _TOKEN_RE.findall((t or "").lower()) for t in batch["text"].to_pylist()
        ]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        flat = np.asarray(
            [w for toks in toks_per_doc for w in toks] or [""], dtype=object
        )
        doc_idx = np.repeat(np.arange(len(ids)), lens)
        if len(doc_idx) == 0:
            doc_idx = np.zeros(1, dtype=np.int64)
        out_d, out_t, out_n = [], [], []
        n_tok = len(flat)
        for tag, ptoks in phrases:
            L = len(ptoks)
            w = n_tok - L + 1
            if w <= 0:
                continue
            m = flat[:w] == ptoks[0]
            for j in range(1, L):
                m &= flat[j : w + j] == ptoks[j]
            m &= doc_idx[:w] == doc_idx[L - 1 : w + L - 1]
            if not m.any():
                continue
            counts = np.bincount(doc_idx[:w][m], minlength=len(ids))
            hit = np.flatnonzero(counts)
            out_d.append(ids[hit])
            out_t.extend([tag] * len(hit))
            out_n.append(counts[hit])
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(out_d) if out_d else np.empty(0, np.int64), pa.int64()
                ),
                "tag": pa.array(out_t, pa.string()),
                "n": pa.array(
                    np.concatenate(out_n) if out_n else np.empty(0, np.int64), pa.int64()
                ),
            }
        )

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    if not batches:  # no phrase matched anywhere — Ray drops 0-row blocks
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "tag": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(batches).sort_by(
        [("doc_id", "ascending"), ("tag", "ascending")]
    )


def _sql_tag_one(tag: str) -> str:
    ptoks = tag.split(" ")
    joins = " ".join(
        f"JOIN tp t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.i = t0.i + {j}"
        for j in range(1, len(ptoks))
    )
    conds = " AND ".join(f"t{j}.tok = '{w}'" for j, w in enumerate(ptoks))
    return f"""
SELECT t0.doc_id, '{tag}' AS tag, count(*) AS n
FROM tp t0 {joins} WHERE {conds} GROUP BY t0.doc_id"""


SQL_FT_TAG = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS tk
  FROM documents
),
tp AS (
  SELECT doc_id, i, tk[i] AS tok
  FROM toks, unnest(generate_series(1, len(tk))) AS t(i)
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, tag, CAST(n AS BIGINT) AS n FROM (
{" UNION ALL ".join(f"SELECT * FROM ({_sql_tag_one(t)})" for t in TAG_DICT)}
) ORDER BY doc_id, tag
"""
