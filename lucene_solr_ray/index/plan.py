"""Build planning: deterministic doc-ID assignment across any parallelism.

Lucene assigns docIDs in ingest order inside thread-private DWPT segments
(``index/DocumentsWriterPerThread.java:230``) — nondeterministic across thread
counts. Our north rule requires *identical* indexes at N and 4N parallelism,
so doc IDs must derive from the data, not execution order:

    doc_id = dense rank of (repo, path, commit) over the whole corpus

computed scalably as: (1) cut the key space into ``n_segments`` contiguous
ranges using a deterministic hash-sample of keys (no RNG, no order
dependence); (2) count rows per range with a column-pruned pass
(pre-aggregated per batch → tiny driver-side sum); (3) prefix-sum → per-range
``doc_base``; (4) within a range, local rank = lexicographic sort position.
Ranges double as *segments* (Lucene's doc-contiguous leaf analog,
``index/SegmentInfos.java:119``), so postings construction is entirely
partition-local — the only all-to-all exchange in the build is the
``groupby(range_id)`` shuffle itself.

The plan (boundaries + bases) is persisted to ``plan.json`` so resumed builds
reuse identical ranges.
"""

from __future__ import annotations


import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

KEY_COLS = ["repo", "path", "commit"]
SEP = "\x00"  # sorts below any key byte → concat order == tuple order


def sort_keys(batch: pa.Table, cols: list[str] | None = None) -> np.ndarray:
    """Concatenated sort key; ordering identical to the column tuple.

    ``cols`` defaults to KEY_COLS; an index-sort build
    (``IndexWriterConfig.setIndexSort`` analog) prepends its sort fields, so
    the key stays unique (the KEY_COLS suffix is a total tiebreak) and doc
    ids come out in index-sort order."""
    import pyarrow.compute as pc

    cols = cols or KEY_COLS
    joined = pc.binary_join_element_wise(
        *[batch[c].cast(pa.string()) for c in cols],
        SEP,
    )
    return np.asarray(joined.to_pylist(), dtype=object)


def _stable_hash_mask(keys: np.ndarray, mod: int) -> np.ndarray:
    """Deterministic (execution-order-free) sample: siphash(key) % mod == 0.

    ``pandas.util.hash_array`` is a fixed-key siphash — stable across
    processes/machines and vectorized in C (the round-1 per-row hashlib loop
    was the planning pass's hotspot)."""
    from pandas.util import hash_array

    h = hash_array(keys, categorize=False)
    return (h % np.uint64(mod)) == 0


@dataclass
class BuildPlan:
    boundaries: list[str]  # len == n_segments - 1, upper-exclusive cut points
    bases: list[int]  # len == n_segments, doc_base per segment (dense prefix sum)
    counts: list[int]  # rows per segment
    total_rows: int
    #: columns forming the sort key (index-sort fields + KEY_COLS tiebreak)
    key_cols: list[str] = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.key_cols is None:
            self.key_cols = list(KEY_COLS)

    @property
    def n_segments(self) -> int:
        return len(self.bases)

    def range_ids(self, keys: np.ndarray) -> np.ndarray:
        return np.searchsorted(np.asarray(self.boundaries, dtype=object), keys, side="right").astype(np.int32)

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "boundaries": self.boundaries,
                    "bases": self.bases,
                    "counts": self.counts,
                    "total_rows": self.total_rows,
                    "key_cols": self.key_cols,
                },
                f,
            )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "BuildPlan":
        with open(path) as f:
            d = json.load(f)
        return cls(d["boundaries"], d["bases"], d["counts"], d["total_rows"],
                   d.get("key_cols") or list(KEY_COLS))


def compute_plan(corpus_ds, docs_per_segment: int, small_threshold: int = 200_000,
                 sort_fields: tuple[str, ...] = (),
                 corpus_path: str | None = None) -> BuildPlan:
    """Derive segment boundaries + exact per-segment counts.

    Small corpora (≤ max(``small_threshold``, LOCAL_PLAN_THRESHOLD) rows):
    collect keys driver-side and cut into exactly-balanced ranges — via a
    column-pruned LOCAL parquet read when ``corpus_path`` is given (~0.9 s
    at 400k rows vs ~5 s for the two distributed passes, the Amdahl term
    that capped 2→8 scaling at ~0.76), else via a pruned Ray-side read of
    the same key columns. Large: hash-sampled quantile boundaries
    (approximate balance) + an exact column-pruned counting pass.
    Both are deterministic functions of the data alone, and the path choice
    depends only on the row count — never on parallelism or on whether the
    input arrived as a parquet path or a Dataset (ADVICE r4: the same data
    loaded from Solr XML/JSON sources must yield identical segment
    boundaries and doc ids) — so N and 4N builds produce identical plans.
    """
    # count on the raw dataset: metadata-only for parquet reads (a count on
    # the projected dataset would execute a full scan); straight off the
    # parquet footers when a path is given — Dataset.count() costs a Ray
    # round-trip even in the metadata-only case
    if corpus_path is not None:
        import pyarrow.dataset as pads

        total = pads.dataset(corpus_path, format="parquet").count_rows()
    else:
        total = corpus_ds.count()
    key_cols = [c for c in sort_fields if c not in KEY_COLS] + KEY_COLS
    keys_ds = corpus_ds.select_columns(key_cols)
    n_segments = max(1, -(-total // docs_per_segment))

    local_cap = int(os.environ.get("LSR_LOCAL_PLAN_THRESHOLD", "2000000"))
    # row count ALONE picks the path (corpus_path only picks the cheaper
    # read within it): a Dataset input between small_threshold and the local
    # cap takes the same exact path through the Ray-side key read below
    if total <= max(small_threshold, local_cap):
        tbl = None
        if total and corpus_path is not None:
            import pyarrow.dataset as pads

            tbl = pads.dataset(corpus_path, format="parquet").to_table(
                columns=key_cols)
            if len(tbl) != total:
                # `total` comes from the same parquet footers when
                # corpus_path is set, so this can only fire when the caller
                # supplied its own Dataset + path that disagree (or the
                # files changed mid-call) — fall back to the Ray-side read
                # so boundary cuts stay consistent with `total`. The
                # plan-vs-shuffle file-set divergence is ALSO enforced at
                # build time: build_index refuses to commit when any built
                # segment's rows differ from the planned counts.
                tbl = None
        if tbl is None:
            tbl = (
                pa.concat_tables(list(keys_ds.iter_batches(batch_format="pyarrow")))
                if total
                else pa.table({c: pa.array([], pa.string()) for c in key_cols})
            )
            # the Ray-side read is what the build shuffle will see — cuts
            # and bases must derive from ITS row count, not the stale
            # footer total (an IndexError at keys[c-1] otherwise)
            total = len(tbl)
            n_segments = max(1, -(-total // docs_per_segment))
        keys = np.sort(sort_keys(tbl, key_cols)) if total else np.empty(0, dtype=object)
        cuts = [int(round(i * total / n_segments)) for i in range(1, n_segments)]
        boundaries = [str(keys[c - 1]) + SEP for c in cuts]  # key+SEP: upper-inclusive of keys[c-1]
        # duplicate keys straddling a cut all sort into the lower range, so
        # counts MUST come from the same searchsorted the runtime uses — a
        # positional diff would plan overlapping doc-id ranges (see ADVICE r1)
        boundaries = sorted(set(boundaries))
        barr = np.asarray(boundaries, dtype=object)
        rid = np.searchsorted(barr, keys, side="right")
        counts = np.bincount(rid, minlength=len(boundaries) + 1).tolist()
        bases = (np.cumsum([0] + counts[:-1])).tolist()
        return BuildPlan(boundaries, bases, counts, total, key_cols)

    # --- large path: deterministic hash sample → boundaries ---
    target_sample = max(20_000, n_segments * 64)
    mod = max(1, total // target_sample)

    def sample_batch(batch: pa.Table) -> pa.Table:
        ks = sort_keys(batch, key_cols)
        sel = _stable_hash_mask(ks, mod)
        return pa.table({"k": pa.array(ks[sel].tolist(), pa.string())})

    sample = [
        k
        for b in keys_ds.map_batches(sample_batch, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
        for k in b["k"].to_pylist()
    ]
    sample = np.sort(np.asarray(sample, dtype=object))
    if len(sample) < n_segments:
        # degenerate sample; fall back to collecting all keys
        return compute_plan(corpus_ds, docs_per_segment, small_threshold=total,
                            sort_fields=sort_fields)
    qpos = [int(round(i * len(sample) / n_segments)) for i in range(1, n_segments)]
    boundaries = [str(sample[q]) for q in qpos]
    # dedupe equal boundaries (possible under heavy key skew)
    boundaries = sorted(set(boundaries))
    n_segments = len(boundaries) + 1

    # --- exact counts pass (pre-aggregated per batch; driver sums tiny partials) ---
    barr = np.asarray(boundaries, dtype=object)

    def count_batch(batch: pa.Table) -> pa.Table:
        ks = sort_keys(batch, key_cols)
        rid = np.searchsorted(barr, ks, side="right")
        cnt = np.bincount(rid, minlength=n_segments)
        nz = np.flatnonzero(cnt)
        return pa.table({"rid": pa.array(nz, pa.int32()), "cnt": pa.array(cnt[nz], pa.int64())})

    counts = np.zeros(n_segments, dtype=np.int64)
    for b in keys_ds.map_batches(count_batch, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        # np.add.at, NOT counts[rid] += cnt: iter_batches coalesces many
        # per-input-batch partial tables into one block, so rid values REPEAT
        # within a yielded batch — fancy-index += silently keeps only the
        # last duplicate (r5: undercounted 800k→313k and doc_bases came out
        # wrong on the distributed-plan path; the r4 build invariant caught it)
        np.add.at(counts, b["rid"].to_numpy(), b["cnt"].to_numpy())
    bases = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return BuildPlan(list(boundaries), bases.tolist(), counts.tolist(), total, key_cols)
