"""IndexSearcher analog: scatter queries over segments, gather top-k.

Execution mirrors SURVEY.md §3.2/§3.3 ("ours"): the driver resolves global
term stats (one pruned parquet scan — ``IndexSearcher.termStatistics``
:797 analog), precomputes BM25 weights + the 256-entry norm cache, then runs a
Ray Data pipeline::

    read_parquet(postings, filter=term∈query_terms)   # predicate pushdown
      .groupby('seg').map_groups(ScoreSegmentGroup)   # per-leaf scoring
      → tiny per-(segment, query) top-k tables → driver TopDocs.merge

A batch of queries is scored in ONE pass over the postings (scatter once,
score all). For small indexes / unit tests ``use_ray=False`` runs the same
kernels in-process.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa


def _invert_order(vals: np.ndarray) -> np.ndarray:
    """Key that sorts ``vals`` descending under np.lexsort (works for object
    arrays): negated dense rank."""
    _, inv = np.unique(vals, return_inverse=True)
    return -inv

from ..index.reader import IndexReader
from .bm25 import BM25Similarity
from .query import (
    BooleanQuery,
    MatchAllQuery,
    Query,
    TermQuery,
    has_payload_query,
    numeric_fields,
    query_terms,
    rewrite,
)
from .scorer import SegmentScorer, merge_topk, select_topk
from .wand import LazyPostingsDict, build_lazy

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.string()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float32()),
    ]
)


class ScoreSegmentGroup:
    """map_groups callable: one call = all queries against one segment."""

    def __init__(
        self,
        index_dir: str,
        queries: dict[str, Query],
        weights: dict[str, float],
        cache: np.ndarray,
        doc_bases: dict[int, int],
        k: int,
        sim_params: tuple,
        method: str = "auto",
        seg_dirs: dict[int, str] | None = None,
        after: tuple[float, int] | None = None,
        seg: int | None = None,
    ):
        self.index_dir = index_dir
        self.queries = queries
        self.weights = weights
        self.cache = cache
        self.doc_bases = doc_bases
        self.seg_dirs = seg_dirs or {}
        self.after = after
        self.k = k
        from .similarities import similarity_from_spec

        self.sim = similarity_from_spec(sim_params)
        self.method = method
        #: explicit segment id for the per-file task scatter (groups can be
        #: EMPTY there — a segment may hold no postings for the query terms
        #: yet still match numeric/filter clauses)
        self.seg = seg

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        import os

        from ..index.segment import segment_dir

        seg = self.seg if self.seg is not None else int(group["seg"][0].as_py())
        seg_d = self.seg_dirs.get(seg) or segment_dir(self.index_dir, seg)
        from ..index.reader import segment_norms_cached

        norms = segment_norms_cached(seg_d)
        doc_values = _load_doc_values(
            seg_d, _dv_fields_for(seg_d, self.queries.values()))
        live = _load_live(seg_d, len(norms))
        lazy = build_lazy(group)
        base = self.doc_bases[seg]

        out_qid: list[str] = []
        out_ids: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        for qid, q in self.queries.items():
            ids, scores = score_one(
                q, self.sim, lazy, self.weights, self.cache, norms, self.k, self.method,
                after=self.after, doc_base=base, live=live, doc_values=doc_values,
                seg_dir=seg_d,
            )
            out_qid.append(qid)
            out_ids.append(ids + base)
            out_scores.append(scores)
        qid_arr = pa.array(
            np.repeat(np.asarray(out_qid, dtype=object), [len(x) for x in out_ids]).tolist(),
            pa.string(),
        )
        ids_cat = np.concatenate(out_ids) if out_ids else np.empty(0, dtype=np.int64)
        sc_cat = (
            np.concatenate(out_scores) if out_scores else np.empty(0, dtype=self.sim.dtype)
        )
        return pa.table(
            {
                "query_id": qid_arr,
                "doc_id": pa.array(ids_cat, pa.int64()),
                "score": pa.array(
                    sc_cat.astype(self.sim.dtype), pa.from_numpy_dtype(self.sim.dtype)
                ),
            }
        )


def _postings_columns(queries) -> list | None:
    """Position-bearing queries read everything except the char-offset
    stream (only the highlighter consumes off_blob, via its own explicit
    read); pure term/boolean batches also skip the position/payload
    streams — ~half the postings bytes at the parquet read."""
    from .query import needs_positions

    base = ["seg", "field", "term", "df", "ttf", "doc_blob", "freq_blob",
            "block_first_doc", "block_last_doc", "block_max_freq",
            "block_min_len"]
    if any(needs_positions(q) for q in queries):
        return base + ["pos_blob", "pay_blob"]
    return base


def _read_seg_postings(payload: dict, seg: int) -> pa.Table:
    import os

    import pyarrow.parquet as pq

    from ..index.reader import read_postings_rows

    pf = os.path.join(payload["seg_dirs"][seg], "postings.parquet")
    if payload["pairs"]:
        # per-worker cached handle + row-group range pruning (reader.py)
        return read_postings_rows(pf, payload["pairs"], payload.get("columns"))
    return pq.read_schema(pf).empty_table()


def _scatter_chunks(segments: list[int]) -> list[list[int]]:
    """Batch segment ids per task so the task count stays ~4×CPUs even on
    indexes with very many segments (one task per segment is fine at 100
    segments, pathological at 100k)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    per = max(1, -(-len(segments) // max(1, 4 * cpus)))
    return [segments[i : i + per] for i in range(0, len(segments), per)]


def _score_segment_file(payload: dict, segs: list[int]) -> pa.Table:
    """One scoring task over a batch of segments: read each segment's
    postings file with the term filter pushed into its row groups (the term
    column is sorted), then run the shared ScoreSegmentGroup body per
    segment. Zero shuffle — each postings file already IS one segment, so
    the legacy ``groupby('seg')`` re-shuffled data that was pre-partitioned
    on disk (measured 7 s/query fixed cost on a 100-segment index; tasks
    take it to the actual work)."""
    out = []
    for seg in segs:
        g = ScoreSegmentGroup(
            index_dir=payload["index_dir"],
            queries=payload["queries"],
            weights=payload["weights"],
            cache=payload["cache"],
            doc_bases=payload["doc_bases"],
            k=payload["k"],
            sim_params=payload["sim_params"],
            method=payload["method"],
            seg_dirs=payload["seg_dirs"],
            after=payload["after"],
            seg=seg,
        )
        out.append(g(_read_seg_postings(payload, seg)))
    return pa.concat_tables(out)


_SCORE_TASK = None


def _score_task():
    """Lazily-decorated remote twin of :func:`_score_segment_file` (the
    library never imports ray at module load)."""
    global _SCORE_TASK
    if _SCORE_TASK is None:
        import ray

        _SCORE_TASK = ray.remote(num_cpus=1)(_score_segment_file)
    return _SCORE_TASK


def _match_segment_file(payload: dict, segs: list[int]) -> pa.Table:
    """MATCH task over a batch of segments (facets / sorts / exports /
    joins): pruned read per segment + the shared MatchFieldGroup body —
    same zero-shuffle rationale as :func:`_score_segment_file`."""
    out = []
    for seg in segs:
        g = MatchFieldGroup(
            index_dir=payload["index_dir"],
            query=payload["query"],
            weights=payload["weights"],
            cache=payload["cache"],
            doc_bases=payload["doc_bases"],
            sim_params=payload["sim_params"],
            mode=payload["mode"],
            field=payload["field"],
            k=payload["k"],
            descending=payload["descending"],
            params=payload["params"],
            seg_dirs=payload["seg_dirs"],
            seg=seg,
            include_soft_deleted=payload.get("include_soft_deleted", False),
        )
        out.append(g(_read_seg_postings(payload, seg)))
    return pa.concat_tables(out)


_MATCH_TASK = None


def _match_task():
    global _MATCH_TASK
    if _MATCH_TASK is None:
        import ray

        _MATCH_TASK = ray.remote(num_cpus=1)(_match_segment_file)
    return _MATCH_TASK


class MatchFieldGroup:
    """map_groups callable: one segment's posting rows → per-segment PARTIALS
    for the non-scoring paths (facets, sort-by-field, delete-by-query).

    Replaces the round-1 driver-sequential per-segment loop
    (``_matches_per_segment``): segments now match in parallel inside Ray
    tasks and only tiny partials travel to the driver —
    ``facet``: (value, count) rows; ``sort``: ≤k (doc_id, value) candidates;
    ``ids``: (seg, local_id) rows (delete path — the full match set must
    reach the tombstone writer anyway).
    """

    def __init__(
        self,
        index_dir: str,
        query: Query,
        weights: dict[str, float],
        cache: np.ndarray,
        doc_bases: dict[int, int],
        sim_params: tuple,
        mode: str,
        field: str | None = None,
        k: int = 10,
        descending: bool = False,
        seg_dirs: dict[int, str] | None = None,
        params: tuple | None = None,
        seg: int | None = None,
        include_soft_deleted: bool = False,
    ):
        self.include_soft_deleted = include_soft_deleted
        self.index_dir = index_dir
        self.query = query
        self.weights = weights
        self.cache = cache
        self.doc_bases = doc_bases
        self.seg_dirs = seg_dirs or {}
        from .similarities import similarity_from_spec

        self.sim = similarity_from_spec(sim_params)
        self.mode = mode
        self.field = field
        self.k = k
        self.descending = descending
        self.params = params
        self.seg = seg  # explicit id for the per-file task scatter

    def __call__(self, group: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        from ..index.segment import segment_dir

        seg = self.seg if self.seg is not None else int(group["seg"][0].as_py())
        seg_d = self.seg_dirs.get(seg) or segment_dir(self.index_dir, seg)
        from ..index.reader import segment_norms_cached

        norms = segment_norms_cached(seg_d)
        lazy = build_lazy(group)
        doc_values = _load_doc_values(seg_d, _dv_fields_for(seg_d, [self.query]))
        scorer = SegmentScorer(
            self.sim, LazyPostingsDict(lazy), self.weights, self.cache, norms,
            lazy=lazy, doc_values=doc_values, seg_dir=seg_d,
        )
        ids, scores = scorer.score_query(self.query)
        if len(ids):
            live = _load_live(seg_d, len(norms),
                              self.include_soft_deleted)
            if live is not None:
                keep_live = live[ids]
                ids = ids[keep_live]
                scores = scores[keep_live]
        if self.mode == "group1":
            # grouping first pass (FirstPassGroupingCollector analog,
            # lucene/grouping/.../FirstPassGroupingCollector.java): per-segment
            # (group value, best score) partials; the driver merges and keeps
            # the top N groups by (best score desc, value asc)
            col = pq.read_table(os.path.join(seg_d, "docs.parquet"), columns=[self.field])[
                self.field
            ].to_numpy(zero_copy_only=False)
            vals = col[ids].astype(str)
            order = np.lexsort((-scores.astype(np.float64), vals))
            sv = vals[order]
            first = np.concatenate([[True], sv[1:] != sv[:-1]]) if len(sv) else np.empty(0, bool)
            return pa.table(
                {
                    "value": pa.array(sv[first], pa.string()),
                    "best": pa.array(scores.astype(np.float64)[order][first], pa.float64()),
                }
            )
        if self.mode == "group2":
            # grouping second pass (TopGroups/GroupReducer analog): for the
            # selected groups only, per-segment top-k docs per group
            sel_values, k_per = self.params
            col = pq.read_table(os.path.join(seg_d, "docs.parquet"), columns=[self.field])[
                self.field
            ].to_numpy(zero_copy_only=False)
            vals = col[ids].astype(str)
            mask = np.isin(vals, np.asarray(sel_values, dtype=vals.dtype))
            gids = ids[mask] + self.doc_bases[seg]
            gsc = scores[mask].astype(np.float64)
            gv = vals[mask]
            out_v, out_d, out_s = [], [], []
            for v in np.unique(gv):
                m2 = gv == v
                d2, s2 = gids[m2], gsc[m2]
                order = np.lexsort((d2, -s2))[:k_per]
                out_v.extend([v] * len(order))
                out_d.append(d2[order])
                out_s.append(s2[order])
            return pa.table(
                {
                    "value": pa.array(out_v, pa.string()),
                    "doc_id": pa.array(
                        np.concatenate(out_d) if out_d else np.empty(0, np.int64), pa.int64()
                    ),
                    "score": pa.array(
                        np.concatenate(out_s) if out_s else np.empty(0, np.float64), pa.float64()
                    ),
                }
            )
        if self.mode == "ids":
            return pa.table(
                {
                    "seg": pa.array(np.full(len(ids), seg, dtype=np.int32)),
                    "local_id": pa.array(ids, pa.int64()),
                }
            )
        if self.mode == "scored_ids":
            # full scored match stream in global-id space (ToChildBlockJoin /
            # export-with-score consumers)
            return pa.table(
                {
                    "doc_id": pa.array(ids + self.doc_bases[seg], pa.int64()),
                    "score": pa.array(scores.astype(np.float64), pa.float64()),
                }
            )
        if self.mode == "join_agg":
            # scored-join partials (JoinUtil ScoreMode.Max/Total/Avg,
            # lucene/join/src/java/org/apache/lucene/search/join/
            # TermsWithScoreCollector.java): per-(from_field value) score
            # moments of this segment's matching from-docs — only
            # (value, sum, max, n) rows travel to the driver
            col = pq.read_table(
                os.path.join(seg_d, "docs.parquet"), columns=[self.field]
            )[self.field].to_numpy(zero_copy_only=False)
            vals = col[ids].astype(str)
            sc = scores.astype(np.float64)
            u, inv = np.unique(vals, return_inverse=True)
            sums = np.zeros(len(u), dtype=np.float64)
            np.add.at(sums, inv, sc)
            maxs = np.full(len(u), -np.inf, dtype=np.float64)
            np.maximum.at(maxs, inv, sc)
            ns = np.bincount(inv, minlength=len(u)).astype(np.int64)
            return pa.table(
                {
                    "value": pa.array(u.tolist(), pa.string()),
                    "sum": pa.array(sums, pa.float64()),
                    "max": pa.array(maxs, pa.float64()),
                    "n": pa.array(ns, pa.int64()),
                }
            )
        if self.mode == "blockjoin":
            # ToParentBlockJoinQuery partials (lucene/join/src/java/org/
            # apache/lucene/search/join/ToParentBlockJoinQuery.java,
            # BlockJoinScorer): each matching child maps to the NEXT parent
            # in doc order (parentBits.nextSetBit analog — searchsorted over
            # the broadcast global parent-id array; blocks may straddle
            # segments, global ids make that safe). Only per-parent score
            # moments (sum, max, n) travel — ScoreMode.{Total,Max,Avg,None}
            # all combine from these at the driver.
            parents = np.asarray(self.params[0], dtype=np.int64)
            gids = ids + self.doc_bases[seg]
            pos = np.searchsorted(parents, gids, side="left")
            in_range = pos < len(parents)
            # child-query hits on parent docs are undefined in Lucene
            # (checkOrthogonal); we drop them so a parent never scores as
            # its own child
            self_match = np.zeros(len(gids), dtype=bool)
            self_match[in_range] = parents[pos[in_range]] == gids[in_range]
            keep = in_range & ~self_match
            pgid = parents[pos[keep]]
            sc = scores.astype(np.float64)[keep]
            u, inv = np.unique(pgid, return_inverse=True)
            sums = np.zeros(len(u), dtype=np.float64)
            np.add.at(sums, inv, sc)
            maxs = np.full(len(u), -np.inf, dtype=np.float64)
            np.maximum.at(maxs, inv, sc)
            ns = np.bincount(inv, minlength=len(u)).astype(np.int64)
            return pa.table(
                {
                    "parent": pa.array(u, pa.int64()),
                    "sum": pa.array(sums, pa.float64()),
                    "max": pa.array(maxs, pa.float64()),
                    "n": pa.array(ns, pa.int64()),
                }
            )
        if self.mode == "field_vals":
            # (global doc id, keyword value) for ALL matching docs — used by
            # the scored join's to-side with a df-bounded TermInSetQuery, so
            # the result size is bounded by the selected values' df sum
            col = pq.read_table(
                os.path.join(seg_d, "docs.parquet"), columns=[self.field]
            )[self.field].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "doc_id": pa.array(ids + self.doc_bases[seg], pa.int64()),
                    "value": pa.array(col[ids].astype(str).tolist(), pa.string()),
                }
            )
        if self.mode == "stats":
            # StatsComponent partials (solr/core/.../component/StatsValuesFactory.java
            # NumericStatsValues.accumulate): per-segment exact integer moments
            # (n, sum, sumsq) + min/max over the matching docs' doc values;
            # the driver combines (same merge as Solr's distributed stats)
            vals = pq.read_table(
                os.path.join(seg_d, "docs.parquet"), columns=[self.field]
            )[self.field].to_numpy(zero_copy_only=False)[ids].astype(np.int64)
            n = len(vals)
            return pa.table(
                {
                    "n": pa.array([n], pa.int64()),
                    "sum": pa.array([int(vals.sum()) if n else 0], pa.int64()),
                    "sumsq": pa.array([int((vals * vals).sum()) if n else 0], pa.int64()),
                    "min": pa.array([int(vals.min()) if n else None], pa.int64()),
                    "max": pa.array([int(vals.max()) if n else None], pa.int64()),
                }
            )
        if self.mode == "facet_range":
            # numeric range-facet partials (Solr facet.range,
            # solr/core/.../request/SimpleFacets.getFacetRangeCounts /
            # RangeFacetProcessor): half-open [lo, lo+gap) buckets over
            # [start, end) plus 'before' / 'after' counts
            start, end, gap = self.params
            vals = pq.read_table(
                os.path.join(seg_d, "docs.parquet"), columns=[self.field]
            )[self.field].to_numpy(zero_copy_only=False)[ids].astype(np.int64)
            n_buckets = (end - start + gap - 1) // gap
            before = int((vals < start).sum())
            after = int((vals >= end).sum())
            inr = vals[(vals >= start) & (vals < end)]
            counts = np.bincount((inr - start) // gap, minlength=n_buckets).astype(np.int64)
            labels = ["before", "after"] + [str(start + i * gap) for i in range(n_buckets)]
            return pa.table(
                {
                    "bucket": pa.array(labels, pa.string()),
                    "count": pa.array(
                        np.concatenate([[before, after], counts]).astype(np.int64), pa.int64()
                    ),
                }
            )
        if self.mode == "facet2":
            # hierarchical (taxonomy) partials: per-segment (value1, value2,
            # count) over the matching docs — two pruned column reads
            f1, f2 = self.field.split(",")
            tbl2 = pq.read_table(os.path.join(seg_d, "docs.parquet"), columns=[f1, f2])
            v1 = tbl2[f1].to_numpy(zero_copy_only=False)[ids]
            v2 = tbl2[f2].to_numpy(zero_copy_only=False)[ids]
            pairs, c = np.unique(np.char.add(np.char.add(
                v1.astype(str), "\x1f"), v2.astype(str)), return_counts=True)
            split = [p.split("\x1f", 1) for p in pairs.tolist()]
            return pa.table(
                {
                    "value1": pa.array([a for a, _ in split], pa.string()),
                    "value2": pa.array([b for _, b in split], pa.string()),
                    "count": pa.array(c.astype(np.int64), pa.int64()),
                }
            )
        if self.mode == "facet_sample":
            # RandomSamplingFacetsCollector analog with a DETERMINISTIC
            # hash-based sampler: keep doc iff the first 15 md5 hex nibbles of
            # str(global_id), mod 100, fall below rate_pct
            import hashlib

            gids = ids + self.doc_bases[seg]
            keep = np.fromiter(
                (int(hashlib.md5(str(g).encode()).hexdigest()[:15], 16) % 100 < self.k
                 for g in gids.tolist()),
                dtype=bool, count=len(gids),
            )
            ids = ids[keep]
        col = _load_field_column(seg_d, self.field)
        vals = col[ids]
        if self.mode in ("facet", "facet_sample"):
            u, c = np.unique(vals, return_counts=True)
            return pa.table(
                {
                    "value": pa.array(u.tolist(), pa.string()),
                    "count": pa.array(c.astype(np.int64), pa.int64()),
                }
            )
        # mode == "sort": per-segment candidate prune to k
        order = np.argsort(vals, kind="stable")
        if self.descending:
            order = order[::-1]
        order = order[: self.k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order] + self.doc_bases[seg], pa.int64()),
                "value": pa.array(vals[order].tolist()),
            }
        )


_DV_CACHE: dict[tuple, dict] = {}
_DV_CACHE_MAX = 4096


def _dv_fields_for(seg_d: str, queries) -> list[str]:
    """Numeric fields that actually need a doc-values COLUMN load for these
    queries: fields used only by pure NumericRangeQuery clauses are served
    by the segment's point index (BKD analog — index/points.py) when
    available, so their columns never load."""
    from ..index.points import points_available
    from .query import numeric_fields

    all_f: set[str] = set()
    nonrange: set[str] = set()
    for q in queries:
        all_f |= numeric_fields(q)
        nonrange |= numeric_fields(q, include_ranges=False)
    return sorted(
        f for f in all_f if f in nonrange or not points_available(seg_d, f)
    )


def _load_live(seg_d: str, n: int,
               include_soft_deleted: bool = False) -> np.ndarray | None:
    """liveDocs for one segment inside a worker task: hard tombstones
    (``deletes.parquet``) ∧ soft deletes (``soft_deletes.parquet`` — the
    SoftDeletesDirectoryReaderWrapper view, which every search/facet/sort
    path uses). ``include_soft_deleted=True`` is the UNWRAPPED-reader view
    (deleteDocuments(Query) and the retention policy operate on it — a hard
    delete must also tombstone currently-soft-deleted matches, else
    un_soft_delete could resurrect them). None when everything is live."""
    import pyarrow.parquet as pq

    files = (("deletes.parquet",) if include_soft_deleted
             else ("deletes.parquet", "soft_deletes.parquet"))
    live = None
    for f in files:
        p = os.path.join(seg_d, f)
        if not os.path.exists(p):
            continue
        deleted = pq.read_table(p)["local_id"].to_numpy()
        if len(deleted):
            if live is None:
                live = np.ones(n, dtype=bool)
            live[deleted] = False
    return live


def _load_field_column(seg_d: str, field: str) -> np.ndarray:
    """One segment column for the facet / sort-by-field paths (pruned
    Parquet read), with binary doc-value overrides applied last-write-wins.

    ``dv_updates_bin.parquet`` is the BINARY twin of the numeric stacked
    files (``IndexWriter.updateBinaryDocValue`` —
    ``lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1680-1740``,
    applied through ``index/ReadersAndUpdates.java``): values are utf-8
    bytes; string columns see them decoded. The sidecar is tiny (only
    updated docs), so the override pass is one small read per segment."""
    import pyarrow.parquet as pq

    col = pq.read_table(os.path.join(seg_d, "docs.parquet"), columns=[field])[
        field
    ].to_numpy(zero_copy_only=False)
    # numeric updates first (updateNumericDocValue sidecar) — facet/sort
    # views must agree with the numeric-query view (_load_doc_values, which
    # already applies this sidecar); review r4 follow-up
    num_path = os.path.join(seg_d, "dv_updates.parquet")
    if os.path.exists(num_path) and col.dtype != object:
        u = pq.read_table(num_path)
        hit = [i for i, f in enumerate(u["field"].to_pylist()) if f == field]
        if hit:
            col = col.copy()  # same assign-into-original-dtype semantics
            lids = u["local_id"].to_numpy()  # as _load_doc_values
            vals = u["value"].to_numpy()
            for i in hit:
                col[int(lids[i])] = vals[i]
    upd_path = os.path.join(seg_d, "dv_updates_bin.parquet")
    if os.path.exists(upd_path) and col.dtype == object:
        u = pq.read_table(upd_path)
        lids = u["local_id"].to_numpy()
        flds = u["field"].to_pylist()
        vals = u["value"].to_pylist()
        hit = [i for i, f in enumerate(flds) if f == field]
        if hit:
            col = col.copy()
            is_str = len(col) > 0 and not isinstance(col[0], (bytes, bytearray))
            for i in hit:
                v = vals[i]
                col[int(lids[i])] = v.decode("utf-8") if is_str and isinstance(v, bytes) else v
    return col


def _load_doc_values(seg_d: str, fields: list[str]) -> dict[str, np.ndarray]:
    """Numeric doc-value columns of one segment (PointValues analog; the
    Parquet column read is pruned to exactly these fields). Sidecar
    ``dv_updates.parquet`` overrides (updateNumericDocValue stacked files —
    ``index/ReadersAndUpdates.java``) are applied last-write-wins.

    Cached per process keyed by (files' mtime/size, field set): docs.parquet
    is immutable once committed, and dv-update commits change the sidecar's
    stat, so the key self-invalidates. Callers must not mutate the arrays
    (the searcher paths only read)."""
    if not fields:
        return {}
    import pyarrow.parquet as pq

    doc_path = os.path.join(seg_d, "docs.parquet")
    upd_path = os.path.join(seg_d, "dv_updates.parquet")
    st = os.stat(doc_path)
    try:
        ust = os.stat(upd_path)
        ukey = (ust.st_mtime_ns, ust.st_size)
    except FileNotFoundError:
        ukey = None
    key = (doc_path, st.st_mtime_ns, st.st_size, ukey, tuple(fields))
    hit = _DV_CACHE.get(key)
    if hit is not None:
        return hit
    tbl = pq.read_table(doc_path, columns=list(fields))
    out = {f: tbl[f].to_numpy().copy() for f in fields}
    if ukey is not None:
        u = pq.read_table(upd_path)
        for lid, f, v in zip(u["local_id"].to_pylist(), u["field"].to_pylist(),
                             u["value"].to_pylist()):
            if f in out:
                out[f][lid] = v
    for a in out.values():
        a.setflags(write=False)  # shared across queries — reads only
    if len(_DV_CACHE) >= _DV_CACHE_MAX:
        _DV_CACHE.clear()
    _DV_CACHE[key] = out
    return out


def score_one(q, sim, lazy, weights, cache, norms, k, method="auto",
              after=None, doc_base=0, live=None, doc_values=None,
              seg_dir=None):
    """Score one query against one segment → per-segment top-k.

    ``lazy``: {term: LazyTermPostings} for the segment. WAND decodes only the
    blocks it visits; the exhaustive path decodes terms fully on demand.
    ``after=(score, global_doc_id)``: searchAfter anchor applied BEFORE the
    per-segment truncation (the anchor filter must see every match).
    ``live``: liveDocs mask — deleted docs never surface (filtered before
    truncation; WAND is bypassed when present, like Lucene's liveDocs check
    inside the scorer loop).
    """
    if live is None and after is None and method in ("auto", "wand") and _wand_applicable(q, sim):
        from .wand import wand_topk

        ids, scores = wand_topk(q, sim, lazy, weights, cache, norms, k)
    else:
        scorer = SegmentScorer(sim, LazyPostingsDict(lazy), weights, cache, norms,
                               lazy=lazy, doc_values=doc_values, seg_dir=seg_dir)
        ids, scores = scorer.score_query(q)
        if live is not None and len(ids):
            keep = live[ids]
            ids, scores = ids[keep], scores[keep]
        if after is not None:
            a_score = sim.dtype.type(after[0])
            a_doc = int(after[1]) - doc_base  # anchor in local id space
            keep = (scores < a_score) | ((scores == a_score) & (ids > a_doc))
            ids, scores = ids[keep], scores[keep]
        ids, scores = select_topk(ids, scores, k)
    return ids, scores


def _wand_applicable(q, sim=None) -> bool:
    # content-field-only: WAND block bounds use the content norm cache; the
    # block-max upper-bound math is BM25's (sim must support it)
    if sim is not None and not getattr(sim, "supports_wand", False):
        return False
    return isinstance(q, BooleanQuery) and bool(q.should) and not q.must and not q.must_not \
        and not q.filter and q.min_should_match <= 1 \
        and all(isinstance(c, TermQuery) and c.field == "content" for c in q.should)


class Searcher:
    def __init__(self, index_dir: str, k1: float = 1.2, b: float = 0.75, dtype=np.float32,
                 similarity=None):
        """``similarity``: any object implementing the similarity interface
        (default BM25; see :mod:`similarities` for Classic TF-IDF and
        LM-Dirichlet — IndexSearcher.setSimilarity analog)."""
        self.reader = IndexReader(index_dir)
        self.sim = similarity if similarity is not None else BM25Similarity(k1, b, dtype=dtype)
        st = self.reader.stats
        self.avgdl = self.sim.avgdl(st.sum_ttf, st.doc_count)
        self.cache = self.sim.norm_cache(self.avgdl)
        self._norms_cache: dict[int, np.ndarray] = {}

    def _norms(self, seg: int) -> np.ndarray:
        n = self._norms_cache.get(seg)
        if n is None:
            n = self._norms_cache[seg] = self.reader.segment_norms(seg)
        return n

    # ------------------------------------------------------------------
    def _weights(self, pairs: set[tuple[str, str]]) -> dict[tuple[str, str], float]:
        """(field, term) → idf (per-field global stats; scorers derive
        weightValue per clause — collectionStatistics is per field)."""
        stats = self.reader.term_stats(sorted(pairs))
        # df==0 terms have no TermStatistics in the reference (termStatistics
        # returns null) — they contribute no weight anywhere, so omit them
        return {
            (f, t): self.sim.term_weight_stat(
                df, ttf, self.reader.field_doc_count(f), self.reader.field_sum_ttf(f)
            )
            for (f, t), (df, ttf) in stats.items()
            if df > 0
        }

    def _weights_from_table(self, tbl: pa.Table | None, pairs: set) -> dict:
        """Same as _weights but from an already-loaded postings table
        (single-scan local path: df = Σ per-segment df)."""
        dfs: dict[tuple[str, str], list[int]] = {p: [0, 0] for p in pairs}
        if tbl is not None and len(tbl):
            for f, t, df, ttf in zip(
                tbl["field"].to_pylist(), tbl["term"].to_pylist(),
                tbl["df"].to_numpy(), tbl["ttf"].to_numpy(),
            ):
                if (f, t) in dfs:
                    dfs[(f, t)][0] += int(df)
                    dfs[(f, t)][1] += int(ttf)
        return {
            (f, t): self.sim.term_weight_stat(
                df, ttf, self.reader.field_doc_count(f), self.reader.field_sum_ttf(f)
            )
            for (f, t), (df, ttf) in dfs.items()
            if df > 0
        }

    def search(
        self,
        queries: dict[str, Query] | Query,
        k: int = 10,
        *,
        use_ray: bool = True,
        method: str = "auto",
        after: tuple[float, int] | None = None,
    ) -> pa.Table:
        """Batch search → Arrow table (query_id, rank, doc_id, score).

        Ranks are 0-based; rows sorted by (query_id, rank). Tie-break and
        float32 semantics per SURVEY.md §2.6. ``after=(score, doc_id)`` is
        the searchAfter anchor (IndexSearcher.searchAfter:419-446): only hits
        strictly below the anchor in (score desc, doc_id asc) order are
        returned — deep pagination without growing k.
        """
        if isinstance(queries, Query):
            queries = {"q0": queries}
        # rewrite loop: multi-term expansion + boost folding (IndexSearcher:683-689)
        queries = {qid: rewrite(q, self.reader) for qid, q in queries.items()}
        if not self.reader.manifest.get("payloads") and any(
            has_payload_query(q) for q in queries.values()
        ):
            raise ValueError(
                "payload query over an index built without payloads "
                "(StandardAnalyzer(delimited_payload=...) at build time)"
            )
        all_terms: set[str] = set()
        for q in queries.values():
            all_terms |= query_terms(q)
        doc_bases = {s["seg"]: s["doc_base"] for s in self.reader.segments}

        has_matchall = any(_contains_matchall(q) for q in queries.values())
        # numeric-only queries produce no postings groups — score locally
        has_matchall = has_matchall or any(
            numeric_fields(q) and not query_terms(q) for q in queries.values()
        )
        parts_by_qid: dict[str, list] = {qid: [] for qid in queries}

        if use_ray and not has_matchall:
            weights = self._weights(all_terms)
            import ray

            if all_terms:
                # zero-shuffle scatter: each postings file IS one segment, so
                # scoring is one pruned-read task per segment (the legacy
                # groupby('seg') re-shuffled pre-partitioned data — ~7 s/query
                # fixed cost on a 100-segment index; LSR_SCORE_SCATTER=groupby
                # restores it for comparison)
                import os as _os

                if _os.environ.get("LSR_SCORE_SCATTER") == "groupby":
                    batches = self._score_scatter_groupby(
                        queries, weights, doc_bases, k, method, after, all_terms
                    )
                else:
                    payload = ray.put(dict(
                        index_dir=self.reader.index_dir,
                        queries=queries,
                        weights=weights,
                        cache=self.cache,
                        doc_bases=doc_bases,
                        k=k,
                        sim_params=self.sim.spec(),
                        method=method,
                        seg_dirs=self.reader.seg_dirs(),
                        after=after,
                        pairs=sorted(all_terms),
                        columns=_postings_columns(queries.values()),
                    ))
                    task = _score_task()
                    batches = ray.get([
                        task.remote(payload, chunk)
                        for chunk in _scatter_chunks(
                            [s["seg"] for s in self.reader.segments]
                        )
                    ])
                for b in batches:
                    if len(b) == 0:
                        continue
                    qids = b["query_id"].to_pylist()
                    ids = b["doc_id"].to_numpy()
                    scores = b["score"].to_numpy()
                    for qid in set(qids):
                        m = np.asarray([x == qid for x in qids])
                        parts_by_qid[qid].append((ids[m], scores[m]))
        else:
            self._search_local(queries, k, doc_bases, parts_by_qid, method, after)

        rows_q, rows_r, rows_d, rows_s = [], [], [], []
        for qid in queries:
            ids, scores = merge_topk(parts_by_qid[qid], k)
            rows_q.extend([qid] * len(ids))
            rows_r.extend(range(len(ids)))
            rows_d.extend(ids.tolist())
            rows_s.extend(np.asarray(scores, dtype=self.sim.dtype).tolist())
        score_type = pa.from_numpy_dtype(self.sim.dtype)
        return pa.table(
            {
                "query_id": pa.array(rows_q, pa.string()),
                "rank": pa.array(rows_r, pa.int32()),
                "doc_id": pa.array(rows_d, pa.int64()),
                "score": pa.array(rows_s, score_type),
            }
        )

    # ------------------------------------------------------------------
    def _scatter_match(self, query: Query, mode: str, field: str | None = None,
                       k: int = 10, descending: bool = False,
                       params: tuple | None = None,
                       include_soft_deleted: bool = False):
        """Scatter the match computation over segments — one pruned-read
        ``ray.remote`` task per segment batch; returns the partials Dataset.

        ALL queries are routable through the task scatter, including
        MatchAll and numeric-only queries: ``_read_seg_postings`` returns a
        schema-complete empty postings table when there are no term pairs,
        and ``SegmentScorer`` scores those from per-segment norms /
        doc-values alone (round-3 verdict: the former ``None`` escape sent
        MatchAll grouping through a driver-side whole-corpus
        materialization). Returns None only for the legacy
        ``LSR_SCORE_SCATTER=groupby`` path, which cannot see segments that
        have no matching posting rows — callers then use the local
        per-segment loop."""
        query = rewrite(query, self.reader)
        pairs = sorted(query_terms(query))
        import os as _os

        if _os.environ.get("LSR_SCORE_SCATTER") == "groupby" and (
                not pairs or _contains_matchall(query)):
            return None
        weights = self._weights(set(pairs))

        import ray
        import ray.data

        kwargs = dict(
            index_dir=self.reader.index_dir,
            query=query,
            weights=weights,
            cache=self.cache,
            doc_bases={s["seg"]: s["doc_base"] for s in self.reader.segments},
            sim_params=self.sim.spec(),
            mode=mode,
            field=field,
            k=k,
            descending=descending,
            params=params,
            seg_dirs=self.reader.seg_dirs(),
            include_soft_deleted=include_soft_deleted,
        )
        if _os.environ.get("LSR_SCORE_SCATTER") == "groupby":
            from ..index.reader import pairs_filter

            ds = ray.data.read_parquet(
                self.reader.postings_files(), filter=pairs_filter(pairs)
            )
            return ds.groupby("seg").map_groups(
                MatchFieldGroup,
                fn_constructor_kwargs=kwargs,
                batch_format="pyarrow",
                concurrency=(1, 8),
                max_restarts=0,  # fail fast; scatter is cheap to re-run
            )
        # zero-shuffle: one pruned-read task per segment (files are
        # seg-partitioned; see _score_segment_file), wrapped back into a
        # Dataset so consumers can still sort/stream the partials
        payload = ray.put({**kwargs, "pairs": pairs,
                           "columns": _postings_columns([query])})
        task = _match_task()
        refs = [
            task.remote(payload, chunk)
            for chunk in _scatter_chunks([s["seg"] for s in self.reader.segments])
        ]
        return ray.data.from_arrow_refs(refs)

    def _match_partials_local(self, query: Query, mode: str,
                              field: str | None = None, k: int = 10,
                              descending: bool = False,
                              params: tuple | None = None,
                              include_soft_deleted: bool = False) -> pa.Table:
        """Local serial twin of :meth:`_scatter_match` — runs the SAME
        ``_match_segment_file`` partial computation in-process over every
        segment (identical per-segment partials, no Ray session). Used by
        ``use_ray=False`` callers and the legacy ``LSR_SCORE_SCATTER=groupby``
        escape for non-routable queries; replaces the former full-search +
        whole-corpus docs-dict fallback, so no grouping path materializes
        the corpus on the driver."""
        query = rewrite(query, self.reader)
        payload = dict(
            index_dir=self.reader.index_dir,
            query=query,
            weights=self._weights(set(query_terms(query))),
            cache=self.cache,
            doc_bases={s["seg"]: s["doc_base"] for s in self.reader.segments},
            sim_params=self.sim.spec(),
            mode=mode,
            field=field,
            k=k,
            descending=descending,
            params=params,
            seg_dirs=self.reader.seg_dirs(),
            include_soft_deleted=include_soft_deleted,
            pairs=sorted(query_terms(query)),
            columns=_postings_columns([query]),
        )
        return _match_segment_file(payload, [s["seg"] for s in self.reader.segments])

    def _matches_per_segment(self, query: Query, include_soft_deleted: bool = False):
        """→ iterator of (seg, doc_base, local match ids) — the LOCAL
        fallback for the field-sort / facet / delete paths (used for no-term
        and MatchAll queries, and when use_ray=False).
        ``include_soft_deleted``: unwrapped-reader view (retention policy)."""
        query = rewrite(query, self.reader)
        pairs = sorted(query_terms(query))
        weights = self._weights(set(pairs))
        tbl = (self.reader.postings_for_terms(pairs, columns=_postings_columns([query]))
               if pairs else None)
        from .wand import build_lazy

        for s in self.reader.segments:
            seg = s["seg"]
            seg_d = self.reader.seg_dir(seg)
            doc_values = _load_doc_values(seg_d, _dv_fields_for(seg_d, [query]))
            seg_tbl = (
                tbl.filter(pa.compute.equal(tbl["seg"], seg))
                if tbl is not None
                else pa.table({"term": pa.array([], pa.string())})
            )
            lazy = build_lazy(seg_tbl) if len(seg_tbl) else {}
            norms = self._norms(seg)
            scorer = SegmentScorer(
                self.sim, LazyPostingsDict(lazy), weights, self.cache, norms,
                lazy=lazy, doc_values=doc_values, seg_dir=seg_d,
            )
            ids, _ = scorer.score_query(query)
            live = self.reader.live_mask(seg, include_soft_deleted=include_soft_deleted)
            if live is not None and len(ids):
                ids = ids[live[ids]]
            yield seg, s["doc_base"], ids

    def search_by_field(
        self, query: Query, k: int = 10, field: str = "path", descending: bool = False,
        use_ray: bool = True,
    ) -> pa.Table:
        """Top-k matches ordered by a stored field — TopFieldCollector analog
        (search/TopFieldCollector.java); tie-break by doc_id asc. Segments
        match in parallel (MatchFieldGroup scatter) and emit ≤k candidates
        each; the driver merges the tiny partials."""
        import pyarrow.parquet as pq_mod

        if (not descending and self.reader.sort_fields
                and field == self.reader.sort_fields[0]):
            # index-sort early termination (EarlyTerminatingSortingCollector /
            # TopFieldCollector with an index sort, search/
            # EarlyTerminatingSortingCollector.java): doc_id order IS the
            # requested sort order (doc ids are dense ranks over sort_fields,
            # and segments partition the key space in order), so the first k
            # matches in doc order are the answer — later segments are never
            # scanned. `last_sorted_segments_scanned` records the cutoff.
            out_ids: list[int] = []
            scanned = 0
            for seg, base, ids in self._matches_per_segment(query):
                scanned += 1
                if len(ids):
                    out_ids.extend((ids + base)[: k - len(out_ids)].tolist())
                if len(out_ids) >= k:
                    break
            self.last_sorted_segments_scanned = scanned
            if not out_ids:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()), field: pa.array([], pa.string())}
                )
            fetched = self.reader.fetch_docs(out_ids, columns=["doc_id", field])
            fmap = dict(zip(fetched["doc_id"].to_pylist(), fetched[field].to_pylist()))
            return pa.table(
                {
                    "doc_id": pa.array(out_ids, pa.int64()),
                    field: pa.array([fmap[d] for d in out_ids]),
                }
            )

        vals_parts, ids_parts = [], []
        scattered = (
            self._scatter_match(query, "sort", field=field, k=k, descending=descending)
            if use_ray
            else None
        )
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                if len(b):
                    ids_parts.append(b["doc_id"].to_numpy())
                    vals_parts.append(b["value"].to_numpy(zero_copy_only=False))
        else:
            for seg, base, ids in self._matches_per_segment(query):
                if len(ids) == 0:
                    continue
                col = _load_field_column(self.reader.seg_dir(seg), field)
                vals = col[ids]
                order = np.argsort(vals, kind="stable")
                if descending:
                    order = order[::-1]
                order = order[:k]  # per-segment prune
                vals_parts.append(vals[order])
                ids_parts.append(ids[order] + base)
        if not ids_parts:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), field: pa.array([], pa.string())}
            )
        vals = np.concatenate(vals_parts)
        ids = np.concatenate(ids_parts)
        order = np.lexsort((ids, vals))
        if descending:
            # descending field, still ascending doc_id on ties
            order = np.lexsort((ids, _invert_order(vals)))
        order = order[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                field: pa.array(vals[order].tolist()),
            }
        )

    def facet_counts(self, query: Query, field: str = "lang", use_ray: bool = True) -> pa.Table:
        """Facet counts over the matching docs — FacetsCollector / Solr field
        facet analog (SURVEY.md §2.5). Per-segment (value, count) partials are
        computed inside the MatchFieldGroup scatter; the driver sums the tiny
        partials (#segments × #values rows)."""
        import pyarrow.parquet as pq_mod
        from collections import Counter

        counts: Counter = Counter()
        scattered = self._scatter_match(query, "facet", field=field) if use_ray else None
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                for v, c in zip(b["value"].to_pylist(), b["count"].to_pylist()):
                    counts[v] += c
        else:
            for seg, _base, ids in self._matches_per_segment(query):
                if len(ids) == 0:
                    continue
                col = _load_field_column(self.reader.seg_dir(seg), field)
                vals, cnts = np.unique(col[ids], return_counts=True)
                for v, c in zip(vals.tolist(), cnts.tolist()):
                    counts[v] += c
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return pa.table(
            {
                "value": pa.array([v for v, _ in items], pa.string()),
                "count": pa.array([c for _, c in items], pa.int64()),
            }
        )

    def facet_hierarchy(self, query: Query, fields: tuple[str, str] = ("repo", "lang"),
                        use_ray: bool = True) -> pa.Table:
        """Hierarchical (taxonomy) facet counts — TaxonomyFacetCounts /
        getTopChildren analog (``lucene/facet/src/java/org/apache/lucene/facet/
        taxonomy/FastTaxonomyFacetCounts.java``): counts at every level of the
        dimension path ``fields[0]/fields[1]`` over the docs matching
        ``query``. Level-1 counts are the roll-up of their children (ordinal
        parent accumulation, ``TaxonomyFacets.rollup`` analog) — computed by
        summing the tiny per-segment (value1, value2, count) partials on the
        driver. → (level, path, count), count desc / path asc within level."""
        import pyarrow.parquet as pq_mod
        from collections import Counter

        pair_counts: Counter = Counter()
        scattered = (
            self._scatter_match(query, "facet2", field=",".join(fields))
            if use_ray
            else None
        )
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                for v1, v2, c in zip(
                    b["value1"].to_pylist(), b["value2"].to_pylist(), b["count"].to_pylist()
                ):
                    pair_counts[(v1, v2)] += c
        else:
            for seg, _base, ids in self._matches_per_segment(query):
                if len(ids) == 0:
                    continue
                tbl = pq_mod.read_table(
                    os.path.join(self.reader.seg_dir(seg), "docs.parquet"),
                    columns=list(fields),
                )
                v1 = tbl[fields[0]].to_numpy(zero_copy_only=False)[ids]
                v2 = tbl[fields[1]].to_numpy(zero_copy_only=False)[ids]
                for a, b2 in zip(v1.tolist(), v2.tolist()):
                    pair_counts[(str(a), str(b2))] += 1
        top: Counter = Counter()
        for (v1, _v2), c in pair_counts.items():
            top[v1] += c  # rollup
        rows = sorted(((1, v, c) for v, c in top.items()),
                      key=lambda r: (-r[2], r[1]))
        rows += sorted(((2, f"{v1}/{v2}", c) for (v1, v2), c in pair_counts.items()),
                       key=lambda r: (-r[2], r[1]))
        return pa.table(
            {
                "level": pa.array([r[0] for r in rows], pa.int64()),
                "path": pa.array([r[1] for r in rows], pa.string()),
                "count": pa.array([r[2] for r in rows], pa.int64()),
            }
        )

    def pivot_facets(self, query: Query, fields: tuple[str, str] = ("repo", "lang"),
                     use_ray: bool = True) -> pa.Table:
        """Solr pivot facets (facet.pivot=f1,f2 — solr/core/src/java/org/
        apache/solr/handler/component/PivotFacetProcessor.java): nested
        (parent value, child value, count) over the matching docs, ordered by
        parent total desc / parent asc, then child count desc / child asc.
        Reuses the taxonomy scatter's (value1, value2, count) partials."""
        from collections import Counter

        pair_counts: Counter = Counter()
        scattered = (
            self._scatter_match(query, "facet2", field=",".join(fields))
            if use_ray else None
        )
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                for v1, v2, c in zip(b["value1"].to_pylist(), b["value2"].to_pylist(),
                                     b["count"].to_pylist()):
                    pair_counts[(v1, v2)] += c
        else:
            import pyarrow.parquet as pq_mod

            for seg, _base, ids in self._matches_per_segment(query):
                if not len(ids):
                    continue
                tbl = pq_mod.read_table(
                    os.path.join(self.reader.seg_dir(seg), "docs.parquet"),
                    columns=list(fields),
                )
                v1 = tbl[fields[0]].to_numpy(zero_copy_only=False)[ids]
                v2 = tbl[fields[1]].to_numpy(zero_copy_only=False)[ids]
                for a, b2 in zip(v1.tolist(), v2.tolist()):
                    pair_counts[(str(a), str(b2))] += 1
        totals: Counter = Counter()
        for (v1, _v2), c in pair_counts.items():
            totals[v1] += c
        rows = sorted(
            pair_counts.items(),
            key=lambda kv: (-totals[kv[0][0]], kv[0][0], -kv[1], kv[0][1]),
        )
        return pa.table(
            {
                fields[0]: pa.array([v1 for (v1, _), _c in rows], pa.string()),
                fields[1]: pa.array([v2 for (_, v2), _c in rows], pa.string()),
                "count": pa.array([c for _, c in rows], pa.int64()),
            }
        )

    def drill_sideways(self, base: Query, dims: dict[str, str],
                       use_ray: bool = True) -> pa.Table:
        """DrillSideways analog (lucene/facet/src/java/org/apache/lucene/
        facet/DrillSideways.java): given a base query and per-dimension
        drill-down filters (keyword field=value), compute each dimension's
        facet counts with THAT dimension's filter removed and every other
        dimension's filter + the base query applied (so the UI can show the
        counts a user would get by switching this dimension's selection).

        → (dim, value, count), dims in sorted order, counts desc / value asc
        within a dim."""
        from .query import BooleanQuery as BQ, TermQuery as TQ

        out_d: list[str] = []
        out_v: list[str] = []
        out_c: list[int] = []
        for dim in sorted(dims):
            others = [TQ(v, field=f) for f, v in sorted(dims.items()) if f != dim]
            q = BQ(must=[base, *others]) if others else base
            fc = self.facet_counts(q, field=dim, use_ray=use_ray)
            out_d.extend([dim] * len(fc))
            out_v.extend(fc["value"].to_pylist())
            out_c.extend(fc["count"].to_pylist())
        return pa.table(
            {
                "dim": pa.array(out_d, pa.string()),
                "value": pa.array(out_v, pa.string()),
                "count": pa.array(out_c, pa.int64()),
            }
        )

    def facet_counts_sampled(self, query: Query, field: str = "lang",
                             rate_pct: int = 40, use_ray: bool = True) -> pa.Table:
        """Sampled facet counts — RandomSamplingFacetsCollector analog
        (``lucene/facet/.../RandomSamplingFacetsCollector.java``) with a
        deterministic hash sampler instead of XORShift64 (reproducible across
        runs/parallelism and expressible in the SQL oracle): a matching doc is
        sampled iff ``int(md5(str(doc_id))[:15], 16) % 100 < rate_pct``.
        Counts are over the sample (unamortized, like getFacetResults)."""
        import hashlib
        import pyarrow.parquet as pq_mod
        from collections import Counter

        counts: Counter = Counter()
        scattered = (
            self._scatter_match(query, "facet_sample", field=field, k=rate_pct)
            if use_ray
            else None
        )
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                for v, c in zip(b["value"].to_pylist(), b["count"].to_pylist()):
                    counts[v] += c
        else:
            for seg, base, ids in self._matches_per_segment(query):
                if len(ids) == 0:
                    continue
                gids = ids + base
                keep = np.fromiter(
                    (int(hashlib.md5(str(g).encode()).hexdigest()[:15], 16) % 100 < rate_pct
                     for g in gids.tolist()),
                    dtype=bool, count=len(gids),
                )
                ids = ids[keep]
                if len(ids) == 0:
                    continue
                col = pq_mod.read_table(
                    os.path.join(self.reader.seg_dir(seg), "docs.parquet"), columns=[field]
                )[field].to_numpy(zero_copy_only=False)
                for v in col[ids].tolist():
                    counts[str(v)] += 1
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return pa.table(
            {
                "value": pa.array([v for v, _ in items], pa.string()),
                "count": pa.array([c for _, c in items], pa.int64()),
            }
        )

    def facet_range(self, query: Query, field: str, start: int, end: int,
                    gap: int, use_ray: bool = True) -> pa.Table:
        """Numeric range facets — Solr ``facet.range`` analog
        (``solr/core/src/java/org/apache/solr/handler/component/
        RangeFacetProcessor.java``; ``SimpleFacets.getFacetRangeCounts``):
        half-open ``[lo, lo+gap)`` buckets covering ``[start, end)`` over the
        docs matching ``query``, plus ``before`` / ``after`` counts — all
        buckets emitted, zero counts included (facet.mincount=0 default).
        → (bucket, count): 'before', each bucket start ascending, 'after'."""
        import pyarrow.parquet as pq_mod
        from collections import Counter

        agg: Counter = Counter()
        scattered = (
            self._scatter_match(query, "facet_range", field=field,
                                params=(start, end, gap))
            if use_ray
            else None
        )
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                for lbl, c in zip(b["bucket"].to_pylist(), b["count"].to_pylist()):
                    agg[lbl] += c
        else:
            for seg, _base, ids in self._matches_per_segment(query):
                if len(ids) == 0:
                    continue
                vals = pq_mod.read_table(
                    os.path.join(self.reader.seg_dir(seg), "docs.parquet"),
                    columns=[field],
                )[field].to_numpy(zero_copy_only=False)[ids].astype(np.int64)
                agg["before"] += int((vals < start).sum())
                agg["after"] += int((vals >= end).sum())
                inr = vals[(vals >= start) & (vals < end)]
                for i, c in enumerate(np.bincount((inr - start) // gap)):
                    agg[str(start + i * gap)] += int(c)
        rows = [("before", agg.get("before", 0))]
        rows += [(str(lo), agg.get(str(lo), 0)) for lo in range(start, end, gap)]
        rows.append(("after", agg.get("after", 0)))
        return pa.table(
            {
                "bucket": pa.array([r[0] for r in rows], pa.string()),
                "count": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    def field_stats(self, query: Query, field: str = "field_len",
                    use_ray: bool = True) -> pa.Table:
        """Numeric field statistics over the matching docs — Solr
        StatsComponent analog (solr/core/src/java/org/apache/solr/handler/
        component/StatsComponent.java, StatsValuesFactory.java): count, min,
        max, sum, mean, sample stddev (Solr's formula
        ``sqrt((count*sumsq - sum^2)/(count*(count-1)))``). Per-segment exact
        integer moment partials travel to the driver; float64 math happens
        once, on the combined moments."""
        import pyarrow.parquet as pq_mod

        n = tot = totsq = 0
        mn = mx = None
        scattered = self._scatter_match(query, "stats", field=field) if use_ray else None
        if scattered is not None:
            parts = list(scattered.iter_batches(batch_format="pyarrow"))
        else:
            parts = []
            for seg, _base, ids in self._matches_per_segment(query):
                if not len(ids):
                    continue
                vals = pq_mod.read_table(
                    os.path.join(self.reader.seg_dir(seg), "docs.parquet"),
                    columns=[field],
                )[field].to_numpy(zero_copy_only=False)[ids].astype(np.int64)
                parts.append(pa.table({
                    "n": pa.array([len(vals)], pa.int64()),
                    "sum": pa.array([int(vals.sum())], pa.int64()),
                    "sumsq": pa.array([int((vals * vals).sum())], pa.int64()),
                    "min": pa.array([int(vals.min())], pa.int64()),
                    "max": pa.array([int(vals.max())], pa.int64()),
                }))
        for b in parts:
            for i in range(b.num_rows):
                pn = b["n"][i].as_py()
                if not pn:
                    continue
                n += pn
                tot += b["sum"][i].as_py()
                totsq += b["sumsq"][i].as_py()
                pmn, pmx = b["min"][i].as_py(), b["max"][i].as_py()
                mn = pmn if mn is None else min(mn, pmn)
                mx = pmx if mx is None else max(mx, pmx)
        if n == 0:
            mean = stddev = None
        else:
            mean = float(tot) / float(n)
            if n > 1:
                nf, sf, qf = float(n), float(tot), float(totsq)
                stddev = float(np.sqrt((nf * qf - sf * sf) / (nf * (nf - 1.0))))
            else:
                stddev = 0.0
        return pa.table({
            "count": pa.array([n], pa.int64()),
            "min": pa.array([mn], pa.int64()),
            "max": pa.array([mx], pa.int64()),
            "sum": pa.array([tot], pa.int64()),
            "mean": pa.array([mean], pa.float64()),
            "stddev": pa.array([stddev], pa.float64()),
        })

    def search_grouped(self, query: Query, group_field: str, n_groups: int = 10,
                       docs_per_group: int = 3, use_ray: bool = True) -> pa.Table:
        """Grouped top-k — the grouping module's two-pass collectors
        (``lucene/grouping/src/java/org/apache/lucene/search/grouping/
        FirstPassGroupingCollector.java`` selects the top N groups by best
        score; the second pass collects top docs per selected group). Both
        passes run scattered per segment; only (value, best) and per-group
        top-k partials reach the driver. Groups ordered by (best score desc,
        value asc); docs within a group by (score desc, doc_id asc).
        → (group, group_rank, rank, doc_id, score)."""
        if use_ray:
            scattered = self._scatter_match(query, "group1", field=group_field)
        else:
            scattered = None
        # local mode (or the legacy groupby escape) runs the SAME two-pass
        # partial computation serially per segment — no full-corpus fallback
        batches1 = (scattered.iter_batches(batch_format="pyarrow")
                    if scattered is not None
                    else [self._match_partials_local(query, "group1",
                                                     field=group_field)])
        best: dict[str, float] = {}
        for b in batches1:
            for v, s in zip(b["value"].to_pylist(), b["best"].to_pylist()):
                if v not in best or s > best[v]:
                    best[v] = s
        sel = [v for v, _ in sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:n_groups]]
        if not sel:
            return pa.table(
                {
                    "group": pa.array([], pa.string()),
                    "group_rank": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        if scattered is not None:
            scattered2 = self._scatter_match(query, "group2", field=group_field,
                                             params=(tuple(sel), docs_per_group))
        else:
            scattered2 = None
        batches2 = (scattered2.iter_batches(batch_format="pyarrow")
                    if scattered2 is not None
                    else [self._match_partials_local(
                        query, "group2", field=group_field,
                        params=(tuple(sel), docs_per_group))])
        cand: dict[str, list[tuple[float, int]]] = {v: [] for v in sel}
        for b in batches2:
            for v, d, s in zip(b["value"].to_pylist(), b["doc_id"].to_pylist(),
                               b["score"].to_pylist()):
                cand[v].append((s, d))
        rows = []
        for gr, v in enumerate(sel):
            top = sorted(cand[v], key=lambda t: (-t[0], t[1]))[:docs_per_group]
            for r, (s, d) in enumerate(top):
                rows.append((v, gr, r, d, s))
        return pa.table(
            {
                "group": pa.array([r[0] for r in rows], pa.string()),
                "group_rank": pa.array([r[1] for r in rows], pa.int64()),
                "rank": pa.array([r[2] for r in rows], pa.int64()),
                "doc_id": pa.array([r[3] for r in rows], pa.int64()),
                "score": pa.array([r[4] for r in rows], pa.float64()),
            }
        )

    def term_vectors(self, doc_ids: list[int]) -> pa.Table:
        """Per-document term vectors — the reader-side ``Fields``/``Terms``
        surface (``index/TermVectors``; MoreLikeThis and the
        UnifiedHighlighter consume it). Our index re-analyzes stored content
        (store_content=True) exactly like the uhighlight ANALYSIS offset
        source, instead of persisting a second per-doc postings copy.
        → (doc_id, term, tf) sorted by (doc_id, term)."""
        from collections import Counter

        from ..analysis.tokenizer import analyze_with_positions

        fetched = self.reader.fetch_docs(sorted(doc_ids), columns=["doc_id", "content"])
        out_d, out_t, out_f = [], [], []
        contents = dict(zip(fetched["doc_id"].to_pylist(), fetched["content"].to_pylist()))
        for d in sorted(doc_ids):
            counts = Counter(t for t, _ in analyze_with_positions(contents[d] or ""))
            for t in sorted(counts):
                out_d.append(d)
                out_t.append(t)
                out_f.append(counts[t])
        return pa.table(
            {
                "doc_id": pa.array(out_d, pa.int64()),
                "term": pa.array(out_t, pa.string()),
                "tf": pa.array(out_f, pa.int64()),
            }
        )

    def join_query(self, from_query: Query, from_field: str, to_field: str) -> Query:
        """Query-time join — JoinUtil.createJoinQuery analog
        (``lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java``,
        ScoreMode.None): collect the distinct ``from_field`` values of docs
        matching ``from_query`` (scattered per segment; only (seg, local_id)
        partials + a tiny value set travel), then return a constant-score
        TermInSetQuery on ``to_field``. The value set is broadcast inside the
        returned query — no shuffle join."""
        import pyarrow.parquet as pq_mod

        from .query import TermInSetQuery

        values: set[str] = set()
        scattered = self._scatter_match(from_query, "ids")
        per_seg: dict[int, list[np.ndarray]] = {}
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                if len(b):
                    segs = b["seg"].to_numpy()
                    lids = b["local_id"].to_numpy().astype(np.int64)
                    for sv in np.unique(segs):
                        per_seg.setdefault(int(sv), []).append(lids[segs == sv])
        else:
            for seg, _base, ids in self._matches_per_segment(from_query):
                if len(ids):
                    per_seg.setdefault(int(seg), []).append(ids)
        for seg, parts in per_seg.items():
            ids = np.concatenate(parts)
            col = pq_mod.read_table(
                os.path.join(self.reader.seg_dir(seg), "docs.parquet"),
                columns=[from_field],
            )[from_field].to_numpy(zero_copy_only=False)
            values.update(map(str, np.unique(col[ids])))
        return TermInSetQuery(tuple(sorted(values)), field=to_field)

    def join_query_scored(self, from_query: Query, from_field: str, to_field: str,
                          score_mode: str = "max", k: int = 10,
                          use_ray: bool = True) -> pa.Table:
        """Scored query-time join — JoinUtil.createJoinQuery with
        ScoreMode.Max / Total / Avg (lucene/join/src/java/org/apache/lucene/
        search/join/JoinUtil.java, TermsWithScoreCollector.java): every
        from-doc matching ``from_query`` contributes its score to its
        ``from_field`` value's aggregate (max / sum / sum÷count); each to-doc
        whose ``to_field`` equals a collected value is scored with that
        value's aggregate. → top-k (rank, doc_id, score), score desc /
        doc_id asc.

        Scale shape: per-segment (value, sum, max, n) partials travel for the
        from side; the to side only materializes docs of the df-bounded value
        prefix that can reach the top k (greedy by aggregate desc until the
        cumulative keyword df covers k)."""
        import pyarrow.parquet as pq_mod

        from .query import TermInSetQuery

        if score_mode not in ("max", "total", "avg"):
            raise ValueError(score_mode)
        # --- from side: per-value score moments ---
        agg: dict[str, list] = {}  # value -> [sum, max, n]

        def _absorb(vals, sums, maxs, ns):
            for v, s_, m_, n_ in zip(vals, sums, maxs, ns):
                a = agg.setdefault(v, [0.0, -np.inf, 0])
                a[0] += s_
                a[1] = max(a[1], m_)
                a[2] += n_

        scattered = (
            self._scatter_match(from_query, "join_agg", field=from_field)
            if use_ray else None
        )
        if scattered is not None:
            for b in scattered.iter_batches(batch_format="pyarrow"):
                _absorb(b["value"].to_pylist(), b["sum"].to_pylist(),
                        b["max"].to_pylist(), b["n"].to_pylist())
        else:
            q = rewrite(from_query, self.reader)
            pairs = sorted(query_terms(q))
            tbl = (self.reader.postings_for_terms(pairs, columns=_postings_columns([q]))
                   if pairs else None)
            weights = self._weights_from_table(tbl, set(pairs))
            num_fields = sorted(numeric_fields(q))
            for s in self.reader.segments:
                seg = s["seg"]
                seg_tbl = (
                    tbl.filter(pa.compute.equal(tbl["seg"], seg))
                    if tbl is not None
                    else pa.table({"term": pa.array([], pa.string())})
                )
                lazy = build_lazy(seg_tbl) if len(seg_tbl) else {}
                seg_d = self.reader.seg_dir(seg)
                scorer = SegmentScorer(
                    self.sim, LazyPostingsDict(lazy), weights, self.cache,
                    self._norms(seg), lazy=lazy,
                    doc_values=_load_doc_values(seg_d, num_fields),
                    seg_dir=seg_d,
                )
                ids, scores = scorer.score_query(q)
                live = self.reader.live_mask(seg)
                if live is not None and len(ids):
                    keep = live[ids]
                    ids, scores = ids[keep], scores[keep]
                if not len(ids):
                    continue
                col = pq_mod.read_table(
                    os.path.join(self.reader.seg_dir(seg), "docs.parquet"),
                    columns=[from_field],
                )[from_field].to_numpy(zero_copy_only=False)
                vals = col[ids].astype(str)
                sc = scores.astype(np.float64)
                u, inv = np.unique(vals, return_inverse=True)
                sums = np.zeros(len(u), dtype=np.float64)
                np.add.at(sums, inv, sc)
                maxs = np.full(len(u), -np.inf, dtype=np.float64)
                np.maximum.at(maxs, inv, sc)
                _absorb(u.tolist(), sums.tolist(), maxs.tolist(),
                        np.bincount(inv, minlength=len(u)).tolist())
        empty = pa.table({
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        })
        if not agg:
            return empty
        if score_mode == "max":
            vscore = {v: a[1] for v, a in agg.items()}
        elif score_mode == "total":
            vscore = {v: a[0] for v, a in agg.items()}
        else:
            vscore = {v: a[0] / a[2] for v, a in agg.items()}
        # --- greedy df-bounded value prefix: only values that can reach the
        # top k (build-time df is an upper bound on live matches) ---
        ordered = sorted(vscore, key=lambda v: (-vscore[v], v))
        stats = self.reader.term_stats([(to_field, v) for v in ordered])
        cum = 0
        selected: list[str] = []
        for v in ordered:
            selected.append(v)
            cum += stats[(to_field, v)][0]
            if cum >= k:
                break
        # score-tied values past the cutoff can still win on doc_id asc
        for v in ordered[len(selected):]:
            if vscore[v] == vscore[selected[-1]]:
                selected.append(v)
            else:
                break
        # --- to side: (doc_id, value) for docs of the selected values;
        # build-time df over-counts deleted docs, so if live matches come up
        # short of k, widen to the full value set once (rare: deletes only) ---
        def _fetch(vals_sel: list[str]):
            to_q = TermInSetQuery(tuple(vals_sel), field=to_field)
            ids_parts, val_parts = [], []
            scattered2 = (
                self._scatter_match(to_q, "field_vals", field=to_field)
                if use_ray else None
            )
            if scattered2 is not None:
                for b in scattered2.iter_batches(batch_format="pyarrow"):
                    if len(b):
                        ids_parts.append(b["doc_id"].to_numpy())
                        val_parts.extend(b["value"].to_pylist())
            else:
                for seg, base, ids in self._matches_per_segment(to_q):
                    if not len(ids):
                        continue
                    col = pq_mod.read_table(
                        os.path.join(self.reader.seg_dir(seg), "docs.parquet"),
                        columns=[to_field],
                    )[to_field].to_numpy(zero_copy_only=False)
                    ids_parts.append(ids + base)
                    val_parts.extend(col[ids].astype(str).tolist())
            return ids_parts, val_parts

        ids_parts, val_parts = _fetch(selected)
        if sum(len(p) for p in ids_parts) < k and len(selected) < len(ordered):
            ids_parts, val_parts = _fetch(ordered)
        if not ids_parts:
            return empty
        doc_ids = np.concatenate(ids_parts)
        doc_scores = np.asarray([vscore[v] for v in val_parts], dtype=np.float64)
        order = np.lexsort((doc_ids, -doc_scores))[:k]
        return pa.table({
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(doc_ids[order], pa.int64()),
            "score": pa.array(doc_scores[order], pa.float64()),
        })

    def _score_scatter_groupby(self, queries, weights, doc_bases, k, method,
                               after, all_terms) -> list[pa.Table]:
        """Legacy scoring scatter (Ray Data read + groupby('seg')) — kept
        behind LSR_SCORE_SCATTER=groupby for comparison benchmarks."""
        import ray.data

        from ..index.reader import pairs_filter

        ds = ray.data.read_parquet(
            self.reader.postings_files(), filter=pairs_filter(sorted(all_terms))
        )
        grouped = ds.groupby("seg").map_groups(
            ScoreSegmentGroup,
            fn_constructor_kwargs=dict(
                index_dir=self.reader.index_dir,
                queries=queries,
                weights=weights,
                cache=self.cache,
                doc_bases=doc_bases,
                k=k,
                sim_params=self.sim.spec(),
                method=method,
                seg_dirs=self.reader.seg_dirs(),
                after=after,
            ),
            batch_format="pyarrow",
            concurrency=(1, 8),
            max_restarts=0,  # fail fast; scatter is cheap to re-run
        )
        return list(grouped.iter_batches(batch_format="pyarrow"))

    @staticmethod
    def _drain_scatter(ds) -> pa.Table | None:
        """Collect a scatter's partials → one table, or None when no partial
        produced rows (shared by the join/match surfaces so empty-result
        handling stays consistent)."""
        batches = list(ds.iter_batches(batch_format="pyarrow"))
        parts = pa.concat_tables(batches) if batches else None
        return parts if parts is not None and len(parts) else None

    def match_ids(self, query: Query) -> np.ndarray:
        """Full match set as sorted global doc ids — the scatter's ``ids``
        mode (per-segment SegmentScorer matching in parallel Ray tasks; only
        (seg, local_id) pairs travel). Falls back to the local per-segment
        loop for no-term / MatchAll queries."""
        ds = self._scatter_match(query, mode="ids")
        if ds is None:
            out = [ids + base for _seg, base, ids in self._matches_per_segment(query)]
            return np.sort(np.concatenate(out)) if out else np.empty(0, np.int64)
        parts = self._drain_scatter(ds)
        if parts is None:
            return np.empty(0, np.int64)
        doc_bases = {s["seg"]: s["doc_base"] for s in self.reader.segments}
        segs = parts["seg"].to_numpy().astype(np.int64)
        local = parts["local_id"].to_numpy().astype(np.int64)
        useg, inv = np.unique(segs, return_inverse=True)
        bases = np.array([doc_bases[int(s)] for s in useg], dtype=np.int64)
        return np.sort(local + bases[inv])

    def block_join(self, child_query: Query, parents: np.ndarray, *,
                   score_mode: str = "max", k: int = 10) -> pa.Table:
        """ToParentBlockJoinQuery analog (lucene/join/src/java/org/apache/
        lucene/search/join/ToParentBlockJoinQuery.java): score child docs,
        map each hit to the next parent in doc order, aggregate per parent
        with ScoreMode ``max`` | ``total`` | ``avg`` | ``none``
        (join/ScoreMode.java). ``parents`` = sorted global doc ids of the
        parent filter's matches (parentBits analog) — broadcast by value to
        the scatter tasks; only (parent, sum, max, n) partials return.

        → (parent_id, score float64, n_children), ranked (score desc,
        parent asc); ``none`` scores 0 in parent-doc order (Lucene's
        all-zero-score tie-break collapses to doc order)."""
        parents = np.asarray(parents, dtype=np.int64)
        ds = self._scatter_match(child_query, mode="blockjoin",
                                 params=(parents.tolist(),))
        if ds is None:
            raise ValueError("block_join child query must have postings terms")
        parts = self._drain_scatter(ds)
        if parts is None:
            pgid = np.empty(0, np.int64)
            sums_p = maxs_p = np.empty(0, np.float64)
            ns_p = np.empty(0, np.int64)
        else:
            pgid = parts["parent"].to_numpy()
            sums_p = parts["sum"].to_numpy()
            maxs_p = parts["max"].to_numpy()
            ns_p = parts["n"].to_numpy()
        u, inv = np.unique(pgid, return_inverse=True)
        sums = np.zeros(len(u), dtype=np.float64)
        np.add.at(sums, inv, sums_p)
        maxs = np.full(len(u), -np.inf, dtype=np.float64)
        np.maximum.at(maxs, inv, maxs_p)
        ns = np.zeros(len(u), dtype=np.int64)
        np.add.at(ns, inv, ns_p)
        if score_mode == "max":
            sc = maxs
        elif score_mode == "total":
            sc = sums
        elif score_mode == "avg":
            sc = sums / np.maximum(ns, 1)
        elif score_mode == "none":
            sc = np.zeros(len(u), dtype=np.float64)
        else:
            raise ValueError(score_mode)
        order = np.lexsort((u, -sc))[:k]
        return pa.table(
            {
                "parent_id": pa.array(u[order], pa.int64()),
                "score": pa.array(sc[order], pa.float64()),
                "n_children": pa.array(ns[order], pa.int64()),
            }
        )

    def to_child_block_join(self, parent_query: Query, parents: np.ndarray) -> pa.Table:
        """ToChildBlockJoinQuery analog (lucene/join/src/java/org/apache/
        lucene/search/join/ToChildBlockJoinQuery.java): every child of a
        matching parent matches, scored with its PARENT's score
        (ToChildBlockJoinScorer.score). ``parents`` = sorted global ids of
        the parent filter's matches; parent-query hits outside the parent
        set are rejected (the scorer's 'parent query must match only parent
        docs' contract). → (child_id, parent_id, score float64) in child-id
        order."""
        parents = np.asarray(parents, dtype=np.int64)
        ds = self._scatter_match(parent_query, mode="scored_ids")
        if ds is None:
            raise ValueError("to_child_block_join parent query must have postings terms")
        parts = self._drain_scatter(ds)
        if parts is None:
            return pa.table({
                "child_id": pa.array([], pa.int64()),
                "parent_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        gids = parts["doc_id"].to_numpy().astype(np.int64)
        scores = parts["score"].to_numpy().astype(np.float64)
        pos = np.searchsorted(parents, gids)
        is_parent = (pos < len(parents)) & (parents[np.minimum(pos, len(parents) - 1)] == gids)
        gids, scores, pos = gids[is_parent], scores[is_parent], pos[is_parent]
        order = np.argsort(gids)
        gids, scores, pos = gids[order], scores[order], pos[order]
        starts = np.where(pos > 0, parents[np.maximum(pos - 1, 0)] + 1, 0)
        counts = gids - starts  # children per matching parent (may be 0)
        child = np.concatenate(
            [np.arange(s, p, dtype=np.int64) for s, p in zip(starts, gids)]
        ) if len(gids) else np.empty(0, np.int64)
        return pa.table({
            "child_id": pa.array(child, pa.int64()),
            "parent_id": pa.array(np.repeat(gids, counts), pa.int64()),
            "score": pa.array(np.repeat(scores, counts), pa.float64()),
        })

    def highlight(self, query: Query, doc_ids: list[int], *, field: str = "content",
                  max_passages: int = 3) -> dict[int, str | None]:
        """UnifiedHighlighter-style snippets for hit docs (two-phase stored
        fields fetch + ANALYSIS-offset passage scoring; see
        :mod:`highlight`). Requires ``build_index(store_content=True)``."""
        from .highlight import highlight_hits

        return highlight_hits(self, query, doc_ids, fld=field, max_passages=max_passages)

    def search_elevated(self, query: Query, elevated: list[int], k: int = 10,
                        use_ray: bool = True) -> pa.Table:
        """Editorial result pinning — Solr QueryElevationComponent analog
        (solr/core/src/java/org/apache/solr/handler/component/
        QueryElevationComponent.java): the configured doc ids are forced to
        the top IN CONFIGURED ORDER (whether or not they match), organic hits
        follow in score order with the elevated ids excluded.

        → (rank, doc_id, elevated) truncated to k."""
        n_total = self.reader.stats.doc_count
        pinned = [d for d in elevated if 0 <= d < n_total][:k]
        res = self.search(query, k=k + len(pinned), use_ray=use_ray)
        organic = [d for d in res["doc_id"].to_pylist() if d not in set(pinned)]
        ids = pinned + organic[: k - len(pinned)]
        return pa.table({
            "rank": pa.array(np.arange(len(ids)), pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
            "elevated": pa.array(
                [i < len(pinned) for i in range(len(ids))], pa.bool_()
            ),
        })

    def second_pass_scores(self, query: Query, global_ids: np.ndarray) -> np.ndarray:
        """Scores of ``query`` on exactly the given docs (0.0 for docs it
        doesn't match) — the second pass of QueryRescorer.rescore (ref
        lucene/core/src/java/org/apache/lucene/search/QueryRescorer.java:55-101,
        which advances the scorer only over the first-pass hits). Segments
        with no candidate docs are skipped entirely."""
        query = rewrite(query, self.reader)
        pairs = sorted(query_terms(query))
        tbl = (self.reader.postings_for_terms(pairs, columns=_postings_columns([query]))
               if pairs else None)
        weights = self._weights_from_table(tbl, set(pairs))
        num_fields = sorted(numeric_fields(query))
        out = np.zeros(len(global_ids), dtype=self.sim.dtype)
        for s in self.reader.segments:
            seg, base = s["seg"], s["doc_base"]
            in_seg = (global_ids >= base) & (global_ids < base + s["doc_count"])
            if not in_seg.any():
                continue
            seg_tbl = (
                tbl.filter(pa.compute.equal(tbl["seg"], seg))
                if tbl is not None
                else pa.table({"term": pa.array([], pa.string())})
            )
            lazy = build_lazy(seg_tbl) if len(seg_tbl) else {}
            seg_d = self.reader.seg_dir(seg)
            scorer = SegmentScorer(
                self.sim, LazyPostingsDict(lazy), weights, self.cache,
                self._norms(seg), lazy=lazy,
                doc_values=_load_doc_values(seg_d, num_fields),
                seg_dir=seg_d,
            )
            ids, scores = scorer.score_query(query)  # local ids ascending
            local = global_ids[in_seg] - base
            pos = np.searchsorted(ids, local)
            hit = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == local) \
                if len(ids) else np.zeros(len(local), dtype=bool)
            vals = np.zeros(len(local), dtype=self.sim.dtype)
            vals[hit] = scores[pos[hit]]
            out[in_seg] = vals
        return out

    def rescore(self, first_query: Query, second_query: Query, *,
                first_k: int = 100, k: int = 10, weight: float = 2.0) -> pa.Table:
        """Two-pass re-ranking — QueryRescorer analog (ref
        lucene/core/src/java/org/apache/lucene/search/QueryRescorer.java:50-109
        and its default combine in QueryRescorer.rescore(IndexSearcher,
        TopDocs, Query, double, int)): first-pass top-``first_k`` hits of
        ``first_query``; each hit that also matches ``second_query`` gets
        ``first + weight * second``, non-matches keep the first-pass score;
        re-sorted by (combined desc, doc_id asc), truncated to ``k``.

        → (rank, doc_id, score); float64 when the searcher was built with
        dtype=float64 (SQL parity), float32 otherwise."""
        first = self.search(first_query, k=first_k, use_ray=False)
        fids = first["doc_id"].to_numpy()
        if not len(fids):
            return pa.table({
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.from_numpy_dtype(self.sim.dtype)),
            })
        fscores = first["score"].to_numpy().astype(self.sim.dtype)
        second = self.second_pass_scores(second_query, fids)
        combined = (fscores + self.sim.dtype.type(weight) * second).astype(self.sim.dtype)
        order = np.lexsort((fids, -combined))[:k]
        return pa.table({
            "rank": pa.array(np.arange(len(order)), pa.int64()),
            "doc_id": pa.array(fids[order], pa.int64()),
            "score": pa.array(combined[order], pa.from_numpy_dtype(self.sim.dtype)),
        })

    def explain(self, query: Query, doc_id: int) -> dict:
        """Score explanation tree — Explanation/Weight.explain analog."""
        query = rewrite(query, self.reader)
        res = self.search({"q": query}, k=self.reader.stats.doc_count, use_ray=False)
        row = [
            (d, s)
            for d, s in zip(res["doc_id"].to_pylist(), res["score"].to_pylist())
            if d == doc_id
        ]
        if not row:
            return {"match": False, "value": 0.0, "description": "no match"}
        out = {"match": True, "value": row[0][1], "description": repr(query)}
        if isinstance(query, TermQuery):
            key = (query.field, query.term)
            df, ttf = self.reader.term_stats([key])[key]
            dc = self.reader.field_doc_count(query.field)
            out["details"] = [
                {"description": f"idf(df={df}, docCount={dc})",
                 "value": float(self.sim.idf(df, dc))},
                {"description": f"avgdl", "value": float(self.avgdl)},
            ]
        return out

    def _search_local(self, queries, k, doc_bases, parts_by_qid, method, after=None):
        """In-process scan path (small indexes, unit tests, MatchAll).
        Single postings scan: global term stats are aggregated from the same
        table that gets scored."""
        all_terms: set[str] = set()
        for q in queries.values():
            all_terms |= query_terms(q)
        tbl = (self.reader.postings_for_terms(
                   sorted(all_terms), columns=_postings_columns(queries.values()))
               if all_terms else None)
        weights = self._weights_from_table(tbl, all_terms)
        num_fields = sorted({f for q in queries.values() for f in numeric_fields(q)})
        for s in self.reader.segments:
            seg = s["seg"]
            doc_values = _load_doc_values(self.reader.seg_dir(seg), num_fields)
            seg_tbl = (
                tbl.filter(pa.compute.equal(tbl["seg"], seg))
                if tbl is not None
                else pa.table({"term": pa.array([], pa.string())})
            )
            lazy = build_lazy(seg_tbl) if len(seg_tbl) else {}
            norms = self._norms(seg)
            live = self.reader.live_mask(seg)
            for qid, q in queries.items():
                ids, scores = score_one(
                    q, self.sim, lazy, weights, self.cache, norms, k, method,
                    after=after, doc_base=doc_bases[seg], live=live, doc_values=doc_values,
                )
                parts_by_qid[qid].append((ids + doc_bases[seg], scores))


def _contains_matchall(q: Query) -> bool:
    if isinstance(q, MatchAllQuery):
        return True
    if isinstance(q, BooleanQuery):
        return any(
            _contains_matchall(c) for c in (*q.must, *q.should, *q.must_not, *q.filter)
        )
    return False
