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
from .query import BooleanQuery, MatchAllQuery, Query, TermQuery, query_terms, rewrite
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
    ):
        self.index_dir = index_dir
        self.queries = queries
        self.weights = weights
        self.cache = cache
        self.doc_bases = doc_bases
        self.seg_dirs = seg_dirs or {}
        self.after = after
        self.k = k
        k1, b, dtype = sim_params
        self.sim = BM25Similarity(k1, b, dtype=dtype)
        self.method = method

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        import os

        from ..index.segment import segment_dir

        seg = int(group["seg"][0].as_py())
        seg_d = self.seg_dirs.get(seg) or segment_dir(self.index_dir, seg)
        norms = pq.read_table(
            os.path.join(seg_d, "docs.parquet"), columns=["norm_byte"]
        )["norm_byte"].to_numpy()
        live = None
        del_path = os.path.join(seg_d, "deletes.parquet")
        if os.path.exists(del_path):
            deleted = pq.read_table(del_path)["local_id"].to_numpy()
            if len(deleted):
                live = np.ones(len(norms), dtype=bool)
                live[deleted] = False
        lazy = build_lazy(group)
        base = self.doc_bases[seg]

        out_qid: list[str] = []
        out_ids: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        for qid, q in self.queries.items():
            ids, scores = score_one(
                q, self.sim, lazy, self.weights, self.cache, norms, self.k, self.method,
                after=self.after, doc_base=base, live=live,
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


def score_one(q, sim, lazy, weights, cache, norms, k, method="auto",
              after=None, doc_base=0, live=None):
    """Score one query against one segment → per-segment top-k.

    ``lazy``: {term: LazyTermPostings} for the segment. WAND decodes only the
    blocks it visits; the exhaustive path decodes terms fully on demand.
    ``after=(score, global_doc_id)``: searchAfter anchor applied BEFORE the
    per-segment truncation (the anchor filter must see every match).
    ``live``: liveDocs mask — deleted docs never surface (filtered before
    truncation; WAND is bypassed when present, like Lucene's liveDocs check
    inside the scorer loop).
    """
    if live is None and after is None and method in ("auto", "wand") and _wand_applicable(q):
        from .wand import wand_topk

        ids, scores = wand_topk(q, sim, lazy, weights, cache, norms, k)
    else:
        scorer = SegmentScorer(sim, LazyPostingsDict(lazy), weights, cache, norms, lazy=lazy)
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


def _wand_applicable(q) -> bool:
    return isinstance(q, BooleanQuery) and bool(q.should) and not q.must and not q.must_not \
        and q.min_should_match <= 1 and all(isinstance(c, TermQuery) for c in q.should)


class Searcher:
    def __init__(self, index_dir: str, k1: float = 1.2, b: float = 0.75, dtype=np.float32):
        self.reader = IndexReader(index_dir)
        self.sim = BM25Similarity(k1, b, dtype=dtype)
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
    def _weights(self, terms: set[str]) -> dict[str, float]:
        """term → idf (global stats; scorers derive weightValue per clause)."""
        stats = self.reader.term_stats(sorted(terms))
        dc = self.reader.stats.doc_count
        return {t: float(self.sim.idf(df, dc)) for t, (df, ttf) in stats.items()}

    def _weights_from_table(self, tbl: pa.Table | None, terms: set[str]) -> dict[str, float]:
        """Same as _weights but from an already-loaded postings table
        (single-scan local path: df = Σ per-segment df)."""
        dc = self.reader.stats.doc_count
        dfs: dict[str, int] = {t: 0 for t in terms}
        if tbl is not None and len(tbl):
            for t, df in zip(tbl["term"].to_pylist(), tbl["df"].to_numpy()):
                dfs[t] += int(df)
        return {t: float(self.sim.idf(df, dc)) for t, df in dfs.items()}

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
        all_terms: set[str] = set()
        for q in queries.values():
            all_terms |= query_terms(q)
        doc_bases = {s["seg"]: s["doc_base"] for s in self.reader.segments}

        has_matchall = any(_contains_matchall(q) for q in queries.values())
        parts_by_qid: dict[str, list] = {qid: [] for qid in queries}

        if use_ray and not has_matchall:
            weights = self._weights(all_terms)
            import ray.data

            if all_terms:
                ds = ray.data.read_parquet(
                    self.reader.postings_files(),
                    filter=pa.compute.field("term").isin(sorted(all_terms)),
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
                        sim_params=(self.sim.k1, self.sim.b, self.sim.dtype),
                        method=method,
                        seg_dirs=self.reader.seg_dirs(),
                        after=after,
                    ),
                    batch_format="pyarrow",
                    concurrency=(1, 8),
                )
                for b in grouped.iter_batches(batch_format="pyarrow"):
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
    def _matches_per_segment(self, query: Query):
        """→ iterator of (seg, doc_base, local match ids) — shared by the
        field-sort / facet paths (scores ignored)."""
        query = rewrite(query, self.reader)
        terms = sorted(query_terms(query))
        weights = self._weights(set(terms))
        tbl = self.reader.postings_for_terms(terms) if terms else None
        from .wand import build_lazy

        for s in self.reader.segments:
            seg = s["seg"]
            seg_tbl = (
                tbl.filter(pa.compute.equal(tbl["seg"], seg))
                if tbl is not None
                else pa.table({"term": pa.array([], pa.string())})
            )
            lazy = build_lazy(seg_tbl) if len(seg_tbl) else {}
            norms = self._norms(seg)
            scorer = SegmentScorer(
                self.sim, LazyPostingsDict(lazy), weights, self.cache, norms, lazy=lazy
            )
            ids, _ = scorer.score_query(query)
            live = self.reader.live_mask(seg)
            if live is not None and len(ids):
                ids = ids[live[ids]]
            yield seg, s["doc_base"], ids

    def search_by_field(
        self, query: Query, k: int = 10, field: str = "path", descending: bool = False
    ) -> pa.Table:
        """Top-k matches ordered by a stored field — TopFieldCollector analog
        (search/TopFieldCollector.java); tie-break by doc_id asc."""
        import pyarrow.parquet as pq_mod

        vals_parts, ids_parts = [], []
        for seg, base, ids in self._matches_per_segment(query):
            if len(ids) == 0:
                continue
            col = pq_mod.read_table(
                os.path.join(self.reader.seg_dir(seg), "docs.parquet"), columns=[field]
            )[field].to_numpy(zero_copy_only=False)
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

    def facet_counts(self, query: Query, field: str = "lang") -> pa.Table:
        """Facet counts over the matching docs — FacetsCollector / Solr field
        facet analog (SURVEY.md §2.5)."""
        import pyarrow.parquet as pq_mod
        from collections import Counter

        counts: Counter = Counter()
        for seg, _base, ids in self._matches_per_segment(query):
            if len(ids) == 0:
                continue
            col = pq_mod.read_table(
                os.path.join(self.reader.seg_dir(seg), "docs.parquet"), columns=[field]
            )[field].to_numpy(zero_copy_only=False)
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
            df, ttf = self.reader.term_stats([query.term])[query.term]
            out["details"] = [
                {"description": f"idf(df={df}, docCount={self.reader.stats.doc_count})",
                 "value": float(self.sim.idf(df, self.reader.stats.doc_count))},
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
        tbl = self.reader.postings_for_terms(sorted(all_terms)) if all_terms else None
        weights = self._weights_from_table(tbl, all_terms)
        for s in self.reader.segments:
            seg = s["seg"]
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
                    after=after, doc_base=doc_bases[seg], live=live,
                )
                parts_by_qid[qid].append((ids + doc_bases[seg], scores))


def _contains_matchall(q: Query) -> bool:
    if isinstance(q, MatchAllQuery):
        return True
    if isinstance(q, BooleanQuery):
        return any(
            _contains_matchall(c) for c in (*q.must, *q.should, *q.must_not)
        )
    return False
