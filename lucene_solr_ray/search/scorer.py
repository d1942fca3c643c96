"""Per-segment scoring kernels — vectorized equivalents of the reference's
scorer iterators (SURVEY.md §2.4).

- Disjunction = dense score accumulation over the segment's doc space, the
  Arrow-native form of ``BooleanScorer``'s 2048-doc windowed buckets
  (``search/BooleanScorer.java:33-258``); clause scores are added in sorted
  clause order (canonical order — documented deviation: Lucene's heap order in
  ``DisjunctionSumScorer`` is execution-dependent; ours is deterministic).
- Conjunction = sorted-array intersection, smallest-df leader
  (``search/ConjunctionDISI.java`` leapfrog analog).
- MUST_NOT = sorted-array difference (``search/ReqExclScorer.java``).
- minimumNumberShouldMatch = per-doc match counting
  (``search/MinShouldMatchSumScorer.java``).
- Top-k selection: score desc, doc id asc on ties — ``HitQueue.lessThan``
  (``search/HitQueue.java:76-81``) under ``TopScoreDocCollector``'s
  earliest-doc-wins tie policy (:64-81).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util.forutil import decode_postings
from .bm25 import BM25Similarity
from .query import BooleanQuery, MatchAllQuery, Query, TermQuery


def decode_segment_postings(group: pa.Table) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """posting rows of ONE segment → {term: (local_ids int64, freqs int32)}."""
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    terms = group["term"].to_pylist()
    dfs = group["df"].to_numpy()
    for i, t in enumerate(terms):
        out[t] = decode_postings(
            group["doc_blob"][i].as_py(), group["freq_blob"][i].as_py(), int(dfs[i])
        )
    return out


class SegmentScorer:
    """Exhaustive (oracle) scorer for one segment.

    ``weights``: term → weightValue (boost*idf*(k1+1), global stats).
    ``cache``: 256-entry norm cache. ``norms``: norm_byte per local doc id.
    """

    def __init__(
        self,
        sim: BM25Similarity,
        postings: dict[str, tuple[np.ndarray, np.ndarray]],
        weights: dict[str, float],
        cache: np.ndarray,
        norms: np.ndarray,
    ):
        self.sim = sim
        self.postings = postings
        self.weights = weights
        self.cache = cache
        self.norms = norms
        self._term_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    # ------------------------------------------------------------------
    def term_match(self, q: TermQuery) -> tuple[np.ndarray, np.ndarray]:
        key = q.term if q.boost == 1.0 else f"{q.term}\x00{q.boost}"
        hit = self._term_cache.get(key)
        if hit is not None:
            return hit
        if q.term not in self.postings:
            res = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        else:
            ids, freqs = self.postings[q.term]
            w = self.sim.dtype.type(self.weights[q.term] * (q.boost if q.boost != 1.0 else 1.0))
            scores = self.sim.score_freqs(w, freqs, self.norms[ids], self.cache)
            res = (ids, scores)
        self._term_cache[key] = res
        return res

    def score_query(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        """→ (local doc ids ascending, scores). Matching docs only."""
        if isinstance(q, TermQuery):
            return self.term_match(q)
        if isinstance(q, MatchAllQuery):
            ids = np.arange(len(self.norms), dtype=np.int64)
            return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
        if isinstance(q, BooleanQuery):
            return self._score_boolean(q)
        raise TypeError(f"unsupported query node: {type(q)}")

    # ------------------------------------------------------------------
    def _clauses(self, qs: list) -> list[tuple[np.ndarray, np.ndarray]]:
        # canonical deterministic clause order: sort by repr
        return [self.score_query(c) for c in sorted(qs, key=repr)]

    def _score_boolean(self, q: BooleanQuery) -> tuple[np.ndarray, np.ndarray]:
        must = self._clauses(q.must)
        should = self._clauses(q.should)
        must_not = self._clauses(q.must_not)

        if not q.must and not q.should:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype)

        if q.must:
            # leapfrog: intersect starting from the smallest clause
            must_sorted = sorted(must, key=lambda p: len(p[0]))
            ids = must_sorted[0][0]
            for mids, _ in must_sorted[1:]:
                ids = _intersect_sorted(ids, mids)
            scores = np.zeros(len(ids), dtype=self.sim.dtype)
            for mids, mscores in must:  # canonical order accumulation
                pos = np.searchsorted(mids, ids)
                scores += mscores[pos]
            if should:
                cnt = np.zeros(len(ids), dtype=np.int32)
                for sids, sscores in should:
                    ok, pos = _member_mask(sids, ids)
                    scores[ok] += sscores[pos[ok]]  # ReqOptSumScorer analog
                    cnt[ok] += 1
                if q.min_should_match > 0:
                    keep = cnt >= q.min_should_match
                    ids, scores = ids[keep], scores[keep]
        else:
            # pure disjunction: dense accumulation (BooleanScorer analog)
            n = len(self.norms)
            acc = np.zeros(n, dtype=self.sim.dtype)
            cnt = np.zeros(n, dtype=np.int32)
            for sids, sscores in should:
                acc[sids] += sscores
                cnt[sids] += 1
            thresh = max(1, q.min_should_match)
            ids = np.flatnonzero(cnt >= thresh).astype(np.int64)
            scores = acc[ids]

        if must_not and len(ids):
            for nids, _ in must_not:
                if len(nids):
                    excluded, _ = _member_mask(nids, ids)
                    ids, scores = ids[~excluded], scores[~excluded]
        return ids, scores


def _member_mask(sorted_arr: np.ndarray, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mask of ids present in sorted_arr, searchsorted positions)."""
    if len(sorted_arr) == 0 or len(ids) == 0:
        return np.zeros(len(ids), dtype=bool), np.zeros(len(ids), dtype=np.int64)
    pos = np.searchsorted(sorted_arr, ids)
    ok = (pos < len(sorted_arr)) & (sorted_arr[np.minimum(pos, len(sorted_arr) - 1)] == ids)
    return ok, pos


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Galloping-style intersection of sorted unique int arrays."""
    if len(a) == 0 or len(b) == 0:
        return np.empty(0, dtype=np.int64)
    if len(a) > len(b):
        a, b = b, a
    pos = np.searchsorted(b, a)
    ok = (pos < len(b)) & (b[np.minimum(pos, len(b) - 1)] == a)
    return a[ok]


def select_topk(ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, doc id asc) — HitQueue.java:76-81 semantics."""
    n = len(ids)
    if n == 0 or k <= 0:
        return ids[:0], scores[:0]
    if n > 4 * k and n > 1024:
        part = np.argpartition(-scores, k - 1)
        # keep everything tied with the k-th score to make tie-breaks exact
        kth = scores[part[k - 1]]
        cand = np.flatnonzero(scores >= kth)
        ids, scores = ids[cand], scores[cand]
    order = np.lexsort((ids, -scores))[:k]
    return ids[order], scores[order]


def merge_topk(
    parts: list[tuple[np.ndarray, np.ndarray]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """TopDocs.merge analog (search/TopDocs.java:209-330): k-way merge of
    per-segment top-k lists; tie-break by global doc id (globally unique)."""
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    ids = np.concatenate([p[0] for p in parts])
    scores = np.concatenate([p[1] for p in parts])
    return select_topk(ids, scores, k)
