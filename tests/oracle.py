"""Independent brute-force BM25 oracle used by tests (FIXTURES.md §6).

Computes top-k straight from the corpus table — no segments, no codec, no
shuffle — with the exact reference float32 semantics (SURVEY.md §2.6). The
index-based engines (exhaustive and WAND, at any parallelism) must reproduce
its (doc_id, score-bit-pattern) rows exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_solr_ray.analysis.tokenizer import StandardAnalyzer, analyze_with_positions
from lucene_solr_ray.search.bm25 import BM25Similarity
from lucene_solr_ray.search.query import BooleanQuery, MatchAllQuery, Query, TermQuery
from lucene_solr_ray.util.smallfloat import int_to_byte4


class BruteForceIndex:
    def __init__(self, corpus: pa.Table, analyzer: StandardAnalyzer | None = None):
        analyzer = analyzer or StandardAnalyzer()
        keys = list(
            zip(corpus["repo"].to_pylist(), corpus["path"].to_pylist(), corpus["commit"].to_pylist())
        )
        order = sorted(range(len(keys)), key=lambda i: keys[i])
        contents = corpus["content"].to_pylist()
        self.n = len(keys)
        self.tf: list[dict[str, int]] = []
        self.field_len = np.zeros(self.n, dtype=np.int64)
        for new_id, i in enumerate(order):
            toks = [t for t, _ in analyze_with_positions(contents[i] or "", analyzer)]
            d: dict[str, int] = {}
            for t in toks:
                d[t] = d.get(t, 0) + 1
            self.tf.append(d)
            self.field_len[new_id] = len(toks)
        self.norm_byte = int_to_byte4(self.field_len)
        self.df: dict[str, int] = {}
        for d in self.tf:
            for t in d:
                self.df[t] = self.df.get(t, 0) + 1
        self.sum_ttf = int(self.field_len.sum())

    def topk(self, q: Query, k: int, sim: BM25Similarity | None = None):
        sim = sim or BM25Similarity()
        cache = sim.norm_cache(sim.avgdl(self.sum_ttf, self.n))
        ids, scores = self._score(q, sim, cache)
        order = np.lexsort((ids, -scores))[:k]
        return ids[order], scores[order]

    def _term(self, q: TermQuery, sim, cache):
        ids = np.array([d for d in range(self.n) if q.term in self.tf[d]], dtype=np.int64)
        if len(ids) == 0:
            return ids, np.empty(0, dtype=sim.dtype)
        freqs = np.array([self.tf[d][q.term] for d in ids], dtype=np.int64)
        w = sim.weight_value(self.df.get(q.term, 0), self.n, q.boost)
        return ids, sim.score_freqs(w, freqs, self.norm_byte[ids], cache)

    def _score(self, q: Query, sim, cache):
        if isinstance(q, TermQuery):
            return self._term(q, sim, cache)
        if isinstance(q, MatchAllQuery):
            ids = np.arange(self.n, dtype=np.int64)
            return ids, np.full(self.n, q.boost, dtype=sim.dtype)
        assert isinstance(q, BooleanQuery)
        must = [self._score(c, sim, cache) for c in sorted(q.must, key=repr)]
        should = [self._score(c, sim, cache) for c in sorted(q.should, key=repr)]
        must_not = [self._score(c, sim, cache) for c in sorted(q.must_not, key=repr)]
        acc = np.zeros(self.n, dtype=sim.dtype)
        cnt = np.zeros(self.n, dtype=np.int64)
        mcnt = np.zeros(self.n, dtype=np.int64)
        for ids, sc in must:
            acc[ids] += sc
            mcnt[ids] += 1
        for ids, sc in should:
            acc[ids] += sc
            cnt[ids] += 1
        mask = mcnt == len(must)
        if q.must:
            if q.min_should_match > 0:
                mask &= cnt >= q.min_should_match
        else:
            mask &= cnt >= max(1, q.min_should_match)
        for ids, _ in must_not:
            excl = np.zeros(self.n, dtype=bool)
            excl[ids] = True
            mask &= ~excl
        ids = np.flatnonzero(mask).astype(np.int64)
        return ids, acc[ids]
