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
from lucene_solr_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    ExpandedTermsQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
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
        self.pos: list[dict[str, list[int]]] = []
        self.field_len = np.zeros(self.n, dtype=np.int64)
        for new_id, i in enumerate(order):
            analyzed = analyze_with_positions(contents[i] or "", analyzer)
            d: dict[str, int] = {}
            p: dict[str, list[int]] = {}
            for t, tp in analyzed:
                d[t] = d.get(t, 0) + 1
                p.setdefault(t, []).append(tp)
            self.tf.append(d)
            self.pos.append(p)
            self.field_len[new_id] = len(analyzed)
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

    def _phrase(self, q: PhraseQuery, sim, cache):
        ids, freqs = [], []
        for d in range(self.n):
            if any(t not in self.pos[d] for t in q.terms):
                continue
            starts = None
            for t, rel in zip(q.terms, q.rel_positions):
                s = {p - rel for p in self.pos[d][t]}
                starts = s if starts is None else (starts & s)
                if not starts:
                    break
            if starts:
                ids.append(d)
                freqs.append(len(starts))
        ids = np.asarray(ids, dtype=np.int64)
        if len(ids) == 0:
            return ids, np.empty(0, dtype=sim.dtype)
        # double accumulation, single cast (BM25Similarity idfExplain)
        idf_sum = 0.0
        for t in q.terms:
            idf_sum += float(sim.idf(self.df.get(t, 0), self.n))
        w = sim.weight_from_idf(sim.dtype.type(idf_sum), q.boost)
        return ids, sim.score_freqs(w, np.asarray(freqs), self.norm_byte[ids], cache)

    def _expand(self, q) -> list[str]:
        """Independent multi-term expansion over the oracle's own vocabulary."""
        import fnmatch
        import re as _re

        vocab = sorted(self.df)
        if isinstance(q, PrefixQuery):
            return [t for t in vocab if t.startswith(q.prefix)]
        if isinstance(q, WildcardQuery):
            rx = _re.compile(fnmatch.translate(q.pattern))
            return [t for t in vocab if rx.match(t)]
        if isinstance(q, RegexpQuery):
            rx = _re.compile(f"^(?:{q.pattern})$")
            return [t for t in vocab if rx.match(t)]
        if isinstance(q, TermRangeQuery):
            out = []
            for t in vocab:
                if q.lower is not None and (t < q.lower or (t == q.lower and not q.include_lower)):
                    continue
                if q.upper is not None and (t > q.upper or (t == q.upper and not q.include_upper)):
                    continue
                out.append(t)
            return out
        if isinstance(q, FuzzyQuery):
            def dist(a, b):
                dp = list(range(len(b) + 1))
                for i, ca in enumerate(a, 1):
                    ndp = [i]
                    for j, cb in enumerate(b, 1):
                        ndp.append(min(dp[j] + 1, ndp[-1] + 1, dp[j - 1] + (ca != cb)))
                    dp = ndp
                return dp[-1]

            return [
                t
                for t in vocab
                if t.startswith(q.term[: q.prefix_length]) and dist(q.term, t) <= q.max_edits
            ]
        if isinstance(q, (TermInSetQuery, ExpandedTermsQuery)):
            return [t for t in vocab if t in set(q.terms)]
        raise TypeError(type(q))

    def _score(self, q: Query, sim, cache):
        if isinstance(q, TermQuery):
            return self._term(q, sim, cache)
        if isinstance(q, PhraseQuery):
            return self._phrase(q, sim, cache)
        if isinstance(
            q,
            (PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery, FuzzyQuery,
             TermInSetQuery, ExpandedTermsQuery),
        ):
            terms = set(self._expand(q))
            ids = np.array(
                [d for d in range(self.n) if terms & self.tf[d].keys()], dtype=np.int64
            )
            return ids, np.full(len(ids), getattr(q, "boost", 1.0), dtype=sim.dtype)
        if isinstance(q, ConstantScoreQuery):
            ids, _ = self._score(q.query, sim, cache)
            return ids, np.full(len(ids), q.boost, dtype=sim.dtype)
        if isinstance(q, BoostQuery):
            ids, s = self._score(q.query, sim, cache)
            return ids, (s * sim.dtype.type(q.boost)).astype(sim.dtype)
        if isinstance(q, SynonymQuery):
            ids, freqs = [], []
            for d in range(self.n):
                f = sum(self.tf[d].get(t, 0) for t in q.terms)
                if f:
                    ids.append(d)
                    freqs.append(f)
            ids = np.asarray(ids, dtype=np.int64)
            if len(ids) == 0:
                return ids, np.empty(0, dtype=sim.dtype)
            max_df = max(self.df.get(t, 0) for t in q.terms)
            w = sim.weight_from_idf(sim.idf(max_df, self.n), q.boost)
            return ids, sim.score_freqs(w, np.asarray(freqs), self.norm_byte[ids], cache)
        if isinstance(q, DisjunctionMaxQuery):
            t32 = sim.dtype.type
            ssum = np.zeros(self.n, dtype=sim.dtype)
            smax = np.zeros(self.n, dtype=sim.dtype)
            matched = np.zeros(self.n, dtype=bool)
            for d in sorted(q.disjuncts, key=repr):
                ids, s = self._score(d, sim, cache)
                ssum[ids] += s
                np.maximum.at(smax, ids, s)
                matched[ids] = True
            ids = np.flatnonzero(matched).astype(np.int64)
            return ids, (smax[ids] + (ssum[ids] - smax[ids]) * t32(q.tie_breaker)).astype(sim.dtype)
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
