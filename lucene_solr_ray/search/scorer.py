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

import math

import numpy as np
import pyarrow as pa

from ..util.forutil import decode_postings
from .bm25 import BM25Similarity
from .query import (
    CONTENT_FIELD,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    ExpandedTermsQuery,
    FunctionScoreQuery,
    MatchAllQuery,
    MultiPhraseQuery,
    NumericRangeQuery,
    PayloadScoreQuery,
    PhraseQuery,
    Query,
    SynonymQuery,
    TermQuery,
)


def decode_segment_postings(group: pa.Table) -> dict:
    """posting rows of ONE segment → {(field, term): (local_ids, freqs)}."""
    out: dict = {}
    terms = group["term"].to_pylist()
    fields = (
        group["field"].to_pylist()
        if "field" in group.column_names
        else [CONTENT_FIELD] * len(terms)
    )
    dfs = group["df"].to_numpy()
    for i, (f, t) in enumerate(zip(fields, terms)):
        out[(f, t)] = decode_postings(
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
        postings,
        weights: dict[tuple[str, str], float],
        cache: np.ndarray,
        norms: np.ndarray,
        lazy: dict | None = None,
        doc_values: dict[str, np.ndarray] | None = None,
        seg_dir: str | None = None,
    ):
        self.sim = sim
        self.postings = postings  # {(field, term): (ids, freqs)}
        self.weights = weights  # (field, term) → idf (global per-field stats)
        self.cache = cache  # content-field norm cache
        self.norms = norms  # content-field norm bytes per local doc
        self.lazy = lazy  # {(field, term): LazyTermPostings} for positional queries
        self.doc_values = doc_values or {}  # numeric columns for range queries
        self.seg_dir = seg_dir  # enables the point-index (BKD analog) range path
        self._term_cache: dict = {}
        # fields without norms use the similarity's no-norm table through
        # the same score_freqs kernel (BM25: norm=k1, BM25Similarity.java:263;
        # TFIDF: raw score; SimilarityBase: docLen=1)
        self._nonorm_cache = sim.nonorm_cache()

    def _norm_inputs(self, field: str, ids: np.ndarray):
        """→ (norm_bytes, cache) for the field (content has real norms)."""
        if field == CONTENT_FIELD:
            return self.norms[ids], self.cache
        return np.zeros(len(ids), dtype=np.int64), self._nonorm_cache

    # ------------------------------------------------------------------
    def term_match(self, q: TermQuery) -> tuple[np.ndarray, np.ndarray]:
        key = (q.field, q.term, q.boost)
        hit = self._term_cache.get(key)
        if hit is not None:
            return hit
        if (q.field, q.term) not in self.postings:
            res = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        else:
            ids, freqs = self.postings[(q.field, q.term)]
            w = self.sim.weight_from_idf(self.weights[(q.field, q.term)], q.boost)
            nb, cache = self._norm_inputs(q.field, ids)
            scores = self.sim.score_freqs(w, freqs, nb, cache)
            res = (ids, scores)
        self._term_cache[key] = res
        return res

    def phrase_match(self, q) -> tuple[np.ndarray, np.ndarray]:
        """Phrase scoring for PhraseQuery and MultiPhraseQuery.

        slop=0 → ExactPhraseMatcher analog: intersect doc sets, count aligned
        positions. slop>0 → SloppyPhraseMatcher analog (:mod:`sloppy`):
        float freq = Σ 1/(1+matchLength). Multi-term slots union their terms'
        postings (MultiPhraseQuery.UnionPostingsEnum — merged sorted
        positions). Weight = summed idf of all terms with stats (PhraseWeight
        / MultiPhraseWeight), float64 accumulation cast once (idfExplain sums
        "into a double before casting into a float")."""
        from .query import MultiPhraseQuery
        from .sloppy import sloppy_freq

        if self.lazy is None:
            raise ValueError("phrase queries need positional postings (lazy=None)")
        if not getattr(self.sim, "supports_phrases", True):
            raise TypeError(
                f"{type(self.sim).__name__} does not support phrase scoring"
            )
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        multi = isinstance(q, MultiPhraseQuery)
        slots = [tuple(ts) for ts in q.terms] if multi else [(t,) for t in q.terms]
        offsets = [int(o) for o in q.rel_positions]

        # per-slot present postings; a slot with no present term kills the doc set
        slot_data = []  # per slot: [(ids, f_off, pos), ...] one per present term
        cand = None
        for ts in slots:
            datas = []
            union_ids = []
            for t in ts:
                tp = self.lazy.get((q.field, t))
                if tp is None or tp.df == 0:
                    continue
                ids, _ = tp.full()
                f_off, pos = tp.positions()
                datas.append((ids, f_off, pos))
                union_ids.append(ids)
            if not datas:
                return empty
            sids = (
                union_ids[0]
                if len(union_ids) == 1
                else np.unique(np.concatenate(union_ids))
            )
            cand = sids if cand is None else _intersect_sorted(cand, sids)
            if len(cand) == 0:
                return empty
            slot_data.append(datas)

        out_ids: list[int] = []
        out_freqs: list = []
        for d in cand:
            pls = []
            for datas in slot_data:
                parts = []
                for ids, f_off, pos in datas:
                    j = np.searchsorted(ids, d)
                    if j < len(ids) and ids[j] == d:
                        parts.append(pos[f_off[j] : f_off[j + 1]])
                if not parts:
                    pls = None
                    break
                pl = parts[0] if len(parts) == 1 else np.sort(np.concatenate(parts))
                pls.append(pl.astype(np.int64))
            if pls is None:
                continue
            if q.slop == 0:
                starts = None
                for off, pl in zip(offsets, pls):
                    p = pl - off
                    starts = p if starts is None else _intersect_sorted(starts, p)
                    if len(starts) == 0:
                        break
                f = len(starts) if starts is not None else 0
            else:
                f = sloppy_freq(pls, offsets, q.slop, slots, self.sim.dtype.type)
            if f:
                out_ids.append(int(d))
                out_freqs.append(f)
        if not out_ids:
            return empty
        ids = np.asarray(out_ids, dtype=np.int64)
        freqs = np.asarray(out_freqs, dtype=np.float64 if q.slop else np.int64)
        # idfExplain sums per-term idfs "into a double before casting into a
        # float" (BM25Similarity.java idfExplain) — accumulate float64, cast once
        idf_sum = 0.0
        for ts in slots:  # declared slot/term order
            for t in ts:
                w_t = self.weights.get((q.field, t))
                if w_t is not None:  # terms without stats contribute no idf
                    idf_sum += float(w_t)
        w = self.sim.weight_from_idf(self.sim.dtype.type(idf_sum), q.boost)
        nb, cache = self._norm_inputs(q.field, ids)
        scores = self.sim.score_freqs(w, freqs, nb, cache)
        return ids, scores

    def term_automaton_match(self, q) -> tuple[np.ndarray, np.ndarray]:
        """TermAutomatonQuery (sandbox/TermAutomatonScorer.java): candidate
        docs = union of the automaton terms' postings; per doc, freq =
        accept-event count of the determinized automaton run over the doc's
        positions; weight combines ALL automaton terms' stats (summed idf,
        float64 accumulation cast once), scored through the tf kernel."""
        from .termautomaton import ANY, automaton_doc_freq, determinize

        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        if self.lazy is None:
            raise ValueError("TermAutomatonQuery needs positional postings")
        step, accept, has_any = determinize(q)
        # idf accumulation order = first-appearance order in the transition
        # list (the reference's termToID insertion order — getTermID is
        # called per addTransition; float64 sum order must match the oracle)
        terms = list(dict.fromkeys(
            lbl for _, lbl, _ in q.transitions if lbl != ANY))
        data = {}
        union = []
        for t in terms:
            tp = self.lazy.get((q.field, t))
            if tp is None or tp.df == 0:
                continue
            ids, _ = tp.full()
            f_off, pos = tp.positions()
            data[t] = (ids, f_off, pos)
            union.append(ids)
        if not data:
            return empty
        cand = np.unique(np.concatenate(union))
        out_ids: list[int] = []
        out_freqs: list[int] = []
        for d in cand:
            pos_of = {}
            for t, (ids, f_off, pos) in data.items():
                j = np.searchsorted(ids, d)
                if j < len(ids) and ids[j] == d:
                    pos_of[t] = pos[f_off[j]:f_off[j + 1]]
            f = automaton_doc_freq(pos_of, step, accept, has_any)
            if f > 0:
                out_ids.append(int(d))
                out_freqs.append(f)
        if not out_ids:
            return empty
        idf_sum = 0.0
        for t in terms:
            w_t = self.weights.get((q.field, t))
            if w_t is not None:
                idf_sum += float(w_t)
        w = self.sim.weight_from_idf(self.sim.dtype.type(idf_sum), q.boost)
        ids = np.asarray(out_ids, dtype=np.int64)
        freqs = np.asarray(out_freqs, dtype=np.int64)
        nb, cache = self._norm_inputs(q.field, ids)
        return ids, self.sim.score_freqs(w, freqs, nb, cache)

    def payload_match(self, q: PayloadScoreQuery) -> tuple[np.ndarray, np.ndarray]:
        """PayloadScoreQuery over a single-term span
        (queries/payloads/PayloadScoreQuery.java PayloadSpans.collectLeaf):
        every occurrence of the term contributes a payload factor — the
        stored float32, or 1.0 for occurrences without a payload
        (PayloadDecoder.FLOAT_DECODER's null branch, modulo that snapshot's
        byte-read quirk) — folded per doc by ``func`` (currentScore) and
        finalized by docScore (avg divides by the count; all default to 1
        when no payloads were seen, which cannot happen here since df>0 ⇒
        tf≥1 occurrences). include_span_score multiplies by the wrapped
        span's BM25 score (PayloadSpanScorer.scoreCurrentDoc; a single-term
        span has matchLength 0 ⇒ sloppyFreq == tf)."""
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        if self.lazy is None:
            raise ValueError("payload queries need positional postings (lazy=None)")
        tp = self.lazy.get((q.field, q.term))
        if tp is None or tp.df == 0:
            return empty
        ids, freqs = tp.full()
        f_off, pays = tp.payloads()
        # fold in the similarity's dtype: float32 reference-faithful mode,
        # float64 sql-compat mode (the engine-wide dual-dtype convention)
        factors = np.where(np.isnan(pays), 1.0, pays).astype(self.sim.dtype)
        starts = f_off[:-1]
        counts = np.diff(f_off).astype(np.int64)
        if q.func == "sum":
            ps = np.add.reduceat(factors, starts)
        elif q.func == "avg":
            ps = (np.add.reduceat(factors, starts) / counts).astype(self.sim.dtype)
        elif q.func == "max":
            ps = np.maximum.reduceat(factors, starts)
        elif q.func == "min":
            ps = np.minimum.reduceat(factors, starts)
        else:
            raise ValueError(f"unknown payload function {q.func!r}")
        ps = ps.astype(self.sim.dtype)
        if q.include_span_score:
            w = self.sim.weight_from_idf(self.weights[(q.field, q.term)], q.boost)
            nb, cache = self._norm_inputs(q.field, ids)
            span_scores = self.sim.score_freqs(w, freqs, nb, cache)
            return ids, (span_scores * ps).astype(self.sim.dtype)
        return ids, ps

    def payload_check_match(self, q) -> tuple[np.ndarray, np.ndarray]:
        """SpanPayloadCheckQuery (queries/payloads/SpanPayloadCheckQuery.java
        PayloadChecker): enumerate the wrapped span's matches and keep those
        whose per-position payloads equal ``q.payloads`` exactly (``None`` ⇔
        the position carries no payload — a NaN in the pay stream). The
        supported shapes put clause i's term at ``start + i`` (single term,
        or ordered slop-0 near of terms), so the check is a positional
        payload lookup per clause. Scoring = the span kernel (freq = matching
        span count, width 0; weight = Σ idf)."""
        from .spans import SpanNearQuery, SpanTermQuery

        m = q.match
        if isinstance(m, SpanTermQuery):
            terms = [m.term]
        elif (isinstance(m, SpanNearQuery) and m.ordered and m.slop == 0
              and all(isinstance(c, SpanTermQuery) for c in m.clauses)):
            terms = [c.term for c in m.clauses]
        else:
            raise TypeError(
                "SpanPayloadCheckQuery supports a term or an ordered slop-0 "
                "near of terms"
            )
        if len(q.payloads) != len(terms):
            raise ValueError("one payload entry per span position required")
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        if self.lazy is None:
            raise ValueError("payload queries need positional postings (lazy=None)")
        data = {}
        for t in set(terms):
            tp = self.lazy.get((q.field, t))
            if tp is None or tp.df == 0:
                return empty
            ids, _ = tp.full()
            f_off, pos = tp.positions()
            _pf_off, pays = tp.payloads()
            data[t] = (ids, f_off, pos, pays)
        cand = None
        for t in set(terms):
            cand = data[t][0] if cand is None else _intersect_sorted(cand, data[t][0])
        if cand is None or not len(cand):
            return empty
        out_ids: list[int] = []
        out_freqs: list[float] = []
        for d in cand:
            occ = {}  # term → {position: payload}
            for t in set(terms):
                ids, f_off, pos, pays = data[t]
                j = np.searchsorted(ids, d)
                sl = slice(f_off[j], f_off[j + 1])
                occ[t] = dict(zip(pos[sl].tolist(), pays[sl].tolist()))
            freq = 0
            for p0, pay0 in occ[terms[0]].items():
                ok = _payload_eq(pay0, q.payloads[0])
                for i in range(1, len(terms)):
                    if not ok:
                        break
                    pay_i = occ[terms[i]].get(p0 + i)
                    ok = pay_i is not None and _payload_eq(pay_i, q.payloads[i])
                if ok:
                    freq += 1
            if freq:
                out_ids.append(int(d))
                out_freqs.append(float(freq))
        if not out_ids:
            return empty
        ids = np.asarray(out_ids, dtype=np.int64)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        idf_sum = 0.0
        for ft in sorted({(q.field, t) for t in terms}):
            w_t = self.weights.get(ft)
            if w_t is not None:
                idf_sum += float(w_t)
        w = self.sim.weight_from_idf(self.sim.dtype.type(idf_sum), q.boost)
        nb, cache = self._norm_inputs(q.field, ids)
        return ids, self.sim.score_freqs(w, freqs, nb, cache)

    def score_query(self, q: Query) -> tuple[np.ndarray, np.ndarray]:
        """→ (local doc ids ascending, scores). Matching docs only."""
        if isinstance(q, TermQuery):
            return self.term_match(q)
        if isinstance(q, MatchAllQuery):
            ids = np.arange(len(self.norms), dtype=np.int64)
            return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
        if isinstance(q, PhraseQuery):
            return self.phrase_match(q)
        if isinstance(q, MultiPhraseQuery):
            return self.phrase_match(q)
        from .termautomaton import TermAutomatonQuery

        if isinstance(q, TermAutomatonQuery):
            return self.term_automaton_match(q)
        if isinstance(q, ExpandedTermsQuery):
            # CONSTANT_SCORE_REWRITE result: union of doc sets, score = boost
            parts = [
                self.postings[(q.field, t)][0]
                for t in q.terms
                if (q.field, t) in self.postings
            ]
            ids = np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
            return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
        if isinstance(q, NumericRangeQuery):
            if self.seg_dir is not None:
                from ..index.points import points_available, read_points_range

                if points_available(self.seg_dir, q.field):
                    # BKD-analog path: row-group-pruned read of the sorted
                    # point sidecar instead of a full doc-values scan
                    ids = read_points_range(
                        self.seg_dir, q.field, q.lower, q.upper,
                        q.include_lower, q.include_upper)
                    return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
            vals = self.doc_values.get(q.field)
            if vals is None:
                raise KeyError(
                    f"numeric doc values for {q.field!r} not loaded into this scorer"
                )
            mask = np.ones(len(vals), dtype=bool)
            if q.lower is not None:
                mask &= (vals >= q.lower) if q.include_lower else (vals > q.lower)
            if q.upper is not None:
                mask &= (vals <= q.upper) if q.include_upper else (vals < q.upper)
            ids = np.flatnonzero(mask).astype(np.int64)
            return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
        from .query import DocValuesNumbersQuery, DocValuesTermsQuery

        if isinstance(q, (DocValuesNumbersQuery, DocValuesTermsQuery)):
            # sandbox DocValues{Numbers,Terms}Query: set membership over the
            # doc-value column, constant score
            vals = self.doc_values.get(q.field)
            if vals is None:
                raise KeyError(
                    f"doc values for {q.field!r} not loaded into this scorer"
                )
            target = q.numbers if isinstance(q, DocValuesNumbersQuery) else q.values
            mask = np.isin(vals, np.asarray(list(target)))
            ids = np.flatnonzero(mask).astype(np.int64)
            return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
        if isinstance(q, ConstantScoreQuery):
            ids, _ = self.score_query(q.query)
            return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
        if isinstance(q, BoostQuery):
            ids, s = self.score_query(q.query)
            return ids, (s * self.sim.dtype.type(q.boost)).astype(self.sim.dtype)
        if isinstance(q, FunctionScoreQuery):
            # (float)((innerScore · value) · boost) in double math
            # (FunctionScoreQuery.java:176-177, MultiplicativeBoostValuesSource)
            ids, s = self.score_query(q.query)
            vals = self.doc_values.get(q.field)
            if vals is None:
                raise KeyError(
                    f"numeric doc values for {q.field!r} not loaded into this scorer"
                )
            v = vals[ids].astype(np.float64)
            if q.transform == "log1p":
                v = np.array([math.log(1.0 + x) for x in v], dtype=np.float64)
            out = (s.astype(np.float64) * v) * np.float64(q.boost)
            return ids, out.astype(self.sim.dtype)
        from .query import BoostedQuery, FeatureQuery, FunctionQuery

        if isinstance(q, FeatureQuery):
            # FeatureQuery scorer (document/FeatureQuery.java:144-146): walk
            # the (field, feature) posting, decode the feature value from tf,
            # score = boost · fn(value) — no norms, no idf
            from ..util.feature import decode_feature_values

            key = (q.field, q.feature)
            if key not in self.postings:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype)
            ids, freqs = self.postings[key]
            f = decode_feature_values(freqs).astype(np.float64)
            w = np.float64(q.boost)
            if q.function == "log":
                # w * log(a + S) (FeatureField.java:249-251); scalar libm log
                # (numpy's SIMD log drifts 1 ulp from libm/DuckDB on some
                # inputs — same fix as the expressions module's ln)
                a = float(q.scaling_a)
                s = w * np.array([math.log(a + x) for x in f], dtype=np.float64)
            elif q.function == "saturation":
                # w * (1 - pivot/(S + pivot)) — the monotonic rewrite of
                # S/(S+pivot) (FeatureField.java:326-332)
                p = np.float64(q.pivot)
                s = w * (1.0 - p / (f + p))
            else:  # sigmoid: w * (1 - pivot^a / (S^a + pivot^a))
                p, a = np.float64(q.pivot), np.float64(q.exp)
                s = w * (1.0 - p**a / (f**a + p**a))
            return ids, s.astype(self.sim.dtype)
        if isinstance(q, FunctionQuery):
            # FunctionQuery.AllScorer (queries/function/FunctionQuery.java:
            # 87-120): every doc matches, score = boost · expr(doc values)
            vals = self._expr_values(q.expr)
            ids = np.arange(len(vals), dtype=np.int64)
            return ids, (vals * np.float64(q.boost)).astype(self.sim.dtype)
        from .query import ExternalFileFunctionQuery, FunctionRangeQuery

        if isinstance(q, ExternalFileFunctionQuery):
            # FileFloatSource.getValues: every doc matches; value = external
            # map[key] or defVal for unmapped keys (FileFloatSource.java)
            keys = self.doc_values.get(q.key_field)
            if keys is None:
                raise KeyError(
                    f"doc values for {q.key_field!r} not loaded into this scorer"
                )
            m = q.lookup()
            d = float(q.default)
            vals = np.fromiter(
                (m.get(k, d) for k in keys), dtype=np.float64, count=len(keys)
            )
            ids = np.arange(len(vals), dtype=np.int64)
            return ids, (vals * np.float64(q.boost)).astype(self.sim.dtype)
        if isinstance(q, FunctionRangeQuery):
            # {!frange}: ValueSourceRangeFilter.java ValueSourceScorer —
            # docs whose function value is in [l, u], constant score
            vals = self._expr_values(q.expr)
            mask = np.ones(len(vals), dtype=bool)
            if q.lower is not None:
                mask &= (vals >= q.lower) if q.include_lower else (vals > q.lower)
            if q.upper is not None:
                mask &= (vals <= q.upper) if q.include_upper else (vals < q.upper)
            ids = np.flatnonzero(mask).astype(np.int64)
            return ids, np.full(len(ids), q.boost, dtype=self.sim.dtype)
        if isinstance(q, BoostedQuery):
            # BoostedQuery.CustomScorer (queries/function/BoostedQuery.java:
            # 92-113): score = inner · expr(doc), double math, cast once
            ids, s = self.score_query(q.query)
            vals = self._expr_values(q.expr)
            out = s.astype(np.float64) * vals[ids]
            return ids, out.astype(self.sim.dtype)
        if isinstance(q, PayloadScoreQuery):
            return self.payload_match(q)
        from .spans import SpanPayloadCheckQuery

        if isinstance(q, SpanPayloadCheckQuery):
            return self.payload_check_match(q)
        if isinstance(q, SynonymQuery):
            return self._synonym_match(q)
        from .query import BlendedTermQuery

        if isinstance(q, BlendedTermQuery):
            return self._blended(q)
        if isinstance(q, DisjunctionMaxQuery):
            return self._dismax(q)
        from .query import CoveringQuery

        if isinstance(q, CoveringQuery):
            # CoveringScorer: dense accumulation (sum + match count), then a
            # PER-DOC threshold minMatch = max(1, source(doc))
            # (sandbox/search/CoveringScorer.java:127-133, 204-209)
            vals = self.doc_values.get(q.field)
            if vals is None:
                raise KeyError(
                    f"numeric doc values for {q.field!r} not loaded into this scorer"
                )
            src = vals.astype(np.int64)
            if q.mod is not None:
                src = q.offset + (src % q.mod)
            min_match = np.maximum(1, src)
            n = len(self.norms)
            acc = np.zeros(n, dtype=self.sim.dtype)
            cnt = np.zeros(n, dtype=np.int32)
            for c in q.queries:
                cids, cscores = self.score_query(c)
                acc[cids] += cscores
                cnt[cids] += 1
            ids = np.flatnonzero(cnt >= min_match).astype(np.int64)
            return ids, acc[ids]
        if isinstance(q, BooleanQuery):
            return self._score_boolean(q)
        from .spans import SPAN_TYPES

        if isinstance(q, SPAN_TYPES):
            return self.span_match(q)
        from .intervals import IntervalQuery

        if isinstance(q, IntervalQuery):
            return self.interval_match(q)
        raise TypeError(f"unsupported query node: {type(q)}")

    def interval_match(self, q) -> tuple[np.ndarray, np.ndarray]:
        """IntervalQuery scoring (see :mod:`intervals`): per-doc minimal
        intervals, float freq = Σ 1/(end-start+1) (IntervalScorer), weight =
        summed idf of the extracted terms, same norm-cache kernel as
        phrases."""
        from .intervals import (
            interval_freq,
            interval_required_groups,
            interval_scoring_terms,
            interval_terms,
        )

        if self.lazy is None:
            raise ValueError("interval queries need positional postings (lazy=None)")
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        data = {}
        for t in sorted(interval_terms(q)):
            tp = self.lazy.get((q.field, t))
            if tp is not None and tp.df > 0:
                ids, _ = tp.full()
                f_off, pos = tp.positions()
                data[t] = (ids, f_off, pos)
        if not data:
            return empty
        # candidate docs: every required group's term-union must be present
        cand = None
        for grp in interval_required_groups(q):
            parts = [data[t][0] for t in sorted(grp) if t in data]
            if not parts:
                return empty
            u = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
            cand = u if cand is None else _intersect_sorted(cand, u)
            if len(cand) == 0:
                return empty
        out_ids: list[int] = []
        out_freqs: list[float] = []
        for d in cand:
            pos_of = {}
            for t, (ids, f_off, pos) in data.items():
                j = np.searchsorted(ids, d)
                if j < len(ids) and ids[j] == d:
                    pos_of[t] = pos[f_off[j] : f_off[j + 1]].astype(np.int64)
            f = interval_freq(q.source, pos_of, self.sim.dtype.type)
            if f:
                out_ids.append(int(d))
                out_freqs.append(f)
        if not out_ids:
            return empty
        ids = np.asarray(out_ids, dtype=np.int64)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        idf_sum = 0.0
        for t in sorted(interval_scoring_terms(q)):
            w_t = self.weights.get((q.field, t))
            if w_t is not None:
                idf_sum += float(w_t)
        w = self.sim.weight_from_idf(self.sim.dtype.type(idf_sum), q.boost)
        nb, cache = self._norm_inputs(q.field, ids)
        scores = self.sim.score_freqs(w, freqs, nb, cache)
        return ids, scores

    def span_match(self, q) -> tuple[np.ndarray, np.ndarray]:
        """Span query scoring (see :mod:`spans`): enumerate per-doc spans,
        float freq = Σ 1/(1+width), weight = summed idf of clause terms
        (SpanWeight.buildSimWeight), same norm-cache kernel as phrases."""
        from .spans import (
            SpanContainingQuery,
            SpanNearQuery,
            SpanNotQuery,
            SpanWithinQuery,
            span_freq,
            span_scoring_terms,
            span_terms,
        )

        if self.lazy is None:
            raise ValueError("span queries need positional postings (lazy=None)")
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype))
        pairs = sorted(span_terms(q))
        data = {}
        for f, t in pairs:
            tp = self.lazy.get((f, t))
            if tp is not None and tp.df > 0:
                ids, _ = tp.full()
                f_off, pos = tp.positions()
                data[t] = (ids, f_off, pos)
        if not data:
            return empty
        # candidates come from the matching side only (SpanNot: include)
        target = q.include if isinstance(q, SpanNotQuery) else q
        if isinstance(target, (SpanContainingQuery, SpanWithinQuery)):
            # prepareConjunction (SpanContainQuery.java): docs must have both
            # big and little spans
            cand = None
            for side in (target.big, target.little):
                parts = [data[t][0] for _f, t in sorted(span_terms(side)) if t in data]
                if not parts:
                    return empty
                u = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
                cand = u if cand is None else _intersect_sorted(cand, u)
                if len(cand) == 0:
                    return empty
        elif isinstance(target, SpanNearQuery):
            # candidate docs: every clause's term-union must be present
            cand = None
            for c in target.clauses:
                parts = [data[t][0] for _f, t in sorted(span_terms(c)) if t in data]
                if not parts:
                    return empty
                u = parts[0] if len(parts) == 1 else np.unique(np.concatenate(parts))
                cand = u if cand is None else _intersect_sorted(cand, u)
                if len(cand) == 0:
                    return empty
        else:
            parts = [data[t][0] for _f, t in sorted(span_terms(target)) if t in data]
            if not parts:
                return empty
            cand = np.unique(np.concatenate(parts))
        out_ids: list[int] = []
        out_freqs: list[float] = []
        for d in cand:
            pos_of = {}
            for t, (ids, f_off, pos) in data.items():
                j = np.searchsorted(ids, d)
                if j < len(ids) and ids[j] == d:
                    pos_of[t] = pos[f_off[j] : f_off[j + 1]].astype(np.int64)
            f = span_freq(q, pos_of, self.sim.dtype.type)
            if f:
                out_ids.append(int(d))
                out_freqs.append(f)
        if not out_ids:
            return empty
        ids = np.asarray(out_ids, dtype=np.int64)
        freqs = np.asarray(out_freqs, dtype=np.float64)
        idf_sum = 0.0
        for f, t in sorted(span_scoring_terms(q)):
            w_t = self.weights.get((f, t))
            if w_t is not None:
                idf_sum += float(w_t)
        w = self.sim.weight_from_idf(self.sim.dtype.type(idf_sum), q.boost)
        nb, cache = self._norm_inputs(q.field, ids)
        scores = self.sim.score_freqs(w, freqs, nb, cache)
        return ids, scores

    def _synonym_match(self, q: SynonymQuery) -> tuple[np.ndarray, np.ndarray]:
        """SynonymQuery.java: freq = Σ tf across synonyms; stats as if one
        term with the max docFreq (⇔ the minimum idf of the set)."""
        present = [t for t in q.terms if (q.field, t) in self.postings]
        if not present:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype)
        cat_ids = np.concatenate([self.postings[(q.field, t)][0] for t in present])
        cat_tfs = np.concatenate(
            [self.postings[(q.field, t)][1] for t in present]
        ).astype(np.int64)
        uids, inv = np.unique(cat_ids, return_inverse=True)
        fsum = np.zeros(len(uids), dtype=np.int64)
        np.add.at(fsum, inv, cat_tfs)
        cand_w = [w for t in q.terms if (w := self.weights.get((q.field, t))) is not None]
        idf = min(cand_w)  # idf of the max-df synonym (df=0 terms have no stats)
        w = self.sim.weight_from_idf(idf, q.boost)
        nb, cache = self._norm_inputs(q.field, uids)
        return uids, self.sim.score_freqs(w, fsum, nb, cache)

    def _blended(self, q) -> tuple[np.ndarray, np.ndarray]:
        """BlendedTermQuery: every present term scores with the blended
        weight (idf of the max-df term), combined per the rewrite method."""
        t = self.sim.dtype.type
        present = [tm for tm in q.terms if (q.field, tm) in self.postings]
        cand_w = [w for tm in q.terms if (w := self.weights.get((q.field, tm))) is not None]
        if not present or not cand_w:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype)
        w = self.sim.weight_from_idf(min(cand_w), q.boost)
        n = len(self.norms)
        ssum = np.zeros(n, dtype=self.sim.dtype)
        smax = np.zeros(n, dtype=self.sim.dtype)
        matched = np.zeros(n, dtype=bool)
        for tm in present:  # fixed clause order = q.terms order
            ids_t, tfs_t = self.postings[(q.field, tm)]
            nb, cache = self._norm_inputs(q.field, ids_t)
            s = self.sim.score_freqs(w, tfs_t.astype(np.int64), nb, cache)
            ssum[ids_t] += s
            np.maximum.at(smax, ids_t, s)
            matched[ids_t] = True
        ids = np.flatnonzero(matched).astype(np.int64)
        if q.rewrite == "dismax":
            scores = (smax[ids] + (ssum[ids] - smax[ids]) * t(q.tie_breaker)).astype(self.sim.dtype)
        else:
            scores = ssum[ids].astype(self.sim.dtype)
        return ids, scores

    def _dismax(self, q: DisjunctionMaxQuery) -> tuple[np.ndarray, np.ndarray]:
        """DisjunctionMaxScorer.score: max + (sum - max) * tieBreaker."""
        t = self.sim.dtype.type
        n = len(self.norms)
        ssum = np.zeros(n, dtype=self.sim.dtype)
        smax = np.zeros(n, dtype=self.sim.dtype)
        matched = np.zeros(n, dtype=bool)
        for d in sorted(q.disjuncts, key=repr):  # canonical deterministic order
            ids, s = self.score_query(d)
            ssum[ids] += s
            np.maximum.at(smax, ids, s)
            matched[ids] = True
        ids = np.flatnonzero(matched).astype(np.int64)
        scores = (smax[ids] + (ssum[ids] - smax[ids]) * t(q.tie_breaker)).astype(self.sim.dtype)
        return ids, scores

    # ------------------------------------------------------------------
    def _expr_values(self, expr: str) -> np.ndarray:
        """Per-doc float64 values of a function-query expression over this
        segment's numeric doc values (cached — one vectorized pass per
        distinct expr per segment, shared by every query in the batch)."""
        cache = self.__dict__.setdefault("_expr_cache", {})
        vals = cache.get(expr)
        if vals is None:
            from .expressions import compile_expression, evaluate_full, variables

            node = compile_expression(expr)
            binds = {}
            for v in sorted(variables(node)):
                col = self.doc_values.get(v)
                if col is None:
                    raise KeyError(
                        f"numeric doc values for {v!r} not loaded into this scorer"
                    )
                binds[v] = col.astype(np.float64)
            if not binds:  # constant expression
                from .expressions import _eval_one

                vals = np.full(len(self.norms), _eval_one(node, {}), dtype=np.float64)
            else:
                vals = evaluate_full(node, binds)
            cache[expr] = vals
        return vals

    def _clauses(self, qs: list) -> list[tuple[np.ndarray, np.ndarray]]:
        # canonical deterministic clause order: sort by repr
        return [self.score_query(c) for c in sorted(qs, key=repr)]

    def _score_boolean(self, q: BooleanQuery) -> tuple[np.ndarray, np.ndarray]:
        must = self._clauses(q.must)
        should = self._clauses(q.should)
        must_not = self._clauses(q.must_not)
        filt = self._clauses(q.filter)

        if not q.must and not q.should:
            if not q.filter:
                return np.empty(0, dtype=np.int64), np.empty(0, dtype=self.sim.dtype)
            # pure-filter query: matches = filter intersection, score 0
            # (BooleanWeight: FILTER clauses never contribute to the score)
            fil_sorted = sorted(filt, key=lambda p: len(p[0]))
            ids = fil_sorted[0][0]
            for fids, _ in fil_sorted[1:]:
                ids = _intersect_sorted(ids, fids)
            scores = np.zeros(len(ids), dtype=self.sim.dtype)
        elif q.must:
            # leapfrog: intersect starting from the smallest clause
            must_sorted = sorted(must + filt, key=lambda p: len(p[0]))
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
            for fids, _ in filt:  # FILTER restricts the disjunction, scoreless
                keep, _pos = _member_mask(fids, ids)
                ids, scores = ids[keep], scores[keep]

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


def _payload_eq(stored: float, target) -> bool:
    """PayloadMatcher byte-equality in the float model: ``None`` requires the
    position to carry no payload (stored NaN); a float requires exact
    equality (both sides parsed from the same decimal literal)."""
    import math as _math

    if target is None:
        return _math.isnan(stored)
    return stored == target


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
