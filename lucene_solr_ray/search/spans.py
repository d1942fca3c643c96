"""Span queries — ``lucene/core/src/java/org/apache/lucene/search/spans/``.

Implemented: SpanTermQuery, SpanNearQuery (ordered), SpanOrQuery,
SpanFirstQuery. Per-doc span enumeration follows the reference iterators:

- term spans: each position p is a span [p, p+1), width 0 (TermSpans).
- ordered near (NearSpansOrdered.java:60-120): iterate the first clause's
  spans; for each, advance every later clause's cursor monotonically ("as
  little as necessary") to the first span starting at or after the previous
  clause's end; matchWidth = Σ inter-clause gaps; match iff width ≤ slop.
  Cursors never reset within a doc, so overlapping fragments match exactly
  like the class javadoc's ``t1 t2 t1 t3 t2 t3`` example.
- or: all sub-spans merged by (start, end) (SpanOrQuery's ByPositionQueue).
- first: spans of the inner query with end ≤ n (SpanFirstQuery /
  SpanPositionRangeQuery with start 0).

Scoring (SpanScorer.java:80-115): float freq = Σ computeSlopFactor(width)
= Σ 1/(1+width) over enumerated spans; weight = summed idf of all clause
terms with stats (SpanWeight.buildSimWeight), scored through the same
norm-cache kernel as phrases.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .query import CONTENT_FIELD, Query


@dataclass(frozen=True)
class SpanTermQuery(Query):
    term: str
    field: str = CONTENT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Proximity query. ``ordered=True``: clauses must appear in order,
    non-overlapping, total gap ≤ slop (NearSpansOrdered). ``ordered=False``:
    clauses in any order; window matches when ``maxEnd - minStart -
    totalSpanLength ≤ slop`` (NearSpansUnordered.java:93-96)."""

    clauses: tuple  # tuple[SpanQuery-like, ...]
    slop: int = 0
    field: str = CONTENT_FIELD
    boost: float = 1.0
    ordered: bool = True


@dataclass(frozen=True)
class SpanOrQuery(Query):
    clauses: tuple
    field: str = CONTENT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """Inner spans ending within the first ``end`` positions."""

    match: Query
    end: int
    field: str = CONTENT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanPositionRangeQuery(Query):
    """Inner spans fully inside the position window [start, end]
    (SpanPositionRangeQuery.java acceptPosition: start() >= start and
    end() <= end)."""

    match: Query
    start: int
    end: int
    field: str = CONTENT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """Spans of ``include`` with no overlapping ``exclude`` span
    (SpanNotQuery.java:146-186): an include span is rejected iff some exclude
    span has ``end > include.start - pre`` and ``start - post < include.end``.
    Only include terms contribute to the weight (extractTerms, :190-193)."""

    include: Query
    exclude: Query
    pre: int = 0
    post: int = 0
    field: str = CONTENT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanContainingQuery(Query):
    """Spans of ``big`` that contain at least one span of ``little``
    (SpanContainingQuery.java:60-90: monotone little cursor — advance while
    ``little.start < big.start``, match iff ``big.end >= little.end``)."""

    big: Query
    little: Query
    field: str = CONTENT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanWithinQuery(Query):
    """Spans of ``little`` contained in a span of ``big``
    (SpanWithinQuery.java:66-95: advance big while ``big.end < little.end``,
    match iff ``big.start <= little.start``)."""

    big: Query
    little: Query
    field: str = CONTENT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanPayloadCheckQuery(Query):
    """``queries/payloads/SpanPayloadCheckQuery.java``: keep only the matches
    of ``match`` whose collected per-position payloads equal ``payloads``
    position-for-position (PayloadChecker.collectLeaf → PayloadMatcher). A
    float entry stands for the FloatEncoder bytes; ``None`` requires the
    position to carry NO payload. ``match`` must be a SpanTermQuery or an
    ordered slop-0 SpanNearQuery of SpanTermQuerys (the adjacent-phrase
    shape the reference's tests exercise — TestPayloadCheckQuery), so each
    clause i's occurrence sits at ``start + i``."""

    match: Query = None
    payloads: tuple = ()
    field: str = CONTENT_FIELD
    boost: float = 1.0


SPAN_TYPES = (SpanTermQuery, SpanNearQuery, SpanOrQuery, SpanFirstQuery,
              SpanNotQuery, SpanContainingQuery, SpanWithinQuery,
              SpanPositionRangeQuery, SpanPayloadCheckQuery)


def span_terms(q) -> set[tuple[str, str]]:
    """All terms whose positions the matcher needs (include AND exclude)."""
    if isinstance(q, SpanTermQuery):
        return {(q.field, q.term)}
    if isinstance(q, (SpanNearQuery, SpanOrQuery)):
        out: set[tuple[str, str]] = set()
        for c in q.clauses:
            out |= span_terms(c)
        return out
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery, SpanPayloadCheckQuery)):
        return span_terms(q.match)
    if isinstance(q, SpanNotQuery):
        return span_terms(q.include) | span_terms(q.exclude)
    if isinstance(q, (SpanContainingQuery, SpanWithinQuery)):
        return span_terms(q.big) | span_terms(q.little)
    return set()


def span_scoring_terms(q) -> set[tuple[str, str]]:
    """Terms contributing to the simWeight idf sum — SpanNot excludes its
    exclude side (SpanNotQuery.extractTerms delegates to includeWeight)."""
    if isinstance(q, SpanNotQuery):
        return span_scoring_terms(q.include)
    if isinstance(q, (SpanNearQuery, SpanOrQuery)):
        out: set[tuple[str, str]] = set()
        for c in q.clauses:
            out |= span_scoring_terms(c)
        return out
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery, SpanPayloadCheckQuery)):
        return span_scoring_terms(q.match)
    # SpanContainQuery passes BOTH sides into getTermContexts
    # (SpanContainingQuery.java:49-50), so both contribute to the weight
    return span_terms(q)


def doc_spans(q, pos_of: dict[str, np.ndarray]) -> list[tuple[int, int, int]]:
    """Enumerate one doc's spans for ``q`` → [(start, end, width)] in start
    order. ``pos_of``: term → ascending positions in the doc (absent terms
    omitted)."""
    if isinstance(q, SpanTermQuery):
        p = pos_of.get(q.term)
        if p is None:
            return []
        return [(int(x), int(x) + 1, 0) for x in p]
    if isinstance(q, SpanOrQuery):
        spans: list[tuple[int, int, int]] = []
        for c in q.clauses:
            spans.extend(doc_spans(c, pos_of))
        spans.sort(key=lambda s: (s[0], s[1]))
        return spans
    if isinstance(q, SpanFirstQuery):
        return [s for s in doc_spans(q.match, pos_of) if s[1] <= q.end]
    if isinstance(q, SpanPositionRangeQuery):
        return [s for s in doc_spans(q.match, pos_of)
                if s[0] >= q.start and s[1] <= q.end]
    if isinstance(q, SpanNotQuery):
        inc = doc_spans(q.include, pos_of)
        exc = doc_spans(q.exclude, pos_of)
        if not exc:
            return inc
        out_n: list[tuple[int, int, int]] = []
        j = 0  # monotone exclude cursor (SpanNotQuery.java:173-178)
        for s, e, w in inc:
            while j < len(exc) and exc[j][1] <= s - q.pre:
                j += 1
            if j >= len(exc) or exc[j][0] - q.post >= e:
                out_n.append((s, e, w))
        return out_n
    if isinstance(q, SpanContainingQuery):
        big = doc_spans(q.big, pos_of)
        little = doc_spans(q.little, pos_of)
        out_c: list[tuple[int, int, int]] = []
        j = 0
        for bs, be, bw in big:
            while j < len(little) and little[j][0] < bs:
                j += 1
            if j >= len(little):
                break
            if be >= little[j][1]:
                out_c.append((bs, be, bw))
        return out_c
    if isinstance(q, SpanWithinQuery):
        big = doc_spans(q.big, pos_of)
        little = doc_spans(q.little, pos_of)
        out_w: list[tuple[int, int, int]] = []
        j = 0
        for ls, le, lw in little:
            while j < len(big) and big[j][1] < le:
                j += 1
            if j >= len(big):
                break
            if big[j][0] <= ls:
                out_w.append((ls, le, lw))
        return out_w
    if isinstance(q, SpanNearQuery) and not q.ordered:
        return _unordered_near(q, pos_of)
    if isinstance(q, SpanNearQuery):
        subs = [doc_spans(c, pos_of) for c in q.clauses]
        if any(not s for s in subs):
            return []
        out: list[tuple[int, int, int]] = []
        n = len(subs)
        cur = [0] * n  # monotone cursors for clauses 1..n-1
        for first in subs[0]:
            prev_end = first[1]
            width = 0
            for i in range(1, n):
                spans_i = subs[i]
                j = cur[i]
                while j < len(spans_i) and spans_i[j][0] < prev_end:
                    j += 1
                cur[i] = j
                if j >= len(spans_i):
                    return out  # this clause is exhausted for the doc
                s_i = spans_i[j]
                width += s_i[0] - prev_end
                prev_end = s_i[1]
            if width <= q.slop:
                out.append((first[0], prev_end, width))
        return out
    raise TypeError(f"not a span query: {type(q)}")


def _unordered_near(q: SpanNearQuery, pos_of: dict[str, np.ndarray]) -> list[tuple[int, int, int]]:
    """NearSpansUnordered: one live span per clause in a window ordered by
    (start, end) (positionsOrdered, :105-110); match when ``maxEnd - minStart
    - totalSpanLength ≤ slop`` (atMatch, :93-96); each step advances the
    minimum span (SpanTotalLengthEndPositionWindow.nextPosition, :75-91).
    Emitted width = ``maxEnd - minStart`` (width(), :165-169)."""
    subs = [doc_spans(c, pos_of) for c in q.clauses]
    if any(not s for s in subs):
        return []
    n = len(subs)
    cur = [0] * n
    total_len = sum(subs[i][0][1] - subs[i][0][0] for i in range(n))
    max_end = max(subs[i][0][1] for i in range(n))
    out: list[tuple[int, int, int]] = []
    while True:
        top_i = min(range(n), key=lambda i: (subs[i][cur[i]][0], subs[i][cur[i]][1]))
        s_top = subs[top_i][cur[top_i]]
        if max_end - s_top[0] - total_len <= q.slop:
            out.append((s_top[0], max_end, max_end - s_top[0]))
        nxt = cur[top_i] + 1
        if nxt >= len(subs[top_i]):
            return out
        total_len -= s_top[1] - s_top[0]
        cur[top_i] = nxt
        s_new = subs[top_i][nxt]
        total_len += s_new[1] - s_new[0]
        if s_new[1] > max_end:
            max_end = s_new[1]


def span_freq(q, pos_of: dict[str, np.ndarray], ftype) -> float:
    """SpanScorer.setFreqCurrentDoc: freq = Σ 1/(1+width), float accumulation."""
    spans = doc_spans(q, pos_of)
    if not spans:
        return 0.0
    one = ftype(1)
    freq = ftype(0)
    for _s, _e, w in spans:
        freq = ftype(freq + one / (one + ftype(w)))
    return float(freq)
