"""Interval queries — the minimal-interval algebra from
``lucene/sandbox/src/java/org/apache/lucene/search/intervals/``.

Sources (``Intervals.java`` factory surface):

- :class:`ITerm` — each position p is the interval [p, p]
  (``TermIntervalsSource``).
- :class:`IPhrase` — BLOCK: sub-intervals exactly consecutive
  (``IntervalFunction.BlockIntervalIterator``).
- :class:`IOrdered` — subs in order, non-overlapping, lazily minimized
  (``IntervalFunction.OrderedIntervalIterator``).
- :class:`IUnordered` — subs in any order inside a minimized envelope,
  optionally non-overlapping
  (``IntervalFunction.UnorderedIntervalIterator``).
- :class:`IOr` — disjunction ordered by (end, start desc), skipping
  intervals that contain the previously-emitted one
  (``DisjunctionIntervalsSource.DisjunctionIntervalIterator``).
- :class:`IMaxWidth` — width filter ``end - start + 1 <= width``
  (``LowpassIntervalsSource``).
- :class:`IContaining` / :class:`IContainedBy` — monotone-cursor filters
  (``IntervalFunction.CONTAINING`` / ``CONTAINED_BY``).
- :class:`INotContaining` / :class:`INotContainedBy` /
  :class:`INonOverlapping` — difference filters over the minuend
  (``DifferenceIntervalFunction``).

Every combinator here is a direct simulation of the reference iterator
over materialized per-doc sub-interval lists (each sub-source's emitted
sequence IS the reference's lazy iterator output, so composing the
simulations reproduces the exact emitted interval sequence).

Scoring (``IntervalScorer.ensureFreq``): per doc,
``freq = Σ 1 / (end - start + 1)`` over the emitted intervals, accumulated
in float like the reference; the weight is the summed idf of all extracted
terms (``IntervalQuery.createWeight`` → ``source.extractTerms``, which for
difference sources extracts the minuend side only,
``DifferenceIntervalsSource.java:86-88``), scored through the same
norm-cache kernel as phrases.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .query import CONTENT_FIELD, Query

_INF = 1 << 31  # IntervalIterator.NO_MORE_INTERVALS stand-in


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ITerm:
    term: str


@dataclass(frozen=True)
class IPhrase:
    sources: tuple


@dataclass(frozen=True)
class IOrdered:
    sources: tuple


@dataclass(frozen=True)
class IUnordered:
    sources: tuple
    allow_overlaps: bool = True


@dataclass(frozen=True)
class IOr:
    sources: tuple


@dataclass(frozen=True)
class IMaxWidth:
    width: int
    source: object


@dataclass(frozen=True)
class IContaining:
    big: object
    small: object


@dataclass(frozen=True)
class IContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class INotContaining:
    minuend: object
    subtrahend: object


@dataclass(frozen=True)
class INotContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class INonOverlapping:
    minuend: object
    subtrahend: object


@dataclass(frozen=True)
class INotWithin:
    """Intervals.notWithin(minuend, positions, subtrahend)
    (``DifferenceIntervalFunction.NotWithinFunction``): minuend intervals
    that do not overlap any subtrahend interval widened by ``positions`` on
    both sides (start clamped at 0)."""

    minuend: object
    positions: int
    subtrahend: object


@dataclass(frozen=True)
class IntervalQuery(Query):
    """Scored interval query (``IntervalQuery.java``)."""

    source: object
    field: str = CONTENT_FIELD
    boost: float = 1.0


# ---------------------------------------------------------------------------
# term extraction
# ---------------------------------------------------------------------------


def interval_terms(src) -> set[str]:
    """All terms whose positions the evaluator needs (both sides)."""
    if isinstance(src, IntervalQuery):
        return interval_terms(src.source)
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IPhrase, IOrdered, IUnordered, IOr)):
        out: set[str] = set()
        for s in src.sources:
            out |= interval_terms(s)
        return out
    if isinstance(src, IMaxWidth):
        return interval_terms(src.source)
    if isinstance(src, IContaining):
        return interval_terms(src.big) | interval_terms(src.small)
    if isinstance(src, IContainedBy):
        return interval_terms(src.small) | interval_terms(src.big)
    if isinstance(src, INotContaining):
        return interval_terms(src.minuend) | interval_terms(src.subtrahend)
    if isinstance(src, INotContainedBy):
        return interval_terms(src.small) | interval_terms(src.big)
    if isinstance(src, INonOverlapping):
        return interval_terms(src.minuend) | interval_terms(src.subtrahend)
    if isinstance(src, INotWithin):
        return interval_terms(src.minuend) | interval_terms(src.subtrahend)
    raise TypeError(f"unknown intervals source: {type(src)}")


def interval_scoring_terms(src) -> set[str]:
    """Terms contributing to the idf weight — ``extractTerms``: difference
    sources extract the minuend only; conjunction/containing extract all."""
    if isinstance(src, IntervalQuery):
        return interval_scoring_terms(src.source)
    if isinstance(src, INotContaining):
        return interval_scoring_terms(src.minuend)
    if isinstance(src, INotContainedBy):
        return interval_scoring_terms(src.small)
    if isinstance(src, INonOverlapping):
        return interval_scoring_terms(src.minuend)
    if isinstance(src, INotWithin):
        return interval_scoring_terms(src.minuend)
    if isinstance(src, IMaxWidth):
        return interval_scoring_terms(src.source)
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IPhrase, IOrdered, IUnordered, IOr)):
        out: set[str] = set()
        for s in src.sources:
            out |= interval_scoring_terms(s)
        return out
    if isinstance(src, IContaining):
        return interval_scoring_terms(src.big) | interval_scoring_terms(src.small)
    if isinstance(src, IContainedBy):
        return interval_scoring_terms(src.small) | interval_scoring_terms(src.big)
    raise TypeError(f"unknown intervals source: {type(src)}")


def interval_required_groups(src) -> list[frozenset[str]]:
    """Conjunction approximation for candidate-doc pruning: a doc can match
    only if every returned group has at least one present term. Difference
    sources require only the minuend (the subtrahend merely filters)."""
    if isinstance(src, IntervalQuery):
        return interval_required_groups(src.source)
    if isinstance(src, ITerm):
        return [frozenset({src.term})]
    if isinstance(src, (IPhrase, IOrdered, IUnordered)):
        out: list[frozenset[str]] = []
        for s in src.sources:
            out.extend(interval_required_groups(s))
        return out
    if isinstance(src, IOr):
        return [frozenset(interval_terms(src))]
    if isinstance(src, IMaxWidth):
        return interval_required_groups(src.source)
    if isinstance(src, IContaining):
        return interval_required_groups(src.big) + interval_required_groups(src.small)
    if isinstance(src, IContainedBy):
        return interval_required_groups(src.small) + interval_required_groups(src.big)
    if isinstance(src, INotContaining):
        return interval_required_groups(src.minuend)
    if isinstance(src, INotContainedBy):
        return interval_required_groups(src.small)
    if isinstance(src, INonOverlapping):
        return interval_required_groups(src.minuend)
    if isinstance(src, INotWithin):
        return interval_required_groups(src.minuend)
    raise TypeError(f"unknown intervals source: {type(src)}")


# ---------------------------------------------------------------------------
# iterator simulations (per doc, over materialized sub-interval lists)
# ---------------------------------------------------------------------------


class _Cur:
    """Cursor over an emitted interval list: unpositioned at (-1,-1), a
    ``next()`` past the end parks at NO_MORE (s = e = _INF)."""

    __slots__ = ("iv", "i", "s", "e")

    def __init__(self, iv):
        self.iv = iv
        self.i = -1
        self.s = self.e = -1

    def next(self) -> bool:
        self.i += 1
        if self.i < len(self.iv):
            self.s, self.e = self.iv[self.i]
            return True
        self.s = self.e = _INF
        return False


def _block(subs: list[list]) -> list[tuple[int, int]]:
    """BlockIntervalIterator: subs exactly consecutive."""
    its = [_Cur(v) for v in subs]
    n = len(its)
    out: list[tuple[int, int]] = []
    while True:
        if not its[0].next():
            return out
        i = 1
        while i < n:
            while its[i].s <= its[i - 1].e:
                if not its[i].next():
                    return out
            if its[i].s == its[i - 1].e + 1:
                i += 1
            else:
                if not its[0].next():
                    return out
                i = 1
        out.append((its[0].s, its[n - 1].e))


def _ordered(subs: list[list]) -> list[tuple[int, int]]:
    """OrderedIntervalIterator (IntervalFunction.java:109-160): subs in
    order, non-overlapping, shrunk lazily within each emission."""
    its = [_Cur(v) for v in subs]
    n = len(its)
    out: list[tuple[int, int]] = []
    if not its[0].next():  # reset(): prime the first sub
        return out
    while True:
        # one nextInterval() call
        start = end = None
        b = _INF
        i = 1
        returned = False
        while not returned:
            while True:
                if its[i - 1].e >= b:
                    returned = True
                    break
                if i == n or its[i].s > its[i - 1].e:
                    break
                while True:
                    if its[i].e >= b or not its[i].next():
                        returned = True
                        break
                    if its[i].s > its[i - 1].e:
                        break
                if returned:
                    break
                i += 1
            if returned:
                break
            start, end = its[0].s, its[n - 1].e
            b = its[n - 1].s
            i = 1
            if not its[0].next():
                returned = True
        if start is None:
            return out  # NO_MORE before any candidate this call
        out.append((start, end))


def _unordered(subs: list[list], allow_overlaps: bool) -> list[tuple[int, int]]:
    """UnorderedIntervalIterator (IntervalFunction.java:182-280): queue
    ordered by (start asc, end desc), right extreme tracked, minimized."""
    import heapq

    its = [_Cur(v) for v in subs]
    n = len(its)
    heap: list[tuple[int, int, int]] = []  # (s, -e, idx)

    def in_queue():
        return [its[k] for _s, _ne, k in heap]

    def has_overlaps(cand) -> bool:
        for it in in_queue():
            if it.s < cand.s:
                if it.e >= cand.s:
                    return True
                continue
            if it.s == cand.s:
                return True
            if it.s <= cand.e:
                return True
        return False

    queue_end = -1
    # reset()
    for k, it in enumerate(its):
        if not it.next():
            break
        if not allow_overlaps:
            dead = False
            while has_overlaps(it):
                if not it.next():
                    dead = True
                    break
            if dead:
                break
        heapq.heappush(heap, (it.s, -it.e, k))
        queue_end = max(queue_end, it.e)

    out: list[tuple[int, int]] = []
    start = end = -1
    while True:
        # one nextInterval() call
        while len(heap) == n and heap[0][0] == start:
            _s, _ne, k = heapq.heappop(heap)
            it = its[k]
            if it.next():
                if not allow_overlaps:
                    dead = False
                    while has_overlaps(it):
                        if not it.next():
                            dead = True
                            break
                    if dead:
                        return out
                heapq.heappush(heap, (it.s, -it.e, k))
                queue_end = max(queue_end, it.e)
        if len(heap) < n:
            return out
        while True:
            start = its[heap[0][2]].s
            end = queue_end
            if its[heap[0][2]].e == end:
                break
            _s, _ne, k = heapq.heappop(heap)
            it = its[k]
            if it.next():
                if not allow_overlaps:
                    dead = False
                    while has_overlaps(it):
                        if not it.next():
                            dead = True
                            break
                    if dead:
                        out.append((start, end))
                        return out
                heapq.heappush(heap, (it.s, -it.e, k))
                queue_end = max(queue_end, it.e)
            if not (len(heap) == n and end == queue_end):
                break
        out.append((start, end))


def _disjunction(subs: list[list]) -> list[tuple[int, int]]:
    """DisjunctionIntervalIterator: merge by (end asc, start desc); an
    interval that CONTAINS the previously-emitted one is skipped."""
    merged = sorted((iv for v in subs for iv in v), key=lambda x: (x[1], -x[0]))
    out: list[tuple[int, int]] = []
    for s, e in merged:
        if out:
            ls, le = out[-1]
            if ls >= s and le <= e:  # contains the previous emission → skip
                continue
        out.append((s, e))
    return out


def _containing(a: list, b: list) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    bc = _Cur(b)
    if not bc.next():
        return out
    ac = _Cur(a)
    while ac.next():
        while bc.s < ac.s and bc.e < ac.e:
            if not bc.next():
                return out
        if ac.s <= bc.s and ac.e >= bc.e:
            out.append((ac.s, ac.e))
    return out


def _contained_by(a: list, b: list) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    bc = _Cur(b)
    if not bc.next():
        return out
    ac = _Cur(a)
    while ac.next():
        while bc.e < ac.e:
            if not bc.next():
                return out
        if bc.s <= ac.s:
            out.append((ac.s, ac.e))
    return out


def _not_containing(a: list, b: list) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    ac, bc = _Cur(a), _Cur(b)
    bpos = bc.next()
    while ac.next():
        if not bpos:
            out.append((ac.s, ac.e))
            continue
        while bc.s < ac.s and bc.e < ac.e:
            if not bc.next():
                bpos = False
                break
        if not bpos or bc.s > ac.e:
            out.append((ac.s, ac.e))
    return out


def _not_contained_by(a: list, b: list) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    ac, bc = _Cur(a), _Cur(b)
    bpos = bc.next()
    while ac.next():
        if not bpos:
            out.append((ac.s, ac.e))
            continue
        while bc.e < ac.e:
            if not bc.next():
                bpos = False
                break
        if not bpos or ac.s < bc.s:
            out.append((ac.s, ac.e))
    return out


def _non_overlapping(a: list, b: list) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    ac, bc = _Cur(a), _Cur(b)
    bpos = bc.next()
    while ac.next():
        if not bpos:
            out.append((ac.s, ac.e))
            continue
        while bc.e < ac.s:
            if not bc.next():
                bpos = False
                break
        if not bpos or bc.s > ac.e:
            out.append((ac.s, ac.e))
    return out


def interval_list(src, pos_of: dict[str, np.ndarray]) -> list[tuple[int, int]]:
    """Emitted minimal-interval sequence of ``src`` for one doc.

    ``pos_of`` maps term → sorted int position array (terms with no
    occurrence in the doc may be absent)."""
    if isinstance(src, ITerm):
        pos = pos_of.get(src.term)
        if pos is None:
            return []
        return [(int(p), int(p)) for p in pos]
    if isinstance(src, IPhrase):
        return _block([interval_list(s, pos_of) for s in src.sources])
    if isinstance(src, IOrdered):
        return _ordered([interval_list(s, pos_of) for s in src.sources])
    if isinstance(src, IUnordered):
        return _unordered(
            [interval_list(s, pos_of) for s in src.sources], src.allow_overlaps
        )
    if isinstance(src, IOr):
        return _disjunction([interval_list(s, pos_of) for s in src.sources])
    if isinstance(src, IMaxWidth):
        return [
            (s, e)
            for s, e in interval_list(src.source, pos_of)
            if e - s + 1 <= src.width
        ]
    if isinstance(src, IContaining):
        return _containing(
            interval_list(src.big, pos_of), interval_list(src.small, pos_of)
        )
    if isinstance(src, IContainedBy):
        return _contained_by(
            interval_list(src.small, pos_of), interval_list(src.big, pos_of)
        )
    if isinstance(src, INotContaining):
        return _not_containing(
            interval_list(src.minuend, pos_of), interval_list(src.subtrahend, pos_of)
        )
    if isinstance(src, INotContainedBy):
        return _not_contained_by(
            interval_list(src.small, pos_of), interval_list(src.big, pos_of)
        )
    if isinstance(src, INonOverlapping):
        return _non_overlapping(
            interval_list(src.minuend, pos_of), interval_list(src.subtrahend, pos_of)
        )
    if isinstance(src, INotWithin):
        # widen each subtrahend interval by ``positions`` both ways
        # (NotWithinFunction start()/end(), DifferenceIntervalFunction.java:
        # 212-228), then keep non-overlapping minuend intervals
        widened = [
            (max(0, s - src.positions), e + src.positions)
            for s, e in interval_list(src.subtrahend, pos_of)
        ]
        return _non_overlapping(interval_list(src.minuend, pos_of), widened)
    raise TypeError(f"unknown intervals source: {type(src)}")


def interval_freq(src, pos_of: dict[str, np.ndarray], ftype) -> float:
    """IntervalScorer.ensureFreq: freq += 1 / (end - start + 1) per emitted
    interval, accumulated in the similarity's float width."""
    acc = ftype(0.0)
    for s, e in interval_list(src, pos_of):
        acc = ftype(acc + 1.0 / (e - s + 1))
    return float(acc)
