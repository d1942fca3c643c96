"""Sloppy phrase matching — SloppyPhraseMatcher.java semantics.

Per candidate doc (one that contains every phrase slot), matches are found by
propagating the least phrase-position through a priority queue keyed by
``(position - offset, offset, ord)`` (PhraseQueue.lessThan). Each reported
match contributes ``1/(1 + matchLength)`` (BM25Similarity.computeSlopFactor
→ sloppyFreq) to the float phrase freq (PhraseScorer.score accumulation).
``matchLength = end - pp.position`` where ``end`` is the largest phrase
position seen (SloppyPhraseMatcher.nextMatch:121-153).

Like the reference, not every slop-valid combination is counted — the
heap-propagation order is part of the contract (SloppyPhraseMatcher.java:41-49
documents the same asymmetry), so scores are reference-faithful by
construction.

Repeating slots (same term in several phrase positions, or multi-term slots
sharing a term) are handled with the reference's repeat-group machinery:
groups sorted by query offset, staggered initial advance
(advanceRepeatGroups:371-403), and collision resolution that always advances
the lesser of the two colliding positions (advanceRpts:231-268).
"""

from __future__ import annotations

import heapq

_EXHAUSTED = object()


class _PP:
    """PhrasePositions analog: cursor over one slot's (sorted) doc positions;
    ``position`` = token position − query offset (PhrasePositions.java)."""

    __slots__ = ("arr", "offset", "ord", "i", "position", "rpt_group", "rpt_ind")

    def __init__(self, arr, offset: int, ord_: int):
        self.arr = arr
        self.offset = offset
        self.ord = ord_
        self.i = 0
        self.position = 0
        self.rpt_group = -1
        self.rpt_ind = 0

    def next_position(self) -> bool:
        if self.i < len(self.arr):
            self.position = int(self.arr[self.i]) - self.offset
            self.i += 1
            return True
        return False

    def key(self):
        return (self.position, self.offset, self.ord)


def _repeat_groups(slot_terms: list[tuple[str, ...]],
                   offsets: list[int]) -> list[list[int]]:
    """Repeat-group detection (gatherRptGroups:461-516).

    Single-term slots: pairwise grouping of slots holding the same term at
    different query offsets (the reference's first-doc tpPos check reduces to
    term identity because one token position holds exactly one term; the
    same-offset exclusion is :474). Multi-term slots: connected components
    over shared repeating terms (the bipartite "connected regions")."""
    from collections import Counter

    cnt: Counter = Counter()
    for ts in slot_terms:
        for t in set(ts):
            cnt[t] += 1
    rpt_terms = {t for t, c in cnt.items() if c >= 2}
    if not rpt_terms:
        return []
    rpp = [i for i, ts in enumerate(slot_terms) if any(t in rpt_terms for t in ts)]
    if not any(len(slot_terms[i]) > 1 for i in rpp):
        # single-term repeats: pairwise, skipping same-offset pairs
        group_of: dict[int, int] = {}
        groups: list[list[int]] = []
        for a, i in enumerate(rpp):
            if i in group_of:
                continue
            for j in rpp[a + 1:]:
                if (j in group_of or offsets[j] == offsets[i]
                        or slot_terms[j] != slot_terms[i]):
                    continue
                g = group_of.get(i)
                if g is None:
                    g = len(groups)
                    group_of[i] = g
                    groups.append([i])
                group_of[j] = g
                groups[g].append(j)
        return [g for g in groups if len(g) >= 2]
    # multi-term: union-find over slots sharing a repeating term
    parent = list(range(len(slot_terms)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_term: dict[str, int] = {}
    for i in rpp:
        for t in slot_terms[i]:
            if t in rpt_terms:
                if t in by_term:
                    ra, rb = find(by_term[t]), find(i)
                    if ra != rb:
                        parent[rb] = ra
                else:
                    by_term[t] = i
    comp: dict[int, list[int]] = {}
    for i in rpp:
        comp.setdefault(find(i), []).append(i)
    return [g for g in comp.values() if len(g) >= 2]


class _Matcher:
    """One doc's sloppy-match iterator (state of SloppyPhraseMatcher)."""

    def __init__(self, pos_lists, offsets, slop: int, rpt_groups: list[list[int]],
                 multi_term: bool):
        self.slop = slop
        self.pps = [_PP(a, o, i) for i, (a, o) in enumerate(zip(pos_lists, offsets))]
        self.rpt_groups = [
            sorted((self.pps[i] for i in g), key=lambda p: p.offset) for g in rpt_groups
        ]
        for gi, rg in enumerate(self.rpt_groups):
            for j, pp in enumerate(rg):
                pp.rpt_group = gi
                pp.rpt_ind = j
        self.has_rpts = bool(rpt_groups)
        self.multi_term = multi_term
        self.heap: list = []
        self.end = -(1 << 60)
        self.match_length = 1 << 60
        self.positioned = self._init_positions()

    # -- heap helpers (PhraseQueue) --
    def _push(self, pp: _PP):
        heapq.heappush(self.heap, (pp.key(), pp))

    def _pop(self) -> _PP:
        return heapq.heappop(self.heap)[1]

    def _top_position(self) -> int:
        return self.heap[0][1].position

    # -- init (initPhrasePositions) --
    def _init_positions(self) -> bool:
        for pp in self.pps:
            ok = pp.next_position()  # firstPosition; pos lists are non-empty
            assert ok
        if self.has_rpts and not self._advance_repeat_groups():
            return False
        self.end = max(pp.position for pp in self.pps)
        for pp in self.pps:
            self._push(pp)
        return True

    def _advance_repeat_groups(self) -> bool:
        """advanceRepeatGroups:371-403 — stagger each group so no two PPs sit
        on the same token position."""
        for rg in self.rpt_groups:
            if self.multi_term:
                i = 0
                while i < len(rg):
                    incr = 1
                    pp = rg[i]
                    while True:
                        k = self._collide(pp)
                        if k < 0:
                            break
                        pp2 = _lesser(pp, rg[k])
                        if not pp2.next_position():
                            return False
                        if pp2.rpt_ind < i:
                            incr = 0
                            break
                    i += incr
            else:
                for j in range(1, len(rg)):
                    for _ in range(j):
                        if not rg[j].next_position():
                            return False
        return True

    def _collide(self, pp: _PP) -> int:
        tp = pp.position + pp.offset
        for pp2 in self.rpt_groups[pp.rpt_group]:
            if pp2 is not pp and pp2.position + pp2.offset == tp:
                return pp2.rpt_ind
        return -1

    def _advance_pp(self, pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > self.end:
            self.end = pp.position
        return True

    def _advance_rpts(self, pp: _PP) -> bool:
        """advanceRpts:231-268 — resolve the (single possible) collision by
        advancing the lesser pp; re-queue any in-heap pps that moved."""
        if pp.rpt_group < 0:
            return True
        rg = self.rpt_groups[pp.rpt_group]
        marked: set[int] = set()
        k0 = pp.rpt_ind
        while True:
            k = self._collide(pp)
            if k < 0:
                break
            pp = _lesser(pp, rg[k])
            if not self._advance_pp(pp):
                return False
            if k != k0:
                marked.add(k)
        # re-queue: pop until all marked pps have been seen, push back fresh
        stack = []
        while marked:
            pp2 = self._pop()
            stack.append(pp2)
            if pp2.rpt_group >= 0:
                marked.discard(pp2.rpt_ind)
        for pp2 in reversed(stack):
            self._push(pp2)
        return True

    # -- nextMatch:121-153 --
    def next_match(self) -> bool:
        if not self.positioned:
            return False
        pp = self._pop()
        self.match_length = self.end - pp.position
        next_pos = self._top_position()
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break
            if pp.position > next_pos:
                self._push(pp)
                if self.match_length <= self.slop:
                    return True
                pp = self._pop()
                next_pos = self._top_position()
                self.match_length = self.end - pp.position
            else:
                ml2 = self.end - pp.position
                if ml2 < self.match_length:
                    self.match_length = ml2
        self.positioned = False
        return self.match_length <= self.slop


def _lesser(pp: _PP, pp2: _PP) -> _PP:
    if pp.position < pp2.position or (
        pp.position == pp2.position and pp.offset < pp2.offset
    ):
        return pp
    return pp2


def sloppy_freq(pos_lists, offsets, slop: int, slot_terms: list[tuple[str, ...]],
                ftype) -> float:
    """Float phrase freq of one doc: Σ 1/(1+matchLength) over the matcher's
    match sequence, accumulated in the similarity dtype like
    PhraseScorer.score()'s float ``freq``. Returns 0.0 when no match."""
    rpt_groups = _repeat_groups(slot_terms, list(offsets))
    multi_term = any(len(ts) > 1 for ts in slot_terms)
    m = _Matcher(pos_lists, offsets, slop, rpt_groups, multi_term)
    if not m.next_match():
        return 0.0
    one = ftype(1)
    freq = one / (one + ftype(m.match_length))
    while m.next_match():
        freq = ftype(freq + one / (one + ftype(m.match_length)))
    return float(freq)
