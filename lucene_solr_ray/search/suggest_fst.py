"""In-memory weighted prefix automaton — the AnalyzingSuggester/FST analog
(``lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
AnalyzingSuggester.java``; FST with weight-ordered arcs,
``lucene/core/.../util/fst/FST.java``).

The engine's term dictionary is a sorted Parquet column (row-group stats =
the BlockTree index analog) — right for the distributed scan path. What it
lacks is Lucene's HOT-PATH structure: a compact in-memory automaton that
answers "top-k completions of this prefix by weight" in microseconds
without touching storage. This module supplies that:

- :class:`PrefixAutomaton` — a byte-trie over the vocabulary where every
  node stores ``max_weight`` of its subtree (the Util.shortestPaths
  admissible bound): top-k extraction is a best-first search expanding at
  most O(k · depth) nodes, exactly how the reference walks min-cost FST
  arcs (weights are negated costs).
- built ONCE per (index generation, field) from the term dictionary and
  cached per process (searcher-side analog of the suggester's build()).

Determinism: ties (equal weight) resolve term-ascending, matching the
df-desc/term-asc ordering of the distributed suggest_prefix oracle.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field


@dataclass
class _Node:
    children: dict[str, "_Node"] = field(default_factory=dict)
    #: weight of the term ENDING here (None = not a term)
    term_weight: int | None = None
    #: max term weight in this subtree (admissible top-k bound)
    max_weight: int = 0


class PrefixAutomaton:
    """Weighted prefix trie with subtree-max pruning.

    ``items``: iterable of (term, weight). Build is O(Σ len(term));
    ``top_k(prefix, k)`` is best-first over subtree bounds.
    """

    def __init__(self, items):
        self.root = _Node()
        n = 0
        for term, w in items:
            w = int(w)
            node = self.root
            node.max_weight = max(node.max_weight, w)
            for ch in term:
                node = node.children.setdefault(ch, _Node())
                node.max_weight = max(node.max_weight, w)
            node.term_weight = w
            n += 1
        self.size = n

    def _seek(self, prefix: str) -> _Node | None:
        node = self.root
        for ch in prefix:
            node = node.children.get(ch)
            if node is None:
                return None
        return node

    def top_k(self, prefix: str, k: int) -> list[tuple[str, int]]:
        """Top-``k`` (term, weight) under ``prefix``, weight desc then term
        asc — best-first search over (-bound, term, is_subtree) heap keys
        (the Util.shortestPaths pruning of the reference's suggester).

        Correctness of emit-on-pop: every term under a pending subtree
        entry has weight ≤ its bound and sorts ≥ its prefix string, so the
        first exact entry popped cannot be beaten by anything remaining;
        total expanded nodes ≈ O(k · avg term length)."""
        start = self._seek(prefix)
        if start is None or k <= 0:
            return []
        # entries: (-weight_bound, term_so_far, exactness, node) — exactness
        # 0 for exact terms, 1 for subtrees, so an exact term pops before
        # its own extensions at equal weight (shorter term sorts first
        # anyway; the flag also keeps tuple comparison away from _Node)
        heap: list = [(-start.max_weight, prefix, 1, start)]
        out: list[tuple[str, int]] = []
        while heap and len(out) < k:
            nw, term, exact, node = heapq.heappop(heap)
            if exact == 0:
                out.append((term, -nw))
                continue
            if node.term_weight is not None:
                heapq.heappush(heap, (-node.term_weight, term, 0, None))
            for ch, child in node.children.items():
                heapq.heappush(heap, (-child.max_weight, term + ch, 1, child))
        return out


_AUTOMATON_CACHE: dict = {}
_AUTOMATON_CACHE_MAX = 8


def automaton_for(reader, fld: str) -> PrefixAutomaton:
    """Per-process automaton over the reader's (term, global df) vocabulary
    for ``fld`` — built once per (index_dir, generation, field) from a
    column-pruned distributed (term, df) aggregation, then cached (the
    suggester build() step)."""
    key = (reader.index_dir, reader.manifest.get("generation"), fld)
    hit = _AUTOMATON_CACHE.get(key)
    if hit is not None:
        return hit
    from .suggest import _term_df

    tbl = _term_df(reader, fld, lambda t: [True] * len(t))
    if len(_AUTOMATON_CACHE) >= _AUTOMATON_CACHE_MAX:
        _AUTOMATON_CACHE.clear()
    auto = PrefixAutomaton(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))
    _AUTOMATON_CACHE[key] = auto
    return auto
