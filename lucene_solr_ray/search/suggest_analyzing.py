"""AnalyzingSuggester analog — suggestions keyed on ANALYZED forms.

Reference: ``lucene/suggest/src/java/org/apache/lucene/search/suggest/
analyzing/AnalyzingSuggester.java`` — the FST maps *analyzed* bytes
(tokens joined by SEP_LABEL 0x1F when PRESERVE_SEP, position holes as
0x1E when preservePositionIncrements; :120-200, TokenStreamToAutomaton)
to (cost = MAX_VALUE − weight, surface form), with:

- graph expansion: an analyzer that emits stacked tokens (synonyms)
  produces up to ``maxGraphExpansions`` analyzed paths per surface
  (:178-183);
- ``maxSurfaceFormsPerAnalyzedForm`` dup-surface cap per analyzed form,
  best weight kept (:514-568);
- lookup analyzes the query with the query analyzer, intersects the
  resulting automaton with the FST as a PREFIX (:700-760), dedups
  surfaces, and under EXACT_FIRST returns the surface equal to the typed
  key first regardless of weight (:705-760, ``sameSurfaceForm``).

The round-2/3 byte-trie (:mod:`suggest_fst` ``PrefixAutomaton``) keys RAW
terms; this module supplies the analyzed-form semantics on the same
subtree-max best-first machinery. Like the reference ``Lookup.build``, the
structure is built in one process from an (surface, weight) iterator — the
Ray side supplies that iterator as a distributed ``groupby(surface).max``
over the source table (vocabulary-sized, the same contract as the
reference's InputIterator), so nothing corpus-sized is gathered twice.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SEP_LABEL = "\x1f"   # AnalyzingSuggester.SEP_LABEL
HOLE = "\x1e"        # TokenStreamToAutomaton.HOLE
DEFAULT_MAX_SURFACE_FORMS = 256   # AnalyzingSuggester ctor default
DEFAULT_MAX_GRAPH_EXPANSIONS = 256


@dataclass
class _Node:
    children: dict[str, "_Node"] = field(default_factory=dict)
    #: (weight desc, surface asc)-sorted surfaces ENDING here, capped at
    #: max_surface_forms per analyzed form
    surfaces: list[tuple[int, str]] = field(default_factory=list)
    #: max weight in this subtree (admissible best-first bound)
    max_weight: int = 0


def analyzed_paths(text: str, analyzer, *, preserve_sep: bool = True,
                   preserve_position_increments: bool = True,
                   max_graph_expansions: int = DEFAULT_MAX_GRAPH_EXPANSIONS,
                   ) -> list[str]:
    """Analyzed key strings for ``text`` — the TokenStreamToAutomaton +
    ``maxGraphExpansions`` path enumeration. Stacked tokens (position
    overlaps, e.g. synonyms) fork alternative paths; removed stopword
    positions become HOLE pseudo-tokens when preserve_position_increments."""
    from ..analysis.tokenizer import analyze_with_positions

    toks = analyze_with_positions(text, analyzer)
    if not toks:
        return []
    # group alternatives by position (overlaps share a position)
    by_pos: dict[int, list[str]] = {}
    order: list[int] = []
    for t, p in toks:
        if p not in by_pos:
            by_pos[p] = []
            order.append(p)
        if t not in by_pos[p]:
            by_pos[p].append(t)
    order.sort()
    slots: list[list[str]] = []
    prev = None
    for p in order:
        if (preserve_position_increments and prev is not None
                and p - prev > 1):
            slots.extend([[HOLE]] * (p - prev - 1))
        slots.append(by_pos[p])
        prev = p
    sep = SEP_LABEL if preserve_sep else ""
    paths = [""]
    for alts in slots:
        nxt = []
        for base in paths:
            for a in alts:
                nxt.append(base + (sep if base else "") + a)
                if len(nxt) >= max_graph_expansions:
                    break
            if len(nxt) >= max_graph_expansions:
                break
        paths = nxt
    return paths


class AnalyzingSuggester:
    """items: iterable of (surface, weight)."""

    def __init__(self, items, analyzer=None, *, preserve_sep: bool = True,
                 exact_first: bool = False,
                 preserve_position_increments: bool = True,
                 max_surface_forms: int = DEFAULT_MAX_SURFACE_FORMS,
                 max_graph_expansions: int = DEFAULT_MAX_GRAPH_EXPANSIONS):
        from ..analysis.tokenizer import StandardAnalyzer

        self.analyzer = analyzer or StandardAnalyzer()
        self.preserve_sep = preserve_sep
        self.exact_first = exact_first
        self.preserve_position_increments = preserve_position_increments
        self.max_surface_forms = max_surface_forms
        self.max_graph_expansions = max_graph_expansions
        self.root = _Node()
        self.count = 0
        for surface, w in items:
            self._add(str(surface), int(w))

    def _paths(self, text: str) -> list[str]:
        return analyzed_paths(
            text, self.analyzer, preserve_sep=self.preserve_sep,
            preserve_position_increments=self.preserve_position_increments,
            max_graph_expansions=self.max_graph_expansions)

    def _add(self, surface: str, w: int) -> None:
        for key in self._paths(surface):
            node = self.root
            node.max_weight = max(node.max_weight, w)
            for ch in key:
                node = node.children.setdefault(ch, _Node())
                node.max_weight = max(node.max_weight, w)
            entry = (w, surface)
            if entry in node.surfaces:
                continue
            node.surfaces.append(entry)
            # (weight desc, surface asc); cap keeps the best — the
            # maxSurfaceFormsPerAnalyzedForm dedup of the sorted build loop
            node.surfaces.sort(key=lambda e: (-e[0], e[1]))
            del node.surfaces[self.max_surface_forms:]
        self.count += 1

    def _seek(self, key: str) -> _Node | None:
        node = self.root
        for ch in key:
            node = node.children.get(ch)
            if node is None:
                return None
        return node

    def lookup(self, key: str, num: int) -> list[tuple[str, int]]:
        """Top-``num`` (surface, weight): weight desc, surface asc; under
        ``exact_first`` a surface equal to the typed key is returned first
        regardless of weight (AnalyzingSuggester.lookup:705-760). Surfaces
        reachable through several analyzed paths are deduped (the
        ``seen``-set of the reference's acceptResult)."""
        import heapq

        if num <= 0 or not key:
            return []  # empty lookups return no results (javadoc bullet 4)
        starts = [n for n in (self._seek(p) for p in self._paths(key))
                  if n is not None]
        if not starts:
            return []
        results: list[tuple[str, int]] = []
        seen: set[str] = set()
        if self.exact_first:
            # an FST node with an END_BYTE arc at exactly the query's
            # analyzed form whose surface equals the typed key
            for n in starts:
                for w, s in n.surfaces:
                    if s == key:
                        results.append((s, w))
                        seen.add(s)
                        break
                if results:
                    break
            if len(results) >= num:
                return results[:num]
        # single-heap best-first (Util.TopNSearcher analog): subtree
        # entries are bounded by max_weight, concrete surfaces carry their
        # exact weight. Emitting a concrete entry on pop is safe — nothing
        # remaining (bound or exact) can beat it. Tie order at equal
        # weight: subtrees expand BEFORE concrete entries (an unexpanded
        # subtree may hold an equal-weight, smaller surface), concrete
        # entries resolve surface-ascending.
        heap: list[tuple] = []
        cnt = 0
        for n in {id(s): s for s in starts}.values():  # dedup shared nodes
            heapq.heappush(heap, (-n.max_weight, 0, cnt, n))
            cnt += 1
        while heap and len(results) < num:
            entry = heapq.heappop(heap)
            if entry[1] == 1:  # concrete surface
                w, s = -entry[0], entry[3]
                if s not in seen:
                    seen.add(s)
                    results.append((s, w))
                continue
            node = entry[3]
            for w, s in node.surfaces:
                heapq.heappush(heap, (-w, 1, s, s))
            for child in node.children.values():
                heapq.heappush(heap, (-child.max_weight, 0, cnt, child))
                cnt += 1
        return results[:num]
