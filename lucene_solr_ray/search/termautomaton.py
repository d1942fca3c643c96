"""TermAutomatonQuery — ``lucene/sandbox/.../search/TermAutomatonQuery.java``
+ ``TermAutomatonScorer.java``.

A token automaton over positions: states connected by term-labeled arcs or
ANY arcs (one token per position, posLength=1 — the reference's stated
assumption). Matching replays the reference scorer exactly:

- the user NFA is determinized by subset construction over the symbol
  alphabet (terms ∪ ANY) — the reference calls ``Operations.determinize``;
- per doc, tokens are processed in position order; the states pending at a
  position advance via the token's term arc into the next position's state
  MULTISET (PosState.add does not dedup — freq counts paths);
- a fresh match may start from state 0 at every query-term token;
- between consecutive token positions, pending states chain forward through
  ANY arcs (TermAutomatonScorer.countMatches:265-292) — ANY advances do NOT
  fire accept counting, term arcs do (:305-330);
- ``freq`` = number of accept events; the similarity weight combines ALL
  automaton terms' stats (TermAutomatonWeight:345-356 — summed idf under
  BM25), scored through the standard tf kernel like a phrase.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: ANY-arc label (TermAutomatonQuery.createState/addAnyTransition analog)
ANY = "*any*"


@dataclass(frozen=True)
class TermAutomatonQuery:
    """``transitions``: ((from_state, label, to_state), ...) with label a
    term string or :data:`ANY`; state 0 is the start; ``accept``: accepting
    state ids. The automaton must be trimmed by the caller (unreachable
    states are harmless)."""

    transitions: tuple = ()
    accept: tuple = ()
    boost: float = 1.0
    field: str = "content"

    def terms(self) -> set[str]:
        return {lbl for _, lbl, _ in self.transitions if lbl != ANY}


def determinize(q: TermAutomatonQuery):
    """Subset construction → (step: dict[(state, label)] -> state,
    accept: set[int], has_any: bool). DFA state 0 = NFA {0}.

    ANY folds into the term alphabet BEFORE determinization
    (TermAutomatonQuery.finish:171-181 rewrites ANY transitions to match
    every term symbol): a state's step on term t is its t-arcs ∪ its
    ANY-arcs, merged into ONE determinized union state — so a pending
    state with an ANY arc also advances when a query-term token event
    occurs at the gap position (one multiset entry, not two). The ANY
    label keeps its own step column for the between-events gap chain."""
    arcs: dict[tuple[int, str], set[int]] = {}
    labels: set[str] = set()
    for frm, lbl, to in q.transitions:
        arcs.setdefault((int(frm), lbl), set()).add(int(to))
        labels.add(lbl)
    has_any = ANY in labels
    nfa_accept = set(int(a) for a in q.accept)
    start = frozenset({0})
    ids = {start: 0}
    todo = [start]
    step: dict[tuple[int, str], int] = {}
    accept: set[int] = set()
    if start & nfa_accept:
        accept.add(0)
    while todo:
        cur = todo.pop()
        cid = ids[cur]
        any_targets = (
            frozenset(t for s in cur for t in arcs.get((s, ANY), ()))
            if has_any else frozenset()
        )
        for lbl in labels:
            nxt = frozenset(
                t for s in cur for t in arcs.get((s, lbl), ())
            )
            if lbl != ANY:
                nxt = nxt | any_targets
            if not nxt:
                continue
            nid = ids.get(nxt)
            if nid is None:
                nid = ids[nxt] = len(ids)
                todo.append(nxt)
                if nxt & nfa_accept:
                    accept.add(nid)
            step[(cid, lbl)] = nid
    return step, accept, has_any


def automaton_doc_freq(pos_of: dict[str, np.ndarray], step: dict,
                       accept: set, has_any: bool) -> int:
    """Per-doc freq = number of START POSITIONS whose deterministic DFA run
    reaches an accept state (``pos_of``: query term → ascending positions
    present in the doc).

    Semantics note vs TermAutomatonScorer.countMatches (:265-330): the
    reference replays a state MULTISET in which a state pending at a
    query-term event position advances twice — once through the ANY-folded
    term step and once more through the between-events ANY gap chain
    (positions[lastPos] is not cleared after the event) — so one start
    position can contribute 2+ accept events when a gap position holds
    another query-term token (e.g. ``data data row`` under ``data ANY
    row``). We implement the declarative automaton-intersection count (one
    per start position with a valid path), which the multiset replay
    equals in the fork-free case and which matches phrase-query freq on
    the gap-free automatons the reference's own tests check. Each run
    steps per position: query-term token → term∪ANY union arc; any other
    position (non-query token or stopword hole — the scorer cannot
    distinguish them) → ANY arc."""
    events = sorted(
        (int(p), t) for t, ps in pos_of.items() for p in ps
    )
    if not events:
        return 0
    freq = 0
    # runs: start position → current DFA state; every active run has
    # consumed all positions < frontier
    runs: dict[int, int] = {}
    frontier = -1
    for pos, term in events:
        if runs and frontier < pos:
            if has_any:
                gap = pos - frontier
                nxt: dict[int, int] = {}
                for start, s in runs.items():
                    for _ in range(gap):
                        s = step.get((s, ANY))
                        if s is None:
                            break
                    if s is not None:
                        nxt[start] = s
                runs = nxt
            else:
                runs = {}
        nxt = {}
        for start, s in runs.items():
            t = step.get((s, term))
            if t is not None:
                nxt[start] = t
                if t in accept:
                    freq += 1
        t = step.get((0, term))
        if t is not None and pos not in nxt:
            nxt[pos] = t
            if t in accept:
                freq += 1
        runs = nxt
        frontier = pos + 1
    return freq
