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
    accept: set[int], has_any: bool). DFA state 0 = NFA {0}."""
    arcs: dict[tuple[int, str], set[int]] = {}
    labels: set[str] = set()
    for frm, lbl, to in q.transitions:
        arcs.setdefault((int(frm), lbl), set()).add(int(to))
        labels.add(lbl)
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
        for lbl in labels:
            nxt = frozenset(
                t for s in cur for t in arcs.get((s, lbl), ())
            )
            if not nxt:
                continue
            nid = ids.get(nxt)
            if nid is None:
                nid = ids[nxt] = len(ids)
                todo.append(nxt)
                if nxt & nfa_accept:
                    accept.add(nid)
            step[(cid, lbl)] = nid
    return step, accept, ANY in labels


def automaton_doc_freq(pos_of: dict[str, np.ndarray], step: dict,
                       accept: set, has_any: bool) -> int:
    """Accept-event count for one doc (TermAutomatonScorer.countMatches).

    ``pos_of``: query term → ascending positions present in the doc."""
    events = sorted(
        (int(p), t) for t, ps in pos_of.items() for p in ps
    )
    if not events:
        return 0
    freq = 0
    pos_states: dict[int, list[int]] = {}
    last_pos = -1
    for pos, term in events:
        if has_any and last_pos != -1 and last_pos < pos:
            start_last = last_pos
            while last_pos < pos:
                cur = pos_states.get(last_pos, ())
                if not cur and last_pos > start_last:
                    last_pos = pos
                    break
                nxt = pos_states.setdefault(last_pos + 1, [])
                for s in cur:
                    t = step.get((s, ANY))
                    if t is not None:
                        nxt.append(t)
                last_pos += 1
        nxt = pos_states.setdefault(pos + 1, [])
        for s in pos_states.get(pos, ()):
            t = step.get((s, term))
            if t is not None:
                nxt.append(t)
                if t in accept:
                    freq += 1
        t = step.get((0, term))
        if t is not None:
            nxt.append(t)
            if t in accept:
                freq += 1
        last_pos = pos
    return freq
