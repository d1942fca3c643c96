"""TermAutomatonQuery (sandbox/TermAutomatonQuery.java +
TermAutomatonScorer.java): the determinized-run accept-event count, checked
against naive path enumeration on random docs, plus engine-level parity
with equivalent phrase/multi-phrase queries."""

import random

import numpy as np

from lucene_solr_ray.search.termautomaton import (
    ANY,
    TermAutomatonQuery,
    automaton_doc_freq,
    determinize,
)


def _naive_freq_linear(slots, pos_of):
    """For LINEAR slot automatons (one state per position): accept events =
    count of start positions where every slot matches at start+offset."""
    base = slots[0][0]
    freq = 0
    starts = set()
    for off, terms in [slots[0]]:
        for t in terms:
            starts.update(int(p) - (off - base) for p in pos_of.get(t, ()))
    for s0 in starts:
        ok = True
        for off, terms in slots:
            p = s0 + (off - base)
            if not any(p in set(int(x) for x in pos_of.get(t, ())) for t in terms):
                ok = False
                break
        if ok:
            freq += 1
    return freq


def _automaton_from_slots(slots):
    transitions, state, cur = [], 0, slots[0][0]
    for off, terms in slots:
        while cur < off:
            transitions.append((state, ANY, state + 1))
            state += 1
            cur += 1
        for t in terms:
            transitions.append((state, t, state + 1))
        state += 1
        cur += 1
    return TermAutomatonQuery(tuple(transitions), accept=(state,))


def test_random_linear_automata_match_naive():
    rng = random.Random(9)
    vocab = ["a", "b", "c", "d"]
    for _ in range(300):
        # random doc: one token per position (positions of query terms only;
        # other positions hold out-of-query tokens = gaps)
        n = rng.randint(4, 25)
        assign = {p: rng.choice(vocab + [None, None]) for p in range(n)}
        pos_of = {}
        for p, t in assign.items():
            if t is not None:
                pos_of.setdefault(t, []).append(p)
        pos_of = {t: np.asarray(sorted(ps)) for t, ps in pos_of.items()}
        # random linear automaton with gaps and branches
        n_slots = rng.randint(1, 3)
        offs = sorted(rng.sample(range(5), n_slots))
        slots = [
            (off, tuple(rng.sample(vocab, rng.randint(1, 2)))) for off in offs
        ]
        q = _automaton_from_slots(slots)
        step, acc, has_any = determinize(q)
        got = automaton_doc_freq(
            {t: pos_of.get(t, np.asarray([], dtype=np.int64)) for t in q.terms()},
            step, acc, has_any,
        )
        assert got == _naive_freq_linear(slots, pos_of), (slots, assign)


def test_any_gap_holding_query_term_token():
    """`data ANY row` over doc ``data data row``: the gap position holds
    another occurrence of a query term. Start 0 matches (ANY spans the
    second `data`); start 1 does not (`row` would need position 3). freq
    must be exactly 1 — the reference's multiset replay can double-advance
    here (positions[lastPos] is both term-stepped and ANY-chained); the
    declarative count is one per valid start position."""
    q = _automaton_from_slots([(0, ("data",)), (2, ("row",))])
    step, acc, has_any = determinize(q)
    pos_of = {"data": np.asarray([0, 1]), "row": np.asarray([2])}
    assert automaton_doc_freq(pos_of, step, acc, has_any) == 1


def test_any_gap_over_stopword_hole():
    """`data ANY row` over indexed positions ``data@0 row@2`` where
    position 1 is a stopword hole (posIncr accumulation skips it): the
    scorer cannot distinguish a hole from a non-query token, so ANY
    matches it (TermAutomatonScorer's gap chain advances through every
    intermediate position)."""
    q = _automaton_from_slots([(0, ("data",)), (2, ("row",))])
    step, acc, has_any = determinize(q)
    pos_of = {"data": np.asarray([0]), "row": np.asarray([2])}
    assert automaton_doc_freq(pos_of, step, acc, has_any) == 1
    # but an adjacent-slot automaton must NOT match across the hole
    q2 = _automaton_from_slots([(0, ("data",)), (1, ("row",))])
    step2, acc2, any2 = determinize(q2)
    assert automaton_doc_freq(pos_of, step2, acc2, any2) == 0


def test_engine_equals_phrase_for_adjacent_terms(ray_session, tmp_path_factory):
    import ray.data

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import PhraseQuery

    tbl = generate_corpus(600)
    d = str(tmp_path_factory.mktemp("taidx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=200)
    s = Searcher(d, dtype=np.float64)
    # adjacent two-term automaton == exact PhraseQuery (same freq and the
    # same summed-idf weight)
    ta = TermAutomatonQuery(((0, "apache", 1), (1, "license", 2)), accept=(2,))
    ph = PhraseQuery(("apache", "license"), (0, 1))
    a = s.search({"q": ta}, k=20, use_ray=False).to_pandas()
    b = s.search({"q": ph}, k=20, use_ray=False).to_pandas()
    assert a.to_string() == b.to_string()
    # and the scatter path agrees with the local path
    c = s.search({"q": ta}, k=20, use_ray=True).to_pandas()
    assert a.to_string() == c.to_string()
