"""Interval query tests — sandbox minimal-interval algebra
(``lucene/sandbox/.../search/intervals/``): property tests of every
combinator against naive set semantics, golden freq checks
(IntervalScorer), and engine-level brute-force match/score parity."""

import random

import numpy as np
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.intervals import (
    IContainedBy,
    IContaining,
    IMaxWidth,
    INonOverlapping,
    INotContainedBy,
    INotWithin,
    INotContaining,
    IntervalQuery,
    IOr,
    IOrdered,
    IPhrase,
    ITerm,
    IUnordered,
    interval_freq,
    interval_list,
)

F32 = np.float32


def _pos(**kw):
    return {t: np.asarray(p, dtype=np.int64) for t, p in kw.items()}


# ---------------------------------------------------------------------------
# combinator properties vs naive set semantics (disjoint positions, as in a
# real single-token-per-position stream)
# ---------------------------------------------------------------------------


def _rand_doc(rng, nterms=3, span=30, per=5):
    picks = rng.sample(range(span), min(span, nterms * per))
    return [sorted(picks[i * per : (i + 1) * per]) for i in range(nterms)]


def test_ordered_matches_double_cursor_closed_form():
    rng = random.Random(11)
    for _ in range(400):
        X, Y, _ = _rand_doc(rng)
        got = interval_list(IOrdered((ITerm("x"), ITerm("y"))), _pos(x=X, y=Y))
        exp = set()
        for px in X:
            ys = [y for y in Y if y > px]
            if ys:
                py = min(ys)
                exp.add((max(x for x in X if x < py), py))
        assert set(got) == exp
        assert got == sorted(got)  # emitted in increasing order


def test_unordered_is_minimal_envelope_antichain():
    rng = random.Random(12)
    for _ in range(400):
        X, Y, _ = _rand_doc(rng)
        got = set(interval_list(IUnordered((ITerm("x"), ITerm("y"))), _pos(x=X, y=Y)))
        cands = [(min(a, b), max(a, b)) for a in X for b in Y]
        exp = {
            c
            for c in cands
            if not any(d != c and c[0] <= d[0] and d[1] <= c[1] for d in cands)
        }
        assert got == exp


def test_unordered_no_overlaps_rejects_nested_subs():
    # inner envelope (1,5) overlaps c at 3; with allow_overlaps=False the c
    # cursor must advance past it to 8, widening the outer envelope
    pos = _pos(a=[1], b=[5], c=[3, 8])
    inner = IUnordered((ITerm("a"), ITerm("b")))
    assert interval_list(
        IUnordered((inner, ITerm("c")), allow_overlaps=True), pos
    ) == [(1, 5)]
    assert interval_list(
        IUnordered((inner, ITerm("c")), allow_overlaps=False), pos
    ) == [(1, 8)]


def test_phrase_block_adjacency():
    rng = random.Random(13)
    for _ in range(200):
        X, Y, Z = _rand_doc(rng)
        got = interval_list(
            IPhrase((ITerm("x"), ITerm("y"), ITerm("z"))), _pos(x=X, y=Y, z=Z)
        )
        exp = [(p, p + 2) for p in X if p + 1 in Y and p + 2 in Z]
        assert got == exp


def test_or_skips_intervals_containing_previous_emission():
    # sub A emits [3,4]; sub B emits [2,5] ⊇ [3,4] → B's interval is skipped
    got = interval_list(
        IOr((IUnordered((ITerm("a"), ITerm("b"))), IUnordered((ITerm("c"), ITerm("d"))))),
        _pos(a=[3], b=[4], c=[2], d=[5]),
    )
    assert got == [(3, 4)]


def test_difference_and_containment_filters():
    rng = random.Random(14)
    for _ in range(400):
        X, Y, C = _rand_doc(rng)
        pos = _pos(x=X, y=Y, c=C)
        w = rng.randint(2, 12)
        src = IMaxWidth(w, IOrdered((ITerm("x"), ITerm("y"))))
        base = interval_list(src, pos)
        assert all(e - s + 1 <= w for s, e in base)

        has_c = lambda iv: any(iv[0] <= c <= iv[1] for c in C)
        assert interval_list(INotContaining(src, ITerm("c")), pos) == [
            iv for iv in base if not has_c(iv)
        ]
        assert interval_list(IContaining(src, ITerm("c")), pos) == [
            iv for iv in base if has_c(iv)
        ]
        # containedBy / notContainedBy: width-1 c side against base envelopes
        cb = interval_list(IContainedBy(ITerm("c"), src), pos)
        exp_cb = [
            (c, c) for c in C if any(s <= c <= e for s, e in base)
        ]
        assert cb == exp_cb
        ncb = interval_list(INotContainedBy(ITerm("c"), src), pos)
        assert ncb == [(c, c) for c in C if (c, c) not in set(exp_cb)]
        # nonOverlapping with width-1 subtrahend == notContaining
        assert interval_list(INonOverlapping(src, ITerm("c")), pos) == [
            iv for iv in base if not has_c(iv)
        ]


def test_not_within_widens_subtrahend_both_ways():
    # Intervals.notWithin (DifferenceIntervalFunction.NotWithinFunction):
    # minuend survives unless a subtrahend interval lies within ``positions``
    # of it — equivalently, unless it overlaps [s-positions, e+positions]
    rng = random.Random(77)
    for _ in range(400):
        X, Y, C = _rand_doc(rng)
        pos = _pos(x=X, y=Y, c=C)
        n = rng.randint(0, 6)
        src = IMaxWidth(10, IOrdered((ITerm("x"), ITerm("y"))))
        base = interval_list(src, pos)
        got = interval_list(INotWithin(src, n, ITerm("c")), pos)
        exp = [
            (s, e) for s, e in base
            if not any(max(0, c - n) <= e and c + n >= s for c in C)
        ]
        assert got == exp
    # notWithin(_, 0, _) == nonOverlapping
    X, Y, C = _rand_doc(random.Random(5))
    pos = _pos(x=X, y=Y, c=C)
    src = IOrdered((ITerm("x"), ITerm("y")))
    assert interval_list(INotWithin(src, 0, ITerm("c")), pos) == interval_list(
        INonOverlapping(src, ITerm("c")), pos
    )


def test_interval_freq_is_sum_of_inverse_widths():
    pos = _pos(x=[0, 10], y=[3, 12])
    src = IOrdered((ITerm("x"), ITerm("y")))
    # minimal intervals: (0,3) and (10,12)
    assert interval_list(src, pos) == [(0, 3), (10, 12)]
    got = interval_freq(src, pos, F32)
    exp = F32(F32(0.0) + 1.0 / 4)
    exp = F32(exp + 1.0 / 3)
    assert got == float(exp)
    assert interval_freq(src, _pos(x=[5], y=[1]), F32) == 0.0


# ---------------------------------------------------------------------------
# engine-level: IntervalQuery through the Searcher
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(300)
    d = str(tmp_path_factory.mktemp("iv_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=120)
    return d, tbl


@pytest.mark.parametrize("use_ray", [False, True])
def test_engine_interval_query_matches_bruteforce(built, use_ray):
    from collections import Counter

    from lucene_solr_ray.analysis.tokenizer import analyze_with_positions

    d, tbl = built
    s = Searcher(d)
    docs_tokens = [analyze_with_positions(t or "") for t in tbl["content"].to_pylist()]
    cnt = Counter()
    for toks in docs_tokens[:80]:
        for (a, _pa), (b, _pb) in zip(toks, toks[2:]):
            if a != b:
                cnt[(a, b)] += 1
    (t1, t2), _ = cnt.most_common(1)[0]
    w = 5
    q = IntervalQuery(IMaxWidth(w, IOrdered((ITerm(t1), ITerm(t2)))))
    got = s.search({"q": q}, k=400, use_ray=use_ray).to_pandas()

    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    exp = {}
    for doc_id, row in enumerate(order):
        toks = docs_tokens[row]
        pos = {}
        for t, p in toks:
            pos.setdefault(t, []).append(p)
        pos_of = {t: np.asarray(p, dtype=np.int64) for t, p in pos.items()}
        f = interval_freq(IMaxWidth(w, IOrdered((ITerm(t1), ITerm(t2)))), pos_of, F32)
        if f:
            exp[doc_id] = f
    assert set(got.doc_id) == set(exp)
    assert (got.score > 0).all()


def test_engine_interval_ray_and_local_agree(built):
    d, _tbl = built
    s = Searcher(d)
    q = IntervalQuery(IMaxWidth(6, IUnordered((ITerm("license"), ITerm("apache")))))
    a = s.search({"q": q}, k=50, use_ray=False)
    b = s.search({"q": q}, k=50, use_ray=True)
    assert a.equals(b)
    assert a.num_rows > 0
