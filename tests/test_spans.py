"""Span query tests: matcher-level goldens (incl. the NearSpansOrdered
javadoc example) and engine-level brute-force match-set checks."""

import numpy as np
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    doc_spans,
    span_freq,
)

F32 = np.float32


def _pos(tokens: list[str]) -> dict[str, np.ndarray]:
    out: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        out.setdefault(t, []).append(i)
    return {t: np.asarray(p, dtype=np.int64) for t, p in out.items()}


def test_term_and_or_spans():
    pos = _pos("a b a c".split())
    assert doc_spans(SpanTermQuery("a"), pos) == [(0, 1, 0), (2, 3, 0)]
    assert doc_spans(SpanOrQuery((SpanTermQuery("a"), SpanTermQuery("c"))), pos) == [
        (0, 1, 0), (2, 3, 0), (3, 4, 0)
    ]
    assert doc_spans(SpanTermQuery("zzz"), pos) == []


def test_near_ordered_javadoc_example():
    # NearSpansOrdered.java:33-41: "t1 t2 t1 t3 t2 t3" with slop >= 1
    # matches twice: (t1 t2 .. t3) and (t1 .. t2 t3)
    pos = _pos("t1 t2 t1 t3 t2 t3".split())
    q = SpanNearQuery((SpanTermQuery("t1"), SpanTermQuery("t2"), SpanTermQuery("t3")), slop=1)
    spans = doc_spans(q, pos)
    assert len(spans) == 2
    assert spans[0][0] == 0 and spans[1][0] == 2
    # slop=0 → no strictly adjacent t1 t2 t3 run
    assert doc_spans(
        SpanNearQuery((SpanTermQuery("t1"), SpanTermQuery("t2"), SpanTermQuery("t3")), slop=0),
        pos,
    ) == []


def test_near_width_and_freq():
    pos = _pos("x a y y b z".split())
    q = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=2)
    spans = doc_spans(q, pos)
    assert spans == [(1, 5, 2)]  # two gaps between a and b
    assert span_freq(q, pos, F32) == pytest.approx(1.0 / 3.0)
    # adjacency: width 0 → freq 1
    pos2 = _pos("a b".split())
    assert span_freq(SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=0), pos2, F32) == 1.0


def test_span_first():
    pos = _pos("a b c a".split())
    assert doc_spans(SpanFirstQuery(SpanTermQuery("a"), end=2), pos) == [(0, 1, 0)]
    assert doc_spans(SpanFirstQuery(SpanTermQuery("c"), end=2), pos) == []


def test_near_with_or_clause():
    pos = _pos("a x c".split())
    q = SpanNearQuery(
        (SpanTermQuery("a"), SpanOrQuery((SpanTermQuery("b"), SpanTermQuery("c")))), slop=1
    )
    spans = doc_spans(q, pos)
    assert spans == [(0, 3, 1)]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(300)
    d = str(tmp_path_factory.mktemp("span_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=120)
    return d, tbl


@pytest.mark.parametrize("use_ray", [False, True])
def test_engine_span_near_matches_bruteforce(built, use_ray):
    from collections import Counter

    from lucene_solr_ray.analysis.tokenizer import analyze_with_positions

    d, tbl = built
    s = Searcher(d)
    # pick a within-3 ordered pair present in several docs
    docs_tokens = [analyze_with_positions(t or "") for t in tbl["content"].to_pylist()]
    cnt = Counter()
    for toks in docs_tokens[:80]:
        for (a, pa), (b, pb) in zip(toks, toks[2:]):
            if a != b:
                cnt[(a, b)] += 1
    (t1, t2), _ = cnt.most_common(1)[0]
    q = SpanNearQuery((SpanTermQuery(t1), SpanTermQuery(t2)), slop=3)
    got = s.search({"q": q}, k=400, use_ray=use_ray).to_pandas()

    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    exp = set()
    for doc_id, row in enumerate(order):
        toks = docs_tokens[row]
        p1 = [p for t, p in toks if t == t1]
        p2 = [p for t, p in toks if t == t2]
        # ordered near existence: some p2 > p1 with gap ≤ slop
        if any(0 <= (b - a - 1) <= 3 for a in p1 for b in p2 if b > a):
            exp.add(doc_id)
    assert set(got.doc_id) == exp
    assert (got.score > 0).all()


def test_span_not_matcher():
    from lucene_solr_ray.search.spans import SpanNotQuery

    pos = _pos("a b a c a".split())
    inc = SpanTermQuery("a")
    # exclude 'b': the a at 0 is fine, a at 2 is fine (b at 1 doesn't overlap
    # [2,3)), all spans kept with pre=post=0
    assert doc_spans(SpanNotQuery(inc, SpanTermQuery("b")), pos) == [
        (0, 1, 0), (2, 3, 0), (4, 5, 0)
    ]
    # pre=1: b at 1 kills the a at 2 (exclude.end=2 > 2-1=1 and start-post=1 < 3)
    assert doc_spans(SpanNotQuery(inc, SpanTermQuery("b"), pre=1), pos) == [
        (0, 1, 0), (4, 5, 0)
    ]
    # post=1: b at 1 kills the a at 0 (end+post window)
    assert doc_spans(SpanNotQuery(inc, SpanTermQuery("b"), post=1), pos) == [
        (2, 3, 0), (4, 5, 0)
    ]
    # exclude a phrase: NOT(a near-0 c) removes the a at 2? span [2,4) overlaps [2,3)
    near_ac = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("c")), slop=0)
    assert doc_spans(SpanNotQuery(inc, near_ac), pos) == [(0, 1, 0), (4, 5, 0)]
    # no exclude spans in doc → all include spans pass
    assert doc_spans(SpanNotQuery(inc, SpanTermQuery("zz")), pos) == doc_spans(inc, pos)


def test_unordered_near_matcher():
    from lucene_solr_ray.search.spans import SpanNotQuery

    # b before a — ordered fails, unordered matches
    pos = _pos("b x a".split())
    qo = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=1)
    qu = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=1, ordered=False)
    assert doc_spans(qo, pos) == []
    spans = doc_spans(qu, pos)
    # window [0,3): maxEnd=3, minStart=0, totalLen=2 → 3-0-2=1 <= slop
    assert spans == [(0, 3, 3)]
    assert span_freq(qu, pos, F32) == pytest.approx(1.0 / 4.0)
    # too far apart
    pos2 = _pos("b x x a".split())
    assert doc_spans(SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")),
                                   slop=1, ordered=False), pos2) == []
    # multiple occurrences enumerate sliding windows
    pos3 = _pos("a b a".split())
    spans3 = doc_spans(SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")),
                                     slop=0, ordered=False), pos3)
    # windows: (a0,b1) then (b1,a2) — both adjacent
    assert spans3 == [(0, 2, 2), (1, 3, 2)]


@pytest.mark.parametrize("use_ray", [False, True])
def test_engine_span_not_and_unordered(built, use_ray):
    from collections import Counter

    from lucene_solr_ray.analysis.tokenizer import analyze_with_positions
    from lucene_solr_ray.search.spans import SpanNotQuery

    d, tbl = built
    s = Searcher(d)
    docs_tokens = [analyze_with_positions(t or "") for t in tbl["content"].to_pylist()]
    cnt = Counter()
    for toks in docs_tokens[:80]:
        for (a, pa), (b, pb) in zip(toks, toks[2:]):
            if a != b:
                cnt[(a, b)] += 1
    (t1, t2), _ = cnt.most_common(1)[0]
    t3 = max(
        (t for toks in docs_tokens[:40] for t, _p in toks if t not in (t1, t2)),
        key=lambda t: sum(1 for toks in docs_tokens for tt, _ in toks if tt == t),
    )
    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])

    # unordered near: existence = some window with both terms, extent-2 <= slop
    qu = SpanNearQuery((SpanTermQuery(t1), SpanTermQuery(t2)), slop=2, ordered=False)
    got = s.search({"q": qu}, k=400, use_ray=use_ray).to_pandas()
    exp = set()
    for doc_id, row in enumerate(order):
        toks = docs_tokens[row]
        p1 = [p for t, p in toks if t == t1]
        p2 = [p for t, p in toks if t == t2]
        if any(abs(a - b) - 1 <= 2 for a in p1 for b in p2):
            exp.add(doc_id)
    assert set(got.doc_id) == exp

    # span-not: t1 spans not immediately followed by t2 (post=1)
    qn = SpanNotQuery(SpanTermQuery(t1), SpanTermQuery(t2), post=1)
    gotn = s.search({"q": qn}, k=400, use_ray=use_ray).to_pandas()
    expn = set()
    for doc_id, row in enumerate(order):
        toks = docs_tokens[row]
        p1 = [p for t, p in toks if t == t1]
        p2 = set(p for t, p in toks if t == t2)
        # keep a t1 at p unless a t2 sits at p+1 within the widened window:
        # exclude [e, e+1) overlaps [p, p+1+post) iff e in {p, p+1}; e==p
        # impossible (distinct terms share no position here) → e == p+1
        if any((a + 1) not in p2 and a not in p2 for a in p1):
            expn.add(doc_id)
    assert set(gotn.doc_id) == expn


def test_containing_within_unit():
    """ContainSpans cursor algorithms on hand-built position sets
    (SpanContainingQuery.java:60-90 / SpanWithinQuery.java:66-95)."""
    import numpy as np

    from lucene_solr_ray.search.spans import (
        SpanContainingQuery,
        SpanNearQuery,
        SpanTermQuery,
        SpanWithinQuery,
        doc_spans,
    )

    pos = {
        "a": np.array([0, 10]),
        "b": np.array([3, 12]),
        "c": np.array([2, 40]),
    }
    big = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=5)
    # big spans: (0,4) and (10,13)
    assert [(s, e) for s, e, _ in doc_spans(big, pos)] == [(0, 4), (10, 13)]
    # containing: only (0,4) contains c@2
    got = doc_spans(SpanContainingQuery(big, SpanTermQuery("c")), pos)
    assert [(s, e) for s, e, _ in got] == [(0, 4)]
    # within: c@2 sits inside (0,4); c@40 in nothing
    got_w = doc_spans(SpanWithinQuery(big, SpanTermQuery("c")), pos)
    assert [(s, e) for s, e, _ in got_w] == [(2, 3)]
    # no little at all → empty both ways
    pos2 = {"a": np.array([0]), "b": np.array([2])}
    assert doc_spans(SpanContainingQuery(big, SpanTermQuery("c")), pos2) == []
    assert doc_spans(SpanWithinQuery(big, SpanTermQuery("c")), pos2) == []


def test_containing_first_following_b_only():
    """NearSpansOrdered pairs each 'a' with the FIRST following 'b'; a later
    b that would contain the little term does NOT create a span."""
    import numpy as np

    from lucene_solr_ray.search.spans import (
        SpanContainingQuery,
        SpanNearQuery,
        SpanTermQuery,
        doc_spans,
    )

    pos = {"a": np.array([0]), "b": np.array([2, 5]), "c": np.array([4])}
    big = SpanNearQuery((SpanTermQuery("a"), SpanTermQuery("b")), slop=10)
    assert [(s, e) for s, e, _ in doc_spans(big, pos)] == [(0, 3)]
    # c@4 lies only in the non-enumerated (0,6) alignment → no match
    assert doc_spans(SpanContainingQuery(big, SpanTermQuery("c")), pos) == []


def test_span_multiterm_wrapper_equals_expanded_or():
    """SpanMultiTermQueryWrapper semantics: a prefix clause inside a span is
    EXACTLY the SpanOr of its dictionary expansion (SpanRewriteMethod)."""
    import numpy as np

    from lucene_solr_ray.search.spans import (
        SpanNearQuery,
        SpanOrQuery,
        SpanTermQuery,
        doc_spans,
    )

    pos = {
        "merge": np.array([0, 9]),
        "merged": np.array([4]),
        "data": np.array([2, 5, 11]),
    }
    expanded = SpanOrQuery((SpanTermQuery("merge"), SpanTermQuery("merged")))
    q = SpanNearQuery((expanded, SpanTermQuery("data")), slop=1)
    got = [(s, e) for s, e, _ in doc_spans(q, pos)]
    # merge@0 → data@2 (gap 1); merged@4 → data@5 (gap 0); merge@9 → data@11
    # has gap 1 → also matches
    assert got == [(0, 3), (4, 6), (9, 12)]
    # slop 0 keeps only the adjacent alignment
    q0 = SpanNearQuery((expanded, SpanTermQuery("data")), slop=0)
    assert [(s, e) for s, e, _ in doc_spans(q0, pos)] == [(4, 6)]
