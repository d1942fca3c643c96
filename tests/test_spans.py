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
