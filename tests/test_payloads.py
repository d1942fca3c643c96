"""Payload pipeline: DelimitedPayloadTokenFilter analog at index time
(analysis/payloads/DelimitedPayloadTokenFilter.java + FloatEncoder) and
PayloadScoreQuery at query time (queries/payloads/PayloadScoreQuery.java,
{Min,Max,Average,Sum}PayloadFunction, PayloadDecoder.FLOAT_DECODER's
null-payload → 1.0 branch)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.analysis.tokenizer import ArrowAnalyzer, StandardAnalyzer
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.merge import merge_index
from lucene_solr_ray.search import Searcher, TermQuery
from lucene_solr_ray.search.query import PayloadScoreQuery

DOCS = [
    "alpha|2.0 beta|0.5 alpha|4.0 gamma",      # alpha payloads [2.0, 4.0]
    "alpha beta|3.0 beta",                     # alpha no payload; beta [3.0, none]
    "ALPHA|0.25 the a an",                     # lowercased; stopwords dropped
    "delta|x alpha|1.5",                       # "delta|x": unparseable → verbatim token
]


def _corpus(docs):
    n = len(docs)
    return pa.table(
        {
            "repo": pa.array([f"r{i}" for i in range(n)], pa.string()),
            "path": pa.array([f"p{i}.txt" for i in range(n)], pa.string()),
            "commit": pa.array(["c0"] * n, pa.string()),
            "lang": pa.array(["txt"] * n, pa.string()),
            "content": pa.array(docs, pa.string()),
        }
    )


ANALYZER = StandardAnalyzer(delimited_payload="|")


def test_analyzer_payload_alignment():
    aa = ArrowAnalyzer(ANALYZER)
    stats = aa(pa.array(DOCS, pa.large_string()), with_positions=True)
    assert stats.payloads is not None
    assert len(stats.payloads) == len(stats.positions)
    # reconstruct per-(doc, term) payload lists
    terms = stats.terms.to_pylist()
    offs = stats.offsets
    tf_cum = np.concatenate([[0], np.cumsum(stats.tfs)])
    got = {}
    for d in range(len(DOCS)):
        for j in range(offs[d], offs[d + 1]):
            sl = slice(tf_cum[j], tf_cum[j + 1])
            got[(d, terms[j])] = (
                list(stats.positions[sl]),
                [None if np.isnan(x) else float(x) for x in stats.payloads[sl]],
            )
    assert got[(0, "alpha")] == ([0, 2], [2.0, 4.0])
    assert got[(0, "beta")] == ([1], [0.5])
    assert got[(0, "gamma")] == ([3], [None])
    assert got[(1, "alpha")] == ([0], [None])
    assert got[(1, "beta")] == ([1, 2], [3.0, None])
    # lowercase applied AFTER payload split; stopwords dropped
    assert got[(2, "alpha")] == ([0], [0.25])
    assert (2, "the") not in got and (2, "a") not in got
    # field length counts kept tokens only (stopwords dropped): doc2 has 1
    assert stats.field_lens[2] == 1
    # unparseable suffix → token kept verbatim, no payload
    assert got[(3, "delta|x")] == ([0], [None])
    assert got[(3, "alpha")] == ([1], [1.5])


@pytest.fixture(scope="module")
def payload_index(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("payidx"))
    build_index(
        ray.data.from_arrow(_corpus(DOCS)), d,
        docs_per_segment=2, analyzer=ANALYZER,
    )
    return d


def _scores(searcher, q, k=10):
    t = searcher.search({"q": q}, k=k, use_ray=False).to_pandas()
    return dict(zip(t.doc_id, t.score))


def test_payload_score_functions(payload_index):
    s = Searcher(payload_index)
    # payload-only scores (include_span_score=False); missing payload → 1.0
    # alpha factors: doc0 [2,4], doc1 [1], doc2 [0.25], doc3 [1.5]
    exp = {
        "avg": {0: 3.0, 1: 1.0, 2: 0.25, 3: 1.5},
        "min": {0: 2.0, 1: 1.0, 2: 0.25, 3: 1.5},
        "max": {0: 4.0, 1: 1.0, 2: 0.25, 3: 1.5},
        "sum": {0: 6.0, 1: 1.0, 2: 0.25, 3: 1.5},
    }
    for func, want in exp.items():
        got = _scores(
            s, PayloadScoreQuery("alpha", func=func, include_span_score=False)
        )
        assert got == pytest.approx(want), func
    # beta: doc0 [0.5], doc1 [3.0, none→1.0]
    got = _scores(s, PayloadScoreQuery("beta", func="avg", include_span_score=False))
    assert got == pytest.approx({0: 0.5, 1: 2.0})


def test_payload_span_score_product(payload_index):
    s = Searcher(payload_index)
    term = _scores(s, TermQuery("alpha"))
    pay = _scores(s, PayloadScoreQuery("alpha", func="max", include_span_score=False))
    both = _scores(s, PayloadScoreQuery("alpha", func="max", include_span_score=True))
    assert set(both) == set(term)
    for d in both:
        assert both[d] == pytest.approx(
            np.float32(term[d]) * np.float32(pay[d]), rel=1e-6
        )


def test_payloads_survive_merge(payload_index):
    s = Searcher(payload_index)
    before = _scores(s, PayloadScoreQuery("alpha", func="sum", include_span_score=True))
    res = merge_index(payload_index, segs_per_tier=10)
    assert res["segments_after"] < res["segments_before"]
    after = _scores(
        Searcher(payload_index),
        PayloadScoreQuery("alpha", func="sum", include_span_score=True),
    )
    assert after == pytest.approx(before)


def test_payload_query_without_payload_index(ray_session, tmp_path):
    d = str(tmp_path / "plain")
    build_index(ray.data.from_arrow(_corpus(["alpha beta"])), d, docs_per_segment=10)
    s = Searcher(d)
    with pytest.raises(ValueError, match="payload"):
        s.search({"q": PayloadScoreQuery("alpha")}, k=5, use_ray=False)


# ---------------------------------------------------------------------------
# SpanPayloadCheckQuery
# ---------------------------------------------------------------------------

from lucene_solr_ray.search.spans import (
    SpanNearQuery,
    SpanPayloadCheckQuery,
    SpanTermQuery,
)


def test_payload_check_single_term(payload_index):
    s = Searcher(payload_index)
    # alpha payloads: doc0 [2.0@0, 4.0@2], doc1 none@0, doc2 0.25@0, doc3 1.5@1
    got = _scores(s, SpanPayloadCheckQuery(SpanTermQuery("alpha"), (2.0,)))
    assert set(got) == {0}
    got = _scores(s, SpanPayloadCheckQuery(SpanTermQuery("alpha"), (None,)))
    assert set(got) == {1}
    got = _scores(s, SpanPayloadCheckQuery(SpanTermQuery("alpha"), (9.9,)))
    assert set(got) == set()


def test_payload_check_freq_drives_score(payload_index):
    """A doc whose every occurrence matches scores like the plain term; a
    partially-matching doc scores with the reduced freq."""
    s = Searcher(payload_index)
    # beta: doc0 [0.5@1], doc1 [3.0@1, None@2]
    full = _scores(s, SpanTermQuery("beta"))
    chk = _scores(s, SpanPayloadCheckQuery(SpanTermQuery("beta"), (3.0,)))
    assert set(chk) == {1}
    lone = _scores(s, SpanPayloadCheckQuery(SpanTermQuery("beta"), (0.5,)))
    assert set(lone) == {0} and lone[0] == pytest.approx(full[0])


def test_payload_check_adjacent_pair(payload_index):
    s = Searcher(payload_index)
    # doc0: alpha|2.0 beta|0.5 → pair (alpha,beta) payloads (2.0, 0.5) at 0,1
    q = SpanPayloadCheckQuery(
        SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                      slop=0, ordered=True),
        (2.0, 0.5),
    )
    assert set(_scores(s, q)) == {0}
    q_wrong = SpanPayloadCheckQuery(
        SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                      slop=0, ordered=True),
        (2.0, 3.0),
    )
    assert set(_scores(s, q_wrong)) == set()
    # doc1 "alpha beta|3.0": bare alpha + beta 3.0
    q_bare = SpanPayloadCheckQuery(
        SpanNearQuery((SpanTermQuery("alpha"), SpanTermQuery("beta")),
                      slop=0, ordered=True),
        (None, 3.0),
    )
    assert set(_scores(s, q_bare)) == {1}
