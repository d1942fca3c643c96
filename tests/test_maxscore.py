"""{!maxscore} parser (solr/core/.../search/MaxScoreQParser.java): SHOULD
clauses regrouped under one DisjunctionMaxQuery(tie); MUST/MUST_NOT pass
through. Engine-level identity: tie=1.0 == plain boolean sum."""

import numpy as np
import pytest
import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher, parse_query
from lucene_solr_ray.search.query import (
    BooleanQuery,
    DisjunctionMaxQuery,
    TermQuery,
    parse_maxscore,
)


def test_maxscore_shape():
    q = parse_maxscore("foo bar +cat -dog", tie=0.3)
    assert isinstance(q, BooleanQuery)
    assert q.must == [TermQuery("cat")] and q.must_not == [TermQuery("dog")]
    assert len(q.should) == 1 and isinstance(q.should[0], DisjunctionMaxQuery)
    assert q.should[0].tie_breaker == 0.3
    assert tuple(q.should[0].disjuncts) == tuple(parse_query("foo bar +cat -dog").should)
    # no-should queries pass through untouched (single bare terms parse to a
    # one-should BooleanQuery here, so they regroup into a 1-disjunct DisMax
    # — score-identical)
    assert parse_maxscore("+cat +dog") == parse_query("+cat +dog")


@pytest.fixture(scope="module")
def ms_idx(ray_session, tmp_path_factory):
    tbl = generate_corpus(800)
    d = str(tmp_path_factory.mktemp("msidx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=200)
    return Searcher(d, dtype=np.float64)


def test_tie_one_equals_boolean_sum(ms_idx):
    s = ms_idx
    a = s.search({"q": parse_maxscore("license apache merge", tie=1.0)},
                 k=20, use_ray=False).to_pandas()
    b = s.search({"q": parse_query("license apache merge")},
                 k=20, use_ray=False).to_pandas()
    assert a.to_string() == b.to_string()


def test_tie_zero_takes_max_only(ms_idx):
    s = ms_idx
    ms = s.search({"q": parse_maxscore("license apache", tie=0.0)},
                  k=2000, use_ray=False).to_pandas().set_index("doc_id")
    ta = s.search({"q": TermQuery("license")}, k=2000, use_ray=False) \
        .to_pandas().set_index("doc_id")
    tb = s.search({"q": TermQuery("apache")}, k=2000, use_ray=False) \
        .to_pandas().set_index("doc_id")
    for d, row in ms.iterrows():
        best = max(ta.score.get(d, 0.0), tb.score.get(d, 0.0))
        assert row.score == best
