"""edismax query parser (ExtendedDismaxQParser + SolrPluginUtils
calculateMinShouldMatch): mm-spec goldens ported from Solr's
TestSolrPluginUtils, query-tree structure, and end-to-end score equivalence
with hand-assembled query trees."""

import numpy as np
import pytest
import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.edismax import calculate_min_should_match, edismax_query
from lucene_solr_ray.search.query import (
    BooleanQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    PhraseQuery,
    TermQuery,
)


# --- calculateMinShouldMatch goldens (TestSolrPluginUtils.testMinShouldMatchCalculator)
@pytest.mark.parametrize(
    "optional,spec,want",
    [
        (5, "3", 3),
        (5, "-2", 3),
        (5, "50%", 2),
        (5, "-50%", 3),          # 5 + int(-2.5) = 3
        (5, "100%", 5),
        (3, "5", 3),             # clamp to optional count
        (5, "-6", 0),            # clamp at 0
        (5, "3<0", 0),           # 5 > 3 → sub-spec "0"
        (3, "3<0", 3),           # 3 <= 3 → all required
        (5, "3<25%", 1),
        (5, "1<50% 4<90%", 4),   # 5 > 4 → 90% of 5 → int(4.5) = 4
        (3, "1<50% 4<90%", 1),   # 3 <= 4 → stays at 50% result
        (1, "1<50% 4<90%", 1),   # 1 <= 1 → all required
    ],
)
def test_calculate_mm(optional, spec, want):
    assert calculate_min_should_match(optional, spec) == want


QF = {"content": 1.0, "lang": 3.0}


def test_tree_single_word():
    q = edismax_query("merge", qf=QF, tie=0.1)
    assert isinstance(q, DisjunctionMaxQuery)
    assert q.tie_breaker == 0.1
    assert set(q.disjuncts) == {
        TermQuery("merge", boost=1.0, field="content"),
        TermQuery("merge", boost=3.0, field="lang"),
    }


def test_tree_mm_and_signs():
    q = edismax_query("+merge spark window -dup", qf={"content": 1.0}, mm="50%")
    assert isinstance(q, BooleanQuery)
    assert q.must == [TermQuery("merge")]
    assert q.should == [TermQuery("spark"), TermQuery("window")]
    assert q.must_not == [TermQuery("dup")]
    assert q.min_should_match == 1  # 50% of 2 optional


def test_tree_phrase_and_pf():
    q = edismax_query(
        '"fast key" merge window',
        qf={"content": 1.0},
        mm="1",
        pf={"content": 2.0},
        ps=1,
    )
    # top level: MUST(inner) + SHOULD(pf phrase)
    assert isinstance(q, BooleanQuery)
    assert len(q.must) == 1 and len(q.should) == 1
    ph = q.should[0]
    assert isinstance(ph, PhraseQuery)
    assert ph.terms == ("merge", "window") and ph.boost == 2.0 and ph.slop == 1
    inner = q.must[0]
    assert inner.min_should_match == 1
    assert any(isinstance(c, PhraseQuery) for c in inner.should)  # the quoted one


def test_stopword_clause_dropped():
    q = edismax_query("the merge", qf={"content": 1.0})
    assert q == TermQuery("merge")


def test_match_all_and_pure_negative():
    assert isinstance(edismax_query("*:*", qf=QF), MatchAllQuery)
    q = edismax_query("-merge", qf={"content": 1.0})
    assert isinstance(q, BooleanQuery)
    assert isinstance(q.must[0], MatchAllQuery) and q.must_not == [TermQuery("merge")]


@pytest.fixture(scope="module")
def eidx(ray_session, tmp_path_factory):
    tbl = generate_corpus(600)
    d = str(tmp_path_factory.mktemp("edismax"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=200)
    return Searcher(d)


def _res(s, q, k=400):
    t = s.search({"q": q}, k=k, use_ray=False).to_pandas()
    return dict(zip(t.doc_id, t.score))


def test_e2e_equals_hand_built(eidx):
    """The parsed tree scores identically to the same tree assembled by hand
    (parser adds nothing beyond composition of verified primitives)."""
    parsed = edismax_query("license apache software", qf={"content": 1.0}, mm="2")
    hand = BooleanQuery(
        should=[TermQuery("license"), TermQuery("apache"), TermQuery("software")],
        min_should_match=2,
    )
    assert _res(eidx, parsed) == _res(eidx, hand)


def test_e2e_pf_boost_is_additive(eidx):
    base = edismax_query("license apache", qf={"content": 1.0}, mm="1")
    boosted = edismax_query(
        "license apache", qf={"content": 1.0}, mm="1", pf={"content": 5.0}
    )
    rb, rp = _res(eidx, base), _res(eidx, boosted)
    assert set(rb) == set(rp)  # pf never changes the match set
    ph = _res(eidx, PhraseQuery(("license", "apache"), (0, 1), boost=5.0))
    for d in rp:
        want = np.float32(rb[d]) + np.float32(ph.get(d, 0.0))
        assert rp[d] == pytest.approx(float(want), rel=1e-5)
