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


# ---------------------------------------------------------------------------
# function queries: FunctionQuery / BoostedQuery / bf / boost / bq
# ---------------------------------------------------------------------------

from lucene_solr_ray.search.expressions import (
    compile_expression,
    evaluate,
    evaluate_full,
    variables,
)
from lucene_solr_ray.search.query import BoostedQuery, FunctionQuery


def test_recip_eval_and_variables():
    node = compile_expression("recip(field_len,1,1000,1000)")
    assert variables(node) == {"field_len"}
    import numpy as np

    v = evaluate(node, {"field_len": np.array([0.0, 1000.0])})
    assert v[0] == 1.0 and v[1] == 0.5


def test_evaluate_full_matches_scalar():
    """The vectorized path is bit-identical to the scalar loop on the
    IEEE-exact subset, and transcendental ASTs fall back to scalar."""
    import numpy as np

    x = np.array([1.0, 7.0, 250.0, 999.0])
    for src in ["sqrt(field_len) + recip(field_len,2,10,1)",
                "max(field_len / 3.0, 5.0) - min(field_len, 100)",
                "ln(field_len) * 2"]:
        node = compile_expression(src)
        np.testing.assert_array_equal(
            evaluate_full(node, {"field_len": x}), evaluate(node, {"field_len": x})
        )


def test_boosted_query_match_set_and_score(eidx):
    base = _res(eidx, TermQuery("license"))
    boosted = _res(eidx, BoostedQuery(TermQuery("license"), "2 + 0 * field_len"))
    assert set(base) == set(boosted)  # match set = inner's
    for d in base:
        assert boosted[d] == pytest.approx(2.0 * base[d], rel=1e-6)


def test_function_query_matches_all(eidx):
    r = _res(eidx, FunctionQuery("sqrt(field_len)"), k=10_000)
    total = sum(s["doc_count"] for s in eidx.reader.segments)
    assert len(r) == total
    assert all(v > 0 for v in r.values())


def test_bf_is_additive(eidx):
    base = _res(eidx, edismax_query("license apache", qf={"content": 1.0}, mm="1"))
    with_bf = _res(eidx, edismax_query("license apache", qf={"content": 1.0},
                                       mm="1", bf="sqrt(field_len)"))
    fn = _res(eidx, FunctionQuery("sqrt(field_len)"), k=10_000)
    assert set(base) == set(with_bf)
    for d in base:
        assert with_bf[d] == pytest.approx(base[d] + fn[d], rel=1e-6)


def test_boost_param_is_multiplicative(eidx):
    base = _res(eidx, edismax_query("license apache", qf={"content": 1.0}, mm="1"))
    wrapped = _res(eidx, edismax_query("license apache", qf={"content": 1.0},
                                       mm="1", boost="recip(field_len,1,5,5)"))
    fn = _res(eidx, FunctionQuery("recip(field_len,1,5,5)"), k=10_000)
    assert set(base) == set(wrapped)
    for d in base:
        assert wrapped[d] == pytest.approx(base[d] * fn[d], rel=1e-6)


def test_bq_is_additive(eidx):
    base = _res(eidx, edismax_query("license apache", qf={"content": 1.0}, mm="1"))
    with_bq = _res(eidx, edismax_query("license apache", qf={"content": 1.0},
                                       mm="1", bq=TermQuery("software", boost=0.5)))
    bq = _res(eidx, TermQuery("software", boost=0.5))
    assert set(base) == set(with_bq)
    for d in base:
        assert with_bq[d] == pytest.approx(base[d] + bq.get(d, 0.0), rel=1e-6)
