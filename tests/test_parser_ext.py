"""Extended classic-parser syntax (QueryParser.jj): wildcards, fuzzy,
ranges, field groups, boosts, ``*:*`` — parse-shape goldens plus engine
score equivalence between parsed strings and hand-built query trees."""

import numpy as np
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
)


def test_parse_shapes():
    assert parse_query("mer*") == PrefixQuery("mer")
    assert parse_query("m?rge") == WildcardQuery("m?rge")
    assert parse_query("mergd~1") == FuzzyQuery("mergd", max_edits=1)
    assert parse_query("merge~") == FuzzyQuery("merge", max_edits=2)
    assert parse_query("repo:[src2 TO src5]") == TermRangeQuery(
        "src2", "src5", field="repo"
    )
    assert parse_query("{alpha TO beta}") == TermRangeQuery(
        "alpha", "beta", include_lower=False, include_upper=False
    )
    assert parse_query("[merge TO *]") == TermRangeQuery("merge", None)
    assert parse_query("*:*") == MatchAllQuery()
    q = parse_query("spark^2.5")
    assert q == BoostQuery(TermQuery("spark"), 2.5)
    q = parse_query('"apache license"^3')
    assert isinstance(q, BoostQuery) and isinstance(q.query, PhraseQuery)
    q = parse_query("(spark OR merge)^2")
    assert isinstance(q, BoostQuery) and isinstance(q.query, BooleanQuery)
    # normalize: content endpoints/patterns lowercase, keyword verbatim
    assert parse_query("MER*") == PrefixQuery("mer")
    assert parse_query("repo:SRC*") == PrefixQuery("SRC", field="repo")


def test_parse_field_group():
    q = parse_query("lang:(en OR fr) AND merge")
    assert isinstance(q, BooleanQuery)
    grp, term = q.must
    assert term == TermQuery("merge")
    assert set(grp.should) == {TermQuery("en", field="lang"), TermQuery("fr", field="lang")}


def test_parse_matchall_with_negation():
    q = parse_query("*:* -spark")
    assert q.should == [MatchAllQuery()]
    assert q.must_not == [TermQuery("spark")]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(300)
    d = str(tmp_path_factory.mktemp("pext_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=120)
    return d, tbl


def test_boost_scores_scale_exactly(built):
    """term^2 multiplies scores by exactly 2 (BoostQuery folds into the
    TermQuery weight)."""
    d, _ = built
    s = Searcher(d)
    base = s.search({"q": parse_query("license")}, k=20, use_ray=False).to_pandas()
    boosted = s.search({"q": parse_query("license^2")}, k=20, use_ray=False).to_pandas()
    assert list(base.doc_id) == list(boosted.doc_id)
    np.testing.assert_allclose(boosted.score, base.score * 2.0, rtol=0)


def test_parsed_equals_handbuilt(built):
    d, _ = built
    s = Searcher(d)
    pairs = [
        ("lic*", PrefixQuery("lic")),
        ("licens?", WildcardQuery("licens?")),
        ("licensx~1", FuzzyQuery("licensx", max_edits=1)),
        ("[license TO lichen]", TermRangeQuery("license", "lichen")),
    ]
    for text, hand in pairs:
        a = s.search({"q": parse_query(text)}, k=50, use_ray=False)
        b = s.search({"q": hand}, k=50, use_ray=False)
        assert a.equals(b), text
        assert a.num_rows > 0, text


def test_matchall_not_is_complement(built):
    d, tbl = built
    s = Searcher(d)
    all_ids = s.match_ids(parse_query("*:*"))
    assert len(all_ids) == tbl.num_rows
    pos = s.match_ids(parse_query("license"))
    neg = s.match_ids(parse_query("*:* -license"))
    assert len(pos) + len(neg) == tbl.num_rows
    assert not set(pos) & set(neg)


def test_complex_phrase_wildcard_in_quotes(built):
    """ComplexPhraseQueryParser: 'lic* to' matches docs where a lic-prefixed
    token is immediately followed (post-stopword positions) by... exercised
    via brute-force on the fixture corpus."""
    from lucene_solr_ray.analysis.tokenizer import analyze_with_positions
    from lucene_solr_ray.search.query import parse_complex_phrase

    d, tbl = built
    s = Searcher(d)
    q = parse_complex_phrase("lic* apache~1", s.reader, slop=3)
    got = set(s.match_ids(q))

    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    exp = set()
    for doc_id, row in enumerate(order):
        toks = analyze_with_positions(tbl["content"].to_pylist()[row] or "")
        p1 = [p for t, p in toks if t.startswith("lic")]
        p2 = [p for t, p in toks if _lev1(t, "apache")]
        if any(0 <= b - a - 1 <= 3 for a in p1 for b in p2 if b > a):
            exp.add(doc_id)
    assert got == exp and got


def _lev1(a: str, b: str) -> bool:
    if abs(len(a) - len(b)) > 1:
        return False
    if a == b:
        return True
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) <= 1
    if len(a) > len(b):
        a, b = b, a
    for i in range(len(b)):
        if a == b[:i] + b[i + 1:]:
            return True
    return False


def test_complex_phrase_unmatchable_slot(built):
    from lucene_solr_ray.search.query import BooleanQuery, parse_complex_phrase

    d, _ = built
    s = Searcher(d)
    q = parse_complex_phrase("zzzznotaprefix* apache", s.reader)
    assert q == BooleanQuery()
    assert len(s.match_ids(q)) == 0


# ---------------------------------------------------------------------------
# MultiFieldQueryParser
# ---------------------------------------------------------------------------


def test_multifield_clause_wise_expansion():
    """MultiFieldQueryParser.java: 'a AND b' over (f1, f2) →
    (f1:a OR f2:a) AND (f1:b OR f2:b), never a whole-query OR."""
    from lucene_solr_ray.search.query import (
        BooleanQuery,
        BoostQuery,
        TermQuery,
        parse_multifield,
    )

    q = parse_multifield("merge AND window", ("content", "lang"))
    assert isinstance(q, BooleanQuery) and len(q.must) == 2 and not q.should
    for clause in q.must:
        assert isinstance(clause, BooleanQuery)
        assert {c.field for c in clause.should} == {"content", "lang"}

    # per-field boost wraps that field's leaf only
    qb = parse_multifield("merge", ("content", "lang"), boosts={"lang": 3.0})
    subs = qb.should
    assert isinstance(subs[0], TermQuery) and subs[0].field == "content"
    assert isinstance(subs[1], BoostQuery) and subs[1].query.field == "lang"

    # explicit field: clause is NOT expanded
    qf = parse_multifield("lang:en merge", ("content", "lang"))
    fields_of_leaves = []
    for c in qf.should:
        if isinstance(c, TermQuery):
            fields_of_leaves.append(("leaf", c.field))
        else:
            fields_of_leaves.append(("group", {s.field for s in c.should}))
    assert ("leaf", "lang") in fields_of_leaves
    assert ("group", {"content", "lang"}) in fields_of_leaves


# ---------------------------------------------------------------------------
# Surround query parser
# ---------------------------------------------------------------------------


def test_surround_parse_shapes():
    from lucene_solr_ray.search.query import BooleanQuery
    from lucene_solr_ray.search.spans import (
        SpanNearQuery,
        SpanOrQuery,
        SpanTermQuery,
    )
    from lucene_solr_ray.search.surround import parse_surround

    q = parse_surround("3w(merge, spark)")
    assert isinstance(q, SpanNearQuery) and q.ordered and q.slop == 2
    assert [c.term for c in q.clauses] == ["merge", "spark"]

    q = parse_surround("merge 4n spark")  # infix, unordered
    assert isinstance(q, SpanNearQuery) and not q.ordered and q.slop == 3

    q = parse_surround("2w(or(merge, spark), window)")
    assert isinstance(q.clauses[0], SpanOrQuery)
    assert isinstance(q.clauses[1], SpanTermQuery)

    q = parse_surround("and(merge, not(spark, window))")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2
    inner = q.must[1]
    assert inner.must and inner.must_not

    with pytest.raises(ValueError):
        parse_surround("merge spark")  # juxtaposition needs an operator
    with pytest.raises(ValueError):
        parse_surround("2w(mer*, window)")  # truncation needs a reader


# ---------------------------------------------------------------------------
# SimpleQueryParser
# ---------------------------------------------------------------------------


def test_simple_parser_shapes_and_never_throws():
    from lucene_solr_ray.search.query import (
        BooleanQuery,
        FuzzyQuery,
        MatchAllQuery,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
    )
    from lucene_solr_ray.search.simpleparser import parse_simple

    q = parse_simple("merge | window")
    assert isinstance(q, BooleanQuery) and len(q.should) == 2

    q = parse_simple("merge + window")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2

    # negation wraps as (SHOULD MatchAll, MUST_NOT term)
    q = parse_simple("merge -window")
    neg = q.should[1]
    assert isinstance(neg.should[0], MatchAllQuery) and neg.must_not

    # double negation cancels
    q = parse_simple("merge --window")
    assert isinstance(q.should[1], TermQuery)

    q = parse_simple('"fast key"~1')
    assert isinstance(q, PhraseQuery) and q.slop == 1

    q = parse_simple("mer*")
    assert isinstance(q, PrefixQuery) and q.prefix == "mer"

    q = parse_simple("mrge~1")
    assert isinstance(q, FuzzyQuery) and q.max_edits == 1
    assert isinstance(parse_simple("mrge~0"), TermQuery)  # ~0 → plain term

    # mixed operators: operational change wraps the previous tree
    q = parse_simple("merge + spark | window")
    assert isinstance(q, BooleanQuery) and len(q.should) == 2
    assert isinstance(q.should[0], BooleanQuery) and len(q.should[0].must) == 2

    # a stopword clause analyzes away entirely (never-throw degradation)
    q = parse_simple("a + merge")
    assert isinstance(q, TermQuery) and q.term == "merge"

    # never throws: extraneous ( and " degrade to literal stream
    for bad in ['merge ("window', "((", '"""', "+", "|", "-", "", ")a(", "a~x"]:
        parse_simple(bad)  # must not raise
    q = parse_simple('merge ("window')
    assert isinstance(q, BooleanQuery) and len(q.should) == 2
