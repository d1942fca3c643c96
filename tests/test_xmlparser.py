"""CoreParser XML query DSL (search/xmlparser.py) unit behavior; the
BM25-vs-oracle dispatch check lives in ft_xml_query."""

import pytest

from lucene_solr_ray.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    NumericRangeQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_solr_ray.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucene_solr_ray.search.xmlparser import XMLParserError, parse_xml_query


def test_term_verbatim_vs_terms_analyzed():
    assert parse_xml_query(
        '<TermQuery fieldName="content">Merge</TermQuery>'
    ) == TermQuery("Merge", field="content")  # verbatim, case kept
    tq = parse_xml_query(
        '<TermsQuery fieldName="content">Merge Table</TermsQuery>')
    assert tq.should == [TermQuery("merge"), TermQuery("table")]


def test_fieldname_inheritance_and_boost():
    q = parse_xml_query(
        '<BooleanQuery fieldName="lang" boost="3.0">'
        '<Clause occurs="must"><TermQuery>en</TermQuery></Clause>'
        '</BooleanQuery>')
    assert isinstance(q, BoostQuery) and q.boost == 3.0
    assert q.query.must == [TermQuery("en", field="lang")]


def test_occurs_values_and_mm():
    q = parse_xml_query(
        '<BooleanQuery fieldName="content" minimumNumberShouldMatch="2">'
        '<Clause occurs="should"><TermQuery>a</TermQuery></Clause>'
        '<Clause occurs="mustNot"><TermQuery>b</TermQuery></Clause>'
        '<Clause occurs="filter"><TermQuery>c</TermQuery></Clause>'
        '<Clause><TermQuery>d</TermQuery></Clause>'  # default should
        '</BooleanQuery>')
    assert q.min_should_match == 2
    assert [t.term for t in q.should] == ["a", "d"]
    assert [t.term for t in q.must_not] == ["b"]
    assert [t.term for t in q.filter] == ["c"]


def test_ranges_matchall_dismax_constantscore_userquery():
    r = parse_xml_query('<RangeQuery fieldName="content" lowerTerm="m" '
                        'upperTerm="n" includeUpper="false"/>')
    assert r == TermRangeQuery("m", "n", include_upper=False,
                               field="content")
    p = parse_xml_query('<PointRangeQuery fieldName="field_len" '
                        'lowerTerm="10" upperTerm="20" type="int"/>')
    assert p == NumericRangeQuery("field_len", 10, 20)
    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAllQuery()
    d = parse_xml_query(
        '<DisjunctionMaxQuery fieldName="content" tieBreaker="0.3">'
        "<TermQuery>x</TermQuery><TermQuery>y</TermQuery>"
        "</DisjunctionMaxQuery>")
    assert isinstance(d, DisjunctionMaxQuery) and d.tie_breaker == 0.3
    c = parse_xml_query('<ConstantScoreQuery fieldName="content">'
                        "<TermQuery>x</TermQuery></ConstantScoreQuery>")
    assert isinstance(c, ConstantScoreQuery)
    u = parse_xml_query("<UserQuery>merge AND join</UserQuery>")
    assert isinstance(u, BooleanQuery) and len(u.must) == 2


def test_spans():
    sn = parse_xml_query(
        '<SpanNear fieldName="content" slop="2" inOrder="true">'
        "<SpanTerm>merge</SpanTerm><SpanTerm>table</SpanTerm></SpanNear>")
    assert sn == SpanNearQuery(
        clauses=(SpanTermQuery("merge"), SpanTermQuery("table")),
        slop=2, ordered=True)
    so = parse_xml_query('<SpanOrTerms fieldName="content">Merge Table'
                         "</SpanOrTerms>")
    assert isinstance(so, SpanOrQuery) and len(so.clauses) == 2
    sf = parse_xml_query('<SpanFirst fieldName="content" end="3">'
                         "<SpanTerm>merge</SpanTerm></SpanFirst>")
    assert sf == SpanFirstQuery(match=SpanTermQuery("merge"), end=3)
    sx = parse_xml_query(
        '<SpanNot fieldName="content">'
        "<Include><SpanTerm>a</SpanTerm></Include>"
        "<Exclude><SpanTerm>b</SpanTerm></Exclude></SpanNot>")
    assert isinstance(sx, SpanNotQuery)


def test_errors():
    with pytest.raises(XMLParserError, match="malformed"):
        parse_xml_query("<TermQuery>")
    with pytest.raises(XMLParserError, match="fieldName"):
        parse_xml_query("<TermQuery>x</TermQuery>")
    with pytest.raises(XMLParserError, match="non-blank"):
        parse_xml_query('<TermQuery fieldName="f"></TermQuery>')
    with pytest.raises(XMLParserError, match="unknown query element"):
        parse_xml_query("<Bogus/>")
    with pytest.raises(XMLParserError, match="slop"):
        parse_xml_query('<SpanNear fieldName="f">'
                        "<SpanTerm>x</SpanTerm></SpanNear>")
    with pytest.raises(XMLParserError, match="invalid occurs"):
        parse_xml_query('<BooleanQuery fieldName="f">'
                        '<Clause occurs="maybe"><TermQuery>x</TermQuery>'
                        "</Clause></BooleanQuery>")
