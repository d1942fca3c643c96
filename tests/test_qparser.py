"""Solr local-params QParser (search/qparser.py) unit behavior; the
BM25-vs-oracle check for the dispatch lives in ft_qparser (sql_topk_union
oracle, swept in test_pipelines / parity)."""

import pytest

from lucene_solr_ray.search.qparser import (
    QParserError,
    parse_local_params,
    parse_solr_q,
)
from lucene_solr_ray.search.query import (
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)


def test_grammar_quotes_escapes_and_repeats():
    t, local, body = parse_local_params(
        """{!bool must='a "b"' must="c\\"d" should=e}rest"""
    )
    assert t == "bool"
    assert local["must"] == ['a "b"', 'c"d']
    assert local["should"] == "e"
    assert body == "rest"


def test_v_overrides_body_and_dollar_deref():
    t, local, body = parse_local_params("{!term f=content v=$qq}ignored",
                                        {"qq": "merge"})
    assert body == "merge"
    q = parse_solr_q("{!term f=lang v=$qq}", {"qq": "en"})
    assert q == TermQuery("en", field="lang")


def test_no_local_params_falls_through_to_lucene():
    q = parse_solr_q("merge AND join")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2


def test_raw_vs_field_analysis():
    raw = parse_solr_q("{!raw f=content}Merge")
    assert raw == TermQuery("Merge", field="content")  # verbatim
    fld = parse_solr_q("{!field f=content}Merge Table")
    assert isinstance(fld, PhraseQuery)
    assert fld.terms == ("merge", "table")


def test_prefix_bool_mm_switch_nested():
    assert parse_solr_q("{!prefix f=path}src/") == PrefixQuery(
        "src/", field="path")
    bq = parse_solr_q("{!bool should=a should=b mm=2}")
    assert len(bq.should) == 2 and bq.min_should_match == 2
    sw = parse_solr_q("{!switch case.yes='merge' default='table'} yes ")
    assert sw == TermQuery("merge")  # body is trimmed
    dflt = parse_solr_q("{!switch case.yes='merge' default='table'}no")
    assert dflt == TermQuery("table")
    blank = parse_solr_q("{!switch case='merge' case.x='table'}")
    assert blank == TermQuery("merge")
    nested = parse_solr_q("{!query v=$nq}", {"nq": "{!prefix f=content}me"})
    assert nested == PrefixQuery("me", field="content")


def test_errors():
    with pytest.raises(QParserError, match="missing request parameter"):
        parse_solr_q("{!term v=$nope}")
    with pytest.raises(QParserError, match="unterminated"):
        parse_local_params("{!term v='oops}")
    with pytest.raises(QParserError, match="no switch case"):
        parse_solr_q("{!switch case.a=x}b")
    with pytest.raises(QParserError, match="unknown query parser"):
        parse_solr_q("{!bogus}x")
    with pytest.raises(QParserError, match="missing '}'"):
        parse_local_params("{!term f=x")


def test_terms_and_boost_dispatch():
    from lucene_solr_ray.search.query import BoostedQuery, TermInSetQuery

    t = parse_solr_q("{!terms f=lang}en,de , fr,")
    assert t == TermInSetQuery(terms=("de", "en", "fr"), field="lang")
    # custom separator
    t2 = parse_solr_q("{!terms f=lang separator='|'}en|de")
    assert t2 == TermInSetQuery(terms=("de", "en"), field="lang")
    b = parse_solr_q("{!boost b=ln(field_len)}merge")
    assert isinstance(b, BoostedQuery)
    assert b.expr == "ln(field_len)"
    assert b.query == TermQuery("merge")
    with pytest.raises(QParserError, match="requires a b"):
        parse_solr_q("{!boost}merge")


def test_dismax_dispatch_matches_direct_call():
    from lucene_solr_ray.search.edismax import edismax_query

    got = parse_solr_q("{!edismax qf='content^2 path' mm=2 tie=0.1}merge table")
    want = edismax_query("merge table", qf={"content": 2.0, "path": 1.0},
                         mm="2", tie=0.1)
    assert got == want
    # mm defaults from q.op: OR (default) -> 0%, AND -> 100%
    assert parse_solr_q("{!dismax qf=content}merge table") == edismax_query(
        "merge table", qf={"content": 1.0}, mm="0%")
    assert parse_solr_q("{!dismax qf=content q.op=AND}merge table") == \
        edismax_query("merge table", qf={"content": 1.0}, mm="100%")


def test_dismax_request_param_fallback():
    # SolrParams.wrapDefaults: local params shadow request params, but an
    # option absent locally falls back to the request params
    from lucene_solr_ray.search.edismax import edismax_query

    got = parse_solr_q("{!dismax}merge table",
                       {"qf": "content^2 path", "mm": "2", "tie": "0.1"})
    want = edismax_query("merge table", qf={"content": 2.0, "path": 1.0},
                         mm="2", tie=0.1)
    assert got == want
    # local wins over request
    got = parse_solr_q("{!dismax qf=content}merge table",
                       {"qf": "path^3", "q.op": "AND"})
    want = edismax_query("merge table", qf={"content": 1.0}, mm="100%")
    assert got == want
    # simple parser q.op fallback
    from lucene_solr_ray.search.simpleparser import parse_simple

    assert parse_solr_q("{!simple}merge table", {"q.op": "AND"}) == \
        parse_simple("merge table", None, default_operator="MUST")


def test_simple_surround_xml_dispatch():
    from lucene_solr_ray.search.simpleparser import parse_simple
    from lucene_solr_ray.search.surround import parse_surround
    from lucene_solr_ray.search.xmlparser import parse_xml_query

    assert parse_solr_q("{!simple q.op=AND}merge table") == parse_simple(
        "merge table", None, default_operator="MUST")
    assert parse_solr_q("{!surround}3w(merge, table)") == parse_surround(
        "3w(merge, table)", None)
    xml = '<TermQuery fieldName="content">merge</TermQuery>'
    assert parse_solr_q("{!xmlparser}" + xml) == parse_xml_query(xml, None)
