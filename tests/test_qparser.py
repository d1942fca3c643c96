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
