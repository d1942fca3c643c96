"""XML query parser — the CoreParser query-DSL of
``lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/``.

Element set and attribute semantics transcribed from
``CoreParser.java:77-117`` and ``builders/*.java``:

- ``<TermQuery fieldName=..>text</TermQuery>`` — verbatim term, NO
  analysis (TermQueryBuilder.java: raw element text into a Term)
- ``<TermsQuery fieldName=..>text</TermsQuery>`` — text run through the
  analyzer, one SHOULD clause per token (TermsQueryBuilder.java)
- ``<MatchAllDocsQuery/>``
- ``<BooleanQuery minimumNumberShouldMatch=N><Clause occurs=must|
  should|mustNot|filter>…`` (BooleanQueryBuilder.java:53-84; ``occurs``
  defaults to should)
- ``<RangeQuery fieldName=.. lowerTerm=.. upperTerm=..
  includeLower=.. includeUpper=..>`` — TermRangeQuery
  (RangeQueryBuilder.java)
- ``<PointRangeQuery fieldName=.. lowerTerm=.. upperTerm=..
  type=int|long|float|double>`` (PointRangeQueryBuilder.java)
- ``<DisjunctionMaxQuery tieBreaker=f>`` over child queries
  (DisjunctionMaxQueryBuilder.java)
- ``<ConstantScoreQuery>`` wrapping one child
  (ConstantScoreQueryBuilder.java)
- ``<UserQuery>classic syntax</UserQuery>`` — the classic parser over
  the default field (UserInputQueryBuilder.java)
- Spans: ``<SpanTerm>``, ``<SpanOr>``, ``<SpanOrTerms>`` (analyzed),
  ``<SpanNear slop=.. inOrder=..>``, ``<SpanFirst end=..>``,
  ``<SpanNot>`` with ``<Include>``/``<Exclude>`` children
  (builders/Span*.java)

Every element honors a ``boost`` attribute (wrapped in BoostQuery when
≠ 1, as each builder does); ``fieldName`` is INHERITED from enclosing
elements (DOMUtils.getAttributeWithInheritance).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .query import (
    CONTENT_FIELD,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    NumericRangeQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    parse_query,
)
from .spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)


class XMLParserError(ValueError):
    pass


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise XMLParserError(f"<{e.tag}> requires non-blank text")
    return t


def _field(e: ET.Element, inherited: str | None) -> str:
    f = e.get("fieldName") or inherited
    if not f:
        raise XMLParserError(f"<{e.tag}> requires fieldName")
    return f


def _boost(e: ET.Element, q: Query) -> Query:
    b = float(e.get("boost", 1.0))
    return BoostQuery(q, b) if b != 1.0 else q


def _analyze(text: str, analyzer) -> list[str]:
    from ..analysis.tokenizer import StandardAnalyzer, analyze_with_positions

    return [t for t, _ in analyze_with_positions(text, analyzer or StandardAnalyzer())]


def parse_xml_query(
    xml: str, analyzer=None, default_field: str = CONTENT_FIELD
) -> Query:
    """Parse a CoreParser XML query string into a :class:`Query`."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as ex:
        raise XMLParserError(f"malformed query XML: {ex}") from None
    return _build(root, analyzer, default_field, None)


def _children(e: ET.Element) -> list[ET.Element]:
    return list(e)


def _build(e: ET.Element, analyzer, default_field: str,
           inherited: str | None) -> Query:
    tag = e.tag
    inherited = e.get("fieldName") or inherited

    if tag == "TermQuery":
        return _boost(e, TermQuery(_text(e), field=_field(e, inherited)))

    if tag == "TermsQuery":
        f = _field(e, inherited)
        toks = _analyze(_text(e), analyzer)
        bq = BooleanQuery(should=[TermQuery(t, field=f) for t in toks])
        return _boost(e, bq)

    if tag == "MatchAllDocsQuery":
        return _boost(e, MatchAllQuery())

    if tag == "BooleanQuery":
        bq = BooleanQuery(
            min_should_match=int(e.get("minimumNumberShouldMatch", 0)))
        for clause in _children(e):
            if clause.tag != "Clause":
                continue
            occurs = (clause.get("occurs") or "should")
            subs = _children(clause)
            if not subs:
                raise XMLParserError("<Clause> requires a child query")
            sub = _build(subs[0], analyzer, default_field, inherited)
            if occurs == "must":
                bq.must.append(sub)
            elif occurs == "mustNot":
                bq.must_not.append(sub)
            elif occurs == "filter":
                bq.filter.append(sub)
            elif occurs == "should":
                bq.should.append(sub)
            else:
                raise XMLParserError(f"invalid occurs value {occurs!r}")
        return _boost(e, bq)

    if tag == "RangeQuery":
        return _boost(e, TermRangeQuery(
            lower=e.get("lowerTerm"),
            upper=e.get("upperTerm"),
            include_lower=e.get("includeLower", "true") == "true",
            include_upper=e.get("includeUpper", "true") == "true",
            field=_field(e, inherited),
        ))

    if tag == "PointRangeQuery":
        typ = e.get("type", "int")
        conv = float if typ in ("float", "double") else int
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        return _boost(e, NumericRangeQuery(
            field=_field(e, inherited),
            lower=conv(lo) if lo is not None else None,
            upper=conv(hi) if hi is not None else None,
        ))

    if tag == "DisjunctionMaxQuery":
        subs = tuple(
            _build(c, analyzer, default_field, inherited) for c in _children(e)
        )
        return _boost(e, DisjunctionMaxQuery(
            disjuncts=subs, tie_breaker=float(e.get("tieBreaker", 0.0))))

    if tag == "ConstantScoreQuery":
        subs = _children(e)
        if not subs:
            raise XMLParserError("<ConstantScoreQuery> requires a child")
        return _boost(e, ConstantScoreQuery(
            _build(subs[0], analyzer, default_field, inherited)))

    if tag == "UserQuery":
        return _boost(e, parse_query(_text(e), analyzer,
                                     default_field=default_field))

    if tag == "SpanTerm":
        return _boost(e, SpanTermQuery(_text(e), field=_field(e, inherited)))

    if tag == "SpanOr":
        f = _field(e, inherited)
        subs = tuple(
            _build(c, analyzer, default_field, f) for c in _children(e)
        )
        return _boost(e, SpanOrQuery(clauses=subs, field=f))

    if tag == "SpanOrTerms":
        f = _field(e, inherited)
        toks = _analyze(_text(e), analyzer)
        return _boost(e, SpanOrQuery(
            clauses=tuple(SpanTermQuery(t, field=f) for t in toks), field=f))

    if tag == "SpanNear":
        f = _field(e, inherited)
        if "slop" not in e.attrib:
            raise XMLParserError("<SpanNear> requires a slop attribute")
        subs = tuple(
            _build(c, analyzer, default_field, f) for c in _children(e)
        )
        return _boost(e, SpanNearQuery(
            clauses=subs,
            slop=int(e.get("slop")),
            ordered=e.get("inOrder", "false") == "true",
            field=f,
        ))

    if tag == "SpanFirst":
        f = _field(e, inherited)
        subs = _children(e)
        if not subs:
            raise XMLParserError("<SpanFirst> requires a child span")
        return _boost(e, SpanFirstQuery(
            match=_build(subs[0], analyzer, default_field, f),
            end=int(e.get("end", 1)),
            field=f,
        ))

    if tag == "SpanNot":
        f = _field(e, inherited)
        inc = e.find("Include")
        exc = e.find("Exclude")
        if inc is None or exc is None:
            raise XMLParserError("<SpanNot> requires Include and Exclude")
        return _boost(e, SpanNotQuery(
            include=_build(_children(inc)[0], analyzer, default_field, f),
            exclude=_build(_children(exc)[0], analyzer, default_field, f),
            field=f,
        ))

    raise XMLParserError(f"unknown query element <{tag}>")
