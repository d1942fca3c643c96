"""Query model + a classic-parser subset.

Query nodes mirror the reference surface (SURVEY.md §2.4): ``TermQuery``
(search/TermQuery.java), ``BooleanQuery`` with MUST / SHOULD / MUST_NOT and
``minimumNumberShouldMatch`` (search/BooleanQuery.java,
Boolean2ScorerSupplier.java:30-97), ``MatchAllDocsQuery``, boosts
(search/BoostQuery.java). The parser covers the classic-syntax subset used by
the reference query fixtures: ``a AND b``, ``OR``, ``NOT x`` / ``-x``,
``+x``, parentheses, and bare-term juxtaposition (default OR, like
``QueryParserBase`` with default OR operator). Phrases are parsed but raise
until positional indexing lands (v2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllQuery(Query):
    boost: float = 1.0


@dataclass
class BooleanQuery(Query):
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    min_should_match: int = 0

    def terms(self) -> set[str]:
        out: set[str] = set()
        for q in (*self.must, *self.should, *self.must_not):
            out |= query_terms(q)
        return out


def query_terms(q: Query) -> set[str]:
    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, BooleanQuery):
        return q.terms()
    return set()


_TOKEN = re.compile(r"\(|\)|\"[^\"]*\"|AND\b|OR\b|NOT\b|[+\-]?[^\s()]+")


def parse_query(s: str, analyzer=None) -> Query:
    """Recursive-descent parser for the classic subset.

    Terms are passed through the analyzer (lowercase etc.) like
    ``QueryParserBase`` analyzes query text with the index analyzer.
    """
    from ..analysis.tokenizer import StandardAnalyzer, analyze_with_positions

    analyzer = analyzer or StandardAnalyzer()
    toks = _TOKEN.findall(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def advance():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        left = [parse_and()]
        while peek() in ("OR",) or (peek() is not None and peek() not in (")", "AND", "OR")):
            if peek() == "OR":
                advance()
            left.append(parse_and())
        left = [q for q in left if q is not None]
        if len(left) == 1:
            return left[0]
        bq = BooleanQuery()
        for q in left:
            if isinstance(q, _Neg):
                bq.must_not.append(q.q)
            elif isinstance(q, _Req):
                bq.must.append(q.q)
            else:
                bq.should.append(q)
        return bq

    def parse_and():
        parts = [parse_unary()]
        while peek() == "AND":
            advance()
            parts.append(parse_unary())
        parts = [q for q in parts if q is not None]
        if len(parts) == 1:
            return parts[0]
        bq = BooleanQuery()
        for q in parts:
            if isinstance(q, _Neg):
                bq.must_not.append(q.q)
            else:
                bq.must.append(q.q if isinstance(q, _Req) else q)
        return bq

    def parse_unary():
        t = peek()
        if t is None:
            return None
        if t == "NOT":
            advance()
            inner = parse_unary()
            return _Neg(_strip(inner))
        if t == "(":
            advance()
            q = parse_or()
            if peek() == ")":
                advance()
            return q
        tok = advance()
        req = neg = False
        if tok.startswith("+"):
            req, tok = True, tok[1:]
        elif tok.startswith("-"):
            neg, tok = True, tok[1:]
        if tok.startswith('"'):
            raise NotImplementedError("phrase queries require positional indexing (v2)")
        analyzed = analyze_with_positions(tok, analyzer)
        if not analyzed:
            return None
        if len(analyzed) == 1:
            q: Query = TermQuery(analyzed[0][0])
        else:  # one input word analyzed into several terms → OR them
            q = BooleanQuery(should=[TermQuery(t0) for t0, _ in analyzed])
        if neg:
            return _Neg(q)
        if req:
            return _Req(q)
        return q

    q = parse_or()
    q = _strip(q)
    if isinstance(q, _Neg):  # pure negative query matches nothing (Lucene semantics)
        return BooleanQuery(must_not=[q.q])
    if q is None:
        return BooleanQuery()
    return q


@dataclass
class _Neg:
    q: Query


@dataclass
class _Req:
    q: Query


def _strip(q):
    if isinstance(q, _Req):
        return q.q
    return q
