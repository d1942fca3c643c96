"""Surround query parser — the span-query DSL
(``lucene/queryparser/src/java/org/apache/lucene/queryparser/surround/``).

Reference semantics:
- ``parser/QueryParser.jj``: infix ``AND``/``OR``/``NOT`` (case-insensitive)
  with parens, prefix operators ``and(...)``/``or(...)``/``not(a, b)``, and
  distance operators in both prefix ``3w(a, b)`` / ``3n(a, b)`` and infix
  ``a 3w b`` forms. ``W`` = ordered, ``N`` = unordered; the number is the
  maximum distance.
- ``query/DistanceQuery.java:82-95`` (getSpanNearQuery): a distance-N op
  becomes ``SpanNearQuery(clauses, slop = N - 1, inOrder = W)``.
- ``query/SrndTruncQuery.java``: truncated terms (``mer*``, ``m?rge``)
  expand against the term dictionary; inside a distance op they become a
  SpanOr of SpanTerm (SpanMultiTermQueryWrapper's SpanRewriteMethod).
- ``query/OrQuery.java`` inside a distance op → SpanOrQuery; at the top
  level the boolean ops build an ordinary BooleanQuery.
"""

from __future__ import annotations

import re

from .query import (
    BooleanQuery,
    PrefixQuery,
    Query,
    TermQuery,
    WildcardQuery,
)
from .spans import (
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)

CONTENT_FIELD = "content"

_TOK = re.compile(r"\s*(\(|\)|,|[^\s(),]+)")
_DIST = re.compile(r"^(\d+)([wnWN])$")


def _tokens(s: str) -> list[str]:
    return [m.group(1) for m in _TOK.finditer(s)]


class _P:
    def __init__(self, toks: list[str], analyzer, reader):
        self.toks, self.i = toks, 0
        self.analyzer, self.reader = analyzer, reader

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    # ---- boolean level (infix, lowest precedence; left-assoc like the
    # reference's single-level infix loop) ----
    def parse(self) -> Query:
        left = self.primary()
        while (t := self.peek()) is not None and t.lower() in ("and", "or", "not") \
                or (t is not None and _DIST.match(t)):
            op = self.next()
            right = self.primary()
            m = _DIST.match(op)
            if m:
                left = _distance(int(m.group(1)), m.group(2).lower() == "w",
                                 [left, right], self.reader)
            elif op.lower() == "and":
                left = BooleanQuery(must=[left, right])
            elif op.lower() == "or":
                left = BooleanQuery(should=[left, right])
            else:
                left = BooleanQuery(must=[left], must_not=[right])
        return left

    def primary(self) -> Query:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of surround query")
        m = _DIST.match(t)
        if m and self.toks[self.i + 1 : self.i + 2] == ["("]:
            self.next()
            args = self.args()
            return _distance(int(m.group(1)), m.group(2).lower() == "w", args,
                             self.reader)
        if t.lower() in ("and", "or", "not") and \
                self.toks[self.i + 1 : self.i + 2] == ["("]:
            op = self.next().lower()
            args = self.args()
            if op == "and":
                return BooleanQuery(must=args)
            if op == "or":
                return BooleanQuery(should=args)
            if len(args) != 2:
                raise ValueError("not(a, b) takes exactly two arguments")
            return BooleanQuery(must=[args[0]], must_not=[args[1]])
        if t == "(":
            self.next()
            q = self.parse()
            if self.peek() == ")":
                self.next()
            return q
        return self.term(self.next())

    def args(self) -> list[Query]:
        assert self.next() == "("
        out = [self.parse()]
        while self.peek() == ",":
            self.next()
            out.append(self.parse())
        if self.peek() == ")":
            self.next()
        return out

    def term(self, tok: str) -> Query:
        if "*" in tok or "?" in tok:
            pat = tok.lower()
            if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
                return PrefixQuery(pat[:-1], field=CONTENT_FIELD)
            return WildcardQuery(pat, field=CONTENT_FIELD)
        from ..analysis.tokenizer import analyze_with_positions

        analyzed = analyze_with_positions(tok, self.analyzer)
        if not analyzed:
            return BooleanQuery()  # stopword term → matches nothing
        return TermQuery(analyzed[0][0], field=CONTENT_FIELD)


def _to_span(q: Query, reader) -> Query:
    """Rewrite a boolean-level node into its span equivalent for use inside
    a distance operator (SrndQuery.makeLuceneQueryField spans path).
    Truncated terms expand against the term dictionary into a SpanOr of
    SpanTerm (SpanMultiTermQueryWrapper's SpanRewriteMethod) — a reader is
    required for that."""
    if isinstance(q, TermQuery):
        return SpanTermQuery(q.term, field=q.field)
    if isinstance(q, (PrefixQuery, WildcardQuery)):
        if reader is None:
            raise ValueError("truncated terms inside a distance op need a reader")
        terms = sorted(reader.expand_terms(q))
        if not terms:
            return SpanOrQuery(())
        return SpanOrQuery(tuple(SpanTermQuery(t, field=q.field) for t in terms))
    if isinstance(q, BooleanQuery) and q.should and not q.must and not q.must_not:
        return SpanOrQuery(tuple(_to_span(c, reader) for c in q.should))
    if isinstance(q, (SpanTermQuery, SpanNearQuery, SpanOrQuery)):
        return q
    raise ValueError(f"cannot use {type(q).__name__} inside a distance operator")


def _distance(n: int, ordered: bool, clauses: list[Query], reader) -> Query:
    if n < 1:
        raise ValueError("distance must be >= 1")
    return SpanNearQuery(tuple(_to_span(c, reader) for c in clauses), slop=n - 1,
                         field=CONTENT_FIELD, ordered=ordered)


def parse_surround(s: str, analyzer=None, reader=None) -> Query:
    """Parse a surround expression → query tree (spans inside distance ops,
    BooleanQuery at the top level). ``reader`` enables dictionary expansion
    of truncated terms inside distance operators."""
    from ..analysis.tokenizer import StandardAnalyzer

    p = _P(_tokens(s), analyzer or StandardAnalyzer(), reader)
    q = p.parse()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens in surround query: {s!r}")
    return q
