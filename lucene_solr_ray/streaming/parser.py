"""Stream-expression grammar — analog of
``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/expr/
StreamExpressionParser.java``.

Grammar::

    expression := name '(' operand (',' operand)* [','] ')'
    operand    := expression | name '=' (value | expression) | value
    value      := '"' chars '"' | bare-token

Bare tokens may contain anything except whitespace, commas, parens and ``=``
(so ``*:*``, ``count(*)``'s ``*`` operand and numbers all lex as one token).
Double-quoted strings support ``\\"`` escapes. Trailing commas are accepted
(the reference test suite uses them — ``StreamDecoratorTest.java:1155``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class StreamExpression:
    """A parsed call: ``name(positional..., named=...)``.

    ``positionals`` holds sub-expressions and bare values in call order;
    ``named`` maps parameter names to a string value or a sub-expression.
    """

    name: str
    positionals: list = field(default_factory=list)
    named: dict = field(default_factory=dict)

    def sub_expressions(self) -> list["StreamExpression"]:
        return [p for p in self.positionals if isinstance(p, StreamExpression)]

    def values(self) -> list[str]:
        return [p for p in self.positionals if isinstance(p, str)]


_PUNCT = {"(", ")", ",", "="}


def _tokenize(s: str) -> list[str]:
    toks: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c in _PUNCT:
            toks.append(c)
            i += 1
        elif c == '"':
            j = i + 1
            buf = []
            while j < n and s[j] != '"':
                if s[j] == "\\" and j + 1 < n and s[j + 1] == '"':
                    buf.append('"')
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            if j >= n:
                raise ValueError(f"unterminated string at offset {i}")
            # marker tuple so quoted values are distinguishable from bare ones
            toks.append(("str", "".join(buf)))  # type: ignore[arg-type]
            i = j + 1
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in _PUNCT and s[j] != '"':
                j += 1
            toks.append(s[i:j])
            i = j
    return toks


class _Parser:
    def __init__(self, toks: list):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of expression")
        self.i += 1
        return t

    def expect(self, tok: str):
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")

    def parse_expression(self) -> StreamExpression:
        name = self.next()
        if not isinstance(name, str) or name in _PUNCT:
            raise ValueError(f"expected function name, got {name!r}")
        self.expect("(")
        expr = StreamExpression(name)
        while self.peek() != ")":
            if self.peek() is None:
                raise ValueError(f"unclosed call {name}(")
            self._parse_operand(expr)
            if self.peek() == ",":
                self.next()
            elif self.peek() != ")":
                raise ValueError(f"expected ',' or ')' in {name}(...), got {self.peek()!r}")
        self.next()  # ')'
        return expr

    def _parse_operand(self, parent: StreamExpression) -> None:
        t = self.peek()
        if isinstance(t, tuple):  # quoted value
            parent.positionals.append(self.next()[1])
            return
        nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        if nxt == "(":
            parent.positionals.append(self.parse_expression())
        elif nxt == "=":
            key = self.next()
            self.next()  # '='
            v = self.peek()
            if isinstance(v, tuple):
                parent.named[key] = self.next()[1]
            else:
                after = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
                if after == "(":
                    parent.named[key] = self.parse_expression()
                else:
                    parent.named[key] = self.next()
        else:
            parent.positionals.append(self.next())


def parse_expression(s: str) -> StreamExpression:
    """Parse a streaming expression string into its call tree."""
    p = _Parser(_tokenize(s))
    expr = p.parse_expression()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens after expression: {p.toks[p.i:]!r}")
    return expr
