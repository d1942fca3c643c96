"""Scoring expressions — Lucene expressions module analog
(``lucene/expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java`` + ``Expression.java``): a compiled arithmetic
expression over the document's score and doc-value bindings, usable as a
sort/rescore value source (``Expression.getSortField`` /
``ExpressionValueSource``).

Grammar (the JS-compiler subset the reference's docs lead with)::

    expr   := term (('+' | '-') term)*
    term   := unary (('*' | '/') unary)*
    unary  := '-' unary | factor
    factor := NUMBER | IDENT | FUNC '(' expr (',' expr)* ')' | '(' expr ')'

Functions: ``ln``, ``log10``, ``sqrt``, ``abs``, ``min``, ``max``, ``pow``.
Identifiers resolve against the caller's bindings dict (e.g. ``_score``,
``field_len``) — ``SimpleBindings`` analog.

Evaluation is scalar ``math.*`` in float64 (the sql-compat discipline: numpy's
SIMD transcendentals differ from libm in the last ulp; expression reranks run
over top-k candidates, so the scalar loop is not a hot path).
"""

from __future__ import annotations

import math
import re

import numpy as np

_TOK = re.compile(r"\s*(?:(\d+\.\d*|\.\d+|\d+)|([A-Za-z_][A-Za-z0-9_]*)|(.))")

_FUNCS = {
    "ln": (1, math.log),
    "log10": (1, math.log10),
    "sqrt": (1, math.sqrt),
    "abs": (1, abs),
    "min": (2, min),
    "max": (2, max),
    "pow": (2, math.pow),
    # Solr ReciprocalFloatFunction (queries/function/valuesource/
    # ReciprocalFloatFunction.java:55): a/(m*x+b) — the classic
    # recency/length-decay boost recip(x,m,a,b)
    "recip": (4, lambda x, m, a, b: a / (m * x + b)),
}

_SQL_FUNCS = {"ln": "ln", "log10": "log10", "sqrt": "sqrt", "abs": "abs",
              "min": "least", "max": "greatest", "pow": "pow"}

#: functions whose numpy ufunc is IEEE-correctly-rounded (bit-identical to
#: scalar libm) — an AST limited to these may evaluate vectorized
_EXACT_VEC = frozenset({"sqrt", "abs", "min", "max", "recip"})


def _tokenize(s: str) -> list:
    out = []
    for m in _TOK.finditer(s):
        num, ident, punct = m.groups()
        if num is not None:
            out.append(("num", float(num)))
        elif ident is not None:
            out.append(("ident", ident))
        elif punct.strip():
            out.append(("op", punct))
    return out


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expr(self):
        node = self.term()
        while self.peek() == ("op", "+") or self.peek() == ("op", "-"):
            op = self.next()[1]
            node = (op, node, self.term())
        return node

    def term(self):
        node = self.unary()
        while self.peek() == ("op", "*") or self.peek() == ("op", "/"):
            op = self.next()[1]
            node = (op, node, self.unary())
        return node

    def unary(self):
        if self.peek() == ("op", "-"):
            self.next()
            return ("neg", self.unary())
        return self.factor()

    def factor(self):
        kind, val = self.next()
        if kind == "num":
            return ("num", val)
        if kind == "ident":
            if self.peek() == ("op", "("):
                self.next()
                if val not in _FUNCS:
                    raise ValueError(f"unknown function {val!r}")
                args = [self.expr()]
                while self.peek() == ("op", ","):
                    self.next()
                    args.append(self.expr())
                if self.next() != ("op", ")"):
                    raise ValueError("expected ')'")
                if len(args) != _FUNCS[val][0]:
                    raise ValueError(f"{val} expects {_FUNCS[val][0]} args")
                return ("call", val, args)
            return ("var", val)
        if (kind, val) == ("op", "("):
            node = self.expr()
            if self.next() != ("op", ")"):
                raise ValueError("expected ')'")
            return node
        raise ValueError(f"unexpected token {val!r}")


def compile_expression(s: str):
    """→ AST; raises ValueError on syntax errors / unknown functions."""
    p = _P(_tokenize(s))
    node = p.expr()
    if p.peek() != (None, None):
        raise ValueError(f"trailing tokens in expression: {s!r}")
    return node


def _eval_one(node, binds: dict) -> float:
    k = node[0]
    if k == "num":
        return node[1]
    if k == "var":
        return binds[node[1]]
    if k == "neg":
        return -_eval_one(node[1], binds)
    if k == "call":
        fn = _FUNCS[node[1]][1]
        return float(fn(*(_eval_one(a, binds) for a in node[2])))
    a = _eval_one(node[1], binds)
    b = _eval_one(node[2], binds)
    # dispatch lazily: an eager dict would evaluate a/b for every node and
    # raise ZeroDivisionError whenever the right operand is 0
    if k == "+":
        return a + b
    if k == "-":
        return a - b
    if k == "*":
        return a * b
    return a / b


def evaluate(node, bindings: dict[str, np.ndarray]) -> np.ndarray:
    """Evaluate for every row of the bindings (each an equal-length float64
    array) → float64 array; scalar libm per row (see module docstring)."""
    names = list(bindings)
    n = len(bindings[names[0]]) if names else 0
    cols = {k: np.asarray(v, dtype=np.float64) for k, v in bindings.items()}
    out = np.empty(n, dtype=np.float64)
    for i in range(n):
        out[i] = _eval_one(node, {k: float(cols[k][i]) for k in names})
    return out


def variables(node) -> set[str]:
    """Identifiers the expression binds (doc-value columns and/or _score)."""
    k = node[0]
    if k == "var":
        return {node[1]}
    if k == "num":
        return set()
    if k == "neg":
        return variables(node[1])
    if k == "call":
        out: set[str] = set()
        for a in node[2]:
            out |= variables(a)
        return out
    return variables(node[1]) | variables(node[2])


def _vec_ok(node) -> bool:
    k = node[0]
    if k in ("num", "var"):
        return True
    if k == "neg":
        return _vec_ok(node[1])
    if k == "call":
        return node[1] in _EXACT_VEC and all(_vec_ok(a) for a in node[2])
    return _vec_ok(node[1]) and _vec_ok(node[2])


def _eval_vec(node, cols: dict[str, np.ndarray], n: int) -> np.ndarray:
    k = node[0]
    if k == "num":
        return np.full(n, node[1], dtype=np.float64)
    if k == "var":
        return cols[node[1]]
    if k == "neg":
        return -_eval_vec(node[1], cols, n)
    if k == "call":
        args = [_eval_vec(a, cols, n) for a in node[2]]
        f = node[1]
        if f == "sqrt":
            return np.sqrt(args[0])
        if f == "abs":
            return np.abs(args[0])
        if f == "min":
            return np.minimum(args[0], args[1])
        if f == "max":
            return np.maximum(args[0], args[1])
        # recip(x, m, a, b) = a / (m*x + b)
        x, m, a, b = args
        return a / (m * x + b)
    a = _eval_vec(node[1], cols, n)
    b = _eval_vec(node[2], cols, n)
    if k == "+":
        return a + b
    if k == "-":
        return a - b
    if k == "*":
        return a * b
    return a / b


def evaluate_full(node, bindings: dict[str, np.ndarray]) -> np.ndarray:
    """Whole-column evaluation (FunctionQuery AllScorer hot path): fully
    vectorized when the AST uses only IEEE-exact ops (+,-,*,/, sqrt, abs,
    min, max, recip — numpy is bit-identical to scalar libm for these);
    falls back to the scalar ``evaluate`` loop for ln/log10/pow, whose SIMD
    variants may differ in the last ulp from the SQL oracle's libm."""
    if not _vec_ok(node):
        return evaluate(node, bindings)
    names = list(bindings)
    n = len(bindings[names[0]]) if names else 0
    cols = {k: np.asarray(v, dtype=np.float64) for k, v in bindings.items()}
    return _eval_vec(node, cols, n)


def to_sql(node, col_map: dict[str, str]) -> str:
    """AST → SQL with IDENTICAL association order (left-assoc, parenthesized
    per node) so DuckDB computes the same float64 sequence."""
    k = node[0]
    if k == "num":
        return repr(node[1])
    if k == "var":
        return col_map[node[1]]
    if k == "neg":
        return f"(- {to_sql(node[1], col_map)})"
    if k == "call":
        if node[1] == "recip":
            # same float64 sequence as the lambda: a / ((m * x) + b)
            x, m, a, b = (to_sql(n_, col_map) for n_ in node[2])
            return f"({a} / (({m} * {x}) + {b}))"
        args = ", ".join(to_sql(a, col_map) for a in node[2])
        return f"{_SQL_FUNCS[node[1]]}({args})"
    return f"({to_sql(node[1], col_map)} {k} {to_sql(node[2], col_map)})"
