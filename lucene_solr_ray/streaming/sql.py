"""Parallel SQL handler — ``solr/core/src/java/org/apache/solr/handler/sql/``.

The reference plans SQL with Calcite and lowers the relational tree onto
streaming expressions (``SolrTable.java`` emits ``search`` / ``rollup`` /
``stats`` / ``unique`` streams; ``SolrAggregate`` / ``SolrFilter`` /
``SolrSort`` are the pushdown rules). Ours compiles the same SQL subset
directly to a streaming-expression STRING and runs it through the streams
module — identical architecture, one fewer framework.

Supported subset (the reference handler's documented surface):

    SELECT [DISTINCT] col [AS a] | agg(col|*) [AS a], ...
    FROM <collection>
    [WHERE col op literal [AND ...]]        op ∈ {=, <, <=, >, >=}
    [GROUP BY col, ...]
    [HAVING agg(col|*) op number [AND ...]]
    [ORDER BY col [ASC|DESC], ...]
    [LIMIT n]

WHERE pushes down to the ``q`` param (→ parquet scan filter), GROUP BY
becomes ``rollup`` over a key-sorted ``search`` (partials shuffle, not
rows), bare aggregates become ``stats``, DISTINCT becomes ``unique``,
ORDER BY+LIMIT becomes ``top`` (per-block partial top-k merge).
"""

from __future__ import annotations

import re

import pyarrow as pa

AGG_FNS = {"count", "sum", "min", "max", "avg"}

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<str>'(?:[^']|'')*')|(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9]*)|(?P<op><=|>=|<>|[=<>(),*]))"
)

_KEYWORDS = {"select", "distinct", "from", "where", "group", "by", "having",
             "order", "limit", "and", "as", "asc", "desc"}


def _tokenize(sql: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(sql):
        m = _TOKEN_RE.match(sql, i)
        if not m:
            if sql[i:].strip():
                raise ValueError(f"SQL parse error at: {sql[i:i+20]!r}")
            break
        i = m.end()
        if m.group("str") is not None:
            toks.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            toks.append(("num", m.group("num")))
        elif m.group("id") is not None:
            v = m.group("id")
            toks.append(("kw", v.lower()) if v.lower() in _KEYWORDS else ("id", v))
        else:
            toks.append(("op", m.group("op")))
    return toks


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, kind=None, val=None):
        if self.i >= len(self.toks):
            return None
        k, v = self.toks[self.i]
        if kind is not None and k != kind:
            return None
        if val is not None and v != val:
            return None
        return v

    def take(self, kind=None, val=None):
        got = self.peek(kind, val)
        if got is None:
            at = self.toks[self.i] if self.i < len(self.toks) else "<eof>"
            raise ValueError(f"SQL parse error: expected {val or kind} at {at}")
        self.i += 1
        return got

    def accept(self, kind=None, val=None):
        if self.peek(kind, val) is None:
            return False
        self.i += 1
        return True


def _parse_select_item(p: _P):
    """→ (kind, expr, alias): kind ∈ {'col', 'agg'}; expr = colname or
    (fn, col)."""
    if p.peek("id") and p.peek("id").lower() in AGG_FNS and \
            p.i + 1 < len(p.toks) and p.toks[p.i + 1] == ("op", "("):
        fn = p.take("id").lower()
        p.take("op", "(")
        col = "*" if p.accept("op", "*") else p.take("id")
        p.take("op", ")")
        alias = p.take("id") if p.accept("kw", "as") else f"{fn}({col})"
        return ("agg", (fn, col), alias)
    col = p.take("id")
    alias = p.take("id") if p.accept("kw", "as") else col
    return ("col", col, alias)


_Q_UNSAFE = set(" \"'[]{}():")


def _parse_cond(p: _P):
    """→ q-syntax clause string for parse_q pushdown."""
    col = p.take("id")
    op = p.take("op")
    if p.peek("str") is not None:
        lit = p.take("str")
        if any(ch in _Q_UNSAFE for ch in lit):
            # the literal is spliced into the q param (clauses split on
            # " AND ", ranges use brackets) — reject rather than mis-parse
            raise ValueError(f"unsupported characters in WHERE literal {lit!r}")
    else:
        lit = p.take("num")
    if op == "=":
        return f"{col}:{lit}"
    if op == ">":
        return f"{col}:{{{lit} TO *]"
    if op == ">=":
        return f"{col}:[{lit} TO *]"
    if op == "<":
        return f"{col}:[* TO {lit}}}"
    if op == "<=":
        return f"{col}:[* TO {lit}]"
    raise ValueError(f"unsupported WHERE operator {op!r}")


_HAVING_OP = {"=": "eq", ">": "gt", "<": "lt", ">=": "gteq", "<=": "lteq"}


def sql_to_stream(sql: str) -> str:
    """Compile one SQL statement to a streaming-expression string."""
    p = _P(_tokenize(sql))
    p.take("kw", "select")
    distinct = p.accept("kw", "distinct")
    items = [_parse_select_item(p)]
    while p.accept("op", ","):
        items.append(_parse_select_item(p))
    p.take("kw", "from")
    coll = p.take("id")

    q_clauses: list[str] = []
    if p.accept("kw", "where"):
        q_clauses.append(_parse_cond(p))
        while p.accept("kw", "and"):
            q_clauses.append(_parse_cond(p))

    group_by: list[str] = []
    if p.accept("kw", "group"):
        p.take("kw", "by")
        group_by.append(p.take("id"))
        while p.accept("op", ","):
            group_by.append(p.take("id"))

    having: list[tuple[str, str, str]] = []
    if p.accept("kw", "having"):
        while True:
            kind, (fn, col), _ = _parse_select_item(p)
            if kind != "agg":
                raise ValueError("HAVING supports aggregate comparisons only")
            op = p.take("op")
            val = p.take("num")
            having.append((f"{fn}({col})", _HAVING_OP[op], val))
            if not p.accept("kw", "and"):
                break

    order: list[tuple[str, bool]] = []
    if p.accept("kw", "order"):
        p.take("kw", "by")
        while True:
            c = p.take("id")
            asc = True
            if p.accept("kw", "desc"):
                asc = False
            else:
                p.accept("kw", "asc")
            order.append((c, asc))
            if not p.accept("op", ","):
                break

    limit = int(p.take("num")) if p.accept("kw", "limit") else None
    if p.i != len(p.toks):
        raise ValueError(f"trailing SQL tokens: {p.toks[p.i:]}")

    aggs = [(expr, alias) for kind, expr, alias in items if kind == "agg"]
    cols = [(expr, alias) for kind, expr, alias in items if kind == "col"]
    if group_by and not aggs:
        raise ValueError("GROUP BY without aggregates is not supported "
                         "(use SELECT DISTINCT)")
    if aggs and not group_by and cols:
        # e.g. SELECT a, count(*) FROM t — would lower to stats() plus a
        # projection of a column the stats stream never emits
        raise ValueError(
            "non-aggregated SELECT columns "
            f"{[c for c, _ in cols]} require GROUP BY"
        )
    if having and not group_by:
        raise ValueError("HAVING requires GROUP BY")
    q = f' q="{" AND ".join(q_clauses)}"' if q_clauses else ""

    if aggs and group_by:
        if sorted(c for c, _ in cols) != sorted(group_by):
            raise ValueError("non-aggregated SELECT columns must match GROUP BY")
        need = sorted({c for (_, c), _ in aggs if c != "*"} | set(group_by))
        ksort = ",".join(f"{k} asc" for k in group_by)
        metrics = ",".join(f"{fn}({c})" for (fn, c), _ in aggs)
        s = (f'rollup(search({coll},{q[1:] + "," if q else ""}'
             f'fl="{",".join(need)}",sort="{ksort}"),'
             f'over="{",".join(group_by)}",{metrics})')
        for name, op, val in having:
            s = f"having({s},{op}({name},{val}))"
    elif aggs:
        metrics = ",".join(f"{fn}({c})" for (fn, c), _ in aggs)
        s = f"stats({coll},{q[1:] + ',' if q else ''}{metrics})"
    else:
        fl = ",".join(c for c, _ in cols)
        if order:
            ospec = ",".join(
                "{} {}".format(c, "asc" if a else "desc") for c, a in order
            )
            srt = f',sort="{ospec}"'
        else:
            srt = ""
        s = f'search({coll},{q[1:] + "," if q else ""}fl="{fl}"{srt})'
        if distinct:
            s = f'unique({s},over="{",".join(c for c, _ in cols)}")'

    # alias projection (SolrProject)
    def _src(kind: str, expr) -> str:
        return expr if kind == "col" else f"{expr[0]}({expr[1]})"

    if any(_src(k, e) != a for k, e, a in items):
        all_fields = ", ".join(
            f"{_src(k, e)} as {a}" if _src(k, e) != a else a for k, e, a in items
        )
        s = f'select({s},"{all_fields}")'

    # search()'s sort param is merge metadata, not a physical sort — ORDER BY
    # always lowers to sort()/top() (SolrSort); LIMIT without ORDER BY would
    # be nondeterministic (the reference requires a sort on /export too)
    if order:
        spec = ",".join(f"{c} {'asc' if a else 'desc'}" for c, a in order)
        s = f'top({s},n={limit},sort="{spec}")' if limit is not None \
            else f'sort({s},by="{spec}")'
    elif limit is not None:
        raise ValueError("LIMIT requires ORDER BY (deterministic output)")
    return s


def run_sql(sql: str, sf_dir: str) -> pa.Table:
    """Compile + execute one SQL statement over the testdata collections."""
    from .streams import run_expression

    return run_expression(sql_to_stream(sql), sf_dir)
