"""Solr Analytics contrib analog (SURVEY.md §2.8; reference
``solr/contrib/analytics/src/java/org/apache/solr/analytics/``) —
expression-based analytics over facet streams, re-expressed Ray-Data-first.

The reference surface (AnalyticsRequestManager.java:40-120,
ExpressionFactory.java:781-835) is: an expression language combining
*mapping functions* (``function/mapping/*.java`` — add, mult, div, pow,
neg, abs, log, round/ceil/floor, concat, fill_missing, filter, remove,
replace, if, equal, gt/gte/lt/lte, and/or, exists, top, bottom, string)
applied per document, reduced by *reduction functions*
(``function/reduction/*.java`` — count, doc_count, missing, sum, mean,
median, percentile, ordinal, min, max, unique) and grouped by *facets*
(``facet/{ValueFacet,RangeFacet,PivotFacet,QueryFacet}.java``), plus the
derived "variable functions" (wmean, variance, stddev, sumofsquares,
sqrt — ExpressionFactory.java:829-835).

Ray-Data-first shape: ONE ``map_batches`` pass over the corpus evaluates
every mapping expression vectorized (numpy kernels over Arrow-backed
columns) and emits tiny per-block reduction PARTIALS in long format
(group key, reduction id, payload) — the combiner pattern used across
this repo. The driver merges partials; nothing corpus-sized moves.
Partials are exact (python ints / value histograms / distinct sets), so
the final float math is one short deterministic op sequence on both the
engine and the DuckDB-oracle side.

Sorted-list reductions (median / percentile / ordinal —
``reduction/data/SortedListCollector.java:190-214``) use a value→count
histogram partial: exact, and merged histograms are bounded by the
number of distinct values per group (fine for the bounded-domain metric
columns used here; the t-digest sketch in ``solr_facets.py`` is the
unbounded-domain scale path). Reference index math reproduced exactly:

- percentile(p): ordinal ``round(p/100·size − .5)`` ≡ ``floor(p·size/100)``
  (SortedListCollector.java:197, PercentileFunction.java:61-64)
- ordinal(k): ``k−1`` if k>0 else ``size+k`` (SortedListCollector.java:200-205)
- median: mean of the two middles for even sizes (MedianFunction.java:166-173)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

# ---------------------------------------------------------------------------
# Expression language: parser → tuple AST
#   ("field", name) | ("const", value) | ("call", fname, [args])
# mirrors AnalyticsRequestParser / ExpressionFactory.createExpression.
# ---------------------------------------------------------------------------


def parse_expr(s: str):
    pos = 0
    n = len(s)

    def skip_ws():
        nonlocal pos
        while pos < n and s[pos].isspace():
            pos += 1

    def parse_atom():
        nonlocal pos
        skip_ws()
        if pos >= n:
            raise ValueError(f"unexpected end of expression: {s!r}")
        c = s[pos]
        if c == "'":
            pos += 1
            start = pos
            while pos < n and s[pos] != "'":
                pos += 1
            if pos >= n:
                raise ValueError(f"unterminated string in {s!r}")
            val = s[start:pos]
            pos += 1
            return ("const", val)
        if c.isdigit() or c == "-" or c == ".":
            start = pos
            pos += 1
            while pos < n and (s[pos].isdigit() or s[pos] in ".eE+-"):
                # stop '+'/'-' unless right after an exponent marker
                if s[pos] in "+-" and s[pos - 1] not in "eE":
                    break
                pos += 1
            tok = s[start:pos]
            return ("const", float(tok) if ("." in tok or "e" in tok or "E" in tok) else int(tok))
        if c.isalpha() or c == "_":
            start = pos
            while pos < n and (s[pos].isalnum() or s[pos] == "_"):
                pos += 1
            name = s[start:pos]
            skip_ws()
            if pos < n and s[pos] == "(":
                pos += 1
                args = []
                skip_ws()
                if pos < n and s[pos] == ")":
                    pos += 1
                    return ("call", name, args)
                while True:
                    args.append(parse_atom())
                    skip_ws()
                    if pos < n and s[pos] == ",":
                        pos += 1
                        continue
                    if pos < n and s[pos] == ")":
                        pos += 1
                        return ("call", name, args)
                    raise ValueError(f"expected ',' or ')' at {pos} in {s!r}")
            if name == "true":
                return ("const", True)
            if name == "false":
                return ("const", False)
            return ("field", name)
        raise ValueError(f"unexpected char {c!r} at {pos} in {s!r}")

    ast = parse_atom()
    skip_ws()
    if pos != n:
        raise ValueError(f"trailing input at {pos} in {s!r}")
    return ast


# ---------------------------------------------------------------------------
# Mapping compiler: AST → fn(pd.DataFrame) → (values ndarray, valid ndarray)
# Missing propagates through every mapping function except fill_missing /
# exists / if-branch selection — matching the reference's AnalyticsValue
# "exists" contract (value/mapping/*.java).
# ---------------------------------------------------------------------------

REDUCTIONS = {
    "count",
    "doc_count",
    "missing",
    "sum",
    "mean",
    "median",
    "min",
    "max",
    "unique",
    "percentile",
    "ordinal",
    "variance",
    "stddev",
    "sumofsquares",
    "wmean",
}


def _const_arrays(v, size):
    return np.full(size, v, dtype=(np.float64 if isinstance(v, (int, float)) and not isinstance(v, bool) else object)), np.ones(size, dtype=bool)


def eval_mapping(ast, df: pd.DataFrame):
    """Evaluate a mapping-only AST over a batch → (values, valid mask)."""
    size = len(df)
    kind = ast[0]
    if kind == "const":
        return _const_arrays(ast[1], size)
    if kind == "field":
        col = df[ast[1]]
        valid = col.notna().to_numpy()
        vals = col.to_numpy()
        if vals.dtype.kind in "iu":
            vals = vals.astype(np.float64)
        elif vals.dtype.kind not in "fb":
            vals = vals.astype(object)
        return vals, valid
    name, args = ast[1], ast[2]
    ev = [eval_mapping(a, df) for a in args]

    def allvalid(*parts):
        m = np.ones(size, dtype=bool)
        for v, ok in parts:
            m &= ok
        return m

    if name == "add":
        out = np.zeros(size)
        for v, _ in ev:
            out = out + v
        return out, allvalid(*ev)
    if name == "sub":
        return ev[0][0] - ev[1][0], allvalid(*ev)
    if name == "mult":
        out = np.ones(size)
        for v, _ in ev:
            out = out * v
        return out, allvalid(*ev)
    if name == "div":
        with np.errstate(divide="ignore", invalid="ignore"):
            return ev[0][0] / ev[1][0], allvalid(*ev)
    if name == "pow":
        return np.power(ev[0][0], ev[1][0]), allvalid(*ev)
    if name == "neg":
        return -ev[0][0], ev[0][1]
    if name == "abs":
        return np.abs(ev[0][0]), ev[0][1]
    if name == "log":
        with np.errstate(divide="ignore", invalid="ignore"):
            if len(ev) == 2:  # log(x, base) — LogFunction.java two-arg form
                return np.log(ev[0][0]) / np.log(ev[1][0]), allvalid(*ev)
            return np.log(ev[0][0]), ev[0][1]
    if name == "round":
        # Java Math.round == floor(x + .5) (RoundFunction / DecimalNumericConversionFunction)
        return np.floor(ev[0][0] + 0.5), ev[0][1]
    if name == "ceil":
        return np.ceil(ev[0][0]), ev[0][1]
    if name == "floor":
        return np.floor(ev[0][0]), ev[0][1]
    if name == "string":
        v, ok = ev[0]
        if v.dtype.kind == "f" and np.all(np.equal(np.mod(v[ok], 1), 0)):
            # convert only VALID rows (invalid slots can hold NaN — int(nan)
            # raises); invalid rows are masked out by `ok` downstream
            out = np.full(size, "", dtype=object)
            out[ok] = [str(int(x)) for x in v[ok]]
        else:
            out = v.astype(str).astype(object)
        return out, ok
    if name in ("concat", "concat_sep"):
        sep = ""
        parts = ev
        if name == "concat_sep":
            sep = str(ev[0][0][0]) if size else ""
            parts = ev[1:]
        out = np.full(size, "", dtype=object)
        for i, (v, _) in enumerate(parts):
            sv = v if v.dtype == object else v.astype(str)
            if i == 0:  # positional, NOT out=="" — empty-string values are
                out = sv.astype(object).copy()  # legitimate parts
            else:
                out = out + sep + sv.astype(object)
        # reference ConcatFunction: missing arg → whole result missing
        return out, allvalid(*parts)
    if name == "fill_missing":
        a, am = ev[0]
        b, bm = ev[1]
        return np.where(am, a, b), am | bm
    if name == "exists":
        return ev[0][1].copy(), np.ones(size, dtype=bool)
    if name == "filter":
        v, ok = ev[0]
        cond, cok = ev[1]
        return v, ok & cok & cond.astype(bool)
    if name == "remove":
        v, ok = ev[0]
        t, tm = ev[1]
        return v, ok & ~((v == t) & tm)
    if name == "replace":
        v, ok = ev[0]
        t, _ = ev[1]
        r, _ = ev[2]
        return np.where((v == t) & ok, r, v), ok
    if name == "if":
        c, cm = ev[0]
        t, tm = ev[1]
        f, fm = ev[2]
        cb = c.astype(bool)
        return np.where(cb, t, f), cm & np.where(cb, tm, fm)
    if name == "equal":
        return (ev[0][0] == ev[1][0]), allvalid(*ev)
    if name in ("gt", "gte", "lt", "lte"):
        a, b = ev[0][0], ev[1][0]
        op = {"gt": np.greater, "gte": np.greater_equal, "lt": np.less, "lte": np.less_equal}[name]
        return op(a, b), allvalid(*ev)
    if name == "and":
        out = np.ones(size, dtype=bool)
        for v, _ in ev:
            out &= v.astype(bool)
        return out, allvalid(*ev)
    if name == "or":
        out = np.zeros(size, dtype=bool)
        for v, _ in ev:
            out |= v.astype(bool)
        return out, allvalid(*ev)
    if name == "top":  # row-wise max over params (TopFunction.java)
        out = ev[0][0].copy()
        for v, _ in ev[1:]:
            out = np.maximum(out, v)
        return out, allvalid(*ev)
    if name == "bottom":
        out = ev[0][0].copy()
        for v, _ in ev[1:]:
            out = np.minimum(out, v)
        return out, allvalid(*ev)
    raise ValueError(f"unknown mapping function {name!r}")


# ---------------------------------------------------------------------------
# Reductions: per-batch partial → merge → finalize.
# Partials are exact: python-int sums for integer-valued streams, value→count
# histograms for sorted-list reductions, frozensets for unique.
# ---------------------------------------------------------------------------


def split_reduction(expr: str):
    """'sum(mult(n_chars,2))' → ('sum', (), inner-AST). percentile/ordinal/
    wmean carry leading constant/weight params like the reference creators."""
    ast = parse_expr(expr)
    if ast[0] != "call" or ast[1] not in REDUCTIONS:
        raise ValueError(f"top level of {expr!r} must be a reduction function")
    name, args = ast[1], ast[2]
    if name == "percentile":
        if args[0][0] != "const":
            raise ValueError("percentile requires a constant first arg")
        return name, (float(args[0][1]) / 100.0,), args[1]
    if name == "ordinal":
        if args[0][0] != "const":
            raise ValueError("ordinal requires a constant int first arg")
        return name, (int(args[0][1]),), args[1]
    if name == "wmean":  # wmean(weight, value) = sum(w·v)/sum(w)
        return name, (args[0],), args[1]
    if len(args) != 1:
        raise ValueError(f"{name} takes exactly one expression")
    return name, (), args[0]


_HIST_REDUCTIONS = {"median", "percentile", "ordinal"}
_MOMENT_REDUCTIONS = {"sum", "mean", "variance", "stddev", "sumofsquares", "wmean"}


def _partial(name, params, vals, valid, df):
    """One (reduction, batch-slice) partial. Exactness: integer-valued
    streams accumulate as python ints so merge order can't perturb floats."""
    if name in ("count", "doc_count"):
        return int(valid.sum())
    if name == "missing":
        return int((~valid).sum())
    v = vals[valid]
    if name in _MOMENT_REDUCTIONS:
        fv = v.astype(np.float64)
        int_exact = fv.size == 0 or bool(np.all(np.equal(np.mod(fv, 1), 0)))
        if name == "wmean":
            return None  # handled by caller (needs the weight stream)
        s = int(fv.sum()) if int_exact else float(fv.sum())
        sq = int((fv * fv).sum()) if int_exact else float((fv * fv).sum())
        return (int(v.size), s, sq)
    if name in ("min", "max"):
        if v.size == 0:
            return None
        return v.min() if name == "min" else v.max()
    if name == "unique":
        return frozenset(v.tolist())
    if name in _HIST_REDUCTIONS:
        uniq, cnt = np.unique(v, return_counts=True)
        return dict(zip(uniq.tolist(), cnt.tolist()))
    raise ValueError(name)


def _merge(name, a, b):
    if a is None:
        return b
    if b is None:
        return a
    if name in ("count", "doc_count", "missing"):
        return a + b
    if name in _MOMENT_REDUCTIONS:
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2])
    if name == "min":
        return min(a, b)
    if name == "max":
        return max(a, b)
    if name == "unique":
        return a | b
    if name in _HIST_REDUCTIONS:
        out = dict(a)
        for k, c in b.items():
            out[k] = out.get(k, 0) + c
        return out
    raise ValueError(name)


def _finalize(name, params, st):
    if st is None:
        return None
    if name in ("count", "doc_count", "missing"):
        return float(st)
    if name in ("min", "max"):
        return float(st)
    if name == "unique":
        return float(len(st))
    if name in _MOMENT_REDUCTIONS:
        cnt, s, sq = st
        if cnt == 0:
            return None
        if name == "sum":
            return float(s)
        if name == "mean":
            return float(s) / cnt
        if name == "sumofsquares":
            return float(sq)
        if name == "variance":  # VarianceVariableFunction: div(sub(sumofsquares, div(pow(sum,2),count)), count)
            return (float(sq) - float(s) * float(s) / cnt) / cnt
        if name == "stddev":
            return math.sqrt((float(sq) - float(s) * float(s) / cnt) / cnt)
    if name in _HIST_REDUCTIONS:
        keys = sorted(st)
        counts = np.array([st[k] for k in keys], dtype=np.int64)
        size = int(counts.sum())
        if size == 0:
            return None
        cum = np.cumsum(counts)

        def at(idx: int):
            return keys[int(np.searchsorted(cum, idx, side="right"))]

        if name == "median":  # MedianFunction.java:166-173
            mid = size // 2
            if size % 2 == 0:
                return (float(at(mid)) + float(at(mid - 1))) / 2.0
            return float(at(mid))
        if name == "percentile":  # floor(p·size) == round(p·size − .5)
            return float(at(int(math.floor(params[0] * size))))
        if name == "ordinal":
            k = params[0]
            idx = k - 1 if k > 0 else size + k
            if idx < 0 or idx >= size:
                return None
            return float(at(idx))
    raise ValueError(name)


# ---------------------------------------------------------------------------
# The grouped-analytics driver: ONE map_batches pass → long partials → merge.
# ---------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _referenced_fields(ast, acc: set):
    if ast[0] == "field":
        acc.add(ast[1])
    elif ast[0] == "call":
        for a in ast[2]:
            _referenced_fields(a, acc)
    return acc


def run_analytics(
    sf_dir: str,
    *,
    table: str = "documents",
    group_expr: str | None = None,
    reductions: dict[str, str],
) -> dict:
    """Grouped analytics → {group_value: {rname: float}}. group_expr None ⇒
    one global group keyed ''. ValueFacet analog (facet/ValueFacet.java)."""
    specs = {rn: split_reduction(rx) for rn, rx in reductions.items()}
    gast = parse_expr(group_expr) if group_expr else None
    fields: set[str] = set()
    for name, params, inner in specs.values():
        _referenced_fields(inner, fields)
        if name == "wmean":
            _referenced_fields(params[0], fields)
    if gast is not None:
        _referenced_fields(gast, fields)

    def batch_partials(batch: pd.DataFrame) -> pd.DataFrame:
        import pickle

        if gast is not None:
            gvals, gok = eval_mapping(gast, batch)
            gkey = np.where(gok, gvals.astype(object), None)
        else:
            gkey = np.full(len(batch), "", dtype=object)
        rows = []
        groups = pd.Series(range(len(batch))).groupby(gkey, dropna=True).indices
        for gval, idx in groups.items():
            sub = batch.iloc[idx]
            for rn, (name, params, inner) in specs.items():
                vals, valid = eval_mapping(inner, sub)
                if name == "wmean":
                    w, wok = eval_mapping(params[0], sub)
                    m = valid & wok
                    fw, fv = w[m].astype(np.float64), vals[m].astype(np.float64)
                    p = (float((fw * fv).sum()), float(fw.sum()), 0.0)
                else:
                    p = _partial(name, params, vals, valid, sub)
                rows.append({"g": str(gval), "r": rn, "p": pickle.dumps(p)})
        return pd.DataFrame(rows, columns=["g", "r", "p"])

    ds = _read(sf_dir, table, sorted(fields)).map_batches(batch_partials, batch_format="pandas")
    import pickle

    merged: dict = {}
    for b in ds.iter_batches(batch_format="pandas"):
        for g, r, p in zip(b["g"], b["r"], b["p"]):
            name = specs[r][0]
            st = pickle.loads(p)
            key = (g, r)
            if name == "wmean":
                prev = merged.get(key)
                merged[key] = st if prev is None else (prev[0] + st[0], prev[1] + st[1], 0.0)
            else:
                merged[key] = _merge(name, merged.get(key), st)
    out: dict = {}
    for (g, r), st in merged.items():
        name, params, _ = specs[r]
        if name == "wmean":
            val = st[0] / st[1] if st and st[1] else None
        else:
            val = _finalize(name, params, st)
        out.setdefault(g, {})[r] = val
    return out


# ---------------------------------------------------------------------------
# Driver-gate entries (queries() callables) + their DuckDB oracle SQL.
# ---------------------------------------------------------------------------

_UNGROUPED = {
    "n_count": "count(n_chars)",
    "n_missing": "missing(filter(n_chars, gt(n_chars, 500)))",
    "n_filtered": "count(filter(n_chars, gt(n_chars, 500)))",
    "n_sum2": "sum(mult(n_chars, 2))",
    "n_mean10": "mean(add(n_chars, 10))",
    "n_median": "median(n_chars)",
    "n_p90": "percentile(90, n_chars)",
    "n_p25": "percentile(25, n_chars)",
    "n_ord5": "ordinal(5, n_chars)",
    "n_ordneg": "ordinal(-3, n_chars)",
    "n_min": "min(n_chars)",
    "n_max100": "max(sub(n_chars, 100))",
    "n_unique_ls": "unique(concat_sep('|', lang, source))",
    "n_stddev": "stddev(n_chars)",
    "n_variance": "variance(n_chars)",
    "n_wmean": "wmean(n_chars, n_chars)",
}


def an_ungrouped(sf_dir: str) -> pa.Table:
    """Ungrouped analytics request: the full reduction surface composed with
    mapping functions, one row per expression (AnalyticsExpression.java)."""
    res = run_analytics(sf_dir, reductions=_UNGROUPED)[""]
    names = sorted(_UNGROUPED)
    return pa.table(
        {
            "expr": pa.array(names, pa.string()),
            "value": pa.array([res[n] for n in names], pa.float64()),
        }
    )


SQL_AN_UNGROUPED = """
WITH s AS (
  SELECT n_chars, row_number() OVER (ORDER BY n_chars) rn, count(*) OVER () n
  FROM documents
), vals AS (
  SELECT 'n_count' expr, CAST(count(n_chars) AS DOUBLE) AS "value" FROM documents
  UNION ALL SELECT 'n_missing', CAST(count(*) FILTER (WHERE NOT (n_chars > 500)) AS DOUBLE) FROM documents
  UNION ALL SELECT 'n_filtered', CAST(count(*) FILTER (WHERE n_chars > 500) AS DOUBLE) FROM documents
  UNION ALL SELECT 'n_sum2', CAST(sum(n_chars * 2) AS DOUBLE) FROM documents
  UNION ALL SELECT 'n_mean10', CAST(sum(n_chars + 10) AS DOUBLE) / count(*) FROM documents
  UNION ALL SELECT 'n_median', CAST(median(n_chars) AS DOUBLE) FROM documents
  UNION ALL SELECT 'n_p90', CAST(n_chars AS DOUBLE) FROM s WHERE rn = CAST(floor(0.9 * n) AS BIGINT) + 1
  UNION ALL SELECT 'n_p25', CAST(n_chars AS DOUBLE) FROM s WHERE rn = CAST(floor(0.25 * n) AS BIGINT) + 1
  UNION ALL SELECT 'n_ord5', CAST(n_chars AS DOUBLE) FROM s WHERE rn = 5
  UNION ALL SELECT 'n_ordneg', CAST(n_chars AS DOUBLE) FROM s WHERE rn = n - 3 + 1
  UNION ALL SELECT 'n_min', CAST(min(n_chars) AS DOUBLE) FROM documents
  UNION ALL SELECT 'n_max100', CAST(max(n_chars - 100) AS DOUBLE) FROM documents
  UNION ALL SELECT 'n_unique_ls', CAST(count(DISTINCT lang || '|' || source) AS DOUBLE) FROM documents
  UNION ALL SELECT 'n_stddev', sqrt((CAST(sum(n_chars * n_chars) AS DOUBLE) - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE) / count(*)) / count(*)) FROM documents
  UNION ALL SELECT 'n_variance', (CAST(sum(n_chars * n_chars) AS DOUBLE) - CAST(sum(n_chars) AS DOUBLE) * CAST(sum(n_chars) AS DOUBLE) / count(*)) / count(*) FROM documents
  UNION ALL SELECT 'n_wmean', CAST(sum(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE) FROM documents
)
SELECT expr, "value" FROM vals ORDER BY expr
"""

_GROUPED = {
    "g_count": "count(n_chars)",
    "g_sum": "sum(n_chars)",
    "g_mean": "mean(n_chars)",
    "g_median": "median(n_chars)",
    "g_p75": "percentile(75, n_chars)",
    "g_unique_src": "unique(source)",
    "g_min": "min(n_chars)",
    "g_max": "max(n_chars)",
}


def an_value_facet(sf_dir: str) -> pa.Table:
    """ValueFacet analog: group by the mapping expression
    ``concat_sep('-', lang, string(gt(n_chars, 500)))`` (facet/ValueFacet.java
    sorts buckets by value — we emit sorted by facet key)."""
    res = run_analytics(
        sf_dir,
        group_expr="concat_sep('-', lang, string(gt(n_chars, 500)))",
        reductions=_GROUPED,
    )
    gvals = sorted(res)
    cols: dict = {"facet": pa.array(gvals, pa.string())}
    for rn in sorted(_GROUPED):
        cols[rn] = pa.array([res[g].get(rn) for g in gvals], pa.float64())
    return pa.table(cols)


SQL_AN_VALUE_FACET = """
WITH base AS (
  SELECT lang || '-' || CASE WHEN n_chars > 500 THEN 'True' ELSE 'False' END AS facet, n_chars, source
  FROM documents
), ranked AS (
  SELECT facet, n_chars, row_number() OVER (PARTITION BY facet ORDER BY n_chars) rn,
         count(*) OVER (PARTITION BY facet) n
  FROM base
), pcts AS (
  SELECT facet, CAST(n_chars AS DOUBLE) p75 FROM ranked WHERE rn = CAST(floor(0.75 * n) AS BIGINT) + 1
)
SELECT b.facet,
       CAST(count(b.n_chars) AS DOUBLE) g_count,
       CAST(max(b.n_chars) AS DOUBLE) g_max,
       CAST(sum(b.n_chars) AS DOUBLE) / count(*) g_mean,
       CAST(median(b.n_chars) AS DOUBLE) g_median,
       CAST(min(b.n_chars) AS DOUBLE) g_min,
       any_value(p.p75) g_p75,
       CAST(sum(b.n_chars) AS DOUBLE) g_sum,
       CAST(count(DISTINCT b.source) AS DOUBLE) g_unique_src
FROM base b JOIN pcts p USING (facet)
GROUP BY b.facet ORDER BY b.facet
"""


def an_range_facet(sf_dir: str) -> pa.Table:
    """RangeFacet analog (facet/RangeFacet.java): gap buckets
    [start + i·gap, start + (i+1)·gap) over n_chars, start=0 end=1000
    gap=250, default include=LOWER — reductions per bucket."""
    start, end, gap = 0, 1000, 250
    res = run_analytics(
        sf_dir,
        group_expr=f"filter(mult(floor(div(sub(n_chars, {start}), {gap})), {gap}), and(gte(n_chars, {start}), lt(n_chars, {end})))",
        reductions={"r_count": "count(n_chars)", "r_sum": "sum(n_chars)", "r_mean": "mean(n_chars)"},
    )
    lows = sorted(float(g) for g in res)
    return pa.table(
        {
            "bucket_low": pa.array([int(g) for g in lows], pa.int64()),
            "r_count": pa.array([res[str(float(g))]["r_count"] for g in lows], pa.float64()),
            "r_mean": pa.array([res[str(float(g))]["r_mean"] for g in lows], pa.float64()),
            "r_sum": pa.array([res[str(float(g))]["r_sum"] for g in lows], pa.float64()),
        }
    )


SQL_AN_RANGE_FACET = """
SELECT CAST(floor(n_chars / 250.0) AS BIGINT) * 250 bucket_low,
       CAST(count(*) AS DOUBLE) r_count,
       CAST(sum(n_chars) AS DOUBLE) / count(*) r_mean,
       CAST(sum(n_chars) AS DOUBLE) r_sum
FROM documents WHERE n_chars >= 0 AND n_chars < 1000
GROUP BY 1 ORDER BY 1
"""


def an_pivot_facet(sf_dir: str) -> pa.Table:
    """PivotFacet analog (facet/PivotFacet.java, PivotNode.java): lang →
    source two-level pivot; parent rows carry source='*'. Implemented as two
    grouped passes over the SAME single-scan machinery (each pass is one
    map_batches combiner — nothing corpus-sized moves)."""
    reds = {"p_count": "count(n_chars)", "p_sum": "sum(n_chars)", "p_unique": "unique(source)"}
    leaf = run_analytics(sf_dir, group_expr="concat_sep('|', lang, source)", reductions=reds)
    top = run_analytics(sf_dir, group_expr="lang", reductions=reds)
    rows = []
    for g in sorted(top):
        r = top[g]
        rows.append((g, "*", r["p_count"], r["p_sum"], r["p_unique"]))
    for g in sorted(leaf):
        lang, source = g.split("|", 1)
        r = leaf[g]
        rows.append((lang, source, r["p_count"], r["p_sum"], r["p_unique"]))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "p_count": pa.array([r[2] for r in rows], pa.float64()),
            "p_sum": pa.array([r[3] for r in rows], pa.float64()),
            "p_unique": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


SQL_AN_PIVOT_FACET = """
SELECT lang, COALESCE(source, '*') AS source,
       CAST(count(*) AS DOUBLE) p_count,
       CAST(sum(n_chars) AS DOUBLE) p_sum,
       CAST(count(DISTINCT source) AS DOUBLE) p_unique
FROM documents
GROUP BY GROUPING SETS ((lang), (lang, source))
ORDER BY lang, source
"""


def an_mapping_row(sf_dir: str) -> pa.Table:
    """Row-wise mapping-function surface (function/mapping/*.java): one
    SELECT applying if/equal/top/bottom/logic/concat/replace/remove/exists/
    fill_missing/string/round/log/pow per document — first 100 docs by id."""
    exprs = {
        "m_if": "if(gt(n_chars, 500), mult(n_chars, 2), neg(n_chars))",
        "m_top": "top(n_chars, 400)",
        "m_bottom": "bottom(n_chars, 400)",
        "m_logic": "string(and(gt(n_chars, 100), or(equal(lang, 'en'), equal(lang, 'de'))))",
        "m_concat": "concat(lang, '/', source)",
        "m_replace": "replace(lang, 'en', 'english')",
        "m_fill": "fill_missing(remove(lang, 'en'), 'removed')",
        "m_round": "round(div(n_chars, 7))",
        # libm last-bit divergence (np.log/np.power vs DuckDB ln/pow): pin
        # both sides to a 1e-12 grid with the same floor(x·1e12 + .5) formula
        "m_log": "div(round(mult(log(add(n_chars, 1)), 1000000000000)), 1000000000000)",
        "m_pow": "div(round(mult(pow(n_chars, 0.5), 1000000000000)), 1000000000000)",
        "m_abs": "abs(sub(n_chars, 500))",
        "m_exists": "string(exists(remove(source, 'web')))",
    }
    asts = {k: parse_expr(v) for k, v in exprs.items()}

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        # partial min-100 by doc_id: map the expressions only over each
        # batch's 100 lowest doc_ids and emit just those rows, so the driver
        # merges O(100 × num_blocks) rows instead of the whole mapped corpus
        # (ft_strdist pattern).
        batch = batch.nsmallest(100, "doc_id")
        out = {"doc_id": batch["doc_id"].astype("int64")}
        for k, ast in asts.items():
            vals, ok = eval_mapping(ast, batch)
            if vals.dtype == object:
                out[k] = pd.array([v if m else None for v, m in zip(vals, ok)], dtype="string")
            else:
                out[k] = pd.array(np.where(ok, vals.astype(np.float64), np.nan), dtype="Float64")
        return pd.DataFrame(out)

    ds = (
        _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
        .map_batches(fn, batch_format="pandas")
    )
    tbl = pa.concat_tables(
        [pa.Table.from_pandas(b, preserve_index=False) for b in ds.iter_batches(batch_format="pandas")]
    )
    tbl = tbl.sort_by("doc_id").slice(0, 100)
    # normalize to plain arrow types
    cols = {"doc_id": tbl["doc_id"].cast(pa.int64())}
    for k in sorted(exprs):
        f = tbl[k]
        cols[k] = f.cast(pa.string()) if pa.types.is_string(f.type) or f.type == pa.large_string() else f.cast(pa.float64())
    return pa.table(cols)


SQL_AN_MAPPING_ROW = """
SELECT doc_id,
       CAST(abs(n_chars - 500) AS DOUBLE) m_abs,
       CAST(least(n_chars, 400) AS DOUBLE) m_bottom,
       lang || '/' || source m_concat,
       CASE WHEN lang = 'en' THEN 'removed' ELSE lang END m_fill,
       CAST(CASE WHEN n_chars > 500 THEN n_chars * 2 ELSE -n_chars END AS DOUBLE) m_if,
       floor(ln(n_chars + 1) * 1000000000000 + 0.5) / 1000000000000 m_log,
       CASE WHEN n_chars > 100 AND lang IN ('en','de') THEN 'True' ELSE 'False' END m_logic,
       floor(pow(CAST(n_chars AS DOUBLE), 0.5) * 1000000000000 + 0.5) / 1000000000000 m_pow,
       CASE WHEN lang = 'en' THEN 'english' ELSE lang END m_replace,
       CAST(floor(CAST(n_chars AS DOUBLE) / 7 + 0.5) AS DOUBLE) m_round,
       CASE WHEN source = 'web' THEN 'False' ELSE 'True' END m_exists,
       CAST(greatest(n_chars, 400) AS DOUBLE) m_top
FROM documents ORDER BY doc_id LIMIT 100
"""
