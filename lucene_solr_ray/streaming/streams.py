"""Stream constructors: each Solr stream class becomes a Ray Data pipeline.

Reference semantics (all under
``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/``):

- ``search``   → ``CloudSolrStream.java`` (q pushed down to the shards; here:
  parquet predicate + column pruning at the read)
- ``rollup``   → ``RollupStream.java:60-120`` (buckets via ``over``, metrics
  ``sum/min/max/avg/count`` from ``metrics/``)
- ``facet``    → ``FacetStream.java`` (aggregates pushed into the engine;
  ``buckets``, ``bucketSorts``, ``bucketSizeLimit``)
- ``stats``    → ``StatsStream.java`` (single aggregate tuple)
- ``innerJoin``/``leftOuterJoin`` → ``InnerJoinStream.java`` /
  ``LeftOuterJoinStream.java`` (``on="l=r, ..."``; merged tuple = left fields
  with right fields added, right wins on collisions — ``Tuple.merge``)
- ``hashJoin``/``outerHashJoin`` → ``HashJoinStream.java:40-60`` (hashed
  stream fully materialized in memory — here: broadcast via ``ray.put``)
- ``unique``   → ``UniqueStream.java:55-90`` (first tuple per ``over`` key in
  the stream's declared sort order)
- ``top``      → ``RankStream.java:59-70`` (bounded priority queue, global
  top-n re-sorted by the comparator)
- ``sort``     → ``SortStream.java`` (full re-sort by ``by``)
- ``select``   → ``SelectStream.java`` (projection + ``as`` renames)
- ``having``   → ``HavingStream.java`` + the boolean evaluators
  (``eq/gt/lt/gteq/lteq/and/or/not`` in ``io/eval/``)
- ``merge``    → ``MergeStream.java`` (union of two streams; ``on`` declares
  the combined order)
- ``intersect``/``complement`` → ``IntersectStream.java`` /
  ``ComplementStream.java`` (left tuples whose ``on`` key does / does not
  appear in the right stream)
- ``fetch``    → ``FetchStream.java`` (decorate tuples with extra fields
  looked up from a collection by key)
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .parser import StreamExpression, parse_expression

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

METRIC_OPS = {"sum", "min", "max", "avg", "count"}


# ---------------------------------------------------------------------------
# sort specs and q parsing
# ---------------------------------------------------------------------------

def parse_sort_spec(spec: str) -> list[tuple[str, bool]]:
    """``"a asc, b desc"`` → ``[("a", True), ("b", False)]`` (bool = asc)."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        bits = part.split()
        col = bits[0]
        asc = True if len(bits) == 1 else bits[1].lower() != "desc"
        out.append((col, asc))
    return out


def _coerce(value: str, typ: pa.DataType):
    value = value.strip().strip('"')
    if pa.types.is_integer(typ):
        return int(value)
    if pa.types.is_floating(typ):
        return float(value)
    if pa.types.is_timestamp(typ):
        return datetime.fromisoformat(value)
    return value


def parse_q(q: str | None, schema: pa.Schema):
    """Structured-query subset of CloudSolrStream's ``q`` parameter
    (the reference pushes ``q`` down to the shards; we push it down to the
    parquet scan): ``*:*``, ``field:value``, inclusive/exclusive ranges
    ``field:[lo TO hi]`` / ``field:{lo TO hi}``, joined with ``AND``."""
    if q is None or q.strip() in ("*:*", "", "*"):
        return None
    import pyarrow.dataset as pads

    expr = None
    for clause in q.split(" AND "):
        clause = clause.strip()
        fieldname, _, rhs = clause.partition(":")
        fieldname = fieldname.strip()
        if fieldname not in schema.names:
            raise ValueError(f"unknown field in q: {fieldname!r}")
        typ = schema.field(fieldname).type
        rhs = rhs.strip()
        if rhs and rhs[0] in "[{" and rhs[-1] in "]}":
            lo_inc, hi_inc = rhs[0] == "[", rhs[-1] == "]"
            lo, _, hi = rhs[1:-1].partition(" TO ")
            e = None
            if lo.strip() != "*":
                v = _coerce(lo, typ)
                cmp = pads.field(fieldname) >= v if lo_inc else pads.field(fieldname) > v
                e = cmp
            if hi.strip() != "*":
                v = _coerce(hi, typ)
                cmp = pads.field(fieldname) <= v if hi_inc else pads.field(fieldname) < v
                e = cmp if e is None else (e & cmp)
            clause_expr = e
        else:
            clause_expr = pads.field(fieldname) == _coerce(rhs, typ)
        if clause_expr is not None:
            expr = clause_expr if expr is None else (expr & clause_expr)
    return expr


# ---------------------------------------------------------------------------
# stream node
# ---------------------------------------------------------------------------

@dataclass
class StreamNode:
    """A lazy Ray ``Dataset`` plus the stream's declared tuple order.

    Solr streams ARE their sort order (merge-sorted iterators); Ray Data
    blocks stream unordered, so the order is carried as metadata and applied
    only where semantics need it (``unique``; ``top``/``sort`` sort for
    real). ``ordered=True`` marks nodes whose block order is the declared
    order (post-``sort``/``top``)."""

    ds: object  # ray.data.Dataset
    sort: list[tuple[str, bool]] = dc_field(default_factory=list)
    ordered: bool = False

    def to_table(self) -> pa.Table:
        """Materialize (stream endpoint). Applies the declared order so the
        emitted tuple sequence matches the Solr stream's."""
        batches = list(self.ds.iter_batches(batch_format="pyarrow"))
        if not batches:
            sch = self.ds.schema()
            base = getattr(sch, "base_schema", None)
            return base.empty_table() if isinstance(base, pa.Schema) else pa.table({})
        tbl = pa.concat_tables(batches)
        if self.sort and not self.ordered:
            cols = [c for c, _ in self.sort if c in tbl.column_names]
            if cols:
                tbl = tbl.sort_by(
                    [(c, "ascending" if asc else "descending") for c, asc in self.sort if c in tbl.column_names]
                )
        return tbl


# ---------------------------------------------------------------------------
# metric helpers (metrics/SumMetric.java, MinMetric, MaxMetric, MeanMetric,
# CountMetric — tuple keys are the metric identifiers, e.g. "sum(a_i)")
# ---------------------------------------------------------------------------

def _parse_metrics(expr: StreamExpression) -> list[tuple[str, str]]:
    out = []
    for sub in expr.sub_expressions():
        if sub.name in METRIC_OPS:
            col = sub.positionals[0] if sub.positionals else "*"
            out.append((sub.name, col))
    return out


_ONES = "__ones__"


def _partial_aggs(metrics: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """pyarrow TableGroupBy aggregation list for the partial pass."""
    aggs = set()
    for op, col in metrics:
        if op == "count":
            aggs.add((_ONES, "sum"))
        elif op == "avg":
            aggs.add((col, "sum"))
            aggs.add((_ONES, "sum"))
        else:
            aggs.add((col, op))
    return sorted(aggs)


def _rollup_partial(keys: list[str], metrics: list[tuple[str, str]]):
    aggs = _partial_aggs(metrics)

    def fn(batch: pa.Table) -> pa.Table:
        b = batch.append_column(_ONES, pa.array([1] * batch.num_rows, pa.int64()))
        return pa.TableGroupBy(b, keys).aggregate(aggs)

    return fn


def _rollup_final(keys: list[str], metrics: list[tuple[str, str]]):
    aggs = _partial_aggs(metrics)
    # combining partials: sums/counts re-sum, mins re-min, maxes re-max
    combine = [(f"{col}_{op}", "sum" if op == "sum" else op) for col, op in aggs]

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = pa.TableGroupBy(batch, keys).aggregate(combine)
        cols: dict[str, pa.Array] = {k: g[k] for k in keys}
        for op, col in metrics:
            if op == "count":
                cols[f"count({col})"] = g[f"{_ONES}_sum_sum"].cast(pa.int64())
            elif op == "avg":
                s = g[f"{col}_sum_sum"].cast(pa.float64())
                n = g[f"{_ONES}_sum_sum"].cast(pa.float64())
                cols[f"avg({col})"] = pc.divide(s, n)
            else:
                cols[f"{op}({col})"] = g[f"{col}_{op}_{'sum' if op == 'sum' else op}"]
        return pa.table(cols)

    return fn


def _combiner_aggregate(ds, keys: list[str], metrics: list[tuple[str, str]]):
    """Per-block partials → single combine block. Partials (≤ |distinct keys|
    rows per block) move through the exchange, never input rows; at high key
    cardinality swap the repartition(1) for a hash-partition repartition on
    ``keys`` — the partial/final split stays identical."""
    partial = ds.map_batches(
        _rollup_partial(keys, metrics), batch_format="pyarrow", batch_size=None
    )
    return partial.repartition(1).map_batches(
        _rollup_final(keys, metrics), batch_format="pyarrow", batch_size=None
    )


# ---------------------------------------------------------------------------
# having evaluators (io/eval/{EqualTo,GreaterThan,...}Evaluator.java)
# ---------------------------------------------------------------------------

_CMP = {"eq": "==", "gt": ">", "lt": "<", "gteq": ">=", "lteq": "<="}


def _operand_name(x) -> str:
    if isinstance(x, StreamExpression):  # metric identifier, e.g. sum(a_i)
        return f"{x.name}({x.positionals[0] if x.positionals else '*'})"
    return str(x)


def _eval_predicate(expr: StreamExpression, batch: pa.Table):
    name = expr.name
    if name == "and":
        m = _eval_predicate(expr.positionals[0], batch)
        for sub in expr.positionals[1:]:
            m = pc.and_kleene(m, _eval_predicate(sub, batch))
        return m
    if name == "or":
        m = _eval_predicate(expr.positionals[0], batch)
        for sub in expr.positionals[1:]:
            m = pc.or_kleene(m, _eval_predicate(sub, batch))
        return m
    if name == "not":
        return pc.invert(_eval_predicate(expr.positionals[0], batch))
    if name in _CMP:
        lhs, rhs = expr.positionals[0], expr.positionals[1]
        col = _operand_name(lhs)
        if col not in batch.column_names:
            raise ValueError(f"having: unknown field {col!r}")
        arr = batch[col]
        rname = _operand_name(rhs)
        if rname in batch.column_names:
            other = batch[rname]
        else:
            typ = arr.type
            other = _coerce(rname, typ) if not pa.types.is_string(typ) else rname.strip('"')
        fn = {"==": pc.equal, ">": pc.greater, "<": pc.less,
              ">=": pc.greater_equal, "<=": pc.less_equal}[_CMP[name]]
        return fn(arr, other)
    raise ValueError(f"unknown having evaluator: {name}")


# ---------------------------------------------------------------------------
# stream builders
# ---------------------------------------------------------------------------

def _sized_parquet(path: str, columns: list[str] | None, filter_expr):
    import ray
    import ray.data

    try:
        rows = pq.read_metadata(path).num_rows
    except Exception:
        rows = None
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if filter_expr is not None:
        kwargs["filter"] = filter_expr
    if rows is not None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        blocks = max(1, min(ncpu * 2, rows // 1024))
        if blocks < ncpu * 2:
            kwargs["override_num_blocks"] = blocks
    return ray.data.read_parquet(path, **kwargs)


def _search(expr: StreamExpression, sf_dir: str) -> StreamNode:
    coll = expr.positionals[0]
    if coll not in TABLES:
        raise ValueError(f"unknown collection {coll!r}")
    path = f"{sf_dir}/{coll}.parquet"
    schema = pq.read_schema(path)
    q = expr.named.get("q")
    fl = expr.named.get("fl")
    sort = parse_sort_spec(expr.named["sort"]) if "sort" in expr.named else []
    cols = [c.strip() for c in fl.split(",")] if fl else None
    if cols:
        # sort fields ride along even when not in fl (CloudSolrStream does
        # the same so the merge comparator can see them)
        for c, _ in sort:
            if c not in cols and c in schema.names:
                cols.append(c)
    ds = _sized_parquet(path, cols, parse_q(q, schema))
    aliases = expr.named.get("aliases")
    if aliases:
        ren = {}
        for pair in aliases.split(","):
            src, _, dst = pair.partition("=")
            ren[src.strip()] = dst.strip()
        ds = ds.map_batches(
            lambda b, ren=ren: b.rename_columns([ren.get(c, c) for c in b.column_names]),
            batch_format="pyarrow",
        )
        sort = [(ren.get(c, c), asc) for c, asc in sort]
    return StreamNode(ds, sort)


def _rollup(expr: StreamExpression, sf_dir: str) -> StreamNode:
    src = _build(_stream_subs(expr)[0], sf_dir)
    keys = [c.strip() for c in expr.named["over"].split(",")]
    metrics = _parse_metrics(expr)
    out = _combiner_aggregate(src.ds, keys, metrics)
    return StreamNode(out, [(k, True) for k in keys])


def _facet(expr: StreamExpression, sf_dir: str) -> StreamNode:
    coll = expr.positionals[0]
    search = StreamExpression("search", positionals=[coll],
                              named={k: v for k, v in expr.named.items() if k == "q"})
    keys = [c.strip() for c in expr.named["buckets"].split(",")]
    metrics = _parse_metrics(expr)
    need = sorted({c for _, c in metrics if c != "*"} | set(keys))
    search.named["fl"] = ",".join(need)
    src = _search(search, sf_dir)
    out = _combiner_aggregate(src.ds, keys, metrics)
    node = StreamNode(out, [(k, True) for k in keys])
    tbl = node.to_table()
    if "bucketSorts" in expr.named:
        spec = parse_sort_spec(expr.named["bucketSorts"])
        tbl = tbl.sort_by([(c, "ascending" if asc else "descending") for c, asc in spec])
    limit = int(expr.named.get("bucketSizeLimit", 0))
    if limit:
        tbl = tbl.slice(0, limit)
    import ray.data

    return StreamNode(ray.data.from_arrow(tbl),
                      parse_sort_spec(expr.named.get("bucketSorts", "")), ordered=True)


def _stats(expr: StreamExpression, sf_dir: str) -> StreamNode:
    coll = expr.positionals[0]
    metrics = _parse_metrics(expr)
    need = sorted({c for _, c in metrics if c != "*"})
    search = StreamExpression("search", positionals=[coll],
                              named={"fl": ",".join(need) or "*"})
    if "q" in expr.named:
        search.named["q"] = expr.named["q"]
    src = _search(search, sf_dir)
    const = "__all__"
    ds = src.ds.map_batches(
        lambda b: b.append_column(const, pa.array([0] * b.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    out = _combiner_aggregate(ds, [const], metrics)
    out = out.map_batches(lambda b: b.drop_columns([const]), batch_format="pyarrow")
    return StreamNode(out)


def _join(expr: StreamExpression, sf_dir: str, how: str) -> StreamNode:
    import ray

    left_e, right_e = _stream_subs(expr)[:2]
    left = _build(left_e, sf_dir)
    right = _build(right_e, sf_dir)
    lkeys, rkeys = [], []
    for pair in expr.named["on"].split(","):
        l, _, r = pair.partition("=")
        lkeys.append(l.strip())
        rkeys.append((r or l).strip())
    rtbl = right.to_table()
    # Tuple.merge: right wins on non-key collisions → drop them from left
    rnonkey = [c for c in rtbl.column_names if c not in rkeys]
    ref = ray.put(rtbl)

    def join_batch(batch: pa.Table, ref=ref, lkeys=lkeys, rkeys=rkeys,
                   how=how, rnonkey=rnonkey) -> pa.Table:
        rt = ray.get(ref)
        drop = [c for c in batch.column_names if c in rnonkey and c not in lkeys]
        if drop:
            batch = batch.drop_columns(drop)
        return batch.join(rt, keys=lkeys, right_keys=rkeys, join_type=how)

    out = left.ds.map_batches(join_batch, batch_format="pyarrow", batch_size=None)
    return StreamNode(out, left.sort)


def _semi(expr: StreamExpression, sf_dir: str, anti: bool) -> StreamNode:
    import ray

    left_e, right_e = _stream_subs(expr)[:2]
    left = _build(left_e, sf_dir)
    right = _build(right_e, sf_dir)
    lkeys, rkeys = [], []
    for pair in expr.named["on"].split(","):
        l, _, r = pair.partition("=")
        lkeys.append(l.strip())
        rkeys.append((r or l).strip())
    rtbl = right.to_table().select(rkeys)
    ref = ray.put(rtbl)
    how = "left anti" if anti else "left semi"

    def fn(batch: pa.Table, ref=ref, lkeys=lkeys, rkeys=rkeys, how=how) -> pa.Table:
        rt = ray.get(ref)
        return batch.join(rt, keys=lkeys, right_keys=rkeys, join_type=how)

    out = left.ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    return StreamNode(out, left.sort)


def _fetch(expr: StreamExpression, sf_dir: str) -> StreamNode:
    import ray

    coll = expr.positionals[0]
    src = _build(_stream_subs(expr)[0], sf_dir)
    l, _, r = expr.named["on"].partition("=")
    lkey, rkey = l.strip(), (r or l).strip()
    fl = [c.strip() for c in expr.named["fl"].split(",")]
    path = f"{sf_dir}/{coll}.parquet"
    cols = list(dict.fromkeys([rkey] + fl))
    rtbl = pq.read_table(path, columns=cols)
    ref = ray.put(rtbl)

    def fn(batch: pa.Table, ref=ref) -> pa.Table:
        rt = ray.get(ref)
        return batch.join(rt, keys=[lkey], right_keys=[rkey], join_type="left outer")

    out = src.ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
    return StreamNode(out, src.sort)


def group_first(batch: pa.Table, sort_cols: list[str], asc: list[bool],
                over: list[str]) -> pa.Table:
    """Sort-order-first row per `over` key group — UniqueStream's
    associative reduction kernel (stable Arrow sort + vectorized
    shift-compare; adjacent null keys are ONE group)."""
    if batch.num_rows == 0:
        return batch
    import numpy as np
    import pyarrow.compute as pc

    order = [(c, "ascending" if a else "descending")
             for c, a in zip(sort_cols, asc)]
    t = batch.sort_by(order)  # Arrow sort is stable
    # first row per key group: a row starts a group iff ANY `over`
    # column differs from the previous row (vectorized shift-compare)
    keep = np.zeros(t.num_rows, dtype=bool)
    keep[0] = True
    for c in over:
        col = t[c].combine_chunks()
        # not_equal(null, null) is null → fill FALSE (two adjacent
        # null keys are the SAME group); null-vs-value transitions are
        # caught by the is_null xor term below
        neq = pc.fill_null(
            pc.not_equal(col.slice(1), col.slice(0, len(col) - 1)), False)
        nulls_differ = pc.xor(
            pc.is_null(col.slice(1)), pc.is_null(col.slice(0, len(col) - 1)))
        keep[1:] |= np.asarray(pc.or_(neq, nulls_differ).to_numpy(
            zero_copy_only=False))
    return t.filter(pa.array(keep))


def _unique(expr: StreamExpression, sf_dir: str) -> StreamNode:
    src = _build(_stream_subs(expr)[0], sf_dir)
    over = [c.strip() for c in expr.named["over"].split(",")]
    spec = src.sort or [(c, True) for c in over]
    # UniqueStream.java:87 requires the substream sort to lead with the
    # equalitor fields; the representative is then the sort-order-first
    # tuple per key — an associative reduction (min by trailing sort key).
    sort_cols = [c for c, _ in spec]
    asc = [a for _, a in spec]
    # UniqueStream.java:64-70 REJECTS substreams whose comparator does not
    # lead with the equalitor fields (the adjacency the run-dedup kernel
    # depends on); silently emitting one row per RUN would be wrong
    if set(over) - set(sort_cols[: len(over)]):
        raise ValueError(
            f"unique(over={over}): substream sort {sort_cols} must lead "
            "with the over fields (UniqueStream comparator/equalitor check)")

    def reduce_first(batch: pa.Table) -> pa.Table:
        return group_first(batch, sort_cols, asc, over)

    partial = src.ds.map_batches(reduce_first, batch_format="pyarrow", batch_size=None)
    out = partial.repartition(1).map_batches(
        reduce_first, batch_format="pyarrow", batch_size=None
    )
    return StreamNode(out, spec)


def _top(expr: StreamExpression, sf_dir: str) -> StreamNode:
    src = _build(_stream_subs(expr)[0], sf_dir)
    n = int(expr.named["n"])
    spec = parse_sort_spec(expr.named["sort"])
    ds = src.ds.sort([c for c, _ in spec], descending=[not a for _, a in spec]).limit(n)
    return StreamNode(ds, spec, ordered=True)


def _sort(expr: StreamExpression, sf_dir: str) -> StreamNode:
    src = _build(_stream_subs(expr)[0], sf_dir)
    spec = parse_sort_spec(expr.named["by"])
    ds = src.ds.sort([c for c, _ in spec], descending=[not a for _, a in spec])
    return StreamNode(ds, spec, ordered=True)


def _select(expr: StreamExpression, sf_dir: str) -> StreamNode:
    src = _build(_stream_subs(expr)[0], sf_dir)
    fields: list[tuple[str, str]] = []
    for v in expr.values():
        for part in v.split(","):
            part = part.strip()
            if not part:
                continue
            if " as " in part:
                a, _, b = part.partition(" as ")
                fields.append((a.strip(), b.strip()))
            else:
                fields.append((part, part))

    def fn(batch: pa.Table, fields=fields) -> pa.Table:
        return pa.table({dst: batch[srcc] for srcc, dst in fields})

    out = src.ds.map_batches(fn, batch_format="pyarrow")
    ren = dict(fields)
    sort = [(ren.get(c, c), asc) for c, asc in src.sort if c in ren]
    return StreamNode(out, sort, src.ordered)


def _having(expr: StreamExpression, sf_dir: str) -> StreamNode:
    subs = _stream_subs(expr)
    src = _build(subs[0], sf_dir)
    pred = [s for s in expr.sub_expressions() if s is not subs[0]][0]

    def fn(batch: pa.Table, pred=pred) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return batch.filter(_eval_predicate(pred, batch))

    out = src.ds.map_batches(fn, batch_format="pyarrow")
    return StreamNode(out, src.sort, src.ordered)


def _merge(expr: StreamExpression, sf_dir: str) -> StreamNode:
    subs = _stream_subs(expr)
    nodes = [_build(s, sf_dir) for s in subs]
    ds = nodes[0].ds
    for n_ in nodes[1:]:
        ds = ds.union(n_.ds)
    spec = parse_sort_spec(expr.named["on"]) if "on" in expr.named else nodes[0].sort
    return StreamNode(ds, spec)


_BUILDERS = {
    "search": _search,
    "rollup": _rollup,
    "facet": _facet,
    "stats": _stats,
    "unique": _unique,
    "top": _top,
    "sort": _sort,
    "select": _select,
    "having": _having,
    "merge": _merge,
}


_STREAM_NAMES = set(_BUILDERS) | {
    "innerJoin", "hashJoin", "leftOuterJoin", "outerHashJoin",
    "intersect", "complement", "fetch",
}


def _stream_subs(expr: StreamExpression) -> list[StreamExpression]:
    """Sub-expressions that are streams (vs metrics / evaluators)."""
    return [s for s in expr.sub_expressions() if s.name in _STREAM_NAMES]


def _build(expr: StreamExpression, sf_dir: str) -> StreamNode:
    name = expr.name
    if name in ("innerJoin", "hashJoin"):
        return _join(expr, sf_dir, "inner")
    if name in ("leftOuterJoin", "outerHashJoin"):
        return _join(expr, sf_dir, "left outer")
    if name == "intersect":
        return _semi(expr, sf_dir, anti=False)
    if name == "complement":
        return _semi(expr, sf_dir, anti=True)
    if name == "fetch":
        return _fetch(expr, sf_dir)
    if name in _BUILDERS:
        return _BUILDERS[name](expr, sf_dir)
    raise ValueError(f"unknown stream function: {name}")


def build_stream(expr: StreamExpression | str, sf_dir: str) -> StreamNode:
    if isinstance(expr, str):
        expr = parse_expression(expr)
    return _build(expr, sf_dir)


def run_expression(expr: str, sf_dir: str) -> pa.Table:
    """Parse, build and materialize a streaming expression → Arrow table."""
    return build_stream(expr, sf_dir).to_table()


# ---------------------------------------------------------------------------
# timeseries / random / knn / significantTerms
# ---------------------------------------------------------------------------

_GAP_UNITS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _parse_gap(gap: str) -> int:
    """``+1DAY`` / ``+30MINUTES`` → seconds (TimeSeriesStream gap syntax)."""
    import re

    m = re.fullmatch(r"\+(\d+)(SECOND|MINUTE|HOUR|DAY)S?", gap.strip())
    if not m:
        raise ValueError(f"unsupported gap: {gap!r}")
    return int(m.group(1)) * _GAP_UNITS[m.group(2)]


def _timeseries(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """TimeSeriesStream.java: date-range buckets [start, end) at a fixed gap
    over a timestamp field, with metrics per bucket; empty buckets are
    emitted (count 0, other metrics null) like json.facet range facets."""
    import numpy as np
    import pyarrow.dataset as pads
    import ray.data

    coll = expr.positionals[0]
    path = f"{sf_dir}/{coll}.parquet"
    schema = pq.read_schema(path)
    fieldname = expr.named.get("field", "ts")
    start = datetime.fromisoformat(expr.named["start"].replace("Z", ""))
    end = datetime.fromisoformat(expr.named["end"].replace("Z", ""))
    gap_s = _parse_gap(expr.named["gap"])
    metrics = _parse_metrics(expr)
    need = sorted({c for _, c in metrics if c != "*"} | {fieldname})
    flt = (pads.field(fieldname) >= start) & (pads.field(fieldname) < end)
    qf = parse_q(expr.named.get("q"), schema)
    if qf is not None:
        flt = flt & qf
    ds = _sized_parquet(path, need, flt)
    start64 = np.datetime64(start, "us")
    gap_us = np.int64(gap_s) * 1_000_000

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = batch[fieldname].cast(pa.timestamp("us")).to_numpy()
        idx = (ts - start64).astype("timedelta64[us]").astype(np.int64) // gap_us
        bucket = start64 + (idx * gap_us).astype("timedelta64[us]")
        labels = np.char.add(np.datetime_as_string(bucket, unit="s"), "Z")
        return batch.drop_columns([fieldname]).append_column(
            fieldname, pa.array(labels, pa.string())
        )

    agg = _combiner_aggregate(ds.map_batches(bucketize, batch_format="pyarrow"),
                              [fieldname], metrics)
    batches = list(agg.iter_batches(batch_format="pyarrow"))
    if batches:
        got = pa.concat_tables(batches)
    else:  # empty window: no partials at all — synthesize the agg schema
        def mtyp(op, col):
            if op == "count":
                return pa.int64()
            if op == "avg":
                return pa.float64()
            base = schema.field(col).type
            if op == "sum":
                return pa.int64() if pa.types.is_integer(base) else pa.float64()
            return base
        got = pa.table(
            {fieldname: pa.array([], pa.string()),
             **{f"{op}({col})": pa.array([], mtyp(op, col)) for op, col in metrics}}
        )
    # reindex to the full bucket range (Solr emits empty buckets)
    n = int((np.datetime64(end, "us") - start64).astype(np.int64) // gap_us)
    if int((np.datetime64(end, "us") - start64).astype(np.int64) % gap_us):
        n += 1
    all_buckets = start64 + (np.arange(n, dtype=np.int64) * gap_us).astype("timedelta64[us]")
    full = pa.table({fieldname: pa.array(
        np.char.add(np.datetime_as_string(all_buckets, unit="s"), "Z"), pa.string()
    )})
    joined = full.join(got, keys=[fieldname], join_type="left outer")
    cols = {fieldname: joined[fieldname]}
    for op, col in metrics:
        name = f"{op}({col})"
        arr = joined[name]
        if op == "count":
            arr = pc.coalesce(arr, pa.scalar(0, pa.int64()))
        cols[name] = arr
    out = pa.table(cols).sort_by(fieldname)
    import ray.data as rd

    return StreamNode(rd.from_arrow(out), [(fieldname, True)], ordered=True)


def _random(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """RandomStream.java: pseudo-random sample of ``rows`` tuples. The
    reference sorts on a server-side ``random_<seed>`` field; here the
    deterministic analog is an md5 order key over the first fl column
    (reproducible across runs/parallelism AND expressible in SQL) — the
    sample is a distributed hash-order top-k, never a full collect."""
    import hashlib

    coll = expr.positionals[0]
    path = f"{sf_dir}/{coll}.parquet"
    schema = pq.read_schema(path)
    fl = [c.strip() for c in expr.named["fl"].split(",")]
    rows = int(expr.named.get("rows", 10))
    seed = expr.named.get("seed", "0")
    keycol = fl[0]
    ds = _sized_parquet(path, fl, parse_q(expr.named.get("q"), schema))
    hcol = "__rand__"

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch[keycol].to_pylist()
        h = [hashlib.md5(f"{seed}|{v}".encode()).hexdigest() for v in vals]
        return batch.append_column(hcol, pa.array(h, pa.string()))

    out = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .sort(hcol)
        .limit(rows)
        .map_batches(lambda b: b.drop_columns([hcol]), batch_format="pyarrow")
    )
    return StreamNode(out)


def _knn(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """KnnStream.java: MoreLikeThis neighbors of one document
    (``{!mlt qf=...}id`` under the hood — KnnStream.java:196-210). Reuses the
    engine's MLT machinery over the documents index; ranking collapses
    float-order ulps via round(score, 6) exactly like the MLT oracle."""
    import numpy as np
    import ray.data as rd

    from ..pipelines.fulltext import get_searcher
    from ..search.mlt import mlt_query

    doc = int(expr.named["id"])
    k = int(expr.named.get("k", 10))
    s = get_searcher(sf_dir)
    res = s.search({str(doc): mlt_query(s, doc)}, k=k + 10, use_ray=True)
    ids = res["doc_id"].to_numpy()
    scores = np.round(res["score"].to_numpy().astype(np.float64), 6)
    keep = ids != doc
    ids, scores = ids[keep], scores[keep]
    order = np.lexsort((ids, -scores))[:k]
    tbl = pa.table({
        "query_id": pa.array([str(doc)] * len(order), pa.string()),
        "rank": pa.array(np.arange(len(order)), pa.int64()),
        "doc_id": pa.array(ids[order], pa.int64()),
    })
    return StreamNode(rd.from_arrow(tbl), [("rank", True)], ordered=True)


def _significant(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """SignificantTermsStream.java → the sigterms scan over the documents
    index (see ``search/significant.py``); q goes through the classic query
    parser."""
    import ray.data as rd

    from ..pipelines.fulltext import get_searcher
    from ..search.query import parse_query
    from ..search.significant import significant_terms

    s = get_searcher(sf_dir)
    tbl = significant_terms(
        s,
        parse_query(expr.named["q"]),
        limit=int(expr.named.get("limit", 20)),
        min_doc_freq=float(expr.named.get("minDocFreq", 5)),
        max_doc_freq=float(expr.named.get("maxDocFreq", 0.3)),
        min_term_length=int(expr.named.get("minTermLength", 4)),
    )
    return StreamNode(rd.from_arrow(tbl), [("rank", True)], ordered=True)


_BUILDERS.update({
    "timeseries": _timeseries,
    "random": _random,
    "knn": _knn,
    "significantTerms": _significant,
})
_STREAM_NAMES.update({"timeseries", "random", "knn", "significantTerms"})


# ---------------------------------------------------------------------------
# update / parallel / cartesianProduct
# ---------------------------------------------------------------------------

def _update(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """UpdateStream + CommitStream (``UpdateStream.java`` — sends each batch
    to a destination collection): the Ray-native sink is partitioned parquet
    under the destination path (resumable output: one file per block). Emits
    the per-batch ack tuples (``batchIndexed`` counts) like the reference."""
    import ray.data as rd

    dest = expr.positionals[0]
    if not str(dest).startswith("/tmp/"):
        raise ValueError("update destination must live under /tmp")
    import shutil

    shutil.rmtree(dest, ignore_errors=True)  # idempotent re-run of the sink
    src = _build(_stream_subs(expr)[0], sf_dir)
    src.ds.write_parquet(dest)
    import pyarrow.dataset as pads

    n = pads.dataset(dest).count_rows()
    tbl = pa.table({"batchIndexed": pa.array([n], pa.int64())})
    return StreamNode(rd.from_arrow(tbl), ordered=True)


def _parallel(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """ParallelStream (``ParallelStream.java`` — ships the inner expression
    to N workers hash-partitioned on ``partitionKeys``): the Ray Data
    pipeline IS the parallel execution (blocks are the partitions), so this
    validates the partition keys exist and builds the inner stream; the
    ``workers`` parameter is advisory (block parallelism is the executor's)."""
    inner = _stream_subs(expr)[0]
    node = _build(inner, sf_dir)
    keys = [k.strip() for k in expr.named.get("partitionKeys", "").split(",") if k.strip()]
    schema = node.ds.schema()
    names = getattr(schema, "names", None) or []
    for k in keys:
        if names and k not in names:
            raise ValueError(f"partitionKeys field {k!r} not in stream schema")
    return node


def _cartesian(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """CartesianProductStream (``CartesianProductStream.java``): one output
    tuple per element of a list-valued field, the scalar fields repeated."""
    src = _build(_stream_subs(expr)[0], sf_dir)
    fieldname = expr.values()[0]

    def explode(batch: pa.Table) -> pa.Table:
        col = batch[fieldname].combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy().astype("int64")
        import numpy as np

        idx = np.repeat(np.arange(batch.num_rows), lens)
        flat = pc.list_flatten(col)
        out = batch.drop_columns([fieldname]).take(idx)
        return out.append_column(fieldname, flat)

    out = src.ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
    return StreamNode(out, src.sort)


_BUILDERS.update({
    "update": _update,
    "parallel": _parallel,
    "cartesianProduct": _cartesian,
})
_STREAM_NAMES.update({"update", "parallel", "cartesianProduct"})


# ---------------------------------------------------------------------------
# graph streams: nodes (gatherNodes) / shortestPath
# (solr/solrj/src/java/org/apache/solr/client/solrj/io/graph/)
# ---------------------------------------------------------------------------

def _nodes(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """GatherNodesStream (``io/graph/GatherNodesStream.java``): one
    breadth-first hop per call. The incoming stream's ``walk`` LHS values (or
    literal roots ``"v1,v2->field"``) form the frontier; the collection is
    scanned for rows whose ``walk`` RHS field is in the frontier, and the
    distinct values of ``gather`` become the next level's nodes, with optional
    metrics aggregated per node. Nested ``nodes()`` calls compose into a BFS.

    Ray shape: the frontier is broadcast (it is the *small* side — Solr also
    materializes the incoming stream to build it), the hop is a pruned-column
    parquet scan with an ``isin`` predicate pushed to the read (zero shuffle),
    and per-node uniqueness/metrics run the combiner pattern (per-block
    partials → one combine). Output: ``node`` (gathered value, native type),
    ``level``, plus one column per metric."""
    coll = expr.positionals[0]
    if coll not in TABLES:
        raise ValueError(f"unknown collection {coll!r}")
    path = f"{sf_dir}/{coll}.parquet"
    schema = pq.read_schema(path)
    lhs, _, to_field = expr.named["walk"].partition("->")
    lhs, to_field = lhs.strip(), to_field.strip()
    gather = expr.named["gather"].strip().strip('"')
    metrics = _parse_metrics(expr)
    if to_field not in schema.names or gather not in schema.names:
        raise ValueError(f"walk/gather field not in {coll}: {to_field!r}/{gather!r}")

    subs = _stream_subs(expr)
    if subs:
        src_tbl = _build(subs[0], sf_dir).to_table()
        if lhs not in src_tbl.column_names:
            raise ValueError(f"walk field {lhs!r} not in incoming stream")
        frontier = pc.unique(src_tbl[lhs])
        level = (
            int(src_tbl["level"][0].as_py()) + 1
            if "level" in src_tbl.column_names and len(src_tbl)
            else 1
        )
    else:  # literal roots: walk="v1,v2->field"
        typ = schema.field(to_field).type
        frontier = pa.array([_coerce(v, typ) for v in lhs.split(",")], typ)
        level = 1

    import pyarrow.dataset as pads

    need = sorted({to_field, gather} | {c for _, c in metrics if c != "*"})
    flt = pads.field(to_field).isin(frontier)
    ds = _sized_parquet(path, need, flt)
    out = _combiner_aggregate(ds, [gather], metrics)

    def finish(batch: pa.Table, gather=gather, level=level) -> pa.Table:
        b = batch.rename_columns(["node" if c == gather else c for c in batch.column_names])
        return b.append_column("level", pa.array([level] * b.num_rows, pa.int64()))

    out = out.map_batches(finish, batch_format="pyarrow", batch_size=None)
    return StreamNode(out, [("node", True)])


_BUILDERS["nodes"] = _nodes
_STREAM_NAMES.add("nodes")


def shortest_paths(edges, start, end, src_col: str = "src", dst_col: str = "dst",
                   max_depth: int = 30) -> pa.Table:
    """ShortestPathStream (``io/graph/ShortestPathStream.java``): BFS from
    ``start`` over the directed edge relation until ``end`` is reached, then
    emit EVERY shortest path (the reference collects all equal-length paths).
    → ``(path:string "a->b->c", length:int64)``; empty table when ``end`` is
    unreachable within ``max_depth`` hops.

    ``edges`` is a ``ray.data.Dataset`` (or Arrow table) with ``src_col`` /
    ``dst_col``. The dataset is materialized once (the reference's
    partitionSize-bounded edge reads analog; at 100 TB this is a one-time
    bucketed parquet write of the two pruned key columns, reused across
    queries), then each BFS round broadcasts the frontier and runs one
    vectorized ``isin`` filter per block — matched edges (frontier-incident
    only, ≪ corpus) come back to the driver, exactly the reference's
    per-level scatter/gather. Shortest paths never revisit a node, so
    per-level parent lists reconstruct all of them without cycle checks."""
    import numpy as np
    import ray
    import ray.data as rd

    def _norm(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                src_col: b[src_col].cast(pa.int64()),
                dst_col: b[dst_col].cast(pa.int64()),
            }
        )

    start, end = int(start), int(end)
    if start == end:  # the trivial depth-0 path (the oracle's seed row)
        return pa.table(
            {"path": pa.array([str(start)], pa.string()),
             "length": pa.array([0], pa.int64())}
        )

    if isinstance(edges, pa.Table):
        edges = rd.from_arrow(_norm(edges))
    else:
        edges = edges.map_batches(_norm, batch_format="pyarrow", batch_size=None)
    edges = edges.materialize()
    visited = {start}
    frontier = np.array([start], dtype=np.int64)
    parents: list[dict[int, set[int]]] = []  # per level: child -> {parents}
    found_at = None
    for _ in range(max_depth):
        fref = ray.put(pa.array(frontier, pa.int64()))

        def hop(batch: pa.Table, fref=fref) -> pa.Table:
            return batch.filter(pc.is_in(batch[src_col], value_set=ray.get(fref)))

        batches = list(
            edges.map_batches(hop, batch_format="pyarrow", batch_size=None).iter_batches(
                batch_format="pyarrow"
            )
        )
        matched = pa.concat_tables(batches) if batches else None
        if matched is None or matched.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()), "length": pa.array([], pa.int64())})
        u = matched[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = matched[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        fresh = ~np.isin(v, np.fromiter(visited, dtype=np.int64, count=len(visited)))
        level_parents: dict[int, set[int]] = {}
        for ui, vi in zip(u[fresh], v[fresh]):
            level_parents.setdefault(int(vi), set()).add(int(ui))
        if not level_parents:
            return pa.table({"path": pa.array([], pa.string()), "length": pa.array([], pa.int64())})
        parents.append(level_parents)
        visited.update(level_parents)
        if end in level_parents:
            found_at = len(parents)
            break
        frontier = np.fromiter(level_parents, dtype=np.int64, count=len(level_parents))
    if found_at is None:
        return pa.table({"path": pa.array([], pa.string()), "length": pa.array([], pa.int64())})
    paths = [[end]]
    for lev in range(found_at - 1, -1, -1):
        paths = [[p] + pp for pp in paths for p in sorted(parents[lev].get(pp[0], ()))]
    strs = sorted("->".join(str(x) for x in p) for p in paths)
    return pa.table(
        {
            "path": pa.array(strs, pa.string()),
            "length": pa.array([found_at] * len(strs), pa.int64()),
        }
    )


def _shortest_path(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """``shortestPath(collection, from=, to=, edge="srcField=dstField",
    maxDepth=)`` — the expression form over a parquet collection (the
    reference's exact parameter surface)."""
    import ray.data as rd

    coll = expr.positionals[0]
    if coll not in TABLES:
        raise ValueError(f"unknown collection {coll!r}")
    srcf, _, dstf = expr.named["edge"].partition("=")
    ds = _sized_parquet(f"{sf_dir}/{coll}.parquet", [srcf.strip(), dstf.strip()], None)
    tbl = shortest_paths(
        ds, expr.named["from"], expr.named["to"], srcf.strip(), dstf.strip(),
        int(expr.named.get("maxDepth", 30)),
    )
    return StreamNode(rd.from_arrow(tbl), [("path", True)], ordered=True)


_BUILDERS["shortestPath"] = _shortest_path
_STREAM_NAMES.add("shortestPath")


def _score_nodes(expr: StreamExpression, sf_dir: str) -> StreamNode:
    """ScoreNodesStream (``io/graph/ScoreNodesStream.java``): decorate
    gathered nodes with a tf-idf relevance — nodeScore = gathered count ×
    idf of the node value in its collection, so boilerplate hubs (high df)
    rank below selectively-shared nodes. idf uses the engine's
    ``ln((N + 1) / (df + 1))`` form; the float64 ln is computed once per
    node on both sides, so the oracle compares bit-exact.

    ``scoreNodes(<node stream>, collection=..., field=...)`` — the df pass
    is a pruned one-column scan filtered to the frontier (combiner partials),
    never a full-table aggregate."""
    import math

    import numpy as np
    import ray.data as rd

    src_tbl = _build(_stream_subs(expr)[0], sf_dir).to_table()
    coll = expr.named["collection"]
    fieldname = expr.named["field"]
    if coll not in TABLES:
        raise ValueError(f"unknown collection {coll!r}")
    path = f"{sf_dir}/{coll}.parquet"
    n_rows = pq.read_metadata(path).num_rows
    if "count(*)" not in src_tbl.column_names:
        raise ValueError("scoreNodes needs a count(*) metric on the node stream")

    import pyarrow.dataset as pads

    nodes_arr = src_tbl["node"].combine_chunks()
    ds = _sized_parquet(path, [fieldname], pads.field(fieldname).isin(nodes_arr))
    dfs = _combiner_aggregate(ds, [fieldname], [("count", "*")])
    df_tbl = pa.concat_tables(dfs.iter_batches(batch_format="pyarrow"))
    df_map = dict(
        zip(df_tbl[fieldname].to_pylist(), df_tbl["count(*)"].to_pylist())
    )
    counts = np.asarray(src_tbl["count(*)"].to_pylist(), dtype=np.float64)
    df_vals = np.asarray(
        [df_map.get(v, 0) for v in src_tbl["node"].to_pylist()], dtype=np.float64
    )
    scores = np.array(
        [c * math.log((n_rows + 1) / (d + 1)) for c, d in zip(counts, df_vals)],
        dtype=np.float64,
    )
    out = src_tbl.append_column("nodeScore", pa.array(scores, pa.float64()))
    order = pc.sort_indices(
        out, sort_keys=[("nodeScore", "descending"), ("node", "ascending")]
    )
    return StreamNode(rd.from_arrow(out.take(order)),
                      [("nodeScore", False), ("node", True)], ordered=True)


_BUILDERS["scoreNodes"] = _score_nodes
_STREAM_NAMES.add("scoreNodes")
