"""Solr JSON Facet API aggregates (SURVEY.md §2.5; ``solr/core/src/java/org/
apache/solr/search/facet/{StddevAgg,VarianceAgg,PercentileAgg,HLLAgg,
UniqueAgg}.java``) re-expressed Ray-Data-first.

Facet buckets = ``lang``; metrics over the char length of ``text``; set
cardinality over ``source``. One vectorized ``map_batches`` pass emits tiny
per-block PARTIALS in long format (stats moments, a value-count histogram,
HLL registers, distinct pairs); the driver merges partials — the combiner
pattern, nothing but (bucket, value, count) rows ever move.

Exact-parity design (every metric is derived from exact integer partials, so
the float math on both sides is the same short, deterministic op sequence):

- stddev/variance: sample variance from integer (count, sum, sumsq) —
  ``(sumsq − sum²/count)/(count−1)`` like StddevAgg's
  ``(sumSq − sum*sum/count)/(count−1)``.
- percentile: exact from the merged value histogram with DuckDB's
  ``quantile_disc`` rule ``sorted[floor(p·(n−1))]`` (Solr's PercentileAgg is
  a t-digest approximation — the exact-histogram form is the deterministic
  analog; the t-digest sketch is the unbounded-value-domain scale path).
- unique: exact distinct via merged per-block distinct pairs (UniqueAgg).
- hll: real HyperLogLog (Flajolet et al. 2007, m=64 registers) on a
  60-bit md5-derived hash — register maxima merge associatively
  (HLLAgg semantics); the estimator's harmonic sum is computed from exact
  integers (Σ 2^(Rmax−reg)) so the float result is order-free.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

HLL_M = 64  # 2^6 registers
HLL_B = 6
_HLL_ALPHA_MM = 0.709 * HLL_M * HLL_M  # alpha_64 · m²  (Flajolet Fig. 3)
PCTS = [0.5, 0.9]


def _hll_hash(values: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """→ (bucket, rho) per value: 60-bit hash from md5 hex (15 nibbles —
    fits BIGINT for the SQL twin), low HLL_B bits = bucket, remaining 54
    bits w → rho = 55 − bit_length(w) (position of the leftmost 1)."""
    h = np.array(
        [int(hashlib.md5(v.encode("utf-8")).hexdigest()[:15], 16) for v in values],
        dtype=np.int64,
    )
    bucket = h & (HLL_M - 1)
    w = h >> HLL_B
    rho = np.array([55 - int(x).bit_length() if x > 0 else 55 for x in w], dtype=np.int64)
    return bucket, rho


def hll_estimate(registers: np.ndarray) -> float:
    """HLL cardinality from HLL_M register maxima (0 = never hit).

    Harmonic mean via exact integers: Σ 2^(−reg) = Σ 2^(Rmax−reg) / 2^Rmax,
    so E = alpha·m² · 2^Rmax / Σ 2^(Rmax−reg) has one float divide. Small-
    range correction (E ≤ 2.5m, zero registers) → linear counting m·ln(m/V).
    """
    rmax = int(registers.max())
    num = int(sum(1 << (rmax - int(r)) for r in registers))  # exact python int
    e = _HLL_ALPHA_MM * float(2.0 ** rmax) / float(num)
    v = int((registers == 0).sum())
    if e <= 2.5 * HLL_M and v > 0:
        e = HLL_M * math.log(HLL_M / v)
    return e


def _quantile_disc(values: np.ndarray, counts: np.ndarray, p: float) -> int:
    """DuckDB quantile_disc over a (value → count) histogram:
    sorted[ceil(p·n) − 1] (lower nearest-rank) without expansion."""
    order = np.argsort(values)
    values, counts = values[order], counts[order]
    n = int(counts.sum())
    idx = max(0, math.ceil(p * n) - 1)
    cum = np.cumsum(counts)
    return int(values[int(np.searchsorted(cum, idx, side="right"))])


def solr_json_facets(sf_dir: str) -> pa.Table:
    """Per-lang bucket: count, sum/min/max/avg/stddev/variance of char
    length, exact p50/p90, exact distinct sources, HLL estimate."""
    from .io import sized_read

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null lang/source rows are dropped from facet groups (pandas-groupby
        # semantics), not stringified to a literal 'None' bucket
        valid = pc.and_kleene(pc.is_valid(batch["lang"]),
                              pc.is_valid(batch["source"]))
        if not pc.all(valid).as_py():
            batch = batch.filter(valid)
        langs_col = batch["lang"].to_numpy(zero_copy_only=False).astype(str)
        src_col = batch["source"].to_numpy(zero_copy_only=False).astype(str)
        n_col = pc.utf8_length(
            batch["text"].cast(pa.string())).to_numpy().astype(np.int64)
        rows_lang, rows_kind, rows_a, rows_b, rows_s = [], [], [], [], []

        def emit(lang, kind, a, b=0, s=None):
            rows_lang.append(lang)
            rows_kind.append(kind)
            rows_a.append(int(a))
            rows_b.append(int(b))
            rows_s.append(s)

        uls, codes = np.unique(langs_col, return_inverse=True)
        for li, lang in enumerate(uls):
            m = codes == li
            n = n_col[m]
            emit(lang, "cnt", len(n))
            emit(lang, "sum", n.sum())
            emit(lang, "sumsq", (n * n).sum())
            emit(lang, "min", n.min())
            emit(lang, "max", n.max())
            vals, cnts = np.unique(n, return_counts=True)
            for v, c in zip(vals, cnts):
                emit(lang, "hist", v, c)
            srcs = sorted(set(src_col[m]))
            for s_ in srcs:
                emit(lang, "src", 0, 0, s_)
            bucket, rho = _hll_hash(srcs)
            for bk in np.unique(bucket):
                emit(lang, "hll", bk, rho[bucket == bk].max())
        return pa.table(
            {
                "lang": pa.array(rows_lang, pa.string()),
                "kind": pa.array(rows_kind, pa.string()),
                "a": pa.array(rows_a, pa.int64()),
                "b": pa.array(rows_b, pa.int64()),
                "s": pa.array(rows_s, pa.string()),
            }
        )

    ds = sized_read(f"{sf_dir}/documents.parquet",
                    columns=["lang", "source", "text"]).map_batches(partials, batch_format="pyarrow")
    parts = pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).to_pandas()

    out: dict[str, list] = {k: [] for k in (
        "lang", "count", "sum_len", "min_len", "max_len", "avg_len",
        "variance_len", "stddev_len", "p50_len", "p90_len",
        "unique_sources", "hll_sources",
    )}
    for lang in sorted(parts["lang"].unique()):
        g = parts[parts["lang"] == lang]
        cnt = int(g[g.kind == "cnt"].a.sum())
        s_ = int(g[g.kind == "sum"].a.sum())
        ssq = int(g[g.kind == "sumsq"].a.sum())
        mn = int(g[g.kind == "min"].a.min())
        mx = int(g[g.kind == "max"].a.max())
        hist = g[g.kind == "hist"].groupby("a").b.sum()
        vals = hist.index.to_numpy(dtype=np.int64)
        cnts = hist.to_numpy(dtype=np.int64)
        variance = (ssq - s_ * s_ / cnt) / (cnt - 1) if cnt > 1 else 0.0
        regs = np.zeros(HLL_M, dtype=np.int64)
        hll = g[g.kind == "hll"].groupby("a").b.max()
        regs[hll.index.to_numpy(dtype=np.int64)] = hll.to_numpy(dtype=np.int64)
        out["lang"].append(lang)
        out["count"].append(cnt)
        out["sum_len"].append(s_)
        out["min_len"].append(mn)
        out["max_len"].append(mx)
        out["avg_len"].append(s_ / cnt)
        out["variance_len"].append(variance)
        out["stddev_len"].append(math.sqrt(variance))
        out["p50_len"].append(_quantile_disc(vals, cnts, 0.5))
        out["p90_len"].append(_quantile_disc(vals, cnts, 0.9))
        out["unique_sources"].append(len(set(g[g.kind == "src"].s)))
        out["hll_sources"].append(hll_estimate(regs))
    return pa.table(
        {
            "lang": pa.array(out["lang"], pa.string()),
            "count": pa.array(out["count"], pa.int64()),
            "sum_len": pa.array(out["sum_len"], pa.int64()),
            "min_len": pa.array(out["min_len"], pa.int64()),
            "max_len": pa.array(out["max_len"], pa.int64()),
            "avg_len": pa.array(out["avg_len"], pa.float64()),
            "variance_len": pa.array(out["variance_len"], pa.float64()),
            "stddev_len": pa.array(out["stddev_len"], pa.float64()),
            "p50_len": pa.array(out["p50_len"], pa.int64()),
            "p90_len": pa.array(out["p90_len"], pa.int64()),
            "unique_sources": pa.array(out["unique_sources"], pa.int64()),
            "hll_sources": pa.array(out["hll_sources"], pa.float64()),
        }
    )


# 60-bit hash from md5 hex (15 nibbles), matching _hll_hash exactly
_H60 = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(source), {i + 1}, 1)) - 1) * "
        f"{16 ** (14 - i)}"
        for i in range(15)
    )
    + ")"
)

SQL_SOLR_JSON_FACETS = f"""
WITH base AS (
  SELECT lang, source, length(text) AS n FROM documents
),
stats AS (
  SELECT lang,
         count(*) AS cnt, sum(n) AS s, sum(n*n) AS ssq,
         min(n) AS mn, max(n) AS mx,
         quantile_disc(n, 0.5) AS p50, quantile_disc(n, 0.9) AS p90,
         count(DISTINCT source) AS uniq
  FROM base GROUP BY lang
),
srcs AS (SELECT DISTINCT lang, source FROM base),
hashed AS (
  SELECT lang, {_H60} AS h FROM srcs
),
regs AS (
  SELECT lang, h % {HLL_M} AS bucket,
         max(CASE WHEN h // {HLL_M} > 0
                  THEN 55 - length(bin(h // {HLL_M}))
                  ELSE 55 END) AS rho
  FROM hashed GROUP BY lang, h % {HLL_M}
),
rmx AS (SELECT lang, max(rho) AS rmax FROM regs GROUP BY lang),
hllagg AS (
  -- zero (never-hit) registers each contribute 2^rmax to the harmonic sum
  SELECT r.lang, m.rmax,
         sum(CAST(power(2.0, m.rmax - r.rho) AS HUGEINT))
           + ({HLL_M} - count(*)) * CAST(power(2.0, m.rmax) AS HUGEINT) AS num,
         count(*) AS filled
  FROM regs r JOIN rmx m USING (lang) GROUP BY r.lang, m.rmax
)
SELECT s.lang,
       CAST(s.cnt AS BIGINT) AS count,
       CAST(s.s AS BIGINT) AS sum_len,
       CAST(s.mn AS BIGINT) AS min_len,
       CAST(s.mx AS BIGINT) AS max_len,
       CAST(s.s AS DOUBLE) / s.cnt AS avg_len,
       CASE WHEN s.cnt > 1 THEN (s.ssq - CAST(s.s AS DOUBLE) * s.s / s.cnt) / (s.cnt - 1) ELSE 0.0 END AS variance_len,
       sqrt(CASE WHEN s.cnt > 1 THEN (s.ssq - CAST(s.s AS DOUBLE) * s.s / s.cnt) / (s.cnt - 1) ELSE 0.0 END) AS stddev_len,
       CAST(s.p50 AS BIGINT) AS p50_len,
       CAST(s.p90 AS BIGINT) AS p90_len,
       CAST(s.uniq AS BIGINT) AS unique_sources,
       CASE WHEN {_HLL_ALPHA_MM!r} * power(2.0, h.rmax) / h.num <= {2.5 * HLL_M}
                 AND h.filled < {HLL_M}
            THEN {HLL_M} * ln({HLL_M} / CAST({HLL_M} - h.filled AS DOUBLE))
            ELSE {_HLL_ALPHA_MM!r} * power(2.0, h.rmax) / h.num
       END AS hll_sources
FROM stats s JOIN hllagg h USING (lang)
ORDER BY s.lang
"""


NESTED_TOP_BUCKETS = 5
NESTED_TOP_SUB = 2


def solr_json_nested(sf_dir: str) -> pa.Table:
    """Nested JSON facets (json.facet subfacets — ``FacetField`` under
    ``FacetField``, ``solr/core/.../search/facet/FacetField.java``): top
    NESTED_TOP_BUCKETS ``source`` buckets by count (tie: source asc), each
    carrying its bucket totals (lang = '__all__', sub_rank = -1) and its top
    NESTED_TOP_SUB ``lang`` subbuckets (count + sum(n_chars); tie lang asc).

    One combiner pass builds exact (source, lang, n, sum_chars) partials per
    block; only those partials move — the nesting is pure arithmetic on the
    tiny merged table."""
    import ray.data

    from .io import sized_read

    def partials(batch: pa.Table) -> pa.Table:
        return pa.TableGroupBy(
            batch.append_column("__n", pa.array([1] * batch.num_rows, pa.int64())),
            ["source", "lang"],
        ).aggregate([("__n", "sum"), ("n_chars", "sum")])

    ds = sized_read(
        f"{sf_dir}/documents.parquet", columns=["source", "lang", "n_chars"]
    ).map_batches(partials, batch_format="pyarrow", batch_size=None)
    merged = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    g = pa.TableGroupBy(merged, ["source", "lang"]).aggregate(
        [("__n_sum", "sum"), ("n_chars_sum", "sum")]
    )
    import pandas as pd

    df = g.to_pandas().rename(columns={"__n_sum_sum": "n", "n_chars_sum_sum": "sum_chars"})
    buckets = (
        df.groupby("source", as_index=False).agg(n=("n", "sum"), sum_chars=("sum_chars", "sum"))
        .sort_values(["n", "source"], ascending=[False, True])
        .head(NESTED_TOP_BUCKETS)
    )
    rows = []
    for _, b in buckets.iterrows():
        rows.append((b["source"], "__all__", -1, int(b["n"]), int(b["sum_chars"])))
        sub = (
            df[df["source"] == b["source"]]
            .sort_values(["n", "lang"], ascending=[False, True])
            .head(NESTED_TOP_SUB)
        )
        for r, (_, x) in enumerate(sub.iterrows()):
            rows.append((x["source"], x["lang"], r, int(x["n"]), int(x["sum_chars"])))
    return pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "sub_rank": pa.array([r[2] for r in rows], pa.int64()),
        "n": pa.array([r[3] for r in rows], pa.int64()),
        "sum_chars": pa.array([r[4] for r in rows], pa.int64()),
    })


SQL_SOLR_JSON_NESTED = f"""
WITH base AS (
  SELECT source, lang, count(*) AS n, sum(n_chars) AS sum_chars
  FROM documents GROUP BY source, lang
),
buckets AS (
  SELECT source, sum(n) AS n, sum(sum_chars) AS sum_chars
  FROM base GROUP BY source
  ORDER BY n DESC, source ASC LIMIT {NESTED_TOP_BUCKETS}
),
subs AS (
  SELECT b.source, b.lang, b.n, b.sum_chars,
         row_number() OVER (PARTITION BY b.source ORDER BY b.n DESC, b.lang ASC) - 1 AS r
  FROM base b JOIN buckets USING (source)
)
SELECT source, '__all__' AS lang, CAST(-1 AS BIGINT) AS sub_rank,
       CAST(n AS BIGINT) AS n, CAST(sum_chars AS BIGINT) AS sum_chars
FROM buckets
UNION ALL
SELECT source, lang, CAST(r AS BIGINT), CAST(n AS BIGINT), CAST(sum_chars AS BIGINT)
FROM subs WHERE r < {NESTED_TOP_SUB}
"""


# ---------------------------------------------------------------------------
# t-digest approximate percentiles (PercentileAgg's actual mechanism)
# ---------------------------------------------------------------------------
#
# Solr's PercentileAgg is a t-digest (Dunning & Ertl; solr/core/src/java/org/
# apache/solr/search/facet/PercentileAgg.java uses AVLTreeDigest). The exact
# histogram above assumes a small value domain; the t-digest is the
# unbounded-domain scale path: per-block values compress to ≤O(δ) centroids,
# partial centroid lists merge by concatenation, and ONE final sorted
# recompression makes the result independent of block arrival order.

TDIGEST_DELTA = 100.0
TDIGEST_QS = (0.05, 0.25, 0.5, 0.75, 0.95, 0.99)


def tdigest_compress(means: np.ndarray, weights: np.ndarray,
                     delta: float = TDIGEST_DELTA) -> tuple[np.ndarray, np.ndarray]:
    """One MergingDigest pass (Dunning & Ertl §2.2, k1 scale bound
    4·N·q(1−q)/δ) over centroids sorted by (mean, weight) → compressed
    (means, weights). The secondary weight key makes the sort canonical —
    equal-(mean, weight) centroids are interchangeable — so the result is
    independent of input (block arrival) order."""
    order = np.lexsort((weights, means))
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    for m, w in zip(means[1:].tolist(), weights[1:].tolist()):
        q = (w_before + cur_w / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= limit:
            cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def tdigest_quantile(means: np.ndarray, weights: np.ndarray, q: float,
                     vmin: float, vmax: float) -> float:
    """Standard t-digest quantile interpolation over centroid midpoints,
    clamped to the exact [min, max]."""
    total = float(weights.sum())
    target = q * total
    cum = np.cumsum(weights) - weights / 2.0  # centroid midpoints
    if target <= cum[0]:
        return float(vmin + (means[0] - vmin) * max(target, 0.0) / max(cum[0], 1e-12))
    if target >= cum[-1]:
        span = total - cum[-1]
        frac = (target - cum[-1]) / span if span > 0 else 1.0
        return float(means[-1] + (vmax - means[-1]) * min(frac, 1.0))
    i = int(np.searchsorted(cum, target) - 1)
    frac = (target - cum[i]) / (cum[i + 1] - cum[i])
    return float(means[i] + (means[i + 1] - means[i]) * frac)


def percentile_tdigest(sf_dir: str) -> pa.Table:
    """(quantile, est): t-digest percentiles of ``events.value``. Per-block
    sketches (≤O(δ) centroids each) travel as (mean, weight) partials plus
    exact min/max; the driver concatenates, sorts, and recompresses once —
    the merged digest is therefore independent of block arrival order.
    Approximate → rows-only driver check; rank accuracy vs the exact
    quantiles is pinned in pytest."""

    def sketch(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"mean": pa.array([], pa.float64()),
                             "weight": pa.array([], pa.float64()),
                             "vmin": pa.array([], pa.float64()),
                             "vmax": pa.array([], pa.float64())})
        m, w = tdigest_compress(v, np.ones(len(v)))
        return pa.table({
            "mean": pa.array(m, pa.float64()),
            "weight": pa.array(w, pa.float64()),
            "vmin": pa.array(np.full(len(m), v.min()), pa.float64()),
            "vmax": pa.array(np.full(len(m), v.max()), pa.float64()),
        })

    from .io import sized_read

    ds = sized_read(f"{sf_dir}/events.parquet", columns=["value"]).map_batches(
        sketch, batch_format="pyarrow"
    )
    parts = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    m, w = tdigest_compress(parts["mean"].to_numpy(), parts["weight"].to_numpy())
    vmin = float(pa.compute.min(parts["vmin"]).as_py())
    vmax = float(pa.compute.max(parts["vmax"]).as_py())
    ests = [tdigest_quantile(m, w, q, vmin, vmax) for q in TDIGEST_QS]
    return pa.table({
        "quantile": pa.array(TDIGEST_QS, pa.float64()),
        "est": pa.array(ests, pa.float64()),
    })
