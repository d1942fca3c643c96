"""Stream-shaped operators over the ``events`` log table (event-time
windows; ray_guide.md "Streaming-shaped workloads").

Ray Data has no watermarks; the table is treated as a partitioned log:
partition by ``user_id``, sort by ``ts`` within the group, window with
pandas inside ``map_groups``. Ordering assumption: per-user processing is
in event-time order (enforced by the in-group sort), late data is simply
part of the batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SESSION_GAP_MIN = 30


def _events(sf_dir: str, columns: tuple[str, ...] | None = None):
    """Events read, column-pruned at the parquet layer when the caller
    declares what it needs (the ``props`` JSON column is by far the widest —
    reading it for a (user, ts) window pass is pure waste)."""
    import ray.data

    from .io import sized_read

    return sized_read(f"{sf_dir}/events.parquet",
                      columns=list(columns) if columns else None)


def events_hourly(sf_dir: str) -> pa.Table:
    """(user_id, hour, n_events, sum_value) — tumbling 1h event-time window.

    Pre-aggregated inside map_batches (one row per (user, hour) per batch)
    before the groupby — the shuffle moves partial aggregates, not events.
    """
    import ray.data
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        # zero-copy Arrow path: temporal floor + hash group_by, no pandas
        import pyarrow.compute as pc

        t = pa.table({
            "user_id": batch["user_id"],
            "hour": pc.floor_temporal(batch["ts"], unit="hour"),
            "value": batch["value"],
        })
        g = pa.TableGroupBy(t, ["user_id", "hour"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table({
            "user_id": g["user_id"],
            "hour": g["hour"],
            "n_events": g["value_count"].cast(pa.int64()),
            "sum_value": g["value_sum"],
        })

    ds = _events(sf_dir, ("user_id", "ts", "value")).map_batches(partial, batch_format="pyarrow")
    out = ds.groupby(["user_id", "hour"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    df = tbl.to_pandas()
    return pa.table(
        {
            "user_id": pa.array(df["user_id"].astype(np.int64), pa.int64()),
            "hour": pa.array(df["hour"], pa.timestamp("us")),
            "n_events": pa.array(df["n_events"].astype(np.int64), pa.int64()),
            "sum_value": pa.array(df["sum_value"].round(3), pa.float64()),
        }
    )


SQL_EVENTS_HOURLY = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       time_bucket(INTERVAL '1 hour', ts) AS hour,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 3) AS sum_value
FROM events GROUP BY user_id, time_bucket(INTERVAL '1 hour', ts)
ORDER BY user_id, hour
"""


def events_hopping(sf_dir: str) -> pa.Table:
    """(event_type, window_start, n_events, sum_value) — 1-hour windows
    hopping every 30 minutes (every event lands in two overlapping windows).

    Shape: each batch explodes events into their member windows and
    pre-aggregates; the shuffle carries (type, window) partials only.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow-native: 30-min temporal floor, shifted copy for the second
        # member window, one hash group_by — no pandas round-trip
        import pyarrow.compute as pc

        w1 = pc.floor_temporal(batch["ts"], multiple=30, unit="minute")
        half_hour = pa.scalar(30 * 60 * 1_000_000, pa.duration("us"))
        rows = pa.concat_tables([
            pa.table({"event_type": batch["event_type"], "window_start": w1,
                      "value": batch["value"]}),
            pa.table({"event_type": batch["event_type"],
                      "window_start": pc.subtract(w1, half_hour),
                      "value": batch["value"]}),
        ])
        g = pa.TableGroupBy(rows, ["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table({
            "event_type": g["event_type"],
            "window_start": g["window_start"],
            "n_events": g["value_count"].cast(pa.int64()),
            "sum_value": g["value_sum"],
        })

    ds = _events(sf_dir, ("event_type", "ts", "value")).map_batches(partial, batch_format="pyarrow")
    out = ds.groupby(["event_type", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    df = tbl.to_pandas()
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "window_start": pa.array(df["window_start"], pa.timestamp("us")),
            "n_events": pa.array(df["n_events"].astype(np.int64), pa.int64()),
            "sum_value": pa.array(df["sum_value"].round(3), pa.float64()),
        }
    )


SQL_EVENTS_HOPPING = """
WITH member AS (
  SELECT event_type, value, time_bucket(INTERVAL '30 minutes', ts) AS w FROM events
  UNION ALL
  SELECT event_type, value,
         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w FROM events
)
SELECT event_type, w AS window_start, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 3) AS sum_value
FROM member GROUP BY event_type, w ORDER BY event_type, w
"""


def events_sessionize(sf_dir: str) -> pa.Table:
    """(user_id, session_id, n_events, first_ts, last_ts) — session windows
    with a 30-minute inactivity gap, per user, in event-time order."""

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        sid = gap.cumsum().astype(np.int64)
        out = g.assign(session_id=sid).groupby("session_id", as_index=False).agg(
            n_events=("ts", "size"), first_ts=("ts", "min"), last_ts=("ts", "max")
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    ds = _events(sf_dir, ("user_id", "ts")).groupby("user_id").map_groups(sessions, batch_format="pandas")
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    df = tbl.to_pandas()
    return pa.table(
        {
            "user_id": pa.array(df["user_id"].astype(np.int64), pa.int64()),
            "session_id": pa.array(df["session_id"].astype(np.int64), pa.int64()),
            "n_events": pa.array(df["n_events"].astype(np.int64), pa.int64()),
            "first_ts": pa.array(df["first_ts"], pa.timestamp("us")),
            "last_ts": pa.array(df["last_ts"], pa.timestamp("us")),
        }
    )


SQL_EVENTS_SESSIONIZE = f"""
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '{SESSION_GAP_MIN} minutes' THEN 1 ELSE 0 END AS brk
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def events_type_stats(sf_dir: str) -> pa.Table:
    """(event_type, n, n_users, min_v_millis, max_v_millis) — global per-type
    aggregate with integer-safe value bounds (Solr stats-component analog).

    Exact distinct users = two-stage groupby: dedupe (event_type, user_id)
    pairs first (the pre-aggregated shuffle carries pairs, not events), then
    count per type.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            batch.select(["event_type", "value"]), "event_type"
        ).aggregate([("value", "count"), ("value", "min"), ("value", "max")])
        return pa.table({
            "event_type": g["event_type"],
            "n": g["value_count"].cast(pa.int64()),
            "min_v": g["value_min"],
            "max_v": g["value_max"],
        })

    ds = _events(sf_dir, ("event_type", "user_id", "value")).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby("event_type").aggregate(
        Sum("n", alias_name="n"), Min("min_v", alias_name="min_v"), Max("max_v", alias_name="max_v")
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        # per-batch (type, user) dedup via count group_by — Arrow-native
        g = pa.TableGroupBy(
            batch.select(["event_type", "user_id"]), ["event_type", "user_id"]
        ).aggregate([])
        return g

    pairs = _events(sf_dir, ("event_type", "user_id")).map_batches(pair_partial, batch_format="pyarrow")
    distinct_pairs = pairs.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="c"))
    users = distinct_pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))

    a = pa.concat_tables(agg.iter_batches(batch_format="pyarrow")).to_pandas()
    u = pa.concat_tables(users.iter_batches(batch_format="pyarrow")).to_pandas()
    df = a.merge(u, on="event_type").sort_values("event_type")
    return pa.table(
        {
            "event_type": pa.array(df["event_type"], pa.string()),
            "n": pa.array(df["n"].astype(np.int64), pa.int64()),
            "n_users": pa.array(df["n_users"].astype(np.int64), pa.int64()),
            "min_v_millis": pa.array((df["min_v"] * 1000).round().astype(np.int64), pa.int64()),
            "max_v_millis": pa.array((df["max_v"] * 1000).round().astype(np.int64), pa.int64()),
        }
    )


SQL_EVENTS_TYPE_STATS = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(round(min(value) * 1000) AS BIGINT) AS min_v_millis,
       CAST(round(max(value) * 1000) AS BIGINT) AS max_v_millis
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_cumulative(sf_dir: str) -> pa.Table:
    """(event_id, user_id, cum_count, cum_value_int) — per-user running
    totals in event-time order (streaming cumulative aggregation; the window
    function `SUM() OVER (PARTITION BY user ORDER BY ts)` shape). The value
    running sum accumulates CENTS (round(value*100)) so every partial is an
    exact integer — float cumsum order never matters.

    Partitioning: per-user groups sort by (ts, event_id) inside
    ``map_groups`` — the same per-user-log contract as sessionize."""

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"].values,
            "user_id": g["user_id"].values,
            "cum_count": np.arange(1, len(g) + 1, dtype=np.int64),
            "cum_value_int": np.cumsum(cents),
        })

    out = _events(sf_dir, ("event_id", "user_id", "ts", "value")).groupby("user_id").map_groups(cum, batch_format="pandas")
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table({
        "event_id": tbl["event_id"].cast(pa.int64()),
        "user_id": tbl["user_id"].cast(pa.int64()),
        "cum_count": tbl["cum_count"].cast(pa.int64()),
        "cum_value_int": tbl["cum_value_int"].cast(pa.int64()),
    })


SQL_EVENTS_CUMULATIVE = """
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT) AS cum_count,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cum_value_int
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


TOPU_N = 3


def events_top_users(sf_dir: str) -> pa.Table:
    """(hour, rank, user_id, n) — top-TOPU_N users by event count per
    tumbling hour (ties → user_id asc). Windowed top-k: per-batch partial
    (hour, user, n) counts → groupby sum → per-hour map_groups head —
    partials move through the shuffle, never raw events; each hour's top-k
    is a tiny independent group."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table({
            "hour": pc.floor_temporal(batch["ts"], unit="hour"),
            "user_id": batch["user_id"],
        })
        g = pa.TableGroupBy(t, ["hour", "user_id"]).aggregate([([], "count_all")])
        return pa.table({
            "hour": g["hour"],
            "user_id": g["user_id"],
            "n": g["count_all"].cast(pa.int64()),
        })

    ds = _events(sf_dir, ("user_id", "ts")).map_batches(partial, batch_format="pyarrow")
    counts = ds.groupby(["hour", "user_id"]).aggregate(Sum("n", alias_name="n"))

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "user_id"], ascending=[False, True]).head(TOPU_N)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g

    out = counts.groupby("hour").map_groups(topn, batch_format="pandas")
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    df = tbl.to_pandas().sort_values(["hour", "rank"]).reset_index(drop=True)
    return pa.table({
        "hour": pa.array(df["hour"], pa.timestamp("us")),
        "rank": pa.array(df["rank"].astype(np.int64), pa.int64()),
        "user_id": pa.array(df["user_id"].astype(np.int64), pa.int64()),
        "n": pa.array(df["n"].astype(np.int64), pa.int64()),
    })


SQL_EVENTS_TOP_USERS = f"""
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour, user_id, count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT hour, user_id, n,
         row_number() OVER (PARTITION BY hour ORDER BY n DESC, user_id ASC) - 1 AS rank
  FROM c
)
SELECT hour, CAST(rank AS BIGINT) AS rank, user_id, CAST(n AS BIGINT) AS n
FROM r WHERE rank < {TOPU_N} ORDER BY hour, rank
"""


def events_props_stats(sf_dir: str) -> pa.Table:
    """(event_type, n, k_min, k_max, k_sum) — semi-structured extraction:
    the JSON ``props`` payload's integer ``k`` is pulled with ONE vectorized
    Arrow regex per batch (no per-row json.loads), pre-aggregated per batch,
    partials merged per type. The canonical lakehouse pattern for sparse
    JSON columns: extract the needed key at the scan, never materialize
    parsed objects."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.extract_regex(
            pc.fill_null(batch["props"].combine_chunks().cast(pa.string()), ""),
            pattern=r'"k": (?P<k>[0-9]+)',
        )
        kv = pc.struct_field(k, "k").cast(pa.int64())
        # rows without an extractable k are EXCLUDED (n counts k-bearing rows
        # only) — a null would otherwise become a NaN partial that poisons
        # Min/Max through the shuffle and breaks the final int cast
        t = pa.table({"event_type": batch["event_type"], "k": kv}).filter(
            pc.is_valid(kv)
        )
        if not len(t):
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "k_min": pa.array([], pa.int64()),
                "k_max": pa.array([], pa.int64()),
                "k_sum": pa.array([], pa.int64()),
            })
        g = pa.TableGroupBy(t, "event_type").aggregate(
            [("k", "count"), ("k", "min"), ("k", "max"), ("k", "sum")]
        )
        return pa.table({
            "event_type": g["event_type"],
            "n": g["k_count"].cast(pa.int64()),
            "k_min": g["k_min"].cast(pa.int64()),
            "k_max": g["k_max"].cast(pa.int64()),
            "k_sum": g["k_sum"].cast(pa.int64()),
        })

    ds = _events(sf_dir).map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum as _S

    out = ds.groupby("event_type").aggregate(
        _S("n", alias_name="n"), Min("k_min", alias_name="k_min"),
        Max("k_max", alias_name="k_max"), _S("k_sum", alias_name="k_sum"),
    )
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    df = tbl.to_pandas().sort_values("event_type").reset_index(drop=True)
    return pa.table({
        "event_type": pa.array(df["event_type"], pa.string()),
        "n": pa.array(df["n"].astype(np.int64), pa.int64()),
        "k_min": pa.array(df["k_min"].astype(np.int64), pa.int64()),
        "k_max": pa.array(df["k_max"].astype(np.int64), pa.int64()),
        "k_sum": pa.array(df["k_sum"].astype(np.int64), pa.int64()),
    })


SQL_EVENTS_PROPS_STATS = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(k) AS BIGINT) AS k_min,
       CAST(max(k) AS BIGINT) AS k_max,
       CAST(sum(k) AS BIGINT) AS k_sum
FROM (SELECT event_type,
             CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
      FROM events
      WHERE regexp_matches(props, '"k": ([0-9]+)'))
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# funnel analysis (ordered-subsequence conversion steps)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def events_funnel(sf_dir: str) -> pa.Table:
    """(step, event_type, n_users): how many users completed the first
    ``step`` funnel stages as an ordered subsequence of their event stream
    (event-time order, (ts, event_id) tiebreak). Greedy earliest-match per
    user is exact for subsequence existence.

    Shape: one ``groupby(user_id)`` — each group sorts its own events and
    walks the funnel pointer once (O(events)); only (user_id, depth) partials
    leave the shuffle, and the final step-count fold is a driver-side
    bincount over ≤ |users| tiny rows."""
    steps = list(FUNNEL_STEPS)

    def depth(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
        )
        types = group["event_type"].take(idx).to_pylist()
        d = 0
        for t in types:
            if d < len(steps) and t == steps[d]:
                d += 1
        return pa.table(
            {
                "user_id": pa.array([group["user_id"][0].as_py()], pa.int64()),
                "depth": pa.array([d], pa.int64()),
            }
        )

    ds = _events(sf_dir, ("event_id", "user_id", "ts", "event_type")).groupby("user_id").map_groups(depth, batch_format="pyarrow")
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    depths = tbl["depth"].to_numpy()
    counts = [int((depths >= k).sum()) for k in range(1, len(steps) + 1)]
    return pa.table(
        {
            "step": pa.array(range(1, len(steps) + 1), pa.int64()),
            "event_type": pa.array(steps, pa.string()),
            "n_users": pa.array(counts, pa.int64()),
        }
    )


def _sql_funnel_step(i: int) -> str:
    """Stage CTE s{i}: earliest qualifying event strictly after stage i-1."""
    et = FUNNEL_STEPS[i - 1]
    if i == 1:
        return f"""
s1 AS (
  SELECT user_id, ts, event_id FROM (
    SELECT user_id, ts, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events WHERE event_type = '{et}') WHERE rn = 1
)"""
    p = i - 1
    return f"""
s{i} AS (
  SELECT user_id, ts, event_id FROM (
    SELECT e.user_id, e.ts, e.event_id,
           row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
    FROM events e JOIN s{p} USING (user_id)
    WHERE e.event_type = '{et}'
      AND (e.ts > s{p}.ts OR (e.ts = s{p}.ts AND e.event_id > s{p}.event_id))
  ) WHERE rn = 1
)"""


SQL_EVENTS_FUNNEL = (
    "WITH "
    + ", ".join(_sql_funnel_step(i) for i in range(1, len(FUNNEL_STEPS) + 1))
    + " "
    + " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS step, '{FUNNEL_STEPS[i-1]}' AS event_type, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM s{i}"
        for i in range(1, len(FUNNEL_STEPS) + 1)
    )
    + " ORDER BY step"
)


# ---------------------------------------------------------------------------
# date-math windows (Solr DateMathParser, solr/util/DateMathParser.java)
# ---------------------------------------------------------------------------

#: fixed NOW for determinism (the reference pins NOW per request via NOW=...)
DATEMATH_NOW = "2024-01-21T13:14:15.678"

#: (qid, lo expression, hi expression) — [lo, hi) windows
DATEMATH_SPECS = [
    ("dm_last7d", "NOW/DAY-7DAYS", "NOW/DAY"),
    ("dm_hours", "NOW/HOUR-36HOURS", "NOW/HOUR+1HOUR"),
    ("dm_month", "NOW/MONTH", "NOW/MONTH+1MONTH"),
    ("dm_clamp", "2024-01-31T10:00:00Z/DAY-21DAYS",
     "2024-01-31T10:00:00Z/DAY+1MONTH-12HOURS"),
    ("dm_minutes", "NOW/MINUTE-600MINUTES", "NOW/MINUTE"),
    ("dm_year", "NOW/YEAR", "NOW/YEAR+1YEAR"),
]


def events_date_math(sf_dir: str) -> pa.Table:
    """(query_id, event_type, n, sum_v_millis) — per-type counts and exact
    integer-milli value sums inside Solr date-math windows
    (``DateMathParser.java``: NOW anchoring, /UNIT rounding, calendar
    ``+N``/``-N`` arithmetic with month-length clamping).

    One streaming pass: each batch buckets its events into every matching
    window (windows broadcast as plain constants), partials pre-aggregated
    per (window, type) before the tiny groupby — partial rows move, never
    events."""
    from datetime import datetime

    from ray.data.aggregate import Sum

    from ..util.datemath import parse_date_math

    now = datetime.fromisoformat(DATEMATH_NOW)
    ranges = [
        (qid, parse_date_math(lo, now), parse_date_math(hi, now))
        for qid, lo, hi in DATEMATH_SPECS
    ]

    empty = pa.table({
        "query_id": pa.array([], pa.string()),
        "event_type": pa.array([], pa.string()),
        "n": pa.array([], pa.int64()),
        "sv": pa.array([], pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # pc.round defaults to half-to-even, matching the oracle's round()
        vm = pc.cast(pc.round(pc.multiply(batch["value"], 1000.0)), pa.int64())
        t = pa.table({
            "ts": batch["ts"],
            "event_type": batch["event_type"],
            "vm": vm,
        })
        outs = []
        for qid, lo, hi in ranges:
            sel = t.filter(pc.and_(pc.greater_equal(t["ts"], pa.scalar(lo)),
                                   pc.less(t["ts"], pa.scalar(hi))))
            if len(sel) == 0:
                continue
            g = pa.TableGroupBy(
                sel.select(["event_type", "vm"]), "event_type"
            ).aggregate([("vm", "count"), ("vm", "sum")])
            outs.append(pa.table({
                "query_id": pa.array([qid] * len(g), pa.string()),
                "event_type": g["event_type"],
                "n": g["vm_count"].cast(pa.int64()),
                "sv": g["vm_sum"].cast(pa.int64()),
            }))
        return pa.concat_tables(outs) if outs else empty

    ds = _events(sf_dir).map_batches(partial, batch_format="pyarrow")
    agg = ds.groupby(["query_id", "event_type"]).aggregate(
        Sum("n", alias_name="n"), Sum("sv", alias_name="sum_v_millis")
    )
    tbl = pa.concat_tables(agg.iter_batches(batch_format="pyarrow"))
    df = tbl.to_pandas().sort_values(["query_id", "event_type"]).reset_index(drop=True)
    return pa.table({
        "query_id": pa.array(df["query_id"], pa.string()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "n": pa.array(df["n"].astype(np.int64), pa.int64()),
        "sum_v_millis": pa.array(df["sum_v_millis"].astype(np.int64), pa.int64()),
    })


def _sql_dm_window(qid: str, lo: str, hi: str) -> str:
    return f"""
SELECT '{qid}' AS query_id, event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_v_millis
FROM events WHERE ts >= {lo} AND ts < {hi}
GROUP BY event_type"""


#: hand-expanded boundary twins (NON-circular: DuckDB date functions, not
#: the engine's parser; DuckDB month arithmetic clamps like Calendar.add)
_DM_NOW = f"TIMESTAMP '{DATEMATH_NOW.replace('T', ' ')}'"
_DM_J31 = "TIMESTAMP '2024-01-31 10:00:00'"
SQL_EVENTS_DATE_MATH = (
    " UNION ALL ".join(
        f"SELECT * FROM ({_sql_dm_window(qid, lo, hi)})"
        for qid, lo, hi in [
            ("dm_last7d",
             f"date_trunc('day', {_DM_NOW}) - INTERVAL 7 DAY",
             f"date_trunc('day', {_DM_NOW})"),
            ("dm_hours",
             f"date_trunc('hour', {_DM_NOW}) - INTERVAL 36 HOUR",
             f"date_trunc('hour', {_DM_NOW}) + INTERVAL 1 HOUR"),
            ("dm_month",
             f"date_trunc('month', {_DM_NOW})",
             f"date_trunc('month', {_DM_NOW}) + INTERVAL 1 MONTH"),
            ("dm_clamp",
             f"date_trunc('day', {_DM_J31}) - INTERVAL 21 DAY",
             f"date_trunc('day', {_DM_J31}) + INTERVAL 1 MONTH - INTERVAL 12 HOUR"),
            ("dm_minutes",
             f"date_trunc('minute', {_DM_NOW}) - INTERVAL 600 MINUTE",
             f"date_trunc('minute', {_DM_NOW})"),
            ("dm_year",
             f"date_trunc('year', {_DM_NOW})",
             f"date_trunc('year', {_DM_NOW}) + INTERVAL 1 YEAR"),
        ]
    )
    + " ORDER BY query_id, event_type"
)


def events_facet_range(sf_dir: str) -> pa.Table:
    """Solr date range facet (SimpleFacets.getFacetRangeCounts /
    RangeFacetProcessor): fixed buckets from ``start=NOW/DAY-7DAYS`` to
    ``end=NOW/DAY`` with DateMath ``gap=+1DAY`` (lower-inclusive,
    upper-exclusive), plus ``facet.range.other=all`` before/after overflow
    counts; empty buckets kept (mincount=0).

    Bucket edges are a handful of driver-side DateMath constants; each batch
    buckets its events with one searchsorted + bincount, so only tiny
    (bucket, n) partials reach the groupby. → (bucket, n) with 'before'
    first and 'after' last."""
    from datetime import datetime

    from ray.data.aggregate import Sum

    from ..util.datemath import parse_date_math

    now = datetime.fromisoformat(DATEMATH_NOW)
    start = parse_date_math("NOW/DAY-7DAYS", now)
    end = parse_date_math("NOW/DAY", now)
    edges = [start]
    while edges[-1] < end:
        edges.append(parse_date_math("NOW+1DAY", edges[-1]))  # gap applied to the edge
    e64 = np.array(edges, dtype="datetime64[us]")
    labels = ["before"] + [str(e) for e in edges[:-1]] + ["after"]

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].to_numpy()
        idx = np.searchsorted(e64, ts, side="right")  # 0=before, len(edges)=after
        counts = np.bincount(idx, minlength=len(edges) + 1)
        nz = np.flatnonzero(counts)
        return pa.table({
            "bucket": pa.array([labels[i] for i in nz], pa.string()),
            "n": pa.array(counts[nz], pa.int64()),
        })

    agg = (
        _events(sf_dir, ("ts",))
        .select_columns(["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )
    got = {
        b: int(c)
        for t in agg.iter_batches(batch_format="pyarrow")
        for b, c in zip(t["bucket"].to_pylist(), t["n"].to_pylist())
    }
    return pa.table({
        "bucket": pa.array(labels, pa.string()),
        "n": pa.array([got.get(b, 0) for b in labels], pa.int64()),
    })


_FR_LO = f"date_trunc('day', {_DM_NOW}) - INTERVAL 7 DAY"
SQL_EVENTS_FACET_RANGE = f"""
WITH edges AS (
  SELECT unnest(generate_series({_FR_LO},
                                date_trunc('day', {_DM_NOW}) - INTERVAL 1 DAY,
                                INTERVAL 1 DAY)) AS lo
)
SELECT 'before' AS bucket,
       CAST((SELECT count(*) FROM events WHERE ts < {_FR_LO}) AS BIGINT) AS n
UNION ALL
SELECT CAST(lo AS VARCHAR) AS bucket,
       CAST((SELECT count(*) FROM events e WHERE e.ts >= edges.lo
             AND e.ts < edges.lo + INTERVAL 1 DAY) AS BIGINT) AS n
FROM edges
UNION ALL
SELECT 'after' AS bucket,
       CAST((SELECT count(*) FROM events
             WHERE ts >= date_trunc('day', {_DM_NOW})) AS BIGINT) AS n
"""
