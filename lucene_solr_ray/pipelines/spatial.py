"""Spatial search — LatLonPoint analog over derived point columns.

Reference surface: ``lucene/core/src/java/org/apache/lucene/document/
LatLonPoint.java`` (``newBoxQuery`` / ``newDistanceQuery``), the haversine in
``lucene/core/src/java/org/apache/lucene/util/SloppyMath.java:50-80``, and
Solr's ``geodist()`` sort
(``solr/core/.../search/function/distance/GeoDistValueSourceParser.java``).

The testdata carries no geo columns, so each customer gets a DETERMINISTIC
synthetic point derived from md5 of its key — reproducible across runs and
expressible verbatim in the DuckDB oracle (the repo-wide md5 parity trick):

    lat = (md5_int60("lat|" || c_custkey) % 1_800_000) / 10_000 - 90
    lon = (md5_int60("lon|" || c_custkey) % 3_600_000) / 10_000 - 180

Ray shape: points are computed per batch inside ``map_batches`` (never
driver-side); the box query is pure comparisons at the scan; the distance
top-k computes per-batch haversine + a partial top-k, merging tiny partials.
Distance ranks are compared at round(km, 3) (metre precision) because numpy's
SIMD trig and DuckDB's libm differ in final-ulp — same collapse used for MLT
score sums. BKD pruning maps to lat/lon min/max column stats at the read at
scale (the parquet row-group analog of LatLonPoint's 2-D BKD tree).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: box query corners and distance-query origin/k
BOX = {"min_lat": -30.0, "max_lat": 30.0, "min_lon": -60.0, "max_lon": 60.0}
ORIGIN = (48.8566, 2.3522)  # Paris
GEO_K = 20
EARTH_R_KM = 6371.0088  # SloppyMath.TO_KILOMETERS mean earth radius


def _md5_int60(s: str) -> int:
    # 15 hex nibbles = 60 bits → fits BIGINT on the SQL side
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _points(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = np.array(
        [(_md5_int60(f"lat|{k}") % 1_800_000) / 10_000 - 90 for k in keys.tolist()]
    )
    lon = np.array(
        [(_md5_int60(f"lon|{k}") % 3_600_000) / 10_000 - 180 for k in keys.tolist()]
    )
    return lat, lon


def _haversine_km(lat: np.ndarray, lon: np.ndarray, olat: float, olon: float) -> np.ndarray:
    """SloppyMath.haversinKilometers' formula in float64 numpy (the reference
    uses table-quantized cos for speed; we keep the exact formula)."""
    la, lo = np.radians(lat), np.radians(lon)
    ola, olo = np.radians(olat), np.radians(olon)
    h = (np.sin((la - ola) / 2) ** 2
         + np.cos(ola) * np.cos(la) * np.sin((lo - olo) / 2) ** 2)
    return 2 * EARTH_R_KM * np.arcsin(np.sqrt(h))


def _customers(sf_dir: str):
    from .io import sized_read

    return sized_read(f"{sf_dir}/customer.parquet").select_columns(["c_custkey"])


def geo_box(sf_dir: str) -> pa.Table:
    """LatLonPoint.newBoxQuery analog: customers whose derived point lies in
    BOX (inclusive corners) → (c_custkey, lat, lon)."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()
        lat, lon = _points(keys)
        m = ((lat >= BOX["min_lat"]) & (lat <= BOX["max_lat"])
             & (lon >= BOX["min_lon"]) & (lon <= BOX["max_lon"]))
        return pa.table({
            "c_custkey": pa.array(keys[m], pa.int64()),
            "lat": pa.array(lat[m], pa.float64()),
            "lon": pa.array(lon[m], pa.float64()),
        })

    out = _customers(sf_dir).map_batches(fn, batch_format="pyarrow")
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return tbl.sort_by("c_custkey")


SQL_GEO_BOX = f"""
WITH pts AS (
  SELECT c_custkey,
         (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1800000) / 10000.0 - 90 AS lat,
         (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 3600000) / 10000.0 - 180 AS lon
  FROM customer
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, lat, lon FROM pts
WHERE lat BETWEEN {BOX["min_lat"]!r} AND {BOX["max_lat"]!r}
  AND lon BETWEEN {BOX["min_lon"]!r} AND {BOX["max_lon"]!r}
ORDER BY c_custkey
"""


def geo_distance_topk(sf_dir: str) -> pa.Table:
    """LatLonPoint.newDistanceQuery + geodist() sort: the GEO_K customers
    nearest ORIGIN → (rank, c_custkey, dist_km3). Per-batch haversine and
    partial top-k; only (key, dist) partials reach the driver merge."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()
        lat, lon = _points(keys)
        d = np.round(_haversine_km(lat, lon, *ORIGIN), 3)
        order = np.lexsort((keys, d))[:GEO_K]  # partial top-k per batch
        return pa.table({
            "c_custkey": pa.array(keys[order], pa.int64()),
            "dist_km3": pa.array(d[order], pa.float64()),
        })

    out = _customers(sf_dir).map_batches(fn, batch_format="pyarrow")
    parts = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    keys = parts["c_custkey"].to_numpy()
    d = parts["dist_km3"].to_numpy()
    order = np.lexsort((keys, d))[:GEO_K]
    return pa.table({
        "rank": pa.array(np.arange(len(order)), pa.int64()),
        "c_custkey": pa.array(keys[order], pa.int64()),
        "dist_km3": pa.array(d[order], pa.float64()),
    })


SQL_GEO_DISTANCE_TOPK = f"""
WITH pts AS (
  SELECT c_custkey,
         (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1800000) / 10000.0 - 90 AS lat,
         (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 3600000) / 10000.0 - 180 AS lon
  FROM customer
),
dist AS (
  SELECT c_custkey,
         round(2 * {EARTH_R_KM!r} * asin(sqrt(
             pow(sin((radians(lat) - radians({ORIGIN[0]!r})) / 2), 2)
             + cos(radians({ORIGIN[0]!r})) * cos(radians(lat))
               * pow(sin((radians(lon) - radians({ORIGIN[1]!r})) / 2), 2)
         )), 3) AS dist_km3
  FROM pts
)
SELECT CAST(row_number() OVER (ORDER BY dist_km3, c_custkey) - 1 AS BIGINT) AS rank,
       CAST(c_custkey AS BIGINT) AS c_custkey, dist_km3
FROM dist ORDER BY dist_km3, c_custkey LIMIT {GEO_K}
"""


#: convex CCW polygon vertices as (lon, lat) — a diamond around (0, 0)
POLYGON = ((-50.0, 0.0), (0.0, -40.0), (50.0, 0.0), (0.0, 40.0))


def geo_polygon(sf_dir: str) -> pa.Table:
    """LatLonPoint.newPolygonQuery analog for a CONVEX polygon: inside =
    every CCW edge's cross product ≥ 0 (half-plane intersection — the
    planar simplification of the reference's Polygon2D tree; exact float64
    multiply/subtract on both sides, so the oracle is bit-exact, unlike the
    trig-bearing distance query). → (c_custkey, lat, lon)."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()
        lat, lon = _points(keys)
        m = np.ones(len(keys), dtype=bool)
        for i in range(len(POLYGON)):
            x1, y1 = POLYGON[i]
            x2, y2 = POLYGON[(i + 1) % len(POLYGON)]
            m &= (x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) >= 0.0
        return pa.table({
            "c_custkey": pa.array(keys[m], pa.int64()),
            "lat": pa.array(lat[m], pa.float64()),
            "lon": pa.array(lon[m], pa.float64()),
        })

    out = _customers(sf_dir).map_batches(fn, batch_format="pyarrow")
    return pa.concat_tables(out.iter_batches(batch_format="pyarrow")).sort_by("c_custkey")


def _polygon_conds() -> str:
    conds = []
    for i in range(len(POLYGON)):
        x1, y1 = POLYGON[i]
        x2, y2 = POLYGON[(i + 1) % len(POLYGON)]
        conds.append(
            f"({x2!r} - {x1!r}) * (lat - {y1!r}) - ({y2!r} - {y1!r}) * (lon - {x1!r}) >= 0.0"
        )
    return "\n  AND ".join(conds)


SQL_GEO_POLYGON = f"""
WITH pts AS (
  SELECT c_custkey,
         (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1800000) / 10000.0 - 90 AS lat,
         (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 3600000) / 10000.0 - 180 AS lon
  FROM customer
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, lat, lon FROM pts
WHERE {_polygon_conds()}
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# heatmap facet grid (Solr SpatialHeatmapFacets)
# ---------------------------------------------------------------------------

HEAT_ROWS = 12
HEAT_COLS = 12


def geo_heatmap(sf_dir: str) -> pa.Table:
    """(grid_row, grid_col, n): 2-D grid-cell counts of the derived points
    inside BOX — Solr's heatmap faceting (``solr/core/src/java/org/apache/
    solr/handler/component/SpatialHeatmapFacets.java``; the PrefixTree grid
    becomes an arithmetic row/col bucket). Non-empty cells only (the dense
    ``counts_ints2D`` grid is this table scattered into a matrix).

    Per-batch ``bincount`` partials over cell ids → one (cell, n) groupby-sum;
    the shuffle moves ≤ ROWS×COLS rows per block, never points. The floor
    arithmetic is identical IEEE float64 on both sides, so the oracle is
    exact."""
    from ray.data.aggregate import Sum

    cell_h = (BOX["max_lat"] - BOX["min_lat"]) / HEAT_ROWS
    cell_w = (BOX["max_lon"] - BOX["min_lon"]) / HEAT_COLS

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()
        lat, lon = _points(keys)
        m = ((lat >= BOX["min_lat"]) & (lat <= BOX["max_lat"])
             & (lon >= BOX["min_lon"]) & (lon <= BOX["max_lon"]))
        r = np.minimum(
            np.floor((lat[m] - BOX["min_lat"]) / cell_h).astype(np.int64), HEAT_ROWS - 1
        )
        c = np.minimum(
            np.floor((lon[m] - BOX["min_lon"]) / cell_w).astype(np.int64), HEAT_COLS - 1
        )
        cells = np.bincount(r * HEAT_COLS + c, minlength=HEAT_ROWS * HEAT_COLS)
        hit = np.flatnonzero(cells)
        return pa.table(
            {
                "grid_row": pa.array(hit // HEAT_COLS, pa.int64()),
                "grid_col": pa.array(hit % HEAT_COLS, pa.int64()),
                "n": pa.array(cells[hit], pa.int64()),
            }
        )

    ds = _customers(sf_dir).map_batches(fn, batch_format="pyarrow")
    out = ds.groupby(["grid_row", "grid_col"]).aggregate(Sum("n", alias_name="n"))
    tbl = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    return pa.table(
        {
            "grid_row": tbl["grid_row"].cast(pa.int64()),
            "grid_col": tbl["grid_col"].cast(pa.int64()),
            "n": tbl["n"].cast(pa.int64()),
        }
    ).sort_by([("grid_row", "ascending"), ("grid_col", "ascending")])


SQL_GEO_HEATMAP = f"""
WITH pts AS (
  SELECT c_custkey,
         (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1800000) / 10000.0 - 90 AS lat,
         (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 3600000) / 10000.0 - 180 AS lon
  FROM customer
),
inbox AS (
  SELECT least(CAST(floor((lat - ({BOX["min_lat"]!r})) / {(BOX["max_lat"] - BOX["min_lat"]) / HEAT_ROWS!r}) AS BIGINT), {HEAT_ROWS - 1}) AS grid_row,
         least(CAST(floor((lon - ({BOX["min_lon"]!r})) / {(BOX["max_lon"] - BOX["min_lon"]) / HEAT_COLS!r}) AS BIGINT), {HEAT_COLS - 1}) AS grid_col
  FROM pts
  WHERE lat BETWEEN {BOX["min_lat"]!r} AND {BOX["max_lat"]!r}
    AND lon BETWEEN {BOX["min_lon"]!r} AND {BOX["max_lon"]!r}
)
SELECT grid_row, grid_col, CAST(count(*) AS BIGINT) AS n
FROM inbox GROUP BY grid_row, grid_col ORDER BY grid_row, grid_col
"""
