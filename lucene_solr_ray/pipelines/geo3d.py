"""Geo3D — spatial3d analog: arc distances and path (buffered polyline)
queries via spherical vector math.

Reference surface: ``lucene/spatial3d/src/java/org/apache/lucene/spatial3d/
Geo3DPoint.java`` (``newDistanceQuery`` / ``newPathQuery``),
``lucene/spatial3d/src/java/org/apache/lucene/spatial3d/geom/GeoPathFactory.java``
and ``GeoStandardPath.java`` (path = sequence of great-circle segments with a
cutoff buffer; membership = within buffer of any segment or endpoint), and
``GeoStandardCircle.java`` (exact arc distance, not the haversine
approximation LatLonPoint uses).

Same derived-point scheme as ``spatial.py`` (deterministic md5 points per
customer, replayable verbatim in the DuckDB oracle). Geo3D's distinguishing
semantics vs LatLonPoint:

- distance is the EXACT great-circle arc ``R * acos(dot(p, o))`` of the 3-D
  unit vectors (``GeoStandardCircle``), not haversine;
- the path query measures cross-track distance to each great-circle segment
  (``GeoStandardPath.PathSegment.pathDistance``) with along-track bounds,
  falling back to endpoint distance beyond the segment.

Ray shape: pure vectorized numpy per ``map_batches`` batch; the distance
query visits the one-time geo tile artifact in min-possible-distance order
and skips every tile whose lower bound exceeds the radius (the XYZSolid
bounding-box pruning of Geo3D's BKD traversal → parquet tile partitions);
the path query is a streaming full-scan filter (at scale: prune with
per-segment bounding boxes inflated by the buffer angle → tile sets, the
``GeoPath.getBounds`` analog — not implemented here, documented assumption).

Float parity: both sides compute the identical acos/atan2 formula in float64
and compare at round(km, 3) (metre precision) — the same final-ulp collapse
``spatial.py`` uses for haversine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .spatial import (
    EARTH_R_KM,
    GEO_SCAN_STATS,
    _customers,
    _ensure_geo_tiles,
    _points,
    _tile_dirs,
    _tile_min_dist_km,
)

#: GeoStandardCircle query: center + arc radius (km)
CIRCLE = {"lat": 1.3521, "lon": 103.8198, "radius_km": 3000.0}  # Singapore

#: GeoStandardPath query: waypoints (lat, lon) + cutoff buffer (km)
PATH = ((40.7128, -74.0060), (51.5074, -0.1278), (55.7558, 37.6173))  # NYC-LON-MOW
PATH_BUFFER_KM = 2000.0


def _arc_km(lat: np.ndarray, lon: np.ndarray, olat: float, olon: float) -> np.ndarray:
    """R * acos(dot(p, o)) — GeoStandardCircle's exact arc distance."""
    la, lo = np.radians(lat), np.radians(lon)
    ola, olo = np.radians(olat), np.radians(olon)
    dot = np.sin(la) * np.sin(ola) + np.cos(la) * np.cos(ola) * np.cos(lo - olo)
    return EARTH_R_KM * np.arccos(np.clip(dot, -1.0, 1.0))


def _arc_rad(la, lo, ola, olo):
    dot = np.sin(la) * np.sin(ola) + np.cos(la) * np.cos(ola) * np.cos(lo - olo)
    return np.arccos(np.clip(dot, -1.0, 1.0))


def _bearing(la1, lo1, la2, lo2):
    """Initial great-circle bearing from (la1,lo1) to (la2,lo2), radians."""
    dlon = lo2 - lo1
    return np.arctan2(
        np.sin(dlon) * np.cos(la2),
        np.cos(la1) * np.sin(la2) - np.sin(la1) * np.cos(la2) * np.cos(dlon),
    )


def _segment_dist_rad(
    plat: np.ndarray, plon: np.ndarray, a: tuple[float, float], b: tuple[float, float]
) -> np.ndarray:
    """Angular distance from points P to great-circle segment A→B
    (GeoStandardPath.PathSegment.pathDistance): |cross-track| when the
    along-track projection falls inside the segment, else nearer-endpoint
    arc distance."""
    pla, plo = np.radians(plat), np.radians(plon)
    ala, alo = np.radians(a[0]), np.radians(a[1])
    bla, blo = np.radians(b[0]), np.radians(b[1])
    d_ap = _arc_rad(pla, plo, ala, alo)
    d_bp = _arc_rad(pla, plo, bla, blo)
    d_ab = float(_arc_rad(np.array([ala]), np.array([alo]), bla, blo)[0])
    brg_ap = _bearing(ala, alo, pla, plo)
    brg_ab = _bearing(
        np.full_like(pla, ala), np.full_like(plo, alo), np.full_like(pla, bla),
        np.full_like(plo, blo),
    )
    rel = brg_ap - brg_ab
    xtk = np.arcsin(np.clip(np.sin(d_ap) * np.sin(rel), -1.0, 1.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        atk = np.arccos(np.clip(np.cos(d_ap) / np.cos(xtk), -1.0, 1.0))
    behind_a = np.cos(rel) < 0
    past_b = atk > d_ab
    out = np.abs(xtk)
    out = np.where(past_b, d_bp, out)
    out = np.where(behind_a, d_ap, out)
    return out


def _path_km(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    best = np.full(lat.shape, np.inf)
    for a, b in zip(PATH, PATH[1:]):
        best = np.minimum(best, _segment_dist_rad(lat, lon, a, b))
    return EARTH_R_KM * best


def geo3d_distance(sf_dir: str) -> pa.Table:
    """Geo3DPoint.newDistanceQuery analog: every customer within
    CIRCLE.radius_km EXACT arc distance of the center →
    (c_custkey, arc_km3) ordered nearest-first.

    Index-accelerated: visits the geo tile artifact in min-possible-distance
    order and stops at the first tile whose lower bound exceeds the radius
    (tile lower bounds are haversine, which equals arc distance on the
    sphere — same formula family, monotonically interchangeable)."""
    import pyarrow.dataset as pads

    d = _ensure_geo_tiles(sf_dir)
    tiles = _tile_dirs(d)
    olat, olon = CIRCLE["lat"], CIRCLE["lon"]
    order = sorted(tiles, key=lambda t: _tile_min_dist_km(t, olat, olon))
    keys: list[np.ndarray] = []
    dist: list[np.ndarray] = []
    scanned = 0
    for t in order:
        # admit at radius + half the round(,3) grid: a point at true distance
        # radius+0.0004 rounds INTO the oracle's result set, so the prune
        # bound must not cut its tile
        if _tile_min_dist_km(t, olat, olon) > CIRCLE["radius_km"] + 0.0005:
            break
        scanned += 1
        tbl = pads.dataset(tiles[t]).to_table(columns=["c_custkey", "lat", "lon"])
        km3 = np.round(_arc_km(tbl["lat"].to_numpy(), tbl["lon"].to_numpy(), olat, olon), 3)
        m = km3 <= CIRCLE["radius_km"]
        keys.append(tbl["c_custkey"].to_numpy()[m])
        dist.append(km3[m])
    GEO_SCAN_STATS["tiles_scanned"] += scanned
    GEO_SCAN_STATS["tiles_total"] += len(tiles)
    k = np.concatenate(keys) if keys else np.array([], dtype=np.int64)
    v = np.concatenate(dist) if dist else np.array([], dtype=np.float64)
    sel = np.lexsort((k, v))
    return pa.table({
        "c_custkey": pa.array(k[sel].astype(np.int64), pa.int64()),
        "arc_km3": pa.array(v[sel], pa.float64()),
    })


def geo3d_path(sf_dir: str) -> pa.Table:
    """Geo3DPoint.newPathQuery analog: every customer within PATH_BUFFER_KM
    of the NYC→London→Moscow polyline → (c_custkey, path_km3) ordered
    nearest-first. Streaming full-scan filter (vectorized per batch)."""

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()
        lat, lon = _points(keys)
        km3 = np.round(_path_km(lat, lon), 3)
        m = km3 <= PATH_BUFFER_KM
        return pa.table({
            "c_custkey": pa.array(keys[m].astype(np.int64), pa.int64()),
            "path_km3": pa.array(km3[m], pa.float64()),
        })

    ds = _customers(sf_dir).map_batches(fn, batch_format="pyarrow")
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return tbl.sort_by([("path_km3", "ascending"), ("c_custkey", "ascending")])


_SQL_PTS = """
  SELECT c_custkey,
         radians((CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1800000) / 10000.0 - 90) AS la,
         radians((CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 3600000) / 10000.0 - 180) AS lo
  FROM customer
"""


def _sql_arc(la1: str, lo1: str, la2: str, lo2: str) -> str:
    return (
        f"acos(least(1.0, greatest(-1.0, sin({la1})*sin({la2})"
        f" + cos({la1})*cos({la2})*cos({lo1} - {lo2}))))"
    )


def _sql_bearing(la1: str, lo1: str, la2: str, lo2: str) -> str:
    return (
        f"atan2(sin({lo2} - {lo1})*cos({la2}),"
        f" cos({la1})*sin({la2}) - sin({la1})*cos({la2})*cos({lo2} - {lo1}))"
    )


def _sql_segment(a: tuple[float, float], b: tuple[float, float]) -> str:
    """One segment's angular distance as a SQL expression over (la, lo) —
    the exact CASE mirror of _segment_dist_rad."""
    ala, alo = f"radians({a[0]!r})", f"radians({a[1]!r})"
    bla, blo = f"radians({b[0]!r})", f"radians({b[1]!r})"
    d_ap = _sql_arc("la", "lo", ala, alo)
    d_bp = _sql_arc("la", "lo", bla, blo)
    d_ab = _sql_arc(ala, alo, bla, blo)
    rel = f"({_sql_bearing(ala, alo, 'la', 'lo')} - {_sql_bearing(ala, alo, bla, blo)})"
    xtk = f"asin(least(1.0, greatest(-1.0, sin({d_ap})*sin({rel}))))"
    atk = f"acos(least(1.0, greatest(-1.0, cos({d_ap})/cos({xtk}))))"
    return (
        f"CASE WHEN cos({rel}) < 0 THEN {d_ap}"
        f" WHEN {atk} > {d_ab} THEN {d_bp}"
        f" ELSE abs({xtk}) END"
    )


SQL_GEO3D_DISTANCE = f"""
WITH pts AS ({_SQL_PTS}),
dist AS (
  SELECT c_custkey,
         round({EARTH_R_KM!r} * {_sql_arc('la', 'lo', f"radians({CIRCLE['lat']!r})", f"radians({CIRCLE['lon']!r})")}, 3) AS arc_km3
  FROM pts
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, arc_km3
FROM dist WHERE arc_km3 <= {CIRCLE['radius_km']!r}
ORDER BY arc_km3, c_custkey
"""

SQL_GEO3D_PATH = f"""
WITH pts AS ({_SQL_PTS}),
dist AS (
  SELECT c_custkey,
         round({EARTH_R_KM!r} * least(
           {', '.join(_sql_segment(a, b) for a, b in zip(PATH, PATH[1:]))}
         ), 3) AS path_km3
  FROM pts
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, path_km3
FROM dist WHERE path_km3 <= {PATH_BUFFER_KM!r}
ORDER BY path_km3, c_custkey
"""


#: convex spherical polygon CROSSING THE DATELINE — (lat, lon) CCW (viewed
#: from outside the sphere); a band around ±180 that no planar lat/lon
#: polygon test can express without splitting
POLYGON3D = ((12.0, 165.0), (-12.0, 165.0), (-12.0, -165.0), (12.0, -165.0))


def _xyz(lat, lon):
    la, lo = np.radians(lat), np.radians(lon)
    return np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo), np.sin(la)


def _edge_normals(poly) -> list[tuple[float, float, float]]:
    """Per-edge great-circle normals A×B; inside (for a CCW convex spherical
    polygon) = dot(n, P) >= 0 for every edge — GeoConvexPolygon's
    edge-plane sidedness test (`spatial3d/geom/GeoConvexPolygon.java`),
    pure algebra (no trig on the hot path), dateline- and pole-safe."""
    ns = []
    for (lat1, lon1), (lat2, lon2) in zip(poly, poly[1:] + poly[:1]):
        ax, ay, az = _xyz(np.array(lat1), np.array(lon1))
        bx, by, bz = _xyz(np.array(lat2), np.array(lon2))
        ns.append((float(ay * bz - az * by),
                   float(az * bx - ax * bz),
                   float(ax * by - ay * bx)))
    return ns


def geo3d_polygon(sf_dir: str) -> pa.Table:
    """Geo3DPoint.newPolygonQuery analog over a DATELINE-CROSSING convex
    spherical polygon: (c_custkey, lat, lon) for every customer inside.
    Streaming full-scan filter, one fused vectorized map; the edge normals
    are Python-computed constants (broadcast by value — 3 floats/edge)."""
    normals = _edge_normals(list(POLYGON3D))

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()
        lat, lon = _points(keys)
        px, py, pz = _xyz(lat, lon)
        m = np.ones(len(keys), dtype=bool)
        for nx, ny, nz in normals:
            m &= nx * px + ny * py + nz * pz >= 0.0
        return pa.table({
            "c_custkey": pa.array(keys[m].astype(np.int64), pa.int64()),
            "lat": pa.array(lat[m], pa.float64()),
            "lon": pa.array(lon[m], pa.float64()),
        })

    ds = _customers(sf_dir).map_batches(fn, batch_format="pyarrow")
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return tbl.sort_by([("c_custkey", "ascending")])


def _sql_polygon3d_conds() -> str:
    conds = []
    for nx, ny, nz in _edge_normals(list(POLYGON3D)):
        conds.append(
            f"({nx!r}) * cos(la)*cos(lo) + ({ny!r}) * cos(la)*sin(lo)"
            f" + ({nz!r}) * sin(la) >= 0.0"
        )
    return " AND ".join(conds)


SQL_GEO3D_POLYGON = f"""
WITH ptsd AS (
  SELECT c_custkey,
         (CAST(('0x' || substr(md5('lat|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1800000) / 10000.0 - 90 AS lat,
         (CAST(('0x' || substr(md5('lon|' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
            % 3600000) / 10000.0 - 180 AS lon
  FROM customer
),
pts AS (
  SELECT c_custkey, lat, lon, radians(lat) AS la, radians(lon) AS lo FROM ptsd
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, lat, lon
FROM pts WHERE {_sql_polygon3d_conds()}
ORDER BY c_custkey
"""
