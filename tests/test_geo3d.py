"""Geo3D analogs: exact arc distance (GeoStandardCircle), path cross-track
distance (GeoStandardPath.PathSegment.pathDistance), tile pruning."""

import numpy as np

from lucene_solr_ray.pipelines.geo3d import (
    CIRCLE,
    PATH,
    PATH_BUFFER_KM,
    _arc_km,
    _path_km,
    _segment_dist_rad,
    geo3d_distance,
    geo3d_path,
)
from lucene_solr_ray.pipelines.spatial import EARTH_R_KM, GEO_SCAN_STATS, _points

SF = "/root/testdata/sf0.001"


def test_arc_matches_haversine():
    """acos(dot) and haversine are the same sphere distance — they must agree
    to well under rounding precision away from the antipode."""
    from lucene_solr_ray.pipelines.spatial import _haversine_km

    rng = np.random.default_rng(7)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-180, 180, 500)
    a = _arc_km(lat, lon, CIRCLE["lat"], CIRCLE["lon"])
    h = _haversine_km(lat, lon, CIRCLE["lat"], CIRCLE["lon"])
    assert np.max(np.abs(a - h)) < 1e-6


def test_segment_distance_geometry():
    # a point due south of the equatorial segment (0,0)->(0,10) at lat -5:
    # cross-track distance is exactly 5 degrees of arc
    d = _segment_dist_rad(np.array([-5.0]), np.array([5.0]), (0.0, 0.0), (0.0, 10.0))
    assert abs(np.degrees(d[0]) - 5.0) < 1e-9
    # a point beyond B falls back to the B endpoint distance
    d = _segment_dist_rad(np.array([0.0]), np.array([15.0]), (0.0, 0.0), (0.0, 10.0))
    assert abs(np.degrees(d[0]) - 5.0) < 1e-9
    # a point behind A falls back to the A endpoint distance
    d = _segment_dist_rad(np.array([0.0]), np.array([-3.0]), (0.0, 0.0), (0.0, 10.0))
    assert abs(np.degrees(d[0]) - 3.0) < 1e-9
    # a waypoint itself is at distance 0
    d = _path_km(np.array([PATH[1][0]]), np.array([PATH[1][1]]))
    assert d[0] < 1e-6


def test_distance_query_matches_brute_force(ray_session):
    import pyarrow.dataset as pads

    keys = pads.dataset(f"{SF}/customer.parquet").to_table(
        columns=["c_custkey"])["c_custkey"].to_numpy()
    lat, lon = _points(keys)
    km3 = np.round(_arc_km(lat, lon, CIRCLE["lat"], CIRCLE["lon"]), 3)
    m = km3 <= CIRCLE["radius_km"]
    want = sorted(zip(km3[m].tolist(), keys[m].tolist()))

    before = GEO_SCAN_STATS["tiles_scanned"]
    got = geo3d_distance(SF)
    assert list(zip(got["arc_km3"].to_pylist(), got["c_custkey"].to_pylist())) == want
    # pruned traversal: only tiles inside the radius are visited
    scanned = GEO_SCAN_STATS["tiles_scanned"] - before
    assert 0 < scanned < GEO_SCAN_STATS["tiles_total"]


def test_path_query_matches_brute_force(ray_session):
    import pyarrow.dataset as pads

    keys = pads.dataset(f"{SF}/customer.parquet").to_table(
        columns=["c_custkey"])["c_custkey"].to_numpy()
    lat, lon = _points(keys)
    km3 = np.round(_path_km(lat, lon), 3)
    m = km3 <= PATH_BUFFER_KM
    want = sorted(zip(km3[m].tolist(), keys[m].tolist()))

    got = geo3d_path(SF)
    assert list(zip(got["path_km3"].to_pylist(), got["c_custkey"].to_pylist())) == want
    assert got.num_rows > 0
    # every match is genuinely within the buffer of SOME segment
    assert (np.asarray(got["path_km3"].to_pylist()) <= PATH_BUFFER_KM).all()


def test_polygon_dateline_crossing(ray_session):
    """The spherical-polygon band straddles ±180: matches exist on BOTH
    sides of the dateline and every match is inside the lat band — the case
    a planar lat/lon polygon test cannot express unsplit."""
    from lucene_solr_ray.pipelines.geo3d import POLYGON3D, geo3d_polygon

    t = geo3d_polygon("/root/testdata/sf0.01")
    lat = np.asarray(t["lat"].to_pylist())
    lon = np.asarray(t["lon"].to_pylist())
    assert t.num_rows > 0
    assert (np.abs(lat) <= max(abs(v[0]) for v in POLYGON3D) + 1e-9).all()
    # only points near the dateline qualify — and from both sides
    assert (np.abs(lon) >= 165.0 - 1e-9).all()
    assert (lon > 0).any() and (lon < 0).any()
