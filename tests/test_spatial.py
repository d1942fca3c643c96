"""Spatial analogs: derived-point determinism, box/distance semantics
(LatLonPoint.java newBoxQuery/newDistanceQuery, SloppyMath haversine)."""

import numpy as np

from lucene_solr_ray.pipelines.spatial import (
    BOX,
    GEO_K,
    ORIGIN,
    _haversine_km,
    _points,
    geo_box,
    geo_distance_topk,
)

SF = "/root/testdata/sf0.001"


def test_points_deterministic_and_in_range():
    keys = np.arange(100)
    lat1, lon1 = _points(keys)
    lat2, lon2 = _points(keys)
    assert np.array_equal(lat1, lat2) and np.array_equal(lon1, lon2)
    assert lat1.min() >= -90 and lat1.max() < 90
    assert lon1.min() >= -180 and lon1.max() < 180


def test_haversine_known_values():
    # Paris -> London ≈ 343-344 km
    d = _haversine_km(np.array([51.5074]), np.array([-0.1278]), *ORIGIN)
    assert 340 < d[0] < 348
    # zero distance at the origin
    z = _haversine_km(np.array([ORIGIN[0]]), np.array([ORIGIN[1]]), *ORIGIN)
    assert z[0] == 0.0


def test_box_and_topk(ray_session):
    box = geo_box(SF)
    lat = box["lat"].to_numpy()
    lon = box["lon"].to_numpy()
    assert ((lat >= BOX["min_lat"]) & (lat <= BOX["max_lat"])).all()
    assert ((lon >= BOX["min_lon"]) & (lon <= BOX["max_lon"])).all()
    top = geo_distance_topk(SF)
    assert top.num_rows == GEO_K
    d = top["dist_km3"].to_numpy()
    assert (np.diff(d) >= 0).all()  # ascending distance
    assert top["rank"].to_pylist() == list(range(GEO_K))


def test_geo_heatmap_grid(ray_session):
    """Heatmap facet: cell counts sum to the box-match count, indices stay in
    the grid, and the oracle agrees cell-by-cell."""
    import duckdb

    from lucene_solr_ray.pipelines import spatial

    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    t = spatial.geo_heatmap(SF).to_pandas()
    e = con.sql(spatial.SQL_GEO_HEATMAP).df()
    assert t.values.tolist() == e.values.tolist()
    box_n = spatial.geo_box(SF).num_rows
    assert t["n"].sum() == box_n
    assert t["grid_row"].between(0, spatial.HEAT_ROWS - 1).all()
    assert t["grid_col"].between(0, spatial.HEAT_COLS - 1).all()


def test_geo_tile_index_prunes(ray_session):
    """Box and nearest-k queries read only a small fraction of the 648-tile
    partition grid (the 2-D BKD pruning analog)."""
    from lucene_solr_ray.pipelines import spatial

    sf = "/root/testdata/sf0.01"
    spatial.GEO_SCAN_STATS.update(tiles_scanned=0, tiles_total=0)
    spatial.geo_box(sf)
    box_scanned = spatial.GEO_SCAN_STATS["tiles_scanned"]
    box_total = spatial.GEO_SCAN_STATS["tiles_total"]
    assert box_total > 100  # most of the 648 tiles are populated at sf0.01
    # BOX spans 60°×120° = 72 of 648 tiles → well under a quarter of them
    assert box_scanned * 4 <= box_total
    spatial.GEO_SCAN_STATS.update(tiles_scanned=0, tiles_total=0)
    spatial.geo_distance_topk(sf)
    near_scanned = spatial.GEO_SCAN_STATS["tiles_scanned"]
    near_total = spatial.GEO_SCAN_STATS["tiles_total"]
    # k=20 nearest Paris stops after a handful of rings
    assert near_scanned * 10 <= near_total
