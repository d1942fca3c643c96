"""Indexed-shapes (RecursivePrefixTreeStrategy analog) invariants."""
import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.pipelines import shapes

SF = "/root/testdata/sf0.001"


def test_decompose_world_cell_leaf():
    # a shape containing the whole world indexes exactly the 4 level-1
    # cells as terminal leaves (checkBattenberg CONTAINS branch)
    toks = shapes.decompose((-180.0, 180.0, -90.0, 90.0))
    assert sorted(toks) == ["A", "B", "C", "D"]


def test_decompose_quadrant_point_depth():
    # a tiny rect deep in one quadrant recurses to max_level and stays in
    # its quadrant prefix
    toks = shapes.decompose((10.0, 10.1, 10.0, 10.1), max_level=6)
    assert toks and all(t[0] == "B" for t in toks)
    assert all(len(t) == 6 for t in toks)  # never contained → leaf at max


def test_decompose_tokens_are_covering_and_disjoint():
    # tokens cover the rect: none is a prefix of another (leaves stop
    # descent), and their union of cells covers the shape's bbox corners
    rect = (-20.0, 33.0, -7.0, 41.0)
    toks = shapes.decompose(rect)
    for a in toks:
        for b in toks:
            if a != b:
                assert not b.startswith(a)

    def cell_of(x, y, level):
        x0, x1, y0, y1 = shapes.WORLD
        tok = ""
        for _ in range(level):
            xm, ym = (x0 + x1) / 2, (y0 + y1) / 2
            if y >= ym:
                tok += "A" if x < xm else "B"
                y0 = ym
            else:
                tok += "C" if x < xm else "D"
                y1 = ym
            if x < xm:
                x1 = xm
            else:
                x0 = xm
        return tok

    for (px, py) in [(rect[0] + 1e-6, rect[2] + 1e-6),
                     (rect[1] - 1e-6, rect[3] - 1e-6),
                     (6.5, 17.0)]:
        deep = cell_of(px, py, shapes.MAX_LEVELS)
        assert any(deep.startswith(t) for t in toks)


def test_relate_codes():
    q = (0.0, 10.0, 0.0, 10.0)
    xmin = np.array([2.0, -5.0, -1.0, 20.0, 0.0])
    xmax = np.array([8.0, 15.0, 5.0, 30.0, 10.0])
    ymin = np.array([2.0, -5.0, -1.0, 20.0, 0.0])
    ymax = np.array([8.0, 15.0, 5.0, 30.0, 10.0])
    code = shapes._relate(xmin, xmax, ymin, ymax, q)
    # inside → WITHIN(2); covers → CONTAINS(3); overlap → 1; disjoint → 0;
    # equal → CONTAINS (spatial4j precedence)
    assert code.tolist() == [2, 3, 1, 0, 3]


def test_indexed_equals_brute_and_prunes(ray_session):
    t = shapes.geo_shape(SF).to_pandas()
    b = shapes.geo_shape_brute(SF).to_pandas()
    pd.testing.assert_frame_equal(t.reset_index(drop=True),
                                  b.reset_index(drop=True))
    stats = dict(shapes.LAST_SHAPE_STATS)
    assert 0 < stats["scanned_rows"] < stats["total_rows"]


def test_contains_probe_nonempty(ray_session):
    t = shapes.geo_shape_contains(SF).to_pandas()
    assert len(t) >= 1
    assert (t["relation"] == "CONTAINS").all()
    # supplier 1 anchors the probe rect, so it must be in the result
    assert 1 in set(t["s_suppkey"])


def test_within_subset_of_intersects(ray_session):
    w = shapes.geo_shape_within(SF).to_pandas()
    i = shapes.geo_shape(SF).to_pandas()
    assert set(w["s_suppkey"]) <= set(i["s_suppkey"])
    assert (w["relation"] == "WITHIN").all()
