"""1-D point index (index/points.py — BKD analog): selective numeric range
queries must touch a small fraction of the sidecar's row groups (row-group
min/max stats = BKD node bounds), give identical results to the doc-values
scan, and fall back safely when doc-values updates override values."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index import points as pts
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import NumericRangeQuery, TermQuery, BooleanQuery


@pytest.fixture(scope="module")
def pt_index(ray_session, tmp_path_factory):
    tbl = generate_corpus(12000)
    d = str(tmp_path_factory.mktemp("ptidx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=12000)
    return d


def test_selective_range_prunes_row_groups(pt_index):
    s = Searcher(pt_index)
    seg_d = s.reader.seg_dir(s.reader.segments[0]["seg"])
    assert pts.points_available(seg_d, "field_len")
    # establish the value spread
    import pyarrow.parquet as pq

    flen = pq.read_table(f"{seg_d}/docs.parquet", columns=["field_len"])[
        "field_len"].to_numpy()
    lo = int(np.percentile(flen, 48))
    hi = int(np.percentile(flen, 52))
    pts.SCAN_STATS.update(row_groups_scanned=0, row_groups_total=0)
    ids = pts.read_points_range(seg_d, "field_len", lo, hi)
    want = np.flatnonzero((flen >= lo) & (flen <= hi))
    assert np.array_equal(ids, want)
    assert pts.SCAN_STATS["row_groups_total"] >= 10
    # a ~4%-selectivity range must scan well under half the row groups
    assert pts.SCAN_STATS["row_groups_scanned"] * 3 < pts.SCAN_STATS["row_groups_total"]


def test_range_query_results_identical_with_and_without_points(pt_index):
    s = Searcher(pt_index)
    q = BooleanQuery(must=[
        TermQuery("license"),
        NumericRangeQuery("field_len", lower=60, upper=250),
    ])
    a = s.search({"q": q}, k=50, use_ray=False).to_pandas()
    seg_d = s.reader.seg_dir(s.reader.segments[0]["seg"])
    import os
    import shutil

    # hide the sidecar → doc-values scan path
    shutil.move(f"{seg_d}/points.parquet", f"{seg_d}/points.parquet.bak")
    try:
        b = s.search({"q2": q}, k=50, use_ray=False).to_pandas()
    finally:
        shutil.move(f"{seg_d}/points.parquet.bak", f"{seg_d}/points.parquet")
    assert a.drop(columns=["query_id"]).to_string() == b.drop(columns=["query_id"]).to_string()
    assert len(a) > 0


def test_points_disabled_after_dv_update(pt_index, tmp_path_factory):
    import shutil

    from lucene_solr_ray.index.update import update_numeric_doc_values

    d2 = str(tmp_path_factory.mktemp("ptupd"))
    shutil.copytree(pt_index, d2, dirs_exist_ok=True)
    s = Searcher(d2)
    seg_d = s.reader.seg_dir(s.reader.segments[0]["seg"])
    assert pts.points_available(seg_d, "field_len")
    update_numeric_doc_values(d2, [(0, "field_len", 999_999)])
    assert not pts.points_available(seg_d, "field_len")
    s2 = Searcher(d2)
    r = s2.search(
        {"q": NumericRangeQuery("field_len", lower=999_999, upper=None)},
        k=5, use_ray=False)
    assert 0 in r["doc_id"].to_pylist()
