"""Tiered merge: results must be identical across generations
(SegmentMerger/TieredMergePolicy analog; FIXTURES.md §7 spirit)."""

import glob
import os

import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.index.merge import merge_index, plan_merges
from lucene_solr_ray.search import BooleanQuery, Searcher, TermQuery, parse_query


@pytest.fixture(scope="module")
def merged_setup(ray_session, tmp_path_factory):
    tbl = generate_corpus(600)
    d = str(tmp_path_factory.mktemp("midx"))
    res = build_index(ray.data.from_arrow(tbl), d, docs_per_segment=60)
    assert len(res.segments) == 10
    s = Searcher(d)
    queries = {
        "t": parse_query("license"),
        "b": parse_query("apache AND foundation"),
        "o": parse_query("def OR return OR class"),
        "ph": parse_query('"apache software foundation"'),
    }
    before = s.search(queries, k=25, use_ray=False).to_pandas()
    info = merge_index(d, segs_per_tier=4)
    return d, queries, before, info


def test_merge_reduces_segments(merged_setup):
    d, _, _, info = merged_setup
    assert info["merges"] >= 2
    assert info["segments_after"] < info["segments_before"]
    assert info["segments_after"] <= 3


def test_merged_index_valid(merged_setup):
    d, *_ = merged_setup
    summary = check_index(d)
    assert summary["docs"] == 600


def test_results_identical_across_generations(merged_setup):
    import pandas as pd

    d, queries, before, _ = merged_setup
    s2 = Searcher(d)  # fresh reader → new manifest generation
    after = s2.search(queries, k=25, use_ray=False).to_pandas()
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
    after_ray = s2.search(queries, k=25, use_ray=True).to_pandas()
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after_ray.reset_index(drop=True)
    )


def test_old_dirs_retained_one_generation_then_reclaimed(merged_setup):
    d, *_ = merged_setup
    from lucene_solr_ray.index.reader import IndexReader

    r = IndexReader(d)
    live = {os.path.basename(r.seg_dir(s["seg"])) for s in r.segments}
    obsolete = {os.path.basename(e["dir"]) for e in r.manifest.get("obsolete", [])}
    on_disk = {os.path.basename(p) for p in glob.glob(os.path.join(d, "segments", "seg=*"))}
    # grace period: merged-away dirs survive the flip (readers holding the
    # previous manifest keep working), tracked as obsolete
    assert obsolete and on_disk == live | obsolete
    # the next merge generation reclaims them
    merge_index(d, segs_per_tier=2)
    r2 = IndexReader(d)
    live2 = {os.path.basename(r2.seg_dir(s["seg"])) for s in r2.segments}
    on_disk2 = {os.path.basename(p) for p in glob.glob(os.path.join(d, "segments", "seg=*"))}
    assert on_disk2.isdisjoint(obsolete)
    obsolete2 = {os.path.basename(e["dir"]) for e in r2.manifest.get("obsolete", [])}
    assert on_disk2 == live2 | obsolete2


def test_plan_merges_grouping():
    segs = [
        {"seg": i, "doc_base": i * 100, "doc_count": 100} for i in range(7)
    ]
    groups = plan_merges(segs, segs_per_tier=3)
    assert [len(g) for g in groups] == [3, 3]  # trailing singleton not merged
    assert groups[0][0]["seg"] == 0 and groups[1][0]["seg"] == 3
    capped = plan_merges(segs, segs_per_tier=5, max_docs_per_segment=250)
    assert all(sum(m["doc_count"] for m in g) <= 250 for g in capped)


def test_plan_merges_tiered_budget_and_skew():
    """TieredMergePolicy.findMerges semantics: no merge within the tier
    budget; above it, the lowest-skew (most balanced) adjacent window wins."""
    from lucene_solr_ray.index.merge import plan_merges_tiered

    # 8 equal segments, segs_per_tier=10 → within budget → no merges
    segs = [{"seg": i, "doc_base": i * 100, "doc_count": 100, "sum_len": 5000}
            for i in range(8)]
    assert plan_merges_tiered(segs, segs_per_tier=10) == []

    # 25 equal segments, tier 10 → above budget → balanced 10-windows chosen
    segs = [{"seg": i, "doc_base": i * 100, "doc_count": 100, "sum_len": 5000}
            for i in range(25)]
    groups = plan_merges_tiered(segs, segs_per_tier=10)
    assert groups and all(2 <= len(g) <= 10 for g in groups)
    after = 25 - sum(len(g) - 1 for g in groups)
    assert after <= 19  # the budget for this layout (10 + ceil(9))

    # skew steering: one giant segment among small ones — the giant must not
    # be swallowed into a small-segment window (skew would explode)
    segs = [{"seg": i, "doc_base": i * 100, "doc_count": 100,
             "sum_len": 1_000_000 if i == 0 else 1000} for i in range(30)]
    groups = plan_merges_tiered(segs, segs_per_tier=4)
    for g in groups:
        assert all(m["seg"] != 0 for m in g) or len(g) == 1


def test_merge_index_tiered_policy(ray_session, tmp_path):
    import ray.data

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index

    d = str(tmp_path / "tidx")
    build_index(ray.data.from_arrow(generate_corpus(600)), d, docs_per_segment=25)
    from lucene_solr_ray.index.reader import IndexReader
    from lucene_solr_ray.search import Searcher, TermQuery

    before = Searcher(d).search({"q": TermQuery("license")}, k=20,
                                use_ray=False).to_pandas()
    info = merge_index(d, segs_per_tier=5, policy="tiered")
    assert info["segments_after"] < info["segments_before"]
    after = Searcher(d).search({"q": TermQuery("license")}, k=20,
                               use_ray=False).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(before, after)
    # a second tiered round over the now-budgeted index is a no-op or small
    info2 = merge_index(d, segs_per_tier=5, policy="tiered")
    assert info2["segments_after"] <= info["segments_after"]
