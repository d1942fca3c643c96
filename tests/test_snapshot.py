"""Snapshot/restore (ReplicationHandler backup/restore analog) + manifest
lineage/metrics fields."""

import json
import os
import tempfile

import pytest

from lucene_solr_ray.corpus import write_corpus
from lucene_solr_ray.index import build_index
from lucene_solr_ray.index.snapshot import create_snapshot, restore_snapshot
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import TermQuery


@pytest.fixture(scope="module")
def built(ray_session):
    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 600)
    idir = tempfile.mkdtemp()
    res = build_index(cdir, idir, docs_per_segment=200)
    return idir, res


def test_manifest_lineage_and_metrics(built):
    idir, res = built
    m = json.load(open(os.path.join(idir, "manifest.json")))
    assert "metrics" in m and m["metrics"]["build_wall_sec"] > 0
    assert m["metrics"]["segments_built"] == len(m["segments"])
    for i, s in enumerate(m["segments"]):
        lin = s["lineage"]
        assert lin["planned_rows"] == s["doc_count"]
        if i == 0:
            assert lin["key_lo"] is None
        else:
            assert lin["key_lo"] is not None
        if i == len(m["segments"]) - 1:
            assert lin["key_hi"] is None


def test_snapshot_restore_roundtrip(built):
    idir, _res = built
    base = Searcher(idir).search({"q": TermQuery("license")}, k=10, use_ray=False)

    snap = tempfile.mkdtemp()
    meta = create_snapshot(idir, snap)
    assert meta["doc_count"] == 600
    assert len(meta["segments"]) == 3

    # mutate the live index (delete docs) — snapshot must be unaffected
    from lucene_solr_ray.index.update import delete_by_query

    delete_by_query(idir, TermQuery("license"))
    mutated = Searcher(idir).search({"q": TermQuery("license")}, k=10, use_ray=False)
    assert mutated.num_rows == 0

    rdir = tempfile.mkdtemp()
    restore_snapshot(snap, rdir)
    restored = Searcher(rdir).search({"q": TermQuery("license")}, k=10, use_ray=False)
    assert restored.equals(base)


def test_replicate_incremental_follower_sync(ray_session):
    """IndexFetcher analog: full first pull, incremental delta pull (only
    the new tombstone/commit files move), obsolete-dir cleanup after a
    leader merge, and an up-to-date no-op."""
    import tempfile

    from lucene_solr_ray.index.snapshot import replicate
    from lucene_solr_ray.index.update import delete_by_query

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 400)
    leader = tempfile.mkdtemp()
    build_index(cdir, leader, docs_per_segment=100)
    follower = tempfile.mkdtemp()

    r1 = replicate(leader, follower)
    assert not r1["up_to_date"] and r1["copied_files"] > 0
    base = Searcher(leader).search({"q": TermQuery("license")}, k=5, use_ray=False)
    got = Searcher(follower).search({"q": TermQuery("license")}, k=5, use_ray=False)
    assert got.equals(base)

    # leader mutates (tombstones land as NEW files in existing dirs)
    delete_by_query(leader, TermQuery("static"))
    r2 = replicate(leader, follower)
    assert not r2["up_to_date"]
    assert 0 < r2["copied_files"] < r1["copied_files"]  # delta, not full copy
    l2 = Searcher(leader).search({"q": TermQuery("static")}, k=5, use_ray=False)
    f2 = Searcher(follower).search({"q": TermQuery("static")}, k=5, use_ray=False)
    assert l2.num_rows == 0 and f2.num_rows == 0

    # third pull: nothing changed
    r3 = replicate(leader, follower)
    assert r3["up_to_date"] and r3["copied_files"] == 0

    # leader merges: follower drops the merged-away dirs
    from lucene_solr_ray.index.merge import merge_index

    merged = merge_index(leader, segs_per_tier=2)
    assert merged["merges"] > 0
    r4 = replicate(leader, follower)
    assert r4["removed_dirs"] > 0
    l4 = Searcher(leader).search({"q": TermQuery("license")}, k=5, use_ray=False)
    f4 = Searcher(follower).search({"q": TermQuery("license")}, k=5, use_ray=False)
    assert f4.equals(l4)
