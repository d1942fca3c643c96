"""Per-process reader caches (reader.py): parquet handles + row-group
(field, term) ranges, norm bytes, doc values — keyed by (path, mtime, size)
so a delete-and-rebuild at the SAME path self-invalidates."""

import os
import time

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.reader import (
    read_postings_rows,
    segment_norms_cached,
)
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import TermQuery


def _build(d, analyzer=None, docs=300):
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    tbl = generate_corpus(docs)
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=docs,
                analyzer=analyzer)


def test_postings_cache_hits_and_filters_exactly(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    _build(d)
    s = Searcher(d)
    pf = s.reader.postings_files()[0]
    t1 = read_postings_rows(pf, [("content", "license")])
    t2 = read_postings_rows(pf, [("content", "license")])  # cached handle
    assert t1.equals(t2)
    assert set(t1["term"].to_pylist()) <= {"license"}
    # missing term → empty with schema intact
    t3 = read_postings_rows(pf, [("content", "zzz_not_a_term")])
    assert len(t3) == 0 and "doc_blob" in t3.schema.names
    # pruned columns drop the position stream
    cols = ["seg", "field", "term", "df", "ttf", "doc_blob", "freq_blob",
            "block_first_doc", "block_last_doc", "block_max_freq", "block_min_len"]
    t4 = read_postings_rows(pf, [("content", "license")], cols)
    assert "pos_blob" not in t4.schema.names and len(t4) == len(t1)


def test_same_path_rebuild_invalidates_caches(ray_session, tmp_path):
    from lucene_solr_ray.analysis.tokenizer import StandardAnalyzer

    d = str(tmp_path / "idx")
    _build(d, docs=200)
    s = Searcher(d)
    seg_d = s.reader.seg_dir(s.reader.segments[0]["seg"])
    n1 = segment_norms_cached(seg_d)
    r1 = s.search({"q": TermQuery("license")}, k=5, use_ray=False).to_pandas()

    # rebuild the SAME path with a different analyzer → different index bytes
    time.sleep(0.05)  # ensure a distinct mtime_ns even on coarse filesystems
    _build(d, analyzer=StandardAnalyzer(stopwords=frozenset()), docs=200)
    s2 = Searcher(d)
    seg_d2 = s2.reader.seg_dir(s2.reader.segments[0]["seg"])
    n2 = segment_norms_cached(seg_d2)
    # no-stopword analyzer keeps more tokens → longer norms somewhere
    assert n1.shape == n2.shape and not np.array_equal(n1, n2)
    r2 = s2.search({"q": TermQuery("the")}, k=5, use_ray=False).to_pandas()
    assert len(r2) > 0  # "the" only indexed in the no-stopword rebuild


def test_postings_cache_lru_closes_evicted_handles(ray_session, tmp_path, monkeypatch):
    """The handle cache holds open fds: eviction must be LRU and must CLOSE
    the evicted ParquetFile so an index with more segment files than
    `ulimit -n` cannot exhaust descriptors."""
    from lucene_solr_ray.index import reader as rmod

    d = str(tmp_path / "idx")
    tbl = generate_corpus(120)
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=20)  # 6 segments
    s = Searcher(d)
    files = s.reader.postings_files()
    assert len(files) >= 4
    monkeypatch.setattr(rmod, "_PF_CACHE_MAX", 2)
    rmod._PF_CACHE.clear()
    for pf in files:
        read_postings_rows(pf, [("content", "license")])
    assert len(rmod._PF_CACHE) <= 2
    # least-recently-used entries were evicted; the kept keys are the last two
    kept = [k[0] for k in rmod._PF_CACHE]
    assert kept == files[-2:]
    # an evicted file re-reads correctly through a fresh handle
    t = read_postings_rows(files[0], [("content", "license")])
    assert len(t) > 0
    rmod._PF_CACHE.clear()


def test_norms_cache_readonly_and_stable(ray_session, tmp_path):
    d = str(tmp_path / "idx")
    _build(d)
    s = Searcher(d)
    seg_d = s.reader.seg_dir(s.reader.segments[0]["seg"])
    n = segment_norms_cached(seg_d)
    assert segment_norms_cached(seg_d) is n  # cached object identity


def test_term_stats_cache_point_in_time(ray_session, tmp_path):
    """term_stats caches per READER INSTANCE: repeat calls are served from
    the cache bit-identically; a rebuild at the same path gives a NEW reader
    the new stats while the cache never crosses instances (DirectoryReader
    point-in-time semantics)."""
    from lucene_solr_ray.index.reader import IndexReader

    d = str(tmp_path / "idx")
    _build(d, docs=200)
    r1 = IndexReader(d)
    pairs = [("content", "license"), ("content", "apache"),
             ("content", "zzz_absent")]
    first = r1.term_stats(pairs)
    assert first[("content", "zzz_absent")] == (0, 0)
    assert first[("content", "license")][0] > 0
    # cached: second call identical, cache populated
    assert r1.term_stats(pairs) == first
    assert ("content", "license") in r1._term_stats_cache

    # same path, different corpus -> new reader sees new stats
    _build(d, docs=120)
    r2 = IndexReader(d)
    second = r2.term_stats(pairs)
    assert second[("content", "license")] != first[("content", "license")]
    # the old instance keeps serving its own generation's numbers
    assert r1.term_stats(pairs) == first


def test_term_stats_eviction_mid_call_no_keyerror(ray_session, tmp_path):
    """Cache eviction at the 200k bound must not drop entries the CURRENT
    call is about to return (review r4: clear-before-read KeyError)."""
    from lucene_solr_ray.index.reader import IndexReader

    d = str(tmp_path / "idx")
    _build(d, docs=150)
    r = IndexReader(d)
    cached = ("content", "license")
    first = r.term_stats([cached])
    # inflate the cache past the eviction bound with synthetic entries
    r._term_stats_cache.update(
        {("content", f"fake{i}"): (1, 1) for i in range(200_001)})
    out = r.term_stats([cached, ("content", "apache")])  # mixed hit + miss
    assert out[cached] == first[cached]
    assert out[("content", "apache")][0] >= 0


def test_fetch_docs_after_binary_update_edge_shapes(ray_session, tmp_path):
    """After updateBinaryDocValue: fetch without doc_id in columns works,
    and large_string columns (content) receive overrides too."""
    from lucene_solr_ray.index.reader import IndexReader
    from lucene_solr_ray.index.update import update_binary_doc_values

    d = str(tmp_path / "idx")
    tbl = generate_corpus(80)
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=80,
                store_content=True)  # content stored as large_string
    update_binary_doc_values(
        d, [(3, "lang", b"klingon"), (3, "content", b"patched body")])
    r = IndexReader(d)
    # columns WITHOUT doc_id: no crash, override visible, no doc_id leak
    t = r.fetch_docs([3], columns=["lang"])
    assert t.column_names == ["lang"]
    assert t["lang"].to_pylist() == ["klingon"]
    # large_string stored field receives the override as well
    t2 = r.fetch_docs([3], columns=["doc_id", "content"])
    assert t2["content"].to_pylist() == ["patched body"]
