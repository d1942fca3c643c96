"""Index-stored char offsets (IndexOptions ..._AND_OFFSETS analog —
``codecs/lucene50/Lucene50PostingsFormat.java:42-96`` .pay offset track):
round-trip through build, survival through merge, and the highlighter's
POSTINGS offset source matching the ANALYSIS (re-tokenization) source."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_solr_ray.analysis.tokenizer import StandardAnalyzer, analyze_with_offsets
from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.highlight import highlight_hits, highlight_text
from lucene_solr_ray.search.query import TermQuery, parse_query


@pytest.fixture(scope="module")
def off_index(ray_session, tmp_path_factory):
    tbl = generate_corpus(400)
    d = str(tmp_path_factory.mktemp("offidx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=100,
                store_content=True, store_offsets=True)
    return d, tbl


def _reanalyzed_offsets(text, term):
    return [(s, e) for t, _p, s, e in analyze_with_offsets(text, StandardAnalyzer())
            if t == term]


def test_offsets_round_trip_matches_reanalysis(off_index):
    d, tbl = off_index
    s = Searcher(d)
    assert s.reader.manifest["offsets"] is True
    from lucene_solr_ray.search.highlight import _postings_offset_hits

    res = s.search({"q": TermQuery("license")}, k=5, use_ray=False)
    ids = res["doc_id"].to_pylist()
    hits, ttf = _postings_offset_hits(s, {"license"}, ids, "content")
    docs = s.reader.fetch_docs(ids, columns=["doc_id", "content"])
    text_of = dict(zip(docs["doc_id"].to_pylist(), docs["content"].to_pylist()))
    for d_id in ids:
        want = _reanalyzed_offsets(text_of[d_id], "license")
        got = sorted((a, b) for a, b, _t in hits[d_id])
        assert got == sorted(want), d_id
        assert ttf[d_id]["license"] == len(want)


def test_highlight_postings_source_equals_analysis_source(off_index, ray_session,
                                                          tmp_path_factory):
    d, tbl = off_index
    s_off = Searcher(d)
    # same corpus indexed WITHOUT offsets → ANALYSIS offset source
    d2 = str(tmp_path_factory.mktemp("noidx"))
    build_index(ray.data.from_arrow(tbl), d2, docs_per_segment=100,
                store_content=True)
    s_plain = Searcher(d2)
    q = parse_query("license AND apache")
    ids = s_off.search({"q": q}, k=8, use_ray=False)["doc_id"].to_pylist()
    a = highlight_hits(s_off, q, ids)
    b = highlight_hits(s_plain, q, ids)
    assert a == b and any(v for v in a.values())


def test_offsets_survive_merge(off_index, ray_session):
    import shutil
    import tempfile

    from lucene_solr_ray.index.merge import merge_index

    d, tbl = off_index
    d2 = tempfile.mkdtemp()
    shutil.copytree(d, d2, dirs_exist_ok=True)
    res = merge_index(d2, segs_per_tier=2)
    s = Searcher(d2)
    assert len(s.reader.segments) < 4 or res is not None
    q = TermQuery("license")
    ids = s.search({"q": q}, k=5, use_ray=False)["doc_id"].to_pylist()
    from lucene_solr_ray.search.highlight import _postings_offset_hits

    hits, _ = _postings_offset_hits(s, {"license"}, ids, "content")
    docs = s.reader.fetch_docs(ids, columns=["doc_id", "content"])
    text_of = dict(zip(docs["doc_id"].to_pylist(), docs["content"].to_pylist()))
    for d_id in ids:
        want = _reanalyzed_offsets(text_of[d_id], "license")
        assert sorted((a, b) for a, b, _t in hits[d_id]) == sorted(want)


def test_offsets_index_scores_identical_to_default(off_index, ray_session,
                                                   tmp_path_factory):
    """The offsets path must not perturb scoring: same corpus, same query →
    identical (doc, score) with and without store_offsets."""
    d, tbl = off_index
    d2 = str(tmp_path_factory.mktemp("plainidx"))
    build_index(ray.data.from_arrow(tbl), d2, docs_per_segment=100,
                store_content=True)
    a = Searcher(d).search({"q": parse_query("apache OR merge")}, k=20,
                           use_ray=False).to_pandas()
    b = Searcher(d2).search({"q": parse_query("apache OR merge")}, k=20,
                            use_ray=False).to_pandas()
    assert a.to_string() == b.to_string()
