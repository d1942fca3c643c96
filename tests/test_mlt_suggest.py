"""MoreLikeThis + suggest/spellcheck behavior tests."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.mlt import interesting_terms, mlt_query, mlt_search
from lucene_solr_ray.search.suggest import _levenshtein, spell_suggest, suggest_prefix


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(300)
    d = str(tmp_path_factory.mktemp("mlt_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=120, store_content=True)
    return d, tbl


def test_interesting_terms_filters(built):
    d, tbl = built
    s = Searcher(d)
    terms = interesting_terms(s, 0)
    assert 0 < len(terms) <= 25
    # scores best-first; every term passes the tf/df thresholds
    scores = [sc for _t, sc in terms]
    assert scores == sorted(scores, reverse=True)
    stats = s.reader.term_stats(sorted(("content", t) for t, _ in terms))
    docs = s.reader.fetch_docs([0], columns=["doc_id", "content"])
    from lucene_solr_ray.analysis.tokenizer import analyze_with_positions

    tf = {}
    for t, _p in analyze_with_positions(docs["content"][0].as_py() or ""):
        tf[t] = tf.get(t, 0) + 1
    for t, _sc in terms:
        assert tf[t] >= 2
        assert stats[("content", t)][0] >= 5


def test_mlt_search_excludes_source_and_finds_similar(built):
    d, _ = built
    s = Searcher(d)
    res = mlt_search(s, 0, k=10, use_ray=False).to_pandas()
    assert len(res) > 0
    assert 0 not in set(res.doc_id)
    assert res["rank"].tolist() == list(range(len(res)))
    # every license-header doc shares boilerplate; the query should match many
    q = mlt_query(s, 0)
    assert len(q.should) > 0


def test_suggest_prefix(built):
    d, _ = built
    s = Searcher(d)
    r = suggest_prefix(s.reader, "lic", num=5).to_pandas()
    assert "license" in set(r.term) or "licensed" in set(r.term)
    assert (r.df.values == sorted(r.df.values, reverse=True)).all()
    assert all(t.startswith("lic") for t in r.term)
    empty = suggest_prefix(s.reader, "zzzzz", num=5)
    assert empty.num_rows == 0


def test_spell_suggest(built):
    d, _ = built
    s = Searcher(d)
    r = spell_suggest(s.reader, "licanse", max_edits=2, num=5).to_pandas()
    assert "license" in set(r.term)
    assert (r.dist >= 1).all() and (r.dist <= 2).all()
    # ordering: distance asc, then df desc
    key = list(zip(r.dist, -r.df))
    assert key == sorted(key)


def test_levenshtein():
    assert _levenshtein("abc", "abc") == 0
    assert _levenshtein("abc", "abd") == 1
    assert _levenshtein("abc", "acb") == 2
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("", "ab") == 2
