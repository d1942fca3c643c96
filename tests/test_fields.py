"""Multi-field indexing + field:term queries (FieldInfos analog — VERDICT r1
item 1): keyword fields are StringField-like (verbatim term, tf=1, omitNorms
→ norm=k1 scoring, BM25Similarity.java:263); content stays the analyzed
TextField. Field postings must survive merges and match at any parallelism."""

import numpy as np
import pyarrow.dataset as pads
import pytest
import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.index.merge import merge_index
from lucene_solr_ray.search import Searcher, parse_query
from lucene_solr_ray.search.query import BooleanQuery, PrefixQuery, TermQuery


@pytest.fixture(scope="module")
def fidx(ray_session, tmp_path_factory):
    tbl = generate_corpus(900)
    d = str(tmp_path_factory.mktemp("fidx"))
    res = build_index(ray.data.from_arrow(tbl), d, docs_per_segment=300)
    s = Searcher(d)
    docs = pads.dataset(s.reader.docs_files()).to_table()
    return d, s, docs


def test_field_stats_in_manifest(fidx):
    _, s, docs = fidx
    fs = s.reader.field_stats
    assert set(fs) == {"content", "repo", "path", "lang"}
    assert fs["content"]["has_norms"] and not fs["lang"]["has_norms"]
    # keyword field: one term per doc → sum_df == sum_ttf == doc_count
    assert fs["path"]["sum_df"] == fs["path"]["sum_ttf"] == len(docs)
    assert fs["path"]["num_terms"] == len(set(docs["path"].to_pylist()))


def test_keyword_term_query_matches_column(fidx):
    _, s, docs = fidx
    lang = docs["lang"][0].as_py()
    expect = sorted(
        int(d) for d, l in zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist()) if l == lang
    )
    r = s.search({"q": TermQuery(lang, field="lang")}, k=len(expect) + 5, use_ray=False)
    assert sorted(r["doc_id"].to_pylist()) == expect
    # omitNorms: every match scores identically (tf=1, norm=k1)
    assert len(set(np.asarray(r["score"].to_numpy()).tolist())) == 1
    # constant score ⇒ rank order is doc_id order (HitQueue tie-break)
    assert r["doc_id"].to_pylist() == sorted(r["doc_id"].to_pylist())


def test_field_isolation(fidx):
    """A content term must not match the keyword field and vice versa."""
    _, s, docs = fidx
    lang = docs["lang"][0].as_py()
    in_content = s.search({"q": TermQuery(lang)}, k=10_000, use_ray=False)
    in_lang = s.search({"q": TermQuery(lang, field="lang")}, k=10_000, use_ray=False)
    # the lang code may incidentally appear in content text, but the match
    # sets are computed from different postings — lang-field set must equal
    # the column exactly (checked above); here: unknown keyword value = empty
    assert len(s.search({"q": TermQuery("no_such_lang", field="lang")}, k=10, use_ray=False)) == 0
    assert len(in_lang) > 0
    del in_content  # content set may be anything; isolation is per-postings


def test_parser_field_syntax_and_combined_ranks(fidx):
    _, s, docs = fidx
    lang = docs["lang"][0].as_py()
    q = parse_query(f"lang:{lang} AND apache")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2
    fields = sorted(c.field for c in q.must)
    assert fields == ["content", "lang"]
    rc = s.search({"c": q}, k=10, use_ray=False)
    # adding the keyword clause's constant score must not reorder the
    # content-score ranking among the filtered docs
    content = s.search({"c": TermQuery("apache")}, k=100_000, use_ray=False)
    cd = content["doc_id"].to_numpy()
    cs = content["score"].to_numpy()
    lang_ids = {
        int(d) for d, l in zip(docs["doc_id"].to_pylist(), docs["lang"].to_pylist()) if l == lang
    }
    f = np.asarray([int(x) in lang_ids for x in cd])
    order = np.lexsort((cd[f], -cs[f]))[:10]
    assert rc["doc_id"].to_pylist() == cd[f][order].tolist()


def test_keyword_prefix_query(fidx):
    _, s, docs = fidx
    pfx = s.search({"p": PrefixQuery("src/a", field="path")}, k=100_000, use_ray=False)
    expect = sorted(
        int(d)
        for d, p in zip(docs["doc_id"].to_pylist(), docs["path"].to_pylist())
        if p.startswith("src/a")
    )
    assert sorted(pfx["doc_id"].to_pylist()) == expect


def test_fields_survive_merge(fidx):
    d, s, docs = fidx
    lang = docs["lang"][0].as_py()
    before = s.search(
        {"kw": TermQuery(lang, field="lang"), "c": parse_query(f"lang:{lang} AND apache")},
        k=25,
        use_ray=False,
    ).to_pandas()
    merge_index(d, segs_per_tier=3)
    s2 = Searcher(d)
    after = s2.search(
        {"kw": TermQuery(lang, field="lang"), "c": parse_query(f"lang:{lang} AND apache")},
        k=25,
        use_ray=False,
    ).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(before.reset_index(drop=True), after.reset_index(drop=True))
    assert s2.reader.field_stats["path"]["sum_df"] == s.reader.field_stats["path"]["sum_df"]
    assert check_index(d)["docs"] == 900
