"""UnifiedHighlighter-analog golden tests: passage selection, match
wrapping, PassageScorer formula behavior, and the stored-content round trip
through a real index."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher, TermQuery, parse_query
from lucene_solr_ray.search.highlight import (
    PassageScorer,
    highlight_text,
    sentence_spans,
)


def test_sentence_spans():
    t = "One fox. Two dogs! Three?  Four"
    spans = sentence_spans(t)
    assert [t[s:e] for s, e in spans] == ["One fox.", "Two dogs!", "Three?", "Four"]
    assert sentence_spans("") == [(0, 0)]
    assert sentence_spans("no breaks here") == [(0, 14)]
    t2 = "para one\n\npara two"
    assert [t2[s:e] for s, e in sentence_spans(t2)] == ["para one", "para two"]


def test_highlight_basic_golden():
    text = "The quick brown fox jumps. The lazy dog sleeps here. Fox and dog play."
    out = highlight_text(text, {"fox"}, max_passages=1)
    # the shorter passage wins: same freq, higher tf (length-normalized),
    # which outweighs the earlier passage's start-offset norm boost
    assert out == "<b>Fox</b> and dog play."
    out2 = highlight_text(text, {"fox"}, max_passages=2)
    assert out2 == "The quick brown <b>fox</b> jumps.... <b>Fox</b> and dog play."
    # no match → None (UnifiedHighlighter null)
    assert highlight_text(text, {"zebra"}) is None
    assert highlight_text("", {"fox"}) is None


def test_highlight_multiple_terms_and_merge():
    text = "alpha beta gamma. delta alpha beta."
    out = highlight_text(text, {"alpha", "beta"}, max_passages=1)
    # adjacent matches stay separate (joined by the space between them)
    assert out in (
        "<b>alpha</b> <b>beta</b> gamma.",
        "delta <b>alpha</b> <b>beta</b>.",
    )


def test_passage_scorer_formulas():
    sc = PassageScorer()  # k1=1.2, b=0.75, pivot=87 (PassageScorer.java:57-60)
    # weight: (k1+1)*ln(1 + (numDocs+0.5)/(ttf+0.5)), numDocs = 1 + len/pivot
    import math

    w = sc.weight(174, 3)
    assert w == pytest.approx(2.2 * math.log(1 + (1 + 174 / 87.0 + 0.5) / 3.5))
    # tf: freq/(freq + k1*((1-b) + b*len/pivot))
    tf = sc.tf(2, 87)
    assert tf == pytest.approx(2 / (2 + 1.2 * ((1 - 0.75) + 0.75 * 1.0)))
    # norm decreases with start offset
    assert sc.norm(0) > sc.norm(500)


def test_more_matches_outscore_position():
    # a later passage with 2x the matches beats the earlier 1-match passage
    text = "fox here. " + "x " * 60 + "fox fox fox fox fox fox den."
    out = highlight_text(text, {"fox"}, max_passages=1)
    assert out.count("<b>fox</b>") == 6


def test_stopword_and_case_handling():
    text = "The Fox THE fox."
    out = highlight_text(text, {"fox"}, max_passages=1)
    assert out == "The <b>Fox</b> THE <b>fox</b>."


@pytest.fixture(scope="module")
def stored_index(ray_session, tmp_path_factory):
    rows = [
        ("r1", "a.py", "c1", "py", "Spark merges data. Sorting helps. Spark wins again."),
        ("r1", "b.py", "c2", "py", "Nothing relevant here. Just filler text."),
        ("r1", "c.py", "c3", "py", "A spark of genius. More filler. spark spark."),
    ]
    tbl = pa.table(
        {
            "repo": pa.array([r[0] for r in rows]),
            "path": pa.array([r[1] for r in rows]),
            "commit": pa.array([r[2] for r in rows]),
            "lang": pa.array([r[3] for r in rows]),
            "content": pa.array([r[4] for r in rows]),
        }
    )
    d = str(tmp_path_factory.mktemp("hl_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=2, store_content=True)
    return d


def test_end_to_end_highlight(stored_index):
    s = Searcher(stored_index)
    q = TermQuery("spark")
    res = s.search({"q": q}, k=10, use_ray=False).to_pandas()
    assert len(res) == 2
    snips = s.highlight(q, res.doc_id.tolist())
    vals = [v for v in snips.values() if v]
    assert len(vals) == 2
    assert all("<b>" in v for v in vals)
    joined = " ".join(vals)
    assert "<b>Spark</b>" in joined or "<b>spark</b>" in joined


def test_highlight_rewritten_prefix(stored_index):
    # prefix query highlights its concrete expansions
    s = Searcher(stored_index)
    q = parse_query("spar*")
    from lucene_solr_ray.search.query import PrefixQuery

    q = PrefixQuery("spar")
    res = s.search({"q": q}, k=10, use_ray=False).to_pandas()
    snips = s.highlight(q, res.doc_id.tolist())
    assert any(v and "<b>" in v for v in snips.values())


def test_highlight_without_stored_content_raises(ray_session, tmp_path_factory):
    tbl = pa.table(
        {
            "repo": pa.array(["r"]),
            "path": pa.array(["p"]),
            "commit": pa.array(["c"]),
            "lang": pa.array(["py"]),
            "content": pa.array(["hello world of search"]),
        }
    )
    d = str(tmp_path_factory.mktemp("nohl_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=10, store_content=False)
    s = Searcher(d)
    with pytest.raises(Exception):
        s.highlight(TermQuery("hello"), [0])
