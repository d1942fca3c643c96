"""Percolator (MemoryIndex reverse search): mask-algebra evaluation and the
streaming pipeline (mirrors MemoryIndex.java's query-percolation use-case)."""

import numpy as np
import pyarrow as pa

from lucene_solr_ray.search.percolate import BatchIndex, PercolateBatch
from lucene_solr_ray.search.query import parse_query


def _bi(texts):
    return BatchIndex(pa.array(texts, pa.string()))


def test_term_and_boolean_masks():
    bi = _bi(["alpha beta gamma", "beta delta", "", "ALPHA beta"])
    assert bi.eval(parse_query("alpha")).tolist() == [True, False, False, True]
    assert bi.eval(parse_query("alpha AND beta")).tolist() == [True, False, False, True]
    assert bi.eval(parse_query("gamma OR delta")).tolist() == [True, True, False, False]
    assert bi.eval(parse_query("beta AND NOT delta")).tolist() == [True, False, False, True]


def test_stopwords_and_phrase():
    bi = _bi(["the quick brown fox", "quick the brown", "brown quick"])
    # stopword 'the' never matches ('the' is in the 33-word stoplist)
    assert bi.eval(parse_query("quick AND brown")).tolist() == [True, True, True]
    # phrase with a stopword hole: "quick the brown" → quick@0, brown@2 (gap)
    m = bi.eval(parse_query('"quick brown"'))
    assert m.tolist() == [True, False, False]


def test_phrase_repeat_term():
    bi = _bi(["x batch batch y", "batch x batch"])
    assert bi.eval(parse_query('"batch batch"')).tolist() == [True, False]


def test_percolate_batch_output():
    pb = PercolateBatch([("q1", "alpha"), ("q2", '"alpha beta"')])
    batch = pa.table({
        "doc_id": pa.array([10, 20, 30], pa.int64()),
        "text": pa.array(["alpha beta", "beta alpha beta", "gamma"], pa.string()),
    })
    out = pb(batch)
    pairs = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
    assert pairs == {(10, "q1"), (20, "q1"), (10, "q2"), (20, "q2")}
