"""BM25 unit tests mirroring TestBM25Similarity
(core/src/test/.../similarities/TestBM25Similarity.java:41-90) plus
hand-computed score pinning (SURVEY.md §2.6)."""

import math

import numpy as np
import pytest

from lucene_solr_ray.search.bm25 import BM25Similarity
from lucene_solr_ray.util.smallfloat import LENGTH_TABLE


def test_illegal_k1():
    for bad in [-1, float("inf"), float("nan")]:
        with pytest.raises(ValueError):
            BM25Similarity(k1=bad)


def test_illegal_b():
    for bad in [-0.5, 1.5, float("nan")]:
        with pytest.raises(ValueError):
            BM25Similarity(b=bad)


def test_idf_formula_float32():
    sim = BM25Similarity()
    # idf = (float) log(1 + (docCount - df + 0.5)/(df + 0.5))
    for df, n in [(1, 100), (50, 100), (100, 100), (3, 7)]:
        expected = np.float32(math.log(1 + (n - df + 0.5) / (df + 0.5)))
        assert sim.idf(df, n) == expected


def test_hand_computed_score():
    # one doc, len 4 (exact norm), df=1 of 3 docs, avgdl = 10/3, tf=2, k1=1.2 b=0.75
    sim = BM25Similarity()
    avgdl = sim.avgdl(10, 3)
    assert avgdl == np.float32(10 / 3.0)
    cache = sim.norm_cache(avgdl)
    idf = np.float32(math.log(1 + (3 - 1 + 0.5) / 1.5))
    w = sim.weight_value(1, 3)
    assert w == np.float32(idf * np.float32(1.0)) * np.float32(2.2)
    norm4 = np.float32(1.2) * (
        (np.float32(1.0) - np.float32(0.75)) + np.float32(0.75) * np.float32(4.0) / avgdl
    )
    assert cache[4] == norm4
    score = sim.score_freqs(w, np.array([2]), np.array([4]), cache)
    expected = np.float32(w * np.float32(2.0) / (np.float32(2.0) + norm4))
    assert score[0] == expected


def test_norm_cache_uses_length_table():
    sim = BM25Similarity()
    cache = sim.norm_cache(np.float32(100.0))
    manual = np.float32(1.2) * (
        np.float32(0.25) + np.float32(0.75) * LENGTH_TABLE.astype(np.float32) / np.float32(100.0)
    )
    np.testing.assert_array_equal(cache, manual.astype(np.float32))


def test_score_monotone_in_tf_and_antimonotone_in_len():
    sim = BM25Similarity()
    cache = sim.norm_cache(np.float32(50.0))
    w = sim.weight_value(10, 1000)
    s = sim.score_freqs(w, np.array([1, 2, 4, 8]), np.array([10, 10, 10, 10]), cache)
    assert np.all(np.diff(s) > 0)
    s2 = sim.score_freqs(w, np.array([2, 2, 2]), np.array([4, 40, 150]), cache)
    assert np.all(np.diff(s2) < 0)
