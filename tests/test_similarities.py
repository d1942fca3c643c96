"""ClassicSimilarity + LMDirichletSimilarity vs brute-force formula checks
on a real index (float32 reference mode)."""

import math

import numpy as np
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher, TermQuery
from lucene_solr_ray.search.similarities import (
    ClassicSimilarity,
    LMDirichletSimilarity,
    similarity_from_spec,
)
from lucene_solr_ray.util.smallfloat import LENGTH_TABLE

from oracle import BruteForceIndex


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(300)
    d = str(tmp_path_factory.mktemp("sim_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=120)
    return d, BruteForceIndex(tbl)


def _mid_term(oracle):
    by_df = sorted(oracle.df.items(), key=lambda kv: (kv[1], kv[0]))
    return by_df[len(by_df) // 2][0]


@pytest.mark.parametrize("use_ray", [False, True])
def test_classic_matches_formula(built, use_ray):
    d, oracle = built
    t = _mid_term(oracle)
    s = Searcher(d, similarity=ClassicSimilarity(np.float32))
    got = s.search({"q": TermQuery(t)}, k=1000, use_ray=use_ray).to_pandas()
    df = oracle.df[t]
    dc = oracle.n
    idf = np.float32(math.log((dc + 1) / float(df + 1)) + 1.0)
    for row in got.itertuples():
        d0 = int(row.doc_id)
        f = oracle.tf[d0][t]
        nb = oracle.norm_byte[d0]
        exp = np.float32(
            np.float32(np.sqrt(np.float32(f)))
            * np.float32(np.float32(1.0) * idf)
            * np.float32(1.0 / np.sqrt(np.float64(LENGTH_TABLE[nb])))
        )
        assert np.float32(row.score) == exp, (t, d0)


@pytest.mark.parametrize("use_ray", [False, True])
def test_lmdirichlet_matches_formula(built, use_ray):
    d, oracle = built
    t = _mid_term(oracle)
    mu = 2000.0
    s = Searcher(d, similarity=LMDirichletSimilarity(mu, np.float32))
    got = s.search({"q": TermQuery(t)}, k=1000, use_ray=use_ray).to_pandas()
    ttf = sum(tf[t] for tf in oracle.tf if t in tf)
    sum_ttf = sum(oracle.field_len)
    p = np.float32(np.float32(ttf + 1) / np.float32(sum_ttf + 1))
    assert len(got) == oracle.df[t]
    for row in got.itertuples():
        d0 = int(row.doc_id)
        f = oracle.tf[d0][t]
        dl = float(LENGTH_TABLE[oracle.norm_byte[d0]])
        raw = math.log(1 + f / (mu * float(p))) + math.log(mu / (dl + mu))
        exp = max(np.float32(1.0) * np.float32(raw), np.float32(0.0))
        assert abs(np.float32(row.score) - exp) <= 2e-7, (t, d0, row.score, exp)


def test_lmd_clamps_negative(built):
    # a mega term in a long doc can score negative pre-clamp; engine floors at 0
    d, oracle = built
    s = Searcher(d, similarity=LMDirichletSimilarity(2000.0, np.float32))
    by_df = sorted(oracle.df.items(), key=lambda kv: kv[1])
    mega = by_df[-1][0]
    got = s.search({"q": TermQuery(mega)}, k=1000, use_ray=False).to_pandas()
    assert (got.score >= 0).all()


def test_spec_roundtrip():
    for sim in (
        ClassicSimilarity(np.float64),
        LMDirichletSimilarity(1500.0, np.float32),
    ):
        clone = similarity_from_spec(sim.spec())
        assert type(clone) is type(sim) and clone.dtype == sim.dtype
    from lucene_solr_ray.search.bm25 import BM25Similarity

    b = similarity_from_spec(BM25Similarity(1.4, 0.6).spec())
    assert isinstance(b, BM25Similarity) and b.k1 == 1.4 and b.b == 0.6


def test_classic_ranking_differs_from_bm25(built):
    # sanity: the strategies are actually different functions
    d, oracle = built
    t = _mid_term(oracle)
    bm = Searcher(d).search({"q": TermQuery(t)}, k=50, use_ray=False).to_pandas()
    cl = Searcher(d, similarity=ClassicSimilarity()).search(
        {"q": TermQuery(t)}, k=50, use_ray=False
    ).to_pandas()
    assert set(bm.doc_id) == set(cl.doc_id)  # same match set
    assert not np.array_equal(bm.score.to_numpy(), cl.score.to_numpy())
