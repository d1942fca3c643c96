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
    BooleanSimilarity,
    ClassicSimilarity,
    DFISimilarity,
    DFRSimilarity,
    IBSimilarity,
    LMDirichletSimilarity,
    LMJelinekMercerSimilarity,
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


def _stats_for(oracle, t):
    df = oracle.df[t]
    ttf = sum(tf[t] for tf in oracle.tf if t in tf)
    sum_ttf = sum(oracle.field_len)
    return df, ttf, oracle.n, sum_ttf


def _tfn_h2(avg, f, dl):
    inner = np.float64(np.float32(1.0) + (np.float32(1.0) * avg) / np.float32(dl))
    return np.float32(np.float64(np.float32(f)) * (np.log(inner) / math.log(2.0)))


def test_dfr_in_b_h2_matches_formula(built):
    d, oracle = built
    t = _mid_term(oracle)
    df, ttf, n, sum_ttf = _stats_for(oracle, t)
    s = Searcher(d, similarity=DFRSimilarity("in", "b", "h2", 1.0, np.float32))
    got = s.search({"q": TermQuery(t)}, k=1000, use_ray=False).to_pandas()
    assert len(got) == df
    avg = np.float32(sum_ttf / float(n))
    for row in got.itertuples():
        d0 = int(row.doc_id)
        f = oracle.tf[d0][t]
        dl = float(LENGTH_TABLE[oracle.norm_byte[d0]])
        tfn = _tfn_h2(avg, f, dl)
        model = tfn * np.float32(math.log((n + 1) / (df + 0.5)) / math.log(2.0))
        effect = np.float32(ttf + 2) / (np.float32(df + 1) * (tfn + np.float32(1.0)))
        exp = np.float32((np.float32(1.0) * model) * effect)
        assert abs(np.float32(row.score) - exp) <= 2e-6 * abs(exp), (d0, row.score, exp)


def test_ib_ll_df_h2_matches_formula(built):
    d, oracle = built
    t = _mid_term(oracle)
    df, ttf, n, sum_ttf = _stats_for(oracle, t)
    s = Searcher(d, similarity=IBSimilarity("ll", "df", "h2", 1.0, np.float32))
    got = s.search({"q": TermQuery(t)}, k=1000, use_ray=False).to_pandas()
    assert len(got) == df
    avg = np.float32(sum_ttf / float(n))
    lam = np.float32(df + 1.0) / np.float32(n + 1.0)
    for row in got.itertuples():
        d0 = int(row.doc_id)
        f = oracle.tf[d0][t]
        dl = float(LENGTH_TABLE[oracle.norm_byte[d0]])
        tfn = _tfn_h2(avg, f, dl)
        exp = np.float32(np.float32(1.0) * np.float32(-math.log(np.float64(lam / (tfn + lam)))))
        assert abs(np.float32(row.score) - exp) <= 2e-6 * abs(exp), (d0, row.score, exp)


def test_jm_matches_formula(built):
    d, oracle = built
    t = _mid_term(oracle)
    df, ttf, n, sum_ttf = _stats_for(oracle, t)
    lam = 0.7
    s = Searcher(d, similarity=LMJelinekMercerSimilarity(lam, np.float32))
    got = s.search({"q": TermQuery(t)}, k=1000, use_ray=False).to_pandas()
    assert len(got) == df
    p = np.float32(ttf + 1.0) / np.float32(sum_ttf + 1.0)
    for row in got.itertuples():
        d0 = int(row.doc_id)
        f = oracle.tf[d0][t]
        dl = float(LENGTH_TABLE[oracle.norm_byte[d0]])
        inner = np.float32(1.0) + ((np.float32(1.0) - np.float32(lam)) * np.float32(f) / np.float32(dl)) / (
            np.float32(lam) * p
        )
        exp = np.float32(np.float32(1.0) * np.float32(math.log(np.float64(inner))))
        assert abs(np.float32(row.score) - exp) <= 2e-6 * abs(exp), (d0, row.score, exp)


def test_dfi_zero_below_expected_and_formula(built):
    d, oracle = built
    # the most frequent term: many docs where tf <= expected → score 0 dropped
    by_df = sorted(oracle.df.items(), key=lambda kv: kv[1])
    t = by_df[-1][0]
    df, ttf, n, sum_ttf = _stats_for(oracle, t)
    s = Searcher(d, similarity=DFISimilarity(np.float32))
    got = s.search({"q": TermQuery(t)}, k=1000, use_ray=False).to_pandas()
    assert (got.score >= 0).all()
    for row in got.head(20).itertuples():
        d0 = int(row.doc_id)
        f = oracle.tf[d0][t]
        dl = np.float32(LENGTH_TABLE[oracle.norm_byte[d0]])
        expected = (np.float32(ttf + 1) * dl) / np.float32(sum_ttf + 1)
        if np.float32(f) <= expected:
            assert np.float32(row.score) == np.float32(0.0)
        else:
            measure = ((np.float32(f) - expected) ** 2) / expected
            exp = np.float32(1.0) * np.float32(math.log(np.float64(measure + np.float32(1.0))) / math.log(2.0))
            assert abs(np.float32(row.score) - exp) <= 2e-6 * abs(exp)


def test_boolean_similarity_scores_boost(built):
    d, oracle = built
    t = _mid_term(oracle)
    s = Searcher(d, similarity=BooleanSimilarity())
    got = s.search({"q": TermQuery(t, boost=2.5)}, k=1000, use_ray=False).to_pandas()
    assert len(got) == oracle.df[t]
    assert (got.score.to_numpy() == np.float32(2.5)).all()
    # ranking degenerates to doc-id order (HitQueue tie-break)
    assert list(got.doc_id) == sorted(got.doc_id)


def test_new_spec_roundtrips():
    for sim in (
        DFRSimilarity("g", "l", "h1", 1.0, np.float64),
        IBSimilarity("spl", "ttf", "h2", 1.0, np.float32),
        LMJelinekMercerSimilarity(0.3, np.float64),
        DFISimilarity(np.float32),
        BooleanSimilarity(np.float32),
    ):
        clone = similarity_from_spec(sim.spec())
        assert type(clone) is type(sim) and clone.dtype == sim.dtype
        assert clone.spec() == sim.spec()


def test_dfr_variants_all_positive(built):
    d, oracle = built
    t = _mid_term(oracle)
    for bm in ("in", "g"):
        for ae in ("b", "l"):
            for nm in ("h1", "h2"):
                s = Searcher(d, similarity=DFRSimilarity(bm, ae, nm))
                got = s.search({"q": TermQuery(t)}, k=10, use_ray=False).to_pandas()
                assert len(got) > 0 and (got.score > 0).all(), (bm, ae, nm)
    for dist in ("ll", "spl"):
        for lamk in ("df", "ttf"):
            s = Searcher(d, similarity=IBSimilarity(dist, lamk))
            got = s.search({"q": TermQuery(t)}, k=10, use_ray=False).to_pandas()
            assert len(got) > 0 and (got.score > 0).all(), (dist, lamk)


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


def test_sweetspot_norm_and_tf():
    """SweetSpotSimilarity.java: lengthNorm plateau = 1.0 inside [min, max],
    sloping outside; baselineTf = base up to min, sqrt(freq + base² − min)
    above."""
    from lucene_solr_ray.search.similarities import SweetSpotSimilarity
    from lucene_solr_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4

    sim = SweetSpotSimilarity(ln_min=10, ln_max=20, steepness=0.5,
                              tf_min=2.0, tf_base=1.5, dtype=np.float64)
    cache = sim.norm_cache(sim.avgdl(100, 10))
    for length in (10, 15, 20):
        b = int_to_byte4(length)
        if int(LENGTH_TABLE[b]) == length:  # quantization-exact lengths only
            assert cache[b] == pytest.approx(1.0)
    b5, b40 = int_to_byte4(5), int_to_byte4(40)
    assert cache[b5] < 1.0 and cache[b40] < 1.0
    # 1/sqrt(0.5*(|40-10|+|40-20|-10)+1) with quantized l=40
    l40 = float(LENGTH_TABLE[b40])
    assert cache[b40] == pytest.approx(
        1.0 / math.sqrt(0.5 * (abs(l40 - 10) + abs(l40 - 20) - 10) + 1.0))
    freqs = np.array([1.0, 2.0, 3.0, 6.0])
    got = sim.score_freqs(np.float64(1.0), freqs, np.full(4, b5), sim.nonorm_cache())
    assert got[0] == got[1] == pytest.approx(1.5)  # baseline up to tf_min
    assert got[2] == pytest.approx(math.sqrt(3 + 2.25 - 2.0))
    assert got[3] == pytest.approx(math.sqrt(6 + 2.25 - 2.0))


def test_sweetspot_spec_roundtrip():
    from lucene_solr_ray.search.similarities import (
        SweetSpotSimilarity,
        similarity_from_spec,
    )

    sim = SweetSpotSimilarity(24, 40, 0.5, 2.0, 1.5, dtype=np.float64)
    back = similarity_from_spec(sim.spec())
    assert back.spec() == sim.spec()


def test_axiomatic_f2exp_formula_and_boost_quirk():
    """AxiomaticF2EXP.java: score = freq/((freq+s) + s·docLen/avgdl) ·
    ((N+1)/df)^k; Axiomatic.score never multiplies the boost (reference
    quirk, kept)."""
    from lucene_solr_ray.search.similarities import AxiomaticF2EXP
    from lucene_solr_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4

    sim = AxiomaticF2EXP(dtype=np.float64)
    w = sim.weight_from_idf(sim.term_weight_stat(df=5, ttf=40, doc_count=100,
                                                 sum_ttf=3000), boost=7.0)
    b = int_to_byte4(30)
    dl = float(LENGTH_TABLE[b])
    got = sim.score_freqs(w, np.array([3.0]), np.array([b]), sim.norm_cache(None))
    avg = 3000 / 100.0
    want = (3.0 / ((3.0 + 0.25) + ((0.25 * dl) / avg))) * math.pow(101.0 / 5, 0.35)
    assert got[0] == pytest.approx(want)  # boost=7 had no effect
    unboosted = sim.score_freqs(
        sim.weight_from_idf(sim.term_weight_stat(5, 40, 100, 3000), 1.0),
        np.array([3.0]), np.array([b]), sim.norm_cache(None))
    assert got[0] == unboosted[0]


def test_axiomatic_spec_roundtrip():
    from lucene_solr_ray.search.similarities import (
        AxiomaticF2EXP,
        similarity_from_spec,
    )

    sim = AxiomaticF2EXP(0.3, 0.4, dtype=np.float64)
    assert similarity_from_spec(sim.spec()).spec() == sim.spec()
