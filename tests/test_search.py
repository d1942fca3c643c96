"""End-to-end search correctness: index-based engines (exhaustive + WAND, Ray
and local paths) must be (doc_id, float32-score-bit) identical to the
independent brute-force oracle — FIXTURES.md §6; mirrors Lucene's
TestWANDScorer-style oracle checks."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import BooleanQuery, Searcher, TermQuery, parse_query
from lucene_solr_ray.search.query import MatchAllQuery

from oracle import BruteForceIndex

N_DOCS = 400


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(N_DOCS)
    d = str(tmp_path_factory.mktemp("index"))
    res = build_index(ray.data.from_arrow(tbl), d, docs_per_segment=150)
    oracle = BruteForceIndex(tbl)
    return d, res, oracle, tbl


def _pick_terms(oracle):
    by_df = sorted(oracle.df.items(), key=lambda kv: (kv[1], kv[0]))
    rare = by_df[0][0]
    mid = by_df[len(by_df) // 2][0]
    mega = by_df[-1][0]  # license-header term, df ≈ 0.6N
    return rare, mid, mega


QUERY_CASES = []


def _queries(oracle):
    rare, mid, mega = _pick_terms(oracle)
    return {
        "term_rare": TermQuery(rare),
        "term_mid": TermQuery(mid),
        "term_mega": TermQuery(mega),
        "bool_and": BooleanQuery(must=[TermQuery(mid), TermQuery(mega)]),
        "bool_or": BooleanQuery(should=[TermQuery(rare), TermQuery(mid), TermQuery(mega)]),
        "bool_and_not": BooleanQuery(must=[TermQuery(mega)], must_not=[TermQuery(mid)]),
        "req_opt": BooleanQuery(must=[TermQuery(mega)], should=[TermQuery(mid)]),
        "msm_2of3": BooleanQuery(
            should=[TermQuery(rare), TermQuery(mid), TermQuery(mega)], min_should_match=2
        ),
        "or_big": BooleanQuery(
            should=[TermQuery(t) for t, _ in sorted(oracle.df.items())[:8]]
        ),
    }


@pytest.mark.parametrize("k", [1, 10, 100])
@pytest.mark.parametrize("use_ray", [False, True])
def test_engine_matches_oracle(built, k, use_ray):
    d, _, oracle, _ = built
    searcher = Searcher(d)
    queries = _queries(oracle)
    got = searcher.search(queries, k=k, use_ray=use_ray, method="exhaustive")
    gp = got.to_pandas()
    for qid, q in queries.items():
        exp_ids, exp_scores = oracle.topk(q, k)
        sub = gp[gp.query_id == qid].sort_values("rank")
        assert sub.doc_id.tolist() == exp_ids.tolist(), f"{qid} doc ids"
        np.testing.assert_array_equal(
            sub.score.to_numpy().view(np.uint32),
            exp_scores.astype(np.float32).view(np.uint32),
            err_msg=f"{qid} float32 score bits",
        )


@pytest.mark.parametrize("k", [1, 10, 100])
def test_wand_rank_identical_to_exhaustive(built, k):
    d, _, oracle, _ = built
    searcher = Searcher(d)
    rare, mid, mega = _pick_terms(oracle)
    disjunctions = {
        "or3": BooleanQuery(should=[TermQuery(rare), TermQuery(mid), TermQuery(mega)]),
        "or8": BooleanQuery(
            should=[TermQuery(t) for t, _ in sorted(oracle.df.items(), key=lambda kv: -kv[1])[:8]]
        ),
        "or2_mega": BooleanQuery(should=[TermQuery(mega), TermQuery(mid)]),
    }
    ex = searcher.search(disjunctions, k=k, use_ray=False, method="exhaustive").to_pandas()
    wd = searcher.search(disjunctions, k=k, use_ray=False, method="wand").to_pandas()
    for qid in disjunctions:
        a = ex[ex.query_id == qid].sort_values("rank")
        b = wd[wd.query_id == qid].sort_values("rank")
        assert a.doc_id.tolist() == b.doc_id.tolist(), qid
        np.testing.assert_array_equal(
            a.score.to_numpy().view(np.uint32), b.score.to_numpy().view(np.uint32), err_msg=qid
        )


def test_wand_actually_prunes(built):
    from lucene_solr_ray.search.wand import build_lazy, wand_topk
    from lucene_solr_ray.index.reader import IndexReader

    d, _, oracle, _ = built
    searcher = Searcher(d)
    reader = IndexReader(d)
    rare, mid, mega = _pick_terms(oracle)
    q = BooleanQuery(should=[TermQuery(mega), TermQuery(mid)])
    weights = searcher._weights({mega, mid})
    seg = reader.segments[0]["seg"]
    tbl = reader.postings_for_terms([mega, mid])
    seg_tbl = tbl.filter(pa.compute.equal(tbl["seg"], seg))
    lazy = build_lazy(seg_tbl)
    norms = reader.segment_norms(seg)
    stats = {}
    wand_topk(q, searcher.sim, lazy, weights, searcher.cache, norms, 1, stats=stats)
    # with k=1 the threshold rises fast; some intervals must be skipped
    assert stats["intervals_visited"] <= stats["intervals_total"]
    assert stats["blocks_decoded"] <= stats["blocks_total"]


def test_matchall(built):
    d, res, oracle, _ = built
    searcher = Searcher(d)
    got = searcher.search({"all": MatchAllQuery()}, k=N_DOCS + 10, use_ray=False).to_pandas()
    assert len(got) == N_DOCS
    assert got.doc_id.tolist() == list(range(N_DOCS))  # tie on score → doc id asc


def test_pagination_semantics(built):
    # searchAfter analog: rows below the anchor rank equal a fresh search's tail
    d, _, oracle, _ = built
    searcher = Searcher(d)
    _, mid, mega = _pick_terms(oracle)
    q = BooleanQuery(should=[TermQuery(mid), TermQuery(mega)])
    full = searcher.search({"q": q}, k=50, use_ray=False).to_pandas()
    page1 = full.iloc[:10]
    page2_expected = full.iloc[10:20]
    assert len(page1) == 10
    assert page2_expected["rank"].tolist() == list(range(10, 20))


@pytest.mark.parametrize("use_ray", [False, True])
def test_phrase_matches_oracle(built, use_ray):
    from lucene_solr_ray.search.query import PhraseQuery

    d, _, oracle, _ = built
    searcher = Searcher(d)
    queries = {
        "ph_header": parse_query('"licensed to the apache"'),  # stopword gap preserved
        "ph3": parse_query('"apache software foundation"'),
        "ph_wrong_order": PhraseQuery(("software", "apache"), (0, 1)),
        "ph_single_hit": parse_query('"compliance with the license"'),
    }
    got = searcher.search(queries, k=20, use_ray=use_ray).to_pandas()
    for qid, q in queries.items():
        exp_ids, exp_scores = oracle.topk(q, 20)
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub.doc_id.tolist() == exp_ids.tolist(), qid
        np.testing.assert_array_equal(
            sub.score.to_numpy().view(np.uint32),
            exp_scores.astype(np.float32).view(np.uint32),
            err_msg=qid,
        )
    # the header phrase must actually match (60% of docs carry the header)
    assert (got.query_id == "ph_header").sum() == 20


def test_phrase_in_boolean(built):
    from lucene_solr_ray.search.query import PhraseQuery

    d, _, oracle, _ = built
    searcher = Searcher(d)
    rare, mid, mega = _pick_terms(oracle)
    q = BooleanQuery(
        must=[PhraseQuery(("apache", "software"), (0, 1))],
        must_not=[TermQuery(mid)],
    )
    got = searcher.search({"q": q}, k=10, use_ray=False).to_pandas()
    exp_ids, exp_scores = oracle.topk(q, 10)
    assert got.doc_id.tolist() == exp_ids.tolist()


@pytest.mark.parametrize("use_ray", [False, True])
def test_multiterm_synonym_dismax_match_oracle(built, use_ray):
    from lucene_solr_ray.search.query import (
        BoostQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        FuzzyQuery,
        PrefixQuery,
        RegexpQuery,
        SynonymQuery,
        TermInSetQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    d, _, oracle, _ = built
    searcher = Searcher(d)
    rare, mid, mega = _pick_terms(oracle)
    some = sorted(oracle.df)[:3]
    queries = {
        "prefix": PrefixQuery("lic"),
        "prefix_boost": PrefixQuery("apa", boost=2.5),
        "wildcard": WildcardQuery("lic*se"),
        "wildcard_q": WildcardQuery("apach?"),
        "regexp": RegexpQuery("fo.nda.*"),
        "range": TermRangeQuery("a", "c", include_upper=False),
        "fuzzy1": FuzzyQuery("licanse", max_edits=2),
        "inset": TermInSetQuery((rare, mid, "zz_missing")),
        "synonym": SynonymQuery((rare, mid)),
        "synonym_mega": SynonymQuery((mid, mega)),
        "dismax": DisjunctionMaxQuery((TermQuery(mid), TermQuery(mega)), tie_breaker=0.3),
        "dismax0": DisjunctionMaxQuery((TermQuery(rare), TermQuery(mid))),
        "constant": ConstantScoreQuery(TermQuery(mega), boost=1.5),
        "boosted_bool": BoostQuery(BooleanQuery(should=[TermQuery(rare), TermQuery(mid)]), 3.0),
        "mt_in_bool": BooleanQuery(must=[PrefixQuery("apa"), TermQuery(mega)]),
    }
    got = searcher.search(queries, k=50, use_ray=use_ray).to_pandas()
    for qid, q in queries.items():
        exp_ids, exp_scores = oracle.topk(q, 50)
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub.doc_id.tolist() == exp_ids.tolist(), qid
        np.testing.assert_array_equal(
            sub.score.to_numpy().view(np.uint32),
            exp_scores.astype(np.float32).view(np.uint32),
            err_msg=qid,
        )
    assert (got.query_id == "prefix").sum() > 0  # license terms exist
    assert (got.query_id == "fuzzy1").sum() > 0  # 'license' within 2 edits


def test_expansion_cap(built):
    from lucene_solr_ray.search.query import WildcardQuery
    from lucene_solr_ray.index.reader import IndexReader

    d, _, _, _ = built
    r = IndexReader(d)
    r2 = IndexReader(d)
    r2.MAX_EXPANSIONS = 3
    with pytest.raises(ValueError, match="expands to"):
        r2.expand_terms(WildcardQuery("*"))
    assert len(r.expand_terms(WildcardQuery("lic*"))) >= 1


@pytest.mark.parametrize("use_ray", [False, True])
def test_search_after_pagination(built, use_ray):
    d, _, oracle, _ = built
    searcher = Searcher(d)
    _, mid, mega = _pick_terms(oracle)
    q = BooleanQuery(should=[TermQuery(mid), TermQuery(mega)])
    full = searcher.search({"q": q}, k=60, use_ray=use_ray).to_pandas()
    page1 = searcher.search({"q": q}, k=20, use_ray=use_ray).to_pandas()
    anchor = (float(page1.iloc[-1].score), int(page1.iloc[-1].doc_id))
    page2 = searcher.search({"q": q}, k=20, use_ray=use_ray, after=anchor).to_pandas()
    # page1 + page2 == first 40 of the full list
    got = page1.doc_id.tolist() + page2.doc_id.tolist()
    assert got == full.doc_id.tolist()[:40]


def test_search_by_field_and_facets(built):
    d, _, oracle, tbl = built
    searcher = Searcher(d)
    _, mid, mega = _pick_terms(oracle)
    q = TermQuery(mega)

    res = searcher.search_by_field(q, k=10, field="path")
    paths = res["path"].to_pylist()
    assert paths == sorted(paths) and len(paths) == 10
    res_d = searcher.search_by_field(q, k=10, field="path", descending=True)
    paths_d = res_d["path"].to_pylist()
    assert paths_d == sorted(paths_d, reverse=True)

    # facets vs brute force: count matches per lang
    fc = searcher.facet_counts(q, field="lang").to_pandas()
    exp_ids, _ = oracle.topk(q, oracle.n)
    # rebuild doc_id -> lang via the oracle's key order
    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    langs = tbl["lang"].to_pylist()
    from collections import Counter

    exp = Counter(langs[order[d0]] for d0 in exp_ids)
    got = dict(zip(fc.value, fc["count"]))
    assert got == dict(exp)


def test_explain(built):
    d, _, oracle, _ = built
    searcher = Searcher(d)
    _, mid, _ = _pick_terms(oracle)
    top = searcher.search({"q": TermQuery(mid)}, k=1, use_ray=False).to_pandas()
    ex = searcher.explain(TermQuery(mid), int(top.iloc[0].doc_id))
    assert ex["match"] and abs(ex["value"] - float(top.iloc[0].score)) < 1e-6
    ex2 = searcher.explain(TermQuery("zzz_notaterm"), 0)
    assert not ex2["match"]


def test_parser():
    q = parse_query("Foo AND bar")
    assert isinstance(q, BooleanQuery) and len(q.must) == 2
    assert TermQuery("foo") in q.must
    q2 = parse_query("foo bar baz")
    assert isinstance(q2, BooleanQuery) and len(q2.should) == 3
    q3 = parse_query("foo OR bar")
    assert len(q3.should) == 2
    q4 = parse_query("foo AND NOT bar")
    assert len(q4.must) == 1 and len(q4.must_not) == 1
    q5 = parse_query("+foo -bar baz")
    assert len(q5.must) == 1 and len(q5.must_not) == 1 and len(q5.should) == 1
    q6 = parse_query("(foo OR bar) AND baz")
    assert len(q6.must) == 2
    q7 = parse_query("the")  # pure stopword → matches nothing
    assert isinstance(q7, BooleanQuery) and not q7.must and not q7.should
    from lucene_solr_ray.search.query import PhraseQuery

    q8 = parse_query('"the quick and the dead"')
    assert isinstance(q8, PhraseQuery)
    assert q8.terms == ("quick", "dead") and q8.rel_positions == (0, 3)
    q9 = parse_query('"quick"')  # single analyzed term → plain TermQuery
    assert q9 == TermQuery("quick")


@pytest.mark.parametrize("use_ray", [False, True])
def test_numeric_range_matches_bruteforce(built, use_ray):
    """NumericRangeQuery (PointRangeQuery analog) over the field_len docs
    column: pure ranges (constant score, doc-order top-k) and a MUST
    combination with a scored term — both verified against a brute-force
    scan of the docs files."""
    import pyarrow.dataset as pads

    from lucene_solr_ray.search.query import NumericRangeQuery

    d, _, oracle, _ = built
    searcher = Searcher(d)
    docs = pads.dataset(searcher.reader.docs_files()).to_table(
        columns=["doc_id", "field_len"]
    )
    flen = dict(zip(docs["doc_id"].to_pylist(), docs["field_len"].to_pylist()))
    lo, hi = 20, 60
    exp_ids = sorted(i for i, fl in flen.items() if lo <= fl <= hi)

    q = NumericRangeQuery("field_len", lower=lo, upper=hi)
    got = searcher.search({"r": q}, k=15, use_ray=use_ray).to_pandas()
    assert got.doc_id.tolist() == exp_ids[:15]
    assert (got.score == 1.0).all()

    # exclusive bounds
    q2 = NumericRangeQuery("field_len", lower=lo, upper=hi,
                           include_lower=False, include_upper=False)
    exp2 = sorted(i for i, fl in flen.items() if lo < fl < hi)
    got2 = searcher.search({"r": q2}, k=10**6, use_ray=use_ray).to_pandas()
    assert got2.doc_id.tolist() == exp2

    # MUST term + range filter: same ranking as the term alone, restricted
    _, mid, _ = _pick_terms(oracle)
    comb = BooleanQuery(must=[TermQuery(mid), q])
    got3 = searcher.search({"c": comb}, k=50, use_ray=use_ray).to_pandas()
    term_only = searcher.search({"t": TermQuery(mid)}, k=10**6, use_ray=use_ray).to_pandas()
    exp3 = [int(r.doc_id) for r in term_only.itertuples()
            if lo <= flen[int(r.doc_id)] <= hi][:50]
    assert got3.doc_id.tolist() == exp3


def test_join_query(built):
    """JoinUtil.createJoinQuery (ScoreMode.None) vs brute force: docs whose
    lang appears among the from-side matches."""
    d, _, oracle, tbl = built
    searcher = Searcher(d)
    _, mid, _ = _pick_terms(oracle)
    jq = searcher.join_query(TermQuery(mid), "lang", "lang")
    res = searcher.search({"q": jq}, k=N_DOCS + 10, use_ray=False).to_pandas()
    # brute force through the oracle key order
    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    langs = [tbl["lang"].to_pylist()[order[d0]] for d0 in range(len(keys))]
    from_ids, _ = oracle.topk(TermQuery(mid), oracle.n)
    want_langs = {langs[d0] for d0 in from_ids}
    exp = sorted(d0 for d0 in range(oracle.n) if langs[d0] in want_langs)
    assert sorted(res.doc_id) == exp
    assert (res.score == 1.0).all()


def test_common_terms_query(built):
    """CommonTermsQuery rewrite vs the equivalent explicit BooleanQuery
    (CommonTermsQuery.java:148-209): df-split at ceil(maxtf·maxDoc), MUST(low
    group) + SHOULD(high group), high group promoted to conjunction when no
    low terms remain."""
    import math

    from lucene_solr_ray.search.query import CommonTermsQuery, rewrite

    d, _, oracle, tbl = built
    searcher = Searcher(d)
    rare, mid, mega = _pick_terms(oracle)
    # pick maxtf so mid/rare are low and mega is high
    frac = (oracle.df[mid] + oracle.df[mega]) / 2 / oracle.n
    q = CommonTermsQuery(terms=(rare, mid, mega), max_term_frequency=frac)
    explicit = BooleanQuery(
        must=[BooleanQuery(should=[TermQuery(rare), TermQuery(mid)])],
        should=[BooleanQuery(should=[TermQuery(mega)])],
    )
    got = searcher.search({"q": q}, k=200, use_ray=False).to_pandas()
    exp = searcher.search({"q": explicit}, k=200, use_ray=False).to_pandas()
    assert got.doc_id.tolist() == exp.doc_id.tolist()
    assert np.array_equal(got.score.to_numpy(), exp.score.to_numpy())

    # low=MUST variant
    q2 = CommonTermsQuery(terms=(mid, mega), max_term_frequency=frac,
                          low_freq_occur="must")
    exp2 = searcher.search(
        {"q": BooleanQuery(must=[BooleanQuery(must=[TermQuery(mid)])],
                           should=[BooleanQuery(should=[TermQuery(mega)])])},
        k=200, use_ray=False).to_pandas()
    got2 = searcher.search({"q": q2}, k=200, use_ray=False).to_pandas()
    assert got2.doc_id.tolist() == exp2.doc_id.tolist()

    # all terms high → high group promoted to MUST (conjunction)
    by_df = sorted(oracle.df.items(), key=lambda kv: kv[1])
    t1, t2 = by_df[-1][0], by_df[-2][0]
    q3 = CommonTermsQuery(terms=(t1, t2), max_term_frequency=0.01)
    r3 = rewrite(q3, searcher.reader)
    got3 = searcher.search({"q": q3}, k=N_DOCS, use_ray=False).to_pandas()
    exp3 = searcher.search(
        {"q": BooleanQuery(must=[TermQuery(t1), TermQuery(t2)])},
        k=N_DOCS, use_ray=False).to_pandas()
    assert set(got3.doc_id) == set(exp3.doc_id)

    # fractional minimum-should-match rounds like Math.round (:141-146)
    from lucene_solr_ray.search.query import _ctq_min_should_match

    assert _ctq_min_should_match(0.5, 3) == 2  # floor(1.5 + .5)
    assert _ctq_min_should_match(0.0, 5) == 0
    assert _ctq_min_should_match(2.0, 5) == 2

    # zero-df terms land in the low group (termContext null, :154-155)
    q4 = CommonTermsQuery(terms=("zzqqxx_missing", mega), max_term_frequency=frac,
                          low_freq_occur="must")
    got4 = searcher.search({"q": q4}, k=10, use_ray=False).to_pandas()
    assert len(got4) == 0


def test_facet_hierarchy_and_sampled(built):
    """Taxonomy rollup + deterministic sampled facets vs brute force."""
    import hashlib
    from collections import Counter

    d, _, oracle, tbl = built
    searcher = Searcher(d)
    # use the mega (license-header) term: the sampling assertion below needs
    # a query with many matches, and the median-df term can match 1 doc
    _, _, mid = _pick_terms(oracle)
    # brute force: field values in doc-id (sorted key) order
    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    repo = [tbl["repo"].to_pylist()[i] for i in order]
    lang = [tbl["lang"].to_pylist()[i] for i in order]
    ids, _ = oracle.topk(TermQuery(mid), oracle.n)

    got = searcher.facet_hierarchy(TermQuery(mid), ("repo", "lang"), use_ray=False).to_pandas()
    l2 = Counter((repo[i], lang[i]) for i in ids)
    l1 = Counter(repo[i] for i in ids)
    exp_rows = sorted(((1, v, c) for v, c in l1.items()), key=lambda r: (-r[2], r[1]))
    exp_rows += sorted(((2, f"{a}/{b}", c) for (a, b), c in l2.items()), key=lambda r: (-r[2], r[1]))
    assert [tuple(r) for r in got.itertuples(index=False)] == exp_rows

    rate = 40
    got_s = searcher.facet_counts_sampled(TermQuery(mid), field="repo",
                                          rate_pct=rate, use_ray=False).to_pandas()
    sampled = [i for i in ids
               if int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100 < rate]
    exp_s = Counter(repo[i] for i in sampled)
    assert dict(zip(got_s.value, got_s["count"])) == dict(exp_s)
    # sampling actually subsampled (with ~hundreds of matches this is robust)
    total = sum(exp_s.values())
    assert 0 < total < len(ids)


@pytest.mark.parametrize("use_ray", [False, True])
def test_function_score_query(built, use_ray):
    """FunctionScoreQuery.boostByValue: score = (float)((inner · value) · boost)."""
    import math

    from lucene_solr_ray.search.query import FunctionScoreQuery

    d, _, oracle, tbl = built
    searcher = Searcher(d)
    _, mid, _ = _pick_terms(oracle)
    base = searcher.search({"q": TermQuery(mid)}, k=10**6, use_ray=use_ray).to_pandas()
    fq = FunctionScoreQuery(TermQuery(mid), field="field_len", transform="log1p", boost=2.0)
    got = searcher.search({"q": fq}, k=10**6, use_ray=use_ray).to_pandas()
    assert set(got.doc_id) == set(base.doc_id)
    flen = {int(r.doc_id): oracle.field_len[int(r.doc_id)] for r in base.itertuples()}
    bscore = {int(r.doc_id): np.float64(r.score) for r in base.itertuples()}
    for row in got.itertuples():
        d0 = int(row.doc_id)
        exp = np.float32((bscore[d0] * math.log(1.0 + float(flen[d0]))) * np.float64(2.0))
        assert np.float32(row.score) == exp, (d0, row.score, exp)

    # identity transform: score = inner · field_len
    fq2 = FunctionScoreQuery(TermQuery(mid), field="field_len")
    got2 = searcher.search({"q": fq2}, k=20, use_ray=use_ray).to_pandas()
    for row in got2.itertuples():
        d0 = int(row.doc_id)
        exp = np.float32((bscore[d0] * np.float64(flen[d0])) * np.float64(1.0))
        assert np.float32(row.score) == exp


def test_facet_range(built):
    """Solr facet.range analog: before/buckets/after vs brute force."""
    from collections import Counter

    d, _, oracle, tbl = built
    searcher = Searcher(d)
    _, _, mega = _pick_terms(oracle)
    ids, _ = oracle.topk(TermQuery(mega), oracle.n)
    flens = oracle.field_len  # doc-id order
    start, end, gap = 10, 50, 10
    for use_ray in (False, True):
        got = searcher.facet_range(TermQuery(mega), "field_len", start, end, gap,
                                   use_ray=use_ray).to_pandas()
        vals = [int(flens[i]) for i in ids]
        exp = {"before": sum(v < start for v in vals), "after": sum(v >= end for v in vals)}
        for lo in range(start, end, gap):
            exp[str(lo)] = sum(lo <= v < lo + gap for v in vals)
        assert dict(zip(got.bucket, got["count"])) == exp
        # ordering: before, ascending bucket starts, after
        assert got.bucket.tolist() == ["before"] + [str(x) for x in range(start, end, gap)] + ["after"]


def test_search_grouped_two_pass_vs_brute(built):
    """Grouped top-k: the scattered two-pass path must equal the brute-force
    driver grouping (and both must respect group/doc ordering rules)."""
    d, _, oracle, tbl = built
    searcher = Searcher(d)
    _, _, mega = _pick_terms(oracle)
    q = TermQuery(mega)
    brute = searcher.search_grouped(q, "repo", n_groups=4, docs_per_group=2,
                                    use_ray=False).to_pandas()
    dist = searcher.search_grouped(q, "repo", n_groups=4, docs_per_group=2,
                                   use_ray=True).to_pandas()
    assert brute[["group", "group_rank", "rank", "doc_id"]].values.tolist() == \
        dist[["group", "group_rank", "rank", "doc_id"]].values.tolist()
    np.testing.assert_allclose(brute.score.to_numpy(), dist.score.to_numpy(), rtol=1e-6)
    # group ordering: best scores non-increasing
    firsts = dist[dist["rank"] == 0].sort_values("group_rank")
    assert (np.diff(firsts.score.to_numpy()) <= 1e-12).all()


def test_search_grouped_local_matchall(built):
    """MatchAll grouping: the serial per-segment local path (use_ray=False,
    no posting pairs → schema-empty postings per segment) must equal the
    scattered two-pass path — pins the r5 removal of the full-corpus
    driver-side fallback."""
    from lucene_solr_ray.search.query import MatchAllQuery

    d, _, _oracle, _tbl = built
    searcher = Searcher(d)
    q = MatchAllQuery()
    local = searcher.search_grouped(q, "repo", n_groups=4, docs_per_group=2,
                                    use_ray=False).to_pandas()
    dist = searcher.search_grouped(q, "repo", n_groups=4, docs_per_group=2,
                                   use_ray=True).to_pandas()
    assert local[["group", "group_rank", "rank", "doc_id"]].values.tolist() == \
        dist[["group", "group_rank", "rank", "doc_id"]].values.tolist()
    np.testing.assert_allclose(local.score.to_numpy(), dist.score.to_numpy(), rtol=1e-6)


def test_search_grouped_legacy_groupby_matchall_escape(built, monkeypatch):
    """Under the legacy LSR_SCORE_SCATTER=groupby path, a MatchAll grouping
    query is non-routable (the groupby scatter can't see postings-less
    segments) — the escape must fall back to the serial per-segment twin and
    still produce the scattered-path result."""
    from lucene_solr_ray.search.query import MatchAllQuery

    d, _, _oracle, _tbl = built
    searcher = Searcher(d)
    q = MatchAllQuery()
    dist = searcher.search_grouped(q, "repo", n_groups=3, docs_per_group=2,
                                   use_ray=True).to_pandas()
    monkeypatch.setenv("LSR_SCORE_SCATTER", "groupby")
    legacy = Searcher(d).search_grouped(q, "repo", n_groups=3, docs_per_group=2,
                                        use_ray=True).to_pandas()
    assert legacy[["group", "group_rank", "rank", "doc_id"]].values.tolist() == \
        dist[["group", "group_rank", "rank", "doc_id"]].values.tolist()


def test_blended_term_query(built):
    """BlendedTermQuery: blended idf = min over the set; boolean rewrite sums
    per-term scores; dismax rewrite = max + tie*(sum-max)."""
    from lucene_solr_ray.search.query import BlendedTermQuery, TermQuery

    d, _res, _oracle, _tbl = built
    s = Searcher(d)
    b = s.search({"q": BlendedTermQuery(("license", "apache"))}, k=400, use_ray=False)
    d = s.search({"q": BlendedTermQuery(("license", "apache"), rewrite="dismax",
                                        tie_breaker=0.0)}, k=400, use_ray=False)
    # dismax(tie=0) <= boolean sum everywhere, same match set
    assert set(b["doc_id"].to_pylist()) == set(d["doc_id"].to_pylist())
    bm = dict(zip(b["doc_id"].to_pylist(), b["score"].to_pylist()))
    dm = dict(zip(d["doc_id"].to_pylist(), d["score"].to_pylist()))
    assert all(dm[k] <= bm[k] + 1e-6 for k in dm)
    # a doc matching only the max-df term scores LOWER under blending than
    # under its solo TermQuery iff the other term is rarer... sanity: blended
    # single-term-doc score uses min idf of the set
    solo = s.search({"q": TermQuery("license")}, k=400, use_ray=False)
    assert solo.num_rows > 0
