"""Rescore / StatsComponent / DrillSideways vs brute-force oracles on the
fixture corpus (FIXTURES.md §6 spirit)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import BooleanQuery, Searcher, TermQuery

from oracle import BruteForceIndex

N_DOCS = 300


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(N_DOCS)
    d = str(tmp_path_factory.mktemp("cmp_index"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=100,
                store_content=True)
    return d, BruteForceIndex(tbl), tbl


def _two_terms(oracle):
    by_df = sorted(oracle.df.items(), key=lambda kv: (kv[1], kv[0]))
    return by_df[len(by_df) // 2][0], by_df[-1][0]


def test_rescore_matches_manual_combination(built):
    d, oracle, _ = built
    s = Searcher(d, dtype=np.float64)
    a, b = _two_terms(oracle)
    first_k, k, w = 30, 10, 2.0

    res = s.rescore(TermQuery(a), TermQuery(b), first_k=first_k, k=k, weight=w)

    first = s.search(TermQuery(a), k=first_k, use_ray=False)
    fids = first["doc_id"].to_numpy()
    fsc = first["score"].to_numpy()
    second = s.search(TermQuery(b), k=oracle.n, use_ray=False)
    smap = dict(zip(second["doc_id"].to_pylist(), second["score"].to_pylist()))
    comb = fsc + w * np.array([smap.get(int(i), 0.0) for i in fids])
    order = np.lexsort((fids, -comb))[:k]
    assert res["doc_id"].to_pylist() == fids[order].tolist()
    assert res["score"].to_pylist() == comb[order].tolist()

    # weight=0 → first-pass order unchanged
    r0 = s.rescore(TermQuery(a), TermQuery(b), first_k=first_k, k=k, weight=0.0)
    assert r0["doc_id"].to_pylist() == first["doc_id"].to_pylist()[:k]

    # no first-pass hits → empty result
    r_none = s.rescore(TermQuery("zzz_does_not_exist"), TermQuery(b), k=k)
    assert r_none.num_rows == 0


@pytest.mark.parametrize("use_ray", [True, False])
def test_field_stats_vs_numpy(built, use_ray):
    d, oracle, _ = built
    s = Searcher(d)
    _, mega = _two_terms(oracle)
    st = s.field_stats(TermQuery(mega), field="field_len", use_ray=use_ray)

    ids, _ = oracle.topk(TermQuery(mega), oracle.n)
    lens = np.asarray([oracle.field_len[i] for i in ids], dtype=np.int64)
    assert st["count"][0].as_py() == len(lens)
    assert st["min"][0].as_py() == int(lens.min())
    assert st["max"][0].as_py() == int(lens.max())
    assert st["sum"][0].as_py() == int(lens.sum())
    assert st["mean"][0].as_py() == pytest.approx(lens.mean())
    n, sm, sq = float(len(lens)), float(lens.sum()), float((lens * lens).sum())
    assert st["stddev"][0].as_py() == pytest.approx(
        np.sqrt((n * sq - sm * sm) / (n * (n - 1.0)))
    )


def test_field_stats_no_matches(built):
    d, _, _ = built
    s = Searcher(d)
    st = s.field_stats(TermQuery("zzz_does_not_exist"), field="field_len")
    assert st["count"][0].as_py() == 0
    assert st["mean"][0].as_py() is None


@pytest.mark.parametrize("use_ray", [True, False])
def test_drill_sideways_vs_counter(built, use_ray):
    from collections import Counter

    d, oracle, tbl = built
    s = Searcher(d)
    _, mega = _two_terms(oracle)

    # doc order: (repo, path, commit) sort of the corpus keys
    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    repos = [tbl["repo"].to_pylist()[i] for i in order]
    langs = [tbl["lang"].to_pylist()[i] for i in order]

    base_ids, _ = oracle.topk(TermQuery(mega), oracle.n)
    base_set = set(int(i) for i in base_ids)
    r_val = repos[next(iter(sorted(base_set)))]
    l_val = langs[next(iter(sorted(base_set)))]

    res = s.drill_sideways(TermQuery(mega), {"repo": r_val, "lang": l_val},
                           use_ray=use_ray).to_pandas()

    exp_lang = Counter(langs[i] for i in base_set if repos[i] == r_val)
    exp_repo = Counter(repos[i] for i in base_set if langs[i] == l_val)
    got_lang = dict(zip(res[res.dim == "lang"].value, res[res.dim == "lang"]["count"]))
    got_repo = dict(zip(res[res.dim == "repo"].value, res[res.dim == "repo"]["count"]))
    assert got_lang == dict(exp_lang)
    assert got_repo == dict(exp_repo)


@pytest.mark.parametrize("use_ray", [True, False])
def test_join_scored_vs_brute(built, use_ray):
    """JoinUtil ScoreMode.Max/Total/Avg vs a brute-force recompute: from-doc
    BM25 scores aggregated per lang value; every doc with that lang scores
    the aggregate; top-k (score desc, doc_id asc)."""
    d, oracle, tbl = built
    s = Searcher(d, dtype=np.float64)
    _, mega = _two_terms(oracle)
    k = 10

    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    langs = [tbl["lang"].to_pylist()[i] for i in order]

    full = s.search(TermQuery(mega), k=oracle.n, use_ray=False)
    fids = full["doc_id"].to_pylist()
    fsc = full["score"].to_pylist()

    for mode, combine in (
        ("max", lambda xs: max(xs)),
        ("total", lambda xs: float(np.sum(np.asarray(xs, dtype=np.float64)))),
        ("avg", lambda xs: float(np.sum(np.asarray(xs, dtype=np.float64))) / len(xs)),
    ):
        per_val: dict[str, list] = {}
        for i, sc in zip(fids, fsc):
            per_val.setdefault(langs[i], []).append(sc)
        vscore = {v: combine(xs) for v, xs in per_val.items()}
        exp = sorted(
            ((vscore[langs[i]], i) for i in range(oracle.n) if langs[i] in vscore),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        res = s.join_query_scored(
            TermQuery(mega), from_field="lang", to_field="lang",
            score_mode=mode, k=k, use_ray=use_ray,
        )
        assert res["doc_id"].to_pylist() == [i for _, i in exp], mode
        if mode == "max":  # order-free aggregate: scores are bit-exact
            assert res["score"].to_pylist() == [sc for sc, _ in exp]
        else:
            np.testing.assert_allclose(
                res["score"].to_numpy(), [sc for sc, _ in exp], rtol=1e-12
            )


def test_join_scored_no_matches(built):
    d, _, _ = built
    s = Searcher(d)
    res = s.join_query_scored(TermQuery("zzz_does_not_exist"), "lang", "lang")
    assert res.num_rows == 0


@pytest.mark.parametrize("use_ray", [True, False])
def test_filter_clause_semantics(built, use_ray):
    """Occur.FILTER: same doc set as MUST, zero score contribution."""
    d, oracle, _ = built
    s = Searcher(d)
    mid, mega = _two_terms(oracle)

    fq = BooleanQuery(must=[TermQuery(mid)], filter=[TermQuery(mega)])
    res = s.search(fq, k=oracle.n, use_ray=use_ray)

    both = s.search(BooleanQuery(must=[TermQuery(mid), TermQuery(mega)]),
                    k=oracle.n, use_ray=False)
    only = s.search(TermQuery(mid), k=oracle.n, use_ray=False)
    omap = dict(zip(only["doc_id"].to_pylist(), only["score"].to_pylist()))
    # same matches as MUST-both...
    assert set(res["doc_id"].to_pylist()) == set(both["doc_id"].to_pylist())
    # ...but scored by the MUST clause alone
    for did, sc in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        assert sc == omap[did]

    # pure filter: constant 0 scores, doc-id order
    pf = s.search(BooleanQuery(filter=[TermQuery(mega)]), k=10, use_ray=use_ray)
    assert set(pf["score"].to_pylist()) == {0.0}
    ids = pf["doc_id"].to_pylist()
    assert ids == sorted(ids)


def test_phrase_prefix_vs_positions_oracle(built):
    """match_phrase_prefix: docs where `a` is immediately followed by any
    dictionary term starting with the prefix — checked against the
    brute-force position lists."""
    from lucene_solr_ray.search.query import PhrasePrefixQuery

    d, oracle, _ = built
    s = Searcher(d)
    # pick a bigram that actually occurs: first term + prefix of its successor
    mid = pre = None
    for doc in range(oracle.n):
        inv = {}
        for t, ps in oracle.pos[doc].items():
            for p in ps:
                inv[p] = t
        for p, t in sorted(inv.items()):
            if p + 1 in inv:
                mid, pre = t, inv[p + 1][:2]
                break
        if mid:
            break
    assert mid is not None

    q = PhrasePrefixQuery((mid,), pre)
    got = set()
    for _seg, base, ids in s._matches_per_segment(q):
        got.update((ids + base).tolist())

    exp = set()
    for doc in range(oracle.n):
        pos_a = oracle.pos[doc].get(mid, [])
        nxt = {p + 1 for p in pos_a}
        for t, ps in oracle.pos[doc].items():
            if t.startswith(pre) and nxt.intersection(ps):
                exp.add(doc)
                break
    assert got == exp and exp  # non-trivial match set

    # no expansion → no matches
    q0 = PhrasePrefixQuery((mid,), "zzzz_nothing")
    assert all(len(ids) == 0 for _s, _b, ids in s._matches_per_segment(q0))


def test_phrase_prefix_respects_max_expansions(built):
    from lucene_solr_ray.search.query import PhrasePrefixQuery, MultiPhraseQuery
    from lucene_solr_ray.search.query import rewrite

    d, oracle, _ = built
    s = Searcher(d)
    r = rewrite(PhrasePrefixQuery(("the",), "a", max_expansions=3), s.reader)
    assert isinstance(r, MultiPhraseQuery)
    assert len(r.terms[-1]) <= 3
    # expansions come in dictionary order
    assert list(r.terms[-1]) == sorted(r.terms[-1])


def test_classify_naive_bayes_vs_brute(built):
    """SimpleNaiveBayesClassifier vs an in-test recompute from the oracle's
    token lists (priors + add-1 likelihoods, reference denominator)."""
    import math

    from lucene_solr_ray.search.classify import classify_naive_bayes

    d, oracle, tbl = built
    s = Searcher(d)
    res = classify_naive_bayes(s, sample_max=40, class_field="lang")

    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    langs = [tbl["lang"].to_pylist()[i] for i in order]

    classes = sorted(set(langs))
    n = oracle.n
    df_c = {c: langs.count(c) for c in classes}
    sum_df = sum(len(tf) for tf in oracle.tf)  # distinct (doc, term) pairs
    avg_u = sum_df / n
    co: dict = {}
    for doc in range(n):
        for t in oracle.tf[doc]:
            co[(t, langs[doc])] = co.get((t, langs[doc]), 0) + 1

    exp = {}
    for doc in range(40):
        if not oracle.tf[doc]:
            continue
        best_c, best_s = None, None
        for c in classes:
            den = avg_u * df_c[c] + n
            sc = math.log(df_c[c]) - math.log(n)
            for t, tf in oracle.tf[doc].items():
                sc += tf * math.log((co.get((t, c), 0) + 1) / den)
            if best_s is None or sc > best_s:
                best_c, best_s = c, sc
        exp[doc] = best_c

    got = dict(zip(res["doc_id"].to_pylist(), res["assigned"].to_pylist()))
    assert got == exp


def test_classify_knn_vote(built):
    """KNN classifier: assignment equals the majority lang of the MLT top-k
    neighbors (count desc, summed score desc, lang asc)."""
    from collections import Counter

    from lucene_solr_ray.search.classify import classify_knn
    from lucene_solr_ray.search.mlt import mlt_query

    d, oracle, tbl = built
    s = Searcher(d)
    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    langs = [tbl["lang"].to_pylist()[i] for i in order]

    doc_ids = [0, 5, 17]
    res = classify_knn(s, doc_ids, k=7, class_field="lang")
    got = dict(zip(res["doc_id"].to_pylist(), res["assigned"].to_pylist()))
    for did in doc_ids:
        q = mlt_query(s, did)
        if not q.should:
            assert did not in got
            continue
        r = s.search({"q": q}, k=8, use_ray=False)
        ids = [i for i in r["doc_id"].to_pylist() if i != did][:7]
        smap = dict(zip(r["doc_id"].to_pylist(), r["score"].to_pylist()))
        counts = Counter(langs[i] for i in ids)
        ssum: dict = {}
        for i in ids:
            ssum[langs[i]] = ssum.get(langs[i], 0.0) + float(smap[i])
        exp = sorted(counts, key=lambda c: (-counts[c], -ssum[c], c))[0]
        assert got[did] == exp


# ---------------------------------------------------------------------------
# ToParentBlockJoinQuery (lucene/join ToParentBlockJoinQuery.java)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bj_built(ray_session, tmp_path_factory):
    """Parent/child block corpus: one synthetic parent row per repo whose
    path sorts after every child path — the addDocuments(block) 'parent
    last' contract under the engine's (repo, path, commit) doc-id sort."""
    tbl = generate_corpus(200)
    repos = sorted(set(tbl["repo"].to_pylist()))
    parents = pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(["zzz/parent"] * len(repos), pa.string()),
        "commit": pa.array(["f" * 40] * len(repos), pa.string()),
        "lang": pa.array(["parent"] * len(repos), pa.string()),
        "content": pa.array(["blockparent sentinel"] * len(repos), pa.large_string()),
    }).cast(tbl.schema)
    d = str(tmp_path_factory.mktemp("bj_index"))
    build_index(ray.data.from_arrow(pa.concat_tables([tbl, parents])), d,
                docs_per_segment=60)
    return d, tbl


def test_block_join_modes_vs_driver_reference(bj_built):
    import pyarrow.dataset as pads

    d, tbl = bj_built
    s = Searcher(d, dtype=np.float64)
    ptbl = pads.dataset(s.reader.docs_files()).to_table(
        columns=["doc_id"], filter=pads.field("lang") == "parent")
    parents = np.sort(ptbl["doc_id"].to_numpy().astype(np.int64))
    assert len(parents) == len(set(tbl["repo"].to_pylist()))

    _, term = _two_terms(BruteForceIndex(tbl))
    q = TermQuery(term)
    hits = s.search(q, k=1_000_000, use_ray=False)
    ids = hits["doc_id"].to_numpy().astype(np.int64)
    scores = hits["score"].to_numpy().astype(np.float64)
    # child → next parent in doc order (parentBits.nextSetBit analog)
    pos = np.searchsorted(parents, ids, side="left")
    keep = (pos < len(parents)) & ~np.isin(ids, parents)
    pgid, sc = parents[pos[keep]], scores[keep]
    u = np.unique(pgid)
    ref = {}
    for p in u:
        m = sc[pgid == p]
        ref[int(p)] = (m.max(), m.sum(), m.sum() / len(m), len(m))

    for mode, idx in [("max", 0), ("total", 1), ("avg", 2), ("none", None)]:
        res = s.block_join(q, parents, score_mode=mode, k=len(u) + 5)
        assert len(res) == len(u)
        got = dict(zip(res["parent_id"].to_pylist(), res["score"].to_pylist()))
        ns = dict(zip(res["parent_id"].to_pylist(), res["n_children"].to_pylist()))
        for p in u:
            assert ns[int(p)] == ref[int(p)][3]
            exp = 0.0 if idx is None else ref[int(p)][idx]
            assert got[int(p)] == pytest.approx(exp, rel=1e-12)
        # ranking: score desc, parent asc ('none' → doc order)
        pairs = list(zip(res["score"].to_pylist(), res["parent_id"].to_pylist()))
        assert pairs == sorted(pairs, key=lambda t: (-t[0], t[1]))


# ---------------------------------------------------------------------------
# CoveringQuery (sandbox/search/CoveringQuery.java, CoveringScorer.java)
# ---------------------------------------------------------------------------

def test_covering_query_vs_reference(built):
    import pyarrow.dataset as pads

    from lucene_solr_ray.search.query import CoveringQuery

    d, oracle, _tbl = built
    s = Searcher(d, dtype=np.float64)
    t1, t2 = _two_terms(oracle)
    terms = [t1, t2, "merge"]
    docs = pads.dataset(s.reader.docs_files()).to_table(columns=["doc_id", "field_len"])
    flen = dict(zip(docs["doc_id"].to_pylist(), docs["field_len"].to_pylist()))

    match_sets = []
    for t in terms:
        r = s.search(TermQuery(t), k=10**6, use_ray=False)
        match_sets.append(set(r["doc_id"].to_pylist()))
    for mod in (2, 3):
        q = CoveringQuery(tuple(TermQuery(t) for t in terms),
                          field="field_len", mod=mod, offset=1)
        got = s.match_ids(q)
        exp = sorted(
            did for did in set().union(*match_sets)
            if sum(did in m for m in match_sets) >= max(1, 1 + flen[did] % mod)
        )
        assert list(got) == exp
    # threshold above the clause count → nothing can match
    q = CoveringQuery(tuple(TermQuery(t) for t in terms),
                      field="field_len", mod=1, offset=len(terms) + 1)
    assert len(s.match_ids(q)) == 0


def test_to_child_block_join(bj_built):
    """Every child of a matching parent inherits the parent's score; blocks
    straddling segment boundaries resolve through global ids."""
    import pyarrow.dataset as pads

    d, tbl = bj_built
    s = Searcher(d, dtype=np.float64)
    pt = pads.dataset(s.reader.docs_files()).to_table(
        columns=["doc_id", "repo"], filter=pads.field("lang") == "parent")
    parents = np.sort(pt["doc_id"].to_numpy().astype(np.int64))
    q = TermQuery("blockparent")
    res = s.to_child_block_join(q, parents)
    # child count = total docs minus parents (every child belongs to a block)
    n_docs = pads.dataset(s.reader.docs_files()).count_rows()
    assert len(res) == n_docs - len(parents)
    child = res["child_id"].to_numpy()
    par = res["parent_id"].to_numpy()
    # each child maps to the NEXT parent in doc order
    pos = np.searchsorted(parents, child, side="left")
    assert (parents[pos] == par).all()
    assert not np.isin(child, parents).any()
    # parent scores propagate: per-parent score equals the parent's own hit
    hits = s.search(q, k=10**6, use_ray=False)
    smap = dict(zip(hits["doc_id"].to_pylist(), hits["score"].to_pylist()))
    got = dict(zip(par.tolist(), res["score"].to_pylist()))
    for p, sc in got.items():
        assert sc == smap[p]


def test_classify_knn_fuzzy(built):
    """KNearestFuzzy classifier: NearestFuzzyQuery term selection (fuzzy
    variants boosted 1−ed/minLen, squared, ×idf), artificial-df=1 scoring,
    vote = per-class Σ score/maxScore (argmax; lexicographic tie)."""
    import math

    import numpy as np

    from lucene_solr_ray.search.bm25 import BM25Similarity
    from lucene_solr_ray.search.classify import (
        classify_knn_fuzzy,
        nearest_fuzzy_terms,
    )
    from lucene_solr_ray.search.scorer import decode_postings

    d, oracle, tbl = built
    s = Searcher(d)
    r = s.reader
    doc_ids = [0, 5, 17]
    res = classify_knn_fuzzy(s, doc_ids, k=7, class_field="lang")
    got = dict(zip(res["doc_id"].to_pylist(), res["assigned"].to_pylist()))

    sim = BM25Similarity(dtype=np.float64)
    n = r.field_doc_count("content")
    avgdl = r.field_sum_ttf("content") / r.field_doc_count("content")
    cache = sim.norm_cache(np.float64(avgdl))
    idf1 = math.log(1 + (n - 1 + 0.5) / 1.5)
    seg_base = {sg["seg"]: sg["doc_base"] for sg in r.segments}

    for did in doc_ids:
        text = r.fetch_docs([did], columns=["doc_id", "content"])["content"][0].as_py()
        terms = nearest_fuzzy_terms(s, text or "")
        if not terms:
            assert did not in got
            continue
        weights = {t: sc * idf1 * (sim.k1 + 1.0) for t, sc in terms}
        rows = r.postings_for_terms([("content", t) for t, _sc in terms])
        scores: dict = {}
        for i in range(rows.num_rows):
            seg = int(rows["seg"][i].as_py())
            term = rows["term"][i].as_py()
            ids, freqs = decode_postings(
                rows["doc_blob"][i].as_py(), rows["freq_blob"][i].as_py(),
                int(rows["df"][i].as_py()))
            norms = r.segment_norms(seg)[ids]
            f = freqs.astype(np.float64)
            sc = weights[term] * f / (f + cache[norms])
            for g, v in zip((ids + seg_base[seg]).tolist(), sc.tolist()):
                scores[g] = scores.get(g, 0.0) + v
        scores.pop(did, None)
        if not scores:
            assert did not in got
            continue
        top = sorted(scores.items(), key=lambda gs: (-gs[1], gs[0]))[:7]
        fetched = r.fetch_docs([g for g, _v in top], columns=["doc_id", "lang"])
        cmap = dict(zip(fetched["doc_id"].to_pylist(), fetched["lang"].to_pylist()))
        boosts: dict = {}
        for g, v in top:
            boosts[cmap[g]] = boosts.get(cmap[g], 0.0) + v / top[0][1]
        exp = sorted(boosts, key=lambda c: (-round(boosts[c] / len(top), 9), c))[0]
        assert got[did] == exp


def test_field_analysis_stages(ray_session):
    """FieldAnalysisRequestHandler analog: three stages, stop stage keeps
    original positions, lowercase stage is the tokenize stage lowered."""
    from lucene_solr_ray.pipelines.fulltext import ft_field_analysis

    t = ft_field_analysis("/root/testdata/sf0.001").to_pandas()
    assert set(t.stage) == {"tokenize", "lowercase", "stopfilter"}
    tok = t[t.stage == "tokenize"].set_index(["doc_id", "pos"]).term
    low = t[t.stage == "lowercase"].set_index(["doc_id", "pos"]).term
    assert (tok.str.lower() == low).all()
    stop = t[t.stage == "stopfilter"].set_index(["doc_id", "pos"]).term
    # stop survivors carry their tokenizer positions and values
    assert (low.loc[stop.index] == stop).all()
    assert len(stop) < len(low)  # something was actually removed
    from lucene_solr_ray.analysis.tokenizer import ENGLISH_STOP_WORDS
    assert not set(stop) & ENGLISH_STOP_WORDS
