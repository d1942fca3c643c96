"""Pipeline operators vs their DuckDB oracles (the driver's CORRECTNESS gate,
mirrored at sf0.001) + planted-duplicate recall tests on synthetic tables."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib

    return importlib.import_module("__ray_entry__")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


FAST_ENTRIES = [
    "ft_collection_stats",
    "ft_doc_norms",
    "ft_term_stats",
    "ft_topk_terms",
    "ft_topk_bool",
    "ft_qparser",
    "ft_xml_query",
    "ft_phrase",
    "ft_prefix",
    "ft_facets",
    "ft_sorted_by_path",
    "token_count",
    "lang_id",
    "quality",
    "fingerprint",
    "dedup_exact",
    "dedup_shingle_set",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "embed_dup_pairs",
    "ann_topk",
    "events_hourly",
    "events_hopping",
    "events_sessionize",
    "events_type_stats",
    "facet_counts",
    "grouped_topk",
    "lang_char_stats",
    "mm_payload_features",
    "ft_realtime_get",
    "ft_facet_query",
    "ft_elevate",
    "st_rollup",
    "st_join_topk",
    "st_unique_having",
    "st_facet",
    "st_fetch_rollup",
    "percolate",
    "geo_box",
    "geo_distance_topk",
    "ft_multi_term",
    "ft_multi_phrase",
    "ft_explain",
    "ft_multi_sort",
    "events_cumulative",
    "scrub",
    "split_assign",
    "pack_greedy",
    "solr_json_nested",
    "ft_schema_info",
    "dedup_clusters",
    "st_timeseries",
    "st_random",
    "decontaminate",
    "gopher_quality",
    "ft_word_delimiter",
    "ft_html_strip",
    "ft_covering",
    "freetext_suggest",
    "sample_mix",
    "chunk_windows",
    "ft_ngram",
    "ft_length_filter",
    "ft_docvalues_set",
    "ft_block_join_children",
    "events_top_users",
    "ft_func_termfreq",
    "ft_wordbreak",
    "mm_frame_sample",
    "mm_resize",
    "emb_quantize",
    "ft_reverse_wildcard",
    "ft_graph_synonym",
    "ft_keywords",
    "ft_diversified",
    "events_props_stats",
    "ft_strdist",
    "st_region_rollup",
    "ft_suggest_fuzzy",
    "geo_polygon",
    "ft_edismax",
    "ft_edismax_boost",
    "ft_func_scale",
    "ft_payload_check",
    "ft_common_grams",
    "ft_keepword",
    "events_facet_range",
    "ft_mutation",
    "dedup_keep_best",
]


@pytest.mark.parametrize("name", FAST_ENTRIES)
def test_query_matches_oracle(entry_mod, con, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = fn(SF)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    exp = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns), f"{name} schema"
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)


def test_wand_equals_bool_disjunctions(entry_mod):
    from lucene_solr_ray.pipelines import fulltext

    bools = fulltext.ft_topk_bool(SF).to_pandas()
    wand = fulltext.ft_wand_topk(SF).to_pandas()
    for qid in wand.query_id.unique():
        a = bools[bools.query_id == qid].sort_values("rank")[["rank", "doc_id"]]
        b = wand[wand.query_id == qid].sort_values("rank")[["rank", "doc_id"]]
        pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_ann_lsh_recall(entry_mod):
    """LSH-bucketed ANN must find a decent fraction of the true neighbors —
    and must be a subset of the corpus with correct ranks."""
    from lucene_solr_ray.pipelines import ann

    exact = ann.ann_topk(SF).to_pandas()
    stats: dict = {}
    approx = ann.ann_lsh_topk(SF, stats=stats).to_pandas()
    hits = tot = 0
    for qid in exact.query_id.unique():
        t = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(t & a)
        tot += len(t)
    assert tot > 0
    assert hits / tot > 0.15  # 6 hyperplanes → 1/64 of the corpus scanned
    # bucket partitioning must actually prune: scanned (rows × routed queries)
    # ≪ brute force (rows × all queries)
    brute = stats["corpus_rows"] * stats["n_queries"]
    assert 0 < stats["scanned_rows"] < brute / 3


def test_ann_ivf_recall(entry_mod):
    """IVF ANN: decent recall vs the exact oracle, deterministic centroids,
    and probed-list pruning (scanned ≪ brute force)."""
    import numpy as np

    from lucene_solr_ray.pipelines import ann

    c1 = ann.train_ivf_centroids(SF)
    c2 = ann.train_ivf_centroids(SF)
    assert np.array_equal(c1, c2)
    exact = ann.ann_topk(SF).to_pandas()
    stats: dict = {}
    approx = ann.ann_ivf_topk(SF, stats=stats).to_pandas()
    hits = tot = 0
    for qid in exact.query_id.unique():
        t = set(exact[exact.query_id == qid].neighbor_id)
        a = set(approx[approx.query_id == qid].neighbor_id)
        hits += len(t & a)
        tot += len(t)
    assert tot > 0
    assert hits / tot > 0.3  # nprobe=4 of 16 lists
    brute = stats["corpus_rows"] * stats["n_queries"]
    assert 0 < stats["scanned_rows"] < brute / 2


# ---------------------------------------------------------------------------
# planted duplicates on a synthetic sf_dir
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted")
    rng = np.random.default_rng(7)
    base = [
        " ".join(rng.choice(["alpha", "beta", "gamma", "delta", "eps"], size=40))
        for _ in range(20)
    ]
    texts, srcs = [], []
    for i, b in enumerate(base):
        texts.append(b)
        srcs.append(f"src{i % 3}")
    # exact dup of doc 0, near dup of doc 1 (one word changed)
    texts.append(base[0])
    srcs.append("srcX")
    words = base[1].split()
    words[5] = "zzz"
    texts.append(" ".join(words))
    srcs.append("srcY")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))

    vecs = rng.standard_normal((30, 16))
    vecs[29] = vecs[0] + rng.standard_normal(16) * 0.01  # near-identical pair
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                                      pa.list_(pa.float32())),
                "label": pa.array([0] * 30, pa.int32()),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d)


def test_planted_exact_dup_found(ray_session, planted_dir):
    from lucene_solr_ray.pipelines import dedup

    out = dedup.dedup_exact(planted_dir).to_pandas()
    dup_groups = out[out.group_size > 1]
    assert len(dup_groups) == 1
    assert dup_groups.iloc[0].kept_doc_id == 0 and dup_groups.iloc[0].group_size == 2


def test_planted_near_dup_found_by_minhash(ray_session, planted_dir):
    from lucene_solr_ray.pipelines import dedup

    pairs = dedup.minhash_lsh_pairs(planted_dir).to_pandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 20) in got  # exact dup pair
    assert (1, 21) in got  # near dup pair (1 word of 40 changed)


def test_planted_embedding_dup_found(ray_session, planted_dir):
    from lucene_solr_ray.pipelines import dedup

    pairs = dedup.embed_dup_pairs(planted_dir).to_pandas()
    assert (0, 29) in set(zip(pairs.vec_a, pairs.vec_b))


def test_minhash_mega_bucket_adversarial(ray_session, tmp_path):
    """100-TB hazard (round-3 verdict #3): a bucket of B near-identical but
    DISTINCT docs used to emit B·(B−1)/2 self-join rows. With the cap,
    (a) 10⁴ distinct near-dups complete fast with over-cap buckets dropped
    AND LOGGED (no silent caps), (b) exact duplicates are immune — they
    pre-collapse to one representative, so their pairs always come back."""
    from lucene_solr_ray.pipelines import dedup

    n = 10_000
    base = " ".join(f"tok{i % 97}" for i in range(60))
    texts = [f"{base} unique{i}" for i in range(n)]  # distinct near-dups
    triple = "completely different boilerplate text body here ok"
    texts += [triple] * 3  # exact-dup group → pre-collapse path
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    pairs = dedup.minhash_lsh_pairs(str(tmp_path),
                                    max_bucket_reps=256).to_pandas()
    stats = dict(dedup.LAST_RUN_STATS)
    assert stats["dropped_buckets"] >= 1 and stats["dropped_rows"] > 256
    # bounded: nowhere near the ~5·10⁷ uncapped candidate pairs
    assert len(pairs) < 2_000_000
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert {(n, n + 1), (n, n + 2), (n + 1, n + 2)} <= got


def test_planted_simhash_close(ray_session, planted_dir):
    from lucene_solr_ray.pipelines import dedup

    sh = dedup.simhash(planted_dir).to_pandas().set_index("doc_id")["simhash"]
    assert sh.loc[0] == sh.loc[20]  # identical docs → identical simhash
    ham = bin(int(sh.loc[1]) ^ int(sh.loc[21])).count("1")
    assert ham <= 8  # near-dup → small hamming distance


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    tbl = res if isinstance(res, pa.Table) else pa.table(res)
    assert tbl.num_rows >= 0
    assert set(tbl.column_names) == {"query_id", "rank", "doc_id"}


def test_solr_json_facets(ray_session):
    """HLL estimate within ~3σ of exact distinct (1.04/√64 ≈ 13% rel σ);
    quantile_disc rule and moment math pinned against brute force."""
    import math

    from lucene_solr_ray.pipelines import solr_facets

    out = solr_facets.solr_json_facets(SF).to_pandas().set_index("lang")
    import duckdb

    exp = duckdb.sql(
        f"""SELECT lang, count(*) c, sum(length(text)) s,
                   count(DISTINCT source) u
            FROM '{SF}/documents.parquet' GROUP BY lang"""
    ).df().set_index("lang")
    for lang in exp.index:
        row = out.loc[lang]
        assert row["count"] == exp.loc[lang, "c"]
        assert row["sum_len"] == exp.loc[lang, "s"]
        u = int(exp.loc[lang, "u"])
        assert row["unique_sources"] == u
        assert abs(row["hll_sources"] - u) <= max(3 * 1.04 / math.sqrt(64) * u, 3)
        assert row["min_len"] <= row["p50_len"] <= row["p90_len"] <= row["max_len"]
        assert row["stddev_len"] == pytest.approx(math.sqrt(row["variance_len"]))


def test_hll_estimate_accuracy():
    """HLL over n random values stays within 3σ for a range of n."""
    import numpy as np

    from lucene_solr_ray.pipelines.solr_facets import HLL_M, _hll_hash, hll_estimate

    rng = np.random.default_rng(3)
    for n in (5, 50, 500, 5000):
        vals = [f"value-{rng.integers(0, 10**12)}-{i}" for i in range(n)]
        bucket, rho = _hll_hash(vals)
        regs = np.zeros(HLL_M, dtype=np.int64)
        for b, r in zip(bucket, rho):
            regs[b] = max(regs[b], r)
        est = hll_estimate(regs)
        assert abs(est - n) <= 3 * 1.04 / HLL_M**0.5 * n + 3, (n, est)


def test_dedup_clusters_structure(entry_mod, con):
    """Clusters are consistent with the pair set: every pair lands in one
    cluster; reps are cluster minima; sizes match member counts."""
    from lucene_solr_ray.pipelines import dedup

    pairs = dedup.minhash_lsh_pairs(SF).to_pandas()
    cl = dedup.dedup_clusters(SF).to_pandas()
    rep = dict(zip(cl.doc_id, cl.cluster_rep))
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert rep[a] == rep[b]
    g = cl.groupby("cluster_rep")
    assert (g.doc_id.min() == g.doc_id.first().index).all() or (
        cl.groupby("cluster_rep").doc_id.min().eq(
            cl.groupby("cluster_rep").doc_id.min().index
        ).all()
    )
    sizes = cl.groupby("cluster_rep").size()
    for did, r, sz in zip(cl.doc_id, cl.cluster_rep, cl.cluster_size):
        assert sz == sizes[r]


def test_cluster_results_invariants(entry_mod):
    """Deterministic k-means clustering of search results: stable across
    runs, every hit assigned, sizes consistent, >1 cluster used."""
    from lucene_solr_ray.pipelines import fulltext

    a = fulltext.ft_cluster_results(SF).to_pandas()
    b = fulltext.ft_cluster_results(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    assert a.cluster.nunique() > 1
    sizes = a.groupby("cluster").size()
    for _, row in a.iterrows():
        assert row.cluster_size == sizes[row.cluster]


def test_mmr_rerank_invariants(entry_mod):
    """Greedy MMR: deterministic, first pick = BM25 top hit, picks are a
    k-subset of the candidate pool without repeats."""
    from lucene_solr_ray.pipelines import fulltext
    from lucene_solr_ray.search.query import TermQuery

    a = fulltext.ft_mmr_rerank(SF).to_pandas()
    b = fulltext.ft_mmr_rerank(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    s = fulltext.get_searcher(SF)
    top = s.search({"q": TermQuery(fulltext.FACET_TERM)},
                   k=fulltext.MMR_TOPN, use_ray=False)
    pool = top["doc_id"].to_pylist()
    assert a.doc_id.iloc[0] == pool[0]  # λ-weighted start = pure relevance
    assert a.doc_id.is_unique and set(a.doc_id) <= set(pool)
    assert len(a) == fulltext.TOPK_K


def test_events_props_stats_handles_missing_k(ray_session, tmp_path):
    """Rows whose props lack an extractable k are EXCLUDED (not NaN
    partials that poison Min/Max through the shuffle)."""
    import duckdb
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines.events import (SQL_EVENTS_PROPS_STATS,
                                                  events_props_stats)

    d = str(tmp_path)
    tbl = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * 6),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": ["a", "a", "b", "b", "c", "c"],
        "value": pa.array([0.0] * 6),
        # type b has NO k at all; type a is mixed; c is fully k-bearing
        "props": ['{"k": 3}', '{"j": 9}', '{"j": 1}', None, '{"k": 7}', '{"k": 1}'],
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    got = events_props_stats(d).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    exp = con.sql(SQL_EVENTS_PROPS_STATS).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False, check_exact=True)
    assert set(got["event_type"]) == {"a", "c"}  # b excluded entirely


def test_dedup_substring_oracle_and_semantics(entry_mod, con):
    """Substring-level dedup (Lee et al. 2021 EXACTSUBSTR, fixed token
    windows): matches the DuckDB oracle at sf0.001, and the window function
    itself has the documented edge behavior."""
    from lucene_solr_ray.pipelines import dedup

    got = dedup.dedup_substring(SF).to_pandas()
    exp = con.sql(dedup.SQL_DEDUP_SUBSTRING).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_windows"].tolist() == exp["n_windows"].tolist()
    assert got["n_dup_windows"].tolist() == exp["n_dup_windows"].tolist()
    assert (got["n_dup_windows"] > 0).any()  # corpus has real boilerplate

    # window function edge cases
    W = dedup.SUBSTR_W
    assert dedup._substr_windows(" ".join(["t"] * (W - 1))) == []  # too short
    ws = dedup._substr_windows(" ".join(f"w{i}" for i in range(W + 2)))
    assert len(ws) == 3  # n - W + 1 stride-1 windows
    # identical window text → identical fingerprint regardless of doc
    a = dedup._substr_windows("A b C " + " ".join(f"x{i}" for i in range(W)))
    b = dedup._substr_windows("a B c " + " ".join(f"x{i}" for i in range(W)))
    assert a == b  # lowercased token stream


def test_bpe_train_golden_and_encode(entry_mod):
    """Sennrich et al. toy corpus: the first merges are the hand-computable
    pair-frequency maxima, and encoding replays them greedily."""
    import pyarrow as pa

    from lucene_solr_ray.pipelines import text

    wc = pa.table({"word": ["low", "lower", "newest", "widest"], "n": [5, 2, 6, 3]})
    m = text.bpe_train(wc, n_merges=10)
    # ('e','s') freq 9 wins round 1; ('es','t</w>') freq 9 wins round 2
    assert m[0] == ("e", "s")
    assert m[1] == ("es", "t</w>")
    ranks = {p: i for i, p in enumerate(m)}
    assert text.bpe_encode_word("low", ranks) == ["low</w>"]
    # unseen word falls back to learned subword pieces
    enc = text.bpe_encode_word("lowest", ranks)
    assert "".join(enc) == "lowest</w>" and len(enc) > 1
    assert text.bpe_encode_word("", ranks) == []


def test_bpe_token_count_invariants(entry_mod):
    """Corpus-level invariants: deterministic, subword count ≥ word count,
    and strictly more granular than whole words for this merge budget."""
    from lucene_solr_ray.pipelines import text

    t1 = text.bpe_token_count(SF).to_pandas()
    t2 = text.bpe_token_count(SF).to_pandas()
    assert t1.equals(t2)
    assert (t1.n_bpe_tokens >= t1.n_words).all()
    assert (t1.n_bpe_tokens > t1.n_words).any()


def test_ft_tag_oracle_and_batch_vectorization(entry_mod, con):
    """Solr Text Tagger (overlaps=ALL): matches the DuckDB adjacency oracle,
    counts every occurrence (not just first), and single- and multi-token
    dictionary entries both fire."""
    from lucene_solr_ray.pipelines import text

    got = text.ft_tag(SF).to_pandas()
    exp = con.sql(text.SQL_FT_TAG).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["tag"].tolist() == exp["tag"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert (got["n"] > 1).any()  # repeated occurrences counted
    tags = set(got["tag"])
    assert "merge" in tags and "big order scan" in tags


def test_events_funnel_monotone_and_greedy(entry_mod, con):
    """Funnel conversion: step counts are monotone non-increasing, match the
    SQL earliest-match oracle, and the greedy walk handles interleaved
    events (unit check on the subsequence semantics)."""
    from lucene_solr_ray.pipelines import events

    got = events.events_funnel(SF).to_pandas()
    exp = con.sql(events.SQL_EVENTS_FUNNEL).df()
    assert got.values.tolist() == exp.values.tolist()
    n = got["n_users"].tolist()
    assert n == sorted(n, reverse=True)
    assert n[0] > 0


def test_tdigest_percentiles(entry_mod, con):
    """t-digest sketch: rank error ≤1% vs exact, estimates monotone,
    deterministic across runs, and merging partial digests stays within the
    same bound as one whole-data digest."""
    import numpy as np

    from lucene_solr_ray.pipelines import solr_facets as sfm

    t1 = sfm.percentile_tdigest(SF)
    t2 = sfm.percentile_tdigest(SF)
    assert t1.equals(t2)  # block-order-independent merge
    ests = t1["est"].to_pylist()
    assert ests == sorted(ests)
    vals = con.sql("SELECT value FROM events").df()["value"].to_numpy()
    vals.sort()
    for q, est in zip(t1["quantile"].to_pylist(), ests):
        rank = np.searchsorted(vals, est) / len(vals)
        assert abs(rank - q) <= 0.01, (q, est, rank)

    # mergeability: digest(eighth-slices merged) ≈ digest(whole)
    rng = np.random.default_rng(7)
    data = rng.normal(size=8000)
    parts_m, parts_w = [], []
    for chunk in np.array_split(data, 8):
        m, w = sfm.tdigest_compress(chunk, np.ones(len(chunk)))
        parts_m.append(m)
        parts_w.append(w)
    mm, mw = sfm.tdigest_compress(np.concatenate(parts_m), np.concatenate(parts_w))
    assert len(mm) < 400  # compressed, not a value dump
    s = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        est = sfm.tdigest_quantile(mm, mw, q, float(s[0]), float(s[-1]))
        rank = np.searchsorted(s, est) / len(s)
        assert abs(rank - q) <= 0.015, (q, est, rank)
