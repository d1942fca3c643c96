"""Sloppy-phrase + MultiPhrase correctness.

Matcher-level golden cases mirror the reference's own fixtures
(``lucene/core/src/test/org/apache/lucene/search/TestSloppyPhraseQuery.java``:
DOC_1..DOC_5_4 / QUERY_1..QUERY_5_4) including the repeating-term machinery;
engine-level tests verify scoring and the Ray/local path agreement.
"""

import numpy as np
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.search import Searcher, TermQuery, parse_query
from lucene_solr_ray.search.query import MultiPhraseQuery, PhraseQuery
from lucene_solr_ray.search.sloppy import sloppy_freq

F32 = np.float32


def _freq(doc: str, query: str, slop: int) -> float:
    """Run the matcher on whitespace tokens (reference tests use a
    no-stopword analyzer, so we feed positions directly)."""
    toks = doc.lower().split()
    qterms = query.lower().split()
    pos_lists = []
    for t in qterms:
        p = np.asarray([i for i, x in enumerate(toks) if x == t], dtype=np.int64)
        if len(p) == 0:
            return 0.0
        pos_lists.append(p)
    offsets = list(range(len(qterms)))
    return sloppy_freq(pos_lists, offsets, slop, [(t,) for t in qterms], F32)


S_1 = "A A A"
S_2 = "A 1 2 3 A 4 5 6 A"
DOC_1 = "X " + S_1 + " Y"
DOC_2 = "X " + S_2 + " Y"
DOC_3 = "X " + S_1 + " A Y"
DOC_1_B = "X " + S_1 + " Y N N N N " + S_1 + " Z"
DOC_2_B = "X " + S_2 + " Y N N N N " + S_2 + " Z"
DOC_3_B = "X " + S_1 + " A Y N N N N " + S_1 + " A Y"
DOC_4 = "A A X A X B A X B B A A X B A A"
DOC_5_3 = "H H H X X X H H H X X X H H H"
DOC_5_4 = "H H H H"


def test_doc4_query4_matches_iff_slop_ge_1():
    # TestSloppyPhraseQuery.testDoc4_Query4_All_Slops_Should_match
    for slop in range(30):
        f = _freq(DOC_4, "X A A", slop)
        if slop < 1:
            assert f == 0.0, slop
        else:
            assert f > 0.0, slop


def test_doc1_query1_all_slops_match_and_b_freq_higher():
    for slop in range(30):
        f1 = _freq(DOC_1, S_1, slop)
        f2 = _freq(DOC_1_B, S_1, slop)
        assert f1 > 0.0 and f2 > f1, slop


def test_doc2_query1_min_slop_6():
    for slop in range(30):
        f1 = _freq(DOC_2, S_1, slop)
        if slop < 6:
            assert f1 == 0.0, slop
        else:
            f2 = _freq(DOC_2_B, S_1, slop)
            assert f1 > 0.0 and f2 > f1, slop


def test_doc2_query2_all_slops_match():
    for slop in range(30):
        f1 = _freq(DOC_2, S_2, slop)
        f2 = _freq(DOC_2_B, S_2, slop)
        assert f1 > 0.0 and f2 > f1, slop


def test_doc3_query1_all_slops_match():
    for slop in range(30):
        f1 = _freq(DOC_3, S_1, slop)
        f2 = _freq(DOC_3_B, S_1, slop)
        assert f1 > 0.0 and f2 > f1, slop


def test_doc5_h_query_consistency():
    # "H H H H" query: DOC_5_4 always matches, DOC_5_3 never (slop < 3)
    for slop in range(3):
        for _ in range(5):
            assert _freq(DOC_5_4, "H H H H", slop) > 0.0
            assert _freq(DOC_5_3, "H H H H", slop) == 0.0


def test_documented_example_a_b_slop2():
    # SloppyPhraseMatcher.java:39-40: "a b"~2 on "x a b a y" matches twice:
    # "a b" (distance 0) and "b a" (distance 2)
    f = _freq("x a b a y", "a b", 2)
    assert f == pytest.approx(1.0 + 1.0 / 3.0, rel=1e-6)


def test_slop0_equals_exact_count():
    """slop=0 sloppy matching == exact occurrence count (random docs)."""
    rng = np.random.default_rng(7)
    vocab = list("abcde")
    for _ in range(200):
        toks = rng.choice(vocab, size=rng.integers(3, 40)).tolist()
        n = int(rng.integers(2, 4))
        q = rng.choice(vocab, size=n).tolist()
        pos_lists = []
        ok = True
        for t in q:
            p = np.asarray([i for i, x in enumerate(toks) if x == t], dtype=np.int64)
            if len(p) == 0:
                ok = False
                break
            pos_lists.append(p)
        if not ok:
            continue
        # exact: count alignments
        exact = 0
        for s in range(len(toks)):
            if all(s + i < len(toks) and toks[s + i] == q[i] for i in range(n)):
                exact += 1
        got = sloppy_freq(pos_lists, list(range(n)), 0, [(t,) for t in q], F32)
        assert got == float(exact), (toks, q)


def test_sloppy_monotone_in_slop():
    """freq is non-decreasing in slop (more slack can only add matches)."""
    rng = np.random.default_rng(11)
    vocab = list("abc")
    for _ in range(100):
        toks = rng.choice(vocab, size=rng.integers(4, 30)).tolist()
        q = rng.choice(vocab, size=2, replace=False).tolist()
        pos_lists = []
        ok = True
        for t in q:
            p = np.asarray([i for i, x in enumerate(toks) if x == t], dtype=np.int64)
            if len(p) == 0:
                ok = False
                break
            pos_lists.append(p)
        if not ok:
            continue
        prev = -1.0
        for slop in range(0, 10):
            f = sloppy_freq(pos_lists, [0, 1], slop, [(t,) for t in q], F32)
            assert f >= prev - 1e-6
            prev = f


# ---------------------------------------------------------------------------
# engine-level
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tbl = generate_corpus(300)
    d = str(tmp_path_factory.mktemp("sloppy_idx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=120)
    return d, tbl


def _tokens(text: str):
    import re

    from lucene_solr_ray.analysis.tokenizer import ENGLISH_STOP_WORDS

    out = []
    pos = 0
    for t in re.findall(r"\w+", text.lower()):
        if len(t) > 255:
            continue
        if t in ENGLISH_STOP_WORDS:
            pos += 1
            continue
        out.append((t, pos))
        pos += 1
    return out


def _pick_bigram(tbl):
    """A (t1, t2) adjacent pair present in several docs."""
    from collections import Counter

    cnt = Counter()
    for text in tbl["content"].to_pylist()[:100]:
        toks = _tokens(text)
        for (a, pa), (b, pb) in zip(toks, toks[1:]):
            if pb == pa + 1 and a != b:
                cnt[(a, b)] += 1
    return cnt.most_common(1)[0][0]


@pytest.mark.parametrize("use_ray", [False, True])
def test_engine_sloppy_superset_and_scores(built, use_ray):
    d, tbl = built
    searcher = Searcher(d)
    t1, t2 = _pick_bigram(tbl)
    exact = searcher.search(
        {"q": PhraseQuery((t1, t2), (0, 1))}, k=300, use_ray=use_ray
    ).to_pandas()
    slop3 = searcher.search(
        {"q": PhraseQuery((t1, t2), (0, 1), slop=3)}, k=300, use_ray=use_ray
    ).to_pandas()
    assert set(exact.doc_id) <= set(slop3.doc_id)
    assert len(slop3) >= len(exact) > 0

    # brute-force match set: min alignment width ≤ slop; doc ids follow the
    # build's (repo, path, commit) sort order
    keys = list(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(),
                    tbl["commit"].to_pylist()))
    order = sorted(range(len(keys)), key=lambda i: keys[i])
    doc_of_row = {row: d for d, row in enumerate(order)}
    docs = tbl["content"].to_pylist()
    exp = set()
    for i, text in enumerate(docs):
        toks = _tokens(text)
        p1 = [p for t, p in toks if t == t1]
        p2 = [p for t, p in toks if t == t2]
        if p1 and p2 and min(abs((b - 1) - a) for a in p1 for b in p2) <= 3:
            exp.add(doc_of_row[i])
    assert set(slop3.doc_id) == exp


@pytest.mark.parametrize("use_ray", [False, True])
def test_engine_multiphrase(built, use_ray):
    d, tbl = built
    searcher = Searcher(d)
    t1, t2 = _pick_bigram(tbl)
    # second slot allows t2 OR a nonsense term — same match set as exact phrase
    mp = MultiPhraseQuery(((t1,), (t2, "zzzznope")), (0, 1))
    exact = searcher.search({"q": PhraseQuery((t1, t2), (0, 1))}, k=300, use_ray=use_ray).to_pandas()
    got = searcher.search({"q": mp}, k=300, use_ray=use_ray).to_pandas()
    assert got.doc_id.tolist() == exact.doc_id.tolist()
    # scores match too: zzzznope has df=0 → contributes no idf (reference
    # MultiPhraseWeight skips null termStatistics)
    assert np.array_equal(got.score.to_numpy(), exact.score.to_numpy())

    # a real union: [t1], [t2 OR x2] where x2 also follows t1 somewhere
    from collections import Counter

    cnt = Counter()
    for text in tbl["content"].to_pylist():
        toks = _tokens(text)
        for (a, pa), (b, pb) in zip(toks, toks[1:]):
            if pb == pa + 1 and a == t1 and b != t2:
                cnt[b] += 1
    if cnt:
        x2 = cnt.most_common(1)[0][0]
        mp2 = MultiPhraseQuery(((t1,), (t2, x2)), (0, 1))
        got2 = searcher.search({"q": mp2}, k=300, use_ray=use_ray).to_pandas()
        e1 = set(exact.doc_id)
        e2 = set(
            searcher.search({"q": PhraseQuery((t1, x2), (0, 1))}, k=300,
                            use_ray=use_ray).to_pandas().doc_id
        )
        assert set(got2.doc_id) == (e1 | e2)


def test_parser_slop_syntax():
    q = parse_query('"quick dead"~2')
    assert isinstance(q, PhraseQuery) and q.slop == 2
    q2 = parse_query('"quick dead"')
    assert isinstance(q2, PhraseQuery) and q2.slop == 0
