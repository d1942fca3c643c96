"""Weighted prefix automaton (search/suggest_fst.py — AnalyzingSuggester
FST analog): differential vs brute force on random vocabularies, and
identity with the distributed suggest_prefix scan on a real index."""

import random

import numpy as np
import pytest
import ray.data

from lucene_solr_ray.search.suggest_fst import PrefixAutomaton


def _brute(items, prefix, k):
    hits = [(t, w) for t, w in items if t.startswith(prefix)]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def test_random_vocab_matches_brute_force():
    rng = random.Random(17)
    alphabet = "abcde"
    for _ in range(60):
        vocab = {}
        for _i in range(rng.randint(1, 300)):
            t = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            vocab[t] = rng.randint(1, 50)
        items = sorted(vocab.items())
        auto = PrefixAutomaton(items)
        assert auto.size == len(items)
        for _q in range(10):
            prefix = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 3)))
            k = rng.randint(1, 8)
            assert auto.top_k(prefix, k) == _brute(items, prefix, k), (prefix, k)


def test_edge_cases():
    auto = PrefixAutomaton([("merge", 10), ("merges", 10), ("merged", 3)])
    # tie at 10: shorter/lexicographically-smaller term first
    assert auto.top_k("merge", 3) == [("merge", 10), ("merges", 10), ("merged", 3)]
    assert auto.top_k("zzz", 5) == []
    assert auto.top_k("merge", 0) == []
    assert auto.top_k("", 2) == [("merge", 10), ("merges", 10)]


def test_matches_distributed_suggest_on_real_index(ray_session, tmp_path_factory):
    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.suggest import suggest_prefix

    tbl = generate_corpus(800)
    d = str(tmp_path_factory.mktemp("fstidx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=200)
    r = Searcher(d).reader
    for prefix in ["me", "li", "a", "zz", ""]:
        scan = suggest_prefix(r, prefix, num=7).to_pandas()
        fst = suggest_prefix(r, prefix, num=7, use_automaton=True).to_pandas()
        assert scan.to_string() == fst.to_string(), prefix
    # second call hits the per-process cache (same object)
    from lucene_solr_ray.search.suggest_fst import automaton_for

    assert automaton_for(r, "content") is automaton_for(r, "content")
