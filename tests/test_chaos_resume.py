"""Resumability under real failure: SIGKILL a build subprocess mid-flight,
resume in a fresh session, and require (a) resumed_segments > 0, (b) the
final index is byte-for-byte IDENTICAL in content to an uninterrupted build
(deterministic doc ids — the north rule's N-vs-4N identity), (c) check_index
is clean."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
import ray.data

from lucene_solr_ray.corpus import generate_corpus, write_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import parse_query

BUILD_SCRIPT = """
import ray, sys
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from lucene_solr_ray.index.build import build_index
build_index(sys.argv[1], sys.argv[2], docs_per_segment=64, batch_size=128)
"""


@pytest.mark.timeout(600)
def test_sigkill_mid_build_then_resume(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 4000)
    idx = str(tmp_path / "idx")

    env = dict(os.environ, PYTHONPATH=os.getcwd(), RAY_ADDRESS="")
    proc = subprocess.Popen(
        [sys.executable, "-c", BUILD_SCRIPT, corpus, idx],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,  # own process group: kill Ray workers too
    )
    # wait for SOME segments to commit, then kill the whole group hard
    seg_dir = os.path.join(idx, "segments")
    deadline = time.time() + 240
    committed = 0
    while time.time() < deadline:
        if os.path.isdir(seg_dir):
            committed = len([d for d in os.listdir(seg_dir) if d.startswith("seg=")])
            if committed >= 3:
                break
        if proc.poll() is not None:
            break  # finished before we could kill — resume still exercises reuse
        time.sleep(0.2)
    if proc.poll() is None:
        os.killpg(proc.pid, signal.SIGKILL)
        proc.wait()
    assert committed >= 1, "build never committed a segment before the kill"
    assert not os.path.exists(os.path.join(idx, "manifest.json")) or proc.returncode == 0

    # resume in THIS session (fresh Ray state); must skip completed ranges
    res = build_index(corpus, idx, docs_per_segment=64, batch_size=128)
    if proc.returncode != 0:  # genuinely interrupted
        assert res.resumed_segments >= 1
    assert res.stats.doc_count == 4000
    assert check_index(idx)["docs"] == 4000

    # identical to an uninterrupted build: same top-k ids AND scores
    clean = str(tmp_path / "clean")
    build_index(corpus, clean, docs_per_segment=64, batch_size=128)
    qs = {"q1": parse_query("license AND apache"), "q2": parse_query("merge OR window")}
    a = Searcher(idx).search(qs, k=20, use_ray=False).to_pandas().to_string()
    b = Searcher(clean).search(qs, k=20, use_ray=False).to_pandas().to_string()
    assert a == b
