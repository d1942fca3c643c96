"""Index build: CheckIndex invariants (FIXTURES.md §5), resume/determinism
(FIXTURES.md §7), content-sha fidelity (BASELINE.json per-row invariant)."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from lucene_solr_ray.corpus import corpus_sha256, generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.index.plan import compute_plan


@pytest.fixture(scope="module")
def small_corpus():
    tbl = generate_corpus(300)
    sha = dict(
        zip(
            zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(), tbl["commit"].to_pylist()),
            corpus_sha256(tbl),
        )
    )
    return tbl, sha


def _index_fingerprint(d: str) -> dict:
    """Canonical content digest of every segment (order-independent layout)."""
    out = {}
    for seg_dir in sorted(glob.glob(os.path.join(d, "segments", "seg=*"))):
        post = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
        docs = pq.read_table(os.path.join(seg_dir, "docs.parquet"))
        out[os.path.basename(seg_dir)] = (
            hash(post.to_pandas().to_csv(index=False)),
            hash(docs.to_pandas().to_csv(index=False)),
        )
    return out


def test_build_and_checkindex(ray_session, small_corpus, tmp_path):
    tbl, sha = small_corpus
    d = str(tmp_path / "idx")
    res = build_index(ray.data.from_arrow(tbl), d, docs_per_segment=100)
    assert res.stats.doc_count == 300
    summary = check_index(d, sha)
    assert summary["docs"] == 300
    assert summary["segments"] == len(res.segments)


def test_deterministic_across_parallelism(ray_session, small_corpus, tmp_path):
    tbl, _ = small_corpus
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    ds1 = ray.data.from_arrow(tbl)  # single block
    # different physical partitioning of the same data
    ds2 = ray.data.from_arrow(tbl).repartition(7)
    build_index(ds1, d1, docs_per_segment=100, batch_size=64)
    build_index(ds2, d2, docs_per_segment=100, batch_size=17)
    assert _index_fingerprint(d1) == _index_fingerprint(d2)


def test_resume_skips_completed_and_is_identical(ray_session, small_corpus, tmp_path):
    tbl, sha = small_corpus
    d_full = str(tmp_path / "full")
    d_resume = str(tmp_path / "resume")
    build_index(ray.data.from_arrow(tbl), d_full, docs_per_segment=100)

    # simulate a crashed build: copy plan + a subset of committed segments
    os.makedirs(os.path.join(d_resume, "segments"), exist_ok=True)
    shutil.copy(os.path.join(d_full, "plan.json"), os.path.join(d_resume, "plan.json"))
    segs = sorted(glob.glob(os.path.join(d_full, "segments", "seg=*")))
    shutil.copytree(segs[0], os.path.join(d_resume, "segments", os.path.basename(segs[0])))

    res = build_index(ray.data.from_arrow(tbl), d_resume, docs_per_segment=100)
    assert res.resumed_segments == 1
    assert _index_fingerprint(d_full) == _index_fingerprint(d_resume)
    check_index(d_resume, sha)


def test_plan_deterministic(ray_session, small_corpus):
    tbl, _ = small_corpus
    p1 = compute_plan(ray.data.from_arrow(tbl), 100)
    p2 = compute_plan(ray.data.from_arrow(tbl).repartition(5), 100)
    assert p1.boundaries == p2.boundaries
    assert p1.bases == p2.bases
    assert p1.counts == p2.counts
    assert sum(p1.counts) == 300


def test_rebuild_is_idempotent_noop(ray_session, small_corpus, tmp_path):
    tbl, _ = small_corpus
    d = str(tmp_path / "gen")
    r1 = build_index(ray.data.from_arrow(tbl), d, docs_per_segment=200)
    r2 = build_index(ray.data.from_arrow(tbl), d, docs_per_segment=200)
    # a completed build is covered by the manifest → rebuild is a no-op
    assert r2.generation == r1.generation
    assert r2.resumed_segments == len(r1.segments)
    with open(os.path.join(d, "manifest.json")) as f:
        m = json.load(f)
    assert m["generation"] == r1.generation
    assert all(s["doc_count"] > 0 for s in m["segments"])


def test_kill_mid_build_then_resume_byte_identical(small_corpus, tmp_path):
    """FIXTURES.md §7: SIGKILL a build part-way, resume, final index must be
    byte-identical to an uninterrupted build (own Ray sessions in
    subprocesses so the kill can't corrupt the test session)."""
    import subprocess
    import sys
    import textwrap
    import time

    tbl, _ = small_corpus
    corpus_dir = str(tmp_path / "corpus")
    os.makedirs(corpus_dir)
    pq.write_table(tbl, os.path.join(corpus_dir, "part-0.parquet"))
    d_kill = str(tmp_path / "killed")
    d_clean = str(tmp_path / "clean")

    script = textwrap.dedent(
        """
        import sys, ray, logging
        ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        from lucene_solr_ray.index.build import build_index
        build_index(sys.argv[1], sys.argv[2], docs_per_segment=15, batch_size=32)
        ray.shutdown()
        """
    )
    env = dict(os.environ, PYTHONPATH="/root/repo")
    # clean reference build
    subprocess.run([sys.executable, "-c", script, corpus_dir, d_clean], env=env,
                   check=True, capture_output=True, timeout=300)
    # killed build: SIGKILL as soon as the first segment commits
    proc = subprocess.Popen([sys.executable, "-c", script, corpus_dir, d_kill], env=env,
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 240
    n_done = 0
    while time.time() < deadline:
        n_done = len(glob.glob(os.path.join(d_kill, "segments", "seg=*")))
        if n_done >= 1 or proc.poll() is not None:
            break
        time.sleep(0.05)
    if proc.poll() is None:
        proc.kill()
        proc.wait()
    if os.path.exists(os.path.join(d_kill, "manifest.json")):
        pytest.skip("build finished before the kill landed (timing-dependent)")
    assert n_done >= 1, "kill came too early (no segments committed)"
    # resume in a fresh process
    subprocess.run([sys.executable, "-c", script, corpus_dir, d_kill], env=env,
                   check=True, capture_output=True, timeout=300)
    assert _index_fingerprint(d_clean) == _index_fingerprint(d_kill)


def test_large_plan_sampled_path(ray_session):
    # force the sampled-boundary path with a low small_threshold
    tbl = generate_corpus(2000, seed=7)
    ds = ray.data.from_arrow(tbl)
    plan = compute_plan(ds, 500, small_threshold=100)
    assert plan.total_rows == 2000
    assert sum(plan.counts) == 2000
    assert len(plan.bases) == len(plan.counts)
    # bases are the prefix sums of counts
    np.testing.assert_array_equal(
        np.asarray(plan.bases), np.concatenate([[0], np.cumsum(plan.counts)[:-1]])
    )


def test_checkindex_verifies_stored_content(ray_session, tmp_path):
    """store_content indexes pass check_index; corrupting the stored text is
    detected against content_sha256."""
    import os

    import pyarrow.parquet as pq

    import ray.data

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.checkindex import check_index

    tbl = generate_corpus(50)
    d = str(tmp_path / "sc_idx")
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=25, store_content=True)
    check_index(d)  # raises CheckIndexError on problems
    # corrupt one stored doc's content
    seg_dir = os.path.join(d, "segments", sorted(os.listdir(os.path.join(d, "segments")))[0])
    p = os.path.join(seg_dir, "docs.parquet")
    t = pq.read_table(p)
    import pyarrow as pa

    col = t["content"].to_pylist()
    col[0] = (col[0] or "") + " TAMPERED"
    t = t.set_column(t.schema.get_field_index("content"), "content", pa.array(col, pa.large_string()))
    pq.write_table(t, p, row_group_size=65536)
    import pytest as _pytest

    from lucene_solr_ray.index.checkindex import CheckIndexError

    with _pytest.raises(CheckIndexError, match="stored content"):
        check_index(d)


def test_index_sort_early_termination(ray_session, tmp_path):
    """IndexWriterConfig.setIndexSort analog: a build with sort_fields=("lang",)
    assigns doc ids in (lang, repo, path, commit) order, so an ascending
    sort-by-lang query early-terminates (EarlyTerminatingSortingCollector,
    ref lucene/core/src/java/org/apache/lucene/search/
    EarlyTerminatingSortingCollector.java) after the first segments, and the
    result is identical to the exhaustive sorted-search path on an unsorted
    index."""
    import ray.data

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import MatchAllQuery

    tbl = generate_corpus(300)
    d_sorted = str(tmp_path / "idx_sorted")
    d_plain = str(tmp_path / "idx_plain")
    build_index(ray.data.from_arrow(tbl), d_sorted, docs_per_segment=50,
                sort_fields=("lang",))
    build_index(ray.data.from_arrow(tbl), d_plain, docs_per_segment=50)

    s_sorted = Searcher(d_sorted)
    s_plain = Searcher(d_plain)
    assert s_sorted.reader.sort_fields[0] == "lang"

    q = MatchAllQuery()
    res = s_sorted.search_by_field(q, k=7, field="lang")
    # early termination actually kicked in: not every segment scanned
    assert s_sorted.last_sorted_segments_scanned < len(s_sorted.reader.segments)
    res_plain = s_plain.search_by_field(q, k=7, field="lang", use_ray=False)
    assert res["lang"].to_pylist() == res_plain["lang"].to_pylist()
    # values are the globally-smallest langs
    langs = sorted(tbl["lang"].to_pylist())
    assert res["lang"].to_pylist() == langs[:7]

    # descending / non-sort-field queries fall through to the exhaustive
    # path and stay correct on the sorted index
    res_d = s_sorted.search_by_field(q, k=7, field="lang", descending=True, use_ray=False)
    assert res_d["lang"].to_pylist() == sorted(tbl["lang"].to_pylist(), reverse=True)[:7]
    res_p = s_sorted.search_by_field(q, k=7, field="path", use_ray=False)
    assert res_p["path"].to_pylist() == sorted(tbl["path"].to_pylist())[:7]


def test_build_from_jsonl_and_csv_sources(ray_session, tmp_path):
    """Solr JsonLoader/CSVLoader analogs: the same corpus ingested from
    JSONL and CSV builds indexes with results identical to the parquet
    build (deterministic doc ids are source-format-independent)."""
    import csv
    import json

    import pyarrow.parquet as pq

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.query import parse_query
    from lucene_solr_ray.search.searcher import Searcher
    from lucene_solr_ray.sources import read_corpus_csv, read_corpus_jsonl

    tbl = generate_corpus(150)
    rows = tbl.to_pylist()
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(tbl, pdir / "part.parquet")
    jpath = tmp_path / "corpus.jsonl"
    with open(jpath, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cpath = tmp_path / "corpus.csv"
    with open(cpath, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    results = []
    for tag, src in [("pq", str(pdir)),
                     ("jsonl", read_corpus_jsonl(str(jpath))),
                     ("csv", read_corpus_csv(str(cpath)))]:
        idx = str(tmp_path / f"idx_{tag}")
        build_index(src, idx, docs_per_segment=60)
        s = Searcher(idx)
        got = s.search({"q": parse_query("license OR apache")}, k=25, use_ray=False)
        results.append((got["doc_id"].to_pylist(), got["score"].to_pylist()))
    assert results[0] == results[1] == results[2]

    # schema validation: a source missing a column fails fast
    import pytest as _pytest

    bad = tmp_path / "bad.jsonl"
    with open(bad, "w") as f:
        f.write(json.dumps({"repo": "r", "path": "p"}) + "\n")
    with _pytest.raises(Exception, match="missing columns"):
        build_index(read_corpus_jsonl(str(bad)), str(tmp_path / "idx_bad"),
                    docs_per_segment=60)


def test_build_from_solr_xml_and_json_sources(ray_session, tmp_path):
    """Solr XMLLoader / JsonLoader update-format analogs: the same corpus
    posted as <add><doc> XML and as a JSON doc array builds indexes
    identical to the parquet build."""
    import json
    from xml.sax.saxutils import escape

    import pyarrow.parquet as pq

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.query import parse_query
    from lucene_solr_ray.search.searcher import Searcher
    from lucene_solr_ray.sources import read_corpus_solr_json, read_corpus_solr_xml

    tbl = generate_corpus(120)
    rows = tbl.to_pylist()
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(tbl, pdir / "part.parquet")

    # two XML files (files are the parallelism unit)
    for i, chunk in enumerate((rows[:60], rows[60:])):
        docs = "".join(
            "<doc>" + "".join(
                f'<field name="{k}">{escape(str(v))}</field>'
                for k, v in r.items()) + "</doc>"
            for r in chunk)
        (tmp_path / f"upd{i}.xml").write_text(f"<add>{docs}</add>")
    xml_src = read_corpus_solr_xml(
        [str(tmp_path / "upd0.xml"), str(tmp_path / "upd1.xml")])

    (tmp_path / "upd.json").write_text(json.dumps(rows))
    json_src = read_corpus_solr_json(str(tmp_path / "upd.json"))

    results = []
    for tag, src in [("pq", str(pdir)), ("xml", xml_src), ("json", json_src)]:
        idx = str(tmp_path / f"idx2_{tag}")
        build_index(src, idx, docs_per_segment=50)
        s = Searcher(idx)
        got = s.search({"q": parse_query("license OR apache")}, k=25, use_ray=False)
        results.append((got["doc_id"].to_pylist(), got["score"].to_pylist()))
    assert results[0] == results[1] == results[2]

    # command form: {"add": {"doc": {...}}}
    (tmp_path / "one.json").write_text(json.dumps({"add": {"doc": rows[0]}}))
    one = read_corpus_solr_json(str(tmp_path / "one.json"))
    assert one.count() == 1

    import pytest as _pytest

    (tmp_path / "bad.xml").write_text(
        '<add><doc><field name="repo">r</field></doc></add>')
    with _pytest.raises(Exception, match="missing fields"):
        read_corpus_solr_xml(str(tmp_path / "bad.xml")).materialize()


def test_solr_xml_repeated_field_and_cdata(ray_session, tmp_path):
    """ADVICE r4: repeated single-valued <field> must raise (not silently
    keep the last value), and CDATA mixed with child elements must be
    captured in full via itertext()."""
    import pytest as _pytest

    from lucene_solr_ray.sources import read_corpus_solr_xml

    (tmp_path / "dup.xml").write_text(
        '<add><doc>'
        '<field name="repo">r</field><field name="repo">r2</field>'
        '<field name="path">p</field><field name="commit">c</field>'
        '<field name="lang">py</field><field name="content">x</field>'
        '</doc></add>')
    with _pytest.raises(Exception, match="repeats single-valued field"):
        read_corpus_solr_xml(str(tmp_path / "dup.xml")).materialize()

    (tmp_path / "cdata.xml").write_text(
        '<add><doc>'
        '<field name="repo">r</field><field name="path">p</field>'
        '<field name="commit">c</field><field name="lang">py</field>'
        '<field name="content"><![CDATA[hello ]]>mixed<b> tail</b> end</field>'
        '</doc></add>')
    got = read_corpus_solr_xml(str(tmp_path / "cdata.xml")).take_all()
    assert got[0]["content"] == "hello mixed tail end"


def test_plan_path_identity_dataset_vs_path(ray_session, tmp_path):
    """ADVICE r4 (plan.py): between small_threshold and the local cap, the
    SAME data planned from a parquet path vs a Ray Dataset must yield
    identical segment boundaries/counts — the path choice is a function of
    row count alone."""
    import pyarrow.parquet as pq
    import ray.data

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.plan import compute_plan

    tbl = generate_corpus(1200)
    pdir = tmp_path / "pqp"
    pdir.mkdir()
    pq.write_table(tbl, pdir / "part.parquet")

    ds_path = ray.data.read_parquet(str(pdir))
    ds_mem = ray.data.from_arrow(tbl)
    # small_threshold=500 < 1200 rows <= local cap → exact path both ways
    p1 = compute_plan(ds_path, 300, small_threshold=500,
                      corpus_path=str(pdir))
    p2 = compute_plan(ds_mem, 300, small_threshold=500, corpus_path=None)
    assert p1.boundaries == p2.boundaries
    assert p1.counts == p2.counts
    assert p1.bases == p2.bases


def test_distributed_plan_counts_exact(ray_session):
    """r5 regression: the sampled (distributed) plan's counting pass must
    accumulate duplicate range ids with np.add.at — iter_batches coalesces
    many per-input-batch partial tables into one block, so range ids repeat
    within a yielded batch and fancy-index += silently drops all but the
    last duplicate (800k rows counted as 313k; doc_bases came out wrong on
    the 100-TB code path). Many small input blocks force the coalescing."""
    import numpy as np
    import ray.data

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.plan import compute_plan, sort_keys

    tbl = generate_corpus(20_000)
    ds = ray.data.from_arrow(tbl).repartition(50)
    plan = compute_plan(ds, 500, small_threshold=1)  # force the sampled path
    assert sum(plan.counts) == plan.total_rows == 20_000
    keys = sort_keys(tbl, plan.key_cols)
    rid = plan.range_ids(keys)
    recount = np.bincount(rid, minlength=plan.n_segments).tolist()
    assert recount == plan.counts
    # bases are the exact prefix sum the shuffle will honor
    assert plan.bases == np.concatenate(
        [[0], np.cumsum(plan.counts)[:-1]]).tolist()


def test_sampled_plan_build_query_identical(ray_session, tmp_path):
    """Doc ids are dense key ranks over the whole corpus, so they are
    invariant to WHERE the plan cuts segment boundaries: a build over the
    sampled (distributed) plan must answer queries identically to the
    exact-path build — segmentation differs, results don't."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.corpus import generate_corpus
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.index.plan import compute_plan
    from lucene_solr_ray.search.query import parse_query
    from lucene_solr_ray.search.searcher import Searcher

    tbl = generate_corpus(3000)
    pdir = tmp_path / "pq"
    pdir.mkdir()
    pq.write_table(tbl, pdir / "part.parquet")

    idx_exact = str(tmp_path / "idx_exact")
    build_index(str(pdir), idx_exact, docs_per_segment=400)

    # pre-seed a SAMPLED plan (small_threshold=1 forces the large path) and
    # let the build resume onto it — the only way to exercise the
    # distributed-plan boundaries below the 200k threshold
    import os

    import ray.data

    idx_s = str(tmp_path / "idx_sampled")
    os.makedirs(idx_s, exist_ok=True)
    plan = compute_plan(ray.data.read_parquet(str(pdir)), 400,
                        small_threshold=1, corpus_path=str(pdir))
    assert sum(plan.counts) == plan.total_rows == 3000
    plan.save(os.path.join(idx_s, "plan.json"))
    build_index(str(pdir), idx_s, docs_per_segment=400, resume=True)

    for qs in ["license AND apache", "def OR return"]:
        a = Searcher(idx_exact).search({"q": parse_query(qs)}, k=20, use_ray=False)
        b = Searcher(idx_s).search({"q": parse_query(qs)}, k=20, use_ray=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()


def test_solr_json_dict_without_add_raises(ray_session, tmp_path):
    import json

    import pytest as _pytest

    from lucene_solr_ray.sources import read_corpus_solr_json

    (tmp_path / "del.json").write_text(json.dumps({"delete": {"id": "x"}}))
    with _pytest.raises(Exception, match="no 'add' key"):
        read_corpus_solr_json(str(tmp_path / "del.json")).materialize()
