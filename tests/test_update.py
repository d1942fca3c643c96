"""Incremental maintenance: addDocuments / deleteDocuments / updateDocument
analogs (index/IndexWriter.java:1234,1607-1611 semantics; additive segment
generations per DirectoryReader near-real-time model)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.index.merge import merge_index
from lucene_solr_ray.index.update import (
    add_documents,
    delete_by_keys,
    delete_by_query,
    update_documents,
)
from lucene_solr_ray.search import Searcher, TermQuery, parse_query


def _delta_corpus(n=50, seed=777):
    t = generate_corpus(n, seed=seed)
    # distinct repo so keys can't collide with the base corpus
    repo = pa.array([f"zorg/newrepo{i % 3}" for i in range(n)], pa.string())
    return t.set_column(0, "repo", repo)


@pytest.fixture()
def base_index(ray_session, tmp_path):
    tbl = generate_corpus(300)
    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=100)
    return d, tbl


def test_add_documents_appends_segments(base_index):
    d, tbl = base_index
    delta = _delta_corpus(50)
    manifest = add_documents(d, ray.data.from_arrow(delta), docs_per_segment=25)
    assert manifest["stats"]["doc_count"] == 350
    s = Searcher(d)
    # new docs must be searchable (delta vocab overlaps: keywords/license)
    res = s.search({"q": TermQuery("apache")}, k=400, use_ray=False).to_pandas()
    assert res.doc_id.max() >= 300  # hits inside the delta id range
    check_index(d)
    # old doc ids unchanged: doc 0..299 still dense
    from lucene_solr_ray.index.reader import IndexReader

    r = IndexReader(d)
    bases = sorted(s2["doc_base"] for s2 in r.segments)
    assert bases[0] == 0 and max(
        s2["doc_base"] + s2["doc_count"] for s2 in r.segments
    ) == 350


def test_delete_by_keys_hides_docs(base_index):
    d, tbl = base_index
    s = Searcher(d)
    res = s.search({"q": TermQuery("apache")}, k=10, use_ray=False).to_pandas()
    victim_gid = int(res.iloc[0].doc_id)
    from lucene_solr_ray.index.reader import IndexReader

    r = IndexReader(d)
    doc = r.fetch_docs([victim_gid], columns=["doc_id", "repo", "path", "commit"]).to_pylist()[0]
    n = delete_by_keys(d, [(doc["repo"], doc["path"], doc["commit"])])
    assert n == 1
    s2 = Searcher(d)
    res2 = s2.search({"q": TermQuery("apache")}, k=400, use_ray=False).to_pandas()
    assert victim_gid not in set(res2.doc_id)
    res2_ray = s2.search({"q": TermQuery("apache")}, k=400, use_ray=True).to_pandas()
    assert victim_gid not in set(res2_ray.doc_id)
    # idempotent
    assert delete_by_keys(d, [(doc["repo"], doc["path"], doc["commit"])]) == 0


def test_delete_by_query_and_merge_carries_tombstones(base_index):
    d, _ = base_index
    s = Searcher(d)
    before = s.search({"q": TermQuery("license")}, k=400, use_ray=False).to_pandas()
    n = delete_by_query(d, parse_query("license AND apache"))
    assert n > 0
    s2 = Searcher(d)
    after = s2.search({"q": parse_query("license AND apache")}, k=400, use_ray=False).to_pandas()
    assert len(after) == 0
    # merge must not resurrect deleted docs
    merge_index(d, segs_per_tier=3)
    s3 = Searcher(d)
    after_merge = s3.search({"q": parse_query("license AND apache")}, k=400, use_ray=False).to_pandas()
    assert len(after_merge) == 0


def test_update_documents_replaces(base_index):
    d, tbl = base_index
    # re-submit 5 existing docs with new content containing a marker term
    sub = tbl.slice(0, 5)
    new_content = pa.array(
        [c + " zzupdatedmarker" for c in sub["content"].to_pylist()], pa.large_string()
    )
    delta = sub.set_column(4, "content", new_content)
    update_documents(d, ray.data.from_arrow(delta), docs_per_segment=10)
    s = Searcher(d)
    res = s.search({"q": TermQuery("zzupdatedmarker")}, k=10, use_ray=False).to_pandas()
    assert len(res) == 5
    # the old versions are gone: searching a key-specific path returns one live doc
    from lucene_solr_ray.index.reader import IndexReader

    r = IndexReader(d)
    # total live = 300 (305 ids minus 5 tombstoned)
    live = 0
    for seg in r.segments:
        m = r.live_mask(seg["seg"])
        live += int(m.sum()) if m is not None else seg["doc_count"]
    assert live == 300


def test_add_indexes_copies_segments(ray_session, tmp_path):
    """addIndexes(Directory) analog: segments copy in without re-analysis;
    doc ids renumber into a fresh global range; BM25 scores equal a fresh
    single build over the concatenated corpus (global stats are additive)."""
    import pyarrow.compute as pc

    from lucene_solr_ray.index.update import add_indexes

    t1 = generate_corpus(200)
    t2 = _delta_corpus(120, seed=999)
    d1 = str(tmp_path / "idx1")
    d2 = str(tmp_path / "idx2")
    dall = str(tmp_path / "idx_all")
    build_index(ray.data.from_arrow(t1), d1, docs_per_segment=70)
    build_index(ray.data.from_arrow(t2), d2, docs_per_segment=70)
    build_index(ray.data.from_arrow(pa.concat_tables([t1, t2])), dall,
                docs_per_segment=70)

    m = add_indexes(d1, d2)
    assert m["stats"]["doc_count"] == 320
    assert m["sort_fields"] == []  # concatenation voids the index sort
    check_index(d1)  # doc-id contract + stored sha still hold

    s = Searcher(d1)
    s_all = Searcher(dall)
    assert s.reader.sort_fields == []
    q = parse_query("license OR apache")
    got = s.search({"q": q}, k=50, use_ray=False)
    exp = s_all.search({"q": q}, k=50, use_ray=False)
    # doc ids differ (concatenation vs global key sort) but the score
    # multiset is identical: global df/ttf/avgdl are the same either way
    assert sorted(got["score"].to_pylist()) == pytest.approx(
        sorted(exp["score"].to_pylist())
    )
    # hits cover both source corpora
    fetched = s.reader.fetch_docs(got["doc_id"].to_pylist(), columns=["doc_id", "repo"])
    repos = set(fetched["repo"].to_pylist())
    assert any(r.startswith("zorg/") for r in repos)
    assert any(not r.startswith("zorg/") for r in repos)


def test_add_indexes_rejects_mismatched_options(ray_session, tmp_path):
    from lucene_solr_ray.index.update import add_indexes

    t1 = generate_corpus(60)
    t2 = _delta_corpus(40, seed=31)
    d1 = str(tmp_path / "p_idx1")
    d2 = str(tmp_path / "p_idx2")
    build_index(ray.data.from_arrow(t1), d1, docs_per_segment=30, positions=True)
    build_index(ray.data.from_arrow(t2), d2, docs_per_segment=30, positions=False)
    with pytest.raises(ValueError, match="positions"):
        add_indexes(d1, d2)


def test_atomic_update(ray_session):
    """Atomic set/add modifiers: unmodified fields survive, the doc keeps its
    key, and search reflects the new content."""
    import tempfile

    from lucene_solr_ray.corpus import write_corpus
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.update import atomic_update
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import TermQuery, parse_query

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 120)
    idir = tempfile.mkdtemp()
    build_index(cdir, idir, docs_per_segment=60, store_content=True)

    import pyarrow.parquet as pq
    import glob

    row = pq.read_table(glob.glob(f"{cdir}/*.parquet")[0]).to_pylist()[0]
    key = (row["repo"], row["path"], row["commit"])

    atomic_update(idir, key, {"content": {"set": "zebrafied unique token"},
                              "lang": {"set": "zz"}})
    s = Searcher(idir)
    hit = s.search({"q": TermQuery("zebrafied")}, k=5, use_ray=False)
    assert hit.num_rows == 1
    # keyword field updated too
    kw = s.search({"q": parse_query("lang:zz")}, k=5, use_ray=False)
    assert kw.num_rows == 1
    assert kw["doc_id"][0].as_py() == hit["doc_id"][0].as_py()

    # add modifier appends
    atomic_update(idir, key, {"content": {"add": "quaggamorph"}})
    both = s2 = Searcher(idir).search(
        {"q": parse_query("zebrafied AND quaggamorph")}, k=5, use_ray=False)
    assert both.num_rows == 1


def test_numeric_doc_values_update(ray_session):
    """updateNumericDocValue: range-query visibility flips, scores untouched,
    last write wins."""
    import tempfile

    from lucene_solr_ray.corpus import write_corpus
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.update import update_numeric_doc_values
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import NumericRangeQuery, TermQuery

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 150)
    idir = tempfile.mkdtemp()
    build_index(cdir, idir, docs_per_segment=75)

    s = Searcher(idir)
    huge = NumericRangeQuery("field_len", lower=100_000)
    assert s.search({"q": huge}, k=5, use_ray=False).num_rows == 0
    base_score = s.search({"q": TermQuery("license")}, k=3, use_ray=False)

    n = update_numeric_doc_values(idir, [(7, "field_len", 123_456)])
    assert n == 1
    s2 = Searcher(idir)
    hit = s2.search({"q": huge}, k=5, use_ray=False)
    assert hit["doc_id"].to_pylist() == [7]
    # norms/scoring untouched
    after_score = s2.search({"q": TermQuery("license")}, k=3, use_ray=False)
    assert after_score.equals(base_score)
    # last write wins
    update_numeric_doc_values(idir, [(7, "field_len", 5)])
    assert Searcher(idir).search({"q": huge}, k=5, use_ray=False).num_rows == 0


def test_split_index_segments_standalone(ray_session, tmp_path):
    """IndexSplitter analog: named segments copy into a fresh standalone
    index; its stats re-aggregate from the copied segments, doc ids rebase
    densely, and queries over the split index score exactly like a fresh
    build over the same docs (segment payloads are byte-identical)."""
    from lucene_solr_ray.index.checkindex import check_index
    from lucene_solr_ray.index.update import split_index

    tbl = generate_corpus(280)
    src = str(tmp_path / "src")
    build_index(ray.data.from_arrow(tbl), src, docs_per_segment=70)
    sr = Searcher(src)
    segs = sorted(s["seg"] for s in sr.reader.segments)
    assert len(segs) == 4
    pick = segs[1:3]  # docs 70..209 in global key order
    dest = str(tmp_path / "dest")
    m = split_index(src, dest, pick)
    assert m["stats"]["doc_count"] == 140
    check_index(dest)

    # fresh build over exactly those docs (key order = doc-id order)
    import pyarrow.dataset as pads

    docs = pads.dataset(sr.reader.docs_files()).to_table(
        columns=["doc_id", "repo", "path", "commit"])
    dmap = {d: (r, p, c) for d, r, p, c in zip(*[docs[c].to_pylist() for c in
            ("doc_id", "repo", "path", "commit")])}
    keep_keys = {dmap[d] for d in range(70, 210)}
    mask = [
        (r, p, c) in keep_keys
        for r, p, c in zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist(),
                           tbl["commit"].to_pylist())
    ]
    sub = tbl.filter(pa.array(mask))
    fresh = str(tmp_path / "fresh")
    build_index(ray.data.from_arrow(sub), fresh, docs_per_segment=70)

    q = parse_query("license OR apache")
    got = Searcher(dest).search({"q": q}, k=30, use_ray=False)
    exp = Searcher(fresh).search({"q": q}, k=30, use_ray=False)
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["score"].to_pylist() == exp["score"].to_pylist()

    with pytest.raises(KeyError):
        split_index(src, str(tmp_path / "nope"), [99])


def test_split_index_rerunnable_after_partial_failure(ray_session, tmp_path):
    """A leftover destination segment dir from an interrupted run (manifest
    never written) must not fail the rename on re-run."""
    import os
    import shutil

    from lucene_solr_ray.index.update import split_index

    tbl = generate_corpus(140)
    src = str(tmp_path / "src")
    build_index(ray.data.from_arrow(tbl), src, docs_per_segment=70)
    dest = str(tmp_path / "dest")
    m1 = split_index(src, dest, [0, 1])
    # simulate the interrupted state: segment dirs exist, manifest gone
    os.remove(os.path.join(dest, "manifest.json"))
    m2 = split_index(src, dest, [0, 1])
    assert m2["stats"]["doc_count"] == m1["stats"]["doc_count"] == 140
    from lucene_solr_ray.index.checkindex import check_index
    check_index(dest)


def test_reindex_with_new_analyzer(ray_session, tmp_path):
    """Reindex from stored fields: the rebuilt index equals a fresh build
    over the original corpus with the new analyzer (stored fields are a
    faithful corpus copy; deterministic doc ids make it bit-comparable)."""
    from lucene_solr_ray.analysis.tokenizer import EnglishAnalyzer
    from lucene_solr_ray.index.update import reindex

    tbl = generate_corpus(120)
    src = str(tmp_path / "src")
    build_index(ray.data.from_arrow(tbl), src, docs_per_segment=50,
                store_content=True)
    an = EnglishAnalyzer()
    re_d = str(tmp_path / "re")
    reindex(src, re_d, analyzer=an, docs_per_segment=50)
    fresh = str(tmp_path / "fresh")
    build_index(ray.data.from_arrow(tbl), fresh, docs_per_segment=50,
                analyzer=an)

    q = parse_query("running OR merge", analyzer=an)
    got = Searcher(re_d).search({"q": q}, k=30, use_ray=False)
    exp = Searcher(fresh).search({"q": q}, k=30, use_ray=False)
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["score"].to_pylist() == exp["score"].to_pylist()

    # non-stored source refuses
    bare = str(tmp_path / "bare")
    build_index(ray.data.from_arrow(tbl), bare, docs_per_segment=50)
    with pytest.raises(ValueError, match="store_content"):
        reindex(bare, str(tmp_path / "nope"))


def test_binary_doc_values_update(ray_session, tmp_path):
    """updateBinaryDocValue analog: facet / sort-by-field / stored-fields
    reads see the override; postings and scores untouched; last write wins;
    the sidecar survives a merge (rebased like liveDocs)."""
    import tempfile

    from lucene_solr_ray.corpus import write_corpus
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.merge import merge_index
    from lucene_solr_ray.index.update import update_binary_doc_values, update_doc_values
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import MatchAllQuery, TermQuery

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 150)
    idir = tempfile.mkdtemp()
    build_index(cdir, idir, docs_per_segment=50)

    s = Searcher(idir)
    base_facets = s.facet_counts(MatchAllQuery(), field="lang", use_ray=False).to_pydict()
    base_score = s.search({"q": TermQuery("license")}, k=3, use_ray=False)

    n = update_binary_doc_values(idir, [(7, "lang", "zz_upd"), (90, "lang", b"zz_upd")])
    assert n == 2

    # facet path sees the override (2 docs moved into zz_upd)
    f = Searcher(idir).facet_counts(MatchAllQuery(), field="lang", use_ray=False).to_pydict()
    got = dict(zip(f["value"], f["count"]))
    assert got.get("zz_upd") == 2
    assert sum(got.values()) == sum(base_facets["count"])

    # stored-fields fetch sees it; untouched docs unchanged
    t = Searcher(idir).reader.fetch_docs([7, 8, 90], columns=["doc_id", "lang"])
    by_id = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    assert by_id[7] == "zz_upd" and by_id[90] == "zz_upd" and by_id[8] != "zz_upd"

    # sort-by-field: overridden values sort under the new key (descending →
    # zz_upd beats every organic lang value)
    top = Searcher(idir).search_by_field(MatchAllQuery(), k=2, field="lang",
                                         descending=True, use_ray=False)
    assert sorted(top["doc_id"].to_pylist()) == [7, 90]

    # postings/scoring untouched
    assert Searcher(idir).search({"q": TermQuery("license")}, k=3, use_ray=False).equals(base_score)

    # last write wins
    update_binary_doc_values(idir, [(7, "lang", "aa_upd")])
    t = Searcher(idir).reader.fetch_docs([7], columns=["doc_id", "lang"])
    assert t["lang"][0].as_py() == "aa_upd"

    # merge carries the sidecar forward (values visible after force-merge)
    merge_index(idir, segs_per_tier=1, use_ray=False)
    t = Searcher(idir).reader.fetch_docs([7, 90], columns=["doc_id", "lang"])
    by_id = dict(zip(t["doc_id"].to_pylist(), t["lang"].to_pylist()))
    assert by_id[7] == "aa_upd" and by_id[90] == "zz_upd"


def test_update_doc_values_term_addressed(ray_session):
    """IndexWriter.updateDocValues(Term, Field...): every live doc matching
    the term gets the mixed numeric+binary batch in one call."""
    import tempfile

    from lucene_solr_ray.corpus import write_corpus
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.update import update_doc_values
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import NumericRangeQuery, TermQuery

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 120)
    idir = tempfile.mkdtemp()
    build_index(cdir, idir, docs_per_segment=60)

    s = Searcher(idir)
    matches = sorted(int(g) for g in s.match_ids(TermQuery("license")))
    assert matches

    n = update_doc_values(idir, "license",
                          numeric={"field_len": 777_000},
                          binary={"lang": "bulk_upd"})
    assert n == len(matches)

    s2 = Searcher(idir)
    hits = s2.search({"q": NumericRangeQuery("field_len", lower=700_000)},
                     k=len(matches) + 5, use_ray=False)
    assert sorted(hits["doc_id"].to_pylist()) == matches
    t = s2.reader.fetch_docs(matches, columns=["doc_id", "lang"])
    assert set(t["lang"].to_pylist()) == {"bulk_upd"}

    # no matches → no-op
    assert update_doc_values(idir, "qqqnosuchterm", numeric={"field_len": 1}) == 0


def test_soft_deletes_and_retention(ray_session):
    """Soft deletes hide docs from every search path like tombstones, stay
    recoverable (un_soft_delete) until a merge reclaims them, and the
    SoftDeletesRetentionMergePolicy analog keeps retention-query matches
    soft across the merge while hard-reclaiming the rest."""
    import tempfile

    import pyarrow.parquet as pq

    from lucene_solr_ray.corpus import write_corpus
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.merge import merge_index
    from lucene_solr_ray.index.update import (
        soft_delete_by_keys,
        soft_delete_by_query,
        un_soft_delete_by_keys,
    )
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import MatchAllQuery, TermQuery

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 160)
    idir = tempfile.mkdtemp()
    build_index(cdir, idir, docs_per_segment=40)

    s = Searcher(idir)
    base = s.search({"q": TermQuery("license")}, k=200, use_ray=False)
    victims = base["doc_id"].to_pylist()[:4]
    keys = [tuple(r) for r in s.reader.fetch_docs(
        victims, columns=["repo", "path", "commit"]).to_pandas().itertuples(index=False)]

    n = soft_delete_by_keys(idir, keys)
    assert n == 4
    # hidden from scoring, facets, and the ids path — both ray and local
    for use_ray in (False, True):
        got = Searcher(idir).search({"q": TermQuery("license")}, k=200, use_ray=use_ray)
        assert not set(victims) & set(got["doc_id"].to_pylist())
    # but the unwrapped reader view still sees them
    r = Searcher(idir).reader
    seen_soft = sum(
        int((~m).sum()) for m in
        (r.live_mask(e["seg"]) for e in r.segments) if m is not None)
    seen_hard = sum(
        int((~m).sum()) for m in
        (r.live_mask(e["seg"], include_soft_deleted=True) for e in r.segments)
        if m is not None)
    assert seen_soft == 4 and seen_hard == 0

    # recoverable: un-soft-delete two of them
    back = un_soft_delete_by_keys(idir, keys[:2])
    assert back == 2
    got = Searcher(idir).search({"q": TermQuery("license")}, k=200, use_ray=False)
    assert set(victims[:2]) <= set(got["doc_id"].to_pylist())
    assert not set(victims[2:]) & set(got["doc_id"].to_pylist())

    # query twin
    n2 = soft_delete_by_query(idir, TermQuery("copyright"), use_ray=False)
    assert n2 > 0

    # retention merge: keep soft-deleted docs matching 'license'; docs only
    # matching 'copyright' (and not license) get hard-reclaimed
    lic_ids = set(victims[2:])
    # segs_per_tier must be >= 2 for any group to form (size-1 groups are
    # no-op merges) — 4 force-merges all four segments, so the retention
    # step REALLY runs (r5 fix: the former segs_per_tier=1 call merged
    # nothing and the retention assertions passed vacuously)
    res = merge_index(idir, segs_per_tier=4, use_ray=False,
                      apply_soft_retention=True,
                      soft_retention_query=TermQuery("license"))
    assert res["merges"] >= 1 and res["segments_after"] < res["segments_before"]
    r2 = Searcher(idir).reader
    import os
    soft_left = 0
    for e in r2.segments:
        p = os.path.join(r2.seg_dir(e["seg"]), "soft_deletes.parquet")
        if os.path.exists(p):
            soft_left += pq.read_table(p).num_rows
    # every surviving soft delete matches the retention query; the two
    # license victims are still recoverable
    assert soft_left >= 2
    # victims[:2] may have been re-soft-deleted by the copyright query
    # (license docs usually contain both terms) and retained by the license
    # retention — recover all four; at least the two license victims remain
    rec = un_soft_delete_by_keys(idir, keys)
    assert rec >= 2
    got = Searcher(idir).search({"q": TermQuery("license")}, k=200, use_ray=False)
    assert set(victims) <= set(got["doc_id"].to_pylist())
    # reclaimed (copyright-only) docs are now hard tombstones: un-soft-delete
    # can't resurrect them and they stay invisible
    cop = Searcher(idir).search({"q": TermQuery("copyright")}, k=500, use_ray=False)
    cop_ids = set(cop["doc_id"].to_pylist())
    lic_now = set(got["doc_id"].to_pylist())
    assert cop_ids <= lic_now  # only retention-protected docs still visible


def test_hard_delete_by_query_reaches_soft_deleted(ray_session):
    """deleteDocuments(Query) operates on the UNWRAPPED reader: docs that
    are currently soft-deleted but match a hard delete-by-query become
    hard tombstones, so a later un_soft_delete cannot resurrect them."""
    import tempfile

    from lucene_solr_ray.corpus import write_corpus
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.index.update import (
        delete_by_query,
        soft_delete_by_keys,
        un_soft_delete_by_keys,
    )
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import TermQuery

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 120)
    idir = tempfile.mkdtemp()
    build_index(cdir, idir, docs_per_segment=40)

    s = Searcher(idir)
    q = TermQuery("license")
    matches = set(
        s.search({"q": q}, k=500, use_ray=False)["doc_id"].to_pylist())
    victim = sorted(matches)[0]
    keys = [tuple(r) for r in s.reader.fetch_docs(
        [victim], columns=["repo", "path", "commit"]).to_pandas()
        .itertuples(index=False)]

    assert soft_delete_by_keys(idir, keys) == 1
    n_hard = delete_by_query(idir, q, use_ray=True)
    # the soft-deleted victim was ALSO hard-tombstoned
    assert n_hard == len(matches)
    un_soft_delete_by_keys(idir, keys)
    got = Searcher(idir).search({"q": q}, k=500, use_ray=False)
    assert victim not in set(got["doc_id"].to_pylist())
    assert got.num_rows == 0  # every match hard-deleted; none resurrected


def test_numeric_dv_update_visible_to_sort_by_field(ray_session):
    """Numeric dv updates must be visible to the facet/sort-by-field column
    loader, not just numeric queries (review r4 follow-up: the two read
    paths disagreed about the same doc value)."""
    import tempfile

    from lucene_solr_ray.index.update import update_numeric_doc_values
    from lucene_solr_ray.corpus import write_corpus
    from lucene_solr_ray.index import build_index
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import MatchAllQuery

    cdir = tempfile.mkdtemp()
    write_corpus(cdir, 60)
    idir = tempfile.mkdtemp()
    build_index(cdir, idir, docs_per_segment=30)

    update_numeric_doc_values(idir, [(5, "field_len", 10_000_000)])
    s = Searcher(idir)
    top = s.search_by_field(MatchAllQuery(), k=1, field="field_len",
                            descending=True, use_ray=False)
    assert top["doc_id"].to_pylist() == [5]  # updated value dominates sort
