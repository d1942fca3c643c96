"""Mutation-surface driver entry: build → update → atomic update →
soft-delete → retention merge → doc-values update → search the final
visible state.

Pins the writer lifecycle semantics inside the driver gate (VERDICT r4
next-round #7 — they were pytest-only): ``updateDocument`` by unique key
(``lucene/core/src/java/org/apache/lucene/index/IndexWriter.java``
updateDocument), Solr atomic updates
(``solr/core/.../AtomicUpdateDocumentMerger.java``), soft deletes +
``SoftDeletesRetentionMergePolicy``
(``lucene/core/src/java/org/apache/lucene/index/
SoftDeletesRetentionMergePolicy.java``), and Term-addressed binary
doc-value updates (``IndexWriter.updateDocValues``).

Every mutation is a deterministic function of the ``documents`` table
alone (doc-id arithmetic), so a DuckDB oracle can replay the final
visible state exactly:

- docs with ``doc_id % 97 == 0`` are REPLACED (new content
  ``"updated merge data row <id>"``),
- doc 42 gets an atomic ``{"content": {"add": ...}}`` append,
- docs with ``doc_id % 31 == 0`` are SOFT-deleted,
- one merge runs with retention query ``data`` — soft-deleted docs
  matching it stay retained (recoverable), the rest are reclaimed,
- the doc matching the sentinel token gets a binary doc-value override
  of its ``lang`` stored field (visible to fetch, not to matching).

The result lists every doc matching ``merge`` in the post-mutation index:
``status='visible'`` (live) or ``'retained'`` (soft-deleted but kept by
retention); reclaimed docs are absent.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

MUT_UPDATE_MOD = 97
MUT_SOFT_MOD = 31
MUT_QUERY_TERM = "merge"
MUT_RETAIN_TERM = "data"
MUT_ATOMIC_ID = 42
MUT_SENTINEL = "zzmutappendix"
MUT_DV_LANG = "zz"


def _mut_index(sf_dir: str) -> str:
    """Build-and-mutate, cached: the mutation sequence is deterministic, so
    the finished index is reusable across entries/runs (marker-gated — a
    partially-mutated dir from a killed run is wiped and redone)."""
    import shutil

    from ..corpus import documents_as_corpus
    from ..index.build import build_index
    from ..index.merge import merge_index
    from ..index.update import (
        atomic_update,
        soft_delete_by_keys,
        update_doc_values,
        update_documents,
    )
    from ..search.query import TermQuery
    from .fulltext import _index_dir_for

    idx = _index_dir_for(sf_dir) + "_mut"
    marker = os.path.join(idx, "MUTATIONS_DONE")
    if os.path.exists(marker):
        return idx
    shutil.rmtree(idx, ignore_errors=True)

    corpus = documents_as_corpus(sf_dir)
    build_index(corpus, idx, docs_per_segment=2_000, store_content=True)

    # 1) updateDocument by unique key: replace content of doc_id % 97 == 0
    import ray.data

    from .io import sized_read

    def delta(batch: pa.Table) -> pa.Table:
        mask = batch["doc_id"].to_numpy() % MUT_UPDATE_MOD == 0
        sel = batch.filter(pa.array(mask))
        ids = sel["doc_id"].to_numpy()
        return pa.table({
            "repo": sel["source"].cast(pa.string()),
            "path": pa.array([f"doc/{d}" for d in ids], pa.string()),
            "commit": pa.array([f"{d:040x}" for d in ids], pa.string()),
            "lang": sel["lang"].cast(pa.string()),
            "content": pa.array(
                [f"updated merge data row {d}" for d in ids], pa.large_string()),
        })

    delta_ds = sized_read(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "source", "lang"]).map_batches(
        delta, batch_format="pyarrow")
    update_documents(idx, delta_ds)

    # 2) Solr atomic update: append a sentinel token to one doc's content.
    # repo = the doc's source value — a deterministic 1-row filtered read
    import pyarrow.dataset as pads
    import pyarrow.compute as pc

    src = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["source"],
        filter=pc.field("doc_id") == MUT_ATOMIC_ID)["source"][0].as_py()
    atomic_update(idx, (src, f"doc/{MUT_ATOMIC_ID}", f"{MUT_ATOMIC_ID:040x}"),
                  {"content": {"add": f"{MUT_SENTINEL} {MUT_QUERY_TERM}"}})

    # 3) soft-delete doc_id % 31 == 0 by unique key
    import pyarrow.dataset as pads

    t = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "source"])
    ids = t["doc_id"].to_numpy()
    srcs = t["source"].to_pylist()
    keys = [(srcs[i], f"doc/{ids[i]}", f"{ids[i]:040x}")
            for i in np.flatnonzero(ids % MUT_SOFT_MOD == 0)]
    soft_delete_by_keys(idx, keys)

    # 4) retention merge: keep soft-deleted docs matching the retention
    #    query, hard-reclaim the rest. segs_per_tier must cover ALL
    #    segments (base + the two delta segments) so one force-merge group
    #    forms — segs_per_tier=1 would plan only size-1 groups, which are
    #    no-ops and would skip the retention step entirely
    from ..index.reader import IndexReader

    n_segs = len(IndexReader(idx).segments)
    merge_index(idx, segs_per_tier=max(2, n_segs), apply_soft_retention=True,
                soft_retention_query=TermQuery(MUT_RETAIN_TERM))

    # 5) Term-addressed binary doc-value update: override `lang` of the
    #    sentinel doc (stored-fields visible, postings untouched)
    update_doc_values(idx, MUT_SENTINEL, binary={"lang": MUT_DV_LANG})

    with open(marker, "w") as f:
        f.write("ok")
    return idx


def ft_mutation(sf_dir: str) -> pa.Table:
    """(orig_id, status, lang) for every doc matching ``merge`` after the
    full mutation sequence — status 'visible' (live match) or 'retained'
    (soft-deleted, kept by the retention merge); reclaimed docs absent.
    ``lang`` comes through the stored-fields fetch, so the binary doc-value
    override is part of the checked surface."""
    from ..search.query import TermQuery
    from ..search.searcher import Searcher
    from .fulltext import _global_match_ids

    idx = _mut_index(sf_dir)
    s = Searcher(idx)
    doc_bases = {e["seg"]: e["doc_base"] for e in s.reader.segments}
    q = TermQuery(MUT_QUERY_TERM)
    vis = set(_global_match_ids(
        s._scatter_match(q, "ids"), doc_bases).tolist())
    allm = _global_match_ids(
        s._scatter_match(q, "ids", include_soft_deleted=True), doc_bases)
    fetched = s.reader.fetch_docs(
        [int(g) for g in allm], columns=["doc_id", "path", "lang"])
    orig = np.array([int(p.split("/", 1)[1])
                     for p in fetched["path"].to_pylist()], dtype=np.int64)
    status = np.array(["visible" if d in vis else "retained"
                       for d in fetched["doc_id"].to_pylist()], dtype=object)
    langs = np.array(fetched["lang"].to_pylist(), dtype=object)
    order = np.argsort(orig)
    return pa.table({
        "orig_id": pa.array(orig[order], pa.int64()),
        "status": pa.array(status[order].tolist(), pa.string()),
        "lang": pa.array(langs[order].tolist(), pa.string()),
    })


SQL_FT_MUTATION = f"""
WITH eff AS (
  SELECT doc_id AS orig_id,
         CASE WHEN doc_id = {MUT_ATOMIC_ID} THEN '{MUT_DV_LANG}' ELSE lang END AS lang,
         CASE WHEN doc_id % {MUT_UPDATE_MOD} = 0
                THEN 'updated merge data row ' || doc_id
              WHEN doc_id = {MUT_ATOMIC_ID}
                THEN text || ' {MUT_SENTINEL} {MUT_QUERY_TERM}'
              ELSE text END AS text,
         (doc_id % {MUT_SOFT_MOD} = 0) AS soft
  FROM documents
),
toks AS (
  SELECT orig_id, unnest(regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM eff
),
m AS (SELECT DISTINCT orig_id FROM toks WHERE tok = '{MUT_QUERY_TERM}'),
r AS (SELECT DISTINCT orig_id FROM toks WHERE tok = '{MUT_RETAIN_TERM}')
SELECT e.orig_id,
       CASE WHEN NOT e.soft THEN 'visible' ELSE 'retained' END AS status,
       e.lang
FROM eff e JOIN m ON e.orig_id = m.orig_id
WHERE (NOT e.soft) OR e.orig_id IN (SELECT orig_id FROM r)
ORDER BY e.orig_id
"""
