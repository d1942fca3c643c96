"""Incremental index maintenance — IndexWriter add/delete/update analogs.

- :func:`add_documents` — the ``addDocuments`` path: a delta corpus becomes a
  new batch of segments appended to the manifest (Lucene's additive segment
  publication, ``index/DirectoryReader.java:78`` near-real-time model). New
  docs get IDs after the current maximum (dense rank *within* the delta),
  deterministic given (existing index, delta). Global stats re-aggregate;
  norms are absolute lengths so existing segments are untouched.
- :func:`delete_by_keys` / :func:`delete_by_query` — ``deleteDocuments``:
  per-segment tombstone files (liveDocs bitset analog,
  ``index/IndexWriter.java:1607-1611``). Statistics keep counting deleted
  docs until segments are rewritten, exactly like Lucene's docFreq behavior.
- :func:`update_documents` — ``updateDocument(Term, doc)``: delete-by-key
  then add.

Doc IDs of live documents never change (unlike Lucene's merge remapping) —
the dense-rank contract holds for the original build; deltas extend the ID
space monotonically.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..analysis.tokenizer import StandardAnalyzer
from .build import IndexStats, _next_generation
from .plan import compute_plan
from .reader import IndexReader
from .segment import DEFAULT_KEYWORD_FIELDS as _DEFAULT_KW
from .segment import SegmentWriter


def _has_stored_content(reader) -> bool:
    """True iff the base index stores the content column (storedFields)."""
    import pyarrow.parquet as pq

    segs = reader.segments
    if not segs:
        return False
    try:
        schema = pq.read_schema(
            __import__("os").path.join(reader.seg_dir(segs[0]["seg"]), "docs.parquet")
        )
        return "content" in schema.names
    except Exception:
        return False


def add_documents(
    index_dir: str,
    corpus,
    *,
    docs_per_segment: int = 100_000,
    analyzer: StandardAnalyzer | None = None,
    batch_size: int = 1024,
    positions: bool = True,
) -> dict:
    """Append a delta corpus as new segments; returns the new manifest dict."""
    import ray
    import ray.data

    if isinstance(corpus, (str, os.PathLike)):
        corpus = ray.data.read_parquet(str(corpus))
    reader = IndexReader(index_dir)
    # IndexOptions are sticky per index (FieldInfos validation analog): a
    # positions mismatch would corrupt later merges (merge.py mixed-pos guard)
    existing_pos = reader.manifest.get("positions", True)
    if positions != existing_pos:
        raise ValueError(
            f"index was built with positions={existing_pos}; "
            f"add_documents(positions={positions}) would mix IndexOptions"
        )
    doc_base_offset = max(
        (s["doc_base"] + s["doc_count"] for s in reader.segments), default=0
    )
    seg_offset = max((s["seg"] for s in reader.segments), default=-1) + 1

    plan = compute_plan(corpus, docs_per_segment)
    plan.bases = [b + doc_base_offset for b in plan.bases]

    analyzer = analyzer or StandardAnalyzer()
    from .segment import analyze_invert_fn

    # task-based like build_index: warm reusable workers, no per-build
    # actor-pool process warmup, no small-CPU-budget pool deadlock
    analyzed = corpus.map_batches(
        analyze_invert_fn,
        fn_kwargs={
            "plan": plan,
            "analyzer": analyzer,
            "done_ranges": frozenset(),
            "positions": positions,
            # sticky like IndexOptions: store content iff the base index does
            "store_content": _has_stored_content(reader),
        },
        batch_format="pyarrow",
        batch_size=batch_size,
    )
    keyword_fields = tuple(
        reader.manifest.get("keyword_fields", list(_DEFAULT_KW))
    )  # sticky per index, like all IndexOptions
    out = analyzed.groupby("range_id").map_groups(
        _write_delta_group,
        fn_kwargs={
            "index_dir": index_dir,
            "plan": plan,
            "seg_offset": seg_offset,
            "keyword_fields": keyword_fields,
            "positions": positions,
        },
        batch_format="pyarrow",
    )
    new_rows = [row for b in out.iter_batches(batch_format="pyarrow") for row in b.to_pylist()]

    segments = reader.manifest["segments"] + [
        {k: r[k] for k in ("seg", "doc_base", "doc_count", "sum_len", "num_terms", "sum_df", "sum_ttf")}
        for r in sorted(new_rows, key=lambda r: r["seg"])
    ]
    return _commit_manifest(index_dir, reader, segments)


def _write_delta_group(group, *, index_dir: str, plan, seg_offset: int,
                       keyword_fields=None, positions=True):
    return SegmentWriter(
        index_dir, plan, seg_offset=seg_offset,
        keyword_fields=keyword_fields or _DEFAULT_KW, positions=positions,
    )(group)


def add_indexes(index_dir: str, *source_dirs: str) -> dict:
    """Publish other indexes' segments into this one WITHOUT re-analysis —
    IndexWriter.addIndexes(Directory...) analog
    (``lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:2680``,
    the no-merge copy path). Each incoming segment directory is copied under
    a fresh segment id with a ``doc_base`` after the current maximum;
    ``docs.parquet``'s global ``doc_id`` column is rewritten to the new range
    (postings/positions store LOCAL doc ids and are byte-identical);
    tombstones (``deletes.parquet``, local ids) copy verbatim.

    IndexOptions are validated like Lucene's FieldInfos checks: positions,
    keyword_fields and stored-content must match the destination. The
    destination's index sort is CLEARED (doc order becomes concatenation, so
    the global doc_id = sort-rank contract no longer holds; Lucene similarly
    refuses mismatched index sorts — we keep the docs and drop the sort
    property instead). Returns the committed manifest."""
    import shutil

    from .segment import segment_dir

    reader = IndexReader(index_dir)
    dest_pos = reader.manifest.get("positions", True)
    dest_kw = list(reader.manifest.get("keyword_fields", list(_DEFAULT_KW)))
    dest_sc = _has_stored_content(reader)
    doc_base = max(
        (s["doc_base"] + s["doc_count"] for s in reader.segments), default=0
    )
    seg_next = max((s["seg"] for s in reader.segments), default=-1) + 1
    segments = list(reader.manifest["segments"])

    for src in source_dirs:
        sreader = IndexReader(src)
        if sreader.manifest.get("positions", True) != dest_pos:
            raise ValueError(
                f"addIndexes positions mismatch: dest={dest_pos}, {src} differs"
            )
        if list(sreader.manifest.get("keyword_fields", list(_DEFAULT_KW))) != dest_kw:
            raise ValueError(f"addIndexes keyword_fields mismatch with {src}")
        if _has_stored_content(sreader) != dest_sc:
            raise ValueError(f"addIndexes stored-content mismatch with {src}")
        for s in sorted(sreader.segments, key=lambda r: r["doc_base"]):
            new_seg = seg_next
            seg_next += 1
            segments.append(
                _copy_segment_rebased(
                    sreader.seg_dir(s["seg"]), index_dir, new_seg, doc_base, s
                )
            )
            doc_base += s["doc_count"]
    return _commit_manifest(index_dir, reader, segments,
                            overrides={"sort_fields": []})


def _copy_segment_rebased(src_seg_dir: str, dest_index_dir: str, new_seg: int,
                          doc_base: int, s: dict) -> dict:
    """Copy one segment directory under a new id with a rebased global
    doc-id range (docs.parquet doc_id rewritten; postings store LOCAL ids
    and copy byte-identical except the seg routing column). Atomic via a
    temp dir + rename. → the manifest row for the copied segment."""
    import shutil

    from .segment import segment_dir

    seg_d = segment_dir(dest_index_dir, new_seg)
    tmp_d = seg_d + ".adding"
    if os.path.exists(tmp_d):
        shutil.rmtree(tmp_d)
    shutil.copytree(src_seg_dir, tmp_d)
    # rewrite global doc ids (rows stay in doc order)
    p = os.path.join(tmp_d, "docs.parquet")
    t = pq.read_table(p)
    new_ids = pa.array(
        doc_base + np.arange(t.num_rows, dtype=np.int64), pa.int64()
    )
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id", new_ids)
    pq.write_table(t, p, row_group_size=65536)
    # rewrite the postings' seg column (scatter paths filter the
    # concatenated postings by seg — a stale id would collide with an
    # existing segment and double its postings)
    pp = os.path.join(tmp_d, "postings.parquet")
    pt = pq.read_table(pp)
    pt = pt.set_column(
        pt.schema.get_field_index("seg"), "seg",
        pa.array(np.full(pt.num_rows, new_seg, dtype=np.int32), pa.int32()),
    )
    pq.write_table(pt, pp, row_group_size=8192)
    meta_p = os.path.join(tmp_d, "_SEGMENT.json")
    try:
        with open(meta_p) as f:
            meta = json.load(f)
        meta["seg"] = new_seg
        meta["doc_base"] = int(doc_base)
        with open(meta_p, "w") as f:
            json.dump(meta, f)
    except (OSError, json.JSONDecodeError):
        pass
    # a leftover target dir is garbage from an interrupted run (the manifest
    # publishing these ids hasn't been written yet) — remove it so re-runs
    # are idempotent instead of failing the rename with ENOTEMPTY
    if os.path.exists(seg_d):
        shutil.rmtree(seg_d)
    os.rename(tmp_d, seg_d)
    return {
        "seg": new_seg,
        "doc_base": int(doc_base),
        **{k: s[k] for k in ("doc_count", "sum_len", "num_terms",
                              "sum_df", "sum_ttf")},
    }


def split_index(src_dir: str, dest_dir: str, seg_ids: list[int]) -> dict:
    """IndexSplitter analog (``lucene/misc/src/java/org/apache/lucene/index/
    IndexSplitter.java:133`` split(destDir, segs)): copy the NAMED segments
    of ``src_dir`` into a fresh standalone index at ``dest_dir`` — the
    segment-granularity reshard (split a too-big index, peel hot partitions
    onto their own serving tier). Payloads copy byte-identical modulo the
    dense doc-id rebase; the destination manifest re-aggregates stats from
    the copied segments and keeps the source's config (positions,
    keyword_fields); the index sort is cleared (doc_id = sort-rank no longer
    holds on a subset)."""
    import types

    sreader = IndexReader(src_dir)
    want = set(seg_ids)
    chosen = [s for s in sorted(sreader.segments, key=lambda r: r["doc_base"])
              if s["seg"] in want]
    if len(chosen) != len(want):
        have = {s["seg"] for s in chosen}
        raise KeyError(f"unknown segment ids: {sorted(want - have)}")
    os.makedirs(dest_dir, exist_ok=True)
    doc_base = 0
    segments = []
    for new_seg, s in enumerate(chosen):
        segments.append(
            _copy_segment_rebased(
                sreader.seg_dir(s["seg"]), dest_dir, new_seg, doc_base, s
            )
        )
        doc_base += s["doc_count"]

    # a reader shim whose seg_dir always misses: _commit_manifest then reads
    # every _SEGMENT.json from the DESTINATION directory (new ids would
    # otherwise collide with source ids and pull the wrong field stats)
    def _miss(seg):
        raise KeyError(seg)

    shim = types.SimpleNamespace(manifest=dict(sreader.manifest), seg_dir=_miss)
    return _commit_manifest(dest_dir, shim, segments,
                            overrides={"sort_fields": []})


def _commit_manifest(index_dir: str, reader: IndexReader, segments: list[dict],
                     overrides: dict | None = None) -> dict:
    from .segment import segment_dir

    stats = IndexStats(
        doc_count=sum(s["doc_count"] for s in segments),
        sum_ttf=sum(s["sum_ttf"] for s in segments),
        sum_df=sum(s["sum_df"] for s in segments),
        num_terms=sum(s["num_terms"] for s in segments),
    )
    # re-aggregate per-field stats from the live segments' _SEGMENT.json
    field_stats: dict[str, dict] = {}
    for s in segments:
        try:
            sd = reader.seg_dir(s["seg"])
        except KeyError:
            sd = segment_dir(index_dir, s["seg"])  # freshly appended delta segment
        try:
            with open(os.path.join(sd, "_SEGMENT.json")) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for fname, fs in meta.get("field_stats", {}).items():
            agg = field_stats.setdefault(
                fname,
                {"doc_count": 0, "num_terms": 0, "sum_df": 0, "sum_ttf": 0,
                 "has_norms": fs.get("has_norms", False)},
            )
            for k in ("doc_count", "num_terms", "sum_df", "sum_ttf"):
                agg[k] += fs.get(k, 0)
    manifest = dict(reader.manifest)
    if field_stats:
        manifest["field_stats"] = field_stats
    if overrides:
        manifest.update(overrides)
    manifest["generation"] = _next_generation(index_dir)
    manifest["stats"] = stats.to_dict()
    manifest["segments"] = sorted(segments, key=lambda s: s["doc_base"])
    tmp = os.path.join(index_dir, f".pending_manifest_{manifest['generation']}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
    return manifest


# ---------------------------------------------------------------------------
# deletes (liveDocs tombstones)
# ---------------------------------------------------------------------------

DELETES_FILE = "deletes.parquet"
SOFT_DELETES_FILE = "soft_deletes.parquet"


def _segment_deletes(seg_dir: str, file: str = DELETES_FILE) -> np.ndarray:
    p = os.path.join(seg_dir, file)
    if not os.path.exists(p):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(p)["local_id"].to_numpy().astype(np.int64)


def _write_segment_deletes(seg_dir: str, local_ids: np.ndarray,
                           file: str = DELETES_FILE) -> None:
    tmp = os.path.join(seg_dir, f".{file}.tmp")
    pq.write_table(
        pa.table({"local_id": pa.array(np.unique(local_ids), pa.int64())}), tmp
    )
    os.replace(tmp, os.path.join(seg_dir, file))


def _delete_by_keys_impl(index_dir: str, keys: list[tuple[str, str, str]],
                         file: str) -> int:
    reader = IndexReader(index_dir)
    # vectorized membership: joined key column vs the key set (Arrow is_in),
    # no per-row Python tuples
    sep = "\x00"
    key_list = [sep.join(k) for k in keys]
    n_new = 0
    for s in reader.segments:
        sd = reader.seg_dir(s["seg"])
        docs = pq.read_table(
            os.path.join(sd, "docs.parquet"), columns=["repo", "path", "commit"]
        )
        joined = pc.binary_join_element_wise(
            docs["repo"].cast(pa.string()),
            docs["path"].cast(pa.string()),
            docs["commit"].cast(pa.string()),
            sep,
        )
        mask = pc.is_in(joined, value_set=pa.array(key_list, pa.string())).to_numpy(
            zero_copy_only=False
        )
        if mask.any():
            hit = np.flatnonzero(mask).astype(np.int64)
            existing = _segment_deletes(sd, file)
            merged = np.union1d(existing, hit)
            n_new += len(merged) - len(existing)
            _write_segment_deletes(sd, merged, file)
    _commit_manifest(index_dir, reader, reader.manifest["segments"])
    return n_new


def delete_by_keys(index_dir: str, keys: list[tuple[str, str, str]]) -> int:
    """Tombstone every doc whose (repo, path, commit) is in ``keys``.
    Returns the number of newly deleted docs."""
    return _delete_by_keys_impl(index_dir, keys, DELETES_FILE)


def soft_delete_by_keys(index_dir: str, keys: list[tuple[str, str, str]]) -> int:
    """Soft-delete by unique key (``IndexWriterConfig.setSoftDeletesField`` +
    soft-delete doc-value writes — ``lucene/core/src/java/org/apache/lucene/
    index/SoftDeletesRetentionMergePolicy.java:1-60``): the docs disappear
    from every search/facet/sort path exactly like tombstones, but live in a
    SEPARATE sidecar (``soft_deletes.parquet``) so they stay recoverable
    (``un_soft_delete_by_keys``) until a merge reclaims them — and a merge
    retains them when a retention query says so (``merge_index(...,
    soft_retention_query=...)``)."""
    return _delete_by_keys_impl(index_dir, keys, SOFT_DELETES_FILE)


def un_soft_delete_by_keys(index_dir: str, keys: list[tuple[str, str, str]]) -> int:
    """Recover soft-deleted docs by unique key (the reverse doc-value write;
    impossible for hard tombstones). → #docs recovered."""
    reader = IndexReader(index_dir)
    sep = "\x00"
    key_list = [sep.join(k) for k in keys]
    n = 0
    for s in reader.segments:
        sd = reader.seg_dir(s["seg"])
        existing = _segment_deletes(sd, SOFT_DELETES_FILE)
        if len(existing) == 0:
            continue
        docs = pq.read_table(
            os.path.join(sd, "docs.parquet"), columns=["repo", "path", "commit"]
        )
        joined = pc.binary_join_element_wise(
            docs["repo"].cast(pa.string()), docs["path"].cast(pa.string()),
            docs["commit"].cast(pa.string()), sep,
        )
        mask = pc.is_in(joined, value_set=pa.array(key_list, pa.string())).to_numpy(
            zero_copy_only=False
        )
        hit = np.flatnonzero(mask).astype(np.int64)
        kept = np.setdiff1d(existing, hit)
        if len(kept) != len(existing):
            n += len(existing) - len(kept)
            _write_segment_deletes(sd, kept, SOFT_DELETES_FILE)
    _commit_manifest(index_dir, reader, reader.manifest["segments"])
    return n


def delete_by_query(index_dir: str, query, use_ray: bool = True,
                    file: str = DELETES_FILE) -> int:
    """Tombstone every doc matching ``query`` (deleteDocuments(Query)).

    Matching is scattered over segments (MatchFieldGroup 'ids' mode); the
    driver groups the returned (seg, local_id) rows and writes per-segment
    tombstones (the match set must reach the tombstone files regardless)."""
    from ..search.searcher import Searcher

    searcher = Searcher(index_dir)
    n_new = 0
    reader = searcher.reader
    per_seg: dict[int, list[np.ndarray]] = {}
    # unwrapped-reader view: a hard delete must tombstone soft-deleted
    # matches too, else un_soft_delete could resurrect hard-deleted docs
    scattered = (searcher._scatter_match(query, "ids",
                                         include_soft_deleted=True)
                 if use_ray else None)
    if scattered is not None:
        for b in scattered.iter_batches(batch_format="pyarrow"):
            if len(b):
                segs = b["seg"].to_numpy()
                lids = b["local_id"].to_numpy().astype(np.int64)
                for sv in np.unique(segs):
                    per_seg.setdefault(int(sv), []).append(lids[segs == sv])
    else:
        for seg, _base, ids in searcher._matches_per_segment(
                query, include_soft_deleted=True):
            if len(ids):
                per_seg.setdefault(seg, []).append(ids.astype(np.int64))
    for seg, parts in per_seg.items():
        ids = np.concatenate(parts)
        sd = reader.seg_dir(seg)
        existing = _segment_deletes(sd, file)
        merged = np.union1d(existing, ids.astype(np.int64))
        n_new += len(merged) - len(existing)
        _write_segment_deletes(sd, merged, file)
    _commit_manifest(index_dir, reader, reader.manifest["segments"])
    return n_new


def soft_delete_by_query(index_dir: str, query, use_ray: bool = True) -> int:
    """Soft-delete every doc matching ``query`` — the query twin of
    :func:`soft_delete_by_keys` (same scatter as delete_by_query; the ids
    land in the soft sidecar instead of tombstones)."""
    return delete_by_query(index_dir, query, use_ray=use_ray,
                           file=SOFT_DELETES_FILE)


def update_documents(index_dir: str, corpus, **add_kwargs) -> dict:
    """updateDocument(Term, doc) analog: delete-by-unique-key then add."""
    import ray.data

    if isinstance(corpus, (str, os.PathLike)):
        corpus = ray.data.read_parquet(str(corpus))
    keys = [
        (r["repo"], r["path"], r["commit"])
        for b in corpus.select_columns(["repo", "path", "commit"]).iter_batches(batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    delete_by_keys(index_dir, keys)
    return add_documents(index_dir, corpus, **add_kwargs)


def atomic_update(index_dir: str, key: tuple[str, str, str], ops: dict) -> dict:
    """Solr atomic update (``solr/core/src/java/org/apache/solr/update/
    processor/AtomicUpdateDocumentMerger.java``): fetch the stored document
    by unique key, apply field modifiers, then ``updateDocument`` the merged
    doc. Supported modifiers per field: ``{"set": v}`` (replace) and
    ``{"add": v}`` (append — string concat with a space, the single-valued
    analog of multi-value add). Requires a ``store_content=True`` index (the
    stored-fields fetch is the RealTimeGet path the reference also uses)."""
    import ray.data

    from .reader import IndexReader

    reader = IndexReader(index_dir)
    repo, path, commit = key
    rows: list[dict] = []
    for seg_ent in reader.segments:
        seg = seg_ent["seg"]
        t = pq.read_table(
            os.path.join(reader.seg_dir(seg), "docs.parquet"),
            filters=[("repo", "=", repo), ("path", "=", path), ("commit", "=", commit)],
        )
        if t.num_rows == 0:
            continue
        if "content" not in t.column_names:
            raise ValueError("atomic_update requires a store_content=True index")
        live = reader.live_mask(seg)
        for r in t.to_pylist():
            local = r["doc_id"] - seg_ent["doc_base"]
            if live is None or bool(live[local]):
                rows.append(r)
    if not rows:
        raise KeyError(f"no live document with key {key}")
    row = rows[0]
    doc = {
        "repo": row["repo"],
        "path": row["path"],
        "commit": row["commit"],
        "lang": row["lang"],
        "content": row["content"],
    }
    for f, mod in ops.items():
        if f not in doc:
            raise KeyError(f"unknown field {f!r}")
        if "set" in mod:
            doc[f] = mod["set"]
        elif "add" in mod:
            doc[f] = f"{doc[f]} {mod['add']}"
        else:
            raise ValueError(f"unsupported modifier {mod!r} (set/add)")
    delta = ray.data.from_arrow(pa.table({k: pa.array([v], pa.string()) for k, v in doc.items()}))
    # add_documents inherits the index's stored-content setting
    return update_documents(index_dir, delta)


def update_numeric_doc_values(index_dir: str,
                              updates: list[tuple[int, str, int]]) -> int:
    """``IndexWriter.updateNumericDocValue(Term, field, value)`` analog:
    in-place numeric doc-value overrides WITHOUT reindexing the document.
    Per-segment sidecar ``dv_updates.parquet`` (local_id, field, value) —
    the docvalue-update "stacked" files of ``index/ReadersAndUpdates.java``;
    last write wins. Norms and postings are untouched (exactly the
    reference's semantics: only the doc value changes, scoring norms don't).

    ``updates``: (global_doc_id, field, value) triples. → #rows written."""
    from .reader import IndexReader

    reader = IndexReader(index_dir)
    per_seg: dict[int, list[tuple[int, str, int]]] = {}
    for gid, field, value in updates:
        ent = next((s for s in reader.segments
                    if s["doc_base"] <= gid < s["doc_base"] + s["doc_count"]), None)
        if ent is None:
            raise KeyError(f"doc id {gid} out of range")
        per_seg.setdefault(ent["seg"], []).append((gid - ent["doc_base"], field, value))
    n = 0
    for seg, rows in per_seg.items():
        path = os.path.join(reader.seg_dir(seg), "dv_updates.parquet")
        existing: list[tuple[int, str, int]] = []
        if os.path.exists(path):
            t = pq.read_table(path)
            existing = list(zip(t["local_id"].to_pylist(), t["field"].to_pylist(),
                                t["value"].to_pylist()))
        superseded = {(lid, f) for lid, f, _ in rows}
        merged = [r for r in existing if (r[0], r[1]) not in superseded] + rows
        tbl = pa.table({
            "local_id": pa.array([r[0] for r in merged], pa.int64()),
            "field": pa.array([r[1] for r in merged], pa.string()),
            "value": pa.array([r[2] for r in merged], pa.int64()),
        })
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        n += len(rows)
    return n


def update_binary_doc_values(index_dir: str,
                             updates: list[tuple[int, str, bytes | str]]) -> int:
    """``IndexWriter.updateBinaryDocValue(Term, field, BytesRef)`` analog
    (``lucene/core/src/java/org/apache/lucene/index/IndexWriter.java:1680-1740``):
    in-place binary/string doc-value overrides WITHOUT reindexing. Sidecar
    ``dv_updates_bin.parquet`` (local_id, field, value binary) per segment —
    the binary twin of the numeric stacked files; last write wins. Postings
    and norms are untouched (the override is visible to the facet /
    sort-by-field / stored-fields read paths, not to term matching — exactly
    the reference split between doc values and the inverted index).

    ``updates``: (global_doc_id, field, value) triples; str values are
    stored utf-8. → #rows written."""
    from .reader import IndexReader

    reader = IndexReader(index_dir)
    per_seg: dict[int, list[tuple[int, str, bytes]]] = {}
    for gid, field, value in updates:
        ent = next((s for s in reader.segments
                    if s["doc_base"] <= gid < s["doc_base"] + s["doc_count"]), None)
        if ent is None:
            raise KeyError(f"doc id {gid} out of range")
        b = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        per_seg.setdefault(ent["seg"], []).append((gid - ent["doc_base"], field, b))
    n = 0
    for seg, rows in per_seg.items():
        path = os.path.join(reader.seg_dir(seg), "dv_updates_bin.parquet")
        existing: list[tuple[int, str, bytes]] = []
        if os.path.exists(path):
            t = pq.read_table(path)
            existing = list(zip(t["local_id"].to_pylist(), t["field"].to_pylist(),
                                t["value"].to_pylist()))
        superseded = {(lid, f) for lid, f, _ in rows}
        merged = [r for r in existing if (r[0], r[1]) not in superseded] + rows
        tbl = pa.table({
            "local_id": pa.array([r[0] for r in merged], pa.int64()),
            "field": pa.array([r[1] for r in merged], pa.string()),
            "value": pa.array([r[2] for r in merged], pa.binary()),
        })
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        n += len(rows)
    return n


def update_doc_values(index_dir: str, term: str, *,
                      numeric: dict[str, int] | None = None,
                      binary: dict[str, bytes | str] | None = None) -> int:
    """``IndexWriter.updateDocValues(Term, Field...)`` analog: apply a mixed
    batch of numeric + binary doc-value updates to EVERY live document
    matching ``term`` (Term addressing, like the reference — the term is
    analyzed content vocabulary). One match pass resolves the doc set; the
    updates then ride the two stacked-sidecar writers. → #docs updated."""
    from ..search.query import TermQuery
    from ..search.searcher import Searcher

    s = Searcher(index_dir)
    gids = s.match_ids(TermQuery(term))
    gid_list = sorted(int(g) for g in gids)
    if not gid_list:
        return 0
    if numeric:
        update_numeric_doc_values(
            index_dir, [(g, f, v) for g in gid_list for f, v in numeric.items()])
    if binary:
        update_binary_doc_values(
            index_dir, [(g, f, v) for g in gid_list for f, v in binary.items()])
    return len(gid_list)


def reindex(src_dir: str, dest_dir: str, *, analyzer=None,
            docs_per_segment: int = 2_000, **build_kw) -> dict:
    """Rebuild an index from its OWN stored fields with a (possibly
    different) analyzer — the Solr reindexing idiom (collection reindex via
    stored fields; requires storedFields, like Solr requires stored="true").
    The corpus streams straight out of the per-segment docs files (pruned to
    the 5 corpus columns), so reindexing is one standard build over a
    Parquet read — no export hop."""
    import ray.data

    from .build import build_index

    reader = IndexReader(src_dir)
    if not _has_stored_content(reader):
        raise ValueError("reindex requires an index built with store_content=True")

    corpus = ray.data.read_parquet(
        reader.docs_files(),
        columns=["repo", "path", "commit", "lang", "content"],
    )
    return build_index(corpus, dest_dir, docs_per_segment=docs_per_segment,
                       analyzer=analyzer, **build_kw)
