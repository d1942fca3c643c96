"""Tiered segment merging — TieredMergePolicy + SegmentMerger analog.

Reference semantics (``index/TieredMergePolicy.java:312``, segsPerTier=10
``:101``; ``index/SegmentMerger.java:104-160``): pick runs of ~10 similar
small segments and merge each run into one segment; readers keep working
across generations because the manifest commit is atomic.

Ours is simpler *and* cheaper than Lucene's: segments are doc-ID-contiguous
ranges, so merging ADJACENT segments never remaps doc IDs (no ``DocIDMerger``)
— per term it is concat-of-decoded-streams + one re-encode. Each merge group
runs as an independent Ray task; the new manifest (generation+1) is committed
atomically, then obsolete segment dirs are deleted (IndexFileDeleter
refcount analog: nothing references them once the manifest flips).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..util.forutil import decode_blocks, decode_postings
from ..util.smallfloat import LENGTH_TABLE
from .build import IndexStats, _next_generation
from .reader import IndexReader
from .segment import postings_table_from_flat

SEGS_PER_TIER = 10


def plan_merges(segments: list[dict], segs_per_tier: int = SEGS_PER_TIER,
                max_docs_per_segment: int | None = None) -> list[list[dict]]:
    """Greedy adjacent grouping: runs of up to ``segs_per_tier`` consecutive
    segments (doc-range order), optionally capped by merged doc count."""
    groups: list[list[dict]] = []
    cur: list[dict] = []
    cur_docs = 0
    for s in sorted(segments, key=lambda x: x["doc_base"]):
        if cur and (
            len(cur) >= segs_per_tier
            or (max_docs_per_segment and cur_docs + s["doc_count"] > max_docs_per_segment)
        ):
            groups.append(cur)
            cur, cur_docs = [], 0
        cur.append(s)
        cur_docs += s["doc_count"]
    if cur:
        groups.append(cur)
    return [g for g in groups if len(g) >= 2]


def _merge_group(index_dir: str, members: list[dict], dirs: list[str], generation: int) -> dict:
    """Merge one run of adjacent segments into a new segment dir; returns the
    new manifest entry. Pure function of its inputs → safe to retry."""
    members = sorted(members, key=lambda s: s["doc_base"])
    new_base = members[0]["doc_base"]
    seg_id = members[0]["seg"]

    docs = pa.concat_tables([pq.read_table(os.path.join(d, "docs.parquet")) for d in dirs])
    norms = docs["norm_byte"].to_numpy().astype(np.int64)
    norm_len = LENGTH_TABLE[norms]

    member_posts = []
    for mi, d in enumerate(dirs):
        t = pq.read_table(os.path.join(d, "postings.parquet"))
        t = t.append_column("morder", pa.array(np.full(len(t), mi, dtype=np.int32)))
        member_posts.append(t)
    posts = pa.concat_tables(member_posts).sort_by([("term", "ascending"), ("morder", "ascending")])

    terms = posts["term"].to_pylist()
    dfs_in = posts["df"].to_numpy()
    morder = posts["morder"].to_numpy()
    bases = np.array([m["doc_base"] - new_base for m in members], dtype=np.int64)
    has_pos = bool(len(posts)) and any(len(posts["pos_blob"][i].as_py() or b"") for i in range(len(posts)))

    out_terms: list[str] = []
    starts: list[int] = []
    dfs_out: list[int] = []
    ttfs_out: list[int] = []
    id_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    pos_parts: list[np.ndarray] = []
    total = 0
    i = 0
    n_rows = len(posts)
    while i < n_rows:
        j = i
        t_ids, t_tfs, t_pos = [], [], []
        while j < n_rows and terms[j] == terms[i]:
            df = int(dfs_in[j])
            ids, freqs = decode_postings(
                posts["doc_blob"][j].as_py(), posts["freq_blob"][j].as_py(), df
            )
            t_ids.append(ids + bases[morder[j]])
            t_tfs.append(freqs.astype(np.int64))
            if has_pos:
                pb = posts["pos_blob"][j].as_py() or b""
                ttf_j = int(freqs.sum())
                t_pos.append(decode_blocks(pb, ttf_j).astype(np.int64))
            j += 1
        ids = np.concatenate(t_ids)
        tfs = np.concatenate(t_tfs)
        out_terms.append(terms[i])
        starts.append(total)
        dfs_out.append(len(ids))
        ttfs_out.append(int(tfs.sum()))
        id_parts.append(ids)
        tf_parts.append(tfs)
        if has_pos:
            pos_parts.append(np.concatenate(t_pos))
        total += len(ids)
        i = j

    s_doc = np.concatenate(id_parts) if id_parts else np.empty(0, dtype=np.int64)
    s_tf = np.concatenate(tf_parts) if tf_parts else np.empty(0, dtype=np.int64)
    pos_deltas = np.concatenate(pos_parts) if (has_pos and pos_parts) else None
    starts_np = np.asarray(starts, dtype=np.int64)
    dfs_np = np.asarray(dfs_out, dtype=np.int64)
    ttfs_np = np.asarray(ttfs_out, dtype=np.int64)
    doc_lens = norm_len[s_doc]

    postings_tbl = postings_table_from_flat(
        seg_id,
        pa.array(out_terms, pa.string()),
        starts_np,
        dfs_np,
        ttfs_np,
        s_doc,
        s_tf,
        doc_lens,
        pos_deltas,
    )

    dir_name = f"seg={seg_id:06d}-g{generation}"
    tmp = os.path.join(index_dir, "segments", f".tmp-merge-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(docs, os.path.join(tmp, "docs.parquet"), row_group_size=65536)
    pq.write_table(postings_tbl, os.path.join(tmp, "postings.parquet"), row_group_size=8192)
    # carry member tombstones forward (liveDocs survive merges; local ids shift by base)
    del_parts = []
    for mi, d in enumerate(dirs):
        dp = os.path.join(d, "deletes.parquet")
        if os.path.exists(dp):
            dl = pq.read_table(dp)["local_id"].to_numpy().astype(np.int64)
            if len(dl):
                del_parts.append(dl + bases[mi])
    if del_parts:
        pq.write_table(
            pa.table({"local_id": pa.array(np.unique(np.concatenate(del_parts)), pa.int64())}),
            os.path.join(tmp, "deletes.parquet"),
        )
    meta = {
        "seg": seg_id,
        "dir": dir_name,
        "doc_base": int(new_base),
        "doc_count": int(len(docs)),
        "sum_len": int(docs["field_len"].to_numpy().sum()) if len(docs) else 0,
        "num_terms": int(len(postings_tbl)),
        "sum_df": int(dfs_np.sum()),
        "sum_ttf": int(ttfs_np.sum()),
        "lineage": {"merged_from": [m["seg"] for m in members], "generation": generation},
    }
    with open(os.path.join(tmp, "_SEGMENT.json"), "w") as f:
        json.dump(meta, f)
    final = os.path.join(index_dir, "segments", dir_name)
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return meta


def merge_index(index_dir: str, *, segs_per_tier: int = SEGS_PER_TIER,
                max_docs_per_segment: int | None = None, use_ray: bool = True) -> dict:
    """Run one round of tiered merging; commits a new manifest generation and
    deletes obsolete segment dirs. Returns {merges, segments_before/after}."""
    reader = IndexReader(index_dir)
    groups = plan_merges(reader.segments, segs_per_tier, max_docs_per_segment)
    if not groups:
        return {"merges": 0, "segments_before": len(reader.segments),
                "segments_after": len(reader.segments)}
    generation = _next_generation(index_dir)

    group_dirs = [[reader.seg_dir(m["seg"]) for m in g] for g in groups]
    if use_ray:
        import ray

        task = ray.remote(_merge_group)
        new_entries = ray.get([
            task.remote(index_dir, g, dirs, generation) for g, dirs in zip(groups, group_dirs)
        ])
    else:
        new_entries = [
            _merge_group(index_dir, g, dirs, generation) for g, dirs in zip(groups, group_dirs)
        ]

    merged_ids = {m["seg"] for g in groups for m in g}
    keep = [s for s in reader.segments if s["seg"] not in merged_ids]
    segments = sorted(keep + list(new_entries), key=lambda s: s["doc_base"])
    stats = IndexStats(
        doc_count=sum(s["doc_count"] for s in segments),
        sum_ttf=sum(s["sum_ttf"] for s in segments),
        sum_df=sum(s["sum_df"] for s in segments),
        num_terms=sum(s["num_terms"] for s in segments),
    )
    manifest = dict(reader.manifest)
    manifest["generation"] = generation
    manifest["stats"] = stats.to_dict()
    manifest["segments"] = [
        {k: s[k] for k in ("seg", "doc_base", "doc_count", "sum_len", "num_terms", "sum_df", "sum_ttf")}
        | ({"dir": s["dir"]} if "dir" in s else {})
        for s in segments
    ]
    tmp = os.path.join(index_dir, f".pending_manifest_{generation}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))

    # delete obsolete dirs (nothing references them after the manifest flip)
    old_dirs = {d for dirs in group_dirs for d in dirs}
    for d in old_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return {
        "merges": len(groups),
        "segments_before": len(reader.segments),
        "segments_after": len(segments),
        "generation": generation,
    }
