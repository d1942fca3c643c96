"""Tiered segment merging — TieredMergePolicy + SegmentMerger analog.

Reference semantics (``index/TieredMergePolicy.java:312``, segsPerTier=10
``:101``; ``index/SegmentMerger.java:104-160``): pick runs of ~10 similar
small segments and merge each run into one segment; readers keep working
across generations because the manifest commit is atomic.

Ours is simpler *and* cheaper than Lucene's: segments are doc-ID-contiguous
ranges, so merging ADJACENT segments never remaps doc IDs (no ``DocIDMerger``)
— per term it is concat-of-decoded-streams + one re-encode. Each merge group
runs as an independent Ray task; the new manifest (generation+1) is committed
atomically. Merged-away dirs are retained for ONE further generation before
deletion (IndexFileDeleter grace analog), so a reader holding the previous
manifest keeps working across a single concurrent merge commit.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..util.forutil import decode_sequences
from ..util.smallfloat import LENGTH_TABLE


def _within(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    total = int(lens.sum())
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    return np.arange(total) - np.repeat(starts[:-1], lens)
from .build import IndexStats, _next_generation
from .reader import IndexReader
from .segment import postings_table_from_flat

SEGS_PER_TIER = 10


def plan_merges_tiered(segments: list[dict], segs_per_tier: int = SEGS_PER_TIER,
                       max_merge_at_once: int | None = None,
                       floor_size: int = 2_000,
                       max_docs_per_segment: int | None = None) -> list[list[dict]]:
    """TieredMergePolicy.findMerges (``index/TieredMergePolicy.java:312-470``)
    with sizes in tokens (``sum_len``) instead of bytes, constrained to
    ADJACENT windows (doc-ID-contiguous ranges are this engine's no-remap
    invariant; Lucene considers any subset of the size-sorted list).

    - allowedSegCount budget (:350-375): levelSize starts at
      max(floor_size, smallest segment), each level admits ``segs_per_tier``
      segments and multiplies levelSize by ``max_merge_at_once``; no merge
      runs while the count is within budget (amortized write cost — the
      property the greedy-runs mode lacks).
    - candidate scoring (:506-540): skew = floored(max member size) /
      totAfterMergeSize, mergeScore = skew · totAfterMergeSize^0.05 (no
      deletes here ⇒ the reclaim factor is 1); lowest score wins. Balanced
      merges of large-enough segments approach skew 1/N.
    """
    if max_merge_at_once is None:
        max_merge_at_once = segs_per_tier
    alive = sorted(segments, key=lambda x: x["doc_base"])
    if len(alive) < 2:
        return []

    def size(s: dict) -> int:
        return max(int(s.get("sum_len", s["doc_count"])), 1)

    def floored(v: float) -> float:
        return max(float(v), float(floor_size))

    sizes = [size(s) for s in alive]
    tot = float(sum(sizes))
    level = floored(min(sizes))
    allowed, left = 0, tot
    while True:
        seg_count_level = left / level
        if seg_count_level < segs_per_tier:
            allowed += int(np.ceil(seg_count_level))
            break
        allowed += segs_per_tier
        left -= segs_per_tier * level
        level *= max_merge_at_once
    allowed = max(allowed, segs_per_tier)

    groups: list[list[dict]] = []
    taken = [False] * len(alive)
    remaining = len(alive)
    while remaining > allowed:
        best, best_score = None, None
        for i in range(len(alive)):
            if taken[i]:
                continue
            w_size = 0.0
            w_docs = 0
            for j in range(i, min(i + max_merge_at_once, len(alive))):
                if taken[j]:
                    break
                w_size += sizes[j]
                w_docs += alive[j]["doc_count"]
                if j == i:
                    continue
                if max_docs_per_segment and w_docs > max_docs_per_segment:
                    break
                skew = floored(max(sizes[i : j + 1])) / floored(w_size)
                score = skew * (floored(w_size) ** 0.05)
                if best_score is None or score < best_score:
                    best, best_score = (i, j), score
        if best is None:
            break
        i, j = best
        groups.append(alive[i : j + 1])
        for x in range(i, j + 1):
            taken[x] = True
        remaining -= (j - i + 1) - 1
    return groups


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


def _decode_member(tbl: pa.Table, base: int):
    """Decode a member's whole postings table with the batch decoder
    (zero-copy over the Arrow binary buffers) → flat arrays + row offsets."""
    dfs = tbl["df"].to_numpy().astype(np.int64)
    ttfs = tbl["ttf"].to_numpy().astype(np.int64)

    def col_buf(name):
        arr = tbl[name].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], pa.large_binary())
        if len(arr) == 0:
            return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
        bufs = arr.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
        data = (
            np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None
            else np.zeros(0, dtype=np.uint8)
        )
        return data, offs

    dbuf, doffs = col_buf("doc_blob")
    deltas = decode_sequences(dbuf, doffs, dfs)
    # segmented cumsum → absolute local ids (delta[0] = id0 + 1)
    row_vstart = np.zeros(len(dfs) + 1, dtype=np.int64)
    np.cumsum(dfs, out=row_vstart[1:])
    c = np.cumsum(deltas)
    seg_base = np.where(row_vstart[:-1] > 0, c[np.maximum(row_vstart[:-1] - 1, 0)], 0)
    ids = c - np.repeat(seg_base, dfs) - 1 + base

    fbuf, foffs = col_buf("freq_blob")
    tfs = decode_sequences(fbuf, foffs, dfs)

    pbuf, poffs = col_buf("pos_blob")
    has_pos = len(pbuf) > 0
    pos = decode_sequences(pbuf, poffs, ttfs) if has_pos else None
    row_pstart = np.zeros(len(dfs) + 1, dtype=np.int64)
    np.cumsum(ttfs, out=row_pstart[1:])
    # payload stream: raw float32 per occurrence in the same ttf layout as
    # positions — but rows without payloads (keyword fields, payload-free
    # terms) store EMPTY slices, so NaN-expand to the full occurrence grid
    pay = None
    if "pay_blob" in tbl.column_names:
        ybuf, yoffs = col_buf("pay_blob")
        row_bytes = np.diff(yoffs)
        if row_bytes.sum() > 0:
            vals = np.frombuffer(ybuf[yoffs[0] : yoffs[-1]].tobytes(), dtype=np.float32)
            have = np.flatnonzero(row_bytes > 0)
            pay = np.full(int(ttfs.sum()), np.nan, dtype=np.float32)
            dst = np.repeat(row_pstart[:-1][have], ttfs[have]) + _within(ttfs[have])
            pay[dst] = vals
    # char-offset stream: interleaved (start, end) int32 pairs per
    # occurrence, same ttf layout as positions; rows without offsets store
    # empty slices → sentinel-expand with start = -1 (the re-encode drops
    # offsets for terms whose merged occurrences are not fully covered)
    off = None
    if "off_blob" in tbl.column_names:
        obuf, ooffs = col_buf("off_blob")
        row_bytes = np.diff(ooffs)
        if row_bytes.sum() > 0:
            vals = np.frombuffer(
                obuf[ooffs[0] : ooffs[-1]].tobytes(), dtype=np.int32
            ).reshape(-1, 2)
            have = np.flatnonzero(row_bytes > 0)
            off = np.full((int(ttfs.sum()), 2), -1, dtype=np.int32)
            dst = np.repeat(row_pstart[:-1][have], ttfs[have]) + _within(ttfs[have])
            off[dst] = vals
    return ids, tfs, pos, row_vstart, row_pstart, pay, off


def _merge_group(index_dir: str, members: list[dict], dirs: list[str], generation: int) -> dict:
    """Merge one run of adjacent segments into a new segment dir; returns the
    new manifest entry. Pure function of its inputs → safe to retry."""
    members = sorted(members, key=lambda s: s["doc_base"])
    new_base = members[0]["doc_base"]
    seg_id = members[0]["seg"]

    docs = pa.concat_tables(
        [pq.read_table(os.path.join(d, "docs.parquet")) for d in dirs],
        promote_options="default",  # stored-content column may be partial across members
    )
    norms = docs["norm_byte"].to_numpy().astype(np.int64)
    norm_len = LENGTH_TABLE[norms]

    bases = np.array([m["doc_base"] - new_base for m in members], dtype=np.int64)
    import pyarrow.compute as pc

    raw = [pq.read_table(os.path.join(d, "postings.parquet")) for d in dirs]
    # positions are per-FIELD all-or-none across members (IndexOptions is a
    # per-field property): content/keyword fields carry position streams,
    # FeatureField rows never do (DOCS_AND_FREQS — tf is the quantized
    # feature value, so tf-proportional positions would explode). A field
    # with positions in one member but not another cannot be aligned → raise.
    field_pos: dict[str, bool] = {}
    for t in raw:
        if not len(t):
            continue
        plens = pc.binary_length(t["pos_blob"]).to_numpy().astype(np.int64)
        farr = t["field"]
        if isinstance(farr, pa.ChunkedArray):
            farr = farr.combine_chunks()
        de = pc.dictionary_encode(farr)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy()
        for k, fname in enumerate(de.dictionary.to_pylist()):
            sel = codes == k
            if not np.any(sel):
                continue
            mx, mn = int(plens[sel].max()), int(plens[sel].min())
            has = mx > 0
            if has and mn == 0:
                raise ValueError(
                    f"cannot merge: field {fname!r} mixes positioned and "
                    "position-less rows within one segment"
                )
            prev = field_pos.get(fname)
            if prev is None:
                field_pos[fname] = has
            elif prev != has:
                raise ValueError(
                    f"cannot merge: field {fname!r} has positions in some "
                    "members but not others (mixed IndexOptions); rebuild "
                    "the delta with matching options"
                )
    pos_fields = sorted(f for f, b in field_pos.items() if b)
    nopos_fields = sorted(f for f, b in field_pos.items() if not b)
    parts = []
    for flds in (pos_fields, nopos_fields):
        if not flds:
            continue
        sub = [
            t.filter(pc.is_in(t["field"], value_set=pa.array(flds, pa.string())))
            for t in raw
        ]
        parts.append(_merge_postings_rows(seg_id, sub, bases, norm_len))
    if parts:
        postings_tbl = pa.concat_tables(parts)
        if len(parts) > 1:
            postings_tbl = postings_tbl.sort_by(
                [("field", "ascending"), ("term", "ascending")]
            )
    else:
        from .segment import POSTINGS_SCHEMA

        postings_tbl = pa.table(
            {f.name: pa.array([], f.type) for f in POSTINGS_SCHEMA}
        )
    return _commit_merged_segment(
        index_dir, members, dirs, generation, docs, postings_tbl, bases,
        new_base, seg_id
    )


def _merge_postings_rows(seg_id: int, member_tables: list[pa.Table],
                         bases: np.ndarray, norm_len: np.ndarray) -> pa.Table:
    """Merge one position-class of postings rows (every row has positions, or
    none does) across members → encoded postings table for the new segment."""
    member_posts = []
    decoded = []
    for mi, t in enumerate(member_tables):
        decoded.append(_decode_member(t, int(bases[mi])))
        t = t.append_column("morder", pa.array(np.full(len(t), mi, dtype=np.int32)))
        t = t.append_column("mrow", pa.array(np.arange(len(t), dtype=np.int64)))
        member_posts.append(t.select(["field", "term", "df", "ttf", "morder", "mrow"]))
    posts = pa.concat_tables(member_posts).sort_by(
        [("field", "ascending"), ("term", "ascending"), ("morder", "ascending")]
    )
    pos_flags = [d[2] is not None for d, mp in zip(decoded, member_posts) if len(mp)]
    if any(pos_flags) and not all(pos_flags):
        raise ValueError(
            "cannot merge segments with mixed positions options "
            "(some members were built with positions=False); "
            "rebuild the delta with matching IndexOptions"
        )
    has_pos = bool(pos_flags) and all(pos_flags)
    # payloads may be PARTIAL across members (an occurrence without a payload
    # is NaN by construction), but they ride the position permutation, so a
    # payload-bearing member without positions cannot be aligned
    has_pay = any(d[5] is not None for d, mp in zip(decoded, member_posts) if len(mp))
    if has_pay and not has_pos:
        raise ValueError("cannot merge payload-bearing segments built without positions")
    has_off = any(d[6] is not None for d, mp in zip(decoded, member_posts) if len(mp))
    if has_off and not has_pos:
        raise ValueError("cannot merge offset-bearing segments built without positions")

    dfs_sorted = posts["df"].to_numpy().astype(np.int64)
    ttfs_sorted = posts["ttf"].to_numpy().astype(np.int64)
    morder = posts["morder"].to_numpy()
    mrow = posts["mrow"].to_numpy()
    n_rows = len(posts)
    N = int(dfs_sorted.sum())
    P = int(ttfs_sorted.sum())

    out_vstart = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(dfs_sorted, out=out_vstart[1:])
    out_pstart = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(ttfs_sorted, out=out_pstart[1:])

    s_doc = np.empty(N, dtype=np.int64)
    s_tf = np.empty(N, dtype=np.int64)
    pos_deltas = np.empty(P, dtype=np.int64) if has_pos else None
    pay_floats = np.full(P, np.nan, dtype=np.float32) if has_pay else None
    off_pairs = np.full((P, 2), -1, dtype=np.int32) if has_off else None
    for mi in range(len(member_tables)):
        ids_m, tfs_m, pos_m, rv, rp, pay_m, off_m = decoded[mi]
        rmask = morder == mi
        rows = mrow[rmask]
        lens = dfs_sorted[rmask]
        within = _within(lens)
        src = np.repeat(rv[rows], lens) + within
        dst = np.repeat(out_vstart[:-1][rmask], lens) + within
        s_doc[dst] = ids_m[src]
        s_tf[dst] = tfs_m[src]
        if has_pos and pos_m is not None:
            plens = ttfs_sorted[rmask]
            pwithin = _within(plens)
            psrc = np.repeat(rp[rows], plens) + pwithin
            pdst = np.repeat(out_pstart[:-1][rmask], plens) + pwithin
            pos_deltas[pdst] = pos_m[psrc]
            if has_pay and pay_m is not None:
                pay_floats[pdst] = pay_m[psrc]
            if has_off and off_m is not None:
                off_pairs[pdst] = off_m[psrc]

    # (field, term) groups over the sorted rows
    terms_sorted = posts["term"]
    if isinstance(terms_sorted, pa.ChunkedArray):
        terms_sorted = terms_sorted.combine_chunks()
    fields_sorted = posts["field"]
    if isinstance(fields_sorted, pa.ChunkedArray):
        fields_sorted = fields_sorted.combine_chunks()
    import pyarrow.compute as pc

    neq = np.ones(n_rows, dtype=bool)
    if n_rows > 1:
        t_neq = ~pc.equal(terms_sorted.slice(1), terms_sorted.slice(0, n_rows - 1)).to_numpy(
            zero_copy_only=False
        )
        f_neq = ~pc.equal(fields_sorted.slice(1), fields_sorted.slice(0, n_rows - 1)).to_numpy(
            zero_copy_only=False
        )
        neq[1:] = t_neq | f_neq
    row_group_starts = np.flatnonzero(neq)
    starts_np = out_vstart[:-1][row_group_starts]
    group_sizes = np.diff(np.append(row_group_starts, n_rows))
    dfs_np = np.add.reduceat(dfs_sorted, row_group_starts) if n_rows else np.empty(0, np.int64)
    ttfs_np = np.add.reduceat(ttfs_sorted, row_group_starts) if n_rows else np.empty(0, np.int64)
    out_terms = terms_sorted.take(pa.array(row_group_starts)) if n_rows else pa.array([], pa.string())
    out_fields = fields_sorted.take(pa.array(row_group_starts)) if n_rows else pa.array([], pa.string())
    doc_lens = norm_len[s_doc]

    return postings_table_from_flat(
        seg_id,
        out_terms,
        starts_np,
        dfs_np,
        ttfs_np,
        s_doc,
        s_tf,
        doc_lens,
        pos_deltas,
        field=out_fields,
        pay_floats=pay_floats,
        off_pairs=off_pairs,
    )


def _commit_merged_segment(index_dir: str, members: list[dict], dirs: list[str],
                           generation: int, docs: pa.Table, postings_tbl: pa.Table,
                           bases: np.ndarray, new_base: int, seg_id: int) -> dict:
    """Write the merged segment dir atomically and return its manifest entry."""
    dir_name = f"seg={seg_id:06d}-g{generation}"
    tmp = os.path.join(index_dir, "segments", f".tmp-merge-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(docs, os.path.join(tmp, "docs.parquet"), row_group_size=65536)
    pq.write_table(postings_tbl, os.path.join(tmp, "postings.parquet"), row_group_size=8192)
    # rebuild the 1-D point index over the merged docs (BKD merge analog)
    from .points import build_points_table

    pq.write_table(
        build_points_table(
            {"field_len": docs["field_len"].to_numpy().astype(np.int64)}
        ),
        os.path.join(tmp, "points.parquet"),
        row_group_size=1024,
    )
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
    # carry doc-value update sidecars + soft deletes forward
    # (updateNumericDocValue / updateBinaryDocValue stacked files and the
    # soft-deletes doc values survive merges in the reference —
    # ReadersAndUpdates materializes them; we rebase local ids like deletes.
    # Retention policy already ran in merge_index: whatever is still in
    # soft_deletes.parquet here is the retained set)
    for sidecar in ("dv_updates.parquet", "dv_updates_bin.parquet",
                    "soft_deletes.parquet"):
        upd_parts = []
        for mi, d in enumerate(dirs):
            up = os.path.join(d, sidecar)
            if os.path.exists(up):
                ut = pq.read_table(up)
                lid = pa.array(ut["local_id"].to_numpy().astype(np.int64) + bases[mi], pa.int64())
                upd_parts.append(ut.set_column(ut.schema.get_field_index("local_id"), "local_id", lid))
        if upd_parts:
            pq.write_table(
                pa.concat_tables(upd_parts), os.path.join(tmp, sidecar)
            )
    # per-field stats from the merged rows (top-level stats = content field)
    from .segment import CONTENT_FIELD

    n_rows = len(postings_tbl)
    out_fields_np = np.asarray(postings_tbl["field"].to_pylist(), dtype=object)
    dfs_np = postings_tbl["df"].to_numpy().astype(np.int64)
    ttfs_np = postings_tbl["ttf"].to_numpy().astype(np.int64)
    field_stats = {}
    for f in np.unique(out_fields_np) if n_rows else []:
        m = out_fields_np == f
        field_stats[str(f)] = {
            "doc_count": int(len(docs)),
            "num_terms": int(m.sum()),
            "sum_df": int(dfs_np[m].sum()),
            "sum_ttf": int(ttfs_np[m].sum()),
            "has_norms": str(f) == CONTENT_FIELD,
        }
    c = field_stats.get(CONTENT_FIELD, {"num_terms": 0, "sum_df": 0, "sum_ttf": 0})
    meta = {
        "seg": seg_id,
        "dir": dir_name,
        "doc_base": int(new_base),
        "doc_count": int(len(docs)),
        "sum_len": int(docs["field_len"].to_numpy().sum()) if len(docs) else 0,
        "num_terms": c["num_terms"],
        "sum_df": c["sum_df"],
        "sum_ttf": c["sum_ttf"],
        "field_stats": field_stats,
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


def _apply_soft_retention(index_dir: str, reader: IndexReader,
                          groups: list[list[dict]], retention_query) -> None:
    """SoftDeletesRetentionMergePolicy analog (``lucene/core/src/java/org/
    apache/lucene/index/SoftDeletesRetentionMergePolicy.java:60-120``,
    ``wrapLiveDocs``): before the merge commits, soft-deleted docs in the
    merged members that do NOT match the retention query are RECLAIMED
    (converted to hard tombstones — unrecoverable, the merge's reclamation);
    matching docs stay soft and ride the sidecar carry (recoverable).
    ``retention_query=None`` reclaims everything (plain soft-deletes merge)."""
    from .update import (SOFT_DELETES_FILE, _segment_deletes,
                         _write_segment_deletes)

    member_segs = {m["seg"] for g in groups for m in g}
    retained: dict[int, np.ndarray] = {}
    if retention_query is not None:
        from ..search.searcher import Searcher

        searcher = Searcher(index_dir)
        # retention must see soft-deleted docs (they're exactly the ones at
        # stake) — match with only hard tombstones masked
        for seg, _base, ids in searcher._matches_per_segment(
                retention_query, include_soft_deleted=True):
            if seg in member_segs:
                retained[seg] = ids.astype(np.int64)
    for seg in member_segs:
        sd = reader.seg_dir(seg)
        soft = _segment_deletes(sd, SOFT_DELETES_FILE)
        if len(soft) == 0:
            continue
        keep = np.intersect1d(soft, retained.get(seg, np.empty(0, np.int64)))
        reclaim = np.setdiff1d(soft, keep)
        if len(reclaim):
            _write_segment_deletes(sd, np.union1d(_segment_deletes(sd), reclaim))
            _write_segment_deletes(sd, keep, SOFT_DELETES_FILE)


def merge_index(index_dir: str, *, segs_per_tier: int = SEGS_PER_TIER,
                max_docs_per_segment: int | None = None, use_ray: bool = True,
                policy: str = "runs", soft_retention_query=None,
                apply_soft_retention: bool = False) -> dict:
    """Run one round of merging; commits a new manifest generation and
    deletes obsolete segment dirs. Returns {merges, segments_before/after}.

    ``policy="runs"`` (default): greedy adjacent runs — every round compacts
    toward ~1/segs_per_tier of the segment count (the force-merge shape).
    ``policy="tiered"``: TieredMergePolicy.findMerges scoring — merges only
    while the segment count exceeds the tier budget, picking the
    lowest-skew adjacent windows (the steady-state NRT shape).

    ``apply_soft_retention=True`` runs the SoftDeletesRetentionMergePolicy
    step over the merged members: soft-deleted docs matching
    ``soft_retention_query`` stay soft (recoverable after the merge); the
    rest become hard tombstones. Default off — soft deletes then survive
    merges untouched (the no-merge-policy reader-wrap-only configuration)."""
    reader = IndexReader(index_dir)
    if policy == "tiered":
        groups = plan_merges_tiered(reader.segments, segs_per_tier,
                                    max_docs_per_segment=max_docs_per_segment)
    else:
        groups = plan_merges(reader.segments, segs_per_tier, max_docs_per_segment)
    if not groups:
        return {"merges": 0, "segments_before": len(reader.segments),
                "segments_after": len(reader.segments)}
    if apply_soft_retention:
        _apply_soft_retention(index_dir, reader, groups, soft_retention_query)
    generation = _next_generation(index_dir)

    group_dirs = [[reader.seg_dir(m["seg"]) for m in g] for g in groups]
    # Fan groups out to a few warm workers, each streaming its chunk. The
    # byte-span FOR codec (forutil.py) touches ~8x less memory than the old
    # bit-plane one, so parallel workers no longer saturate the memory bus:
    # measured on a 100-segment/200k index with warm workers, 8 workers
    # 22-39s vs sequential-driver 75-86s (the OLD kernel inverted this,
    # which is why the previous default was sequential for <=16 groups).
    # At 100-TB scale thousands of groups amortize each worker's one-time
    # first-touch warmup; workers stay few so merge doesn't starve
    # concurrent build/query stages.
    seq_threshold = int(os.environ.get("LSR_MERGE_SEQ_THRESHOLD", "1"))
    if use_ray and len(groups) <= seq_threshold:
        use_ray = False
    if use_ray:
        import ray

        n_workers = min(len(groups), int(os.environ.get("LSR_MERGE_WORKERS", "8")))
        work = list(zip(groups, group_dirs))
        chunks = [work[i::n_workers] for i in range(n_workers)]

        # num_cpus=1 so the tasks REUSE the build's already-warm default
        # workers — a custom num_cpus forces fresh worker processes, each
        # paying the 20-35s first-touch warmup (measured: 10 groups 218s at
        # num_cpus=2/fresh vs 63s sequential-warm)
        @ray.remote(num_cpus=1)
        def _merge_chunk(index_dir: str, chunk: list, generation: int) -> list[dict]:
            return [_merge_group(index_dir, g, dirs, generation) for g, dirs in chunk]

        new_entries = [
            e
            for out in ray.get(
                [_merge_chunk.remote(index_dir, c, generation) for c in chunks if c]
            )
            for e in out
        ]
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
    # re-aggregate per-field stats: kept segments' _SEGMENT.json + new metas
    field_stats: dict[str, dict] = {}
    kept_metas = []
    for s in keep:
        try:
            with open(os.path.join(reader.seg_dir(s["seg"]), "_SEGMENT.json")) as f:
                kept_metas.append(json.load(f))
        except (OSError, json.JSONDecodeError):
            pass
    for meta in kept_metas + list(new_entries):
        for fname, fs in meta.get("field_stats", {}).items():
            agg = field_stats.setdefault(
                fname,
                {"doc_count": 0, "num_terms": 0, "sum_df": 0, "sum_ttf": 0,
                 "has_norms": fs.get("has_norms", False)},
            )
            for k in ("doc_count", "num_terms", "sum_df", "sum_ttf"):
                agg[k] += fs.get(k, 0)

    manifest = dict(reader.manifest)
    manifest["generation"] = generation
    manifest["stats"] = stats.to_dict()
    manifest["field_stats"] = field_stats or reader.manifest.get("field_stats", {})
    manifest["segments"] = [
        {k: s[k] for k in ("seg", "doc_base", "doc_count", "sum_len", "num_terms", "sum_df", "sum_ttf")}
        | ({"dir": s["dir"]} if "dir" in s else {})
        for s in segments
    ]
    # one-generation retention (IndexFileDeleter grace analog): dirs merged
    # away NOW stay on disk until the NEXT manifest flip, so a reader holding
    # the previous manifest keeps working across this commit; dirs obsoleted
    # by earlier generations are reclaimed here.
    old_dirs = sorted({d for dirs in group_dirs for d in dirs})
    reclaim = [
        e for e in reader.manifest.get("obsolete", []) if e["generation"] < generation
    ]
    manifest["obsolete"] = [
        e for e in reader.manifest.get("obsolete", []) if e["generation"] >= generation
    ] + [{"dir": os.path.relpath(d, index_dir), "generation": generation} for d in old_dirs]
    tmp = os.path.join(index_dir, f".pending_manifest_{generation}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))

    for e in reclaim:
        shutil.rmtree(os.path.join(index_dir, e["dir"]), ignore_errors=True)
    return {
        "merges": len(groups),
        "segments_before": len(reader.segments),
        "segments_after": len(segments),
        "generation": generation,
    }
