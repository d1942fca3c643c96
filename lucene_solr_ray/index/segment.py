"""Segment construction: the analyze → invert → encode → write stages.

Replaces Lucene's in-heap postings accumulation
(``index/TermsHashPerField.java:147-151``, ``index/FreqProxTermsWriter.java:68-105``)
and codec flush (``codecs/lucene50/Lucene50PostingsWriter.java:214-351``) with
Arrow-native explode + integer-key sort + numpy FOR packing inside a single
``map_groups`` task per segment. A segment is a doc-ID-contiguous partition
(Lucene leaf analog) laid out as::

    <index_dir>/segments/seg=<rid>/docs.parquet      doc_id-sorted doc metadata + norms
    <index_dir>/segments/seg=<rid>/postings.parquet  term-sorted postings + block-max meta
    <index_dir>/segments/seg=<rid>/_SEGMENT.json     per-partition lineage + metrics

Segment dirs are written to a temp dir then renamed (atomic commit per
partition → resumable builds; ``index/SegmentInfos.java:57-138`` two-phase
analog).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..analysis.tokenizer import ArrowAnalyzer, StandardAnalyzer
from ..util.forutil import encode_sequences
from ..util.smallfloat import LENGTH_TABLE, int_to_byte4
from .plan import BuildPlan, sort_keys

#: bump when the on-disk segment layout changes (cache invalidation)
FORMAT_VERSION = 7  # v7: off_blob column (index-stored offsets); v6: FeatureField postings; v5: pay_blob

#: the analyzed full-text field (TextField analog — tokenized, with norms);
#: all other indexed fields are keyword fields (StringField analog — one
#: verbatim term, position 0, omitNorms). Lucene models this per-field in
#: FieldInfos (``index/FieldInfos.java``, ``index/IndexOptions.java``).
CONTENT_FIELD = "content"
DEFAULT_KEYWORD_FIELDS = ("repo", "path", "lang")

#: FeatureField analog (``document/FeatureField.java``): static per-doc
#: ranking features live in one pseudo-postings field; the feature name is
#: the term and the quantized feature value is the term frequency.
FEATURE_FIELD = "features"

DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
        ("field_len", pa.int32()),
        ("norm_byte", pa.uint8()),
    ]
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("seg", pa.int32()),
        ("field", pa.string()),
        ("term", pa.string()),
        ("df", pa.int64()),
        ("ttf", pa.int64()),
        ("doc_blob", pa.large_binary()),
        ("freq_blob", pa.large_binary()),
        # per-term position stream (ttf values): within-doc delta encoding,
        # FOR blocks; empty when the index is built without positions
        # (IndexOptions.DOCS_AND_FREQS vs ..._AND_POSITIONS analog)
        ("pos_blob", pa.large_binary()),
        # per-term payload stream (ttf float32 values, 1:1 with the position
        # stream; NaN = occurrence without a payload; empty when the index
        # carries no payloads — DelimitedPayloadTokenFilter analog)
        ("pay_blob", pa.large_binary()),
        # per-term char-offset stream (ttf interleaved (start, end) int32
        # pairs, 1:1 with the position stream; empty when the index is built
        # without offsets — IndexOptions ..._AND_OFFSETS analog, the .pay
        # offset track of codecs/lucene50/Lucene50PostingsFormat.java:42-96)
        ("off_blob", pa.large_binary()),
        ("block_first_doc", pa.list_(pa.int32())),
        ("block_last_doc", pa.list_(pa.int32())),
        ("block_max_freq", pa.list_(pa.int32())),
        ("block_min_len", pa.list_(pa.int32())),
    ]
)

MANIFEST_ROW_SCHEMA = pa.schema(
    [
        ("seg", pa.int32()),
        ("doc_base", pa.int64()),
        ("doc_count", pa.int64()),
        ("sum_len", pa.int64()),
        ("num_terms", pa.int64()),
        ("sum_df", pa.int64()),
        ("sum_ttf", pa.int64()),
        ("resumed", pa.bool_()),
    ]
)


class AnalyzeInvert:
    """Actor-pool map_batches stage: tokenize + invert + doc metadata.

    Stateful setup (analyzer config, plan boundaries) happens once per actor
    in ``__init__`` (DWPT analog: all per-doc indexing state is task-private,
    ``index/DocumentsWriterPerThread.java:50``). Per batch it emits one row
    per doc: identity cols, sha256, field_len, norm_byte and the per-doc
    unique ``terms``/``tfs`` lists (inversion:
    ``index/DefaultIndexingChain.java:763-880``).
    """

    def __init__(self, plan: BuildPlan, analyzer: StandardAnalyzer | None = None,
                 done_ranges: frozenset[int] = frozenset(), positions: bool = True,
                 store_content: bool = False, store_offsets: bool = False):
        self.plan = plan
        self.boundaries = np.asarray(plan.boundaries, dtype=object)
        self.analyzer = analyzer or StandardAnalyzer()
        self.arrow_analyzer = ArrowAnalyzer(self.analyzer)  # compiled once per actor
        self.done = done_ranges
        self.positions = positions
        self.store_content = store_content  # storedFields analog (highlighting)
        # IndexOptions ..._AND_OFFSETS analog: per-occurrence char offsets in
        # the postings. Opt-in — the offsets path tokenizes per doc in Python
        # (the Arrow split kernel cannot report match offsets), so it costs
        # more per batch than the vectorized default.
        self.store_offsets = store_offsets
        if store_offsets and (not positions
                              or self.analyzer.delimited_payload is not None):
            raise ValueError(
                "store_offsets requires positions=True and no delimited_payload")

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = sort_keys(batch, self.plan.key_cols)
        rid = np.searchsorted(self.boundaries, keys, side="right").astype(np.int32)
        if self.done:
            keep = ~np.isin(rid, list(self.done))
            if not keep.all():
                batch = batch.filter(pa.array(keep))
                rid = rid[keep]
            if len(batch) == 0:
                return _empty_analyzed(
                    self.store_content,
                    payloads=self.analyzer.delimited_payload is not None,
                )
        content = batch["content"].cast(pa.large_string())
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        if self.store_offsets:
            return self._call_with_offsets(batch, rid, content)
        stats = self.arrow_analyzer(content, with_positions=self.positions)
        sha = _sha256_column(content)
        norm = int_to_byte4(stats.field_lens.astype(np.int64))
        terms_arr = pa.ListArray.from_arrays(
            pa.array(stats.offsets, pa.int32()), stats.terms.cast(pa.string())
        )
        tfs_arr = pa.ListArray.from_arrays(
            pa.array(stats.offsets, pa.int32()), pa.array(stats.tfs, pa.int32())
        )
        # per-doc flat positions (pair-major, aligned with cumsum(tfs)); the
        # per-doc count is sum(tfs), NOT field_len — overlap tokens emitted by
        # structural filters (shingles/synonyms/edge grams) carry positions
        # but are excluded from the norm length (discountOverlaps)
        tf_cum = np.concatenate([[0], np.cumsum(stats.tfs, dtype=np.int64)])
        tf_off = tf_cum[stats.offsets]
        pos_flat = stats.positions if self.positions else np.empty(0, dtype=np.int32)
        pos_arr = pa.ListArray.from_arrays(
            pa.array(tf_off if self.positions else np.zeros(len(batch) + 1, np.int64), pa.int32()),
            pa.array(pos_flat, pa.int32()),
        )
        extra = {}
        if stats.payloads is not None:
            extra["payloads"] = pa.ListArray.from_arrays(
                pa.array(tf_off, pa.int32()),
                pa.array(stats.payloads, pa.float32()),
            )
        return pa.table(
            {
                "range_id": pa.array(rid, pa.int32()),
                "repo": batch["repo"].cast(pa.string()),
                "path": batch["path"].cast(pa.string()),
                "commit": batch["commit"].cast(pa.string()),
                "lang": batch["lang"].cast(pa.string()),
                "content_sha256": pa.array(sha, pa.string()),
                "field_len": pa.array(stats.field_lens, pa.int32()),
                "norm_byte": pa.array(norm, pa.uint8()),
                "terms": terms_arr,
                "tfs": tfs_arr,
                "positions": pos_arr,
                **extra,
                **({"content": content} if self.store_content else {}),
            }
        )

    def _call_with_offsets(self, batch: pa.Table, rid: np.ndarray,
                           content: pa.Array) -> pa.Table:
        """Offsets-mode inversion: per-doc Python analysis through the FULL
        chain (``_analyze_full`` — same semantics as the Arrow path,
        verified by the ingest-identity tests) with per-occurrence
        (start, end) char offsets carried through the inversion.
        Occurrences within a (doc, term) pair sort by position so the
        downstream delta encoding stays non-negative."""
        from ..analysis.tokenizer import _analyze_full

        terms_l: list[str] = []
        tfs_l: list[int] = []
        pos_l: list[int] = []
        ost_l: list[int] = []
        oen_l: list[int] = []
        flens = np.zeros(len(batch), dtype=np.int32)
        offs = np.zeros(len(batch) + 1, dtype=np.int32)
        tf_off = np.zeros(len(batch) + 1, dtype=np.int32)
        for i, txt in enumerate(content.to_pylist()):
            toks = _analyze_full(txt or "", self.analyzer)
            flens[i] = sum(1 for _t, _p, _s, _e, o in toks if not o)
            groups: dict[str, list[tuple[int, int, int]]] = {}
            for t, p, s, e, _o in toks:
                groups.setdefault(t, []).append((p, s, e))
            for t in sorted(groups):
                occ = sorted(groups[t])
                terms_l.append(t)
                tfs_l.append(len(occ))
                for p, s, e in occ:
                    pos_l.append(p)
                    ost_l.append(s)
                    oen_l.append(e)
            offs[i + 1] = len(terms_l)
            tf_off[i + 1] = len(pos_l)
        sha = _sha256_column(content)
        norm = int_to_byte4(flens.astype(np.int64))

        def list_i32(off, vals):
            return pa.ListArray.from_arrays(
                pa.array(off, pa.int32()), pa.array(vals, pa.int32()))

        return pa.table({
            "range_id": pa.array(rid, pa.int32()),
            "repo": batch["repo"].cast(pa.string()),
            "path": batch["path"].cast(pa.string()),
            "commit": batch["commit"].cast(pa.string()),
            "lang": batch["lang"].cast(pa.string()),
            "content_sha256": pa.array(sha, pa.string()),
            "field_len": pa.array(flens, pa.int32()),
            "norm_byte": pa.array(norm, pa.uint8()),
            "terms": pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), pa.array(terms_l, pa.string())),
            "tfs": list_i32(offs, tfs_l),
            "positions": list_i32(tf_off, pos_l),
            "off_starts": list_i32(tf_off, ost_l),
            "off_ends": list_i32(tf_off, oen_l),
            **({"content": content} if self.store_content else {}),
        })


_ANALYZE_CACHE: dict = {}


def analyze_invert_fn(batch: pa.Table, *, plan: BuildPlan,
                      analyzer: StandardAnalyzer | None,
                      done_ranges: frozenset[int],
                      positions: bool, store_content: bool,
                      store_offsets: bool = False) -> pa.Table:
    """Task-based twin of :class:`AnalyzeInvert` for ``map_batches(fn)``.

    Runs in Ray's REUSABLE task workers: an actor pool spawns fresh
    processes per build whose first-touch page faults cost 20-35 s each
    (measured; the kernel-side fault path is also what saturates at ~8
    concurrent workers on this host) — task workers instead stay warm across
    stages AND across builds in a session. Compiled state is cached
    per-worker keyed by the plan/analyzer identity, so the DWPT-style
    amortization of :class:`AnalyzeInvert.__init__` is preserved."""
    key = (
        plan.total_rows, plan.n_segments,
        plan.boundaries[0] if plan.boundaries else "",
        plan.boundaries[-1] if plan.boundaries else "",
        analyzer, done_ranges, positions, store_content, store_offsets,
    )
    inst = _ANALYZE_CACHE.get(key)
    if inst is None:
        if len(_ANALYZE_CACHE) > 4:
            _ANALYZE_CACHE.clear()
        inst = _ANALYZE_CACHE[key] = AnalyzeInvert(
            plan, analyzer, done_ranges, positions=positions,
            store_content=store_content, store_offsets=store_offsets
        )
    return inst(batch)


def _sha256_column(arr: pa.Array) -> list[str]:
    """Per-row sha256 of a large_string column, zero-copy over the Arrow data
    buffer (the BASELINE.json per-row content invariant)."""
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return [hashlib.sha256(data[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(arr))]


def _empty_analyzed(store_content: bool = False, payloads: bool = False) -> pa.Table:
    cols = {
        "range_id": pa.array([], pa.int32()),
        "repo": pa.array([], pa.string()),
        "path": pa.array([], pa.string()),
        "commit": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "content_sha256": pa.array([], pa.string()),
        "field_len": pa.array([], pa.int32()),
        "norm_byte": pa.array([], pa.uint8()),
        "terms": pa.array([], pa.list_(pa.string())),
        "tfs": pa.array([], pa.list_(pa.int32())),
        "positions": pa.array([], pa.list_(pa.int32())),
    }
    if payloads:
        cols["payloads"] = pa.array([], pa.list_(pa.float32()))
    if store_content:
        cols["content"] = pa.array([], pa.large_string())
    return pa.table(cols)


def segment_dir(index_dir: str, rid: int) -> str:
    return os.path.join(index_dir, "segments", f"seg={rid:06d}")


def segment_meta_path(index_dir: str, rid: int) -> str:
    return os.path.join(segment_dir(index_dir, rid), "_SEGMENT.json")


def load_segment_meta(index_dir: str, rid: int) -> dict | None:
    p = segment_meta_path(index_dir, rid)
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


class SegmentWriter:
    """map_groups stage: one call = one segment (range_id group).

    Sorts the group by (repo, path, commit), assigns dense doc IDs from the
    plan's doc_base, explodes to (term, local_doc, tf), builds FOR-encoded
    posting lists with block-max metadata, and writes the segment atomically.
    Returns a one-row manifest table (tiny) as the stage output.
    """

    def __init__(self, index_dir: str, plan: BuildPlan, seg_offset: int = 0,
                 keyword_fields: tuple[str, ...] = DEFAULT_KEYWORD_FIELDS,
                 positions: bool = True,
                 feature_fields: dict | None = None):
        self.index_dir = index_dir
        self.plan = plan
        self.seg_offset = seg_offset  # delta builds append after existing seg ids
        self.keyword_fields = tuple(keyword_fields)
        self.positions = positions
        #: {feature_name: value_col | (value_col, (mask_col, "=="/"!=", value))}
        #: — FeatureField analog; docs failing the mask (or with non-positive
        #: values) simply lack the feature (FeatureField is per-doc optional)
        self.feature_fields = dict(feature_fields or {})

    def __call__(self, group: pa.Table) -> pa.Table:
        rid = int(group["range_id"][0].as_py()) + self.seg_offset
        existing = load_segment_meta(self.index_dir, rid)
        if existing is not None:
            return _manifest_row(existing, resumed=True)

        doc_base = self.plan.bases[rid - self.seg_offset]
        n = len(group)
        # Arrow C++ multi-key sort (no per-row Python); content_sha256 is the
        # final tie-break so duplicate (repo,path,commit) keys still get
        # deterministic doc ids at any parallelism
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[(c, "ascending") for c in self.plan.key_cols]
            + [("content_sha256", "ascending")],
        )
        group = group.take(order)
        doc_ids = doc_base + np.arange(n, dtype=np.int64)

        stored = "content" in group.column_names
        docs_schema = (
            DOCS_SCHEMA.append(pa.field("content", pa.large_string()))
            if stored
            else DOCS_SCHEMA
        )
        docs_tbl = pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "repo": group["repo"],
                "path": group["path"],
                "commit": group["commit"],
                "lang": group["lang"],
                "content_sha256": group["content_sha256"],
                "field_len": group["field_len"],
                "norm_byte": group["norm_byte"],
                **({"content": group["content"]} if stored else {}),
            },
        ).cast(docs_schema)

        # per-field posting tables, concatenated in field-name order so the
        # whole table is sorted by (field, term) — Parquet row-group stats
        # prune on both columns
        parts = {CONTENT_FIELD: self._build_postings(rid, group, n)}
        for kf in self.keyword_fields:
            parts[kf] = self._build_keyword_postings(rid, group, n, kf, with_pos=self.positions)
        if self.feature_fields:
            parts[FEATURE_FIELD] = self._build_feature_postings(rid, group, n)
        postings_tbl = pa.concat_tables([parts[f] for f in sorted(parts)])

        seg_d = segment_dir(self.index_dir, rid)
        tmp_d = os.path.join(self.index_dir, "segments", f".tmp-{rid:06d}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_d, exist_ok=True)
        pq.write_table(docs_tbl, os.path.join(tmp_d, "docs.parquet"), row_group_size=65536)
        pq.write_table(
            postings_tbl,
            os.path.join(tmp_d, "postings.parquet"),
            row_group_size=8192,  # sorted term column + row-group stats → term-range pruning
        )
        # 1-D point index sidecar (BKD analog — util/bkd/BKDWriter.java):
        # numeric doc-value columns sorted by value with small row groups;
        # selective PointRangeQuery reads only stat-intersecting row groups
        from .points import build_points_table

        pq.write_table(
            build_points_table(
                {"field_len": group["field_len"].to_numpy().astype(np.int64)}
            ),
            os.path.join(tmp_d, "points.parquet"),
            row_group_size=1024,
        )
        content_tbl = parts[CONTENT_FIELD]
        meta = {
            "seg": rid,
            "doc_base": int(doc_base),
            "doc_count": int(n),
            "sum_len": int(np.asarray(group["field_len"].to_numpy()).sum()) if n else 0,
            # top-level stats are the CONTENT field's (BM25 avgdl inputs)
            "num_terms": int(len(content_tbl)),
            "sum_df": int(content_tbl["df"].to_numpy().sum()) if len(content_tbl) else 0,
            "sum_ttf": int(content_tbl["ttf"].to_numpy().sum()) if len(content_tbl) else 0,
            "field_stats": {
                f: {
                    "doc_count": int(n),
                    "num_terms": int(len(t)),
                    "sum_df": int(t["df"].to_numpy().sum()) if len(t) else 0,
                    "sum_ttf": int(t["ttf"].to_numpy().sum()) if len(t) else 0,
                    "has_norms": f == CONTENT_FIELD,
                }
                for f, t in parts.items()
            },
            "lineage": {"range_id": rid, "key_range": self._key_range(rid)},
        }
        with open(os.path.join(tmp_d, "_SEGMENT.json"), "w") as f:
            json.dump(meta, f)
        try:
            os.rename(tmp_d, seg_d)
        except OSError:
            # another (retried) task committed the same deterministic segment first
            import shutil

            shutil.rmtree(tmp_d, ignore_errors=True)
        return _manifest_row(meta, resumed=False)

    def _key_range(self, rid: int) -> list[str | None]:
        rid = rid - self.seg_offset
        lo = self.plan.boundaries[rid - 1] if rid > 0 else None
        hi = self.plan.boundaries[rid] if rid < len(self.plan.boundaries) else None
        return [lo, hi]

    def _build_postings(self, rid: int, group: pa.Table, n: int) -> pa.Table:
        terms_col = group["terms"].combine_chunks()
        tfs_col = group["tfs"].combine_chunks()
        if isinstance(terms_col, pa.ChunkedArray):  # single chunk after combine
            terms_col = terms_col.chunk(0)
            tfs_col = tfs_col.chunk(0)
        offsets = terms_col.offsets.to_numpy()
        flat_tfs = tfs_col.values.to_numpy().astype(np.int64)
        lens = np.diff(offsets)
        local_doc = np.repeat(np.arange(n, dtype=np.int64), lens)

        if len(flat_tfs) == 0:
            return pa.table({f.name: pa.array([], f.type) for f in POSTINGS_SCHEMA})

        # dictionary-encode + rank terms (all C++) so the heavy sort is int64-keyed
        import pyarrow.compute as pc

        dict_arr = pc.dictionary_encode(terms_col.values)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy().astype(np.int64)
        uniq = dict_arr.dictionary
        uorder = pc.sort_indices(uniq).to_numpy().astype(np.int64)
        rank_of = np.empty(len(uniq), dtype=np.int64)
        rank_of[uorder] = np.arange(len(uniq))
        key = rank_of[codes] * np.int64(n) + local_doc  # docs already sorted per term
        order = np.argsort(key, kind="stable")
        s_term_rank = rank_of[codes][order]
        s_doc = local_doc[order]
        s_tf = flat_tfs[order]

        starts = np.flatnonzero(np.diff(s_term_rank, prepend=-1))
        dfs = np.diff(np.append(starts, len(s_term_rank)))
        ttfs = np.add.reduceat(s_tf, starts)
        sorted_terms = uniq.take(pa.array(uorder))

        norm_len = LENGTH_TABLE[group["norm_byte"].to_numpy().astype(np.int64)]
        doc_lens = norm_len[s_doc]  # quantized length per posting (WAND bound input)

        # per-term position streams (within-doc delta encoding), gathered in
        # sorted (term, doc) pair order
        pos_col = group["positions"].combine_chunks()
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.chunk(0)
        flat_pos = pos_col.values.to_numpy().astype(np.int64)
        pay_floats = None
        off_pairs = None
        if len(flat_pos):
            pair_off = np.zeros(len(flat_tfs) + 1, dtype=np.int64)
            np.cumsum(flat_tfs, out=pair_off[1:])
            sorted_cum = np.zeros(len(s_tf) + 1, dtype=np.int64)
            np.cumsum(s_tf, out=sorted_cum[1:])
            within = np.arange(sorted_cum[-1]) - np.repeat(sorted_cum[:-1], s_tf)
            src_idx = np.repeat(pair_off[order], s_tf) + within
            sorted_pos = flat_pos[src_idx]
            pdeltas = np.empty(len(sorted_pos), dtype=np.int64)
            pdeltas[1:] = sorted_pos[1:] - sorted_pos[:-1]
            pdeltas[sorted_cum[:-1]] = sorted_pos[sorted_cum[:-1]]  # raw first position per pair
            if "payloads" in group.column_names:
                pay_col = group["payloads"].combine_chunks()
                if isinstance(pay_col, pa.ChunkedArray):
                    pay_col = pay_col.chunk(0)
                # payloads ride the SAME occurrence permutation as positions
                pay_floats = pay_col.values.to_numpy().astype(np.float32)[src_idx]
            if "off_starts" in group.column_names:
                # char offsets ride the same occurrence permutation too
                def _flat_i32(name):
                    col = group[name].combine_chunks()
                    if isinstance(col, pa.ChunkedArray):
                        col = col.chunk(0)
                    return col.values.to_numpy().astype(np.int32)

                off_pairs = np.stack(
                    [_flat_i32("off_starts")[src_idx],
                     _flat_i32("off_ends")[src_idx]], axis=1)
        else:
            pdeltas = None

        return postings_table_from_flat(
            rid, sorted_terms, starts, dfs, ttfs, s_doc, s_tf, doc_lens, pdeltas,
            pay_floats=pay_floats, off_pairs=off_pairs,
        )

    def _build_keyword_postings(self, rid: int, group: pa.Table, n: int, field: str,
                                with_pos: bool) -> pa.Table:
        """Keyword-field postings (StringField analog): one verbatim term per
        doc, tf=1, position 0, omitNorms (block_min_len is unused — scoring
        treats missing norms as norm=k1, BM25Similarity.java:263)."""
        import pyarrow.compute as pc

        if n == 0:
            return pa.table({f.name: pa.array([], f.type) for f in POSTINGS_SCHEMA})
        col = group[field].combine_chunks()
        dict_arr = pc.dictionary_encode(col)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        codes = dict_arr.indices.to_numpy().astype(np.int64)
        uniq = dict_arr.dictionary
        uorder = pc.sort_indices(uniq).to_numpy().astype(np.int64)
        rank_of = np.empty(len(uniq), dtype=np.int64)
        rank_of[uorder] = np.arange(len(uniq))
        local_doc = np.arange(n, dtype=np.int64)
        order = np.argsort(rank_of[codes] * np.int64(n) + local_doc, kind="stable")
        s_term_rank = rank_of[codes][order]
        s_doc = local_doc[order]
        s_tf = np.ones(n, dtype=np.int64)
        starts = np.flatnonzero(np.diff(s_term_rank, prepend=-1))
        dfs = np.diff(np.append(starts, n))
        pdeltas = np.zeros(n, dtype=np.int64) if with_pos else None
        return postings_table_from_flat(
            rid, uniq.take(pa.array(uorder)), starts, dfs, dfs.copy(), s_doc, s_tf,
            np.ones(n, dtype=np.int64), pdeltas, field=field,
        )

    def _build_feature_postings(self, rid: int, group: pa.Table, n: int) -> pa.Table:
        """FeatureField postings (``document/FeatureField.java:118-160``): one
        row per feature name in the ``features`` field; posting docs are the
        docs carrying the feature, tf = the quantized feature value
        (floatToIntBits(v) >>> 15 — ~34k for everyday magnitudes, the
        exponent bits dominate), omitNorms, and NO position stream even in a
        positions index (the reference's FIELD_TYPE is DOCS_AND_FREQS;
        storing tf positions here would explode ttf-proportional state).
        The merge handles position-less fields on a separate track."""
        from ..util.feature import encode_feature_values

        if n == 0 or not self.feature_fields:
            return pa.table({f.name: pa.array([], f.type) for f in POSTINGS_SCHEMA})
        rows = []
        for name in sorted(self.feature_fields):
            spec = self.feature_fields[name]
            value_col, mask = (spec, None) if isinstance(spec, str) else spec
            vals = group[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            sel = np.isfinite(vals) & (vals > 0)
            if mask is not None:
                mcol, op, mval = mask
                mvals = group[mcol].to_numpy(zero_copy_only=False)
                sel &= (mvals == mval) if op == "==" else (mvals != mval)
            docs = np.flatnonzero(sel).astype(np.int64)
            if not len(docs):
                continue
            tfs = encode_feature_values(vals[docs])
            ttf = int(tfs.sum())
            rows.append(
                postings_table_from_flat(
                    rid, pa.array([name], pa.string()),
                    np.array([0], dtype=np.int64),
                    np.array([len(docs)], dtype=np.int64),
                    np.array([ttf], dtype=np.int64),
                    docs, tfs, np.ones(len(docs), dtype=np.int64), None,
                    field=FEATURE_FIELD,
                )
            )
        if not rows:
            return pa.table({f.name: pa.array([], f.type) for f in POSTINGS_SCHEMA})
        return pa.concat_tables(rows)


def postings_table_from_flat(
    seg_id: int,
    sorted_terms: pa.Array,
    starts: np.ndarray,
    dfs: np.ndarray,
    ttfs: np.ndarray,
    s_doc: np.ndarray,
    s_tf: np.ndarray,
    doc_lens: np.ndarray,
    pos_deltas: np.ndarray | None,
    field: str | pa.Array = CONTENT_FIELD,
    pay_floats: np.ndarray | None = None,
    off_pairs: np.ndarray | None = None,
) -> pa.Table:
    """Encode flat (term,doc)-sorted postings into the segment postings table
    (shared by the initial build and the merge job). ``pos_deltas``: per-pair
    within-doc delta stream aligned with cumsum(s_tf), or None. ``field``: a
    constant field name, or a per-row array (merge path). ``pay_floats``:
    per-occurrence float32 payloads in the same order as the position
    stream, or None. ``off_pairs``: per-occurrence (start, end) int32 char
    offsets, shape (P, 2), same order as positions, or None; rows whose
    occurrences carry no offsets (sentinel start < 0) store empty slices."""
    # batch FOR encode: every term's postings in one vectorized pass
    deltas = np.empty(len(s_doc), dtype=np.int64)
    if len(s_doc):
        deltas[1:] = s_doc[1:] - s_doc[:-1]
    deltas[starts] = s_doc[starts] + 1
    dbuf, doffs, gstart, blen, block_ptr = encode_sequences(deltas, starts, dfs)
    fbuf, foffs, _, _, _ = encode_sequences(s_tf, starts, dfs)
    if pos_deltas is not None and len(pos_deltas):
        sorted_cum = np.zeros(len(s_tf) + 1, dtype=np.int64)
        np.cumsum(s_tf, out=sorted_cum[1:])
        term_pos_starts = sorted_cum[:-1][starts]
        pbuf, poffs, _, _, _ = encode_sequences(pos_deltas, term_pos_starts, ttfs)
    else:
        pbuf = np.zeros(0, dtype=np.uint8)
        poffs = np.zeros(len(starts) + 1, dtype=np.int64)
    if pay_floats is not None and len(pay_floats):
        # raw float32 per occurrence, byte-sliced per term like pos_blob;
        # terms whose occurrences are ALL payload-free (NaN) store an empty
        # slice — keeps merged keyword rows compact and "index has no
        # payloads" detectable per term
        pay32 = pay_floats.astype(np.float32)
        occ_start = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(ttfs, out=occ_start[1:])
        has_any = np.logical_or.reduceat(~np.isnan(pay32), occ_start[:-1])
        ybuf = np.frombuffer(
            pay32[np.repeat(has_any, ttfs)].tobytes(), dtype=np.uint8
        )
        yoffs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(np.where(has_any, ttfs * 4, 0), out=yoffs[1:])
    else:
        ybuf = np.zeros(0, dtype=np.uint8)
        yoffs = np.zeros(len(starts) + 1, dtype=np.int64)
    if off_pairs is not None and len(off_pairs):
        # interleaved (start, end) int32 per occurrence, byte-sliced per term
        # like pay_blob; terms whose occurrences lack offsets (start < 0
        # sentinel — e.g. merged members built without offsets) store empty
        # slices so "term has offsets" stays detectable per row
        op32 = np.ascontiguousarray(off_pairs.astype(np.int32))
        occ_start2 = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(ttfs, out=occ_start2[1:])
        has_off = np.logical_and.reduceat(op32[:, 0] >= 0, occ_start2[:-1])
        obuf = np.frombuffer(
            op32[np.repeat(has_off, ttfs)].tobytes(), dtype=np.uint8
        )
        ooffs = np.zeros(len(starts) + 1, dtype=np.int64)
        np.cumsum(np.where(has_off, ttfs * 8, 0), out=ooffs[1:])
    else:
        obuf = np.zeros(0, dtype=np.uint8)
        ooffs = np.zeros(len(starts) + 1, dtype=np.int64)

    firsts = s_doc[gstart].astype(np.int32)
    lasts = s_doc[gstart + blen - 1].astype(np.int32)
    maxfs = np.maximum.reduceat(s_tf, gstart).astype(np.int32) if len(gstart) else np.empty(0, np.int32)
    minls = np.minimum.reduceat(doc_lens, gstart).astype(np.int32) if len(gstart) else np.empty(0, np.int32)
    lofs = pa.array(block_ptr.astype(np.int32))

    def large_bin(buf: np.ndarray, offs: np.ndarray) -> pa.Array:
        return pa.Array.from_buffers(
            pa.large_binary(),
            len(offs) - 1,
            [None, pa.py_buffer(offs.astype(np.int64).tobytes()), pa.py_buffer(buf.tobytes())],
        )

    if isinstance(field, str):
        field_arr = pa.array(np.full(len(starts), field, dtype=object), pa.string())
    else:
        field_arr = field.cast(pa.string())
    return pa.table(
        {
            "seg": pa.array(np.full(len(starts), seg_id, dtype=np.int32)),
            "field": field_arr,
            "term": sorted_terms.cast(pa.string()),
            "df": pa.array(dfs, pa.int64()),
            "ttf": pa.array(ttfs, pa.int64()),
            "doc_blob": large_bin(dbuf, doffs),
            "freq_blob": large_bin(fbuf, foffs),
            "pos_blob": large_bin(pbuf, poffs),
            "pay_blob": large_bin(ybuf, yoffs),
            "off_blob": large_bin(obuf, ooffs),
            "block_first_doc": pa.ListArray.from_arrays(lofs, pa.array(firsts, pa.int32())),
            "block_last_doc": pa.ListArray.from_arrays(lofs, pa.array(lasts, pa.int32())),
            "block_max_freq": pa.ListArray.from_arrays(lofs, pa.array(maxfs, pa.int32())),
            "block_min_len": pa.ListArray.from_arrays(lofs, pa.array(minls, pa.int32())),
        }
    )


def _manifest_row(meta: dict, resumed: bool) -> pa.Table:
    return pa.table(
        {
            "seg": pa.array([meta["seg"]], pa.int32()),
            "doc_base": pa.array([meta["doc_base"]], pa.int64()),
            "doc_count": pa.array([meta["doc_count"]], pa.int64()),
            "sum_len": pa.array([meta["sum_len"]], pa.int64()),
            "num_terms": pa.array([meta["num_terms"]], pa.int64()),
            "sum_df": pa.array([meta["sum_df"]], pa.int64()),
            "sum_ttf": pa.array([meta["sum_ttf"]], pa.int64()),
            "resumed": pa.array([resumed], pa.bool_()),
        }
    )
