"""Index reader — DirectoryReader/LeafReader analog over the segment layout.

``DirectoryReader.open`` (``index/DirectoryReader.java:62``) resolves the
latest ``segments_N``; we read ``manifest.json``. Per-segment access uses
Parquet predicate pushdown on the sorted ``term`` column (the term-dictionary
analog of ``codecs/blocktree/BlockTreeTermsWriter.java`` — Parquet row-group
stats replace the FST index).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .build import IndexStats
from .segment import CONTENT_FIELD, segment_dir


def pairs_filter(pairs):
    """(field, term) pairs → pushdown filter expression over the postings
    files: OR of per-field ``field == f & term ∈ {..}`` clauses."""
    by_field: dict[str, set[str]] = {}
    for f, t in pairs:
        by_field.setdefault(f, set()).add(t)
    expr = None
    for f in sorted(by_field):
        e = (pc.field("field") == f) & pc.field("term").isin(sorted(by_field[f]))
        expr = e if expr is None else (expr | e)
    return expr


# per-process postings-read cache: segment files are IMMUTABLE once renamed
# into place (new generations write new dirs), so a path-keyed handle +
# row-group (field, term) range cache is safe for the process lifetime.
# ~0.43s/query of pyarrow dataset-filter overhead (file opens + metadata +
# stat evaluation over 10 files) drops to ~0.05s with cached handles and a
# direct row-group binary search (measured on a 10-segment 200k index).
# Each entry holds an OPEN ParquetFile (one fd): true LRU with explicit
# close on eviction, capped well below the common `ulimit -n` 1024 so an
# index with more segment files than the fd limit can't exhaust
# descriptors (clear-all + GC-closed handles did at >1024 segments).
from collections import OrderedDict

_PF_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_PF_CACHE_MAX = 512


def _postings_handle(path: str):
    import pyarrow.parquet as pq

    # key by (path, mtime, size): committed segments are immutable, but a
    # test/tool may delete-and-rebuild an index at the same path in one
    # process — the stat guard invalidates those handles
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = _PF_CACHE.get(key)
    if hit is not None:
        _PF_CACHE.move_to_end(key)  # mark most-recently-used
        return hit
    pf = pq.ParquetFile(path)
    md = pf.metadata
    names = pf.schema_arrow.names
    fidx, tidx = names.index("field"), names.index("term")
    ranges = []
    for rg in range(md.num_row_groups):
        r = md.row_group(rg)
        fs, ts = r.column(fidx).statistics, r.column(tidx).statistics
        if (fs is None or ts is None or fs.min is None or fs.max is None
                or ts.min is None or ts.max is None):
            ranges.append(None)  # stats missing/degenerate → never prune
        else:
            ranges.append((fs.min, fs.max, ts.min, ts.max))
    while len(_PF_CACHE) >= _PF_CACHE_MAX:
        _, (old_pf, _old_ranges) = _PF_CACHE.popitem(last=False)
        try:
            old_pf.close()
        except Exception:
            pass  # eviction must never fail a read
    _PF_CACHE[key] = (pf, ranges)
    return pf, ranges


_NORMS_CACHE: dict[str, "np.ndarray"] = {}


def segment_norms_cached(seg_dir: str) -> "np.ndarray":
    """Per-process norm-byte cache for one segment dir (norms are immutable
    once a segment is committed; deletes live in a separate sidecar). Saves
    a per-task parquet read on every scatter query."""
    path = os.path.join(seg_dir, "docs.parquet")
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    n = _NORMS_CACHE.get(key)
    if n is None:
        import pyarrow.parquet as pq

        if len(_NORMS_CACHE) >= _PF_CACHE_MAX:
            _NORMS_CACHE.clear()
        n = _NORMS_CACHE[key] = pq.read_table(
            path, columns=["norm_byte"]
        )["norm_byte"].to_numpy()
    return n


def read_postings_rows(path: str, pairs, columns=None) -> pa.Table:
    """Posting rows of ONE segment file matching the (field, term) pairs:
    cached file handle + row-group range pruning + exact vectorized
    post-filter (the fast path behind every per-query postings fetch)."""
    pf, ranges = _postings_handle(path)
    sel = [
        rg
        for rg, rng in enumerate(ranges)
        if rng is None
        or any(rng[0] <= f <= rng[1] and rng[2] <= t <= rng[3] for f, t in pairs)
    ]
    if not sel:
        schema = pf.schema_arrow
        if columns:
            schema = pa.schema([schema.field(c) for c in columns])
        return schema.empty_table()
    cols = list(columns) if columns else None
    tb = pf.read_row_groups(sel, columns=cols)
    keyed = pc.binary_join_element_wise(tb["field"], tb["term"], "\x00")
    want = pa.array(sorted(f + "\x00" + t for f, t in pairs))
    return tb.filter(pc.is_in(keyed, value_set=want))


def _levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Levenshtein distance ≤ k with row-min early exit
    (FuzzyTermsEnum automaton analog; candidates are length-pruned first)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        for j in range(1, lb + 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])))
        if min(cur) > k:
            return False
        prev = cur
    return prev[lb] <= k


class IndexReader:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        with open(os.path.join(index_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        s = self.manifest["stats"]
        self.stats = IndexStats(
            doc_count=s["doc_count"],
            sum_ttf=s["sum_ttf"],
            sum_df=s["sum_df"],
            num_terms=s["num_terms"],
        )
        # doc_base order: segment iteration == global doc-id order (required
        # by the index-sort early-termination path, and harmless elsewhere)
        self.segments = sorted(self.manifest["segments"], key=lambda s: s["doc_base"])
        self._seg_by_id = {s["seg"]: s for s in self.segments}
        #: index-sort key (IndexWriterConfig.setIndexSort analog): doc ids are
        #: dense ranks over these columns, so doc_id order == this sort order.
        #: [] = NO index sort (e.g. after addIndexes concatenation); a missing
        #: key (pre-round-2 index) means the default (repo, path, commit) sort
        sf = self.manifest.get("sort_fields", ["repo", "path", "commit"])
        self.sort_fields: list[str] = list(sf) if sf else []
        #: per-field CollectionStatistics (FieldInfos analog); content-only
        #: indexes built before multi-field fall back to the global stats
        self.field_stats: dict[str, dict] = self.manifest.get(
            "field_stats",
            {CONTENT_FIELD: {
                "doc_count": self.stats.doc_count, "sum_df": self.stats.sum_df,
                "sum_ttf": self.stats.sum_ttf, "num_terms": self.stats.num_terms,
                "has_norms": True,
            }},
        )

    def field_doc_count(self, field: str) -> int:
        return int(self.field_stats.get(field, {}).get("doc_count", self.stats.doc_count))

    def field_sum_ttf(self, field: str) -> int:
        return int(self.field_stats.get(field, {}).get("sum_ttf", self.stats.sum_ttf))

    # ------------------------------------------------------------------
    def seg_dir(self, seg: int) -> str:
        """Segment directory; merged segments carry an explicit "dir"."""
        ent = self._seg_by_id[seg]
        if "dir" in ent:
            return os.path.join(self.index_dir, "segments", ent["dir"])
        return segment_dir(self.index_dir, seg)

    def seg_dirs(self) -> dict[int, str]:
        return {s["seg"]: self.seg_dir(s["seg"]) for s in self.segments}

    def postings_files(self) -> list[str]:
        return [os.path.join(self.seg_dir(s["seg"]), "postings.parquet") for s in self.segments]

    def docs_files(self) -> list[str]:
        return [os.path.join(self.seg_dir(s["seg"]), "docs.parquet") for s in self.segments]

    def doc_base(self, seg: int) -> int:
        return self._seg_by_id[seg]["doc_base"]

    def seg_doc_count(self, seg: int) -> int:
        return self._seg_by_id[seg]["doc_count"]

    # ------------------------------------------------------------------
    def term_stats(self, pairs: list[tuple[str, str]]) -> dict[tuple[str, str], tuple[int, int]]:
        """Global (df, ttf) per (field, term) — TermStatistics analog
        (search/IndexSearcher.java:797). Sums per-segment rows via a pruned
        parquet scan (field/term/df/ttf columns, field+term pushdown).

        Results are cached on the reader INSTANCE: segment postings are
        immutable for a manifest generation (deletes don't change df/ttf —
        Lucene's stats include deleted docs until merge), and a new
        generation opens a new reader. Without the cache every batch search
        paid a ~0.5 s driver-side 100-file scan in `Searcher._weights` —
        the dominant serial term in query throughput."""
        pairs = [p if isinstance(p, tuple) else (CONTENT_FIELD, p) for p in pairs]
        if not pairs:
            return {}
        cache = getattr(self, "_term_stats_cache", None)
        if cache is None:
            cache = self._term_stats_cache = {}
        missing = [p for p in dict.fromkeys(pairs) if p not in cache]
        if missing:
            dset = pads.dataset(self.postings_files())
            tbl = dset.to_table(
                columns=["field", "term", "df", "ttf"], filter=pairs_filter(missing)
            )
            got: dict[tuple[str, str], tuple[int, int]] = {p: (0, 0) for p in missing}
            for f, t, df, ttf in zip(
                tbl["field"].to_pylist(), tbl["term"].to_pylist(),
                tbl["df"].to_numpy(), tbl["ttf"].to_numpy()
            ):
                if (f, t) in got:
                    d0, t0 = got[(f, t)]
                    got[(f, t)] = (d0 + int(df), t0 + int(ttf))
            out = {p: cache.get(p, got.get(p, (0, 0))) for p in pairs}
            if len(cache) > 200_000:  # bound: distinct query terms per reader
                cache.clear()
            cache.update(got)
            return out
        return {p: cache[p] for p in pairs}

    MAX_EXPANSIONS = 65_536

    def distinct_terms(self, flt=None, field: str = CONTENT_FIELD) -> pa.Array:
        """Distinct terms of one field across segments, optional pushdown
        filter (term-dictionary scan; row-group stats prune term ranges).

        Cached per reader instance keyed on (field, repr(filter)) — the term
        dictionary is immutable per generation, and multi-term queries
        (prefix/wildcard/fuzzy/range) re-enumerate the same dictionary
        slices on every search. Bounded at 64 cached slices (whole-vocab
        scans included; at 10^12 scale the vocab slice per prefix is small,
        the None-filter scan is the caller's responsibility)."""
        cache = getattr(self, "_distinct_terms_cache", None)
        if cache is None:
            cache = self._distinct_terms_cache = {}
        key = (field, repr(flt))
        hit = cache.get(key)
        if hit is not None:
            return hit
        ffilter = pc.field("field") == field
        flt = ffilter if flt is None else (ffilter & flt)
        dset = pads.dataset(self.postings_files())
        tbl = dset.to_table(columns=["term"], filter=flt)
        out = pc.unique(tbl["term"])
        if len(cache) >= 64:
            cache.clear()
        cache[key] = out
        return out

    def expand_terms(self, q) -> list[str]:
        """Multi-term query → concrete terms (AutomatonQuery-family rewrite,
        SURVEY.md §2.4). Prefix/range push the scan down; wildcard/regexp
        filter the dictionary with Arrow kernels; fuzzy applies a banded
        Levenshtein over length/prefix-pruned candidates."""
        from ..search.query import (
            FuzzyQuery,
            PrefixQuery,
            RegexpQuery,
            TermRangeQuery,
            WildcardQuery,
        )

        if isinstance(q, PrefixQuery):
            flt = (pc.field("term") >= q.prefix) & (
                pc.field("term") <= q.prefix + "\U0010FFFF"
            )
            cand = self.distinct_terms(flt, field=q.field)
            mask = pc.starts_with(cand, q.prefix)
            out = pc.filter(cand, mask).to_pylist()
        elif isinstance(q, TermRangeQuery):
            flt = None
            if q.lower is not None:
                flt = (pc.field("term") >= q.lower) if q.include_lower else (pc.field("term") > q.lower)
            if q.upper is not None:
                f2 = (pc.field("term") <= q.upper) if q.include_upper else (pc.field("term") < q.upper)
                flt = f2 if flt is None else (flt & f2)
            out = self.distinct_terms(flt, field=q.field).to_pylist()
        elif isinstance(q, WildcardQuery):
            like = (
                q.pattern.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
                .replace("*", "%").replace("?", "_")
            )
            cand = self.distinct_terms(field=q.field)
            out = pc.filter(cand, pc.match_like(cand, like)).to_pylist()
        elif isinstance(q, RegexpQuery):
            cand = self.distinct_terms(field=q.field)
            out = pc.filter(
                cand, pc.match_substring_regex(cand, f"^(?:{q.pattern})$")
            ).to_pylist()
        elif isinstance(q, FuzzyQuery):
            cand = self.distinct_terms(field=q.field)
            if q.prefix_length:
                cand = pc.filter(cand, pc.starts_with(cand, q.term[: q.prefix_length]))
            lens = pc.utf8_length(cand).to_numpy()
            tl = len(q.term)
            keep = np.abs(lens - tl) <= q.max_edits
            out = [
                t
                for t in pc.filter(cand, pa.array(keep)).to_pylist()
                if _levenshtein_leq(q.term, t, q.max_edits)
            ]
        else:
            raise TypeError(f"not a multi-term query: {type(q)}")
        if len(out) > self.MAX_EXPANSIONS:
            raise ValueError(f"multi-term query expands to {len(out)} terms (cap {self.MAX_EXPANSIONS})")
        return out

    def postings_for_terms(self, pairs: list, columns: list[str] | None = None) -> pa.Table:
        """All segments' posting rows for the given (field, term) pairs
        (cached-handle row-group pruned reads per segment file); bare term
        strings mean the content field."""
        pairs = [p if isinstance(p, tuple) else (CONTENT_FIELD, p) for p in pairs]
        parts = [read_postings_rows(f, pairs, columns) for f in self.postings_files()]
        return pa.concat_tables(parts, promote_options="default")

    def live_mask(self, seg: int, include_soft_deleted: bool = False) -> np.ndarray | None:
        """Boolean live-docs mask for the segment (liveDocs bitset analog),
        or None when nothing is deleted. Soft-deleted docs
        (``soft_deletes.parquet`` — the soft-deletes-field doc values of
        ``SoftDeletesDirectoryReaderWrapper``) are masked too unless
        ``include_soft_deleted`` (the unwrapped-reader view used for
        recovery/retention inspection)."""
        files = ["deletes.parquet"] if include_soft_deleted else [
            "deletes.parquet", "soft_deletes.parquet"]
        mask = None
        for f in files:
            p = os.path.join(self.seg_dir(seg), f)
            if not os.path.exists(p):
                continue
            deleted = pq.read_table(p)["local_id"].to_numpy().astype(np.int64)
            if len(deleted) == 0:
                continue
            if mask is None:
                mask = np.ones(self.seg_doc_count(seg), dtype=bool)
            mask[deleted] = False
        return mask

    def segment_norms(self, seg: int) -> np.ndarray:
        """norm_byte array indexed by local doc id (docs.parquet is doc_id-sorted)."""
        p = os.path.join(self.seg_dir(seg), "docs.parquet")
        return pq.read_table(p, columns=["norm_byte"])["norm_byte"].to_numpy()

    def fetch_docs(self, doc_ids: list[int], columns: list[str] | None = None) -> pa.Table:
        """Stored-fields lookup by global doc id (two-phase fetch analog,
        solr QueryComponent.java:996-998). Binary doc-value overrides
        (``dv_updates_bin.parquet`` stacked sidecars — updateBinaryDocValue)
        are applied to string columns of the fetched rows; the result set is
        k docs, so the patch pass is driver-tiny."""
        read_cols = columns
        if columns is not None and "doc_id" not in columns:
            read_cols = ["doc_id", *columns]  # patch pass keys on doc_id
        dset = pads.dataset(self.docs_files())
        tbl = dset.to_table(columns=read_cols, filter=pc.field("doc_id").isin(doc_ids))
        if tbl.num_rows == 0:
            return tbl.select(columns) if columns is not None else tbl
        fetched = set(tbl["doc_id"].to_pylist())
        overrides: dict[tuple[int, str], bytes] = {}
        for ent in self.segments:
            p = os.path.join(self.seg_dir(ent["seg"]), "dv_updates_bin.parquet")
            if not os.path.exists(p):
                continue
            # read only the fetched rows of the sidecar: the update volume is
            # unbounded over time, the result set is k docs — pruning keeps
            # the patch pass proportional to k, not to update history
            base = ent["doc_base"]
            local_wanted = [g - base for g in fetched
                            if base <= g < base + ent["doc_count"]]
            if not local_wanted:
                continue
            u = pq.read_table(p, filters=[("local_id", "in", local_wanted)])
            for lid, f, v in zip(u["local_id"].to_pylist(), u["field"].to_pylist(),
                                 u["value"].to_pylist()):
                overrides[(base + lid, f)] = v
        if not overrides:
            return tbl.select(columns) if columns is not None else tbl
        gids = tbl["doc_id"].to_pylist()
        cols = {}
        for name in tbl.column_names:
            field = tbl[name]
            is_str = pa.types.is_string(field.type) or pa.types.is_large_string(field.type)
            if is_str and any((g, name) in overrides for g in gids):
                vals = [
                    overrides[(g, name)].decode("utf-8") if (g, name) in overrides else v
                    for g, v in zip(gids, field.to_pylist())
                ]
                cols[name] = pa.array(vals, field.type)
            else:
                cols[name] = field
        out = pa.table(cols)
        return out.select(columns) if columns is not None else out
