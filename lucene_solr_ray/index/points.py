"""1-D point index — the BKD-tree analog (``lucene/core/src/java/org/
apache/lucene/util/bkd/BKDWriter.java``; ``document/IntPoint.java``).

Lucene accelerates selective numeric range queries with a BKD tree over
the point values; the Parquet-native analog is a per-segment sidecar
``points.parquet`` holding (field, value, local_id) SORTED BY (field,
value) with small row groups — row-group min/max statistics then play the
role of the BKD's internal node bounds: a selective range touches only the
row groups whose [min, max] intersects it, never the full column.

The sidecar is written at segment-build and merge time for the numeric
doc-value fields known then; engines reading older segments (or segments
whose values were overridden by ``dv_updates.parquet`` — point indexes are
not updatable, exactly like Lucene points) transparently fall back to the
doc-values scan.

``SCAN_STATS`` counts row groups scanned vs total per process — pinned
≪ full scan by tests/test_points.py for a selective range.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: per-process pruning counters (tests reset + read them)
SCAN_STATS = {"row_groups_scanned": 0, "row_groups_total": 0}

_PT_CACHE: dict = {}
_PT_CACHE_MAX = 512


def points_path(seg_d: str) -> str:
    return os.path.join(seg_d, "points.parquet")


def _handle(path: str):
    """Cached (ParquetFile, per-row-group (field_min, field_max, val_min,
    val_max) stats) — same immutability contract as the postings cache."""
    import pyarrow.parquet as pq

    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = _PT_CACHE.get(key)
    if hit is not None:
        return hit
    pf = pq.ParquetFile(path)
    md = pf.metadata
    names = pf.schema_arrow.names
    fidx, vidx = names.index("field"), names.index("value")
    ranges = []
    for rg in range(md.num_row_groups):
        r = md.row_group(rg)
        fs, vs = r.column(fidx).statistics, r.column(vidx).statistics
        if (fs is None or vs is None or fs.min is None or vs.min is None):
            ranges.append(None)  # stats missing → never prune this group
        else:
            ranges.append((fs.min, fs.max, vs.min, vs.max))
    if len(_PT_CACHE) >= _PT_CACHE_MAX:
        _PT_CACHE.clear()
    _PT_CACHE[key] = (pf, ranges)
    return pf, ranges


def points_available(seg_d: str, field: str) -> bool:
    """Point index usable for ``field`` in this segment: the sidecar exists
    and no doc-values update sidecar overrides it (points are not
    updatable — Lucene's PointValues contract)."""
    path = points_path(seg_d)
    if not os.path.exists(path):
        return False
    if os.path.exists(os.path.join(seg_d, "dv_updates.parquet")):
        return False
    _, ranges = _handle(path)
    return any(r is None or (r[0] <= field <= r[1]) for r in ranges)


def read_points_range(seg_d: str, field: str, lower, upper,
                      include_lower: bool = True,
                      include_upper: bool = True) -> np.ndarray:
    """Local doc ids whose ``field`` value lies in the range — row-group
    pruned via the sorted value column's statistics (PointRangeQuery →
    BKD intersect analog), exact vectorized post-filter."""
    pf, ranges = _handle(points_path(seg_d))
    lo = -np.inf if lower is None else lower
    hi = np.inf if upper is None else upper
    sel = []
    for rg, r in enumerate(ranges):
        if r is None:
            sel.append(rg)
            continue
        fmin, fmax, vmin, vmax = r
        if not (fmin <= field <= fmax):
            continue
        # value stats only usable when the row group holds ONE field (the
        # sort guarantees at most two fields sharing a boundary group)
        if fmin == fmax and (vmax < lo or vmin > hi):
            continue
        sel.append(rg)
    SCAN_STATS["row_groups_scanned"] += len(sel)
    SCAN_STATS["row_groups_total"] += len(ranges)
    if not sel:
        return np.empty(0, dtype=np.int64)
    tbl = pf.read_row_groups(sel, columns=["field", "value", "local_id"])
    mask = pc.equal(tbl["field"], field)
    v = tbl["value"]
    if lower is not None:
        mask = pc.and_(mask, pc.greater_equal(v, lower) if include_lower
                       else pc.greater(v, lower))
    if upper is not None:
        mask = pc.and_(mask, pc.less_equal(v, upper) if include_upper
                       else pc.less(v, upper))
    ids = tbl.filter(mask)["local_id"].to_numpy().astype(np.int64)
    return np.sort(ids)


def build_points_table(fields: dict[str, np.ndarray]) -> pa.Table:
    """(field, value, local_id) sorted by (field, value) for one segment;
    ``fields``: {field_name: per-doc int64 values}."""
    parts = []
    for f in sorted(fields):
        vals = np.asarray(fields[f], dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        parts.append(pa.table({
            "field": pa.array(np.full(len(vals), f, dtype=object), pa.string()),
            "value": pa.array(vals[order], pa.int64()),
            "local_id": pa.array(order.astype(np.int64), pa.int64()),
        }))
    if not parts:
        return pa.table({
            "field": pa.array([], pa.string()),
            "value": pa.array([], pa.int64()),
            "local_id": pa.array([], pa.int64()),
        })
    return pa.concat_tables(parts)
