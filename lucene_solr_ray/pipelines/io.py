"""Shared pipeline readers."""

from __future__ import annotations


def sized_read(path: str, min_rows_per_block: int = 1024, columns: list | None = None):
    """``read_parquet`` with a block count proportional to the table size.

    Ray Data's default split targets full-cluster parallelism, which shreds a
    small table into dozens of near-empty blocks — each downstream map stage
    then pays ~50 ms of task overhead per block (measured: a 5 000-row table
    → 64 blocks → 3.5 s for a pass-through map; 4 blocks → 0.2 s). Large
    inputs keep the default (the cap below only lowers the block count, never
    raises it), so 100-TB reads still fan out normally.
    """
    import pyarrow.parquet as pq
    import ray
    import ray.data

    cols = list(columns) if columns is not None else None
    try:
        rows = pq.read_metadata(path).num_rows
    except Exception:
        return ray.data.read_parquet(path, columns=cols)
    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    default_blocks = ncpu * 2
    blocks = max(1, min(default_blocks, rows // min_rows_per_block))
    if blocks < default_blocks:
        return ray.data.read_parquet(path, override_num_blocks=blocks, columns=cols)
    return ray.data.read_parquet(path, columns=cols)
