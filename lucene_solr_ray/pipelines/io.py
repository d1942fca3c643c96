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


def drop_empty_blocks(ds):
    """(dataset_without_empty_blocks | None, total_rows).

    Workaround for a Ray 2.49 hash-join defect: each join input gets ONE
    schema broadcast, consumed by the first shuffled block — but an EMPTY
    first block returns early without broadcasting
    (`hash_shuffle.py:223` vs `:588`), so aggregator partitions that never
    receive a later shard finalize a SCHEMA-LESS empty table and pyarrow
    raises ``No match or multiple matches for key field reference`` inside
    the join. Any filtered dataset can legally carry empty blocks, so join
    inputs are scrubbed here BY REFERENCE — block object refs with
    ``num_rows > 0`` are re-wrapped via ``from_arrow_refs`` with zero data
    movement (no repartition, nothing leaves the object store). Returns
    ``(None, 0)`` when the dataset has no rows at all (pyarrow cannot join
    a schema-less table either — callers short-circuit with their own
    typed empty result)."""
    import ray.data

    mat = ds.materialize()
    refs, total, any_empty = [], 0, False
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
                total += meta.num_rows
            else:
                any_empty = True
    if not refs:
        return None, 0
    if not any_empty:
        return mat, total
    return ray.data.from_arrow_refs(refs), total


def safe_join(left, right, join_type: str, *, num_partitions: int, on,
              left_suffix: str | None = None, right_suffix: str | None = None):
    """``Dataset.join`` hardened against Ray's empty-first-block schema-loss
    defect (see :func:`drop_empty_blocks`). Inner join with either side
    empty → ``None`` (caller supplies its typed empty table); left_outer
    with an empty right → ``None`` as well (callers of that shape decorate
    the left side themselves)."""
    L, ln = drop_empty_blocks(left)
    R, rn = drop_empty_blocks(right)
    if ln == 0 or rn == 0:
        return None
    kwargs = {}
    if left_suffix is not None or right_suffix is not None:
        kwargs = {"left_suffix": left_suffix, "right_suffix": right_suffix}
    return L.join(R, join_type, num_partitions=num_partitions, on=on, **kwargs)
