"""Zero-copy embedding-column helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow ``list<float>`` column → (n, dim) numpy matrix WITHOUT the
    per-row ``to_pylist``/``np.stack`` round-trip (flatten respects slice
    offsets; equal-length rows are the embeddings-table invariant)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if flat.size % n:
        raise ValueError("ragged embedding column")
    return np.ascontiguousarray(flat.reshape(n, flat.size // n).astype(dtype, copy=False))
