"""Allocator tuning for page-fault-expensive sandboxes.

glibc malloc serves large (>128 KiB) allocations with fresh ``mmap`` regions
and unmaps them on free, so every large numpy temporary re-faults its pages.
On kernels where faults are expensive (container sandboxes) this dominates
runtime. Raising ``M_MMAP_THRESHOLD`` / ``M_TRIM_THRESHOLD`` keeps big
buffers on the (retained) heap: pages fault once per process and are reused.

Called on package import so every Ray worker that deserializes our stages
gets tuned before the hot path. Equivalent env vars
(``MALLOC_MMAP_THRESHOLD_`` / ``MALLOC_TRIM_THRESHOLD_``) are also set by
``bench.py`` and the test fixture via ``runtime_env`` for processes that
import numpy first. Measured here: a 400 MB numpy alloc+add loop drops from
~15 s (first touch, repeated per allocation) to ~0.15 s steady-state.
"""

from __future__ import annotations

_done = False

M_TRIM_THRESHOLD = -1
M_MMAP_THRESHOLD = -3
_ONE_GIB = 1 << 30

MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(_ONE_GIB),
    "MALLOC_TRIM_THRESHOLD_": str(_ONE_GIB),
}


def tune_malloc() -> bool:
    global _done
    if _done:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        ok = libc.mallopt(M_TRIM_THRESHOLD, _ONE_GIB) == 1
        ok &= libc.mallopt(M_MMAP_THRESHOLD, _ONE_GIB) == 1
        _done = ok
        return ok
    except Exception:
        return False
