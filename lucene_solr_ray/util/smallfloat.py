"""Norm length quantization — exact port of Lucene's ``SmallFloat`` int4 scheme.

Reference semantics (``lucene/core/src/java/org/apache/lucene/util/SmallFloat.java``):

- ``longToInt4`` (:101-121): float-like order-preserving encoding keeping 4
  significant bits; values with fewer than 4 bits are stored verbatim
  ("subnormal"), otherwise 3 mantissa bits (MSB implicit) + shift+1 in the
  high bits.
- ``intToByte4`` (:139-156): because ``longToInt4(Integer.MAX_VALUE) == 231``,
  the 24 leftover byte values encode 0..23 exactly (``NUM_FREE_VALUES = 24``),
  then ``24 + longToInt4(i - 24)``. Values < 40 round-trip exactly; above, a
  4-significant-bit floor quantization.
- ``BM25Similarity`` builds ``LENGTH_TABLE[256] = byte4ToInt(b)``
  (``search/similarities/BM25Similarity.java:135-137``) and encodes norms as
  ``intToByte4(length - numOverlap)`` (:141-150).

All functions here are vectorized numpy; scalar ints also accepted.
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # 255 - longToInt4(Integer.MAX_VALUE) == 255 - 231


def _num_bits(v: np.ndarray) -> np.ndarray:
    """64 - numberOfLeadingZeros(v) for non-negative int64 v (< 2**53)."""
    # frexp is exact for integers below 2**53; field lengths are < 2**31.
    _, e = np.frexp(v.astype(np.float64))
    return e.astype(np.int64)  # frexp: v = m * 2**e with 0.5 <= m < 1 → e == bit length


def long_to_int4(i) -> np.ndarray:
    """Vectorized ``SmallFloat.longToInt4`` (SmallFloat.java:101-121)."""
    v = np.asarray(i, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("Only supports positive values")
    nbits = _num_bits(v)
    shift = np.maximum(nbits - 4, 0)
    encoded = (v >> shift) & 0x07 | ((shift + 1) << 3)
    return np.where(nbits < 4, v, encoded).astype(np.int64)


def int4_to_long(i) -> np.ndarray:
    """Vectorized ``SmallFloat.int4ToLong`` (SmallFloat.java:126-138)."""
    v = np.asarray(i, dtype=np.int64)
    bits = v & 0x07
    shift = (v >> 3) - 1
    return np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))


def int_to_byte4(i) -> np.ndarray:
    """Vectorized ``SmallFloat.intToByte4`` (SmallFloat.java:147-156) → uint8."""
    v = np.asarray(i, dtype=np.int64)
    if np.any(v < 0):
        raise ValueError("Only supports positive values")
    enc = NUM_FREE_VALUES + long_to_int4(np.maximum(v - NUM_FREE_VALUES, 0))
    out = np.where(v < NUM_FREE_VALUES, v, enc)
    if np.any(out > 255):
        raise ValueError("value too large for byte4 encoding")
    return out.astype(np.uint8)


def byte4_to_int(b) -> np.ndarray:
    """Vectorized ``SmallFloat.byte4ToInt`` (SmallFloat.java:161-169)."""
    v = np.asarray(b, dtype=np.int64) & 0xFF
    dec = NUM_FREE_VALUES + int4_to_long(np.maximum(v - NUM_FREE_VALUES, 0))
    return np.where(v < NUM_FREE_VALUES, v, dec)


#: LENGTH_TABLE[norm_byte] = quantized field length (BM25Similarity.java:135-137)
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256)).astype(np.int64)
