"""Norm-encoding fixtures (FIXTURES.md §3), mirroring
TestBM25Similarity.testLengthEncodingBackwardCompatibility
(core/src/test/.../similarities/TestBM25Similarity.java:80-90)."""

import numpy as np
import pytest

from lucene_solr_ray.util.smallfloat import (
    LENGTH_TABLE,
    byte4_to_int,
    int_to_byte4,
)


def _ref_int_to_byte4(i: int) -> int:
    """Direct scalar transcription of SmallFloat.java:101-156 for cross-check."""
    NUM_FREE = 24

    def long_to_int4(v: int) -> int:
        nbits = v.bit_length()
        if nbits < 4:
            return v
        shift = nbits - 4
        return ((v >> shift) & 0x07) | ((shift + 1) << 3)

    if i < NUM_FREE:
        return i
    return NUM_FREE + long_to_int4(i - NUM_FREE)


@pytest.mark.parametrize("n", [0, 1, 2, 4, 25, 39, 40, 41, 63, 64, 100, 255, 1000, 10**6])
def test_pinned_values_roundtrip(n):
    b = int(int_to_byte4(n)[()])
    assert b == _ref_int_to_byte4(n)
    dec = int(byte4_to_int(b)[()])
    if n < 40:
        assert dec == n  # exact below 40 (NUM_FREE_VALUES + subnormal range)
    else:
        assert dec <= n


def test_monotone_and_floor_quantization():
    xs = np.arange(0, 300_000)
    enc = int_to_byte4(xs)
    dec = byte4_to_int(enc)
    # floor quantization: decode(encode(x)) <= x
    assert np.all(dec <= xs)
    # monotone non-decreasing
    assert np.all(np.diff(enc.astype(np.int64)) >= 0)
    # relative gap bounded (4 significant bits)
    gap = xs - dec
    nz = xs >= 40
    assert np.all(gap[nz] <= xs[nz] / 8 + 1)


def test_length_table_matches_scalar():
    for b in range(256):
        assert LENGTH_TABLE[b] == byte4_to_int(b)


def test_byte_roundtrip_is_identity_on_code_points():
    # encode(decode(b)) == b for every byte (the 256 representable lengths)
    bs = np.arange(256)
    assert np.array_equal(int_to_byte4(byte4_to_int(bs)).astype(np.int64), bs)
