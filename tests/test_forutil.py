"""Postings codec fixtures (FIXTURES.md §4), mirroring TestForUtil
(core/src/test/.../lucene50/TestForUtil.java) + BasePostingsFormatTestCase."""

import numpy as np
import pytest

from lucene_solr_ray.util.forutil import (
    BLOCK_SIZE,
    block_layout,
    decode_block,
    decode_blocks,
    decode_postings,
    encode_blocks,
    encode_postings,
)

rng = np.random.default_rng(42)


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 300, 100_000])
def test_roundtrip_random_sorted_docids(n):
    ids = np.sort(rng.choice(np.arange(4 * n + 10), size=n, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 50, size=n).astype(np.int64)
    enc = encode_postings(ids, freqs)
    dec_ids, dec_freqs = decode_postings(enc["doc_blob"], enc["freq_blob"], n)
    np.testing.assert_array_equal(dec_ids, ids)
    np.testing.assert_array_equal(dec_freqs, freqs)


def test_all_equal_block_uses_zero_bitwidth():
    vals = np.full(BLOCK_SIZE, 7, dtype=np.int64)
    blob = encode_blocks(vals)
    # header byte 0 + uint32 value → 5 bytes total (ForUtil.java:158-162 analog)
    assert len(blob) == 5 and blob[0] == 0
    np.testing.assert_array_equal(decode_blocks(blob, BLOCK_SIZE), vals)


def test_all_ones_freqs_compress_tiny():
    n = 1000
    freqs = np.ones(n, dtype=np.int64)
    blob = encode_blocks(freqs)
    n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(blob) == 5 * n_blocks


def test_singleton_posting():
    enc = encode_postings(np.array([12345]), np.array([3]))
    ids, freqs = decode_postings(enc["doc_blob"], enc["freq_blob"], 1)
    assert ids.tolist() == [12345] and freqs.tolist() == [3]


def test_blockmax_metadata_invariants():
    n = 1000
    ids = np.sort(rng.choice(10 * n, size=n, replace=False)).astype(np.int64)
    freqs = rng.integers(1, 100, size=n).astype(np.int64)
    enc = encode_postings(ids, freqs)
    last = enc["block_last_doc"]
    first = enc["block_first_doc"]
    assert np.all(np.diff(last) > 0)  # strictly increasing
    assert np.all(first <= last)
    for bi in range(len(last)):
        blk = freqs[bi * BLOCK_SIZE : (bi + 1) * BLOCK_SIZE]
        assert enc["block_max_freq"][bi] == blk.max()
        assert first[bi] == ids[bi * BLOCK_SIZE]


def test_partial_block_decode():
    n = 1000
    vals = rng.integers(0, 2**20, size=n).astype(np.int64)
    blob = encode_blocks(vals)
    offs, widths = block_layout(blob, n)
    for bi in [0, 3, 7]:
        blen = min(BLOCK_SIZE, n - bi * BLOCK_SIZE)
        got = decode_block(blob, int(offs[bi]), int(widths[bi]), blen)
        np.testing.assert_array_equal(got.astype(np.int64), vals[bi * BLOCK_SIZE : bi * BLOCK_SIZE + blen])


def test_empty():
    assert encode_blocks(np.array([], dtype=np.int64)) == b""
    assert len(decode_blocks(b"", 0)) == 0
