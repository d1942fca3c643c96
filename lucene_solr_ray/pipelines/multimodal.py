"""Multimodal plumbing: opaque binary payload columns + actor-pool decode
stages.

The container ships no image/audio libraries, so the decode kernel is STUBBED
(deterministic md5-derived fake features behind ``decode_stub``; a real
decoder would replace exactly that function — the Ray plumbing, schemas,
batch sizing and actor signature are real and tested). Payloads are the
``documents`` text re-encoded as ``binary`` to exercise the binary-column
path end-to-end (small batch_size — binary rows are wide;
ray_guide.md "Memory-aware").
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def decode_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake feature vector (8 x float64 in [0,1]) from payload
    bytes — stands in for image decode + embedding. Raises on None like a
    real decoder would on a corrupt file."""
    if payload is None:
        raise NotImplementedError("real decoder required for null payloads")
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[:8], dtype=np.uint8).astype(np.float64) / 255.0


class PayloadFeaturizer:
    """Actor-pool stage: stateful setup once per actor (a real model load
    would go here), vectorized per batch."""

    def __init__(self):
        self.decode = decode_stub  # model/codec handle loaded once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [
            (t or "").encode("utf-8") for t in batch["text"].to_pylist()
        ]  # binary payload column (images/audio would arrive as binary directly)
        feats = [self.decode(p) for p in payloads]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
                "payload_md5": pa.array(
                    [hashlib.md5(p).hexdigest() for p in payloads], pa.string()
                ),
                "feat0_255": pa.array(
                    [int(round(f[0] * 255)) for f in feats], pa.int64()
                ),
            }
        )


def mm_payload_features(sf_dir: str) -> pa.Table:
    """(doc_id, n_bytes, payload_md5, feat0_255) via the actor-pool stage."""
    import ray.data

    from .io import sized_read

    ds = sized_read(f"{sf_dir}/documents.parquet").map_batches(
        PayloadFeaturizer,
        batch_format="pyarrow",
        batch_size=256,  # wide binary rows → small batches
        concurrency=(1, 2),
    )
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))


# feat0 = first md5 byte = strpos-decoded first two hex chars
SQL_MM_PAYLOAD_FEATURES = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS payload_md5,
       CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS BIGINT) AS feat0_255
FROM documents ORDER BY doc_id
"""
