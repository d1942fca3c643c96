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

    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        PayloadFeaturizer,
        batch_format="pyarrow",
        batch_size=256,  # wide binary rows → small batches
        concurrency=(1, 8),
        max_restarts=0,
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


# ---------------------------------------------------------------------------
# Frame sampling + resize (the video/image counterparts of the decode stage;
# same honest-stub policy — byte-window "frames" stand in for codec output,
# the Ray plumbing/explode/actor shapes are real)
# ---------------------------------------------------------------------------

FRAME_BYTES = 16   # characters per "frame" (char windows ≡ the substr oracle)
FRAME_STEP = 3     # sample every 3rd frame (fps downsampling)
RESIZE_SRC = 64    # "image" = first 64 payload characters
RESIZE_FACTOR = 4  # keep every 4th character


class FrameSampler:
    """Actor-pool stage: explode each payload into sampled frame rows —
    one output row per kept frame (video frame-sample shape: rows multiply,
    so batches stay small and the explode happens inside the task)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_d, out_f, out_md5 = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            # CHARACTER windows (not bytes): keeps the op well-defined on
            # multibyte text and bit-identical to the substr-based oracle
            payload = t or ""
            n_frames = len(payload) // FRAME_BYTES
            for fi in range(0, n_frames, FRAME_STEP):
                frame = payload[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                out_d.append(d)
                out_f.append(fi)
                out_md5.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "frame_idx": pa.array(out_f, pa.int64()),
            "frame_md5": pa.array(out_md5, pa.string()),
        })


def mm_frame_sample(sf_dir: str) -> pa.Table:
    """(doc_id, frame_idx, frame_md5): every FRAME_STEP-th FRAME_BYTES-wide
    frame of each payload."""
    from .io import sized_read

    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=256, concurrency=(1, 8),
        max_restarts=0,
    )
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by(
        [("doc_id", "ascending"), ("frame_idx", "ascending")]
    )


SQL_MM_FRAME_SAMPLE = f"""
WITH f AS (
  SELECT doc_id, text, length(text) // {FRAME_BYTES} AS n_frames FROM documents
)
SELECT doc_id,
       CAST(fi AS BIGINT) AS frame_idx,
       md5(substr(text, fi * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM f, unnest(generate_series(0, n_frames - 1, {FRAME_STEP})) AS t(fi)
WHERE n_frames > 0
ORDER BY doc_id, frame_idx
"""


class Resizer:
    """Actor-pool stage: stride-downsample the first RESIZE_SRC bytes (the
    image-resize counterpart — a real kernel would swap in here)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_d, out_n, out_md5 = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            # character stride (see FrameSampler: char windows ≡ the oracle)
            src = (t or "")[:RESIZE_SRC]
            small = src[::RESIZE_FACTOR]
            out_d.append(d)
            out_n.append(len(small))
            out_md5.append(hashlib.md5(small.encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "out_len": pa.array(out_n, pa.int64()),
            "resized_md5": pa.array(out_md5, pa.string()),
        })


def mm_resize(sf_dir: str) -> pa.Table:
    """(doc_id, out_len, resized_md5): every RESIZE_FACTOR-th byte of the
    first RESIZE_SRC payload bytes."""
    from .io import sized_read

    ds = sized_read(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        Resizer, batch_format="pyarrow", batch_size=256, concurrency=(1, 8),
        max_restarts=0,
    )
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")).sort_by("doc_id")


SQL_MM_RESIZE = f"""
WITH src AS (SELECT doc_id, substr(text, 1, {RESIZE_SRC}) AS s FROM documents),
small AS (
  SELECT doc_id,
         coalesce(array_to_string(list_transform(
           generate_series(1, length(s), {RESIZE_FACTOR}), i -> s[i:i]), ''), '') AS r
  FROM src
)
SELECT doc_id, CAST(length(r) AS BIGINT) AS out_len, md5(r) AS resized_md5
FROM small ORDER BY doc_id
"""
