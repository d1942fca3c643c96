"""FeatureField freq codec — ``document/FeatureField.java:154-155,195-210``.

A feature value (positive finite float32) is stored in the posting's term
frequency: ``freq = floatToIntBits(v) >>> 15`` (sign + exponent + top 8
mantissa bits), decoded back as ``intBitsToFloat(freq << 15)`` — a lossy
floor quantization to 8 mantissa bits. Values with ≤ 8 significant mantissa
bits (e.g. positive integers < 512) round-trip exactly.

Freqs above ``MAX_FREQ`` (= floatToIntBits(Float.MAX_VALUE) >>> 15) decode
to float32 max, mirroring the reference's defensive clamp
(``FeatureField.java:198-204``).
"""

from __future__ import annotations

import numpy as np

#: floatToIntBits(Float.MAX_VALUE) >>> 15 — sign bit is 0, so the arithmetic
#: shift equals the logical one (FeatureField.java:198)
MAX_FREQ = int(np.float32(np.finfo(np.float32).max).view(np.int32)) >> 15

_F32_MAX = np.float32(np.finfo(np.float32).max)


def encode_feature_values(values) -> np.ndarray:
    """float32 feature values → int64 term freqs (FeatureField.java:154-155).

    Raises on non-finite or non-positive values, like
    ``FeatureField.setFeatureValue``.
    """
    v32 = np.asarray(values, dtype=np.float32)
    if v32.size and (not np.all(np.isfinite(v32)) or np.any(v32 <= 0)):
        raise ValueError("feature values must be finite and positive")
    # sign bit is 0 for positive values → arithmetic >> == logical >>>
    return (v32.view(np.int32) >> 15).astype(np.int64)


def decode_feature_values(freqs) -> np.ndarray:
    """int term freqs → float32 feature values (FeatureField.java:195-210)."""
    tf = np.asarray(freqs, dtype=np.int64)
    clamped = np.minimum(tf, MAX_FREQ).astype(np.int32)
    out = (clamped << np.int32(15)).view(np.float32)
    if np.any(tf > MAX_FREQ):
        out = np.where(tf > MAX_FREQ, _F32_MAX, out)
    return out
