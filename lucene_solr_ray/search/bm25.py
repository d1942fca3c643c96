"""BM25 similarity — float32-faithful port of
``search/similarities/BM25Similarity.java`` (reference 7.7.1).

Exact op order reproduced (SURVEY.md §2.6):

- ``idf = (float) log(1 + (docCount - df + 0.5)/(df + 0.5))`` — double math,
  cast float32 (:72-74).
- ``avgdl = (float)(sumTotalTermFreq / (double) docCount)`` (:87-101).
- ``cache[i] = k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl)`` in float32
  (:216).
- ``weightValue = boost * idf * (k1 + 1)`` (:238, weight = idf*boost :302).
- ``score(doc, freq) = weightValue * freq / (freq + cache[normByte & 0xFF])``
  (:250-263); freq is the integer term frequency (TermScorer.java:64-66).

``dtype=np.float64`` mode exists for the DuckDB oracle-SQL comparisons (SQL
computes in double); the reference-faithful default is float32.
"""

from __future__ import annotations

import math

import numpy as np

from ..util.smallfloat import LENGTH_TABLE

K1 = 1.2
B = 0.75


class BM25Similarity:
    supports_wand = True
    supports_phrases = True

    def __init__(self, k1: float = K1, b: float = B, dtype=np.float32):
        if not (k1 >= 0 and math.isfinite(k1)):
            raise ValueError(f"illegal k1 value: {k1}")  # BM25Similarity.java:54-66
        if not (0 <= b <= 1):
            raise ValueError(f"illegal b value: {b}")
        self.k1 = k1
        self.b = b
        self.dtype = np.dtype(dtype)

    def spec(self):
        return ("bm25", self.k1, self.b, self.dtype.name)

    def term_weight_stat(self, df: int, ttf: int, doc_count: int, sum_ttf: int):
        return float(self.idf(df, doc_count))

    def nonorm_cache(self) -> np.ndarray:
        """Fields without norms score with norm = k1 (BM25Similarity.java:263)."""
        return np.full(256, self.dtype.type(self.k1), dtype=self.dtype)

    def idf(self, df: int, doc_count: int):
        """BM25Similarity.java:72-74 (double math, cast to dtype)."""
        v = math.log(1 + (doc_count - df + 0.5) / (df + 0.5))
        return self.dtype.type(v)

    def avgdl(self, sum_ttf: int, doc_count: int):
        if doc_count == 0:
            return self.dtype.type(1.0)
        return self.dtype.type(sum_ttf / float(doc_count))

    def norm_cache(self, avgdl) -> np.ndarray:
        """cache[normByte] = k1*((1-b) + b*len/avgdl), float ops in dtype order
        (BM25Similarity.java:210-217)."""
        t = self.dtype.type
        lt = LENGTH_TABLE.astype(self.dtype)
        return (t(self.k1) * ((t(1.0) - t(self.b)) + t(self.b) * lt / t(avgdl))).astype(self.dtype)

    def weight_value(self, df: int, doc_count: int, boost: float = 1.0):
        """boost*idf*(k1+1) in dtype op order (:238, :302)."""
        return self.weight_from_idf(self.idf(df, doc_count), boost)

    def weight_from_idf(self, idf, boost: float = 1.0):
        """(idf*boost)*(k1+1) in dtype op order; ``idf`` may be a single
        term's idf or a summed phrase idf (PhraseWeight)."""
        t = self.dtype.type
        return (t(idf) * t(boost)) * t(self.k1 + 1)

    def score_freqs(self, weight_value, freqs: np.ndarray, norm_bytes: np.ndarray, cache: np.ndarray) -> np.ndarray:
        """Vectorized BM25DocScorer.score (:250-263)."""
        f = freqs.astype(self.dtype)
        norms = cache[norm_bytes.astype(np.int64)]
        return (weight_value * f / (f + norms)).astype(self.dtype)
