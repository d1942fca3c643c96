"""Pluggable similarities beyond BM25 (SURVEY.md §2.6;
``search/similarities/`` — the reference ships 49 strategy files, the three
families that cover real query traffic are implemented here).

Interface (shared with :class:`..search.bm25.BM25Similarity`):

- ``term_weight_stat(df, ttf, doc_count, sum_ttf)`` → per-term global stat
  cached in the searcher's weight map (idf for TF-IDF families, the
  collection LM probability for LM-Dirichlet).
- ``weight_from_idf(stat, boost)`` → the per-clause weight value.
- ``norm_cache(avgdl)`` → 256-entry table indexed by the norm byte.
- ``nonorm_cache()`` → the table used for fields indexed without norms.
- ``score_freqs(weight, freqs, norm_bytes, cache)`` → vectorized scores.
- ``spec()`` / :func:`similarity_from_spec` → picklable actor-pool shipping.
"""

from __future__ import annotations

import math

import numpy as np

from ..util.smallfloat import LENGTH_TABLE
from .bm25 import BM25Similarity


class ClassicSimilarity:
    """TF-IDF — ``similarities/ClassicSimilarity.java`` +
    ``TFIDFSimilarity.java:557-612``:

    ``idf = (float)(ln((docCount+1)/(df+1)) + 1)`` (:74),
    ``queryWeight = boost * idf`` (TFIDFSimilarity.java:646),
    ``normTable[i] = 1/sqrt(byte4ToInt(i))`` (lengthNorm :40, table :561-565),
    ``score = sqrt(freq) * queryWeight * normTable[normByte]`` (:599-612).
    """

    supports_wand = False
    supports_phrases = True  # PhraseWeight sums idfs like BM25's

    def __init__(self, dtype=np.float32):
        self.dtype = np.dtype(dtype)

    def spec(self):
        return ("classic", self.dtype.name)

    def idf(self, df: int, doc_count: int):
        return self.dtype.type(math.log((doc_count + 1) / float(df + 1)) + 1.0)

    def term_weight_stat(self, df: int, ttf: int, doc_count: int, sum_ttf: int):
        return float(self.idf(df, doc_count))

    def avgdl(self, sum_ttf: int, doc_count: int):
        if doc_count == 0:
            return self.dtype.type(1.0)
        return self.dtype.type(sum_ttf / float(doc_count))

    def norm_cache(self, avgdl) -> np.ndarray:
        lt = LENGTH_TABLE.astype(np.float64)
        out = np.zeros(256, dtype=self.dtype)
        nz = lt > 0
        out[nz] = (1.0 / np.sqrt(lt[nz])).astype(self.dtype)
        return out

    def nonorm_cache(self) -> np.ndarray:
        # norms == null → "return raw" (TFIDFSimilarity.java:602-603)
        return np.ones(256, dtype=self.dtype)

    def weight_from_idf(self, stat, boost: float = 1.0):
        t = self.dtype.type
        return t(boost) * t(stat)

    def score_freqs(self, weight_value, freqs, norm_bytes, cache) -> np.ndarray:
        f = np.sqrt(freqs.astype(self.dtype)).astype(self.dtype)
        return (f * weight_value * cache[norm_bytes.astype(np.int64)]).astype(self.dtype)


class LMDirichletSimilarity:
    """Language model with Dirichlet smoothing —
    ``similarities/LMDirichletSimilarity.java:66-71`` over
    ``SimilarityBase.java:269-295``:

    ``p = (ttf + 1F) / (sumTotalTermFreq + 1F)`` (LMSimilarity.java:154-156),
    ``docLen = LENGTH_TABLE[normByte]`` (float length),
    ``score = boost * (float)(ln(1 + freq/(mu·p)) + ln(mu/(docLen + mu)))``,
    clamped to ≥ 0 (:70 — "returns 0" for worse-than-collection docs).
    """

    supports_wand = False
    supports_phrases = False  # SimilarityBase phrase stats differ; not built

    def __init__(self, mu: float = 2000.0, dtype=np.float32):
        self.mu = float(mu)
        self.dtype = np.dtype(dtype)

    def spec(self):
        return ("lmd", self.mu, self.dtype.name)

    def idf(self, df: int, doc_count: int):  # explain() compatibility only
        return self.dtype.type(0.0)

    def term_weight_stat(self, df: int, ttf: int, doc_count: int, sum_ttf: int):
        if self.dtype == np.dtype(np.float32):
            t = np.float32  # the reference computes p in float (+1F ops)
            return float(t(t(ttf + 1) / t(sum_ttf + 1)))
        return (ttf + 1) / (sum_ttf + 1)  # float64 sql-compat mode

    def avgdl(self, sum_ttf: int, doc_count: int):
        if doc_count == 0:
            return self.dtype.type(1.0)
        return self.dtype.type(sum_ttf / float(doc_count))

    def norm_cache(self, avgdl) -> np.ndarray:
        # cache = float docLen per norm byte (SimilarityBase LENGTH_TABLE)
        return LENGTH_TABLE.astype(self.dtype)

    def nonorm_cache(self) -> np.ndarray:
        # norms omitted → docLen = 1 (SimilarityBase.getLengthValue)
        return np.ones(256, dtype=self.dtype)

    def weight_from_idf(self, stat, boost: float = 1.0):
        return (float(boost), float(stat))

    def score_freqs(self, weight_value, freqs, norm_bytes, cache) -> np.ndarray:
        boost, p = weight_value
        doc_len = cache[norm_bytes.astype(np.int64)].astype(np.float64)
        f = freqs.astype(np.float64)
        if self.dtype == np.dtype(np.float64):
            # sql-compat mode: scalar libm log — numpy's SIMD log can differ
            # from DuckDB's std::log by 1 ulp, which the oracle hash catches
            mu = self.mu
            raw = np.array(
                [math.log(1 + fi / (mu * p)) + math.log(mu / (dl + mu))
                 for fi, dl in zip(f, doc_len)],
                dtype=np.float64,
            )
        else:
            raw = np.log(1 + f / (self.mu * p)) + np.log(self.mu / (doc_len + self.mu))
        s = (self.dtype.type(boost) * raw.astype(self.dtype)).astype(self.dtype)
        return np.maximum(s, self.dtype.type(0.0))


def similarity_from_spec(spec) -> object:
    """Rebuild a similarity from its picklable ``spec()`` tuple (actor-pool
    constructor argument; legacy ``(k1, b, dtype)`` tuples stay BM25)."""
    if not isinstance(spec, tuple):
        raise TypeError(f"bad similarity spec: {spec!r}")
    if spec and spec[0] == "classic":
        return ClassicSimilarity(dtype=np.dtype(spec[1]))
    if spec and spec[0] == "lmd":
        return LMDirichletSimilarity(mu=spec[1], dtype=np.dtype(spec[2]))
    if spec and spec[0] == "bm25":
        return BM25Similarity(spec[1], spec[2], dtype=np.dtype(spec[3]))
    k1, b, dtype = spec  # legacy positional form
    return BM25Similarity(k1, b, dtype=dtype)
