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


_LOG2 = math.log(2.0)


class _SimilarityBaseFamily:
    """Shared scaffolding for the ``SimilarityBase`` hierarchy
    (``similarities/SimilarityBase.java``): score(stats, freq, docLen) with
    docLen = LENGTH_TABLE[normByte] (BasicSimScorer.getLengthValue, :280-289;
    norms omitted → docLen=1), avgFieldLength = (float)(sumTTF/(double)docCount)
    (:130). Subclasses implement ``_score32`` (reference float32 op order) and
    ``_score64`` (sql-compat float64 with scalar libm logs — numpy's SIMD log
    can differ from DuckDB's std::log by 1 ulp).

    Phrases: SimilarityBase "scores phrases as a summation of the individual
    term scores" (:42-45) — a different weight architecture than our
    PhraseWeight, so ``supports_phrases=False`` (raises instead of
    mis-scoring)."""

    supports_wand = False
    supports_phrases = False

    def __init__(self, dtype=np.float32):
        self.dtype = np.dtype(dtype)

    def idf(self, df: int, doc_count: int):  # explain() compatibility only
        return self.dtype.type(0.0)

    def term_weight_stat(self, df: int, ttf: int, doc_count: int, sum_ttf: int):
        return (int(df), int(ttf), int(doc_count), int(sum_ttf))

    def avgdl(self, sum_ttf: int, doc_count: int):
        if doc_count == 0:
            return self.dtype.type(1.0)
        return self.dtype.type(sum_ttf / float(doc_count))

    def norm_cache(self, avgdl) -> np.ndarray:
        return LENGTH_TABLE.astype(self.dtype)

    def nonorm_cache(self) -> np.ndarray:
        return np.ones(256, dtype=self.dtype)  # docLen = 1 (getLengthValue)

    def weight_from_idf(self, stat, boost: float = 1.0):
        return (float(boost), stat)

    def score_freqs(self, weight_value, freqs, norm_bytes, cache) -> np.ndarray:
        boost, (df, ttf, n_docs, sum_ttf) = weight_value
        doc_len = cache[norm_bytes.astype(np.int64)]
        if self.dtype == np.dtype(np.float64):
            out = np.array(
                [self._score64(boost, df, ttf, n_docs, sum_ttf, float(f), float(dl))
                 for f, dl in zip(freqs, doc_len)],
                dtype=np.float64,
            )
            return out if len(out) else np.empty(0, dtype=np.float64)
        return self._score32(boost, df, ttf, n_docs, sum_ttf,
                             freqs.astype(np.float32), doc_len.astype(np.float32))


def _tfn32(norm: str, c: float, avg: np.float32, tf: np.ndarray, dl: np.ndarray) -> np.ndarray:
    """Normalization.tfn in float32 op order. h1: ``tf*c*avg/len`` (float ops,
    NormalizationH1.java:51); h2: ``(float)(tf * log2(1 + c*avg/len))`` — the
    log argument is computed in float then widened (NormalizationH2.java:52)."""
    f4 = np.float32
    if norm == "h1":
        return ((tf * f4(c)) * avg) / dl
    inner = (f4(1.0) + ((f4(c) * avg) / dl)).astype(np.float64)
    return (tf.astype(np.float64) * (np.log(inner) / _LOG2)).astype(np.float32)


def _tfn64(norm: str, c: float, avg: float, tf: float, dl: float) -> float:
    if norm == "h1":
        return ((tf * c) * avg) / dl
    return tf * (math.log(1.0 + ((c * avg) / dl)) / _LOG2)


class DFRSimilarity(_SimilarityBaseFamily):
    """Divergence-from-randomness — ``similarities/DFRSimilarity.java:110-114``:
    ``score = boost * basicModel.score(stats, tfn) * afterEffect.score(stats, tfn)``.

    Basic models: In ``tfn * log2((N+1)/(n+0.5))`` (BasicModelIn.java:33-37),
    G ``log2(λ+1) + tfn·log2((1+λ)/λ)``, λ=F/(N+F), F=ttf+1 (BasicModelG.java:34-41).
    After-effects: B ``(F+1)/(n·(tfn+1))`` with F=ttf+1, n=df+1
    (AfterEffectB.java:32-36), L ``1/(tfn+1)`` (AfterEffectL.java:32-34).
    Normalizations: H1/H2 (c=1 default)."""

    def __init__(self, basic_model: str = "in", after_effect: str = "b",
                 normalization: str = "h2", c: float = 1.0, dtype=np.float32):
        super().__init__(dtype)
        if basic_model not in ("in", "g"):
            raise ValueError(f"unsupported basic model {basic_model!r}")
        if after_effect not in ("b", "l"):
            raise ValueError(f"unsupported after effect {after_effect!r}")
        if normalization not in ("h1", "h2"):
            raise ValueError(f"unsupported normalization {normalization!r}")
        self.basic_model, self.after_effect = basic_model, after_effect
        self.normalization, self.c = normalization, float(c)

    def spec(self):
        return ("dfr", self.basic_model, self.after_effect, self.normalization,
                self.c, self.dtype.name)

    def _score32(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        f4 = np.float32
        avg = f4(sum_ttf / float(n_docs)) if n_docs else f4(1.0)
        tfn = _tfn32(self.normalization, self.c, avg, tf, dl)
        if self.basic_model == "in":
            model = tfn * f4(math.log((n_docs + 1) / (df + 0.5)) / _LOG2)
        else:
            F = float(ttf + 1)
            lam = F / (n_docs + F)
            model = (math.log(lam + 1) / _LOG2
                     + tfn.astype(np.float64) * (math.log((1 + lam) / lam) / _LOG2)
                     ).astype(np.float32)
        if self.after_effect == "b":
            effect = f4(ttf + 2) / (f4(df + 1) * (tfn + f4(1.0)))
        else:
            effect = f4(1.0) / (tfn + f4(1.0))
        return ((f4(boost) * model) * effect).astype(np.float32)

    def _score64(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        avg = sum_ttf / float(n_docs) if n_docs else 1.0
        tfn = _tfn64(self.normalization, self.c, avg, tf, dl)
        if self.basic_model == "in":
            model = tfn * (math.log((n_docs + 1) / (df + 0.5)) / _LOG2)
        else:
            F = float(ttf + 1)
            lam = F / (n_docs + F)
            model = math.log(lam + 1) / _LOG2 + tfn * (math.log((1 + lam) / lam) / _LOG2)
        if self.after_effect == "b":
            effect = (ttf + 2) / ((df + 1) * (tfn + 1.0))
        else:
            effect = 1.0 / (tfn + 1.0)
        return (boost * model) * effect


class IBSimilarity(_SimilarityBaseFamily):
    """Information-based — ``similarities/IBSimilarity.java:98-104``:
    ``score = boost * distribution.score(stats, tfn, lambda)``.

    Distributions: LL ``-log(λ/(tfn+λ))`` (DistributionLL.java:33-35),
    SPL ``-log((λ^(tfn/(tfn+1)) - λ)/(1-λ))``, λ==1→0.99
    (DistributionSPL.java:36-42). Lambdas: DF ``(df+1)/(N+1)``
    (LambdaDF.java:32-34), TTF ``(ttf+1)/(N+1)`` (LambdaTTF.java:32-34)."""

    def __init__(self, distribution: str = "ll", lambda_: str = "df",
                 normalization: str = "h2", c: float = 1.0, dtype=np.float32):
        super().__init__(dtype)
        if distribution not in ("ll", "spl"):
            raise ValueError(f"unsupported distribution {distribution!r}")
        if lambda_ not in ("df", "ttf"):
            raise ValueError(f"unsupported lambda {lambda_!r}")
        if normalization not in ("h1", "h2"):
            raise ValueError(f"unsupported normalization {normalization!r}")
        self.distribution, self.lambda_ = distribution, lambda_
        self.normalization, self.c = normalization, float(c)

    def spec(self):
        return ("ib", self.distribution, self.lambda_, self.normalization,
                self.c, self.dtype.name)

    def _lambda32(self, df, ttf, n_docs) -> np.float32:
        f4 = np.float32
        num = f4(df + 1.0) if self.lambda_ == "df" else f4(ttf + 1.0)
        return num / f4(n_docs + 1.0)

    def _score32(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        f4 = np.float32
        avg = f4(sum_ttf / float(n_docs)) if n_docs else f4(1.0)
        tfn = _tfn32(self.normalization, self.c, avg, tf, dl)
        lam = self._lambda32(df, ttf, n_docs)
        if self.distribution == "ll":
            dist = (-np.log((lam / (tfn + lam)).astype(np.float64))).astype(np.float32)
        else:
            if lam == f4(1.0):
                lam = f4(0.99)
            expo = (tfn / (tfn + f4(1.0))).astype(np.float64)
            arg = (np.power(np.float64(lam), expo) - np.float64(lam)) / np.float64(f4(1.0) - lam)
            dist = (-np.log(arg)).astype(np.float32)
        return (f4(boost) * dist).astype(np.float32)

    def _score64(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        avg = sum_ttf / float(n_docs) if n_docs else 1.0
        tfn = _tfn64(self.normalization, self.c, avg, tf, dl)
        num = (df + 1.0) if self.lambda_ == "df" else (ttf + 1.0)
        lam = num / (n_docs + 1.0)
        if self.distribution == "ll":
            dist = -math.log(lam / (tfn + lam))
        else:
            if lam == 1.0:
                lam = 0.99
            dist = -math.log((math.pow(lam, tfn / (tfn + 1.0)) - lam) / (1.0 - lam))
        return boost * dist


class LMJelinekMercerSimilarity(_SimilarityBaseFamily):
    """LM with Jelinek-Mercer smoothing —
    ``similarities/LMJelinekMercerSimilarity.java:54-59``:
    ``score = boost * log(1 + ((1-λ)·freq/docLen)/(λ·p))`` with collection
    probability ``p = (ttf+1)/(sumTTF+1)`` (LMSimilarity.java:154-156)."""

    def __init__(self, lam: float = 0.7, dtype=np.float32):
        super().__init__(dtype)
        self.lam = float(lam)

    def spec(self):
        return ("jm", self.lam, self.dtype.name)

    def _score32(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        f4 = np.float32
        p = f4(ttf + 1.0) / f4(sum_ttf + 1.0)
        lam = f4(self.lam)
        inner = f4(1.0) + (((f4(1.0) - lam) * tf) / dl) / (lam * p)
        return (f4(boost) * np.log(inner.astype(np.float64)).astype(np.float32)
                ).astype(np.float32)

    def _score64(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        p = (ttf + 1.0) / (sum_ttf + 1.0)
        lam = self.lam
        return boost * math.log(1.0 + (((1.0 - lam) * tf) / dl) / (lam * p))


class DFISimilarity(_SimilarityBaseFamily):
    """Divergence from independence — ``similarities/DFISimilarity.java:53-62``:
    ``expected = (ttf+1)·docLen/(numberOfFieldTokens+1)``; freq ≤ expected → 0;
    else ``boost * log2(independence(freq, expected) + 1)`` with ChiSquared
    independence ``(freq-expected)²/expected`` (IndependenceChiSquared.java:36-38)."""

    def __init__(self, dtype=np.float32):
        super().__init__(dtype)

    def spec(self):
        return ("dfi", self.dtype.name)

    def _score32(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        f4 = np.float32
        expected = (f4(ttf + 1) * dl) / f4(sum_ttf + 1)
        measure = ((tf - expected) * (tf - expected)) / expected
        raw = (np.log((measure + f4(1.0)).astype(np.float64)) / _LOG2).astype(np.float32)
        return np.where(tf <= expected, f4(0.0), (f4(boost) * raw).astype(np.float32))

    def _score64(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        expected = ((ttf + 1) * dl) / (sum_ttf + 1)
        if tf <= expected:
            return 0.0
        measure = ((tf - expected) * (tf - expected)) / expected
        return boost * (math.log(measure + 1.0) / _LOG2)


class BooleanSimilarity:
    """``similarities/BooleanSimilarity.java:70-72``: every match scores the
    query boost; norms and frequencies are ignored; phrase slop factor is 1
    (:84-86) so phrase matches also score the boost."""

    supports_wand = False
    supports_phrases = True

    def __init__(self, dtype=np.float32):
        self.dtype = np.dtype(dtype)

    def spec(self):
        return ("bool", self.dtype.name)

    def idf(self, df: int, doc_count: int):
        return self.dtype.type(0.0)

    def term_weight_stat(self, df: int, ttf: int, doc_count: int, sum_ttf: int):
        return 1.0

    def avgdl(self, sum_ttf: int, doc_count: int):
        return self.dtype.type(1.0)

    def norm_cache(self, avgdl) -> np.ndarray:
        return np.ones(256, dtype=self.dtype)

    def nonorm_cache(self) -> np.ndarray:
        return np.ones(256, dtype=self.dtype)

    def weight_from_idf(self, stat, boost: float = 1.0):
        return self.dtype.type(boost)

    def score_freqs(self, weight_value, freqs, norm_bytes, cache) -> np.ndarray:
        return np.full(len(freqs), weight_value, dtype=self.dtype)


class AxiomaticF2EXP(_SimilarityBaseFamily):
    """Axiomatic F2EXP — ``similarities/AxiomaticF2EXP.java:59-93`` over
    ``Axiomatic.java:103-109``: score = tf·ln·tfln·idf − gamma with tf=ln=1,
    gamma=0, tfln = freq/((freq + s) + (s·docLen)/avgdl) (float32 op order),
    idf = (float)pow((N+1.0)/df, k) (double pow, one cast). Defaults
    s=0.25, k=0.35. NOTE the reference's ``Axiomatic.score`` never
    multiplies ``stats.getBoost()`` — boosts are ignored, kept faithfully."""

    def __init__(self, s: float = 0.25, k: float = 0.35, dtype=np.float32):
        super().__init__(dtype)
        if not (0 <= s <= 1) or not (0 <= k <= 1):
            raise ValueError("s and k must be in [0, 1]")
        self.s, self.k = float(s), float(k)

    def spec(self):
        return ("axiomatic", self.s, self.k, self.dtype.name)

    def _score32(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        f4 = np.float32
        avg = f4(sum_ttf / float(n_docs)) if n_docs else f4(1.0)
        s = f4(self.s)
        tfln = tf / ((tf + s) + ((s * dl) / avg))
        idf = f4(math.pow((n_docs + 1.0) / df, self.k))
        return (tfln * idf).astype(np.float32)

    def _score64(self, boost, df, ttf, n_docs, sum_ttf, tf, dl):
        avg = sum_ttf / float(n_docs) if n_docs else 1.0
        tfln = tf / ((tf + self.s) + ((self.s * dl) / avg))
        return tfln * math.pow((n_docs + 1.0) / df, self.k)


class SweetSpotSimilarity(ClassicSimilarity):
    """``lucene/misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java``:
    ClassicSimilarity with a plateaued length norm and an optional baseline
    tf. ``computeLengthNorm`` (:119-127): 1/sqrt(steepness·(|l−min| +
    |l−max| − (max−min)) + 1) — flat 1.0 inside [ln_min, ln_max], sloping
    off outside. ``baselineTf`` (:146-153): 0 for freq 0; ``base`` for
    0 < freq ≤ min; sqrt(freq + base² − min) above (None keeps Classic's
    sqrt tf)."""

    def __init__(self, ln_min: int = 1, ln_max: int = 1, steepness: float = 0.5,
                 tf_min: float | None = None, tf_base: float = 0.0,
                 dtype=np.float32):
        super().__init__(dtype=dtype)
        self.ln_min, self.ln_max, self.steepness = ln_min, ln_max, steepness
        self.tf_min, self.tf_base = tf_min, tf_base

    def spec(self):
        return ("sweet", self.ln_min, self.ln_max, self.steepness,
                self.tf_min, self.tf_base, self.dtype.name)

    def norm_cache(self, avgdl) -> np.ndarray:
        lt = LENGTH_TABLE.astype(np.float64)
        mn, mx, s = float(self.ln_min), float(self.ln_max), float(self.steepness)
        return (
            1.0 / np.sqrt(s * (np.abs(lt - mn) + np.abs(lt - mx) - (mx - mn)) + 1.0)
        ).astype(self.dtype)

    def score_freqs(self, weight_value, freqs, norm_bytes, cache) -> np.ndarray:
        f64 = freqs.astype(np.float64)
        if self.tf_min is None:
            f = np.sqrt(f64)
        else:
            f = np.where(
                f64 <= self.tf_min,
                float(self.tf_base),
                np.sqrt(f64 + self.tf_base * self.tf_base - self.tf_min),
            )
            f = np.where(f64 == 0.0, 0.0, f)
        f = f.astype(self.dtype)
        return (f * weight_value * cache[norm_bytes.astype(np.int64)]).astype(self.dtype)


def similarity_from_spec(spec) -> object:
    """Rebuild a similarity from its picklable ``spec()`` tuple (actor-pool
    constructor argument; legacy ``(k1, b, dtype)`` tuples stay BM25)."""
    if not isinstance(spec, tuple):
        raise TypeError(f"bad similarity spec: {spec!r}")
    if spec and spec[0] == "axiomatic":
        return AxiomaticF2EXP(spec[1], spec[2], dtype=np.dtype(spec[3]))
    if spec and spec[0] == "sweet":
        return SweetSpotSimilarity(spec[1], spec[2], spec[3], spec[4], spec[5],
                                   dtype=np.dtype(spec[6]))
    if spec and spec[0] == "classic":
        return ClassicSimilarity(dtype=np.dtype(spec[1]))
    if spec and spec[0] == "lmd":
        return LMDirichletSimilarity(mu=spec[1], dtype=np.dtype(spec[2]))
    if spec and spec[0] == "dfr":
        return DFRSimilarity(spec[1], spec[2], spec[3], spec[4], dtype=np.dtype(spec[5]))
    if spec and spec[0] == "ib":
        return IBSimilarity(spec[1], spec[2], spec[3], spec[4], dtype=np.dtype(spec[5]))
    if spec and spec[0] == "jm":
        return LMJelinekMercerSimilarity(lam=spec[1], dtype=np.dtype(spec[2]))
    if spec and spec[0] == "dfi":
        return DFISimilarity(dtype=np.dtype(spec[1]))
    if spec and spec[0] == "bool":
        return BooleanSimilarity(dtype=np.dtype(spec[1]))
    if spec and spec[0] == "bm25":
        return BM25Similarity(spec[1], spec[2], dtype=np.dtype(spec[3]))
    k1, b, dtype = spec  # legacy positional form
    return BM25Similarity(k1, b, dtype=dtype)
