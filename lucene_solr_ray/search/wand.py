"""Block-max WAND for disjunctive top-k (Ding & Suel 2011; Lucene 8's
``WANDScorer`` — the 7.7.1 reference has only skip lists and the
``score <= pqTop.score`` reject, ``search/TopScoreDocCollector.java:64-81``;
SURVEY.md §2.4 "the WAND gap").

Strategy (vectorized, doc-range rather than pointer-based):

1. Per term, per 128-posting block: exact score upper bound
   ``ub = w * maxFreq / (maxFreq + cache[byte4(minLen)])`` — the same float32
   formula as scoring, evaluated at (block max freq, block min quantized
   length), hence a tight, sound bound.
2. Project all blocks onto local-doc-space intervals (breakpoints at block
   first/last+1); interval UB = Σ covering-block ubs via a diff-array.
3. Visit intervals in UB-descending order, maintaining the running top-k
   threshold θ; stop at the first interval with ``UB < θ`` once k docs are
   held (strict < keeps ties exact — a skipped doc scores < θ and can never
   displace a tied hit under the earliest-doc-wins policy).
4. Scoring inside an interval decodes only the overlapping blocks (cached),
   and accumulates per-term float32 scores in the same canonical clause order
   as the exhaustive scorer — WAND output is rank- AND score-identical to the
   oracle (verified in tests, mirroring Lucene's TestWANDScorer approach).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util.forutil import BLOCK_SIZE, block_layout, decode_block
from ..util.smallfloat import int_to_byte4
from .query import BooleanQuery, TermQuery


class LazyTermPostings:
    """Per-term postings with per-block decode + cache (skip-friendly)."""

    def __init__(self, doc_blob: bytes, freq_blob: bytes, df: int,
                 first: np.ndarray, last: np.ndarray, maxf: np.ndarray, minl: np.ndarray,
                 pos_blob: bytes = b"", ttf: int = 0, pay_blob: bytes = b"",
                 off_blob: bytes = b""):
        self.doc_blob = doc_blob
        self.freq_blob = freq_blob
        self.df = df
        self.first = first
        self.last = last
        self.maxf = maxf
        self.minl = minl
        self.pos_blob = pos_blob
        self.ttf = ttf
        self.pay_blob = pay_blob
        self.off_blob = off_blob
        self._layout = None
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._positions: tuple[np.ndarray, np.ndarray] | None = None
        self.blocks_decoded = 0

    def payloads(self) -> tuple[np.ndarray, np.ndarray]:
        """Decode the payload stream → (per-doc offsets int64[df+1], flat
        float32 payloads aligned 1:1 with the position stream; NaN = none)."""
        if not self.pay_blob:
            raise ValueError("index built without payloads")
        f_off, _pos = self.positions()
        return f_off, np.frombuffer(self.pay_blob, dtype=np.float32)

    def offsets(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the char-offset stream → (per-doc offsets int64[df+1],
        flat starts int32, flat ends int32) aligned 1:1 with the position
        stream (IndexOptions ..._AND_OFFSETS; Lucene50PostingsFormat .pay
        offset track)."""
        if not self.off_blob:
            raise ValueError("index built without offsets")
        _, freqs = self.full()
        f_off = np.zeros(self.df + 1, dtype=np.int64)
        np.cumsum(freqs, out=f_off[1:])
        pairs = np.frombuffer(self.off_blob, dtype=np.int32).reshape(-1, 2)
        return f_off, pairs[:, 0], pairs[:, 1]

    def positions(self) -> tuple[np.ndarray, np.ndarray]:
        """Decode the position stream → (per-doc offsets int64[df+1], flat
        ascending positions). Deltas reset per doc (first raw, then diffs)."""
        if self._positions is not None:
            return self._positions
        if not self.pos_blob:
            raise ValueError("index built without positions")
        from ..util.forutil import decode_blocks

        _, freqs = self.full()
        vals = decode_blocks(self.pos_blob, self.ttf).astype(np.int64)
        f_off = np.zeros(self.df + 1, dtype=np.int64)
        np.cumsum(freqs, out=f_off[1:])
        c = np.cumsum(vals)
        base = np.where(f_off[:-1] > 0, c[np.maximum(f_off[:-1] - 1, 0)], 0)
        pos = c - np.repeat(base, freqs)
        self._positions = (f_off, pos)
        return self._positions

    @property
    def n_blocks(self) -> int:
        return len(self.first)

    def full(self) -> tuple[np.ndarray, np.ndarray]:
        """Decode all blocks → (ids, freqs); used by the exhaustive path."""
        if self.df == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        parts = [self.block(bi) for bi in range(self.n_blocks)]
        return np.concatenate([p[0] for p in parts]), np.concatenate([p[1] for p in parts])

    def block(self, bi: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(bi)
        if hit is not None:
            return hit
        if self._layout is None:
            self._layout = (block_layout(self.doc_blob, self.df), block_layout(self.freq_blob, self.df))
        (doffs, dws), (foffs, fws) = self._layout
        blen = min(BLOCK_SIZE, self.df - bi * BLOCK_SIZE)
        deltas = decode_block(self.doc_blob, int(doffs[bi]), int(dws[bi]), blen).astype(np.int64)
        ids = self.first[bi] + np.cumsum(deltas) - deltas[0]
        freqs = decode_block(self.freq_blob, int(foffs[bi]), int(fws[bi]), blen).astype(np.int32)
        self._cache[bi] = (ids, freqs)
        self.blocks_decoded += 1
        return ids, freqs


class LazyPostingsDict:
    """dict-like view over lazy postings for the exhaustive SegmentScorer."""

    def __init__(self, lazy: dict[str, "LazyTermPostings"]):
        self._lazy = lazy
        self._full: dict[str, tuple[np.ndarray, np.ndarray]] = {}

    def __contains__(self, term: str) -> bool:
        return term in self._lazy

    def __getitem__(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        hit = self._full.get(term)
        if hit is None:
            hit = self._full[term] = self._lazy[term].full()
        return hit


def build_lazy(group: pa.Table) -> dict:
    """→ {(field, term): LazyTermPostings} for one segment's posting rows."""
    out = {}
    dfs = group["df"].to_numpy()
    ttfs = group["ttf"].to_numpy()
    has_pos = "pos_blob" in group.column_names
    has_pay = "pay_blob" in group.column_names
    has_off = "off_blob" in group.column_names
    terms = group["term"].to_pylist()
    fields = (
        group["field"].to_pylist()
        if "field" in group.column_names
        else ["content"] * len(terms)
    )
    for i, t in enumerate(terms):
        out[(fields[i], t)] = LazyTermPostings(
            group["doc_blob"][i].as_py(),
            group["freq_blob"][i].as_py(),
            int(dfs[i]),
            np.asarray(group["block_first_doc"][i].as_py(), dtype=np.int64),
            np.asarray(group["block_last_doc"][i].as_py(), dtype=np.int64),
            np.asarray(group["block_max_freq"][i].as_py(), dtype=np.int64),
            np.asarray(group["block_min_len"][i].as_py(), dtype=np.int64),
            pos_blob=group["pos_blob"][i].as_py() if has_pos else b"",
            ttf=int(ttfs[i]),
            pay_blob=group["pay_blob"][i].as_py() if has_pay else b"",
            off_blob=group["off_blob"][i].as_py() if has_off else b"",
        )
    return out


def wand_topk(q: BooleanQuery, sim, lazy: dict[str, LazyTermPostings],
              weights: dict[str, float], cache: np.ndarray, norms: np.ndarray, k: int,
              stats: dict | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Pure-disjunction top-k with block-max pruning; rank/score-identical to
    the exhaustive scorer. ``stats`` (optional dict) gets pruning counters."""
    t32 = sim.dtype.type
    clauses = sorted(q.should, key=repr)  # canonical order == SegmentScorer._clauses
    terms = []
    for c in clauses:
        assert isinstance(c, TermQuery)
        tp = lazy.get((c.field, c.term))
        if tp is None or tp.df == 0:
            continue
        w = sim.weight_from_idf(weights[(c.field, c.term)], c.boost)
        mf = tp.maxf.astype(sim.dtype)
        nb = int_to_byte4(tp.minl).astype(np.int64)
        ub = (w * mf / (mf + cache[nb])).astype(sim.dtype)
        terms.append((c.term, tp, w, ub))
    if not terms:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=sim.dtype)

    # breakpoints over local doc space
    bps = np.unique(np.concatenate(
        [tp.first for _, tp, _, _ in terms] + [tp.last + 1 for _, tp, _, _ in terms]
    ))
    n_iv = len(bps) - 1
    ub_diff = np.zeros(n_iv + 1, dtype=np.float64)  # envelope bound may sum f64 (sound: >= f32 sums)
    for _, tp, _, ub in terms:
        i0 = np.searchsorted(bps, tp.first)
        i1 = np.searchsorted(bps, tp.last + 1)
        np.add.at(ub_diff, i0, ub.astype(np.float64))
        np.add.at(ub_diff, i1, -ub.astype(np.float64))
    iv_ub = np.cumsum(ub_diff[:-1])
    # tiny safety margin: float32 cascading sums in scoring may round above the
    # real-arithmetic sum; keep pruning sound without loosening bounds materially
    iv_ub = iv_ub * (1 + 1e-6) + 1e-6

    order = np.argsort(-iv_ub, kind="stable")
    top_ids = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=sim.dtype)
    theta = -np.inf
    visited = 0
    for iv in order:
        if len(top_ids) >= k and iv_ub[iv] < theta:
            break  # all remaining intervals have UB <= this one
        lo, hi = int(bps[iv]), int(bps[iv + 1])
        visited += 1
        acc = np.zeros(hi - lo, dtype=sim.dtype)
        for _, tp, w, _ in terms:
            b0 = int(np.searchsorted(tp.last, lo))  # first block with last >= lo
            b1 = int(np.searchsorted(tp.first, hi))  # blocks before this have first < hi
            for bi in range(b0, b1):
                ids, freqs = tp.block(bi)
                j0, j1 = np.searchsorted(ids, (lo, hi))
                if j0 == j1:
                    continue
                sl_ids = ids[j0:j1]
                f = freqs[j0:j1].astype(sim.dtype)
                sc = w * f / (f + cache[norms[sl_ids].astype(np.int64)])
                acc[sl_ids - lo] += sc.astype(sim.dtype)
            # fallthrough: blocks outside [b0,b1) cannot contain docs in range
        nz = np.flatnonzero(acc > 0)
        if len(nz) == 0:
            continue
        cand_ids = (lo + nz).astype(np.int64)
        cand_scores = acc[nz]
        all_ids = np.concatenate([top_ids, cand_ids])
        all_scores = np.concatenate([top_scores, cand_scores])
        sel = np.lexsort((all_ids, -all_scores))[:k]
        top_ids, top_scores = all_ids[sel], all_scores[sel]
        if len(top_ids) >= k:
            theta = float(top_scores[-1])
    if stats is not None:
        stats["intervals_total"] = n_iv
        stats["intervals_visited"] = visited
        stats["blocks_decoded"] = sum(tp.blocks_decoded for _, tp, _, _ in terms)
        stats["blocks_total"] = sum(tp.n_blocks for _, tp, _, _ in terms)
    return top_ids, top_scores
