"""Percolator — reverse search: stored queries matched against streaming
documents.

Reference surface: Lucene's ``MemoryIndex``
(``lucene/memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java`` —
"a one-document index held in memory, built per document to evaluate queries
against it", the class javadoc's prime use-case being "query percolation").

Ray shape (monitor-at-100TB): the parsed monitor queries are tiny and ride
into every actor's ``__init__`` by value; documents stream through an
actor-pool ``map_batches``. Per batch, ONE vectorized analysis pass
(``ArrowAnalyzer`` — the same Arrow chain as the index build, so percolate
matches exactly what indexing would) produces the per-(doc, term) table;
term/boolean queries evaluate as numpy boolean-mask algebra across the whole
batch, and only phrase queries drop to per-candidate-doc position checks.
Matches ``(doc_id, query_id)`` are the only thing that leaves the stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .query import BooleanQuery, MatchAllQuery, PhraseQuery, Query, TermQuery, parse_query


class BatchIndex:
    """MemoryIndex analog for a whole Arrow batch: per-(doc, term) tf and
    positions from one vectorized analysis pass."""

    def __init__(self, texts: pa.ChunkedArray | pa.Array, analyzer_cls=None):
        from ..analysis.tokenizer import ArrowAnalyzer

        self.az = analyzer_cls if analyzer_cls is not None else ArrowAnalyzer()
        stats = self.az(texts, with_positions=True)
        self.n = len(stats.offsets) - 1
        terms = stats.terms
        if not isinstance(terms, (pa.Array, pa.ChunkedArray)):
            terms = pa.array(terms, pa.string())
        self.terms = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
        self.doc_idx = np.repeat(
            np.arange(self.n, dtype=np.int64), np.diff(stats.offsets)
        )
        self.tfs = stats.tfs.astype(np.int64)
        self.pstart = np.zeros(len(self.tfs) + 1, dtype=np.int64)
        np.cumsum(self.tfs, out=self.pstart[1:])
        self.positions = stats.positions
        self._row_of: dict | None = None  # (doc, term) → flat row, built lazily

    def term_mask(self, term: str) -> np.ndarray:
        import pyarrow.compute as pc

        m = np.zeros(self.n, dtype=bool)
        hits = pc.equal(self.terms, term)
        idx = self.doc_idx[hits.to_numpy(zero_copy_only=False)]
        m[idx] = True
        return m

    def positions_of(self, doc: int, term: str) -> np.ndarray:
        if self._row_of is None:
            # one pass over the flat (doc, term) rows; later phrase checks
            # are dict lookups instead of per-call column scans
            self._row_of = {
                (int(d), t): i
                for i, (d, t) in enumerate(zip(self.doc_idx.tolist(),
                                               self.terms.to_pylist()))
            }
        i = self._row_of.get((doc, term))
        if i is None:
            return np.empty(0, dtype=np.int64)
        return self.positions[self.pstart[i]:self.pstart[i + 1]].astype(np.int64)

    def eval(self, q: Query) -> np.ndarray:
        """→ bool[n_docs] — which docs of the batch match ``q``. Boolean
        semantics mirror the scorer: required = MUST + FILTER (all), SHOULD
        count ≥ msm (≥ max(1, msm) when nothing is required), MUST_NOT
        excludes."""
        if isinstance(q, TermQuery):
            return self.term_mask(q.term)
        if isinstance(q, MatchAllQuery):
            return np.ones(self.n, dtype=bool)
        if isinstance(q, PhraseQuery):
            return self._phrase(q)
        if isinstance(q, BooleanQuery):
            required = list(q.must) + list(q.filter)
            m = np.ones(self.n, dtype=bool)
            for c in required:
                m &= self.eval(c)
                if not m.any():
                    return m
            if q.should:
                cnt = np.zeros(self.n, dtype=np.int64)
                for c in q.should:
                    cnt += self.eval(c)
                need = q.min_should_match if required else max(1, q.min_should_match)
                m &= cnt >= need
            for c in q.must_not:
                m &= ~self.eval(c)
            return m
        raise TypeError(f"percolate: unsupported query node {type(q)}")

    def _phrase(self, q: PhraseQuery) -> np.ndarray:
        m = np.ones(self.n, dtype=bool)
        for t in set(q.terms):
            m &= self.term_mask(t)
        if not m.any() or q.slop:
            if q.slop:
                raise TypeError("percolate: sloppy phrases not supported")
            return m
        out = np.zeros(self.n, dtype=bool)
        base = q.rel_positions[0]
        for d in np.flatnonzero(m):
            starts = self.positions_of(int(d), q.terms[0]) - 0
            ok = np.ones(len(starts), dtype=bool)
            for t, rel in zip(q.terms[1:], q.rel_positions[1:]):
                p = self.positions_of(int(d), t)
                want = starts + (rel - base)
                ok &= np.isin(want, p)
                if not ok.any():
                    break
            out[d] = bool(ok.any())
        return out


class PercolateBatch:
    """Actor: parse the monitor queries once per actor; per batch build one
    BatchIndex and emit (doc_id, query_id) matches."""

    def __init__(self, queries: list[tuple[str, str]]):
        self.queries = [(qid, parse_query(qs)) for qid, qs in queries]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "query_id": pa.array([], pa.string()),
            })
        bi = BatchIndex(batch["text"])
        doc_ids = batch["doc_id"].to_numpy()
        out_d: list[np.ndarray] = []
        out_q: list[str] = []
        for qid, q in self.queries:
            m = bi.eval(q)
            hits = doc_ids[m]
            out_d.append(hits)
            out_q.extend([qid] * len(hits))
        return pa.table({
            "doc_id": pa.array(
                np.concatenate(out_d) if out_d else np.empty(0, np.int64), pa.int64()
            ),
            "query_id": pa.array(out_q, pa.string()),
        })


def percolate(docs_ds, queries: list[tuple[str, str]], concurrency=(1, 8)):
    """documents Dataset (doc_id, text) × monitor queries → Dataset of
    (doc_id, query_id) matches."""
    return docs_ds.map_batches(
        PercolateBatch,
        fn_constructor_kwargs=dict(queries=queries),
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,
    )
