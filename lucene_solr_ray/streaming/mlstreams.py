"""Streaming ML — Solr 7's ``features()`` / ``train()`` expressions.

References:
- ``solr/core/src/java/org/apache/solr/search/IGainTermsQParserPlugin.java``
  (information-gain term scoring: per-term binary-entropy gain over a binary
  outcome, including the reference's ``numDocs - docFreq + 1`` denominator
  quirk and H(0)=H(1)=0 guard) wrapped by
  ``solrj/io/stream/FeaturesSelectionStream.java`` (adds
  ``idf_d = ln(numDocs / (docFreq + 1))`` per selected term).
- ``solr/core/src/java/org/apache/solr/search/TextLogisticRegressionQParserPlugin.java``
  (one gradient-descent pass per shard: doc vector = [1, idf_i·(1+ln tf_i)...],
  sequential per-doc updates w -= α·(σ(v·w) − y)·v) wrapped by
  ``solrj/io/stream/TextLogitStream.java`` (per iteration, shard weights are
  AVERAGED — federated averaging).

Ray-Data-first shape: term statistics are per-block partials (unique-terms ×
outcome counts) combined in one small groupby — only (term, df, positive_df)
rows shuffle. Training runs the reference's shard protocol with one Ray task
per partition and driver-side weight averaging per iteration (the weights
vector is tiny: numTerms+1 doubles). Partitions are deterministic fixed-size
row ranges, and within a partition docs update in row order (the reference
iterates a HashMap — order unspecified; ours is pinned to doc order)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import ArrowAnalyzer, StandardAnalyzer

TRAIN_PARTITION_ROWS = 5_000  # deterministic shard analog for train()

#: carries (numDocs, numPositiveDocs) through the term groupby; contains a
#: NUL byte so no \w+ token can ever collide with it
_DOC_SENTINEL = "\x00doc"


def _binary_entropy(p: float) -> float:
    if p <= 0.0 or p >= 1.0:
        return 0.0
    return -p * math.log(p) - (1.0 - p) * math.log(1.0 - p)


def _doc_term_stats(batch: pa.Table, analyzer: ArrowAnalyzer,
                    text_col: str, outcome_col, positive) -> pa.Table:
    """One block's partial: per term (df, positive_df) + one __doc__ row
    carrying (numDocs, numPositiveDocs)."""
    text = batch[text_col].cast(pa.large_string())
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    stats = analyzer(text)
    pos_doc = (
        batch[outcome_col].to_numpy(zero_copy_only=False) == positive
    ).astype(np.int64)
    lens = np.diff(stats.offsets)
    doc_of_term = np.repeat(np.arange(len(batch)), lens)
    terms = stats.terms
    import pyarrow.compute as pc

    de = pc.dictionary_encode(
        terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    )
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    codes = de.indices.to_numpy().astype(np.int64)
    nv = len(de.dictionary)
    df = np.bincount(codes, minlength=nv)
    pdf = np.bincount(codes, weights=pos_doc[doc_of_term], minlength=nv)
    return pa.table(
        {
            "term": pa.concat_arrays([de.dictionary.cast(pa.string()),
                                      pa.array([_DOC_SENTINEL], pa.string())]),
            "df": pa.array(np.concatenate([df, [len(batch)]]), pa.int64()),
            "positive_df": pa.array(
                np.concatenate([pdf.astype(np.int64), [int(pos_doc.sum())]]),
                pa.int64(),
            ),
        }
    )


def features_select(sf_dir: str, collection: str, text_col: str,
                    outcome_col: str, positive, num_terms: int,
                    q=None) -> pa.Table:
    """``features(...)`` → (featureSet rank, term, score, idf_d) table.

    Distributed IGain: per-block (term, df, positive_df) partials →
    ``groupby(term).sum`` → tiny driver-side scoring pass over the
    vocabulary stats (IGainTermsQParserPlugin.java:156-186; ties break by
    term ascending)."""
    import ray.data
    from ray.data.aggregate import Sum

    from .streams import TABLES, parse_q, _sized_parquet

    if collection not in TABLES:
        raise ValueError(f"unknown collection {collection!r}")
    path = f"{sf_dir}/{collection}.parquet"
    import pyarrow.parquet as pq

    flt = parse_q(q, pq.read_schema(path))
    ds = _sized_parquet(path, [text_col, outcome_col], flt)
    analyzer = ArrowAnalyzer(StandardAnalyzer())
    parts = ds.map_batches(
        lambda b: _doc_term_stats(b, analyzer, text_col, outcome_col, positive),
        batch_format="pyarrow", batch_size=4096,
    )
    agg = parts.groupby("term").aggregate(Sum("df"), Sum("positive_df"))
    tbl = pa.concat_tables(agg.iter_batches(batch_format="pyarrow"))
    empty = pa.table({
        "rank": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
        "score": pa.array([], pa.float64()), "idf_d": pa.array([], pa.float64()),
    })
    if not len(tbl):
        return empty  # empty / fully-filtered collection → empty feature set
    terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
    dfs = tbl["sum(df)"].to_numpy().astype(np.int64)
    pdfs = tbl["sum(positive_df)"].to_numpy().astype(np.int64)
    doc_row = terms == _DOC_SENTINEL
    num_docs = int(dfs[doc_row][0]) if doc_row.any() else 0
    if num_docs == 0:
        return empty
    num_pos = int(pdfs[doc_row][0])
    entropy_c = _binary_entropy(num_pos / num_docs) if num_docs else 0.0
    out = []
    for t, df, xc in zip(terms[~doc_row], dfs[~doc_row], pdfs[~doc_row]):
        h_in = _binary_entropy(xc / df)
        h_out = _binary_entropy((num_pos - xc) / (num_docs - df + 1))
        score = entropy_c - ((df / num_docs) * h_in + (1.0 - df / num_docs) * h_out)
        out.append((str(t), float(score), int(df)))
    out.sort(key=lambda r: (-r[1], r[0]))
    out = out[:num_terms]
    return pa.table(
        {
            "rank": pa.array(range(len(out)), pa.int64()),
            "term": pa.array([t for t, _, _ in out], pa.string()),
            "score": pa.array([s for _, s, _ in out], pa.float64()),
            "idf_d": pa.array(
                [math.log(num_docs / (df + 1.0)) for _, _, df in out], pa.float64()
            ),
        }
    )


class _ShardSGD:
    """One partition's sequential gradient pass (the reference's per-shard
    TextLogisticRegressionCollector), runnable as a Ray task."""

    def __init__(self, terms: list[str], idfs: np.ndarray, text_col: str,
                 outcome_col: str, positive, alpha: float, threshold: float):
        self.terms = {t: i for i, t in enumerate(terms)}
        self.idfs = idfs
        self.text_col = text_col
        self.outcome_col = outcome_col
        self.positive = positive
        self.alpha = alpha
        self.threshold = threshold
        self.analyzer = ArrowAnalyzer(StandardAnalyzer())
        self._vectors = None  # built once per partition, reused per iteration

    def vectors(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        if self._vectors is not None:
            return self._vectors
        text = batch[self.text_col].cast(pa.large_string())
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        stats = self.analyzer(text)
        n = len(batch)
        k = len(self.terms)
        V = np.zeros((n, k + 1), dtype=np.float64)
        V[:, 0] = 1.0  # bias
        lens = np.diff(stats.offsets)
        doc_of = np.repeat(np.arange(n), lens)
        terms = stats.terms.to_pylist()
        tfs = np.asarray(stats.tfs, dtype=np.float64)
        for j, t in enumerate(terms):
            ti = self.terms.get(t)
            if ti is not None:
                # idf * (1 + ln(tf)) (TextLogisticRegressionQParserPlugin:188)
                V[doc_of[j], ti + 1] = self.idfs[ti] * (1.0 + math.log(tfs[j]))
        y = (
            batch[self.outcome_col].to_numpy(zero_copy_only=False) == self.positive
        ).astype(np.float64)
        self._vectors = (V, y)
        return self._vectors

    def run_iteration(self, batch: pa.Table, weights: np.ndarray):
        """→ (new_weights, total_error, tp, fp, tn, fn) for this shard."""
        V, y = self.vectors(batch)
        w = weights.copy()
        w0 = weights
        total_error = 0.0
        tp = fp = tn = fn = 0
        # evaluation uses the ITERATION-START weights; updates are sequential
        # per doc (reference semantics, :195-212)
        sig0 = 1.0 / (1.0 + np.exp(-(V @ w0)))
        total_error = float(np.abs(sig0 - y).sum())
        pred = sig0 >= self.threshold
        tp = int(np.sum(pred & (y == 1)))
        fp = int(np.sum(pred & (y == 0)))
        tn = int(np.sum(~pred & (y == 0)))
        fn = int(np.sum(~pred & (y == 1)))
        for i in range(len(y)):
            v = V[i]
            sig = 1.0 / (1.0 + math.exp(-float(v @ w)))
            w -= (self.alpha * (sig - y[i])) * v
        return w, total_error, tp, fp, tn, fn


def train_logreg(sf_dir: str, collection: str, text_col: str, outcome_col: str,
                 positive, num_terms: int = 20, iterations: int = 10,
                 alpha: float = 0.01, threshold: float = 0.5,
                 q=None) -> pa.Table:
    """``train(...)`` → one row per iteration (error, accuracy, weights...).

    Shard protocol of TextLogitStream: deterministic fixed-size partitions
    play the shards; each runs a sequential gradient pass from the
    iteration's broadcast weights; the driver AVERAGES shard weights
    (TextLogitStream.averageWeights) and re-broadcasts. Feature terms come
    from :func:`features_select` on the same data."""
    import ray

    import pyarrow.parquet as pq

    feats = features_select(sf_dir, collection, text_col, outcome_col,
                            positive, num_terms, q=q)
    terms = feats["term"].to_pylist()
    idfs = feats["idf_d"].to_numpy().astype(np.float64)

    from .streams import parse_q

    path = f"{sf_dir}/{collection}.parquet"
    flt = parse_q(q, pq.read_schema(path))
    full = pq.read_table(path, columns=[text_col, outcome_col], filters=flt)
    shards = [
        full.slice(off, TRAIN_PARTITION_ROWS)
        for off in range(0, len(full), TRAIN_PARTITION_ROWS)
    ]

    # one stateful worker per shard: the doc-vector matrix is built once in
    # the actor and reused across iterations (at 100-TB scale each actor
    # would read its own partition range instead of receiving a table)
    @ray.remote(max_restarts=0)
    class ShardWorker:
        def __init__(self, shard_tbl: pa.Table, terms, idfs):
            self.sgd = _ShardSGD(terms, idfs, text_col, outcome_col,
                                 positive, alpha, threshold)
            self.tbl = shard_tbl

        def run(self, weights: np.ndarray):
            return self.sgd.run_iteration(self.tbl, weights)

    workers = [
        ShardWorker.remote(ray.put(s), terms, idfs) for s in shards
    ]
    weights = np.ones(len(terms) + 1, dtype=np.float64)  # reference init = 1.0
    rows = []
    for it in range(1, iterations + 1):
        results = ray.get([w.run.remote(weights) for w in workers])
        weights = np.mean([r[0] for r in results], axis=0)
        err = float(sum(r[1] for r in results))
        tp = sum(r[2] for r in results)
        fp = sum(r[3] for r in results)
        tn = sum(r[4] for r in results)
        fn = sum(r[5] for r in results)
        acc = (tp + tn) / max(tp + fp + tn + fn, 1)
        rows.append((it, err, acc, tp, fp, tn, fn,
                     ",".join(f"{w:.6f}" for w in weights)))
    return pa.table(
        {
            "iteration": pa.array([r[0] for r in rows], pa.int64()),
            "error": pa.array([r[1] for r in rows], pa.float64()),
            "accuracy": pa.array([r[2] for r in rows], pa.float64()),
            "tp": pa.array([r[3] for r in rows], pa.int64()),
            "fp": pa.array([r[4] for r in rows], pa.int64()),
            "tn": pa.array([r[5] for r in rows], pa.int64()),
            "fn": pa.array([r[6] for r in rows], pa.int64()),
            "weights": pa.array([r[7] for r in rows], pa.string()),
        }
    )
