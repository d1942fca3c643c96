"""Learning-to-rank — Solr LTR contrib analog (``solr/contrib/ltr``).

Features (``org/apache/solr/ltr/feature/``):
- ``original_score`` → ``OriginalScoreFeature.java`` (first-pass query score)
- ``field_length``  → ``FieldLengthFeature.java`` — decoded from the
  single-byte norm, deliberately keeping its quantization loss (the class
  javadoc: "relies on norms ... loses precision")
- ``value``         → ``ValueFeature.java`` (request-supplied constant)

Models (``org/apache/solr/ltr/model/``):
- :class:`LinearModel` — ``LinearModel.java:117-123``: score =
  Σ w_i · f_i accumulated in feature order.
- :class:`MultipleAdditiveTreesModel` — ``MultipleAdditiveTreesModel.java``:
  sum of regression trees; node rule "feature ≤ threshold → left".

The reranking flow mirrors ``LTRScoringQuery``: a first-pass top-``rerank_k``
retrieval, feature extraction per candidate, model score, re-sort. Feature
extraction is a batched stored-fields fetch (norm bytes), never per-doc I/O.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..util.smallfloat import LENGTH_TABLE


@dataclass(frozen=True)
class LinearModel:
    weights: tuple[float, ...]

    def score(self, feats: np.ndarray) -> np.ndarray:
        """feats: (n_docs, n_features) float64 → model scores; accumulation
        order = feature order (LinearModel.java:117-123)."""
        out = np.zeros(len(feats), dtype=np.float64)
        for i, w in enumerate(self.weights):
            out = out + w * feats[:, i]
        return out


@dataclass(frozen=True)
class TreeNode:
    """Internal node: feature index + threshold; leaf: value only."""

    value: float | None = None
    feature: int | None = None
    threshold: float | None = None
    left: "TreeNode | None" = None
    right: "TreeNode | None" = None

    def eval(self, feats: np.ndarray) -> np.ndarray:
        if self.value is not None:
            return np.full(len(feats), self.value, dtype=np.float64)
        go_left = feats[:, self.feature] <= self.threshold
        out = np.empty(len(feats), dtype=np.float64)
        out[go_left] = self.left.eval(feats[go_left])
        out[~go_left] = self.right.eval(feats[~go_left])
        return out


@dataclass(frozen=True)
class MultipleAdditiveTreesModel:
    trees: tuple[tuple[float, TreeNode], ...]  # (tree weight, root)

    def score(self, feats: np.ndarray) -> np.ndarray:
        out = np.zeros(len(feats), dtype=np.float64)
        for w, root in self.trees:
            out = out + w * root.eval(feats)
        return out


def extract_features(searcher, first_pass: pa.Table, value_feature: float) -> np.ndarray:
    """(n, 3) float64: [original_score, quantized field length, constant]."""
    ids = first_pass["doc_id"].to_pylist()
    scores = first_pass["score"].to_numpy().astype(np.float64)
    nb = searcher.reader.fetch_docs(ids, columns=["doc_id", "norm_byte"])
    by_id = dict(zip(nb["doc_id"].to_pylist(), nb["norm_byte"].to_pylist()))
    qlen = np.array([float(LENGTH_TABLE[by_id[d]]) for d in ids], dtype=np.float64)
    const = np.full(len(ids), value_feature, dtype=np.float64)
    return np.column_stack([scores, qlen, const])


def rerank(searcher, query, model, k: int = 10, rerank_k: int = 50,
           value_feature: float = 0.5) -> pa.Table:
    """LTRScoringQuery flow → (rank, doc_id, ltr_score)."""
    first = searcher.search({"q": query}, k=rerank_k, use_ray=True)
    if first.num_rows == 0:
        return pa.table({
            "rank": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "ltr_score": pa.array([], pa.float64()),
        })
    feats = extract_features(searcher, first, value_feature)
    ms = model.score(feats)
    ids = first["doc_id"].to_numpy()
    order = np.lexsort((ids, -ms))[:k]
    return pa.table({
        "rank": pa.array(np.arange(len(order)), pa.int64()),
        "doc_id": pa.array(ids[order], pa.int64()),
        "ltr_score": pa.array(ms[order], pa.float64()),
    })
