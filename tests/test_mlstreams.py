"""Streaming ML — features()/train() (FeaturesSelectionStream /
TextLogitStream + IGainTermsQParserPlugin /
TextLogisticRegressionQParserPlugin): IGain math pinned against a
hand-computed small corpus; training pinned on convergence, the federated
shard protocol, and the reference's doc-vector formula."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.streaming.mlstreams import (
    _binary_entropy,
    _ShardSGD,
    features_select,
    train_logreg,
)

SF = "/root/testdata/sf0.001"


def test_binary_entropy_guards():
    assert _binary_entropy(0.0) == 0.0 and _binary_entropy(1.0) == 0.0
    assert abs(_binary_entropy(0.5) - math.log(2)) < 1e-15


def test_igain_hand_computed(ray_session, tmp_path):
    # 4 docs, outcome = lang; term "x" in both positives and one negative
    tbl = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["x a", "x b", "x c", "d e"],
        "lang": ["en", "en", "de", "de"],
    })
    d = tmp_path / "documents.parquet"
    pq.write_table(tbl, str(d))
    f = features_select(str(tmp_path), "documents", "text", "lang", "en", 10)
    got = {t: s for t, s in zip(f["term"].to_pylist(), f["score"].to_pylist())}
    nd, np_, df, xc = 4, 2, 3, 2
    ec = _binary_entropy(np_ / nd)
    expect_x = ec - ((df / nd) * _binary_entropy(xc / df)
                     + (1 - df / nd) * _binary_entropy((np_ - xc) / (nd - df + 1)))
    assert got["x"] == pytest.approx(expect_x, abs=1e-15)
    # idf_d = ln(numDocs / (docFreq + 1))
    idf = dict(zip(f["term"].to_pylist(), f["idf_d"].to_pylist()))
    assert idf["x"] == pytest.approx(math.log(4 / 4), abs=1e-15)


def test_doc_vector_formula(ray_session):
    # vector[i+1] = idf_i * (1 + ln tf_i); bias = 1
    sgd = _ShardSGD(["spark"], np.array([2.0]), "text", "lang", "en", 0.01, 0.5)
    batch = pa.table({"text": ["spark spark spark other"], "lang": ["en"]})
    V, y = sgd.vectors(batch)
    assert V[0, 0] == 1.0
    assert V[0, 1] == pytest.approx(2.0 * (1 + math.log(3)))
    assert y[0] == 1.0


def test_train_error_decreases_and_weights_shape(ray_session):
    t = train_logreg(SF, "documents", "text", "lang", "en",
                     num_terms=10, iterations=6, alpha=0.05).to_pandas()
    assert list(t.iteration) == [1, 2, 3, 4, 5, 6]
    assert t.error.iloc[-1] < t.error.iloc[0]
    w = t.weights.iloc[-1].split(",")
    assert len(w) == 11  # bias + numTerms
    # confusion counts cover every matched doc each iteration
    total = t.tp + t.fp + t.tn + t.fn
    assert total.nunique() == 1


def test_train_separable_labels_reach_high_accuracy(ray_session, tmp_path):
    # synthetic separable corpus: positives contain "posword"
    texts, langs = [], []
    for i in range(200):
        pos = i % 2 == 0
        texts.append(("posword alpha beta" if pos else "negword alpha beta")
                     + f" filler{i % 7}")
        langs.append("en" if pos else "de")
    pq.write_table(
        pa.table({"doc_id": list(range(200)), "text": texts, "lang": langs}),
        str(tmp_path / "documents.parquet"),
    )
    t = train_logreg(str(tmp_path), "documents", "text", "lang", "en",
                     num_terms=5, iterations=15, alpha=0.3).to_pandas()
    assert t.accuracy.iloc[-1] >= 0.95
