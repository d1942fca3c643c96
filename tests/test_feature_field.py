"""FeatureField (document/FeatureField.java): static per-doc ranking
features stored in the term frequency of a pseudo-postings field.

Pins the reference quirks: the ``floatToIntBits >>> 15`` freq quantization
(8 mantissa bits, floor; MAX_FREQ clamp on decode), the log / saturation /
sigmoid score formulas, auto-pivot = decode(avg freq) (FeatureField.java:
539-551), and the engine-side invariants: features are position-less even in
a positions index (DOCS_AND_FREQS), sparse features answer field-existence
queries, and feature postings survive merges on the position-less track."""

import numpy as np
import pyarrow.dataset as pads
import pytest
import ray.data

from lucene_solr_ray.corpus import generate_corpus
from lucene_solr_ray.index.build import build_index
from lucene_solr_ray.index.checkindex import check_index
from lucene_solr_ray.index.merge import merge_index
from lucene_solr_ray.search import Searcher
from lucene_solr_ray.search.query import BooleanQuery, FeatureQuery, TermQuery
from lucene_solr_ray.util.feature import (
    MAX_FREQ,
    decode_feature_values,
    encode_feature_values,
)


# ---------------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------------


def test_max_freq_matches_reference_constant():
    # Float.floatToIntBits(Float.MAX_VALUE) >>> 15 (FeatureField.java:198)
    assert MAX_FREQ == 0x7F7FFFFF >> 15


def test_lossless_roundtrip_small_ints():
    v = np.arange(1, 512, dtype=np.float64)
    assert np.array_equal(decode_feature_values(encode_feature_values(v)),
                          v.astype(np.float32))


def test_lossy_floor_quantization():
    # values needing > 8 mantissa bits floor to the nearest smaller
    # 9-significant-bit float (never round up)
    v = np.array([1000.7, 513.0, 12345.0], dtype=np.float64)
    dec = decode_feature_values(encode_feature_values(v))
    assert np.all(dec <= v.astype(np.float32))
    assert dec[0] == np.float32(1000.0)


def test_decode_clamps_above_max_freq():
    out = decode_feature_values(np.array([MAX_FREQ + 1, MAX_FREQ + 1000]))
    assert np.all(out == np.float32(np.finfo(np.float32).max))


def test_encode_rejects_non_positive():
    with pytest.raises(ValueError):
        encode_feature_values([1.0, 0.0])
    with pytest.raises(ValueError):
        encode_feature_values([-3.0])
    with pytest.raises(ValueError):
        encode_feature_values([np.inf])


# ---------------------------------------------------------------------------
# index + query
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def feat_idx(ray_session, tmp_path_factory):
    tbl = generate_corpus(1200)
    d = str(tmp_path_factory.mktemp("featidx"))
    build_index(
        ray.data.from_arrow(tbl), d, docs_per_segment=200,
        feature_fields={
            "doclen": "field_len",
            "pylen": ("field_len", ("lang", "==", "python")),
        },
    )
    s = Searcher(d, dtype=np.float64)
    docs = pads.dataset(s.reader.docs_files()).to_table(
        columns=["doc_id", "field_len", "lang"]
    ).to_pandas().set_index("doc_id")
    return d, s, docs


def test_feature_rows_have_no_positions(feat_idx):
    d, s, _ = feat_idx
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(s.reader.postings_files()[0])
    feat = t.filter(pc.equal(t["field"], "features"))
    assert len(feat) == 2  # doclen + pylen
    assert all(len(b) == 0 for b in feat["pos_blob"].to_pylist())
    # tf really is the quantized freq: ttf == sum of encoded values
    content = t.filter(pc.equal(t["field"], "content"))
    assert all(len(b) > 0 for b in content["pos_blob"].to_pylist()[:5])


def test_saturation_scores_exact(feat_idx):
    _, s, docs = feat_idx
    res = s.search(
        {"q": FeatureQuery("doclen", "saturation", pivot=32.0, boost=2.0)},
        k=20, use_ray=False,
    ).to_pandas()
    for _, r in res.iterrows():
        f = float(
            decode_feature_values(
                encode_feature_values([float(docs.loc[r.doc_id, "field_len"])])
            )[0]
        )
        assert r.score == 2.0 * (1.0 - 32.0 / (f + 32.0))


def test_auto_pivot_equals_decoded_avg_freq(feat_idx):
    _, s, _ = feat_idx
    from lucene_solr_ray.search.query import rewrite

    q = rewrite(FeatureQuery("doclen", "saturation"), s.reader)
    df, ttf = s.reader.term_stats([("features", "doclen")])[("features", "doclen")]
    expected = float(decode_feature_values(np.float32(ttf / df))[()])
    assert q.pivot == expected and q.pivot > 0


def test_sigmoid_and_log(feat_idx):
    _, s, docs = feat_idx
    import math

    res = s.search(
        {
            "sig": FeatureQuery("doclen", "sigmoid", pivot=64.0, exp=2.0),
            "log": FeatureQuery("doclen", "log", scaling_a=0.5, boost=3.0),
        },
        k=10, use_ray=False,
    ).to_pandas()
    for _, r in res.iterrows():
        f = float(
            decode_feature_values(
                encode_feature_values([float(docs.loc[r.doc_id, "field_len"])])
            )[0]
        )
        if r.query_id == "sig":
            assert r.score == 1.0 - 64.0**2.0 / (f**2.0 + 64.0**2.0)
        else:
            assert r.score == 3.0 * math.log(0.5 + f)


def test_sparse_feature_is_field_existence(feat_idx):
    _, s, docs = feat_idx
    ids = s.match_ids(TermQuery("pylen", field="features"))
    expected = set(docs.index[(docs.lang == "python") & (docs.field_len > 0)])
    assert set(int(i) for i in ids) == expected


def test_bm25_plus_feature_should_sum(feat_idx):
    _, s, _ = feat_idx
    bq = BooleanQuery(
        must=[TermQuery("license")],
        should=[FeatureQuery("doclen", "saturation", pivot=32.0, boost=5.0)],
    )
    both = s.search({"q": bq}, k=10, use_ray=False).to_pandas()
    bm25 = s.search({"q": TermQuery("license")}, k=2000, use_ray=False).to_pandas()
    feat = s.search(
        {"q": FeatureQuery("doclen", "saturation", pivot=32.0, boost=5.0)},
        k=10_000, use_ray=False,
    ).to_pandas()
    b = bm25.set_index("doc_id").score
    f = feat.set_index("doc_id").score
    for _, r in both.iterrows():
        assert r.score == b.loc[r.doc_id] + f.loc[r.doc_id]


def test_features_survive_merge_identically(feat_idx):
    d, s, _ = feat_idx
    qs = {
        "sat": FeatureQuery("doclen", "saturation", pivot=32.0),
        "mix": BooleanQuery(
            must=[TermQuery("license")],
            should=[FeatureQuery("pylen", "log", boost=0.5)],
        ),
    }
    pre = s.search(qs, k=10, use_ray=False).to_pandas().to_string()
    info = merge_index(d, segs_per_tier=6)
    assert info["merges"] >= 1
    s2 = Searcher(d, dtype=np.float64)
    post = s2.search(qs, k=10, use_ray=False).to_pandas().to_string()
    assert pre == post
    m = check_index(d)
    assert m["docs"] == 1200


def test_merge_rejects_per_field_mixed_positions(ray_session, tmp_path_factory):
    # same FIELD positioned in one member, position-less in another → raise
    # (per-field all-or-none; ADVICE r1 hazard, now enforced per field)
    import json
    import os

    tbl = generate_corpus(300)
    d = str(tmp_path_factory.mktemp("mixidx"))
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=150)
    # doctor one segment: strip content positions to simulate a
    # positions=False delta appended onto a positions=True index
    import pyarrow as pa
    import pyarrow.parquet as pq

    r = Searcher(d).reader
    sd = r.seg_dir(r.segments[0]["seg"])
    t = pq.read_table(os.path.join(sd, "postings.parquet"))
    empty = pa.array([b""] * len(t), pa.large_binary())
    t = t.set_column(t.schema.get_field_index("pos_blob"), "pos_blob", empty)
    pq.write_table(t, os.path.join(sd, "postings.parquet"), row_group_size=8192)
    with pytest.raises(ValueError, match="positions"):
        merge_index(d, segs_per_tier=10, use_ray=False)
