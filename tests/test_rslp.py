"""RSLP engine (analysis/rslp.py) vs the reference's golden vocabularies:
the full Galician RSLG (9,416 entries, ``gl/gltestdata.zip``), the full
Portuguese RSLP (32,016 entries, ``pt/ptrslptestdata.zip``) and the
Portuguese minimal / plural-only step (``pt/ptminimaltestdata.zip``) —
every entry bit-exact."""
import io
import os
import zipfile

import pytest

from lucene_solr_ray.analysis.rslp import (
    galician_minimal_stem,
    galician_stem,
    portuguese_minimal_stem,
    portuguese_rslp_stem,
)
from lucene_solr_ray.analysis.tokenizer import (
    GalicianAnalyzer,
    analyze_with_positions,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"
pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference not present"
)


def _vocab(zip_path, inner):
    with zipfile.ZipFile(zip_path) as z, z.open(inner) as f:
        for line in io.TextIOWrapper(f, encoding="utf-8"):
            line = line.rstrip("\n")
            if line and "\t" in line:
                yield line.split("\t")


@pytest.mark.parametrize(
    "zp,inner,fn",
    [
        ("gl/gltestdata.zip", "gl.txt", galician_stem),
        ("pt/ptrslptestdata.zip", "ptrslp.txt", portuguese_rslp_stem),
        ("pt/ptminimaltestdata.zip", "ptminimal.txt", portuguese_minimal_stem),
    ],
)
def test_rslp_full_reference_vocabulary(zp, inner, fn):
    bad = [
        (w, fn(w), want)
        for w, want in _vocab(f"{_REF}/{zp}", inner)
        if fn(w) != want
    ]
    assert bad == []


def test_galician_minimal_is_plural_step():
    # TestGalicianMinimalStemFilter cases
    assert galician_minimal_stem("elefantes") == "elefante"
    assert galician_minimal_stem("elefante") == "elefante"
    assert galician_minimal_stem("kalóres") == "kalór"
    assert galician_minimal_stem("kalór") == "kalór"
    # testExceptions: whole-word exceptions on the plural rules
    assert galician_minimal_stem("mas") == "mas"
    assert galician_minimal_stem("barcelonês") == "barcelonês"


def test_galician_analyzer_preset():
    assert analyze_with_positions("as balões non cantan", GalicianAnalyzer()) == [
        ("bal", 1), ("cant", 3)
    ]


def test_galician_oracle_fixpoint_assumption():
    """ft_galician's oracle passes unmapped corpus tokens through
    unchanged — valid only while every unmapped vocab word is an RSLG
    fixpoint. The mapped words are excluded (they are replaced by the
    char filter before analysis)."""
    from lucene_solr_ray.pipelines.fulltext import GALICIAN_MAP

    vocab = [
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
    ]
    mapped = {w for w, _d, _s in GALICIAN_MAP}
    movers = [w for w in vocab if w not in mapped and galician_stem(w) != w]
    assert movers == []
    # and the map's stems are the published ground truth
    for _w, d, s in GALICIAN_MAP:
        assert galician_stem(d) == s
