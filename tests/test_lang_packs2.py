"""Round-3 wave-3 language packs (Norwegian, Czech, Indonesian, English
minimal) vs the reference's own golden vocabularies and test pairs:

- Norwegian light/minimal: all four vocab files
  (``no/nb_light.txt``, ``no/nn_light.txt``, ``no/nb_minimal.txt``,
  ``no/nn_minimal.txt``) the reference's TestNorwegian*StemFilter
  assertVocabulary against.
- Czech: all 143 TestCzechStemmer assertAnalyzesTo pairs (lowercased —
  the test runs them through the analyzer's LowerCaseFilter first).
- Indonesian: every TestIndonesianStemmer checkOneTerm pair, both the
  full-derivational analyzer (a) and the inflectional-only one (b).
- English minimal: TestEnglishMinimalStemFilter pairs.
"""
import os
import re

import pytest

from lucene_solr_ray.analysis.lang import (
    CZECH_STOP_WORDS,
    INDONESIAN_STOP_WORDS,
    NORWEGIAN_STOP_WORDS,
    czech_stem,
    english_minimal_stem,
    indonesian_stem,
    norwegian_light_stem,
    norwegian_minimal_stem,
)
from lucene_solr_ray.analysis.tokenizer import (
    CzechAnalyzer,
    IndonesianAnalyzer,
    NorwegianAnalyzer,
    analyze_with_positions,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"
pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference not present"
)


def _no_vocab(fname):
    for line in open(f"{_REF}/no/{fname}", encoding="utf-8"):
        line = line.strip()
        if line and not line.startswith("#"):
            yield line.split("\t")


@pytest.mark.parametrize(
    "fname,kw",
    [
        ("nb_light.txt", {}),
        ("nn_light.txt", {"bokmaal": False, "nynorsk": True}),
    ],
)
def test_norwegian_light_reference_vocabulary(fname, kw):
    bad = [
        (w, norwegian_light_stem(w, **kw), want)
        for w, want in _no_vocab(fname)
        if norwegian_light_stem(w, **kw) != want
    ]
    assert bad == []


@pytest.mark.parametrize(
    "fname,kw",
    [
        ("nb_minimal.txt", {}),
        ("nn_minimal.txt", {"bokmaal": False, "nynorsk": True}),
    ],
)
def test_norwegian_minimal_reference_vocabulary(fname, kw):
    bad = [
        (w, norwegian_minimal_stem(w, **kw), want)
        for w, want in _no_vocab(fname)
        if norwegian_minimal_stem(w, **kw) != want
    ]
    assert bad == []


def test_czech_stemmer_all_reference_pairs():
    src = open(f"{_REF}/cz/TestCzechStemmer.java", encoding="utf-8").read()
    pairs = re.findall(
        r'assertAnalyzesTo\(\s*\w+,\s*"([^"]*)",\s*new String\[\]\s*\{\s*"([^"]*)"\s*\}\)',
        src,
    )
    assert len(pairs) >= 140
    bad = [
        (w, czech_stem(w.lower()), want)
        for w, want in pairs
        if czech_stem(w.lower()) != want
    ]
    assert bad == []


def test_indonesian_stemmer_all_reference_pairs():
    src = open(f"{_REF}/id/TestIndonesianStemmer.java", encoding="utf-8").read()
    full = re.findall(r'checkOneTerm\(a,\s*"([^"]*)",\s*"([^"]*)"\)', src)
    infl = re.findall(r'checkOneTerm\(b,\s*"([^"]*)",\s*"([^"]*)"\)', src)
    assert len(full) >= 60 and len(infl) >= 3
    bad = [
        (w, indonesian_stem(w), want)
        for w, want in full
        if indonesian_stem(w) != want
    ]
    bad += [
        (w, indonesian_stem(w, False), want)
        for w, want in infl
        if indonesian_stem(w, False) != want
    ]
    assert bad == []


def test_english_minimal_reference_pairs():
    src = open(
        f"{_REF}/en/TestEnglishMinimalStemFilter.java", encoding="utf-8"
    ).read()
    pairs = re.findall(r'checkOneTerm\(\w+,\s*"([^"]*)",\s*"([^"]*)"\)', src)
    assert len(pairs) >= 8
    bad = [
        (w, english_minimal_stem(w), want)
        for w, want in pairs
        if english_minimal_stem(w) != want
    ]
    assert bad == []


def test_analyzer_presets_end_to_end():
    assert analyze_with_positions("bilens dørene", NorwegianAnalyzer()) == [
        ("bil", 0), ("dør", 1)
    ]
    # Czech: stopword (diacritic) removed, case ending stripped + normalize
    assert analyze_with_positions("muži dnes", CzechAnalyzer()) == [("muh", 0)]
    assert analyze_with_positions(
        "mengukur adalah bukunya", IndonesianAnalyzer()
    ) == [("ukur", 0), ("buku", 2)]
    assert "og" in NORWEGIAN_STOP_WORDS
    assert "dnes" in CZECH_STOP_WORDS
    assert "adalah" in INDONESIAN_STOP_WORDS
