"""Wave-3 non-Latin language packs (Greek, Hindi, Bulgarian, Persian,
Turkish, Latvian, Bengali) vs the reference's own test pairs:

- Greek: all 343 TestGreekStemmer checkOneTerm pairs (through
  greek_lower first — the test analyzer includes GreekLowerCaseFilter).
- Bulgarian: all TestBulgarianStemmer assertAnalyzesTo pairs.
- Hindi / Bengali / Latvian / Persian: every checkOneTerm pair in the
  corresponding stem/normalizer tests.
- Turkish: the TurkishLowerCaseFilter composed/decomposed cases +
  ApostropheFilter truncation.
"""
import os
import re

import pytest

from lucene_solr_ray.analysis.greek import greek_lower, greek_stem
from lucene_solr_ray.analysis.lang import arabic_normalize
from lucene_solr_ray.analysis.lang2 import (
    bengali_normalize,
    bengali_stem,
    bulgarian_stem,
    decimal_digits,
    hindi_normalize,
    hindi_stem,
    latvian_stem,
    persian_normalize,
    turkish_apostrophe,
    turkish_lower,
)
from lucene_solr_ray.analysis.tokenizer import (
    ArrowAnalyzer,
    BengaliAnalyzer,
    BulgarianAnalyzer,
    GreekAnalyzer,
    HindiAnalyzer,
    LatvianAnalyzer,
    PersianAnalyzer,
    TurkishAnalyzer,
    analyze_with_positions,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"
pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF), reason="reference not present"
)


def _decode(s: str) -> str:
    """Decode Java \\uXXXX escapes that appear literally in test sources."""
    return re.sub(
        r"\\u([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s
    )


def _one_term_pairs(path):
    src = open(path, encoding="utf-8").read()
    return [
        (_decode(w).strip(), _decode(want))
        for w, want in re.findall(
            r'checkOneTerm\(\w+,\s*"([^"]*)",\s*"([^"]*)"\)', src
        )
    ]


def test_greek_stemmer_all_reference_pairs():
    pairs = _one_term_pairs(f"{_REF}/el/TestGreekStemmer.java")
    assert len(pairs) >= 340
    fn = lambda w: greek_stem(greek_lower(w))  # noqa: E731
    bad = [(w, fn(w), want) for w, want in pairs if fn(w) != want]
    assert bad == []


def test_bulgarian_stemmer_all_reference_pairs():
    src = open(f"{_REF}/bg/TestBulgarianStemmer.java", encoding="utf-8").read()
    pairs = re.findall(
        r'assertAnalyzesTo\(\s*\w+,\s*"([^"]*)",\s*new String\[\]\s*\{\s*"([^"]*)"\s*\}\)',
        src,
    )
    assert len(pairs) >= 100
    bad = [
        (w, bulgarian_stem(w), want)
        for w, want in pairs
        if bulgarian_stem(w) != want
    ]
    assert bad == []


def test_hindi_reference_pairs():
    src = open(f"{_REF}/hi/TestHindiStemmer.java", encoding="utf-8").read()
    pairs = re.findall(r'check\("([^"]*)",\s*"([^"]*)"\)', src)
    assert len(pairs) >= 20
    bad = [(w, hindi_stem(w), want) for w, want in pairs if hindi_stem(w) != want]
    assert bad == []
    src = open(f"{_REF}/hi/TestHindiNormalizer.java", encoding="utf-8").read()
    pairs = [
        (_decode(w), _decode(want))
        for w, want in re.findall(r'check\("([^"]*)",\s*"([^"]*)"\)', src)
    ]
    assert len(pairs) >= 6
    bad = [
        (w, hindi_normalize(w), want)
        for w, want in pairs
        if hindi_normalize(w) != want
    ]
    assert bad == []


def test_latvian_stemmer_all_reference_pairs():
    pairs = _one_term_pairs(f"{_REF}/lv/TestLatvianStemmer.java")
    assert len(pairs) >= 170
    bad = [
        (w, latvian_stem(w), want) for w, want in pairs if latvian_stem(w) != want
    ]
    assert bad == []


def test_bengali_reference_pairs():
    src = open(f"{_REF}/bn/TestBengaliStemmer.java", encoding="utf-8").read()
    pairs = re.findall(r'check\("([^"]*)",\s*"([^"]*)"\)', src)
    bad = [
        (w, bengali_stem(w), want) for w, want in pairs if bengali_stem(w) != want
    ]
    assert bad == []
    src = open(f"{_REF}/bn/TestBengaliNormalizer.java", encoding="utf-8").read()
    pairs = re.findall(r'check\("([^"]*)",\s*"([^"]*)"\)', src)
    bad = [
        (w, bengali_normalize(w), want)
        for w, want in pairs
        if bengali_normalize(w) != want
    ]
    assert bad == []


def test_persian_normalizer_reference_pairs():
    src = open(
        f"{_REF}/fa/TestPersianNormalizationFilter.java", encoding="utf-8"
    ).read()
    pairs = re.findall(r'check\("([^"]*)",\s*"([^"]*)"\)', src)
    assert len(pairs) >= 5
    bad = [
        (w, persian_normalize(w), want)
        for w, want in pairs
        if persian_normalize(w) != want
    ]
    assert bad == []
    # PersianAnalyzer runs Arabic normalization first
    assert persian_normalize(arabic_normalize("های")) == "هاي"


def test_turkish_lowercase_reference_cases():
    # TestTurkishLowerCaseFilter composed/decomposed/decomposed2/3
    assert [turkish_lower(t) for t in "İSTANBUL İZMİR ISPARTA".split()] == [
        "istanbul", "izmir", "ısparta"]
    assert [turkish_lower(t) for t in
            "İSTANBUL İZMİR ISPARTA".split()] == [
        "istanbul", "izmir", "ısparta"]
    assert [turkish_lower(t) for t in
            "İ̖STANBUL İZMİR I̖SPARTA".split()] == [
        "i̖stanbul", "izmir", "ı̖sparta"]
    assert turkish_lower("İ") == "i"
    # ApostropheFilter
    assert turkish_apostrophe("türkiye'nin") == "türkiye"
    assert turkish_apostrophe("a’b'c") == "a"
    assert turkish_apostrophe("plain") == "plain"


def test_decimal_digit_filter():
    assert decimal_digits("٣٤٥ १२३ 789") == "345 123 789"


def test_analyzer_presets_end_to_end():
    assert analyze_with_positions("Άνθρωποι και ανθρώπων", GreekAnalyzer()) == [
        ("ανθρωπ", 0), ("ανθρωπ", 2)
    ]
    assert analyze_with_positions("लडके और लडकों", HindiAnalyzer()) == [
        ("लडक", 0), ("लडक", 2)
    ]
    assert analyze_with_positions("градът и градове", BulgarianAnalyzer()) == [
        ("град", 0), ("град", 2)
    ]
    # stems pinned by TestSnowballVocabData turkish/: ısparta→ıspar,
    # türkiye→türki, başkenti→başke (istanbul is its own stem)
    assert analyze_with_positions("İstanbul VE ISPARTA", TurkishAnalyzer()) == [
        ("istanbul", 0), ("ıspar", 2)
    ]
    assert analyze_with_positions("Türkiye'nin başkenti", TurkishAnalyzer()) == [
        ("türki", 0), ("başke", 1)
    ]
    assert analyze_with_positions("cirvis un cirvji", LatvianAnalyzer()) == [
        ("cirv", 0), ("cirv", 2)
    ]
    # Persian: ZWNJ char filter splits the compound, normalization applies
    got = analyze_with_positions("می‌خورد", PersianAnalyzer())
    assert [t for t, _ in got] == ["مي", "خورد"]
    # TestBengaliAnalyzer.testBasics/testDigits (precomposed ড়)
    assert analyze_with_positions("বাড়ী", BengaliAnalyzer()) == [("বার", 0)]
    assert analyze_with_positions("বারী", BengaliAnalyzer()) == [("বার", 0)]
    assert analyze_with_positions("১২৩৪৫৬৭৮৯০", BengaliAnalyzer()) == [
        ("1234567890", 0)
    ]
    # matras/kars are Extend chars: words survive tokenization whole
    assert [t for t, _ in analyze_with_positions("বাংলায় গান", BengaliAnalyzer())] == [
        "বাংলায়", "গান"
    ]


def test_batch_path_matches_golden_for_lowercase_modes():
    import numpy as np
    import pyarrow as pa

    docs = [
        "Άνθρωποι και ανθρώπων ΟΣΑ",
        "İstanbul VE ISPARTA Türkiye'nin",
        "plain english text",
        "",
    ]
    for an in (GreekAnalyzer(), TurkishAnalyzer()):
        aa = ArrowAnalyzer(an)
        res = aa(pa.array(docs, pa.string()), with_positions=True)
        terms = res.terms.to_pylist() if hasattr(res.terms, "to_pylist") else list(res.terms)
        offs = list(res.offsets)
        for d, s in enumerate(docs):
            gold = analyze_with_positions(s, an)
            g: dict[str, int] = {}
            for t, _p in gold:
                g[t] = g.get(t, 0) + 1
            got = {
                terms[i]: int(res.tfs[i]) for i in range(offs[d], offs[d + 1])
            }
            assert got == g, (an, d, got, g)
            assert res.field_lens[d] == len(gold)


def test_serbian_normalization_reference_cases():
    from lucene_solr_ray.analysis.lang2 import (
        serbian_normalize,
        serbian_normalize_regular,
    )
    from lucene_solr_ray.analysis.tokenizer import (
        StandardAnalyzer,
        analyze_with_positions,
    )

    # TestSerbianNormalizationFilter cases
    assert serbian_normalize(
        "абвгдђежзијклљмнњопрстћуфхцчџш"
    ) == "abvgddjezzijklljmnnjoprstcufhccdzs"
    assert serbian_normalize(
        "abcčćddžđefghijklljmnnjoprsštuvzž"
    ) == "abcccddzdjefghijklljmnnjoprsstuvzz"
    # TestSerbianNormalizationRegularFilter cases
    assert serbian_normalize_regular(
        "абвгдђежзијклљмнњопрстћуфхцчџш"
    ) == "abvgdđežzijklljmnnjoprstćufhcčdžš"
    assert serbian_normalize_regular(
        "abcčćddžđefghijklljmnnjoprsštuvzž"
    ) == "abcčćddžđefghijklljmnnjoprsštuvzž"
    # as an analyzer normalization slot (expects lowercased input)
    an = StandardAnalyzer(normalization="serbian")
    assert analyze_with_positions("Ђорђе Džak", an) == [
        ("djordje", 0), ("dzak", 1)
    ]
