"""German/French language packs (analysis/lang.py) vs the reference's own
golden vocabularies: the UniNE light stemmers are checked bit-for-bit
against the 35k-entry ``de/delighttestdata.zip`` and 20k-entry
``fr/frlighttestdata.zip`` word→stem tables the reference's
TestGermanLightStemFilter / TestFrenchLightStemFilter assert against."""

import io
import os
import zipfile

import pytest

from lucene_solr_ray.analysis.lang import (
    FRENCH_STOP_WORDS,
    GERMAN_STOP_WORDS,
    SPANISH_STOP_WORDS,
    french_elide,
    french_light_stem,
    german_light_stem,
    german_normalize,
    italian_light_stem,
    portuguese_light_stem,
    spanish_light_stem,
)
from lucene_solr_ray.analysis.tokenizer import (
    FrenchAnalyzer,
    GermanAnalyzer,
    analyze_with_positions,
)

_REF = "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/analysis"


def _vocab(zip_path: str, inner: str):
    with zipfile.ZipFile(zip_path) as z:
        with z.open(inner) as f:
            for line in io.TextIOWrapper(f, encoding="utf-8"):
                line = line.rstrip("\n")
                if line and "\t" in line:
                    yield line.split("\t")


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_german_light_stemmer_full_reference_vocabulary():
    bad = [
        (w, german_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/de/delighttestdata.zip", "delight.txt")
        if german_light_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_french_light_stemmer_full_reference_vocabulary():
    bad = [
        (w, french_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/fr/frlighttestdata.zip", "frlight.txt")
        if french_light_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_spanish_light_stemmer_full_reference_vocabulary():
    bad = [
        (w, spanish_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/es/eslighttestdata.zip", "eslight.txt")
        if spanish_light_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_italian_light_stemmer_full_reference_vocabulary():
    bad = [
        (w, italian_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/it/itlighttestdata.zip", "itlight.txt")
        if italian_light_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_portuguese_light_stemmer_full_reference_vocabulary():
    bad = [
        (w, portuguese_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/pt/ptlighttestdata.zip", "ptlight.txt")
        if portuguese_light_stem(w) != want
    ]
    assert bad == []


def test_german_normalization_reference_cases():
    # TestGermanNormalizationFilter golden cases (lowercased — our chain
    # normalizes after LowerCaseFilter)
    assert german_normalize("schaltflächen") == "schaltflachen"
    assert german_normalize("schaltflaechen") == "schaltflachen"
    assert german_normalize("dauer") == "dauer"  # ue after vowel kept
    assert german_normalize("weißbier") == "weissbier"
    assert german_normalize("quelle") == "quelle"  # ue after q kept


def test_french_elision():
    assert french_elide("l'avion") == "avion"
    assert french_elide("jusqu'ici") == "ici"
    assert french_elide("qu'il") == "il"
    assert french_elide("aujourd'hui") == "aujourd'hui"  # not an article
    assert french_elide("d") == "d"


def test_analyzer_presets_end_to_end():
    de = GermanAnalyzer()
    toks = dict(analyze_with_positions("Die Häuser und die Bücher", de))
    assert "haus" in toks and "buch" in toks
    assert "die" not in toks and "und" not in toks  # German stopwords
    fr = FrenchAnalyzer()
    toks = dict(analyze_with_positions("les chanteuses et le chanteur", fr))
    assert "chant" in toks
    assert "les" not in toks and "et" not in toks
    from lucene_solr_ray.analysis.tokenizer import SpanishAnalyzer

    es = SpanishAnalyzer()
    toks = dict(analyze_with_positions("las mesas y los libros", es))
    assert "mes" in toks and "libr" in toks  # mesas→mes, libros→libr
    assert "las" not in toks and "los" not in toks
    assert GERMAN_STOP_WORDS and FRENCH_STOP_WORDS and SPANISH_STOP_WORDS


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_swedish_light_stemmer_full_reference_vocabulary():
    from lucene_solr_ray.analysis.lang import swedish_light_stem

    bad = [
        (w, swedish_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/sv/svlighttestdata.zip", "svlight.txt")
        if swedish_light_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_hungarian_light_stemmer_full_reference_vocabulary():
    from lucene_solr_ray.analysis.lang import hungarian_light_stem

    bad = [
        (w, hungarian_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/hu/hulighttestdata.zip", "hulight.txt")
        if hungarian_light_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_finnish_light_stemmer_full_reference_vocabulary():
    from lucene_solr_ray.analysis.lang import finnish_light_stem

    bad = [
        (w, finnish_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/fi/filighttestdata.zip", "filight.txt")
        if finnish_light_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_russian_light_stemmer_full_reference_vocabulary():
    from lucene_solr_ray.analysis.lang import russian_light_stem

    bad = [
        (w, russian_light_stem(w), want)
        for w, want in _vocab(f"{_REF}/ru/rulighttestdata.zip", "rulight.txt")
        if russian_light_stem(w) != want
    ]
    assert bad == []


def test_finnish_sql_oracle_assumptions_hold_on_corpus():
    """prelude_finnish unrolls step1 three times and collapses k/p/t runs
    with two replace passes — valid only while the corpus vocabulary has
    no dellinen/dellisuus tokens, no stacked kin/ko chains deeper than 3,
    and no same-letter runs longer than 4. Pin those facts here so a
    corpus change fails loudly instead of silently skewing the oracle."""
    import re

    import pyarrow.parquet as pq

    from lucene_solr_ray.analysis.lang import _fi_step1

    docs = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["text"]
    )
    vocab = set()
    for t in docs["text"].to_pylist():
        vocab.update(re.findall(r"\w+", (t or "").lower()))
    assert not any("dellinen" in w or "dellisuus" in w for w in vocab)
    assert not any(re.search(r"(k{3,}|p{3,}|t{3,})", w) for w in vocab)
    for w in vocab:
        # three single applications must reach the recursion fixpoint
        s = w
        for _ in range(3):
            n = len(s)
            if n > 8 and s.endswith("kin"):
                s = s[:-3]
            elif n > 8 and s.endswith("ko"):
                s = s[:-2]
            elif n > 11 and s.endswith("dellinen"):
                s = s[:-8]
            elif n > 11 and s.endswith("dellisuus"):
                s = s[:-9]
        assert s == _fi_step1(w)


def test_nordic_analyzer_presets_end_to_end():
    from lucene_solr_ray.analysis.tokenizer import (
        FinnishAnalyzer,
        HungarianAnalyzer,
        RussianAnalyzer,
        SwedishAnalyzer,
    )

    sv = SwedishAnalyzer()
    toks = dict(analyze_with_positions("och flickorna jobbar", sv))
    assert "flick" in toks and "och" not in toks
    fi = FinnishAnalyzer()
    toks = dict(analyze_with_positions("ja ongelmana kirjat", fi))
    assert "ongelm" in toks and "ja" not in toks
    hu = HungarianAnalyzer()
    toks = dict(analyze_with_positions("a babakocsit dolgozni", hu))
    assert "babakocs" in toks and "a" not in toks
    ru = RussianAnalyzer()
    toks = dict(analyze_with_positions("и вместе электромагнитной энергии", ru))
    assert "вмест" in toks and "и" not in toks


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_german_minimal_stemmer_full_reference_vocabulary():
    from lucene_solr_ray.analysis.lang import german_minimal_stem

    bad = [
        (w, german_minimal_stem(w), want)
        for w, want in _vocab(f"{_REF}/de/deminimaltestdata.zip",
                              "deminimal.txt")
        if german_minimal_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_french_minimal_stemmer_full_reference_vocabulary():
    from lucene_solr_ray.analysis.lang import french_minimal_stem

    bad = [
        (w, french_minimal_stem(w), want)
        for w, want in _vocab(f"{_REF}/fr/frminimaltestdata.zip",
                              "frminimal.txt")
        if french_minimal_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_REF), reason="reference not present")
def test_sorani_normalize_stem_full_reference_vocabulary():
    """ckbtestdata.txt asserts normalize→stem over the reference's 8k most
    frequent Sorani words (TestSoraniStemFilter.testVocabulary chain)."""
    from lucene_solr_ray.analysis.lang import sorani_normalize, sorani_stem

    fn = lambda w: sorani_stem(sorani_normalize(w))  # noqa: E731
    bad = [
        (w, fn(w), want)
        for w, want in _vocab(f"{_REF}/ckb/ckbtestdata.zip", "testdata.txt")
        if fn(w) != want
    ]
    assert bad == []


def test_sorani_analyzer_preset_end_to_end():
    from lucene_solr_ray.analysis.tokenizer import SoraniAnalyzer

    # TestSoraniStemFilter golden cases: پیاوێک → پیاو (indefinite -ek),
    # دەرگاكە → دەرگا (definite -ka; also exercises kaf normalization)
    toks = dict(analyze_with_positions("پیاوێک دەرگاكە", SoraniAnalyzer()))
    assert "پیاو" in toks and "دەرگا" in toks
    # normalized stopword filtered
    toks = dict(analyze_with_positions("و پیاوێک", SoraniAnalyzer()))
    assert "و" not in toks and "پیاو" in toks


def test_arabic_stemmer_reference_cases():
    """TestArabicStemFilter inline goldens (light10: one prefix strip,
    every matching suffix strip)."""
    from lucene_solr_ray.analysis.lang import arabic_stem

    cases = [
        ("الحسن", "حسن"), ("والحسن", "حسن"), ("بالحسن", "حسن"),
        ("كالحسن", "حسن"), ("فالحسن", "حسن"), ("للاخر", "اخر"),
        ("وحسن", "حسن"), ("زوجها", "زوج"), ("ساهدان", "ساهد"),
        ("ساهدات", "ساهد"), ("ساهدون", "ساهد"), ("ساهدين", "ساهد"),
        ("ساهديه", "ساهد"), ("ساهدية", "ساهد"), ("ساهده", "ساهد"),
        ("ساهدة", "ساهد"), ("ساهدي", "ساهد"), ("وساهدون", "ساهد"),
        ("ساهدهات", "ساهد"), ("الو", "الو"), ("English", "English"),
    ]
    bad = [(w, arabic_stem(w), want) for w, want in cases
           if arabic_stem(w) != want]
    assert bad == []


def test_arabic_normalizer_reference_cases():
    """TestArabicNormalizationFilter inline goldens."""
    from lucene_solr_ray.analysis.lang import arabic_normalize

    cases = [
        ("آجن", "اجن"), ("أحمد", "احمد"), ("إعاذ", "اعاذ"),
        ("بنى", "بني"), ("فاطمة", "فاطمه"), ("روبرـــــت", "روبرت"),
        ("مَبنا", "مبنا"), ("علِي", "علي"), ("بُوات", "بوات"),
        ("ولداً", "ولدا"), ("ولدٍ", "ولد"), ("ولدٌ", "ولد"),
        ("نلْسون", "نلسون"), ("هتميّ", "هتمي"),
    ]
    bad = [(w, arabic_normalize(w), want) for w, want in cases
           if arabic_normalize(w) != want]
    assert bad == []


def test_arabic_analyzer_preset_end_to_end():
    from lucene_solr_ray.analysis.tokenizer import ArabicAnalyzer

    toks = dict(analyze_with_positions("والحسن زوجها", ArabicAnalyzer()))
    assert "حسن" in toks and "زوج" in toks
    # raw (unnormalized) stopword filtered before normalization
    toks = dict(analyze_with_positions("هذه والحسن", ArabicAnalyzer()))
    assert "هذه" not in toks and "حسن" in toks
