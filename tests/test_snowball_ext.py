"""Snowball ext stemmers WITHOUT TestSnowballVocabData ground truth
(Armenian / Basque / Catalan / Irish / Lithuanian): validated against the
reference's own analyzer tests — TestLithuanianStemming's full 372-pair
corpus plus the Test*Analyzer testBasics goldens (reference paths under
``lucene/analysis/common/src/test/org/apache/lucene/analysis/``)."""

import os
import re

import pytest

from lucene_solr_ray.analysis.snowball import (
    armenian_stem,
    basque_stem,
    catalan_stem,
    irish_stem,
    lithuanian_stem,
)

_REF_TEST = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis"
)


def _goldens(path):
    def jstr(s):
        return re.sub(
            r"\\u([0-9a-fA-F]{4})",
            lambda m: chr(int(m.group(1), 16)), s,
        )
    src = open(path, encoding="utf-8").read()
    return [
        (jstr(a), jstr(b))
        for a, b in re.findall(
            r'checkOneTerm\(a,\s*"((?:[^"\\]|\\.)*)",\s*"((?:[^"\\]|\\.)*)"\)',
            src,
        )
    ]


@pytest.mark.skipif(not os.path.isdir(_REF_TEST), reason="reference absent")
def test_lithuanian_full_reference_corpus():
    # lt/TestLithuanianStemming.java: 372 word→stem pairs (nouns ×3
    # declensions, adjectives, verbs)
    pairs = _goldens(f"{_REF_TEST}/lt/TestLithuanianStemming.java")
    assert len(pairs) == 372
    bad = [
        (w, lithuanian_stem(w), want)
        for w, want in pairs
        if lithuanian_stem(w) != want
    ]
    assert bad == []


@pytest.mark.skipif(not os.path.isdir(_REF_TEST), reason="reference absent")
@pytest.mark.parametrize(
    "rel,fn,exclusions",
    [
        ("hy/TestArmenianAnalyzer.java", armenian_stem, {"արծիվներ"}),
        ("eu/TestBasqueAnalyzer.java", basque_stem, {"zaldiak"}),
        ("ca/TestCatalanAnalyzer.java", catalan_stem, {"llengües"}),
        ("ga/TestIrishAnalyzer.java", irish_stem, {"feirmeoireacht"}),
    ],
)
def test_analyzer_goldens(rel, fn, exclusions):
    # testExclude pairs assert the UNstemmed form for words in the
    # exclusion set — those are keyword-marker assertions, not stemmer
    # goldens, so drop them
    pairs = _goldens(f"{_REF_TEST}/{rel}")
    assert pairs, rel
    seen = {}
    for w, want in pairs:
        if w in exclusions and w == want:
            continue  # exclusion-set assertion, not a stemmer golden
        if w in seen and seen[w] != want:
            continue
        seen[w] = want
    bad = [(w, fn(w), want) for w, want in seen.items() if fn(w) != want]
    assert bad == []


def test_basque_golden_sample():
    assert basque_stem("zaldiak") == "zaldi"
    assert basque_stem("mendiari") == "mendi"


def test_catalan_golden_sample():
    assert catalan_stem("llengües") == "llengu"
    assert catalan_stem("diccionari") == "diccion"
    assert catalan_stem("institut") == "inst"
    assert catalan_stem("estudis") == "estud"
    assert catalan_stem("catalans") == "catalan"


def test_irish_golden_sample():
    assert irish_stem("siopadóireacht") == "siopadóir"
    assert irish_stem("síceapatacha") == "síceapaite"
    # initial mutation stripping (irish.sbl initial_morph)
    assert irish_stem("bhfear") == "bear"
    assert irish_stem("gcat") == "cat"


def test_armenian_golden_sample():
    assert armenian_stem("արծիվ") == "արծ"
    assert armenian_stem("արծիվներ") == "արծ"


def test_lithuanian_golden_sample():
    assert lithuanian_stem("vaikas") == "vaik"
    assert lithuanian_stem("vaikų") == "vaik"
    assert lithuanian_stem("gražiausias") == "graž"


def test_analyzer_presets():
    from lucene_solr_ray.analysis.tokenizer import (
        ArmenianAnalyzer,
        BasqueAnalyzer,
        CatalanAnalyzer,
        IrishAnalyzer,
        LithuanianAnalyzer,
        analyze_with_positions,
    )

    def terms(text, an):
        return [t for t, _ in analyze_with_positions(text, an)]

    # ca/TestCatalanAnalyzer.testContractions
    assert terms(
        "Diccionari de l'Institut d'Estudis Catalans", CatalanAnalyzer()
    ) == ["diccion", "inst", "estud", "catalan"]
    # eu/TestBasqueAnalyzer.testBasics (eta = stopword)
    assert terms("zaldiak eta mendiari", BasqueAnalyzer()) == [
        "zaldi", "mendi"
    ]
    # ga/TestIrishAnalyzer.testBasics (na = stopword)
    assert terms(
        "siopadóireacht na síceapatacha", IrishAnalyzer()
    ) == ["siopadóir", "síceapaite"]
    # ga/TestIrishLowerCaseFilter mutation handling
    from lucene_solr_ray.analysis.lang3 import irish_lower

    assert irish_lower("nAthair") == "n-athair"
    assert irish_lower("tUISCE") == "t-uisce"
    assert irish_lower("hARD") == "hard"
    # hy/TestArmenianAnalyzer.testBasics (եմ = stopword)
    assert terms("արծիվներ եմ", ArmenianAnalyzer()) == ["արծ"]
    # lt/TestLithuanianAnalyzer (ir = stopword)
    assert terms("vaikas ir vaikų", LithuanianAnalyzer()) == [
        "vaik", "vaik"
    ]


def test_stop_word_list_sizes():
    from lucene_solr_ray.analysis.lang3 import (
        ARMENIAN_STOP_WORDS,
        BASQUE_STOP_WORDS,
        CATALAN_STOP_WORDS,
        IRISH_STOP_WORDS,
        LITHUANIAN_STOP_WORDS,
    )

    assert len(ARMENIAN_STOP_WORDS) == 45
    assert len(BASQUE_STOP_WORDS) == 98
    assert len(CATALAN_STOP_WORDS) == 218  # source file has one dup
    assert len(IRISH_STOP_WORDS) == 109
    assert len(LITHUANIAN_STOP_WORDS) == 125


def test_new_stemmers_never_crash():
    # deterministic fuzz over adversarial shapes: empty, single chars,
    # repeated vowels/consonants, mixed scripts, long words, apostrophes
    import itertools

    from lucene_solr_ray.analysis.hunspell import (
        HunspellDictionary,
        HunspellStemmer,
    )
    from lucene_solr_ray.analysis.snowball import (
        arabic_snowball_stem,
        kraaij_pohlmann_stem,
        lovins_stem,
        snowball_porter_stem,
        turkish_snowball_stem,
    )
    from lucene_solr_ray.analysis.stempel import polish_stem
    from lucene_solr_ray.analysis.tokenizer import _fold_icu

    alphabet = ["", "a", "e", "ı", "İ", "y", "s", "'", "ß", "آ", "ำ",
                "ij", "ge", "en", "ss", "紫", "𐐖", "x" * 40]
    words = ["".join(p) for p in itertools.product(alphabet, repeat=3)]
    words += ["", "a", "aa" * 200, "'" * 5, "e" * 300]
    aff = "SET UTF-8\nFULLSTRIP\nSFX A Y 1\nSFX A a b a\n"
    dic = "1\nb/A\n"
    hst = HunspellStemmer(HunspellDictionary(aff, dic))
    for w in words:
        for fn in (snowball_porter_stem, turkish_snowball_stem,
                   arabic_snowball_stem, lovins_stem,
                   kraaij_pohlmann_stem, polish_stem, _fold_icu):
            out = fn(w)
            assert isinstance(out, str)
        assert isinstance(hst.stem(w), list)


def test_icu_fold_ascii_fixpoints():
    from lucene_solr_ray.analysis.tokenizer import _fold_icu

    for w in ("hello", "a1b2c3", "snake_case", "x" * 100):
        assert _fold_icu(w) == w
