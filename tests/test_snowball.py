"""Snowball stemmers (analysis/snowball.py) vs the reference's own
ground-truth vocabularies: Danish / Dutch / Romanian word→stem tables in
``analysis/snowball/TestSnowballVocabData.zip`` (the data the reference's
TestSnowballVocab asserts against), checked exhaustively bit-for-bit
(da 23,829 / nl 45,669 / ro 22,570 / sv 30,623 / no 20,628 / ru 49,673 entries)."""

import io
import os
import zipfile

import pytest

from lucene_solr_ray.analysis.snowball import (
    arabic_snowball_stem,
    DANISH_STOP_WORDS,
    DUTCH_STOP_WORDS,
    ROMANIAN_STOP_WORDS,
    danish_stem,
    dutch_analyzer_stem,
    finnish_snowball_stem,
    french_snowball_stem,
    hungarian_snowball_stem,
    kraaij_pohlmann_stem,
    lovins_stem,
    german_snowball_stem,
    german2_stem,
    spanish_snowball_stem,
    portuguese_snowball_stem,
    italian_snowball_stem,
    dutch_stem,
    norwegian_stem,
    porter2_stem,
    romanian_stem,
    russian_stem,
    snowball_porter_stem,
    swedish_stem,
    turkish_snowball_stem,
)
from lucene_solr_ray.analysis.tokenizer import (
    DanishAnalyzer,
    DutchAnalyzer,
    RomanianAnalyzer,
    analyze_with_positions,
)

_ZIP = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/snowball/TestSnowballVocabData.zip"
)


def _vocab(lang: str, by_lines: bool = False):
    # by_lines: porter/turkish outputs contain EMPTY stems ("s" -> ""),
    # which whitespace-split would drop, shifting alignment.
    with zipfile.ZipFile(_ZIP) as z:
        def words(name):
            with z.open(name) as f:
                text = io.TextIOWrapper(f, encoding="utf-8").read()
                return text.splitlines() if by_lines else text.split()
        return list(zip(words(f"{lang}/voc.txt"), words(f"{lang}/output.txt")))


@pytest.mark.skipif(not os.path.exists(_ZIP), reason="reference not present")
@pytest.mark.parametrize(
    "lang,fn,count",
    [
        ("danish", danish_stem, 23829),
        ("dutch", dutch_stem, 45669),
        ("romanian", romanian_stem, 22570),
        ("swedish", swedish_stem, 30623),
        ("norwegian", norwegian_stem, 20628),
        ("russian", russian_stem, 49673),
        ("english", porter2_stem, 29417),
        ("finnish", finnish_snowball_stem, 50000),
        ("hungarian", hungarian_snowball_stem, 30000),
        ("german", german_snowball_stem, 35033),
        ("german2", german2_stem, 35033),
        ("spanish", spanish_snowball_stem, 28377),
        ("portuguese", portuguese_snowball_stem, 32016),
        ("italian", italian_snowball_stem, 35494),
        ("french", french_snowball_stem, 20403),
        ("arabic", arabic_snowball_stem, 1165),
        ("lovins", lovins_stem, 29417),
        ("kraaij_pohlmann", kraaij_pohlmann_stem, 45669),
    ],
)
def test_snowball_full_reference_vocabulary(lang, fn, count):
    vocab = _vocab(lang)
    assert len(vocab) == count
    bad = [(w, fn(w), want) for w, want in vocab if fn(w) != want]
    assert bad == []


@pytest.mark.skipif(not os.path.exists(_ZIP), reason="reference not present")
@pytest.mark.parametrize(
    "lang,fn,count",
    [
        ("porter", snowball_porter_stem, 30428),
        ("turkish", turkish_snowball_stem, 96325),
    ],
)
def test_snowball_vocabulary_by_lines(lang, fn, count):
    # These vocabularies contain EMPTY output stems -> line-aligned compare.
    vocab = _vocab(lang, by_lines=True)
    assert len(vocab) == count
    bad = [(w, fn(w), want) for w, want in vocab if fn(w) != want]
    assert bad == []


def test_dutch_stem_override_dict():
    # nl/DutchAnalyzer.java:80-84 — StemmerOverrideFilter default table
    assert dutch_analyzer_stem("fiets") == "fiets"  # plain stem: 'fiet'
    assert dutch_analyzer_stem("bromfiets") == "bromfiets"
    assert dutch_analyzer_stem("ei") == "eier"
    assert dutch_analyzer_stem("kind") == "kinder"  # plain stem: 'kind'
    assert dutch_analyzer_stem("lichamelijk") == "licham"


def test_analyzer_chains_stop_and_stem():
    # Danish: stopwords removed, stems applied, posIncr holes preserved
    toks = analyze_with_positions(
        "indtagelse af kalorier", DanishAnalyzer()
    )
    terms = [t[0] for t in toks]
    assert "af" not in terms  # Danish stopword
    assert "indtag" in terms and "kalori" in terms

    toks = analyze_with_positions("het lichamelijke kind", DutchAnalyzer())
    terms = [t[0] for t in toks]
    assert "het" not in terms  # Dutch stopword
    assert terms == ["licham", "kinder"]  # override dict hits 'kind'

    toks = analyze_with_positions(
        "absenţa lucrurilor importante", RomanianAnalyzer()
    )
    terms = [t[0] for t in toks]
    assert terms == ["absenţ", "lucrur", "import"]


def test_snowball_oracle_fixpoint_assumption():
    """The ft_danish/ft_dutch/ft_romanian oracles pass unmapped corpus
    tokens through unchanged — valid only while every corpus word the
    stemmer alters is covered by the corpus map (see SNOWBALL_*_MAP)."""
    from lucene_solr_ray.pipelines.fulltext import (
        SNOWBALL_DA_MAP,
        SNOWBALL_NL_MAP,
        SNOWBALL_RO_MAP,
    )

    corpus_vocab = [
        "a", "agg", "batch", "big", "column", "customer", "data", "dup",
        "fast", "filter", "group", "hash", "join", "key", "line", "merge",
        "order", "part", "query", "row", "scan", "slow", "small", "sort",
        "spark", "stream", "table", "the", "value", "vector", "window",
    ]
    from lucene_solr_ray.analysis.lang import (
        FINNISH_STOP_WORDS,
        FRENCH_STOP_WORDS,
        GERMAN_STOP_WORDS,
        HUNGARIAN_STOP_WORDS,
        ITALIAN_STOP_WORDS,
        NORWEGIAN_STOP_WORDS,
        PORTUGUESE_STOP_WORDS,
        RUSSIAN_STOP_WORDS,
        SPANISH_STOP_WORDS,
        SWEDISH_STOP_WORDS,
    )
    from lucene_solr_ray.analysis.tokenizer import ENGLISH_STOP_WORDS
    from lucene_solr_ray.analysis.lang import ARABIC_STOP_WORDS
    from lucene_solr_ray.analysis.lang2 import TURKISH_STOP_WORDS
    from lucene_solr_ray.pipelines.fulltext import (
        KP_MAP,
        LOVINS_MAP,
        PORTER2_MAP,
        SNOWBALL_AR_MAP,
        SNOWBALL_PORTER_MAP,
        SNOWBALL_TR_MAP,
        SNOWBALL_DE2_MAP,
        SNOWBALL_DE_MAP,
        SNOWBALL_ES_MAP,
        SNOWBALL_FI_MAP,
        SNOWBALL_HU_MAP,
        SNOWBALL_FR_MAP,
        SNOWBALL_IT_MAP,
        SNOWBALL_NO_MAP,
        SNOWBALL_PT_MAP,
        SNOWBALL_RU_MAP,
        SNOWBALL_SV_MAP,
    )

    for fn, word_map, stops in [
        (danish_stem, SNOWBALL_DA_MAP, DANISH_STOP_WORDS),
        (dutch_analyzer_stem, SNOWBALL_NL_MAP, DUTCH_STOP_WORDS),
        (romanian_stem, SNOWBALL_RO_MAP, ROMANIAN_STOP_WORDS),
        (swedish_stem, SNOWBALL_SV_MAP, SWEDISH_STOP_WORDS),
        (norwegian_stem, SNOWBALL_NO_MAP, NORWEGIAN_STOP_WORDS),
        (russian_stem, SNOWBALL_RU_MAP, RUSSIAN_STOP_WORDS),
        (porter2_stem, PORTER2_MAP, ENGLISH_STOP_WORDS),
        (finnish_snowball_stem, SNOWBALL_FI_MAP, FINNISH_STOP_WORDS),
        (hungarian_snowball_stem, SNOWBALL_HU_MAP, HUNGARIAN_STOP_WORDS),
        (german_snowball_stem, SNOWBALL_DE_MAP, GERMAN_STOP_WORDS),
        (german2_stem, SNOWBALL_DE2_MAP, GERMAN_STOP_WORDS),
        (spanish_snowball_stem, SNOWBALL_ES_MAP, SPANISH_STOP_WORDS),
        (portuguese_snowball_stem, SNOWBALL_PT_MAP, PORTUGUESE_STOP_WORDS),
        (italian_snowball_stem, SNOWBALL_IT_MAP, ITALIAN_STOP_WORDS),
        (french_snowball_stem, SNOWBALL_FR_MAP, FRENCH_STOP_WORDS),
        (snowball_porter_stem, SNOWBALL_PORTER_MAP, ENGLISH_STOP_WORDS),
        (turkish_snowball_stem, SNOWBALL_TR_MAP, TURKISH_STOP_WORDS),
        (arabic_snowball_stem, SNOWBALL_AR_MAP, ARABIC_STOP_WORDS),
        (lovins_stem, LOVINS_MAP, ENGLISH_STOP_WORDS),
        (kraaij_pohlmann_stem, KP_MAP, DUTCH_STOP_WORDS),
    ]:
        mapped = {w for w, _d, _s in word_map}
        leaks = [
            w for w in corpus_vocab
            if w not in mapped and w not in stops and fn(w) != w
        ]
        assert leaks == [], f"unmapped corpus words altered: {leaks}"
        # and the mapped language forms are never stopwords
        assert not any(d in stops for _w, d, _s in word_map)


def test_stop_word_lists_sizes():
    assert len(DANISH_STOP_WORDS) == 94
    assert len(DUTCH_STOP_WORDS) == 101
    assert len(ROMANIAN_STOP_WORDS) == 230
    assert "og" in DANISH_STOP_WORDS
    assert "een" in DUTCH_STOP_WORDS
    assert "după" in ROMANIAN_STOP_WORDS
