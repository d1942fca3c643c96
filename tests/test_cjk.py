"""CJK analysis goldens, mirroring the reference's TestCJKAnalyzer /
TestCJKWidthFilter (``lucene/analysis/common/src/test/.../cjk/``).

Offsets are Python codepoint offsets (the engine's convention), so the
surrogate case pins codepoint offsets where the reference asserts UTF-16
unit offsets — the emitted terms are identical.
"""
from lucene_solr_ray.analysis.cjkfilter import CJK_STOP_WORDS, cjk_width_fold
from lucene_solr_ray.analysis.tokenizer import (
    ArrowAnalyzer,
    CJKAnalyzer,
    StandardAnalyzer,
    analyze_with_offsets,
    analyze_with_positions,
)

AN = CJKAnalyzer()


def _terms(s, an=AN):
    return [t for t, _p in analyze_with_positions(s, an)]


def test_han_bigrams():  # TestCJKAnalyzer.testJa1 analog
    assert analyze_with_offsets("一二三四五六七八九十", AN) == [
        ("一二", 0, 0, 2), ("二三", 1, 1, 3), ("三四", 2, 2, 4),
        ("四五", 3, 3, 5), ("五六", 4, 4, 6), ("六七", 5, 5, 7),
        ("七八", 6, 6, 8), ("八九", 7, 7, 9), ("九十", 8, 8, 10),
    ]


def test_lone_unigrams_and_runs():  # testJa2
    assert analyze_with_offsets("一 二三四 五六七八九 十", AN) == [
        ("一", 0, 0, 1), ("二三", 1, 2, 4), ("三四", 2, 3, 5),
        ("五六", 3, 6, 8), ("六七", 4, 7, 9), ("七八", 5, 8, 10),
        ("八九", 6, 9, 11), ("十", 7, 12, 13),
    ]


def test_mixed_scripts_mid_token():  # testFullWidth/testMix2 analog
    assert _terms("あいうえおabんcかきくけ こ") == [
        "あい", "いう", "うえ", "えお", "ab", "ん", "c",
        "かき", "きく", "くけ", "こ",
    ]


def test_cjk_then_ascii_contiguous():
    assert _terms("あいtest") == ["あい", "test"]
    assert _terms("testあい") == ["test", "あい"]


def test_non_cjk_passthrough():  # testNonIdeographic
    assert _terms("一 روبرت موير") == ["一", "روبرت", "موير"]


def test_surrogates():  # testSurrogates — terms identical, offsets codepoint
    assert _terms("𩬅艱鍟䇹愯瀛") == ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]


def test_stop_after_bigram_consumes_position():
    # "the" passes through the bigram filter, then the stop filter drops it
    # leaving a position hole (FilteringTokenFilter semantics)
    assert analyze_with_positions("the 一二 the quick", AN) == [
        ("一二", 1), ("quick", 3)
    ]
    assert "www" in CJK_STOP_WORDS and "s" in CJK_STOP_WORDS


def test_width_fold_fullwidth_ascii():  # TestCJKWidthFilter.testFullWidthASCII
    assert cjk_width_fold("Ｔｅｓｔ １２３４") == "Test 1234"
    assert _terms("Ｔｅｓｔ １２３４") == ["test", "1234"]


def test_width_fold_halfwidth_kana():  # testNonStopKatakana analog
    assert cjk_width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert cjk_width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"   # voiced-mark composition
    assert cjk_width_fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"  # half-voiced composition
    assert _terms("ｶﾀｶﾅ") == ["カタ", "タカ", "カナ"]


def test_hangul_bigrams():
    assert _terms("한국어 텍스트") == ["한국", "국어", "텍스", "스트"]


def test_batch_path_matches_golden():
    import numpy as np
    import pyarrow as pa

    docs = [
        "一二三四五六七八九十", "あいうえおabんcかきくけ こ",
        "the quick 一二 brown", "Ｔｅｓｔ ｳﾞｨｯﾂ", "", "一", "ab一二 ab",
        "한국어 텍스트 and 日本語のテキスト",
    ]
    aa = ArrowAnalyzer(AN)
    res = aa(pa.array(docs, pa.string()), with_positions=True)
    terms = res.terms.to_pylist() if hasattr(res.terms, "to_pylist") else list(res.terms)
    offs = list(res.offsets)
    pcum = np.concatenate([[0], np.cumsum(res.tfs)])
    for d, s in enumerate(docs):
        gold = analyze_with_positions(s, AN)
        g_pos: dict[str, list[int]] = {}
        for t, p in gold:
            g_pos.setdefault(t, []).append(p)
        got: dict[str, list[int]] = {}
        for i in range(offs[d], offs[d + 1]):
            got[terms[i]] = [int(x) for x in res.positions[pcum[i]:pcum[i + 1]]]
        assert {t: sorted(v) for t, v in got.items()} == {
            t: sorted(v) for t, v in g_pos.items()
        }
        assert res.field_lens[d] == len(gold)


def test_cjk_requires_unicode_segmentation():
    import pytest

    with pytest.raises(ValueError):
        analyze_with_positions("一二", StandardAnalyzer(cjk_bigram=True))
    with pytest.raises(ValueError):
        analyze_with_positions(
            "一二",
            StandardAnalyzer(
                cjk_bigram=True, unicode_segmentation=True, shingle=(2, 2)
            ),
        )
