"""DictionaryCompoundWordTokenFilter goldens, mirroring the reference's
TestCompoundWordTokenFilter testDumbCompoundWordsSE / SELongestMatch
(``analysis/compound/``; this engine lowercases before decompounding, so
expectations are the reference's terms lowercased)."""
import numpy as np
import pyarrow as pa

from lucene_solr_ray.analysis.tokenizer import (
    ArrowAnalyzer,
    StandardAnalyzer,
    analyze_with_offsets,
    analyze_with_positions,
)

_SE_DICT = tuple(
    w.lower() for w in (
        "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
        "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll", "Sko",
        "Vind", "Rute", "Torkare", "Blad",
    )
)


def _an(dict_words, only_longest=False):
    return StandardAnalyzer(
        stopwords=frozenset(),
        dictionary_compound=(dict_words, 5, 2, 15, only_longest),
    )


def test_dumb_compound_words_se():  # testDumbCompoundWordsSE (lowercased)
    an = _an(_SE_DICT)
    text = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba")
    want = [
        "bildörr", "bil", "dörr", "bilmotor", "bil", "motor", "biltak",
        "bil", "tak", "slagborr", "slag", "borr", "hammarborr", "hammar",
        "borr", "pelarborr", "pelar", "borr", "glasögonfodral", "glas",
        "ögon", "fodral", "basfiolsfodral", "bas", "fiol", "fodral",
        "basfiolsfodralmakaregesäll", "bas", "fiol", "fodral", "makare",
        "gesäll", "skomakare", "sko", "makare", "vindrutetorkare", "vind",
        "rute", "torkare", "vindrutetorkarblad", "vind", "rute", "blad",
        "abba",
    ]
    got = analyze_with_positions(text, an)
    assert [t for t, _p in got] == want
    # posIncr semantics: subwords overlay the original's position
    pos = {}
    for t, p in got:
        pos.setdefault(p, []).append(t)
    assert pos[0] == ["bildörr", "bil", "dörr"]
    assert pos[12] == ["abba"]


def test_dumb_compound_longest_match():  # testDumbCompoundWordsSELongestMatch
    d = tuple(w.lower() for w in (
        "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
        "Glas", "Ögon", "Fodral", "Bas", "Fiols", "Makare", "Gesäll",
    ))
    got = analyze_with_positions("Basfiolsfodralmakaregesäll", _an(d, True))
    assert [t for t, _p in got] == [
        "basfiolsfodralmakaregesäll", "bas", "fiols", "fodral", "makare",
        "gesäll",
    ]


def test_subwords_carry_original_offsets():
    an = _an(("fuss", "ball", "pumpe"))
    assert analyze_with_offsets("xy fussballpumpe", an) == [
        ("xy", 0, 0, 2),
        ("fussballpumpe", 1, 3, 16),
        ("fuss", 1, 3, 16),
        ("ball", 1, 3, 16),
        ("pumpe", 1, 3, 16),
    ]


def test_min_word_size_gate():
    an = _an(("ball",))
    # "ball" itself is only 4 chars < min_word 5: no decomposition pass
    assert [t for t, _ in analyze_with_positions("ball", an)] == ["ball"]


def test_batch_path_matches_golden():
    docs = [
        "Bildörr Bilmotor abba", "Basfiolsfodralmakaregesäll", "", "plain",
    ]
    an = _an(_SE_DICT)
    aa = ArrowAnalyzer(an)
    res = aa(pa.array(docs, pa.string()), with_positions=True)
    terms = res.terms.to_pylist() if hasattr(res.terms, "to_pylist") else list(res.terms)
    offs = list(res.offsets)
    pcum = np.concatenate([[0], np.cumsum(res.tfs)])
    for d, s in enumerate(docs):
        gold = analyze_with_positions(s, an)
        gp: dict[str, list[int]] = {}
        for t, p in gold:
            gp.setdefault(t, []).append(p)
        got = {
            terms[i]: sorted(int(x) for x in res.positions[pcum[i]:pcum[i + 1]])
            for i in range(offs[d], offs[d + 1])
        }
        assert got == {t: sorted(v) for t, v in gp.items()}
        # norm length counts only the anchors (subwords are overlaps)
        anchors = len(s.split()) if s else 0
        assert res.field_lens[d] == anchors
