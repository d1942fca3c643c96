"""ICUFoldingFilter analog — every golden from the reference's
TestICUFoldingFilter.java (``lucene/analysis/icu/src/test``), plus
golden-vs-Arrow-batch identity."""

from lucene_solr_ray.analysis.tokenizer import (
    StandardAnalyzer,
    _fold_icu,
    analyze_with_positions,
)

# (input, folded) — TestICUFoldingFilter.testDefaults verbatim
GOLDENS = [
    ("This", "this"), ("is", "is"), ("a", "a"), ("test", "test"),
    ("Ruß", "russ"),
    ("ΜΆΪΟΣ", "μαιοσ"), ("Μάϊος", "μαιοσ"),
    ("𐐖", "𐐾"),
    ("ﴳﴺﰧ", "طمطمطم"),
    ("क्‍ष", "कष"),
    ("résumé", "resume"), ("résumé", "resume"),
    ("৭০৬", "706"),
    ("đis", "dis"), ("cræzy", "craezy"),
    ("ELİF", "elif"), ("eli̇f", "elif"),
    ("", ""),
]


def test_reference_goldens():
    for raw, want in GOLDENS:
        assert _fold_icu(raw) == want, raw


def test_analyzer_chain():
    an = StandardAnalyzer(icu_folding=True, stopwords=frozenset())
    toks = analyze_with_positions("đis is cræzy résumé ELİF", an)
    assert [t for t, _ in toks] == ["dis", "is", "craezy", "resume", "elif"]


def test_batch_path_matches_golden():
    import pyarrow as pa

    from lucene_solr_ray.analysis.tokenizer import ArrowAnalyzer

    an = StandardAnalyzer(icu_folding=True, stopwords=frozenset())
    docs = ["đis is cræzy", "résumé ΜΆΪΟΣ ৭০৬", ""]
    aa = ArrowAnalyzer(an)
    res = aa(pa.array(docs, pa.string()), with_positions=True)
    terms = (res.terms.to_pylist()
             if hasattr(res.terms, "to_pylist") else list(res.terms))
    offs = list(res.offsets)
    for d, text in enumerate(docs):
        gold = {}
        for t, _p in analyze_with_positions(text, an):
            gold[t] = gold.get(t, 0) + 1
        got = {terms[i]: int(res.tfs[i]) for i in range(offs[d], offs[d + 1])}
        assert got == gold, (d, got, gold)
