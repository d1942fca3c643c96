"""Golden analyzer fixtures (FIXTURES.md §2), in the spirit of
BaseTokenStreamTestCase.assertTokenStreamContents
(test-framework .../analysis/BaseTokenStreamTestCase.java:127) and
TestStandardAnalyzer / TestStopFilter."""

import numpy as np

from lucene_solr_ray.analysis import (
    ENGLISH_STOP_WORDS,
    analyze_batch,
    analyze_with_positions,
)


def terms(text):
    return [t for t, _ in analyze_with_positions(text)]


def test_alphanumeric_mixes():
    assert terms("B2B") == ["b2b"]
    assert terms("2B") == ["2b"]


def test_lowercasing():
    assert terms("QUICK brown FoX") == ["quick", "brown", "fox"]


def test_stopword_position_increment_accumulation():
    # StopFilter posIncr semantics (FilteringTokenFilter.java:46-61):
    # "the quick and the dead" -> quick@1, dead@4
    out = analyze_with_positions("the quick and the dead")
    assert out == [("quick", 1), ("dead", 4)]


def test_code_punctuation_uax29():
    # underscore joins, dot splits
    assert terms("foo_bar baz.qux(arg1)") == ["foo_bar", "baz", "qux", "arg1"]


def test_overlong_token_skipped_but_positions_advance():
    long_tok = "x" * 256
    out = analyze_with_positions(f"alpha {long_tok} beta")
    assert out == [("alpha", 0), ("beta", 2)]
    # exactly 255 chars is kept
    ok = "y" * 255
    assert terms(f"alpha {ok}") == ["alpha", ok]


def test_empty_and_unicode():
    assert terms("") == []
    assert terms("   \n\t ") == []
    assert terms("héllo wörld") == ["héllo", "wörld"]


def test_stopword_list_is_the_33_default_words():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS
    assert "quick" not in ENGLISH_STOP_WORDS


def test_batch_matches_positional_api():
    docs = [
        "the quick and the dead",
        "B2B foo_bar foo_bar baz.qux",
        "",
        "the the the",
        "alpha " + "x" * 256 + " beta alpha",
    ]
    stats = analyze_batch(docs)
    for d, text in enumerate(docs):
        expected = {}
        for t, _ in analyze_with_positions(text):
            expected[t] = expected.get(t, 0) + 1
        got_terms = stats.terms[stats.offsets[d] : stats.offsets[d + 1]]
        got_tfs = stats.tfs[stats.offsets[d] : stats.offsets[d + 1]]
        assert dict(zip(got_terms.tolist(), got_tfs.tolist())) == expected
        assert stats.field_lens[d] == sum(expected.values())
        # unique terms, no duplicates within a doc
        assert len(set(got_terms)) == len(got_terms)


def test_arrow_analyzer_matches_python_path():
    import pyarrow as pa

    from lucene_solr_ray.analysis.tokenizer import ArrowAnalyzer
    from lucene_solr_ray.corpus import generate_corpus

    tbl = generate_corpus(200)
    docs = tbl["content"].to_pylist() + [
        "the quick and the dead",
        "",
        "B2B foo_bar foo_bar baz.qux",
        "alpha " + "x" * 256 + " beta",
        "héllo wörld",
    ]
    py = analyze_batch(docs)
    ar = ArrowAnalyzer()(pa.array(docs, pa.large_string()))
    assert np.array_equal(py.field_lens, ar.field_lens)
    assert np.array_equal(py.offsets, ar.offsets)
    ar_terms = ar.terms.to_pylist()
    for d in range(len(docs)):
        a = dict(zip(py.terms[py.offsets[d] : py.offsets[d + 1]].tolist(),
                     py.tfs[py.offsets[d] : py.offsets[d + 1]].tolist()))
        b = dict(zip(ar_terms[ar.offsets[d] : ar.offsets[d + 1]],
                     ar.tfs[ar.offsets[d] : ar.offsets[d + 1]].tolist()))
        assert a == b, f"doc {d}"


def test_batch_field_len_counts_kept_tokens_only():
    stats = analyze_batch(["the quick and the dead"])
    assert stats.field_lens.tolist() == [2]
    assert stats.field_lens.dtype == np.int32


def test_uax29_segmentation_golden():
    """Extended UAX#29 classes (StandardTokenizerImpl.jflex): ideographs and
    hiragana one char per token, katakana/hangul runs, emoji ZWJ sequences
    one token, ALPHANUM unchanged."""
    from lucene_solr_ray.analysis.tokenizer import StandardAnalyzer, analyze_with_positions

    a = StandardAnalyzer(unicode_segmentation=True, stopwords=frozenset())
    assert [t for t, _ in analyze_with_positions("今日は晴れ", a)] == ["今", "日", "は", "晴", "れ"]
    assert [t for t, _ in analyze_with_positions("Hello世界abc", a)] == ["hello", "世", "界", "abc"]
    assert [t for t, _ in analyze_with_positions("コンピュータ 안녕하세요", a)] == ["コンピュータ", "안녕하세요"]
    toks = [t for t, _ in analyze_with_positions("go \U0001F389\U0001F389 \U0001F468‍\U0001F469‍\U0001F467 now", a)]
    assert toks == ["go", "\U0001F389", "\U0001F389", "\U0001F468‍\U0001F469‍\U0001F467", "now"]
    # positions advance per emitted token
    assert analyze_with_positions("漢字 kanji", a) == [("漢", 0), ("字", 1), ("kanji", 2)]
    # default mode unchanged (CJK run glued, oracle-compatible)
    d = StandardAnalyzer(stopwords=frozenset())
    assert [t for t, _ in analyze_with_positions("Hello世界abc", d)] == ["hello世界abc"]


def test_uax29_arrow_batch_matches_python():
    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.analysis.tokenizer import (
        ArrowAnalyzer,
        StandardAnalyzer,
        analyze_with_positions,
    )

    a = StandardAnalyzer(unicode_segmentation=True)
    docs = ["今日は the 晴れ test", "コンピュータ and data 漢字", "", "plain ascii only"]
    stats = ArrowAnalyzer(a)(pa.array(docs, pa.large_string()), with_positions=True)
    for i, doc in enumerate(docs):
        expected = analyze_with_positions(doc, a)
        lo, hi = stats.offsets[i], stats.offsets[i + 1]
        terms = stats.terms[lo:hi].to_pylist() if hasattr(stats.terms, "to_pylist") else list(stats.terms[lo:hi])
        exp_tf = {}
        for t, _p in expected:
            exp_tf[t] = exp_tf.get(t, 0) + 1
        got_tf = dict(zip(terms, stats.tfs[lo:hi].tolist()))
        assert got_tf == exp_tf, (i, got_tf, exp_tf)
        assert stats.field_lens[i] == len(expected)


def test_url_email_tokenizer_mode():
    """UAX29URLEmailTokenizer analog: URLs and emails survive as single
    (lowercased) tokens; plain words tokenize as before; the Arrow batch
    path agrees with the per-string golden path."""
    from lucene_solr_ray.analysis.tokenizer import (
        ArrowAnalyzer,
        StandardAnalyzer,
        analyze_with_positions,
    )
    import pyarrow as pa

    a = StandardAnalyzer(url_email=True)
    text = 'Visit HTTPS://Example.COM/path?x=1 or mail Bob.Smith+x@Corp.Example.org now!'
    toks = [t for t, _ in analyze_with_positions(text, a)]
    assert toks == [
        "visit",
        "https://example.com/path?x=1",
        "mail",
        "bob.smith+x@corp.example.org",
        "now",
    ]  # 'or' is a stopword
    # default mode shreds both
    base = [t for t, _ in analyze_with_positions(text)]
    assert "https://example.com/path?x=1" not in base and "https" in base

    # Arrow batch path (actor fast path fallback) produces the same stream
    stats = ArrowAnalyzer(a)(pa.array([text]))
    got = sorted(
        zip(
            (stats.terms.to_pylist() if isinstance(stats.terms, pa.Array) else list(stats.terms)),
            stats.tfs.tolist(),
        )
    )
    assert got == sorted((t, 1) for t in toks)
    assert stats.field_lens.tolist() == [5]
