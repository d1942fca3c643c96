"""Filter-chain golden tests: PorterStemFilter, EnglishAnalyzer,
ASCIIFolding, SynonymFilter, ShingleFilter, EdgeNGramTokenFilter.

Porter expectations are from the published Porter vocabulary (the same
word → stem pairs exercised by the reference's stemmer tests; semantics
ported from analysis/common/.../en/PorterStemmer.java)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_solr_ray.analysis.porter import porter_stem
from lucene_solr_ray.analysis.tokenizer import (
    ArrowAnalyzer,
    EnglishAnalyzer,
    StandardAnalyzer,
    analyze_batch,
    analyze_with_positions,
)

# fmt: off
PORTER_GOLDEN = {
    # step1 examples (PorterStemmer.java:232-252)
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "disabled": "disabl",
    "matting": "mat", "mating": "mate", "meeting": "meet", "milling": "mill",
    "messing": "mess", "meetings": "meet",
    # step3 double suffices (:292-332)
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "analogi": "analog",
    # step4 (:336-354)
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step5 (:358-409)
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step6 final -e / -ll (:413-422)
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll", "oscillators": "oscil",
    # short words untouched (stem(int):479 requires k > k0+1)
    "a": "a", "is": "is", "be": "be", "sky": "sky", "sing": "sing",
    # y handling
    "happy": "happi", "cry": "cry", "by": "by", "say": "sai",
    # bug-guard words (Bug 1 / Bug 2 comments in the reference)
    "aed": "a", "eed": "eed", "ion": "ion",
    # code-ish tokens: digits/underscore are consonants for m()
    "foo_bar": "foo_bar", "abc123": "abc123",
}
# fmt: on


def test_porter_golden_vocabulary():
    bad = {w: (porter_stem(w), e) for w, e in PORTER_GOLDEN.items() if porter_stem(w) != e}
    assert not bad, bad


def test_english_analyzer_chain_order():
    # stop removal happens BEFORE stemming (EnglishAnalyzer.java:110-119):
    # "this" is dropped as a stopword, never stemmed to "thi"
    out = analyze_with_positions("This meeting was agreed", EnglishAnalyzer())
    assert out == [("meet", 1), ("agre", 3)]


def test_ascii_folding_matches_nfd_strip():
    an = StandardAnalyzer(ascii_folding=True)
    assert analyze_with_positions("café naïve Größe", an) == [
        ("cafe", 0),
        ("naive", 1),
        ("große", 2),  # ö folds to o; ß is not a combining mark — NFD leaves it (DuckDB strip_accents ditto)
    ]


def test_ascii_folding_feeds_stopword_filter():
    # a folded token that becomes a stopword is dropped
    an = StandardAnalyzer(ascii_folding=True)
    assert analyze_with_positions("thé cat", an) == [("cat", 1)]


def test_synonym_filter_adds_overlap_token():
    an = StandardAnalyzer(synonyms=(("quick", "fast"),))
    out = analyze_with_positions("the quick fox", an)
    # synonym at the same position as its anchor (posIncr 0)
    assert out == [("quick", 1), ("fast", 1), ("fox", 2)]
    # overlap excluded from field length (discountOverlaps)
    st = analyze_batch(["the quick fox"], an)
    assert st.field_lens.tolist() == [2]


def test_shingle_filter_unigrams_and_shingles():
    an = StandardAnalyzer(stopwords=frozenset(), shingle=(2, 3))
    out = analyze_with_positions("please divide this sentence", an)
    assert ("please divide", 0) in out
    assert ("divide this", 1) in out
    assert ("please divide this", 0) in out
    assert ("divide this sentence", 1) in out
    assert [t for t, _ in out if " " not in t] == ["please", "divide", "this", "sentence"]
    st = analyze_batch(["please divide this sentence"], an)
    assert st.field_lens.tolist() == [4]  # shingles are overlaps


def test_shingles_do_not_cross_documents():
    an = StandardAnalyzer(stopwords=frozenset(), shingle=(2, 2))
    st = ArrowAnalyzer(an)(pa.array(["alpha beta", "gamma delta"], pa.string()))
    all_terms = st.terms.to_pylist()
    assert "beta gamma" not in all_terms
    assert "alpha beta" in all_terms and "gamma delta" in all_terms


def test_edge_ngram_filter():
    an = StandardAnalyzer(stopwords=frozenset(), edge_ngrams=(3, 5))
    out = analyze_with_positions("sparkle ab", an)
    # grams 3..5 of "sparkle"; "ab" (len < min) vanishes
    assert out == [("spa", 0), ("spar", 0), ("spark", 0)]
    st = analyze_batch(["sparkle ab"], an)
    assert st.field_lens.tolist() == [1]  # only the first gram consumes a position


def test_structural_positions_ascending_per_pair():
    # same shingle occurring twice: positions must come back ascending
    an = StandardAnalyzer(stopwords=frozenset(), shingle=(2, 2))
    st = ArrowAnalyzer(an)(pa.array(["x y z x y"], pa.string()), with_positions=True)
    terms = st.terms.to_pylist()
    tfs_start = np.concatenate([[0], np.cumsum(st.tfs)])
    i = terms.index("x y")
    ps = st.positions[tfs_start[i] : tfs_start[i + 1]].tolist()
    assert ps == [0, 3]


def test_shingle_edge_mutually_exclusive():
    an = StandardAnalyzer(shingle=(2, 2), edge_ngrams=(2, 3))
    with pytest.raises(ValueError):
        ArrowAnalyzer(an)(pa.array(["a b"], pa.string()))


def test_end_to_end_stemmed_index(tmp_path):
    """Index with EnglishAnalyzer; a query analyzed with the same analyzer
    matches morphological variants (running → run ← runs)."""
    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.query import parse_query
    from lucene_solr_ray.search.searcher import Searcher

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    tbl = pa.table(
        {
            "repo": ["r"] * 3,
            "path": ["a", "b", "c"],
            "commit": ["1", "2", "3"],
            "lang": ["en"] * 3,
            "content": pa.array(
                [
                    "the dogs were running fast",
                    "he runs a marathon",
                    "completely unrelated text here",
                ],
                pa.large_string(),
            ),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, corpus / "part.parquet")
    an = EnglishAnalyzer()
    idx = tmp_path / "idx"
    build_index(str(corpus), str(idx), docs_per_segment=10, analyzer=an)
    s = Searcher(str(idx))
    got = s.search({"q": parse_query("running", analyzer=an)}, k=10, use_ray=False)
    assert sorted(got["doc_id"].to_pylist()) == [0, 1]  # both dog docs, not doc c


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter (miscellaneous/WordDelimiterGraphFilter.java;
# golden cases mirror TestWordDelimiterGraphFilter)
# ---------------------------------------------------------------------------

from lucene_solr_ray.analysis.worddelim import wd_parts


@pytest.mark.parametrize("tok,parts", [
    ("PowerShot", ["Power", "Shot"]),          # case change
    ("SD500", ["SD", "500"]),                  # alpha→num
    ("A500", ["A", "500"]),
    ("ABCDef", ["ABC", "Def"]),                # upper run keeps last for next
    ("j2se", ["j", "2", "se"]),                # num sandwich
    ("wi_fi", ["wi", "fi"]),                   # delimiter
    ("wi_fi_4000", ["wi", "fi", "4000"]),
    ("_foo_", ["foo"]),                        # leading/trailing delims
    ("___", []),                               # all delims → nothing
    ("lucene", ["lucene"]),                    # no split
    ("LUCENE", ["LUCENE"]),
    ("Lucene", ["Lucene"]),                    # single case part
    ("McKinley", ["Mc", "Kinley"]),            # lower→upper inside
])
def test_wd_parts_golden(tok, parts):
    assert [p for p, _ in wd_parts(tok)] == parts


def test_wd_parts_offsets():
    assert wd_parts("PowerShot500_x") == [
        ("Power", 0), ("Shot", 5), ("500", 9), ("x", 13)]


def test_wd_stream_positions_and_overlaps():
    an = StandardAnalyzer(word_delimiter=("preserve_original", "catenate"))
    got = analyze_with_positions("PowerShot the key_agg", an)
    # PowerShot → original+catenate overlap at 0 (both lowercase to the same
    # term — Lucene emits both too, LowerCaseFilter runs after the WDGF),
    # parts at 0,1; "the" is stopped but consumes position 2;
    # key_agg parts at 3,4 with original/catenation overlapping at 3
    assert got == [
        ("powershot", 0), ("powershot", 0), ("power", 0), ("shot", 1),
        ("key_agg", 3), ("keyagg", 3), ("key", 3), ("agg", 4),
    ]


def test_wd_stream_no_flags():
    an = StandardAnalyzer(word_delimiter=())
    assert analyze_with_positions("PowerShot x", an) == [
        ("power", 0), ("shot", 1), ("x", 2)]


def test_wd_arrow_matches_python():
    an = StandardAnalyzer(word_delimiter=("preserve_original", "catenate"))
    docs = ["PowerShot SD500 the j2se", "wi_fi_4000 ___ plain", "", "a_the b"]
    st = ArrowAnalyzer(an)(pa.array(docs, pa.string()), with_positions=True)
    for d, text in enumerate(docs):
        expect = {}
        for t, p in analyze_with_positions(text, an):
            expect.setdefault(t, []).append(p)
        lo, hi = st.offsets[d], st.offsets[d + 1]
        terms = st.terms[lo:hi].to_pylist()
        tfs = st.tfs[lo:hi]
        base = int(np.sum(st.tfs[: lo]))
        got = {}
        i = base
        for t, tf in zip(terms, tfs):
            got[t] = list(st.positions[i : i + tf])
            i += tf
        assert got == expect, (d, got, expect)
        # norm length = non-overlap emitted terms
        full = [(t, p, o) for t, p, _s, _e, o in
                __import__("lucene_solr_ray.analysis.tokenizer",
                           fromlist=["_analyze_full"])._analyze_full(text, an)]
        assert st.field_lens[d] == sum(1 for _t, _p, o in full if not o)


def test_wd_flag_validation():
    with pytest.raises(ValueError, match="unknown word_delimiter"):
        analyze_with_positions("x", StandardAnalyzer(word_delimiter=("bogus",)))
    with pytest.raises(ValueError, match="cannot combine"):
        analyze_with_positions(
            "x", StandardAnalyzer(word_delimiter=(), shingle=(2, 2)))


# ---------------------------------------------------------------------------
# CharFilters (charfilter/HTMLStripCharFilter.java, PatternReplaceCharFilter,
# MappingCharFilter)
# ---------------------------------------------------------------------------

from lucene_solr_ray.analysis.tokenizer import apply_char_filters


def test_html_strip_golden():
    html = ('<html><body class="m"><p>Hello <b>World</b></p>'
            '<script type="x">var secret = 42;</script>'
            '<style>.x { color: red }</style>'
            '<!-- hidden comment --> Fish &amp; Chips &lt;tag&gt;</body></html>')
    out = apply_char_filters(html, (("html_strip",),))
    assert "secret" not in out and "color" not in out and "comment" not in out
    assert "Hello" in out and "World" in out and "Fish & Chips" in out
    assert "<tag>" in out  # entity-decoded AFTER tag removal
    an = StandardAnalyzer(char_filters=(("html_strip",),))
    terms = [t for t, _ in analyze_with_positions(html, an)]
    assert terms == ["hello", "world", "fish", "chips", "tag"]


def test_html_strip_multiline_blocks():
    html = "qq<script>\nline1\nline2\n</script>bb<!--\nmulti\n-->cc"
    an = StandardAnalyzer(char_filters=(("html_strip",),))
    assert [t for t, _ in analyze_with_positions(html, an)] == ["qq", "bb", "cc"]


def test_pattern_replace_and_mapping_char_filters():
    an = StandardAnalyzer(
        char_filters=(("pattern_replace", r"\d+", "NUM"), ("mapping", (("ß", "ss"),)))
    )
    assert [t for t, _ in analyze_with_positions("abc 123 straße", an)] == [
        "abc", "num", "strasse"]
    with pytest.raises(ValueError, match="unknown char filter"):
        apply_char_filters("x", (("bogus",),))


def test_char_filter_arrow_matches_python():
    an = StandardAnalyzer(char_filters=(("html_strip",),))
    docs = ["<b>Bold</b> text &amp; more", "<script>x</script>plain", ""]
    st = ArrowAnalyzer(an)(pa.array(docs, pa.string()))
    for d, text in enumerate(docs):
        exp = sorted(t for t, _ in analyze_with_positions(text, an))
        lo, hi = st.offsets[d], st.offsets[d + 1]
        # compare multisets via (term, tf)
        exp_tf = {}
        for t, _ in analyze_with_positions(text, an):
            exp_tf[t] = exp_tf.get(t, 0) + 1
        got_tf = dict(zip(st.terms[lo:hi].to_pylist(), (int(x) for x in st.tfs[lo:hi])))
        assert got_tf == exp_tf


def test_ngram_filter_golden():
    an = StandardAnalyzer(ngrams=(3, 3), stopwords=frozenset())
    got = analyze_with_positions("merge ab", an)
    # all 3-grams of "merge" at position 0 (same-position, LUCENE-8330);
    # "ab" shorter than min_gram vanishes but consumes a position
    assert got == [("mer", 0), ("erg", 0), ("rge", 0)]
    st = ArrowAnalyzer(an)(pa.array(["merge ab"], pa.string()))
    assert sorted(st.terms.to_pylist()) == ["erg", "mer", "rge"]
    assert st.field_lens[0] == 1  # one non-overlap anchor per surviving token


def test_ngram_exclusive_with_edge():
    with pytest.raises(ValueError, match="mutually exclusive"):
        ArrowAnalyzer(StandardAnalyzer(ngrams=(2, 3), edge_ngrams=(2, 3)))(
            pa.array(["x"], pa.string()))


def test_length_filter_and_stem_exclusions():
    an = StandardAnalyzer(length_filter=(3, 5))
    # "to" is below min (and a stopword anyway); "extended" above max;
    # both consume positions
    assert analyze_with_positions("to merge extended runs", an) == [
        ("merge", 1), ("runs", 3)]
    st = ArrowAnalyzer(an)(pa.array(["to merge extended runs"], pa.string()))
    assert sorted(st.terms.to_pylist()) == ["merge", "runs"]
    assert st.field_lens[0] == 2

    an2 = EnglishAnalyzer(stem_exclusions=frozenset({"running"}))
    # protected word skips the stemmer; unprotected stems normally
    assert analyze_with_positions("running meetings", an2) == [
        ("running", 0), ("meet", 1)]
    st2 = ArrowAnalyzer(an2)(pa.array(["running meetings"], pa.string()))
    assert sorted(st2.terms.to_pylist()) == ["meet", "running"]


def test_wd_parts_positions_support_phrases(tmp_path):
    """Split parts take consecutive positions, so a phrase query matches
    INSIDE a joined identifier: 'key_agg' indexes as key@p, agg@p+1 and
    PhraseQuery('key agg') hits it."""
    import pyarrow.parquet as pq

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search.query import PhraseQuery
    from lucene_solr_ray.search.searcher import Searcher

    corpus = tmp_path / "c"
    corpus.mkdir()
    tbl = pa.table({
        "repo": ["r"] * 3, "path": ["a", "b", "c"], "commit": ["1", "2", "3"],
        "lang": ["en"] * 3,
        "content": pa.array(
            ["uses key_agg here", "key but agg apart", "agg_key reversed"],
            pa.large_string()),
    })
    pq.write_table(tbl, corpus / "p.parquet")
    an = StandardAnalyzer(word_delimiter=("preserve_original",))
    idx = tmp_path / "i"
    build_index(str(corpus), str(idx), docs_per_segment=10, analyzer=an)
    s = Searcher(str(idx))
    got = s.search({"q": PhraseQuery(("key", "agg"), (0, 1))}, k=10, use_ray=False)
    assert got["doc_id"].to_pylist() == [0]  # only the joined identifier


# ---------------------------------------------------------------------------
# PhoneticFilter / Soundex (analysis/phonetic + commons-codec semantics)
# ---------------------------------------------------------------------------

from lucene_solr_ray.analysis.phonetic import soundex


@pytest.mark.parametrize("word,code", [
    ("Robert", "R163"), ("Rupert", "R163"),         # classic pair
    ("Ashcraft", "A261"),                           # H is transparent
    ("Ashcroft", "A261"),
    ("Tymczak", "T522"),                            # adjacent-code collapse
    ("Pfister", "P236"),                            # first-letter code collapses
    ("Honeyman", "H555"),
    ("a", "A000"), ("lee", "L000"),
    ("gauss", "G200"), ("ghosh", "G200"),           # another classic pair
    ("hilbert", "H416"), ("heilbronn", "H416"),
    ("123", "123"),                                 # no letters → unchanged
])
def test_soundex_golden(word, code):
    assert soundex(word) == code


def test_phonetic_filter_in_chain():
    an = StandardAnalyzer(phonetic="soundex")
    # robert and rupert collapse to the same indexed term
    assert analyze_with_positions("robert rupert", an) == [("R163", 0), ("R163", 1)]
    st = analyze_batch(["robert rupert smith"], an)
    assert sorted(st.terms.to_pylist() if hasattr(st.terms, "to_pylist")
                  else list(st.terms)) == ["R163", "S530"]
    with pytest.raises(ValueError, match="unknown phonetic"):
        analyze_with_positions("x", StandardAnalyzer(phonetic="beider_morse"))


# ---------------------------------------------------------------------------
# CommonGramsFilter / KeepWordFilter
# ---------------------------------------------------------------------------


def test_common_grams_golden():
    """CommonGramsFilter.java semantics: a w1_w2 bigram for every adjacent
    stream pair touching a stopword, as an overlap at the first word's
    position; the stop-filtered unigram stream is unchanged."""
    an = StandardAnalyzer(common_grams=True)
    got = analyze_with_positions("the quick fox and the lazy dog", an)
    # unigrams (stopwords removed, positions preserved)
    assert [(t, p) for t, p in got if "_" not in t] == [
        ("quick", 1), ("fox", 2), ("lazy", 5), ("dog", 6)]
    # bigrams: the_quick@0 fox_and@2 and_the@3 the_lazy@4
    assert [(t, p) for t, p in got if "_" in t] == [
        ("the_quick", 0), ("fox_and", 2), ("and_the", 3), ("the_lazy", 4)]


def test_common_grams_arrow_matches_python_and_norms():
    an = StandardAnalyzer(common_grams=True)
    docs = ["the quick fox and the lazy dog", "no stopwords here at all", ""]
    st = ArrowAnalyzer(an)(pa.array(docs, pa.large_string()), with_positions=True)
    # norm length counts unigrams only (bigrams are overlaps)
    assert st.field_lens.tolist() == [4, 3, 0]  # "no"/"at" are stopwords
    terms = {}
    tf_cum = np.concatenate([[0], np.cumsum(st.tfs)])
    tl = st.terms.to_pylist()
    for d in range(len(docs)):
        for j in range(st.offsets[d], st.offsets[d + 1]):
            terms[(d, tl[j])] = st.positions[tf_cum[j]:tf_cum[j + 1]].tolist()
    assert terms[(0, "the_quick")] == [0]
    assert terms[(0, "and_the")] == [3]
    # doc1: "no" and "at" are stopwords → no_stopwords, here_at, at_all
    assert (1, "no_stopwords") in terms and (1, "here_at") in terms
    assert (1, "stopwords_here") not in terms  # neither side is a stopword


def test_keep_words_filter():
    an = StandardAnalyzer(keep_words=frozenset({"fox", "dog"}))
    got = analyze_with_positions("the quick fox and the lazy dog", an)
    assert got == [("fox", 2), ("dog", 6)]  # dropped words consume positions
    st = ArrowAnalyzer(an)(
        pa.array(["the quick fox and the lazy dog"], pa.large_string()),
        with_positions=True,
    )
    assert st.field_lens.tolist() == [2]
    assert sorted(st.terms.to_pylist()) == ["dog", "fox"]


def test_common_grams_rejects_structural():
    with pytest.raises(ValueError):
        ArrowAnalyzer(StandardAnalyzer(common_grams=True, shingle=(2, 2)))(
            pa.array(["a b"], pa.large_string()), with_positions=False
        )


# ---------------------------------------------------------------------------
# DoubleMetaphoneFilter (analysis/phonetic/DoubleMetaphoneFilter.java +
# the published Double Metaphone algorithm, Philips 2000)
# ---------------------------------------------------------------------------

from lucene_solr_ray.analysis.dmetaphone import double_metaphone


@pytest.mark.parametrize("word,codelen,want", [
    # reference-blessed vectors (DoubleMetaphoneFilterTest.java:30-52)
    ("international", 4, ("ANTR", "ANTR")),
    ("international", 8, ("ANTRNXNL", "ANTRNXNL")),
    ("Kuczewski", 4, ("KSSK", "KXFS")),
    ("hello", 8, ("HL", "HL")),
    ("12345", 8, ("", "")),
    # widely published algorithm pairs
    ("smith", 4, ("SM0", "XMT")),
    ("schmidt", 4, ("XMT", "SMT")),
    ("snider", 4, ("SNTR", "XNTR")),
    ("schneider", 4, ("XNTR", "SNTR")),
    ("katherine", 4, ("K0RN", "KTRN")),
    ("catherine", 4, ("K0RN", "KTRN")),
    ("jose", 4, ("HS", "HS")),  # whole-input "jose" → H (handleJ length==4)
    ("michael", 4, ("MKL", "MXL")),
    ("thomas", 4, ("TMS", "TMS")),
    ("school", 4, ("SKL", "SKL")),
    ("wright", 4, ("RT", "RT")),
    ("knight", 4, ("NT", "NT")),
    ("xavier", 4, ("SF", "SFR")),
    ("philip", 4, ("FLP", "FLP")),
])
def test_double_metaphone_golden(word, codelen, want):
    assert double_metaphone(word, codelen) == want


def test_dmetaphone_filter_replace_and_inject():
    an = StandardAnalyzer(phonetic="double_metaphone")
    # smith: primary SM0 at pos 0 replaces; alternate XMT overlays pos 0
    toks = analyze_with_positions("smith thomas", an)
    assert ("SM0", 0) in toks and ("XMT", 0) in toks and ("TMS", 1) in toks
    # equal primary/alternate -> single token (no duplicate injection)
    assert [t for t, _ in toks].count("TMS") == 1


def test_dmetaphone_same_codes_match_in_search_chain():
    # katherine and catherine index to identical code sets
    an = StandardAnalyzer(phonetic="double_metaphone")
    a = sorted(analyze_with_positions("katherine", an))
    b = sorted(analyze_with_positions("catherine", an))
    assert [t for t, _ in a] == [t for t, _ in b] == ["K0RN", "KTRN"]


def test_dmetaphone_arrow_agrees_with_golden():
    an = StandardAnalyzer(phonetic="double_metaphone")
    texts = ["smith schmidt snider", "katherine jose wright", "hello 12345 school",
             "international kuczewski xavier philip"]
    for text in texts:
        golden = sorted(analyze_with_positions(text, an))
        st = analyze_batch([text], an)
        terms = st.terms.to_pylist() if hasattr(st.terms, "to_pylist") else list(st.terms)
        tfs = list(st.tfs)
        # batch output is inverted (unique terms + tf) — expand by tf
        expanded = sorted(t for t, n in zip(terms, tfs) for _ in range(int(n)))
        assert expanded == sorted(t for t, _ in golden)


def test_dmetaphone_overlap_excluded_from_norms():
    an = StandardAnalyzer(phonetic="double_metaphone")
    st = analyze_batch(["smith thomas"], an)
    # 2 source tokens -> field_len 2 even though 3 terms are indexed
    assert int(st.field_lens[0]) == 2


def test_dmetaphone_rejects_structural_combos():
    with pytest.raises(ValueError, match="structural"):
        analyze_with_positions("x y", StandardAnalyzer(
            phonetic="double_metaphone", shingle=(2, 2)))


# ---------------------------------------------------------------------------
# DaitchMokotoffSoundexFilter (analysis/phonetic + the standard D-M chart)
# ---------------------------------------------------------------------------

from lucene_solr_ray.analysis.dmsoundex import dm_soundex


@pytest.mark.parametrize("word,codes", [
    # reference-blessed (TestDaitchMokotoffSoundexFilter.java:35-40)
    ("aaa", ["000000"]),
    ("bbb", ["700000"]),
    ("ccc", ["400000", "450000", "454000", "500000", "540000", "545000"]),
    ("easgasg", ["045450"]),
    # published chart examples (Mokotoff's standard documentation)
    ("Moskowitz", ["645740"]),
    ("Lipshitz", ["874400"]),
    ("Lewinsky", ["876450"]),
    ("Szlamawicz", ["486740"]),
])
def test_dm_soundex_golden(word, codes):
    assert dm_soundex(word) == sorted(codes)


def test_dm_soundex_branching_includes_published_codes():
    # branching encoders must include the chart's published code among
    # alternatives (Auerbach 097500 via CH→TCH; Peters 739400 via TS)
    assert "097500" in dm_soundex("Auerbach")
    assert "739400" in dm_soundex("Peters")
    assert "154600" in dm_soundex("Jackson")


def test_dm_soundex_filter_in_chain():
    an = StandardAnalyzer(phonetic="dm_soundex")
    toks = analyze_with_positions("ccc easgasg", an)
    at0 = sorted(t for t, p in toks if p == 0)
    assert at0 == ["400000", "450000", "454000", "500000", "540000", "545000"]
    assert ("045450", 1) in toks
    # Arrow path agrees (multiset via tf expansion)
    st = analyze_batch(["ccc easgasg"], an)
    terms = st.terms.to_pylist() if hasattr(st.terms, "to_pylist") else list(st.terms)
    expanded = sorted(t for t, n in zip(terms, list(st.tfs)) for _ in range(int(n)))
    assert expanded == sorted(t for t, _ in toks)
    # overlays excluded from norms: 2 source tokens -> field_len 2
    assert int(st.field_lens[0]) == 2


# ---------------------------------------------------------------------------
# KeywordRepeatFilter + RemoveDuplicates / LimitTokenCountFilter
# ---------------------------------------------------------------------------


def test_keyword_repeat_indexes_both_forms():
    an = StandardAnalyzer(stem="porter", keyword_repeat=True)
    toks = analyze_with_positions("the dogs were running fast", an)
    assert ("dogs", 1) in toks and ("dog", 1) in toks      # original + stem
    assert ("running", 3) in toks and ("run", 3) in toks
    assert [t for t, _ in toks].count("fast") == 1          # stem == original → deduped
    st = analyze_batch(["the dogs were running fast"], an)
    terms = st.terms.to_pylist() if hasattr(st.terms, "to_pylist") else list(st.terms)
    assert sorted(terms) == ["dog", "dogs", "fast", "run", "running", "were"]
    assert int(st.field_lens[0]) == 4  # stemmed copies are overlaps
    with pytest.raises(ValueError, match="requires stem"):
        analyze_with_positions("x", StandardAnalyzer(keyword_repeat=True))


def test_keyword_repeat_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from lucene_solr_ray.index.build import build_index
    from lucene_solr_ray.search import Searcher
    from lucene_solr_ray.search.query import TermQuery

    tbl = pa.table({
        "repo": ["r"] * 2, "path": ["a", "b"], "commit": ["1", "2"],
        "lang": ["en"] * 2,
        "content": ["dogs running wild", "a dog runs home"],
    })
    an = StandardAnalyzer(stem="porter", keyword_repeat=True)
    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), d, docs_per_segment=10, analyzer=an)
    s = Searcher(d)
    # stemmed query term matches BOTH docs; exact surface form matches its doc
    got = s.search({"stem": TermQuery("run"), "surface": TermQuery("running")},
                   k=10, use_ray=False).to_pandas()
    assert sorted(got[got.query_id == "stem"].doc_id) == [0, 1]
    assert sorted(got[got.query_id == "surface"].doc_id) == [0]


def test_limit_token_count_truncates_index():
    an = StandardAnalyzer(limit_token_count=3)
    assert analyze_with_positions("alpha beta gamma delta epsilon", an) == [
        ("alpha", 0), ("beta", 1), ("gamma", 2)
    ]
    st = analyze_batch(["alpha beta gamma delta epsilon", "one two"], an)
    assert st.field_lens.tolist() == [3, 2]
    # limit counts KEPT tokens: stopwords don't use up the budget
    toks = analyze_with_positions("the a cat and dog runs", StandardAnalyzer(limit_token_count=2))
    assert [t for t, _ in toks] == ["cat", "dog"]
