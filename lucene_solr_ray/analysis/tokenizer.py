"""StandardAnalyzer-equivalent analysis chain, vectorized for Arrow batches.

Reference semantics reproduced (all paths under /root/reference/lucene/core/src/java):

- Tokenize on word characters — the ALPHANUM/NUM subset of UAX#29 used by
  ``org/apache/lucene/analysis/standard/StandardTokenizer.java`` (JFlex DFA):
  runs of letters / digits / underscore form one token (``foo_bar`` is one
  token, ``baz.qux`` splits at the dot). Python ``\\w`` ≡ RE2 ``[\\p{L}\\p{N}_]``
  which keeps the oracle SQL (DuckDB ``regexp_extract_all``) bit-identical.
- Tokens longer than ``maxTokenLength = 255`` are skipped but still consume a
  position (``StandardTokenizer.java:143-166``, ``StandardAnalyzer.java:62``).
- ``LowerCaseFilter`` (``analysis/LowerCaseFilter.java:40-45``).
- ``StopFilter`` with the 33-word default English set
  (``analysis/standard/StandardAnalyzer.java:49-57``); position increments of
  dropped tokens accumulate onto the next kept token
  (``analysis/FilteringTokenFilter.java:46-61``).
- Field length for norms = number of kept tokens (all posIncr > 0 here, so
  ``numOverlap == 0``; ``index/DefaultIndexingChain.java:763-880``).

Two APIs:

- :func:`analyze_with_positions` — per-string, returns ``[(term, position)]``;
  used by golden tests mirroring ``BaseTokenStreamTestCase``.
- :func:`analyze_batch` — vectorized per-batch term-frequency fold used by the
  indexing pipeline; returns per-doc unique terms + tfs + field lengths.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

# analysis/standard/StandardAnalyzer.java:49-57
ENGLISH_STOP_WORDS: frozenset[str] = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH (StandardAnalyzer.java:62)
MAX_TOKEN_LENGTH = 255

#: ReversedWildcardFilter marker (START_OF_HEADING, the Solr factory default)
REV_MARKER = ""

# \w+ with Unicode: runs of [\p{L}\p{N}_] — matches DuckDB RE2 '[\p{L}\p{N}_]+'
TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# --- UAX#29 word classes beyond ALPHANUM (StandardTokenizerImpl.jflex) ---
# IDEOGRAPHIC and HIRAGANA emit ONE char per token; KATAKANA and HANGUL emit
# runs; EMOJI sequences (incl. ZWJ joins) are one token — mirroring the
# reference DFA's token types (analysis/standard/StandardTokenizer.java:58-78).
_IDEO = "\u3006\u3007\u4E00-\u9FFF\u3400-\u4DBF\uF900-\uFAFF"
_HIRA = "\u3041-\u309F"
_KATA = "\u30A0-\u30FF\u31F0-\u31FF\uFF66-\uFF9D"
_HANG = "\u1100-\u11FF\u3130-\u318F\uAC00-\uD7A3"
_EMOJ = "\u2600-\u27BF\u2B00-\u2BFF\U0001F000-\U0001FAFF"
_CJK_ALL = _IDEO + _HIRA + _KATA + _HANG


def _combining_mark_class() -> str:
    """Character-class body for UAX#29 Extend chars: all BMP combining
    marks (Mn/Mc/Me \u2014 Python ``\\w`` excludes them, so Devanagari matras,
    Bengali kars, Arabic harakat etc. would otherwise split words) plus
    ZWNJ/ZWJ (word-internal joiners; the Hindi normalizer deletes them
    AFTER tokenization, per the reference chain). Built once at import
    from unicodedata so every mark block is covered exactly."""
    import unicodedata

    ranges: list[list[int]] = []
    for cp in range(0x10000):
        if unicodedata.category(chr(cp)).startswith("M"):
            if ranges and ranges[-1][1] == cp - 1:
                ranges[-1][1] = cp
            else:
                ranges.append([cp, cp])
    parts = [
        chr(a) if a == b else f"{chr(a)}-{chr(b)}" for a, b in ranges
    ]
    return "".join(parts) + "\u200C\u200D"


_MARKS = _combining_mark_class()
#: the ALPHANUM word class: starts with a word char, continues through
#: word chars AND combining marks (UAX#29 ALetter (Extend|Format)* \u2014
#: StandardTokenizerImpl.jflex includes Extend in its word classes)
_WORDX = f"(?:(?![{_CJK_ALL}])\\w)(?:(?![{_CJK_ALL}])[\\w{_MARKS}])*"
UAX29_TOKEN_RE = re.compile(
    f"[{_KATA}]+"
    f"|[{_HANG}]+"
    f"|[{_IDEO}]"
    f"|[{_HIRA}]"
    f"|[{_EMOJ}](?:\u200D[{_EMOJ}])*"
    f"|{_WORDX}",
    re.UNICODE,
)


#: UAX29URLEmailTokenizer's extra word classes (URL / EMAIL tokens kept
#: whole; ``analysis/standard/UAX29URLEmailTokenizer.java``) — a pragmatic
#: subset of its grammar: scheme URLs and RFC-ish emails, longest-match
#: before the word classes
_URLEMAIL_PAT = (
    r"https?://[^\s<>\"']+"
    r"|[a-z0-9_.+\-]+@[a-z0-9\-]+(?:\.[a-z0-9\-]+)+"
)


def token_re(analyzer: "StandardAnalyzer") -> "re.Pattern":
    base = UAX29_TOKEN_RE if analyzer.unicode_segmentation else TOKEN_RE
    if analyzer.url_email:
        return re.compile(f"{_URLEMAIL_PAT}|{base.pattern}", re.UNICODE | re.IGNORECASE)
    return base


@dataclass(frozen=True)
class StandardAnalyzer:
    """Configuration of the analysis chain; immutable and cheaply shippable.

    Chain order (mirroring ``EnglishAnalyzer.createComponents``,
    ``analysis/common/.../en/EnglishAnalyzer.java:110-119``, and the common
    filter factories): tokenize → maxTokenLength skip → lowercase →
    [ascii_folding] → stopwords → [stem] → [synonyms | shingle | edge_ngrams].
    ``EnglishPossessiveFilter`` is omitted: the ``\\w+`` ALPHANUM tokenizer
    already splits at apostrophes, so it would be a no-op.
    """

    max_token_length: int = MAX_TOKEN_LENGTH
    stopwords: frozenset[str] = field(default_factory=lambda: ENGLISH_STOP_WORDS)
    lowercase: bool = True
    #: full UAX#29 word classes (CJK/Hangul/Katakana/emoji) instead of the
    #: ALPHANUM-subset default; analysis runs through the Python tokenizer
    #: (the Arrow fast path covers only the default mode)
    unicode_segmentation: bool = False
    #: UAX29URLEmailTokenizer analog: URLs and emails survive as single
    #: tokens instead of splitting at punctuation (Python tokenizer path,
    #: like unicode_segmentation)
    url_email: bool = False
    #: ASCIIFoldingFilter analog via NFD-decompose + strip combining marks
    #: (bit-identical to DuckDB ``strip_accents``; diverges from Lucene's
    #: hand-written table on ligatures like ß/œ, which NFD leaves alone)
    ascii_folding: bool = False
    #: ICUFoldingFilter analog (case fold + NFKD + mark/ignorable removal +
    #: digit fold + stroke-letter fold; see :func:`_fold_icu`)
    icu_folding: bool = False
    #: HunspellStemFilter (longestOnly mode) in the stemmer slot:
    #: (aff_text, dic_text[, ignore_case]) — the .aff/.dic CONTENT, so the
    #: analyzer stays a hashable value object shipped to actors; the parsed
    #: dictionary is cached per process (see _hunspell_cached)
    hunspell: tuple | None = None
    #: "porter" → PorterStemFilter (analysis/en/PorterStemmer.java); applied
    #: after stopword removal, per EnglishAnalyzer's chain order
    stem: str | None = None
    #: SynonymFilter analog: each (term → synonym) pair ADDS the synonym at
    #: the same position as the matched term (posIncr 0 ⇒ overlap; excluded
    #: from the norm length under discountOverlaps)
    synonyms: tuple[tuple[str, str], ...] = ()
    #: ShingleFilter (min_size, max_size): emit unigrams plus space-joined
    #: n-grams of consecutive kept tokens; a shingle sits at its first
    #: member's position as an overlap. Exactly Lucene's ShingleFilter when
    #: ``stopwords`` is empty (no filler-token question arises).
    shingle: tuple[int, int] | None = None
    #: EdgeNGramTokenFilter (min_gram, max_gram): REPLACE each token by its
    #: prefixes of length min..max (capped at the token length; tokens
    #: shorter than min vanish); the first gram keeps the token's position,
    #: the rest are overlaps.
    edge_ngrams: tuple[int, int] | None = None
    #: PhoneticFilter replace=true (analysis/phonetic/PhoneticFilter.java +
    #: commons-codec Soundex): each term is replaced by its phonetic code
    #: after stemming (the sounds-like field idiom). Values: "soundex",
    #: "metaphone", "refined_soundex", "caverphone", "nysiis", "cologne"
    #: (1:1 replace), or "double_metaphone" / "dm_soundex" (replace+inject).
    phonetic: str | None = None
    #: ReversedWildcardFilter (solr/core/.../analysis/ReversedWildcardFilter
    #: Factory): ADD a marker-prefixed reversed twin of every kept token as a
    #: posIncr-0 overlap — leading wildcards then rewrite to PREFIX queries
    #: on the reversed twins (row-group-stats pushdown instead of a full
    #: dictionary scan).
    reverse_overlap: bool = False
    #: LengthFilter (min, max): drop tokens whose length is outside the
    #: bounds (analysis/miscellaneous/LengthFilter.java); like the stop
    #: filter, dropped tokens still consume a position. Applied after
    #: lowercase/folding, before stopwords (factory chain order).
    length_filter: tuple[int, int] | None = None
    #: KeywordRepeatFilter + RemoveDuplicatesTokenFilter
    #: (analysis/miscellaneous/KeywordRepeatFilter.java + RemoveDuplicates
    #: TokenFilter.java): index BOTH the original surface form and its stem —
    #: the original keeps the position, the stemmed copy overlays (posIncr 0)
    #: and is dropped when identical. Requires ``stem="porter"``.
    keyword_repeat: bool = False
    #: LimitTokenCountFilter (analysis/miscellaneous/LimitTokenCountFilter
    #: .java): only the first N kept tokens are indexed (placed after the
    #: stop filter, the conventional truncate-what-gets-indexed spot).
    limit_token_count: int | None = None
    #: KeywordMarkerFilter (analysis/miscellaneous/SetKeywordMarkerFilter.java):
    #: terms in this set are protected from the stemmer (EnglishAnalyzer's
    #: stemExclusionSet constructor arg).
    stem_exclusions: frozenset[str] = frozenset()
    #: NGramTokenFilter (min_gram, max_gram): REPLACE each token by ALL its
    #: substrings of length min..max (tokens shorter than min vanish); all
    #: grams of a token share its position (the 7.4+ same-position
    #: behavior, LUCENE-8330) — the first (min-length, offset-0) gram is the
    #: position anchor, the rest are overlaps.
    ngrams: tuple[int, int] | None = None
    #: WordDelimiterGraphFilter analog (analysis/worddelim.py): () enables
    #: subword splitting (underscore / case change / letter↔digit, word+number
    #: parts always generated, each part its own position); optional flags
    #: "preserve_original" and "catenate" add posIncr-0 overlaps. Runs BEFORE
    #: lowercase (it needs case), per Solr's canonical chain placement.
    #: Mutually exclusive with the structural filters above.
    word_delimiter: tuple[str, ...] | None = None
    #: DelimitedPayloadTokenFilter analog (analysis/payloads/
    #: DelimitedPayloadTokenFilter.java + FloatEncoder): tokenize on
    #: WHITESPACE (the filter's canonical pairing), split each word at the
    #: LAST occurrence of this delimiter, attach the float suffix as the
    #: token's payload (words without a parseable suffix carry no payload).
    #: Mutually exclusive with the structural/word_delimiter paths.
    delimited_payload: str | None = None
    #: KeepWordFilter (analysis/miscellaneous/KeepWordFilter.java): when
    #: non-empty, DROP every token not in this set (the inverse stop filter;
    #: dropped tokens consume a position). Applied with the stop filter,
    #: after lowercase/folding.
    keep_words: frozenset[str] = frozenset()
    #: CommonGramsFilter (analysis/commongrams/CommonGramsFilter.java): emit
    #: a ``w1_w2`` bigram for every pair of CONSECUTIVE stream tokens where
    #: either side is a stopword, as a posIncr-0 overlap at the first word's
    #: position (GRAM_TYPE tokens, ``_`` separator — CommonGramsFilter.java
    #: SEPARATOR). The unigram stream (with stopwords removed) is unchanged,
    #: so phrase queries over stopword-adjacent pairs can ride the bigrams.
    #: Bigrams are built BEFORE stemming and stopword removal (the factory
    #: chain places CommonGramsFilter directly after the tokenizer).
    common_grams: bool = False
    #: Language normalization applied after the stop filter, BEFORE the
    #: stemmer and regardless of stem_exclusions (the reference chain
    #: order: SetKeywordMarkerFilter → GermanNormalizationFilter →
    #: GermanLightStemFilter — the normalizer does not consult the keyword
    #: attribute). Value: "german" (de/GermanNormalizationFilter.java).
    normalization: str | None = None
    #: ElisionFilter (util/ElisionFilter.java with FrenchAnalyzer.
    #: DEFAULT_ARTICLES): strip a leading elided article from tokens that
    #: carry an apostrophe. The engine's tokenizers split at apostrophes,
    #: so with the default tokenizer the article fragments are separate
    #: tokens handled by the stopword list instead (see analysis/lang.py).
    elision: bool = False
    #: article set for the elision filter; empty = FrenchAnalyzer.
    #: DEFAULT_ARTICLES (ItalianAnalyzer passes its own list)
    elision_articles: tuple[str, ...] = ()
    #: DictionaryCompoundWordTokenFilter (analysis/compound/
    #: DictionaryCompoundWordTokenFilter.java + CompoundWordTokenFilterBase
    #: .java:90-112): (words, min_word, min_subword, max_subword,
    #: only_longest). Each kept token of length >= min_word scans every
    #: start offset for dictionary subwords of length min_sub..max_sub;
    #: matches are ADDED as posIncr-0 overlaps after the original token
    #: (defaults 5/2/15/False). Applied to the post-stop kept stream.
    dictionary_compound: tuple | None = None
    #: language-specific lowercasing applied to the raw TEXT before
    #: tokenization (idempotent — the per-token lowercase is a no-op on the
    #: result). "turkish" = TurkishLowerCaseFilter (tr/TurkishLowerCase
    #: Filter.java: I→ı, İ/I+0307→i); "greek" = GreekLowerCaseFilter
    #: (el/GreekLowerCaseFilter.java: lowercase + Greek diacritic/variant
    #: folds, final sigma ς→σ). Offsets refer to the folded text.
    lowercase_mode: str | None = None
    #: CJKBigramFilter (analysis/cjk/CJKBigramFilter.java, default flags
    #: HAN|HIRAGANA|KATAKANA|HANGUL, outputUnigrams=false): contiguous CJK
    #: codepoints form bigrams (lone codepoints stay unigrams), non-CJK
    #: tokens pass through; the stop filter applies to the bigrammed stream
    #: (CJKAnalyzer.createComponents chain order). Requires
    #: unicode_segmentation (the tokenizer must emit the CJK word classes).
    cjk_bigram: bool = False
    #: CJKWidthFilter (analysis/cjk/CJKWidthFilter.java): fold fullwidth
    #: ASCII to basic Latin and halfwidth Katakana to Kana (voiced-mark
    #: composition included), applied to the raw text before tokenization
    #: (see analysis/cjkfilter.py for the documented divergence).
    cjk_width: bool = False
    #: CharFilter chain, applied to the raw string BEFORE tokenization
    #: (analysis/CharFilter.java; factories in analysis/charfilter/). Entries:
    #: ("html_strip",) — HTMLStripCharFilter analog (script/style/comment
    #: blocks and tags become spaces, core entities decoded; a documented
    #: regex-chain subset of the reference's state machine);
    #: ("pattern_replace", pattern, repl) — PatternReplaceCharFilter;
    #: ("mapping", ((src, dst), ...)) — MappingCharFilter (literal pairs).
    #: Offsets downstream refer to the FILTERED text (no offset-correction
    #: map — highlight over char-filtered fields is unsupported).
    char_filters: tuple[tuple, ...] = ()

    @property
    def structural(self) -> bool:
        """Filters that change the token-stream shape (need expansion)."""
        return (
            bool(self.synonyms)
            or self.shingle is not None
            or self.edge_ngrams is not None
            or self.ngrams is not None
            or self.reverse_overlap
            or self.dictionary_compound is not None
        )


#: HTMLStripCharFilter as an ordered (RE2-compatible pattern, replacement)
#: chain — identical semantics in Python re, Arrow replace_substring_regex,
#: and DuckDB regexp_replace. Tags become spaces (token-boundary-preserving);
#: &amp; decodes LAST so entity text can't double-decode.
HTML_STRIP_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&apos;", "'"),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
)


def char_filter_rules(char_filters: tuple[tuple, ...]) -> list[tuple[str, str, bool]]:
    """Normalize a char_filters config into ordered
    (pattern_or_literal, replacement, is_regex) rules."""
    rules: list[tuple[str, str, bool]] = []
    for cf in char_filters:
        kind = cf[0]
        if kind == "html_strip":
            rules.extend((p, r, True) for p, r in HTML_STRIP_RULES)
        elif kind == "pattern_replace":
            rules.append((cf[1], cf[2], True))
        elif kind == "mapping":
            rules.extend((src, dst, False) for src, dst in cf[1])
        else:
            raise ValueError(f"unknown char filter: {kind!r}")
    return rules


def apply_char_filters(text: str, char_filters: tuple[tuple, ...]) -> str:
    for pat, repl, is_re in char_filter_rules(char_filters):
        text = re.sub(pat, repl, text) if is_re else text.replace(pat, repl)
    return text


def EnglishAnalyzer(**kw) -> StandardAnalyzer:
    """EnglishAnalyzer preset: StandardAnalyzer chain + PorterStemFilter
    (``analysis/common/.../en/EnglishAnalyzer.java:110-119``)."""
    return StandardAnalyzer(stem="porter", **kw)


def GermanAnalyzer(**kw) -> StandardAnalyzer:
    """GermanAnalyzer preset (``analysis/common/.../de/GermanAnalyzer.java:
    133-139``): lowercase → stop(German) → [keyword marker] →
    GermanNormalizationFilter → GermanLightStemFilter."""
    from .lang import GERMAN_STOP_WORDS

    kw.setdefault("stopwords", GERMAN_STOP_WORDS)
    return StandardAnalyzer(stem="german_light", normalization="german", **kw)


def SpanishAnalyzer(**kw) -> StandardAnalyzer:
    """SpanishAnalyzer preset (``analysis/common/.../es/SpanishAnalyzer.java:
    117-124``): lowercase → stop(Spanish) → [keyword marker] →
    SpanishLightStemFilter."""
    from .lang import SPANISH_STOP_WORDS

    kw.setdefault("stopwords", SPANISH_STOP_WORDS)
    return StandardAnalyzer(stem="spanish_light", **kw)


def ItalianAnalyzer(**kw) -> StandardAnalyzer:
    """ItalianAnalyzer preset (``analysis/common/.../it/ItalianAnalyzer.java:
    126-134``): elision(Italian articles) → lowercase → stop(Italian) →
    [keyword marker] → ItalianLightStemFilter."""
    from .lang import ITALIAN_ARTICLES, ITALIAN_STOP_WORDS

    kw.setdefault("stopwords", ITALIAN_STOP_WORDS)
    kw.setdefault("elision_articles", tuple(sorted(ITALIAN_ARTICLES)))
    return StandardAnalyzer(stem="italian_light", elision=True, **kw)


def PortugueseAnalyzer(**kw) -> StandardAnalyzer:
    """PortugueseAnalyzer preset (``analysis/common/.../pt/
    PortugueseAnalyzer.java:117-124``): lowercase → stop(Portuguese) →
    [keyword marker] → PortugueseLightStemFilter."""
    from .lang import PORTUGUESE_STOP_WORDS

    kw.setdefault("stopwords", PORTUGUESE_STOP_WORDS)
    return StandardAnalyzer(stem="portuguese_light", **kw)


def SwedishAnalyzer(**kw) -> StandardAnalyzer:
    """SwedishAnalyzer preset (``analysis/common/.../sv/SwedishAnalyzer.
    java``): lowercase → stop(Swedish) → [keyword marker] → light stem.
    The reference default chain ends in SnowballFilter(SwedishStemmer);
    this preset uses Solr's SwedishLightStemFilterFactory variant
    (``sv/SwedishLightStemFilter.java``), the family implemented across
    these packs."""
    from .lang import SWEDISH_STOP_WORDS

    kw.setdefault("stopwords", SWEDISH_STOP_WORDS)
    return StandardAnalyzer(stem="swedish_light", **kw)


def HungarianAnalyzer(**kw) -> StandardAnalyzer:
    """HungarianAnalyzer preset (``analysis/common/.../hu/HungarianAnalyzer.
    java``): lowercase → stop(Hungarian) → [keyword marker] → light stem
    (Solr's HungarianLightStemFilterFactory variant)."""
    from .lang import HUNGARIAN_STOP_WORDS

    kw.setdefault("stopwords", HUNGARIAN_STOP_WORDS)
    return StandardAnalyzer(stem="hungarian_light", **kw)


def FinnishAnalyzer(**kw) -> StandardAnalyzer:
    """FinnishAnalyzer preset (``analysis/common/.../fi/FinnishAnalyzer.
    java``): lowercase → stop(Finnish) → [keyword marker] → light stem
    (Solr's FinnishLightStemFilterFactory variant)."""
    from .lang import FINNISH_STOP_WORDS

    kw.setdefault("stopwords", FINNISH_STOP_WORDS)
    return StandardAnalyzer(stem="finnish_light", **kw)


def RussianAnalyzer(**kw) -> StandardAnalyzer:
    """RussianAnalyzer preset (``analysis/common/.../ru/RussianAnalyzer.
    java:99-107``): lowercase → stop(Russian) → [keyword marker] → light
    stem (Solr's RussianLightStemFilterFactory variant; the stemmer is
    Cyrillic-only and golden-tested against rulighttestdata.zip)."""
    from .lang import RUSSIAN_STOP_WORDS

    kw.setdefault("stopwords", RUSSIAN_STOP_WORDS)
    return StandardAnalyzer(stem="russian_light", **kw)


def EnglishSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """EnglishAnalyzer chain with SnowballFilter(EnglishStemmer) — the
    Porter2 configuration Solr exposes as SnowballPorterFilterFactory
    language=English (``analysis/snowball/SnowballPorterFilterFactory.
    java``); `EnglishAnalyzer` keeps the reference default classic
    PorterStemFilter. Stemmer vocab-exact (29,417 entries)."""
    return StandardAnalyzer(stem="porter2", **kw)


def SwedishSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """The reference SwedishAnalyzer's DEFAULT chain (``sv/SwedishAnalyzer.
    java:118-126``: lowercase → stop(snowball Swedish) → [keyword marker]
    → SnowballFilter(SwedishStemmer)); the `SwedishAnalyzer` preset keeps
    the Solr light-stem variant. Stemmer vocab-exact (30,623 entries)."""
    from .lang import SWEDISH_STOP_WORDS

    kw.setdefault("stopwords", SWEDISH_STOP_WORDS)
    return StandardAnalyzer(stem="swedish_snowball", **kw)


def NorwegianSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """The reference NorwegianAnalyzer's DEFAULT chain (``no/
    NorwegianAnalyzer.java:110-118``: SnowballFilter(NorwegianStemmer));
    the `NorwegianAnalyzer` preset keeps the Solr light-stem variant.
    Stemmer vocab-exact (20,628 entries)."""
    from .lang import NORWEGIAN_STOP_WORDS

    kw.setdefault("stopwords", NORWEGIAN_STOP_WORDS)
    return StandardAnalyzer(stem="norwegian_snowball", **kw)


def RussianSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """The reference RussianAnalyzer's DEFAULT chain (``ru/RussianAnalyzer.
    java:99-107``: SnowballFilter(RussianStemmer)); the `RussianAnalyzer`
    preset keeps the Solr light-stem variant. Stemmer vocab-exact
    (49,673 entries)."""
    from .lang import RUSSIAN_STOP_WORDS

    kw.setdefault("stopwords", RUSSIAN_STOP_WORDS)
    return StandardAnalyzer(stem="russian_snowball", **kw)


def FinnishSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """The reference FinnishAnalyzer's DEFAULT chain (``fi/FinnishAnalyzer.
    java:111-119``: SnowballFilter(FinnishStemmer)); the `FinnishAnalyzer`
    preset keeps the Solr light-stem variant. Stemmer vocab-exact
    (50,000 entries)."""
    from .lang import FINNISH_STOP_WORDS

    kw.setdefault("stopwords", FINNISH_STOP_WORDS)
    return StandardAnalyzer(stem="finnish_snowball", **kw)


def HungarianSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """The reference HungarianAnalyzer's DEFAULT chain (``hu/
    HungarianAnalyzer.java:110-118``: SnowballFilter(HungarianStemmer));
    the `HungarianAnalyzer` preset keeps the Solr light-stem variant.
    Stemmer vocab-exact (30,000 entries)."""
    from .lang import HUNGARIAN_STOP_WORDS

    kw.setdefault("stopwords", HUNGARIAN_STOP_WORDS)
    return StandardAnalyzer(stem="hungarian_snowball", **kw)


def GermanSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """Snowball German chain as configured by SnowballPorterFilterFactory
    language=German (``analysis/snowball/SnowballPorterFilterFactory.
    java``; stemmer ``org/tartarus/snowball/ext/GermanStemmer.java``) with
    the snowball german stop list — the `GermanAnalyzer` preset keeps the
    reference default light-stem chain. Stemmer vocab-exact (35,033)."""
    from .lang import GERMAN_STOP_WORDS

    kw.setdefault("stopwords", GERMAN_STOP_WORDS)
    return StandardAnalyzer(stem="german_snowball", **kw)


def German2SnowballAnalyzer(**kw) -> StandardAnalyzer:
    """Snowball German2 variant (language=German2; ``org/tartarus/
    snowball/ext/German2Stemmer.java`` — folds ae/oe/ue digraphs to
    umlauts in the prelude). Stemmer vocab-exact (35,033)."""
    from .lang import GERMAN_STOP_WORDS

    kw.setdefault("stopwords", GERMAN_STOP_WORDS)
    return StandardAnalyzer(stem="german2", **kw)


def SpanishSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """Snowball Spanish chain (language=Spanish; ``org/tartarus/snowball/
    ext/SpanishStemmer.java``) — the `SpanishAnalyzer` preset keeps the
    reference default light-stem chain. Stemmer vocab-exact (28,377)."""
    from .lang import SPANISH_STOP_WORDS

    kw.setdefault("stopwords", SPANISH_STOP_WORDS)
    return StandardAnalyzer(stem="spanish_snowball", **kw)


def PortugueseSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """Snowball Portuguese chain (language=Portuguese; ``org/tartarus/
    snowball/ext/PortugueseStemmer.java``) — distinct from the light /
    minimal / RSLP Portuguese presets. Stemmer vocab-exact (32,016)."""
    from .lang import PORTUGUESE_STOP_WORDS

    kw.setdefault("stopwords", PORTUGUESE_STOP_WORDS)
    return StandardAnalyzer(stem="portuguese_snowball", **kw)


def ItalianSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """Snowball Italian chain (language=Italian; ``org/tartarus/snowball/
    ext/ItalianStemmer.java``) — the `ItalianAnalyzer` preset keeps the
    reference default elision + light-stem chain. Stemmer vocab-exact
    (35,494)."""
    from .lang import ITALIAN_STOP_WORDS

    kw.setdefault("stopwords", ITALIAN_STOP_WORDS)
    return StandardAnalyzer(stem="italian_snowball", **kw)


def DanishAnalyzer(**kw) -> StandardAnalyzer:
    """DanishAnalyzer preset (``analysis/common/.../da/DanishAnalyzer.java:
    118-126``): lowercase → stop(snowball Danish) → [keyword marker] →
    SnowballFilter(DanishStemmer) — the stemmer is vocab-exact
    (23,829 entries, tests/test_snowball.py)."""
    from .snowball import DANISH_STOP_WORDS

    kw.setdefault("stopwords", DANISH_STOP_WORDS)
    return StandardAnalyzer(stem="danish", **kw)


def DutchAnalyzer(**kw) -> StandardAnalyzer:
    """DutchAnalyzer preset (``analysis/common/.../nl/DutchAnalyzer.java:
    150-160``): lowercase → stop(snowball Dutch) → StemmerOverride(default
    dict) → [keyword marker] → SnowballFilter(DutchStemmer) — vocab-exact
    (45,669 entries)."""
    from .snowball import DUTCH_STOP_WORDS

    kw.setdefault("stopwords", DUTCH_STOP_WORDS)
    return StandardAnalyzer(stem="dutch", **kw)


def RomanianAnalyzer(**kw) -> StandardAnalyzer:
    """RomanianAnalyzer preset (``analysis/common/.../ro/RomanianAnalyzer.
    java:120-127``): lowercase → stop(Savoy Romanian) → [keyword marker] →
    SnowballFilter(RomanianStemmer) — vocab-exact (22,570 entries)."""
    from .snowball import ROMANIAN_STOP_WORDS

    kw.setdefault("stopwords", ROMANIAN_STOP_WORDS)
    return StandardAnalyzer(stem="romanian", **kw)


def ArabicAnalyzer(**kw) -> StandardAnalyzer:
    """ArabicAnalyzer preset (``analysis/common/.../ar/ArabicAnalyzer.java:
    134-146``): lowercase → stop(Arabic, UNnormalized list — the
    reference's chain order, which this engine's normalization slot
    matches exactly) → ArabicNormalizationFilter → [keyword marker] →
    ArabicStemFilter (light10)."""
    from .lang import ARABIC_STOP_WORDS

    kw.setdefault("stopwords", ARABIC_STOP_WORDS)
    kw.setdefault("unicode_segmentation", True)  # harakat are Extend chars
    return StandardAnalyzer(stem="arabic", normalization="arabic", **kw)


def SoraniAnalyzer(**kw) -> StandardAnalyzer:
    """SoraniAnalyzer preset (``analysis/common/.../ckb/SoraniAnalyzer.
    java``): SoraniNormalizationFilter → lowercase → stop(Sorani) →
    [keyword marker] → SoraniStemFilter. Normalizer and stemmer are
    golden-tested against ckbtestdata.zip (Arabic-script, RTL).

    Documented divergence: the reference normalizes BEFORE the stop
    filter; this engine's normalization slot runs after it, so a token
    whose raw spelling differs from the (already-normalized) stopword
    list entry survives here. The stopword list ships normalized, so
    normalized-spelling text behaves identically."""
    from .lang import SORANI_STOP_WORDS

    kw.setdefault("stopwords", SORANI_STOP_WORDS)
    kw.setdefault("unicode_segmentation", True)  # harakat are Extend chars
    return StandardAnalyzer(stem="sorani", normalization="sorani", **kw)


def GalicianAnalyzer(**kw) -> StandardAnalyzer:
    """GalicianAnalyzer preset (``analysis/common/.../gl/GalicianAnalyzer.
    java``): lowercase → stop(Galician) → [keyword marker] →
    GalicianStemFilter (full RSLG, bit-exact vs the 9,416-entry
    gltestdata vocabulary)."""
    from .lang2 import GALICIAN_STOP_WORDS

    kw.setdefault("stopwords", GALICIAN_STOP_WORDS)
    return StandardAnalyzer(stem="galician", **kw)


def GreekAnalyzer(**kw) -> StandardAnalyzer:
    """GreekAnalyzer preset (``analysis/common/.../el/GreekAnalyzer.java``):
    GreekLowerCaseFilter (diacritic folds + final sigma) → stop(Greek,
    ships folded) → GreekStemFilter (Ntais stemmer, golden-tested against
    all 343 TestGreekStemmer pairs)."""
    from .lang2 import GREEK_STOP_WORDS

    kw.setdefault("stopwords", GREEK_STOP_WORDS)
    return StandardAnalyzer(lowercase_mode="greek", stem="greek", **kw)


def HindiAnalyzer(**kw) -> StandardAnalyzer:
    """HindiAnalyzer preset (``analysis/common/.../hi/HindiAnalyzer.java:
    118-128``): lowercase → DecimalDigit → [keyword marker] →
    HindiNormalization → stop(Hindi) → HindiStemFilter. The generic
    IndicNormalizer decomposition pass is skipped (documented); the stop
    filter here runs before normalization (the engine's slot order, same
    documented divergence as SoraniAnalyzer — the list ships in surface
    form the tokenizer produces)."""
    from .lang2 import HINDI_STOP_WORDS

    kw.setdefault("stopwords", HINDI_STOP_WORDS)
    kw.setdefault("unicode_segmentation", True)  # matras are Extend chars
    return StandardAnalyzer(stem="hindi", normalization="hindi", **kw)


def BulgarianAnalyzer(**kw) -> StandardAnalyzer:
    """BulgarianAnalyzer preset (``analysis/common/.../bg/BulgarianAnalyzer.
    java:120-128``): lowercase → stop(Bulgarian) → [keyword marker] →
    BulgarianStemFilter (Savoy light stemmer)."""
    from .lang2 import BULGARIAN_STOP_WORDS

    kw.setdefault("stopwords", BULGARIAN_STOP_WORDS)
    return StandardAnalyzer(stem="bulgarian", **kw)


def PersianAnalyzer(**kw) -> StandardAnalyzer:
    """PersianAnalyzer preset (``analysis/common/.../fa/PersianAnalyzer.
    java:108-131``): PersianCharFilter (ZWNJ → space) → lowercase →
    DecimalDigit → ArabicNormalization → PersianNormalization →
    stop(Persian, ships normalized). No stemmer — the reference relies on
    normalization + stopwords alone."""
    from .lang2 import PERSIAN_STOP_WORDS

    kw.setdefault("stopwords", PERSIAN_STOP_WORDS)
    kw.setdefault("char_filters", (("mapping", (("‌", " "),)),))
    kw.setdefault("unicode_segmentation", True)  # harakat are Extend chars
    return StandardAnalyzer(normalization="persian", **kw)


def TurkishAnalyzer(**kw) -> StandardAnalyzer:
    """TurkishAnalyzer preset (``analysis/common/.../tr/TurkishAnalyzer.
    java:119-129``): ApostropheFilter → TurkishLowerCaseFilter →
    stop(Turkish) → [keyword marker] → SnowballFilter(TurkishStemmer).
    The apostrophe truncation runs as a char filter (the engine's \\w+
    tokenizer would otherwise split at the apostrophe instead of
    truncating); the stemmer is the vocab-exact transcription in
    :func:`lucene_solr_ray.analysis.snowball.turkish_snowball_stem`."""
    from .lang2 import TURKISH_STOP_WORDS

    kw.setdefault("stopwords", TURKISH_STOP_WORDS)
    kw.setdefault(
        "char_filters",
        (("pattern_replace", r"['’][\w'’]*", " "),),
    )
    kw.setdefault("stem", "turkish_snowball")
    return StandardAnalyzer(lowercase_mode="turkish", **kw)


def CatalanAnalyzer(**kw) -> StandardAnalyzer:
    """CatalanAnalyzer preset (``analysis/common/.../ca/CatalanAnalyzer.
    java:123-131``): elision(d l m n s t) → lowercase → stop(Catalan) →
    [keyword marker] → SnowballFilter(CatalanStemmer)."""
    from .lang3 import CATALAN_STOP_WORDS

    # the \w+ tokenizer splits "l'Institut" at the apostrophe (the
    # reference's UAX#29 keeps it as one token for the ElisionFilter), so
    # the detached article tokens are folded into the stop set — same
    # surviving terms, like the FrenchAnalyzer preset
    kw.setdefault(
        "stopwords",
        CATALAN_STOP_WORDS | frozenset(("d", "l", "m", "n", "s", "t")))
    kw.setdefault("elision_articles", ("d", "l", "m", "n", "s", "t"))
    return StandardAnalyzer(stem="catalan", elision=True, **kw)


def BasqueAnalyzer(**kw) -> StandardAnalyzer:
    """BasqueAnalyzer preset (``analysis/common/.../eu/BasqueAnalyzer.
    java:115-122``): lowercase → stop(Basque) → [keyword marker] →
    SnowballFilter(BasqueStemmer)."""
    from .lang3 import BASQUE_STOP_WORDS

    kw.setdefault("stopwords", BASQUE_STOP_WORDS)
    return StandardAnalyzer(stem="basque", **kw)


def IrishAnalyzer(**kw) -> StandardAnalyzer:
    """IrishAnalyzer preset (``analysis/common/.../ga/IrishAnalyzer.
    java:133-142``): stop(h n t hyphenation artifacts) → elision(d m b) →
    IrishLowerCaseFilter → stop(Irish) → [keyword marker] →
    SnowballFilter(IrishStemmer). The pre-lowercase hyphenation stop set
    is folded into the main stop list — single-letter h/n/t tokens pass
    through elision and the Irish lowercase unchanged, so the fold is
    order-equivalent for the \\w+ tokenizer."""
    from .lang3 import IRISH_STOP_WORDS

    kw.setdefault(
        "stopwords",
        IRISH_STOP_WORDS | frozenset(("h", "n", "t", "b", "d", "m")))
    kw.setdefault("elision_articles", ("b", "d", "m"))
    return StandardAnalyzer(
        stem="irish", elision=True, lowercase_mode="irish", **kw)


def ArmenianAnalyzer(**kw) -> StandardAnalyzer:
    """ArmenianAnalyzer preset (``analysis/common/.../hy/ArmenianAnalyzer.
    java:115-122``): lowercase → stop(Armenian) → [keyword marker] →
    SnowballFilter(ArmenianStemmer)."""
    from .lang3 import ARMENIAN_STOP_WORDS

    kw.setdefault("stopwords", ARMENIAN_STOP_WORDS)
    return StandardAnalyzer(stem="armenian", **kw)


def LithuanianAnalyzer(**kw) -> StandardAnalyzer:
    """LithuanianAnalyzer preset (``analysis/common/.../lt/
    LithuanianAnalyzer.java:115-122``): lowercase → stop(Lithuanian) →
    [keyword marker] → SnowballFilter(LithuanianStemmer)."""
    from .lang3 import LITHUANIAN_STOP_WORDS

    kw.setdefault("stopwords", LITHUANIAN_STOP_WORDS)
    return StandardAnalyzer(stem="lithuanian", **kw)


def PolishAnalyzer(**kw) -> StandardAnalyzer:
    """PolishAnalyzer preset (``analysis/stempel/.../pl/PolishAnalyzer.
    java:141-147``): lowercase → stop(Polish) → [keyword marker] →
    StempelFilter(stemmer_20000.tbl). The Egothor trie table is the
    reference's own trained resource, embedded under analysis/data/."""
    from .lang3 import POLISH_STOP_WORDS

    kw.setdefault("stopwords", POLISH_STOP_WORDS)
    return StandardAnalyzer(stem="polish_stempel", **kw)


def LatvianAnalyzer(**kw) -> StandardAnalyzer:
    """LatvianAnalyzer preset (``analysis/common/.../lv/LatvianAnalyzer.
    java:116-124``): lowercase → stop(Latvian) → [keyword marker] →
    LatvianStemFilter."""
    from .lang2 import LATVIAN_STOP_WORDS

    kw.setdefault("stopwords", LATVIAN_STOP_WORDS)
    return StandardAnalyzer(stem="latvian", **kw)


def BengaliAnalyzer(**kw) -> StandardAnalyzer:
    """BengaliAnalyzer preset (``analysis/common/.../bn/BengaliAnalyzer.
    java``): lowercase → DecimalDigit → [keyword marker] →
    BengaliNormalization → stop(Bengali) → BengaliStemFilter
    (IndicNormalizer pass skipped; stop-before-normalization divergence
    documented as in HindiAnalyzer)."""
    from .lang2 import BENGALI_STOP_WORDS

    kw.setdefault("stopwords", BENGALI_STOP_WORDS)
    kw.setdefault("unicode_segmentation", True)  # kars are Extend chars
    return StandardAnalyzer(stem="bengali", normalization="bengali", **kw)


def NorwegianAnalyzer(**kw) -> StandardAnalyzer:
    """NorwegianAnalyzer preset (``analysis/common/.../no/NorwegianAnalyzer.
    java:118-126``): lowercase → stop(Norwegian) → [keyword marker] → stem.
    The reference default chain ends in SnowballFilter(NorwegianStemmer);
    this preset uses the NorwegianLightStemFilter variant
    (``no/NorwegianLightStemmer.java``, default BOKMAAL flags), the family
    implemented across these packs."""
    from .lang import NORWEGIAN_STOP_WORDS

    kw.setdefault("stopwords", NORWEGIAN_STOP_WORDS)
    return StandardAnalyzer(stem="norwegian_light", **kw)


def CzechAnalyzer(**kw) -> StandardAnalyzer:
    """CzechAnalyzer preset (``analysis/common/.../cz/CzechAnalyzer.java:
    120-128``): lowercase → stop(Czech) → [keyword marker] →
    CzechStemFilter (Savoy light stemmer)."""
    from .lang import CZECH_STOP_WORDS

    kw.setdefault("stopwords", CZECH_STOP_WORDS)
    return StandardAnalyzer(stem="czech", **kw)


def IndonesianAnalyzer(**kw) -> StandardAnalyzer:
    """IndonesianAnalyzer preset (``analysis/common/.../id/
    IndonesianAnalyzer.java:113-121``): lowercase → stop(Indonesian) →
    [keyword marker] → IndonesianStemFilter (full derivational
    stemming)."""
    from .lang import INDONESIAN_STOP_WORDS

    kw.setdefault("stopwords", INDONESIAN_STOP_WORDS)
    return StandardAnalyzer(stem="indonesian", **kw)


def CJKAnalyzer(**kw) -> StandardAnalyzer:
    """CJKAnalyzer preset (``analysis/cjk/CJKAnalyzer.java:87-95``):
    StandardTokenizer → CJKWidthFilter → lowercase → CJKBigramFilter →
    stop(English + s/t/www). Han/Hiragana/Katakana/Hangul text is indexed
    as overlapping character bigrams; everything else passes through the
    standard chain."""
    from .cjkfilter import CJK_STOP_WORDS

    kw.setdefault("stopwords", CJK_STOP_WORDS)
    return StandardAnalyzer(
        unicode_segmentation=True, cjk_bigram=True, cjk_width=True, **kw
    )


def FrenchAnalyzer(**kw) -> StandardAnalyzer:
    """FrenchAnalyzer preset (``analysis/common/.../fr/FrenchAnalyzer.java:
    137-144``): elision(articles) → lowercase → stop(French) →
    [keyword marker] → FrenchLightStemFilter."""
    from .lang import FRENCH_STOP_WORDS

    kw.setdefault("stopwords", FRENCH_STOP_WORDS)
    return StandardAnalyzer(stem="french_light", elision=True, **kw)


def FrenchSnowballAnalyzer(**kw) -> StandardAnalyzer:
    """Snowball French chain (language=French; ``org/tartarus/snowball/
    ext/FrenchStemmer.java`` via SnowballPorterFilterFactory) — elision +
    stop like `FrenchAnalyzer` but with the full Snowball stemmer instead
    of the light variant. Stemmer vocab-exact (20,403 entries)."""
    from .lang import FRENCH_STOP_WORDS

    kw.setdefault("stopwords", FRENCH_STOP_WORDS)
    return StandardAnalyzer(stem="french_snowball", elision=True, **kw)


_HUNSPELL_CACHE: dict = {}


def _hunspell_cached(aff: str, dic: str, ignore_case: bool):
    """Parse-once-per-process cache for Hunspell token functions (the
    analyzer carries the raw .aff/.dic text; workers build the dictionary
    on first use)."""
    key = (aff, dic if isinstance(dic, str) else tuple(dic), ignore_case)
    fn = _HUNSPELL_CACHE.get(key)
    if fn is None:
        from .hunspell import hunspell_token_fn

        fn = hunspell_token_fn(aff, dic, ignore_case, longest_only=True)
        _HUNSPELL_CACHE[key] = fn
    return fn


def _fold_ascii(term: str) -> str:
    """NFD-decompose and drop combining marks (Mn) — ASCIIFoldingFilter's
    Latin-accent core, chosen to equal DuckDB ``strip_accents`` exactly."""
    import unicodedata

    if term.isascii():
        return term
    return "".join(
        c for c in unicodedata.normalize("NFD", term) if not unicodedata.combining(c)
    )


def _build_icu_name_fold() -> dict:
    # Latin letters whose diacritic is baked in (stroke/slash/bar/hook —
    # no NFKD decomposition): fold to the base letter, per UTR#30's
    # DiacriticFolding; plus the explicit ligature/special rows
    import re
    import unicodedata

    table = {}
    for cp in list(range(0x80, 0x250)) + list(range(0x1E00, 0x1F00)):
        ch = chr(cp)
        try:
            name = unicodedata.name(ch)
        except ValueError:
            continue
        m = re.match(r"LATIN (?:SMALL|CAPITAL) LETTER ([A-Z]) WITH ", name)
        if m and not unicodedata.decomposition(ch):
            table[ch] = m.group(1).lower()
    table.update({"æ": "ae", "œ": "oe", "ð": "d", "ı": "i"})
    return table


_ICU_NAME_FOLD: dict | None = None


def _fold_icu(term: str) -> str:
    """ICUFoldingFilter approximation (``lucene/analysis/icu/.../
    ICUFoldingFilter.java``, UTR#30 utr30.dat): full case folding → NFKD →
    drop combining marks (Mn) and default ignorables (Cf) → fold decimal
    digits to ASCII → fold stroke/slash Latin letters and ligatures →
    NFKC recompose. Matches every TestICUFoldingFilter golden
    (tests/test_icu_folding.py); the binary utr30.dat table itself is not
    shipped in this sandbox, so rare non-Latin one-off foldings may
    differ — documented approximation."""
    global _ICU_NAME_FOLD
    import unicodedata

    if _ICU_NAME_FOLD is None:
        _ICU_NAME_FOLD = _build_icu_name_fold()
    s = unicodedata.normalize("NFKD", term.casefold())
    out = []
    for ch in s:
        cat = unicodedata.category(ch)
        if cat in ("Mn", "Cf"):
            continue
        if cat == "Nd":
            out.append(str(unicodedata.digit(ch)))
            continue
        out.append(_ICU_NAME_FOLD.get(ch, ch))
    return unicodedata.normalize("NFKC", "".join(out))


def _phonetic_codes_fn(analyzer: "StandardAnalyzer"):
    """Multi-code phonetic encoders (PhoneticFilter inject semantics): per
    token → code list; the FIRST code replaces the token, the rest overlay
    at the same position. Tokens that encode to nothing pass through."""
    if analyzer.phonetic == "double_metaphone":
        from .dmetaphone import double_metaphone

        def dm(t: str) -> list[str]:
            pri, alt = double_metaphone(t)
            if not pri:
                return [t]
            return [pri] if alt == pri else [pri, alt]

        return dm
    if analyzer.keyword_repeat:
        if analyzer.stem != "porter":
            raise ValueError("keyword_repeat requires stem='porter'")
        if analyzer.phonetic is not None:
            raise ValueError("keyword_repeat cannot combine with phonetic")
        from .porter import porter_stem

        excl = analyzer.stem_exclusions

        def kr(t: str) -> list[str]:
            st = t if t in excl else porter_stem(t)
            return [t] if st == t else [t, st]

        return kr
    if analyzer.phonetic == "dm_soundex":
        from .dmsoundex import dm_soundex

        def dms(t: str) -> list[str]:
            return dm_soundex(t) or [t]

        return dms
    return None


def _term_mapper(analyzer: "StandardAnalyzer"):
    """Post-stopword per-term map (stemming), or None. Applied per unique
    vocabulary entry, never per token."""
    mapper = None
    stem_fns = {}
    if analyzer.stem == "porter":
        from .porter import porter_stem
        stem_fns["porter"] = porter_stem
    elif analyzer.stem == "german_light":
        from .lang import german_light_stem
        stem_fns["german_light"] = german_light_stem
    elif analyzer.stem == "french_light":
        from .lang import french_light_stem
        stem_fns["french_light"] = french_light_stem
    elif analyzer.stem == "spanish_light":
        from .lang import spanish_light_stem
        stem_fns["spanish_light"] = spanish_light_stem
    elif analyzer.stem == "italian_light":
        from .lang import italian_light_stem
        stem_fns["italian_light"] = italian_light_stem
    elif analyzer.stem == "portuguese_light":
        from .lang import portuguese_light_stem
        stem_fns["portuguese_light"] = portuguese_light_stem
    elif analyzer.stem == "swedish_light":
        from .lang import swedish_light_stem
        stem_fns["swedish_light"] = swedish_light_stem
    elif analyzer.stem == "hungarian_light":
        from .lang import hungarian_light_stem
        stem_fns["hungarian_light"] = hungarian_light_stem
    elif analyzer.stem == "finnish_light":
        from .lang import finnish_light_stem
        stem_fns["finnish_light"] = finnish_light_stem
    elif analyzer.stem == "russian_light":
        from .lang import russian_light_stem
        stem_fns["russian_light"] = russian_light_stem
    elif analyzer.stem == "german_minimal":
        from .lang import german_minimal_stem
        stem_fns["german_minimal"] = german_minimal_stem
    elif analyzer.stem == "french_minimal":
        from .lang import french_minimal_stem
        stem_fns["french_minimal"] = french_minimal_stem
    elif analyzer.stem == "norwegian_light":
        from .lang import norwegian_light_stem
        stem_fns["norwegian_light"] = norwegian_light_stem
    elif analyzer.stem == "norwegian_minimal":
        from .lang import norwegian_minimal_stem
        stem_fns["norwegian_minimal"] = norwegian_minimal_stem
    elif analyzer.stem == "czech":
        from .lang import czech_stem
        stem_fns["czech"] = czech_stem
    elif analyzer.stem == "indonesian":
        from .lang import indonesian_stem
        stem_fns["indonesian"] = indonesian_stem
    elif analyzer.stem == "english_minimal":
        from .lang import english_minimal_stem
        stem_fns["english_minimal"] = english_minimal_stem
    elif analyzer.stem == "hindi":
        from .lang2 import hindi_stem
        stem_fns["hindi"] = hindi_stem
    elif analyzer.stem == "bulgarian":
        from .lang2 import bulgarian_stem
        stem_fns["bulgarian"] = bulgarian_stem
    elif analyzer.stem == "latvian":
        from .lang2 import latvian_stem
        stem_fns["latvian"] = latvian_stem
    elif analyzer.stem == "bengali":
        from .lang2 import bengali_stem
        stem_fns["bengali"] = bengali_stem
    elif analyzer.stem == "greek":
        from .greek import greek_stem
        stem_fns["greek"] = greek_stem
    elif analyzer.stem == "galician":
        from .rslp import galician_stem
        stem_fns["galician"] = galician_stem
    elif analyzer.stem == "galician_minimal":
        from .rslp import galician_minimal_stem
        stem_fns["galician_minimal"] = galician_minimal_stem
    elif analyzer.stem == "portuguese_rslp":
        from .rslp import portuguese_rslp_stem
        stem_fns["portuguese_rslp"] = portuguese_rslp_stem
    elif analyzer.stem == "portuguese_minimal":
        from .rslp import portuguese_minimal_stem
        stem_fns["portuguese_minimal"] = portuguese_minimal_stem
    elif analyzer.stem == "sorani":
        from .lang import sorani_stem
        stem_fns["sorani"] = sorani_stem
    elif analyzer.stem == "arabic":
        from .lang import arabic_stem
        stem_fns["arabic"] = arabic_stem
    elif analyzer.stem == "danish":
        from .snowball import danish_stem
        stem_fns["danish"] = danish_stem
    elif analyzer.stem == "dutch":
        from .snowball import dutch_analyzer_stem
        stem_fns["dutch"] = dutch_analyzer_stem
    elif analyzer.stem == "romanian":
        from .snowball import romanian_stem
        stem_fns["romanian"] = romanian_stem
    elif analyzer.stem == "swedish_snowball":
        from .snowball import swedish_stem
        stem_fns["swedish_snowball"] = swedish_stem
    elif analyzer.stem == "norwegian_snowball":
        from .snowball import norwegian_stem
        stem_fns["norwegian_snowball"] = norwegian_stem
    elif analyzer.stem == "russian_snowball":
        from .snowball import russian_stem
        stem_fns["russian_snowball"] = russian_stem
    elif analyzer.stem == "porter2":
        from .snowball import porter2_stem
        stem_fns["porter2"] = porter2_stem
    elif analyzer.stem == "snowball_porter":
        from .snowball import snowball_porter_stem
        stem_fns["snowball_porter"] = snowball_porter_stem
    elif analyzer.stem == "turkish_snowball":
        from .snowball import turkish_snowball_stem
        stem_fns["turkish_snowball"] = turkish_snowball_stem
    elif analyzer.stem == "arabic_snowball":
        from .snowball import arabic_snowball_stem
        stem_fns["arabic_snowball"] = arabic_snowball_stem
    elif analyzer.stem == "lovins":
        from .snowball import lovins_stem
        stem_fns["lovins"] = lovins_stem
    elif analyzer.stem == "kraaij_pohlmann":
        from .snowball import kraaij_pohlmann_stem
        stem_fns["kraaij_pohlmann"] = kraaij_pohlmann_stem
    elif analyzer.stem == "lithuanian":
        from .snowball import lithuanian_stem
        stem_fns["lithuanian"] = lithuanian_stem
    elif analyzer.stem == "armenian":
        from .snowball import armenian_stem
        stem_fns["armenian"] = armenian_stem
    elif analyzer.stem == "catalan":
        from .snowball import catalan_stem
        stem_fns["catalan"] = catalan_stem
    elif analyzer.stem == "basque":
        from .snowball import basque_stem
        stem_fns["basque"] = basque_stem
    elif analyzer.stem == "irish":
        from .snowball import irish_stem
        stem_fns["irish"] = irish_stem
    elif analyzer.stem == "polish_stempel":
        from .stempel import polish_stem
        stem_fns["polish_stempel"] = polish_stem
    elif analyzer.stem == "finnish_snowball":
        from .snowball import finnish_snowball_stem
        stem_fns["finnish_snowball"] = finnish_snowball_stem
    elif analyzer.stem == "hungarian_snowball":
        from .snowball import hungarian_snowball_stem
        stem_fns["hungarian_snowball"] = hungarian_snowball_stem
    elif analyzer.stem == "german_snowball":
        from .snowball import german_snowball_stem
        stem_fns["german_snowball"] = german_snowball_stem
    elif analyzer.stem == "german2":
        from .snowball import german2_stem
        stem_fns["german2"] = german2_stem
    elif analyzer.stem == "spanish_snowball":
        from .snowball import spanish_snowball_stem
        stem_fns["spanish_snowball"] = spanish_snowball_stem
    elif analyzer.stem == "portuguese_snowball":
        from .snowball import portuguese_snowball_stem
        stem_fns["portuguese_snowball"] = portuguese_snowball_stem
    elif analyzer.stem == "italian_snowball":
        from .snowball import italian_snowball_stem
        stem_fns["italian_snowball"] = italian_snowball_stem
    elif analyzer.stem == "french_snowball":
        from .snowball import french_snowball_stem
        stem_fns["french_snowball"] = french_snowball_stem
    elif analyzer.stem is not None:
        raise ValueError(f"unknown stemmer: {analyzer.stem!r}")
    if analyzer.hunspell is not None and analyzer.stem is None:
        # HunspellStemFilter (longestOnly) as the chain's stemmer slot —
        # single-output destructive mode; the multi-stem injection mode is
        # available via analysis.hunspell.hunspell_token_fn
        aff, dic = analyzer.hunspell[0], analyzer.hunspell[1]
        ic = len(analyzer.hunspell) > 2 and analyzer.hunspell[2]
        hfn = _hunspell_cached(aff, dic, bool(ic))
        stem_fns["__hunspell__"] = lambda t: hfn(t)[0]
    if analyzer.stem is not None or analyzer.hunspell is not None:
        stem_fn = stem_fns[analyzer.stem
                           if analyzer.stem is not None
                           else "__hunspell__"]
        if analyzer.stem_exclusions:
            excl = analyzer.stem_exclusions
            mapper = lambda t: t if t in excl else stem_fn(t)  # noqa: E731
        else:
            mapper = stem_fn
    if analyzer.normalization is not None:
        # normalization applies to EVERY term (keyword marker protects only
        # the stemmer), before stemming
        if analyzer.normalization == "german":
            from .lang import german_normalize as norm_fn
        elif analyzer.normalization == "sorani":
            from .lang import sorani_normalize as norm_fn
        elif analyzer.normalization == "arabic":
            from .lang import arabic_normalize as norm_fn
        elif analyzer.normalization == "hindi":
            # HindiAnalyzer chain (hi/HindiAnalyzer.java:118-128):
            # DecimalDigitFilter → HindiNormalizationFilter (the generic
            # IndicNormalizer decomposition pass is documented as skipped)
            from .lang2 import decimal_digits, hindi_normalize

            def norm_fn(t):  # noqa: E306
                return hindi_normalize(decimal_digits(t))
        elif analyzer.normalization == "persian":
            # PersianAnalyzer chain (fa/PersianAnalyzer.java:117-131):
            # DecimalDigitFilter → ArabicNormalizationFilter →
            # PersianNormalizationFilter
            from .lang import arabic_normalize
            from .lang2 import decimal_digits, persian_normalize

            def norm_fn(t):  # noqa: E306
                return persian_normalize(arabic_normalize(decimal_digits(t)))
        elif analyzer.normalization == "serbian":
            from .lang2 import serbian_normalize as norm_fn
        elif analyzer.normalization == "serbian_regular":
            from .lang2 import serbian_normalize_regular as norm_fn
        elif analyzer.normalization == "bengali":
            # BengaliAnalyzer chain (bn/BengaliAnalyzer.java): DecimalDigit
            # → BengaliNormalizationFilter (IndicNormalizer pass skipped)
            from .lang2 import bengali_normalize, decimal_digits

            def norm_fn(t):  # noqa: E306
                return bengali_normalize(decimal_digits(t))
        else:
            raise ValueError(
                f"unknown normalization: {analyzer.normalization!r}")

        if mapper is None:
            mapper = norm_fn
        else:
            if analyzer.stem_exclusions:
                excl = analyzer.stem_exclusions
                stem_fn0 = stem_fns[analyzer.stem]
                mapper = lambda t: (lambda n: n if t in excl else stem_fn0(n))(  # noqa: E731
                    norm_fn(t))
            else:
                post = mapper
                mapper = lambda t: post(norm_fn(t))  # noqa: E731
    if analyzer.keyword_repeat:
        # the replace+inject codes path emits [original, stem]; the 1:1
        # stem mapper must not pre-stem the stream
        if analyzer.phonetic is not None:
            raise ValueError("keyword_repeat cannot combine with phonetic")
        return None
    _REPLACE_ENCODERS = None
    if analyzer.phonetic in ("soundex", "metaphone", "refined_soundex",
                             "caverphone", "nysiis", "cologne"):
        if analyzer.phonetic == "soundex":
            from .phonetic import soundex as _REPLACE_ENCODERS
        else:
            from . import phonetic2

            _REPLACE_ENCODERS = {
                "metaphone": phonetic2.metaphone,
                "refined_soundex": phonetic2.refined_soundex,
                "caverphone": phonetic2.caverphone2,
                "nysiis": phonetic2.nysiis,
                "cologne": phonetic2.cologne,
            }[analyzer.phonetic]
    if _REPLACE_ENCODERS is not None:
        enc = _REPLACE_ENCODERS
        if mapper is None:
            return enc
        stem_fn = mapper
        return lambda t: enc(stem_fn(t))
    if analyzer.phonetic is not None and analyzer.phonetic not in (
            "double_metaphone", "dm_soundex"):
        # multi-code encoders are handled as a replace+inject step AFTER the
        # 1:1 mapper; see _phonetic_codes_fn / _analyze_full / ArrowAnalyzer
        raise ValueError(f"unknown phonetic encoder: {analyzer.phonetic!r}")
    return mapper


def _lowercase_mode_fn(analyzer: "StandardAnalyzer"):
    """Text-level language-specific lowercase, or None for plain .lower()."""
    if analyzer.lowercase_mode is None:
        return None
    if analyzer.lowercase_mode == "turkish":
        from .lang2 import turkish_lower

        return turkish_lower
    if analyzer.lowercase_mode == "greek":
        from .greek import greek_lower

        return greek_lower
    if analyzer.lowercase_mode == "irish":
        from .lang3 import irish_lower

        return irish_lower
    raise ValueError(f"unknown lowercase_mode: {analyzer.lowercase_mode!r}")


def _validate_cjk(analyzer: "StandardAnalyzer") -> None:
    """cjk_bigram composes with the plain chain only (CJKAnalyzer's shape:
    width fold → tokenize → lowercase → bigram → stop)."""
    if not analyzer.unicode_segmentation:
        raise ValueError("cjk_bigram requires unicode_segmentation=True")
    if (
        analyzer.structural
        or analyzer.word_delimiter is not None
        or analyzer.common_grams
        or analyzer.delimited_payload is not None
        or analyzer.keyword_repeat
        or analyzer.phonetic is not None
        or analyzer.stem is not None
        or analyzer.hunspell is not None
        or analyzer.normalization is not None
        or analyzer.elision
        or analyzer.keep_words
        or analyzer.length_filter is not None
        or analyzer.limit_token_count is not None
    ):
        raise ValueError("cjk_bigram cannot combine with other token filters")


_DEFAULT = StandardAnalyzer()


def _analyze_full(
    text: str, analyzer: StandardAnalyzer
) -> list[tuple[str, int, int, int, bool]]:
    """Run the whole chain on one string → (term, position, start_offset,
    end_offset, is_overlap) in token-stream order (stable by position;
    expansions follow their anchor, matching Lucene's emission order).

    Position = index among all tokenizer-emitted tokens (skipped overlong
    tokens and removed stopwords consume a position; FilteringTokenFilter
    accumulates their increments onto the next kept token,
    ``analysis/FilteringTokenFilter.java:46-61``).
    """
    if analyzer.char_filters:
        text = apply_char_filters(text, analyzer.char_filters)
    if analyzer.cjk_width:
        from .cjkfilter import cjk_width_fold

        text = cjk_width_fold(text)
    lmode = _lowercase_mode_fn(analyzer)
    if lmode is not None:
        text = lmode(text)
    if analyzer.word_delimiter is not None:
        return _analyze_full_wd(text, analyzer)
    if analyzer.cjk_bigram:
        _validate_cjk(analyzer)
        from .cjkfilter import cjk_emit

        stream = [
            x for x in cjk_emit(
                text, token_re(analyzer), analyzer.max_token_length,
                analyzer.lowercase,
            )
            if len(x[0]) <= analyzer.max_token_length
        ]
        kept = [x for x in stream if x[0] not in analyzer.stopwords]
        return [(t, p, s, e, False) for t, p, s, e in kept]
    stream: list[tuple[str, int, int, int]] = []  # post-length, pre-stop
    for pos, m in enumerate(token_re(analyzer).finditer(text)):
        raw = m.group()
        if len(raw) > analyzer.max_token_length:
            continue  # skipped, but `pos` advances (StandardTokenizer.java:154-164)
        term = raw.lower() if analyzer.lowercase else raw
        if analyzer.elision:
            from .lang import FRENCH_ARTICLES, elide

            term = elide(term, frozenset(analyzer.elision_articles)
                         if analyzer.elision_articles else FRENCH_ARTICLES)
        if analyzer.ascii_folding:
            term = _fold_ascii(term)
        elif analyzer.icu_folding:
            term = _fold_icu(term)
        if analyzer.length_filter is not None and not (
            analyzer.length_filter[0] <= len(term) <= analyzer.length_filter[1]
        ):
            continue  # dropped but consumes a position (LengthFilter)
        stream.append((term, pos, m.start(), m.end()))
    kept = [
        x for x in stream
        if x[0] not in analyzer.stopwords
        and (not analyzer.keep_words or x[0] in analyzer.keep_words)
    ]
    if analyzer.limit_token_count is not None:
        kept = kept[: analyzer.limit_token_count]
    common: list[tuple[str, int, int, int, bool]] = []
    if analyzer.common_grams:
        if analyzer.structural or analyzer.word_delimiter is not None:
            raise ValueError("common_grams cannot combine with structural filters")
        stop = analyzer.stopwords
        for (t1, p1, s1, _e1), (t2, _p2, _s2, e2) in zip(stream, stream[1:]):
            if t1 in stop or t2 in stop:
                common.append((f"{t1}_{t2}", p1, s1, e2, True))
    mapper = _term_mapper(analyzer)
    if mapper is not None:
        kept = [(mapper(t), p, s, e) for t, p, s, e in kept]
    dmx: list[tuple[str, int, int, int, bool]] = []
    codes_fn = _phonetic_codes_fn(analyzer)
    if codes_fn is not None:
        # DoubleMetaphoneFilter / DaitchMokotoffSoundexFilter inject=false:
        # the first code REPLACES the token (non-encodable tokens pass
        # through), further codes are ADDED at the same position (posIncr 0)
        if analyzer.structural or analyzer.word_delimiter is not None \
                or analyzer.common_grams:
            raise ValueError(
                f"{analyzer.phonetic} cannot combine with structural filters"
            )
        new_kept = []
        for t, p, s, e in kept:
            codes = codes_fn(t)
            new_kept.append((codes[0], p, s, e))
            dmx.extend((c, p, s, e, True) for c in codes[1:])
        kept = new_kept
    if not analyzer.structural:
        out0 = [(t, p, s, e, False) for t, p, s, e in kept]
        if common:
            out0.extend(common)
            out0.sort(key=lambda r: r[1])  # stable: anchors before overlaps
        if dmx:
            out0.extend(dmx)
            out0.sort(key=lambda r: r[1])
        return out0

    if analyzer.edge_ngrams is not None:
        lo, hi = analyzer.edge_ngrams
        out = [
            (t[:g], p, s, e, g > lo)
            for t, p, s, e in kept
            for g in range(lo, min(hi, len(t)) + 1)
        ]
    elif analyzer.ngrams is not None:
        lo, hi = analyzer.ngrams
        out = [
            (t[o : o + g], p, s, e, not (g == lo and o == 0))
            for t, p, s, e in kept
            for g in range(lo, min(hi, len(t)) + 1)
            for o in range(len(t) - g + 1)
        ]
    else:
        out = [(t, p, s, e, False) for t, p, s, e in kept]
    if analyzer.shingle is not None:
        lo, hi = analyzer.shingle
        for n in range(lo, hi + 1):
            for i in range(len(kept) - n + 1):
                grp = kept[i : i + n]
                out.append(
                    (" ".join(t for t, _, _, _ in grp), grp[0][1], grp[0][2], grp[-1][3], True)
                )
    if analyzer.synonyms:
        smap: dict[str, list[str]] = {}
        for a, b in analyzer.synonyms:
            smap.setdefault(a, []).append(b)
        for t, p, s, e in kept:
            for syn in smap.get(t, ()):
                out.append((syn, p, s, e, True))
    if analyzer.reverse_overlap:
        out.extend((REV_MARKER + t[::-1], p, s, e, True) for t, p, s, e in kept)
    if analyzer.dictionary_compound is not None:
        # subword tokens carry the ORIGINAL token's offsets
        # (CompoundWordTokenFilterBase.CompoundToken:138-144)
        for t, p, s, e in kept:
            for sub, _off in _decompose(t, analyzer.dictionary_compound):
                out.append((sub, p, s, e, True))
    out.sort(key=lambda r: r[1])  # stable: anchors before their expansions
    return out


def _decompose(token: str, cfg: tuple) -> list[tuple[str, int]]:
    """DictionaryCompoundWordTokenFilter.decompose
    (``compound/DictionaryCompoundWordTokenFilter.java:73-99``): for each
    start offset, emit every dictionary subword of length min_sub..max_sub
    (or only the longest per start with only_longest) → [(subword,
    char_offset_within_token)]."""
    words, min_word, min_sub, max_sub, only_longest = cfg
    n = len(token)
    if n < min_word:
        return []
    if not isinstance(words, (frozenset, set)):
        words = frozenset(words)
    out: list[tuple[str, int]] = []
    for i in range(0, n - min_sub + 1):
        longest = None
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            sub = token[i:i + j]
            if sub in words:
                if only_longest:
                    longest = (sub, i)
                else:
                    out.append((sub, i))
        if only_longest and longest is not None:
            out.append(longest)
    return out


def _wd_flags(analyzer: "StandardAnalyzer") -> tuple[bool, bool]:
    """Validate the word_delimiter config once →
    (preserve_original, catenate). Shared by the golden and Arrow paths so
    the two error surfaces cannot drift."""
    from .worddelim import WD_FLAGS

    flags = set(analyzer.word_delimiter or ())
    if flags - WD_FLAGS:
        raise ValueError(f"unknown word_delimiter flags: {sorted(flags - WD_FLAGS)}")
    if analyzer.structural:
        raise ValueError("word_delimiter cannot combine with synonyms/shingle/edge_ngrams")
    if analyzer.limit_token_count is not None:
        raise ValueError("word_delimiter cannot combine with limit_token_count")
    if analyzer.keyword_repeat or analyzer.phonetic in ("double_metaphone", "dm_soundex"):
        raise ValueError("word_delimiter cannot combine with multi-code filters")
    return "preserve_original" in flags, "catenate" in flags


def _analyze_full_wd(
    text: str, analyzer: StandardAnalyzer
) -> list[tuple[str, int, int, int, bool]]:
    """word_delimiter chain: tokenize → WordDelimiter (+lowercase) →
    [ascii_folding] → stopwords → [stem]. Positions come from the filter's
    graph-flattened stream (split tokens take len(parts) positions)."""
    from .worddelim import wd_stream

    preserve, cat = _wd_flags(analyzer)
    terms, poss, starts, ends, overs = wd_stream(
        text,
        token_re(analyzer),
        max_token_length=analyzer.max_token_length,
        lowercase=analyzer.lowercase,
        preserve_original=preserve,
        catenate=cat,
    )
    out: list[tuple[str, int, int, int, bool]] = []
    mapper = _term_mapper(analyzer)
    for t, p, s, e, o in zip(terms, poss, starts, ends, overs):
        if analyzer.ascii_folding:
            t = _fold_ascii(t)
        elif analyzer.icu_folding:
            t = _fold_icu(t)
        if analyzer.length_filter is not None and not (
            analyzer.length_filter[0] <= len(t) <= analyzer.length_filter[1]
        ):
            continue
        if t in analyzer.stopwords:
            continue
        out.append((mapper(t) if mapper else t, p, s, e, o))
    return out


def analyze_with_positions(
    text: str, analyzer: StandardAnalyzer = _DEFAULT
) -> list[tuple[str, int]]:
    """Full position-increment semantics; for golden tests and phrase support."""
    return [(t, p) for t, p, _s, _e, _o in _analyze_full(text, analyzer)]


def analyze_with_offsets(
    text: str, analyzer: StandardAnalyzer = _DEFAULT
) -> list[tuple[str, int, int, int]]:
    """Like :func:`analyze_with_positions` but with char offsets:
    (term, position, start_offset, end_offset). The UnifiedHighlighter
    ANALYSIS offset source (uhighlight/AnalysisOffsetStrategy.java) —
    offsets come from re-tokenizing stored text, not the postings."""
    return [(t, p, s, e) for t, p, s, e, _o in _analyze_full(text, analyzer)]


class ArrowAnalyzer:
    """Arrow-native analysis chain — the hot-path twin of
    :func:`analyze_batch` with identical semantics, zero Python strings.

    utf8_lower → split_pattern_regex on ``[^\\p{L}\\p{N}_]+`` (RE2; the
    complement of the token class, so token boundaries match Python ``\\w+``
    exactly) → length/stopword masks → dictionary_encode; the per-doc
    term-frequency fold is an int64 key sort. Compile-once state (stopword
    value_set) lives on the instance → use from actor ``__init__``.
    """

    SPLIT_PATTERN = r"[^\p{L}\p{N}_]+"

    def __init__(self, analyzer: StandardAnalyzer = _DEFAULT):
        import pyarrow as pa

        self.analyzer = analyzer
        self.stop_arr = pa.array(sorted(analyzer.stopwords), pa.string())

    @staticmethod
    def _map_vocab(arr, fn):
        """Apply a str→str map per unique vocabulary entry (one dictionary
        encode + take; never a per-token Python call)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if len(arr) == 0:
            return arr
        de = pc.dictionary_encode(arr)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        mapped = pa.array([fn(v) for v in de.dictionary.to_pylist()], pa.string())
        return pc.take(mapped, de.indices)

    def _expand(self, kept, doc_idx, positions):
        """Structural filters (synonyms/shingle/edge_ngrams) over the kept
        token stream → (terms, doc_idx, positions, overlap_mask). Expansion
        terms are overlaps (posIncr 0): excluded from the norm length
        (discountOverlaps, BM25Similarity.java:107)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        a = self.analyzer
        if sum(x is not None for x in (a.shingle, a.edge_ngrams, a.ngrams)) > 1:
            raise ValueError("shingle, edge_ngrams and ngrams are mutually exclusive")
        if kept.type != pa.string():
            kept = kept.cast(pa.string())  # unify with expansion parts
            # (corpus content is large_string; tokens are short)
        parts_t: list = []
        parts_d: list = []
        parts_p: list = []
        parts_o: list = []

        def add(terms, d, p, overlap):
            parts_t.append(terms)
            parts_d.append(d)
            parts_p.append(p if p is not None else None)
            parts_o.append(np.full(len(d), overlap))

        de = pc.dictionary_encode(kept)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy().astype(np.int64)
        vocab = de.dictionary.to_pylist()

        if a.edge_ngrams is not None:
            lo, hi = a.edge_ngrams
            vlens = np.fromiter((len(v) for v in vocab), dtype=np.int64, count=len(vocab))
            lens = vlens[codes] if len(codes) else np.empty(0, np.int64)
            for g in range(lo, hi + 1):
                mask = lens >= g
                if not mask.any():
                    continue
                grams_vocab = pa.array([v[:g] for v in vocab], pa.string())
                add(
                    pc.take(grams_vocab, pa.array(codes[mask], pa.int64())),
                    doc_idx[mask],
                    positions[mask] if positions is not None else None,
                    g > lo,
                )
        elif a.ngrams is not None:
            lo, hi = a.ngrams
            # per-vocab grams built ONCE (g asc, offset asc → a token's first
            # gram is its (lo, 0) position anchor), then expanded to token
            # occurrences via np.repeat over the dictionary codes — the
            # per-(size, offset) full-vocab rescan was O(max_len·|vocab|)
            # Python work per batch
            gram_strs: list[str] = []
            gram_counts = np.zeros(len(vocab), dtype=np.int64)
            for i, v in enumerate(vocab):
                gs = [
                    v[o : o + g]
                    for g in range(lo, min(hi, len(v)) + 1)
                    for o in range(len(v) - g + 1)
                ]
                gram_counts[i] = len(gs)
                gram_strs.extend(gs)
            gram_offs = np.zeros(len(vocab) + 1, dtype=np.int64)
            np.cumsum(gram_counts, out=gram_offs[1:])
            occ = gram_counts[codes] if len(codes) else np.empty(0, np.int64)
            total = int(occ.sum())
            if total:
                rep_doc = np.repeat(doc_idx, occ)
                rep_pos = np.repeat(positions, occ) if positions is not None else None
                run_ends = np.cumsum(occ)
                within = np.arange(total, dtype=np.int64) - np.repeat(run_ends - occ, occ)
                idx = np.repeat(gram_offs[codes], occ) + within
                gram_arr = pc.take(
                    pa.array(gram_strs, pa.string()), pa.array(idx, pa.int64())
                )
                anchors = within == 0
                for sel, is_overlap in ((anchors, False), (~anchors, True)):
                    if sel.any():
                        add(
                            pc.filter(gram_arr, pa.array(sel)),
                            rep_doc[sel],
                            rep_pos[sel] if rep_pos is not None else None,
                            is_overlap,
                        )
        else:
            add(kept, doc_idx, positions, False)

        if a.shingle is not None:
            lo, hi = a.shingle
            for n in range(lo, hi + 1):
                L = len(kept) - n + 1
                if L <= 0:
                    break
                valid = doc_idx[:L] == doc_idx[n - 1 :]
                if not valid.any():
                    continue
                cols = [kept.slice(i, L) for i in range(n)]
                joined = pc.binary_join_element_wise(*cols, " ")
                vm = pa.array(valid)
                add(
                    pc.filter(joined, vm),
                    doc_idx[:L][valid],
                    positions[:L][valid] if positions is not None else None,
                    True,
                )

        if a.synonyms:
            code_of = {v: i for i, v in enumerate(vocab)}
            for src, syn in a.synonyms:
                c = code_of.get(src)
                if c is None:
                    continue
                sel = np.flatnonzero(codes == c)
                if len(sel) == 0:
                    continue
                add(
                    pa.array([syn] * len(sel), pa.string()),
                    doc_idx[sel],
                    positions[sel] if positions is not None else None,
                    True,
                )

        if a.reverse_overlap:
            rev_vocab = pa.array([REV_MARKER + v[::-1] for v in vocab], pa.string())
            add(
                pc.take(rev_vocab, pa.array(codes, pa.int64())),
                doc_idx,
                positions,
                True,
            )

        if a.dictionary_compound is not None:
            # decompose once per vocab entry, expand to occurrences
            subs_per_vocab = [
                [sub for sub, _off in _decompose(v, a.dictionary_compound)]
                for v in vocab
            ]
            counts = np.fromiter(
                (len(x) for x in subs_per_vocab), np.int64, len(vocab)
            )
            occ = counts[codes] if len(codes) else np.empty(0, np.int64)
            total = int(occ.sum())
            if total:
                flat_subs: list[str] = []
                for x in subs_per_vocab:
                    flat_subs.extend(x)
                sub_offs = np.zeros(len(vocab) + 1, np.int64)
                np.cumsum(counts, out=sub_offs[1:])
                run_ends = np.cumsum(occ)
                within = (
                    np.arange(total, dtype=np.int64)
                    - np.repeat(run_ends - occ, occ)
                )
                idx = np.repeat(sub_offs[codes], occ) + within
                add(
                    pc.take(pa.array(flat_subs, pa.string()),
                            pa.array(idx, pa.int64())),
                    np.repeat(doc_idx, occ),
                    np.repeat(positions, occ) if positions is not None else None,
                    True,
                )

        terms = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts_t])
        d_out = np.concatenate(parts_d) if parts_d else np.empty(0, np.int64)
        p_out = (
            np.concatenate([p for p in parts_p])
            if positions is not None and parts_p
            else None
        )
        o_out = np.concatenate(parts_o) if parts_o else np.empty(0, bool)
        return terms, d_out, p_out, o_out

    def __call__(self, content, with_positions: bool = False) -> "BatchTokenStats":
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        n = len(arr)
        arr = pc.fill_null(arr, "")
        if self.analyzer.char_filters:
            # vectorized CharFilter chain over the whole column (RE2)
            if arr.type != pa.string():
                arr = arr.cast(pa.string())
            for pat, repl, is_re in char_filter_rules(self.analyzer.char_filters):
                arr = (
                    pc.replace_substring_regex(arr, pattern=pat, replacement=repl)
                    if is_re
                    else pc.replace_substring(arr, pattern=pat, replacement=repl)
                )
        if self.analyzer.lowercase_mode is not None:
            # language-specific lowercase at text level (Python per doc);
            # the vectorized utf8_lower below is then a no-op
            lmode = _lowercase_mode_fn(self.analyzer)
            if arr.type != pa.string():
                arr = arr.cast(pa.string())
            arr = pa.array(
                [lmode(x) if x else x for x in arr.to_pylist()], pa.string()
            )
        if self.analyzer.delimited_payload is not None:
            if (self.analyzer.limit_token_count is not None
                    or self.analyzer.keyword_repeat
                    or self.analyzer.phonetic is not None):
                raise ValueError(
                    "delimited_payload cannot combine with "
                    "limit_token_count/keyword_repeat/phonetic"
                )
            return self._call_payload(arr, n, with_positions)
        if self.analyzer.word_delimiter is not None:
            return self._call_wd(arr, n, with_positions)
        if self.analyzer.unicode_segmentation or self.analyzer.url_email:
            # UAX#29 word classes / URL-email longest-match can't be
            # expressed as an RE2 split pattern; tokenize per doc in Python
            # and rejoin the vectorized fold below
            pat = token_re(self.analyzer)
            lower = self.analyzer.lowercase
            if self.analyzer.cjk_bigram:
                _validate_cjk(self.analyzer)
                from .cjkfilter import cjk_emit, cjk_width_fold

                fold = cjk_width_fold if self.analyzer.cjk_width else (lambda s: s)
                mtl = self.analyzer.max_token_length
                pylists = [
                    [t for t, _p, _s, _e in cjk_emit(fold(s_), pat, mtl, lower)]
                    for s_ in (x or "" for x in arr.to_pylist())
                ]
            else:
                pylists = [
                    pat.findall(s_.lower() if lower else s_) for s_ in (x or "" for x in arr.to_pylist())
                ]
            counts = np.fromiter((len(t) for t in pylists), dtype=np.int64, count=n)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=offs[1:])
            flat = pa.array((t for lst in pylists for t in lst), pa.string(), size=int(counts.sum()))
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        else:
            low = pc.utf8_lower(arr) if self.analyzer.lowercase else arr
            toks = pc.split_pattern_regex(low, pattern=self.SPLIT_PATTERN)
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = toks.values
            offs = toks.offsets.to_numpy().astype(np.int64)
            if offs[0] != 0 or len(flat) != offs[-1] - offs[0]:
                flat = flat.slice(offs[0], offs[-1] - offs[0])  # normalize list offset
                offs = offs - offs[0]
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))

        length = pc.utf8_length(flat)  # ORIGINAL token length (maxTokenLength
        # is enforced by the tokenizer, before any filter — StandardTokenizer.java:154)
        if self.analyzer.ascii_folding:
            flat = self._map_vocab(flat, _fold_ascii)
        elif self.analyzer.icu_folding:
            flat = self._map_vocab(flat, _fold_icu)
        nonempty = pc.greater(length, 0)
        keep = pc.and_(nonempty, pc.less_equal(length, self.analyzer.max_token_length))
        if self.analyzer.length_filter is not None:
            lo_len, hi_len = self.analyzer.length_filter
            cur_len = pc.utf8_length(flat)  # current (post-fold) token text
            keep = pc.and_(keep, pc.greater_equal(cur_len, lo_len))
            keep = pc.and_(keep, pc.less_equal(cur_len, hi_len))
        stream_keep = keep  # post-length, pre-stop (the CommonGrams stream)
        keep = pc.and_(keep, pc.invert(pc.is_in(flat, value_set=self.stop_arr)))
        if self.analyzer.keep_words:
            keep = pc.and_(
                keep,
                pc.is_in(flat, value_set=pa.array(sorted(self.analyzer.keep_words),
                                                  pa.string())),
            )
        keep_np = keep.to_numpy(zero_copy_only=False)
        if self.analyzer.limit_token_count is not None:
            # ordinal among KEPT tokens within each doc; cut > N
            lim = int(self.analyzer.limit_token_count)
            ck = np.cumsum(keep_np)
            doc_first = np.searchsorted(doc_idx, np.arange(n))  # first token idx per doc
            base = np.concatenate([[0], ck])[doc_first]
            within = ck - 1 - base[doc_idx]
            keep_np = keep_np & (within < lim)
            keep = pa.array(keep_np)
        kept = pc.filter(flat, keep)
        positions = tok_pos = None
        if with_positions or self.analyzer.common_grams:
            # position = index among emitted tokens of the doc (empties are
            # split artifacts, not tokens; overlong + stopword tokens DO
            # consume a position — StandardTokenizer/FilteringTokenFilter)
            ne = nonempty.to_numpy(zero_copy_only=False)
            csum = np.cumsum(ne)
            doc_base = np.concatenate([[0], csum[offs[1:-1] - 1]]) if n > 1 else np.zeros(1, np.int64)
            tok_pos = csum - 1 - doc_base[doc_idx]
            if with_positions:
                positions = tok_pos[keep_np].astype(np.int32)
        cg = None
        if self.analyzer.common_grams:
            if self.analyzer.structural:
                raise ValueError("common_grams cannot combine with structural filters")
            sm = stream_keep.to_numpy(zero_copy_only=False)
            s_flat = pc.filter(flat, stream_keep)
            if s_flat.type != pa.string():
                s_flat = s_flat.cast(pa.string())
            s_doc = doc_idx[sm]
            s_pos = tok_pos[sm]
            is_stop = pc.is_in(s_flat, value_set=self.stop_arr).to_numpy(zero_copy_only=False)
            L = len(s_flat) - 1
            if L > 0:
                pm = (s_doc[:L] == s_doc[1:]) & (is_stop[:L] | is_stop[1:])
                if pm.any():
                    joined = pc.binary_join_element_wise(
                        s_flat.slice(0, L), s_flat.slice(1, L), "_"
                    )
                    cg = (
                        pc.filter(joined, pa.array(pm)),
                        s_doc[:L][pm],
                        s_pos[:L][pm].astype(np.int32) if with_positions else None,
                    )
        doc_idx = doc_idx[keep_np]

        mapper = _term_mapper(self.analyzer)
        if mapper is not None and len(kept):
            kept = self._map_vocab(kept, mapper)

        dmx = None
        codes_fn = _phonetic_codes_fn(self.analyzer)
        if codes_fn is not None and len(kept):
            # vocab-level encode (each distinct token encoded once per batch):
            # first code replaces; further codes overlay per occurrence
            if self.analyzer.structural or self.analyzer.word_delimiter is not None \
                    or self.analyzer.common_grams:
                raise ValueError(
                    f"{self.analyzer.phonetic} cannot combine with structural filters"
                )
            if isinstance(kept, pa.ChunkedArray):
                kept = kept.combine_chunks()
            de = pc.dictionary_encode(kept)
            if isinstance(de, pa.ChunkedArray):
                de = de.combine_chunks()
            codes = de.indices.to_numpy().astype(np.int64)
            vocab = de.dictionary.to_pylist()
            all_codes = [codes_fn(v) for v in vocab]
            pris = [c[0] for c in all_codes]
            kept = pc.take(pa.array(pris, pa.string()), pa.array(codes))
            max_extra = max((len(c) - 1 for c in all_codes), default=0)
            ex_terms, ex_docs, ex_pos = [], [], []
            for k in range(max_extra):
                col = np.asarray(
                    [c[k + 1] if len(c) > k + 1 else "" for c in all_codes],
                    dtype=object,
                )
                sel = np.flatnonzero(col[codes] != "")
                if len(sel):
                    ex_terms.append(pa.array(col[codes[sel]].tolist(), pa.string()))
                    ex_docs.append(doc_idx[sel])
                    if with_positions:
                        ex_pos.append(positions[sel].astype(np.int32))
            if ex_terms:
                dmx = (
                    pa.concat_arrays(ex_terms),
                    np.concatenate(ex_docs),
                    np.concatenate(ex_pos) if with_positions else None,
                )

        overlap = None
        if self.analyzer.structural:
            if isinstance(kept, pa.ChunkedArray):
                kept = kept.combine_chunks()
            kept, doc_idx, positions, overlap = self._expand(kept, doc_idx, positions)
            field_lens = np.bincount(doc_idx[~overlap], minlength=n).astype(np.int32)
        else:
            field_lens = np.bincount(doc_idx, minlength=n).astype(np.int32)
        for extra in (cg, dmx):
            if extra is None:
                continue
            # same-position overlays concat out of stream order; _fold co-sorts
            if kept.type != pa.string():
                kept = kept.cast(pa.string())
            prev = overlap if overlap is not None else np.zeros(len(kept), dtype=bool)
            overlap = np.concatenate([prev, np.ones(len(extra[1]), dtype=bool)])
            kept = pa.concat_arrays(
                [kept.combine_chunks() if isinstance(kept, pa.ChunkedArray) else kept,
                 extra[0].combine_chunks() if isinstance(extra[0], pa.ChunkedArray) else extra[0]]
            )
            doc_idx = np.concatenate([doc_idx, extra[1]])
            if with_positions:
                positions = np.concatenate([positions, extra[2]])
        return self._fold(kept, doc_idx, positions, overlap, field_lens, n, with_positions)

    def _call_payload(self, arr, n: int, with_positions: bool) -> "BatchTokenStats":
        """delimited_payload path: whitespace tokens, the trailing
        ``<delim>float`` suffix becomes the occurrence's payload
        (DelimitedPayloadTokenFilter + FloatEncoder), then the usual
        lowercase / maxTokenLength / stopword chain."""
        import pyarrow as pa
        import pyarrow.compute as pc

        a = self.analyzer
        toks = pc.split_pattern_regex(arr.cast(pa.string()), pattern=r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        offs = toks.offsets.to_numpy().astype(np.int64)
        if offs[0] != 0 or len(flat) != offs[-1] - offs[0]:
            flat = flat.slice(offs[0], offs[-1] - offs[0])
            offs = offs - offs[0]
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        # split at the LAST delimiter; suffix → float payload (NaN = none)
        parts = pc.split_pattern(flat, pattern=a.delimited_payload,
                                 max_splits=1, reverse=True)
        plist = parts.to_pylist()
        terms_py = [p[0] if p else "" for p in plist]
        pays = np.full(len(plist), np.nan, dtype=np.float32)
        for i, p in enumerate(plist):
            if p is not None and len(p) == 2:
                try:
                    pays[i] = np.float32(p[1])
                except ValueError:
                    terms_py[i] = flat[i].as_py()  # not a payload → keep verbatim
        flat = pa.array(terms_py, pa.string())
        length = pc.utf8_length(flat)
        if a.lowercase:
            flat = pc.utf8_lower(flat)
        if a.ascii_folding:
            flat = self._map_vocab(flat, _fold_ascii)
        elif a.icu_folding:
            flat = self._map_vocab(flat, _fold_icu)
        nonempty = pc.greater(length, 0)
        keep = pc.and_(nonempty, pc.less_equal(length, a.max_token_length))
        keep = pc.and_(keep, pc.invert(pc.is_in(flat, value_set=self.stop_arr)))
        keep_np = keep.to_numpy(zero_copy_only=False)
        if self.analyzer.limit_token_count is not None:
            # ordinal among KEPT tokens within each doc; cut > N
            lim = int(self.analyzer.limit_token_count)
            ck = np.cumsum(keep_np)
            doc_first = np.searchsorted(doc_idx, np.arange(n))  # first token idx per doc
            base = np.concatenate([[0], ck])[doc_first]
            within = ck - 1 - base[doc_idx]
            keep_np = keep_np & (within < lim)
            keep = pa.array(keep_np)
        kept = pc.filter(flat, keep)
        positions = None
        if with_positions:
            ne = nonempty.to_numpy(zero_copy_only=False)
            csum = np.cumsum(ne)
            doc_base = np.concatenate([[0], csum[offs[1:-1] - 1]]) if n > 1 else np.zeros(1, np.int64)
            positions = (csum - 1 - doc_base[doc_idx])[keep_np].astype(np.int32)
        doc_idx = doc_idx[keep_np]
        pays = pays[keep_np]
        field_lens = np.bincount(doc_idx, minlength=n).astype(np.int32)
        return self._fold(kept, doc_idx, positions, None, field_lens, n,
                          with_positions, payloads=pays if with_positions else None)

    def _fold(self, kept, doc_idx, positions, overlap, field_lens, n, with_positions,
              payloads=None):
        """Per-(doc, term) tf fold over the kept token stream — shared tail
        of the default, structural, and word_delimiter paths."""
        import pyarrow as pa
        import pyarrow.compute as pc

        if len(kept) == 0:
            return BatchTokenStats(
                terms=pa.array([], pa.string()),
                tfs=np.empty(0, dtype=np.int32),
                offsets=np.zeros(n + 1, dtype=np.int64),
                field_lens=field_lens,
                positions=np.empty(0, dtype=np.int32) if with_positions else None,
                payloads=np.empty(0, dtype=np.float32) if payloads is not None else None,
            )

        de = pc.dictionary_encode(kept)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy().astype(np.int64)
        vocab = de.dictionary
        V = np.int64(len(vocab))
        pair_key = doc_idx * V + codes
        if overlap is not None and positions is not None:
            # expansions were concatenated out of stream order: co-sort
            # positions so each (doc, term) pair's positions stay ascending
            order = np.lexsort((positions, pair_key))
        else:
            order = np.argsort(pair_key, kind="stable")  # stable → positions stay ascending per pair
        pk = pair_key[order]
        boundary = np.empty(len(pk), dtype=bool)
        boundary[0] = True
        boundary[1:] = pk[1:] != pk[:-1]
        starts = np.flatnonzero(boundary)
        tfs = np.diff(np.append(starts, len(pk)))
        uniq_keys = pk[starts]
        u_doc = uniq_keys // V
        u_code = uniq_keys % V
        term_vals = pc.take(vocab, pa.array(u_code, pa.int64()))
        per_doc = np.bincount(u_doc, minlength=n)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(per_doc, out=offsets[1:])
        return BatchTokenStats(
            terms=term_vals,
            tfs=tfs.astype(np.int32),
            offsets=offsets,
            field_lens=field_lens,
            positions=positions[order] if with_positions else None,
            payloads=payloads[order] if payloads is not None else None,
        )

    def _call_wd(self, arr, n: int, with_positions: bool) -> "BatchTokenStats":
        """word_delimiter path: per-doc Python stream (the filter's graph
        positions can't be expressed as a split pattern), vectorized
        stop/fold — same structure as the unicode_segmentation fallback."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from .worddelim import wd_stream

        a = self.analyzer
        preserve, cat = _wd_flags(a)
        pat = token_re(a)
        terms_l: list[list[str]] = []
        pos_l: list[list[int]] = []
        over_l: list[list[bool]] = []
        counts = np.zeros(n, dtype=np.int64)
        for i, s_ in enumerate(x or "" for x in arr.to_pylist()):
            t, p, _s, _e, o = wd_stream(
                s_, pat, max_token_length=a.max_token_length, lowercase=a.lowercase,
                preserve_original=preserve, catenate=cat,
            )
            terms_l.append(t)
            pos_l.append(p)
            over_l.append(o)
            counts[i] = len(t)
        total = int(counts.sum())
        flat = pa.array((t for lst in terms_l for t in lst), pa.string(), size=total)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        positions = (
            np.fromiter((p for lst in pos_l for p in lst), np.int32, count=total)
            if with_positions
            else None
        )
        overlap = np.fromiter((o for lst in over_l for o in lst), bool, count=total)
        if a.ascii_folding:
            flat = self._map_vocab(flat, _fold_ascii)
        elif a.icu_folding:
            flat = self._map_vocab(flat, _fold_icu)
        keep_a = pc.invert(pc.is_in(flat, value_set=self.stop_arr))
        if a.length_filter is not None:
            lo_len, hi_len = a.length_filter
            cur_len = pc.utf8_length(flat)
            keep_a = pc.and_(keep_a, pc.greater_equal(cur_len, lo_len))
            keep_a = pc.and_(keep_a, pc.less_equal(cur_len, hi_len))
        keep = keep_a.to_numpy(zero_copy_only=False)
        kept = pc.filter(flat, pa.array(keep))
        doc_idx = doc_idx[keep]
        overlap = overlap[keep]
        if positions is not None:
            positions = positions[keep]
        mapper = _term_mapper(a)
        if mapper is not None and len(kept):
            kept = self._map_vocab(kept, mapper)
        field_lens = np.bincount(doc_idx[~overlap], minlength=n).astype(np.int32)
        return self._fold(kept, doc_idx, positions, overlap, field_lens, n, with_positions)


@dataclass
class BatchTokenStats:
    """Vectorized analysis result for a batch of documents.

    ``terms``/``tfs`` are flat arrays; document *d*'s unique terms are
    ``terms[offsets[d]:offsets[d+1]]`` (first-appearance order within the doc
    — downstream postings construction sorts globally by term, so per-doc
    order is irrelevant and we skip an expensive object-array sort).
    """

    terms: np.ndarray  # object array of str (or pa.Array from ArrowAnalyzer)
    tfs: np.ndarray  # int32
    offsets: np.ndarray  # int64, len == n_docs + 1
    field_lens: np.ndarray  # int32, kept-token counts per doc
    #: flat ascending positions per (doc, term) pair, aligned with cumsum(tfs);
    #: only set by ArrowAnalyzer(with_positions=True)
    positions: np.ndarray | None = None
    #: float32 payload per occurrence, aligned 1:1 with ``positions`` (NaN =
    #: no payload on that occurrence); only set by the delimited_payload path
    payloads: np.ndarray | None = None


def analyze_batch(
    contents: list[str] | np.ndarray, analyzer: StandardAnalyzer = _DEFAULT
) -> BatchTokenStats:
    """Tokenize + lowercase + stop + per-doc term-frequency fold, batch-at-once.

    The per-doc regex scan is the only Python-level loop; filtering, counting
    and grouping are numpy/pandas vector ops over the flattened token stream.
    """
    if (
        analyzer.ascii_folding
        or analyzer.icu_folding
        or analyzer.stem is not None
        or analyzer.hunspell is not None
        or analyzer.phonetic is not None
        or analyzer.structural
        or analyzer.word_delimiter is not None
        or analyzer.char_filters
        or analyzer.length_filter is not None
        or analyzer.common_grams
        or analyzer.keep_words
        or analyzer.limit_token_count is not None
        or analyzer.keyword_repeat
    ):
        # the filter-chain machinery lives on the Arrow path; delegate
        import pyarrow as pa

        arr = pa.array([c if c is not None else "" for c in contents], pa.string())
        return ArrowAnalyzer(analyzer)(arr)
    n = len(contents)
    tok_lists = []
    for s in contents:
        if s is None:
            tok_lists.append([])
        else:
            # lowercase the whole string first (C-speed); \w is case-insensitive
            # so token boundaries are unchanged.
            tok_lists.append(token_re(analyzer).findall(s.lower() if analyzer.lowercase else s))
    counts = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    if counts.sum() == 0:
        return BatchTokenStats(
            terms=np.empty(0, dtype=object),
            tfs=np.empty(0, dtype=np.int32),
            offsets=np.zeros(n + 1, dtype=np.int64),
            field_lens=np.zeros(n, dtype=np.int32),
        )
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)

    ser = pd.Series(flat, dtype=object)
    keep = ~ser.isin(analyzer.stopwords).to_numpy()
    if analyzer.max_token_length:
        lens = ser.str.len().to_numpy()
        keep &= lens <= analyzer.max_token_length
    flat, doc_idx = flat[keep], doc_idx[keep]

    field_lens = np.bincount(doc_idx, minlength=n).astype(np.int32)

    # unique (doc, term) pairs + counts, vectorized via factorize
    codes, uniques = pd.factorize(pd.Series(flat, dtype=object), sort=False)
    pair_key = doc_idx * np.int64(len(uniques)) + codes
    order = np.argsort(pair_key, kind="stable")
    pk = pair_key[order]
    boundary = np.empty(len(pk), dtype=bool)
    if len(pk):
        boundary[0] = True
        boundary[1:] = pk[1:] != pk[:-1]
    starts = np.flatnonzero(boundary)
    group_sizes = np.diff(np.append(starts, len(pk)))
    uniq_keys = pk[starts]
    u_doc = uniq_keys // len(uniques)
    u_code = (uniq_keys % len(uniques)).astype(np.int64)

    uarr = np.asarray(uniques, dtype=object)
    term_vals = uarr[u_code]  # doc-major already (pair_key is doc*V + code)
    tfs = group_sizes.astype(np.int32)

    per_doc_uniques = np.bincount(u_doc, minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(per_doc_uniques, out=offsets[1:])
    return BatchTokenStats(terms=term_vals, tfs=tfs, offsets=offsets, field_lens=field_lens)
