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
UAX29_TOKEN_RE = re.compile(
    f"[{_KATA}]+"
    f"|[{_HANG}]+"
    f"|[{_IDEO}]"
    f"|[{_HIRA}]"
    f"|[{_EMOJ}](?:\u200D[{_EMOJ}])*"
    f"|(?:(?![{_CJK_ALL}])\w)+",
    re.UNICODE,
)


def token_re(analyzer: "StandardAnalyzer") -> "re.Pattern":
    return UAX29_TOKEN_RE if analyzer.unicode_segmentation else TOKEN_RE


@dataclass(frozen=True)
class StandardAnalyzer:
    """Configuration of the analysis chain; immutable and cheaply shippable."""

    max_token_length: int = MAX_TOKEN_LENGTH
    stopwords: frozenset[str] = field(default_factory=lambda: ENGLISH_STOP_WORDS)
    lowercase: bool = True
    #: full UAX#29 word classes (CJK/Hangul/Katakana/emoji) instead of the
    #: ALPHANUM-subset default; analysis runs through the Python tokenizer
    #: (the Arrow fast path covers only the default mode)
    unicode_segmentation: bool = False


_DEFAULT = StandardAnalyzer()


def analyze_with_positions(
    text: str, analyzer: StandardAnalyzer = _DEFAULT
) -> list[tuple[str, int]]:
    """Full position-increment semantics; for golden tests and phrase support.

    Position = index among all tokenizer-emitted tokens (skipped overlong
    tokens and removed stopwords consume a position; FilteringTokenFilter
    accumulates their increments onto the next kept token).
    """
    out: list[tuple[str, int]] = []
    for pos, raw in enumerate(token_re(analyzer).findall(text)):
        if len(raw) > analyzer.max_token_length:
            continue  # skipped, but `pos` advances (StandardTokenizer.java:154-164)
        term = raw.lower() if analyzer.lowercase else raw
        if term in analyzer.stopwords:
            continue  # dropped, position accumulates (FilteringTokenFilter.java:46-61)
        out.append((term, pos))
    return out


def analyze_with_offsets(
    text: str, analyzer: StandardAnalyzer = _DEFAULT
) -> list[tuple[str, int, int, int]]:
    """Like :func:`analyze_with_positions` but with char offsets:
    (term, position, start_offset, end_offset). The UnifiedHighlighter
    ANALYSIS offset source (uhighlight/AnalysisOffsetStrategy.java) —
    offsets come from re-tokenizing stored text, not the postings."""
    out: list[tuple[str, int, int, int]] = []
    for pos, m in enumerate(token_re(analyzer).finditer(text)):
        raw = m.group()
        if len(raw) > analyzer.max_token_length:
            continue
        term = raw.lower() if analyzer.lowercase else raw
        if term in analyzer.stopwords:
            continue
        out.append((term, pos, m.start(), m.end()))
    return out


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

    def __call__(self, content, with_positions: bool = False) -> "BatchTokenStats":
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
        n = len(arr)
        arr = pc.fill_null(arr, "")
        if self.analyzer.unicode_segmentation:
            # UAX#29 word classes can't be expressed as an RE2 split pattern
            # (single-char ideograph tokens); tokenize per doc in Python and
            # rejoin the vectorized fold below
            pat = token_re(self.analyzer)
            lower = self.analyzer.lowercase
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

        length = pc.utf8_length(flat)
        nonempty = pc.greater(length, 0)
        keep = pc.and_(nonempty, pc.less_equal(length, self.analyzer.max_token_length))
        keep = pc.and_(keep, pc.invert(pc.is_in(flat, value_set=self.stop_arr)))
        keep_np = keep.to_numpy(zero_copy_only=False)
        kept = pc.filter(flat, keep)
        positions = None
        if with_positions:
            # position = index among emitted tokens of the doc (empties are
            # split artifacts, not tokens; overlong + stopword tokens DO
            # consume a position — StandardTokenizer/FilteringTokenFilter)
            ne = nonempty.to_numpy(zero_copy_only=False)
            csum = np.cumsum(ne)
            doc_base = np.concatenate([[0], csum[offs[1:-1] - 1]]) if n > 1 else np.zeros(1, np.int64)
            tok_pos = csum - 1 - doc_base[doc_idx]
            positions = tok_pos[keep_np].astype(np.int32)
        doc_idx = doc_idx[keep_np]

        field_lens = np.bincount(doc_idx, minlength=n).astype(np.int32)
        if len(kept) == 0:
            return BatchTokenStats(
                terms=pa.array([], pa.string()),
                tfs=np.empty(0, dtype=np.int32),
                offsets=np.zeros(n + 1, dtype=np.int64),
                field_lens=field_lens,
                positions=np.empty(0, dtype=np.int32) if with_positions else None,
            )

        de = pc.dictionary_encode(kept)
        if isinstance(de, pa.ChunkedArray):
            de = de.combine_chunks()
        codes = de.indices.to_numpy().astype(np.int64)
        vocab = de.dictionary
        V = np.int64(len(vocab))
        pair_key = doc_idx * V + codes
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
        )


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


def analyze_batch(
    contents: list[str] | np.ndarray, analyzer: StandardAnalyzer = _DEFAULT
) -> BatchTokenStats:
    """Tokenize + lowercase + stop + per-doc term-frequency fold, batch-at-once.

    The per-doc regex scan is the only Python-level loop; filtering, counting
    and grouping are numpy/pandas vector ops over the flattened token stream.
    """
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
