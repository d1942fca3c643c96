"""CJK analysis: width folding + bigramming (``analysis/cjk/`` in the
reference).

* :func:`cjk_width_fold` — CJKWidthFilter semantics
  (``analysis/cjk/CJKWidthFilter.java:39-113``): fullwidth ASCII variants
  fold to basic Latin, halfwidth Katakana variants fold to Kana, and the
  halfwidth voiced/semi-voiced sound marks (U+FF9E/U+FF9F) combine into the
  preceding Kana when a composed form exists. The reference runs the filter
  on the token stream; this engine folds the raw text BEFORE tokenization —
  equivalent for the emitted terms (composition only looks one char back)
  and strictly better for token boundaries (a fullwidth "Ｔｅｓｔ" becomes
  one ALPHANUM token instead of needing the tokenizer to know fullwidth
  forms), with offsets referring to the folded text.

* :func:`cjk_emit` — StandardTokenizer + CJKBigramFilter
  (``analysis/cjk/CJKBigramFilter.java:151-233``, default flags
  HAN|HIRAGANA|KATAKANA|HANGUL, outputUnigrams=false): consecutive CJK
  codepoints whose offsets are contiguous form a run; a run of n >= 2
  codepoints emits its n-1 bigrams (no trailing unigram), a lone CJK
  codepoint emits a unigram, and non-CJK tokens pass through unchanged.
  Every emitted token advances the position by one (the filter's
  clearAttributes() resets posIncr on each flush). Divergence, documented:
  a token longer than maxTokenLength consumes one position uniformly here,
  while the reference's skip-increment is absorbed when the next flush is a
  bigram/unigram (clearAttributes) — reachable only with 256+-char tokens.

* :data:`CJK_STOP_WORDS` — CJKAnalyzer's default stop set
  (``analysis/cjk/stopwords.txt``: English function words + ``s t www``),
  applied AFTER bigramming per CJKAnalyzer.createComponents
  (``analysis/cjk/CJKAnalyzer.java:87-95``).
"""
from __future__ import annotations

import re

CJK_STOP_WORDS = frozenset("""
a and are as at be but by for if in into is it no not of on or s such t
that the their then there these they this to was will with www
""".split())

# --- width folding tables (CJKWidthFilter.java:44-58, 88-105) ---

#: fullwidth ASCII variants U+FF01..U+FF5E -> U+0021..U+007E
_FW_ASCII = {cp: cp - 0xFEE0 for cp in range(0xFF01, 0xFF5F)}

#: halfwidth kana U+FF65..U+FF9D -> fullwidth (KANA_NORM); FF9E/FF9F fall
#: back to the combining marks U+3099/U+309A when composition fails
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]

#: composition deltas indexed by (prev kana - U+30A6); 0 = no composed form
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]

_WIDTH_RE = re.compile("[！-ﾟ]")


def cjk_width_fold(text: str) -> str:
    """Fold fullwidth ASCII / halfwidth Katakana; no-op (zero-copy) when the
    text has no chars in U+FF01..U+FF9F."""
    if _WIDTH_RE.search(text) is None:
        return text
    out: list[str] = []
    for ch in text:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    d = (_KANA_COMBINE_HALF_VOICED if cp == 0xFF9F
                         else _KANA_COMBINE_VOICED)[prev - 0x30A6]
                    if d:
                        out[-1] = chr(prev + d)
                        continue
            out.append(chr(_KANA_NORM[cp - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


def _is_cjk_char(ch: str) -> bool:
    """One of the four bigrammed scripts (StandardTokenizer's IDEOGRAPHIC /
    HIRAGANA / KATAKANA / HANGUL classes; ranges shared with
    ``tokenizer.UAX29_TOKEN_RE``)."""
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF      # Han
        or 0x3400 <= cp <= 0x4DBF   # Han ext A
        or 0xF900 <= cp <= 0xFAFF   # Han compat
        or cp in (0x3006, 0x3007)
        or 0x20000 <= cp <= 0x2FA1F  # Han ext B+ (supplementary)
        or 0x3041 <= cp <= 0x309F   # Hiragana
        or 0x30A0 <= cp <= 0x30FF   # Katakana
        or 0x31F0 <= cp <= 0x31FF   # Katakana phonetic ext
        or 0xFF66 <= cp <= 0xFF9D   # halfwidth Katakana
        or 0x1100 <= cp <= 0x11FF   # Hangul jamo
        or 0x3130 <= cp <= 0x318F   # Hangul compat jamo
        or 0xAC00 <= cp <= 0xD7A3   # Hangul syllables
    )


def cjk_emit(
    text: str,
    pat: "re.Pattern",
    max_token_length: int,
    lowercase: bool,
) -> list[tuple[str, int, int, int]]:
    """Tokenize ``text`` with ``pat`` and run the CJK bigram filter →
    [(term, position, start_offset, end_offset)] pre-stopword stream.
    Overlong tokens are emitted as-is (the caller's length mask drops them;
    they consume a position either way, matching the batch path)."""
    out: list[tuple[str, int, int, int]] = []
    pos = -1
    run: list[tuple[str, int]] = []  # (codepoint char, start offset)
    last_end = -1

    def flush() -> None:
        nonlocal pos
        if not run:
            return
        if len(run) == 1:
            c, s = run[0]
            pos += 1
            out.append((c, pos, s, s + len(c)))
        else:
            for i in range(len(run) - 1):
                (c1, s1), (c2, s2) = run[i], run[i + 1]
                pos += 1
                out.append((c1 + c2, pos, s1, s2 + len(c2)))
        run.clear()

    for m in pat.finditer(text):
        raw = m.group()
        term = raw.lower() if lowercase else raw
        if term and _is_cjk_char(term[0]):
            if run and m.start() != last_end:
                flush()
            s = m.start()
            for ch in term:
                run.append((ch, s))
                s += len(ch)  # 1 per BMP char; surrogate pairs are 1 in Python
            last_end = m.end()
        else:
            flush()
            pos += 1
            out.append((term, pos, m.start(), m.end()))
    flush()
    # length policy: bigrams/unigrams are short by construction; only
    # pass-through tokens can exceed max_token_length (dropped by callers)
    return out
