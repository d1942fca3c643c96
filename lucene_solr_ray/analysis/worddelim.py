"""WordDelimiterGraphFilter analog.

Reference: ``lucene/analysis/common/src/java/org/apache/lucene/analysis/
miscellaneous/WordDelimiterGraphFilter.java`` (flags at :78-133) and the
char-classifying ``WordDelimiterIterator.java``. Semantics reproduced:

- subword parts split at intra-word delimiters (``_`` — the only
  non-alphanumeric character our ``\\w+`` tokenizer admits), at
  lower→UPPER case transitions (SPLIT_ON_CASE_CHANGE), at
  letter↔digit transitions (SPLIT_ON_NUMERICS), and an UPPER run followed
  by Upper+lower keeps its last upper for the next part ("ABCDef" → "ABC",
  "Def" — WordDelimiterIterator's endUP backtrack);
- GENERATE_WORD_PARTS + GENERATE_NUMBER_PARTS always on: each part takes
  its own position (the graph's posIncr=1 chain);
- PRESERVE_ORIGINAL emits the unsplit token at the first part's position
  as a posIncr-0 overlap (excluded from the norm length under
  discountOverlaps — the flattened-graph indexing form, matching what
  FlattenGraphFilter feeds the indexer);
- CATENATE_ALL emits the delimiter-free concatenation as an overlap.

Char classes (WordDelimiterIterator.getType): UPPER = Unicode Lu,
DIGIT = Nd, delimiter = ``_``; every other word char counts as LOWER
(Lucene folds Lo/Lm letters into ALPHA the same way).

A token that is all delimiters emits nothing but still consumes one
position (same contract as an overlong-token skip). Tokens longer than
``max_token_length`` are skipped BEFORE the filter (maxTokenLength is a
tokenizer property) and also consume one position.
"""

from __future__ import annotations

import unicodedata

__all__ = ["wd_parts", "wd_stream", "WD_FLAGS"]

WD_FLAGS = frozenset({"preserve_original", "catenate"})


def _ctype(ch: str) -> str:
    if ch == "_":
        return "delim"
    cat = unicodedata.category(ch)
    if cat == "Nd":
        return "d"
    if cat == "Lu":
        return "u"
    return "l"


def wd_parts(token: str) -> list[tuple[str, int]]:
    """Split one token into subword parts → [(part, char_offset_in_token)].

    Boundaries: delimiters (dropped), case change (lower→upper), and
    letter↔digit transitions; an upper-run's final char joins a following
    lowercase run ("ABCDef" → ABC, Def)."""
    parts: list[tuple[str, int]] = []
    cur: list[str] = []
    cur_start = 0
    prev: str | None = None

    def flush() -> None:
        if cur:
            parts.append(("".join(cur), cur_start))

    for i, ch in enumerate(token):
        t = _ctype(ch)
        if t == "delim":
            flush()
            cur = []
            prev = None
            continue
        if prev is None:
            if not cur:
                cur_start = i
        else:
            digit_flip = (t == "d") != (prev == "d")
            case_up = prev == "l" and t == "u"
            if prev == "u" and t == "l" and len(cur) > 1:
                # "ABCDef": the last upper starts the next part
                last = cur.pop()
                flush()
                cur = [last]
                cur_start = i - 1
            elif digit_flip or case_up:
                flush()
                cur = []
                cur_start = i
        cur.append(ch)
        prev = t
    flush()
    return parts


def wd_stream(
    text: str,
    token_pattern,
    *,
    max_token_length: int,
    lowercase: bool,
    preserve_original: bool,
    catenate: bool,
) -> tuple[list[str], list[int], list[int], list[int], list[bool]]:
    """Tokenize + WordDelimiter + (optional) lowercase one string →
    (terms, positions, start_offsets, end_offsets, overlaps), pre-stopword.

    Positions are absolute: an unsplit token takes 1, a split token takes
    len(parts); overlong/all-delimiter tokens emit nothing but take 1.
    The stop filter (applied by the caller) drops terms without renumbering
    — exactly FilteringTokenFilter's accumulated increments."""
    terms: list[str] = []
    poss: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    overs: list[bool] = []
    pos = 0
    for m in token_pattern.finditer(text):
        raw = m.group()
        if len(raw) > max_token_length:
            pos += 1
            continue
        parts = wd_parts(raw)
        if not parts:
            pos += 1
            continue
        lo = raw.lower() if lowercase else raw
        if len(parts) == 1 and parts[0][0] == raw:
            terms.append(lo)
            poss.append(pos)
            starts.append(m.start())
            ends.append(m.end())
            overs.append(False)
            pos += 1
            continue
        if preserve_original:
            terms.append(lo)
            poss.append(pos)
            starts.append(m.start())
            ends.append(m.end())
            overs.append(True)
        if catenate and len(parts) > 1:
            cat = "".join(p for p, _ in parts)
            terms.append(cat.lower() if lowercase else cat)
            poss.append(pos)
            starts.append(m.start())
            ends.append(m.end())
            overs.append(True)
        for j, (p, off) in enumerate(parts):
            terms.append(p.lower() if lowercase else p)
            poss.append(pos + j)
            starts.append(m.start() + off)
            ends.append(m.start() + off + len(p))
            overs.append(False)
        pos += len(parts)
    return terms, poss, starts, ends, overs
