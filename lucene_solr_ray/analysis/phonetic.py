"""PhoneticFilter / Soundex analog.

Reference: Solr's ``PhoneticFilterFactory`` (solr/core/src/java/org/apache/
solr/analysis/ → analysis/phonetic/PhoneticFilter.java) with the
commons-codec US-English Soundex encoder, replace=true (each token is
REPLACED by its phonetic code — the "sounds-like" field idiom).

Encoder rules (commons-codec Soundex semantics):
- keep the first letter (uppercased);
- consonant classes B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6;
- vowels (A E I O U Y) are not coded and RESET the previous-code state;
- H and W are not coded and do NOT reset it (consonants separated by H/W
  collapse — "Ashcraft" → A261);
- adjacent identical codes collapse, including against the first letter's
  own code ("Pfister" → P236);
- pad with zeros / truncate to 4 chars.

Tokens with no ASCII letters pass through unchanged.
"""

from __future__ import annotations

_CODE = {}
for _letters, _d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                     ("L", "4"), ("MN", "5"), ("R", "6")):
    for _c in _letters:
        _CODE[_c] = _d

_VOWELS = set("AEIOUY")


def soundex(term: str) -> str:
    letters = [c for c in term.upper() if "A" <= c <= "Z"]
    if not letters:
        return term
    out = [letters[0]]
    last = _CODE.get(letters[0], "")
    for ch in letters[1:]:
        if ch in ("H", "W"):
            continue  # transparent: does not reset `last`
        if ch in _VOWELS:
            last = ""  # resets the run
            continue
        c = _CODE[ch]
        if c != last:
            out.append(c)
            last = c
        if len(out) == 4:
            break
    return "".join(out).ljust(4, "0")
