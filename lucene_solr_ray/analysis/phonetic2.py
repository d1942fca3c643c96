"""PhoneticFilterFactory's remaining commons-codec encoders.

Reference: ``lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/
phonetic/PhoneticFilterFactory.java`` registers Metaphone, RefinedSoundex,
Caverphone (2.0), Nysiis and ColognePhonetic alongside the Soundex /
DoubleMetaphone / DaitchMokotoffSoundex already implemented in
``phonetic.py`` / ``dmetaphone.py`` / ``dmsoundex.py``. Golden vectors
pinned from the reference's own ``TestPhoneticFilter.testAlgorithms``
(``lucene/analysis/phonetic/src/test/.../TestPhoneticFilter.java:41-71``).

All are transcriptions of PUBLISHED algorithms (Philips 1990 Metaphone,
the NYSIIS transcription standard, David Hood's Caverphone 2.0 revision,
Postel's 1969 Kölner Phonetik, the US census Refined Soundex) with
commons-codec's documented edge-case behavior.

Each encoder returns the phonetic code, or the (unchanged) input when the
code would be empty — PhoneticFilter replace=true keeps the original term
when the encoder produces nothing.
"""

from __future__ import annotations

import re

_VOWELS = set("AEIOU")
_FRONTV = "EIY"  # front vowels: C/G soften before these
_VARSON = "CSPTG"  # H silent after these


def _clean(term: str) -> str:
    return "".join(c for c in term.upper() if "A" <= c <= "Z")


# ---------------------------------------------------------------------------
# Metaphone (Philips 1990; commons-codec semantics, maxCodeLen=4)
# ---------------------------------------------------------------------------


def metaphone(term: str, max_code_len: int = 4) -> str:
    txt = _clean(term)
    if not txt:
        return term
    if len(txt) == 1:
        return txt
    w = list(txt)
    # initial-pair exceptions
    if w[0] in "KGP" and w[1] == "N":
        w = w[1:]
    elif w[0] == "A" and w[1] == "E":
        w = w[1:]
    elif w[0] == "W" and w[1] == "R":
        w = w[1:]
    elif w[0] == "W" and w[1] == "H":
        w = ["W"] + w[2:]
    elif w[0] == "X":
        w[0] = "S"
    local = "".join(w)
    wdsz = len(local)
    code: list[str] = []
    n = 0

    def is_vowel(i: int) -> bool:
        return 0 <= i < wdsz and local[i] in _VOWELS

    def prev_is(i: int, c: str) -> bool:
        return i > 0 and local[i - 1] == c

    def next_is(i: int, c: str) -> bool:
        return i + 1 < wdsz and local[i + 1] == c

    def region(i: int, s: str) -> bool:
        return local[i:i + len(s)] == s

    while len(code) < max_code_len and n < wdsz:
        symb = local[n]
        if symb != "C" and prev_is(n, symb):  # dedupe repeats except C
            n += 1
            continue
        if symb in _VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (prev_is(n, "M") and n == wdsz - 1):
                code.append("B")
        elif symb == "C":
            if prev_is(n, "S") and n + 1 < wdsz and local[n + 1] in _FRONTV:
                pass  # SCI/SCE/SCY: silent
            elif region(n, "CIA"):
                code.append("X")
            elif n + 1 < wdsz and local[n + 1] in _FRONTV:
                code.append("S")
            elif prev_is(n, "S") and next_is(n, "H"):
                code.append("K")  # SCH
            elif next_is(n, "H"):
                if n == 0 and wdsz >= 3 and not is_vowel(2):
                    code.append("K")  # CH + consonant
                else:
                    code.append("X")  # CH + vowel
            else:
                code.append("K")
        elif symb == "D":
            if n + 2 < wdsz and next_is(n, "G") and local[n + 2] in _FRONTV:
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = (
                (n + 1 == wdsz - 1 and next_is(n, "H"))
                or (n + 1 < wdsz - 1 and next_is(n, "H") and not is_vowel(n + 2))
                or (n > 0 and (region(n, "GN") or region(n, "GNED")))
            )
            if not silent:
                hard = prev_is(n, "G")
                if n + 1 < wdsz and local[n + 1] in _FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if n == wdsz - 1:
                pass  # terminal H
            elif n > 0 and local[n - 1] in _VARSON:
                pass
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if n == 0 or not prev_is(n, "C"):
                code.append("K")
        elif symb == "P":
            code.append("F" if next_is(n, "H") else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent
            elif region(n, "TH"):
                code.append("0")  # theta
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
    out = "".join(code[:max_code_len])
    return out or term


# ---------------------------------------------------------------------------
# Refined Soundex (commons-codec US_ENGLISH mapping)
# ---------------------------------------------------------------------------

_REFINED_MAP = "01360240043788015936020505"  # A..Z


def refined_soundex(term: str) -> str:
    txt = _clean(term)
    if not txt:
        return term
    out = [txt[0]]
    last = ""
    for c in txt:
        cur = _REFINED_MAP[ord(c) - 65]
        if cur == last:
            continue
        out.append(cur)
        last = cur
    return "".join(out)


# ---------------------------------------------------------------------------
# Caverphone 2.0 (David Hood, 2004 revision; commons-codec step order)
# ---------------------------------------------------------------------------

_CAVER_STEPS = [
    ("e$", ""),
    ("^cough", "cou2f"), ("^rough", "rou2f"), ("^tough", "tou2f"),
    ("^enough", "enou2f"), ("^trough", "trou2f"), ("^gn", "2n"),
    ("mb$", "m2"),
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2"), ("z", "s"),
    ("^[aeiou]", "A"), ("[aeiou]", "3"),
    ("j", "y"), ("^y3", "Y3"), ("^y", "A"), ("y", "3"),
    ("3gh3", "3kh3"), ("gh", "22"), ("g", "k"),
    ("s+", "S"), ("t+", "T"), ("p+", "P"), ("k+", "K"),
    ("f+", "F"), ("m+", "M"), ("n+", "N"),
    ("w3", "W3"), ("wh3", "Wh3"), ("w$", "3"), ("w", "2"),
    ("^h", "A"), ("h", "2"),
    ("r3", "R3"), ("r$", "3"), ("r", "2"),
    ("l3", "L3"), ("l$", "3"), ("l", "2"),
    ("2", ""), ("3$", "A"), ("3", ""),
]
_CAVER_COMPILED = [(re.compile(p), r) for p, r in _CAVER_STEPS]


def caverphone2(term: str) -> str:
    txt = re.sub("[^a-z]", "", term.lower())
    if not txt:
        return term
    for pat, rep in _CAVER_COMPILED:
        txt = pat.sub(rep, txt)
    return (txt + "1" * 10)[:10]


# ---------------------------------------------------------------------------
# NYSIIS (commons-codec, strict → 6-char truncation)
# ---------------------------------------------------------------------------

_NYSIIS_FIRST = [
    (re.compile("^MAC"), "MCC"), (re.compile("^KN"), "NN"),
    (re.compile("^K"), "C"), (re.compile("^(PH|PF)"), "FF"),
    (re.compile("^SCH"), "SSS"),
]
_NYSIIS_LAST = [
    (re.compile("(EE|IE)$"), "Y"), (re.compile("(DT|RT|RD|NT|ND)$"), "D"),
]


def _nysiis_transcode(prev: str, curr: str, nxt: str, anext: str) -> str:
    if curr == "E" and nxt == "V":
        return "AF"
    if curr in _VOWELS:
        return "A"
    if curr == "Q":
        return "G"
    if curr == "Z":
        return "S"
    if curr == "M":
        return "N"
    if curr == "K":
        return "NN" if nxt == "N" else "C"
    if curr == "S" and nxt == "C" and anext == "H":
        return "SSS"
    if curr == "P" and nxt == "H":
        return "FF"
    if curr == "H" and (prev not in _VOWELS or nxt not in _VOWELS):
        return prev
    if curr == "W" and prev in _VOWELS:
        return prev
    return curr


def nysiis(term: str, strict: bool = True) -> str:
    name = _clean(term)
    if not name:
        return term
    for pat, rep in _NYSIIS_FIRST:  # sequential replaceFirst, like the codec
        name = pat.sub(rep, name, count=1)
    for pat, rep in _NYSIIS_LAST:
        name = pat.sub(rep, name, count=1)
    chars = list(name)
    key = [chars[0]]
    for i in range(1, len(chars)):
        nxt = chars[i + 1] if i < len(chars) - 1 else " "
        anext = chars[i + 2] if i < len(chars) - 2 else " "
        t = _nysiis_transcode(chars[i - 1], chars[i], nxt, anext)
        for j, tc in enumerate(t):
            if i + j < len(chars):
                chars[i + j] = tc
        if chars[i] != chars[i - 1]:
            key.append(chars[i])
    if len(key) > 1:
        if key[-1] == "S":
            key.pop()
        if len(key) > 2 and key[-2] == "A" and key[-1] == "Y":
            del key[-2]
        if len(key) > 1 and key[-1] == "A":
            key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Kölner Phonetik (Postel 1969; commons-codec ColognePhonetic)
# ---------------------------------------------------------------------------

_UMLAUT = str.maketrans({"Ä": "A", "Ö": "O", "Ü": "U", "ß": "S"})


def cologne(term: str) -> str:
    txt = "".join(
        c for c in term.upper().translate(_UMLAUT) if "A" <= c <= "Z")
    if not txt:
        return term
    digits: list[str] = []
    n = len(txt)
    for i, c in enumerate(txt):
        nxt = txt[i + 1] if i + 1 < n else ""
        prev = txt[i - 1] if i > 0 else ""
        if c in "AEIJOUY":
            d = "0"
        elif c == "B":
            d = "1"
        elif c == "P":
            d = "3" if nxt == "H" else "1"
        elif c in "DT":
            d = "8" if nxt in ("C", "S", "Z") else "2"
        elif c in "FVW":
            d = "3"
        elif c in "GKQ":
            d = "4"
        elif c == "C":
            if i == 0:
                d = "4" if (nxt and nxt in "AHKLOQRUX") else "8"
            elif prev and prev in "SZ":
                d = "8"
            else:
                d = "4" if (nxt and nxt in "AHKOQUX") else "8"
        elif c == "X":
            d = "8" if (prev and prev in "CKQ") else "48"
        elif c == "L":
            d = "5"
        elif c in "MN":
            d = "6"
        elif c == "R":
            d = "7"
        elif c in "SZ":
            d = "8"
        else:  # H
            continue
        digits.append(d)
    flat = "".join(digits)
    out: list[str] = []
    for i, d in enumerate(flat):
        if i > 0 and flat[i - 1] == d:
            continue
        out.append(d)
    code = out[:1] + [d for d in out[1:] if d != "0"]
    return "".join(code) or term
