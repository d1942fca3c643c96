"""Daitch–Mokotoff Soundex.

The standard D-M coding chart (Mokotoff/Daitch, as implemented by
commons-codec's ``DaitchMokotoffSoundex`` behind the reference's
``analysis/phonetic/DaitchMokotoffSoundexFilter.java``): longest-match
letter groups coded by context (word start / before vowel / other), with
BRANCHING alternates (C → K|TS, CH → KH|TCH, CK → K|TSK, J → Y|DZH,
RS/RZ → RTZ|ZH), adjacent equal codes collapsed unless a vowel intervenes,
codes padded/truncated to 6 digits, and the final branch set deduplicated
and sorted ascending — pinned by the reference's own filter test vectors
(``TestDaitchMokotoffSoundexFilter.java``: aaa→000000, bbb→700000,
ccc→{400000,450000,454000,540000,545000,500000}, easgasg→045450).
"""

from __future__ import annotations

VOWELS = set("AEIOUY")

#: (pattern, code_at_start, code_before_vowel, code_otherwise); branching
#: entries carry tuples of alternatives. None = not coded (NC).
_RULES: dict[str, list[tuple[str, object, object, object]]] = {}


def _rule(pattern: str, start, vowel, other) -> None:
    _RULES.setdefault(pattern[0], []).append((pattern, start, vowel, other))


for p in ("AI", "AJ", "AY", "EI", "EJ", "EY", "OI", "OJ", "OY", "UI", "UJ", "UY"):
    _rule(p, "0", "1", None)
_rule("AU", "0", "7", None)
_rule("A", "0", None, None)
_rule("B", "7", "7", "7")
_rule("CHS", "5", "54", "54")
_rule("CSZ", "4", "4", "4")
_rule("CZS", "4", "4", "4")
_rule("CH", ("5", "4"), ("5", "4"), ("5", "4"))      # KH | TCH
_rule("CK", ("5", "45"), ("5", "45"), ("5", "45"))   # K | TSK
_rule("CZ", "4", "4", "4")
_rule("CS", "4", "4", "4")
_rule("C", ("5", "4"), ("5", "4"), ("5", "4"))       # K | TS
_rule("DRZ", "4", "4", "4")
_rule("DRS", "4", "4", "4")
_rule("DSH", "4", "4", "4")
_rule("DSZ", "4", "4", "4")
_rule("DZH", "4", "4", "4")
_rule("DZS", "4", "4", "4")
_rule("DS", "4", "4", "4")
_rule("DZ", "4", "4", "4")
_rule("DT", "3", "3", "3")
_rule("D", "3", "3", "3")
_rule("EU", "1", "1", None)
_rule("E", "0", None, None)
_rule("FB", "7", "7", "7")
_rule("F", "7", "7", "7")
_rule("G", "5", "5", "5")
_rule("H", "5", "5", None)
for p in ("IA", "IE", "IO", "IU"):
    _rule(p, "1", None, None)
_rule("I", "0", None, None)
_rule("J", ("1", "4"), (None, "4"), (None, "4"))     # Y | DZH
_rule("KS", "5", "54", "54")
_rule("KH", "5", "5", "5")
_rule("K", "5", "5", "5")
_rule("L", "8", "8", "8")
_rule("MN", "66", "66", "66")
_rule("M", "6", "6", "6")
_rule("NM", "66", "66", "66")
_rule("N", "6", "6", "6")
_rule("O", "0", None, None)
_rule("PF", "7", "7", "7")
_rule("PH", "7", "7", "7")
_rule("P", "7", "7", "7")
_rule("Q", "5", "5", "5")
_rule("RZ", ("94", "4"), ("94", "4"), ("94", "4"))   # RTZ | ZH
_rule("RS", ("94", "4"), ("94", "4"), ("94", "4"))
_rule("R", "9", "9", "9")
for p in ("SCHTSCH", "SCHTSH", "SCHTCH", "SHTCH", "SHCH", "SHTSH",
          "STCH", "STSCH", "STSH", "STRZ", "STRS", "SZCZ", "SZCS"):
    _rule(p, "2", "4", "4")
for p in ("SHT", "SCHT", "SCHD", "SZT", "SHD", "SZD", "SD"):
    _rule(p, "2", "43", "43")
_rule("SCH", "4", "4", "4")
_rule("SH", "4", "4", "4")
_rule("SC", "2", "4", "4")
_rule("ST", "2", "43", "43")
_rule("SZ", "4", "4", "4")
_rule("S", "4", "4", "4")
for p in ("TTCH", "TTSCH", "TCH", "TSCH", "TSH", "TTS", "TTSZ", "TSZ",
          "TTZ", "TZS", "TS", "TZ", "TC", "TRZ", "TRS"):
    _rule(p, "4", "4", "4")
_rule("TH", "3", "3", "3")
_rule("T", "3", "3", "3")
_rule("UE", "0", None, None)
_rule("U", "0", None, None)
_rule("V", "7", "7", "7")
_rule("W", "7", "7", "7")
_rule("X", "5", "54", "54")
_rule("Y", "1", None, None)
for p in ("ZHDZH", "ZDZH", "ZDZ"):
    _rule(p, "2", "4", "4")
for p in ("ZHD", "ZD"):
    _rule(p, "2", "43", "43")
for p in ("ZSCH", "ZSH", "ZH", "ZS"):
    _rule(p, "4", "4", "4")
_rule("Z", "4", "4", "4")

for k in _RULES:  # longest match first
    _RULES[k].sort(key=lambda r: -len(r[0]))

MAX_LENGTH = 6
_MAX_BRANCHES = 32  # safety valve (C-heavy strings branch exponentially)


def dm_soundex(value: str) -> list[str]:
    """→ sorted list of 6-digit D-M codes (one per surviving branch);
    empty list when the input has no codable letters."""
    s = "".join(c for c in value.upper() if "A" <= c <= "Z")
    if not s:
        return []
    n = len(s)
    # branch state: (digits_so_far, last_code_or_None)
    branches: list[tuple[str, str | None]] = [("", None)]
    i = 0
    while i < n:
        rules = _RULES.get(s[i], ())
        match = None
        for pattern, c_start, c_vowel, c_other in rules:
            if s.startswith(pattern, i):
                match = (pattern, c_start, c_vowel, c_other)
                break
        if match is None:
            i += 1
            continue
        pattern, c_start, c_vowel, c_other = match
        j = i + len(pattern)
        if i == 0:
            code = c_start
        elif j < n and s[j] in VOWELS:
            code = c_vowel
        else:
            code = c_other
        alts = code if isinstance(code, tuple) else (code,)
        # a vowel (coded or not) separates equal adjacent codes
        separated = i > 0 and s[i - 1] in VOWELS
        nxt: list[tuple[str, str | None]] = []
        for digits, last in branches:
            for alt in alts:
                if alt is None:
                    # not coded: vowels still reset the dedup via `separated`
                    nxt.append((digits, None if s[i] in VOWELS else last))
                elif alt == last and not separated:
                    nxt.append((digits, last))
                else:
                    nxt.append((digits + alt, alt))
        # dedup identical branch states; cap runaway branching
        branches = list(dict.fromkeys(nxt))[:_MAX_BRANCHES]
        i = j
    # inputs that produced no digits (e.g. all-H strings) still code as zeros
    return sorted({(d + "000000")[:MAX_LENGTH] for d, _ in branches})
