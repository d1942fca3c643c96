"""Double Metaphone phonetic encoder.

Implements Lawrence Philips' Double Metaphone algorithm (published in
C/C++ Users Journal, June 2000; the de-facto spec implemented by
commons-codec's ``DoubleMetaphone``, which backs the reference's
``analysis/phonetic/DoubleMetaphoneFilter.java``). Returns a
``(primary, alternate)`` pair of codes truncated to ``max_code_len``
(commons-codec default 4); the alternate equals the primary when no
ambiguity arose. Output is pinned by the reference repo's own filter test
vectors (``DoubleMetaphoneFilterTest.java``: international → ANTR /
ANTRNXNL, Kuczewski → KSSK + KXFS, hello → HL, non-letters → empty).
"""

from __future__ import annotations

VOWELS = "AEIOUY"


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in VOWELS


def _contains(s: str, start: int, length: int, *opts: str) -> bool:
    if start < 0 or start + length > len(s):
        return False
    frag = s[start:start + length]
    return frag in opts


def _slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


def double_metaphone(value: str, max_code_len: int = 4) -> tuple[str, str]:
    # commons-codec cleanInput: trim + uppercase (it KEEPS spaces, which the
    # VAN/VON/SAN and "word boundary" contexts below rely on); other
    # non-letters drop. Space runs collapse to one.
    raw = "".join(
        c if "A" <= c <= "Z" else " " for c in value.upper()
    )
    s = " ".join(p for p in raw.split(" ") if p != "") if raw.strip() else ""
    if not s:
        return "", ""
    slavo = _slavo_germanic(s)
    n = len(s)
    last = n - 1
    pri: list[str] = []
    alt: list[str] = []

    def add(p: str, a: str | None = None) -> None:
        if len(pri) < max_code_len:
            pri.append(p)
        aa = p if a is None else a
        if aa and len(alt) < max_code_len:
            alt.append(aa)

    def add_alt_only(a: str) -> None:
        if len(alt) < max_code_len:
            alt.append(a)

    def add_pri_only(p: str) -> None:
        if len(pri) < max_code_len:
            pri.append(p)

    i = 0
    # silent initial letters
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    # initial X sounds like S (Xavier)
    if s[0] == "X":
        add("S")
        i = 1

    while i < n and (len(pri) < max_code_len or len(alt) < max_code_len):
        c = s[i]
        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
        elif c == "B":
            add("P")
            i += 2 if _contains(s, i + 1, 1, "B") else 1
        elif c == "C":
            # various Germanic / CH / CI / CC special cases
            if i > 1 and not _is_vowel(s, i - 2) and _contains(s, i - 1, 3, "ACH") \
                    and (not _contains(s, i + 2, 1, "I")) \
                    and (not _contains(s, i + 2, 1, "E")
                         or _contains(s, i - 2, 6, "BACHER", "MACHER")):
                add("K")
                i += 2
            elif i == 0 and _contains(s, i, 6, "CAESAR"):
                add("S")
                i += 2
            elif _contains(s, i, 4, "CHIA"):
                add("K")
                i += 2
            elif _contains(s, i, 2, "CH"):
                if i > 0 and _contains(s, i, 4, "CHAE"):
                    add("K", "X")
                elif i == 0 and (_contains(s, i + 1, 5, "HARAC", "HARIS")
                                 or _contains(s, i + 1, 3, "HOR", "HYM", "HIA", "HEM")) \
                        and not _contains(s, 0, 5, "CHORE"):
                    add("K")
                elif (_contains(s, 0, 4, "VAN ", "VON ") or _contains(s, 0, 3, "SCH")
                      or _contains(s, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                      or _contains(s, i + 2, 1, "T", "S")
                      or ((i == 0 or _contains(s, i - 1, 1, "A", "O", "U", "E"))
                          and (i + 2 > last
                               or _contains(s, i + 2, 1, "L", "R", "N", "M",
                                            "B", "H", "F", "V", "W")))):
                    add("K")
                else:
                    if i > 0:
                        if _contains(s, 0, 2, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
            elif _contains(s, i, 2, "CZ") and not _contains(s, i - 2, 4, "WICZ"):
                add("S", "X")
                i += 2
            elif _contains(s, i + 1, 3, "CIA"):
                add("X")
                i += 3
            elif _contains(s, i, 2, "CC") and not (i == 1 and s[0] == "M"):
                if _contains(s, i + 2, 1, "I", "E", "H") \
                        and not _contains(s, i + 2, 2, "HU"):
                    if (i == 1 and _contains(s, i - 1, 1, "A")) \
                            or _contains(s, i - 1, 5, "UCCEE", "UCCES"):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                else:
                    add("K")
                    i += 2
            elif _contains(s, i, 2, "CK", "CG", "CQ"):
                add("K")
                i += 2
            elif _contains(s, i, 2, "CI", "CE", "CY"):
                if _contains(s, i, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
            else:
                add("K")
                if _contains(s, i + 1, 2, " C", " Q", " G"):
                    i += 3
                elif _contains(s, i + 1, 1, "C", "K", "Q") \
                        and not _contains(s, i + 1, 2, "CE", "CI"):
                    i += 2
                else:
                    i += 1
        elif c == "D":
            if _contains(s, i, 2, "DG"):
                if _contains(s, i + 2, 1, "I", "E", "Y"):
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
            elif _contains(s, i, 2, "DT", "DD"):
                add("T")
                i += 2
            else:
                add("T")
                i += 1
        elif c == "F":
            add("F")
            i += 2 if _contains(s, i + 1, 1, "F") else 1
        elif c == "G":
            if _contains(s, i + 1, 1, "H"):
                # GH cluster
                if i > 0 and not _is_vowel(s, i - 1):
                    add("K")
                    i += 2
                elif i == 0:
                    if _contains(s, i + 2, 1, "I"):
                        add("J")
                    else:
                        add("K")
                    i += 2
                elif (i > 1 and _contains(s, i - 2, 1, "B", "H", "D")) \
                        or (i > 2 and _contains(s, i - 3, 1, "B", "H", "D")) \
                        or (i > 3 and _contains(s, i - 4, 1, "B", "H")):
                    i += 2  # silent GH (e.g. "hugh")
                else:
                    if i > 2 and _contains(s, i - 1, 1, "U") \
                            and _contains(s, i - 3, 1, "C", "G", "L", "R", "T"):
                        add("F")  # laugher, cough
                    elif i > 0 and not _contains(s, i - 1, 1, "I"):
                        add("K")
                    i += 2
            elif _contains(s, i + 1, 1, "N"):
                if i == 1 and _is_vowel(s, 0) and not slavo:
                    add("KN", "N")
                elif not _contains(s, i + 2, 2, "EY") \
                        and not _contains(s, i + 1, 1, "Y") and not slavo:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
            elif _contains(s, i + 1, 2, "LI") and not slavo:
                add("KL", "L")
                i += 2
            elif i == 0 and (_contains(s, i + 1, 1, "Y")
                             or _contains(s, i + 1, 2, "ES", "EP", "EB", "EL", "EY",
                                          "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
            elif (_contains(s, i + 1, 2, "ER") or _contains(s, i + 1, 1, "Y")) \
                    and not _contains(s, 0, 6, "DANGER", "RANGER", "MANGER") \
                    and not _contains(s, i - 1, 1, "E", "I") \
                    and not _contains(s, i - 1, 3, "RGY", "OGY"):
                add("K", "J")
                i += 2
            elif _contains(s, i + 1, 1, "E", "I", "Y") \
                    or _contains(s, i - 1, 4, "AGGI", "OGGI"):
                if _contains(s, 0, 4, "VAN ", "VON ") or _contains(s, 0, 3, "SCH") \
                        or _contains(s, i + 1, 2, "ET"):
                    add("K")
                elif _contains(s, i + 1, 3, "IER"):
                    add("J")
                else:
                    add("J", "K")
                i += 2
            else:
                add("K")
                i += 2 if _contains(s, i + 1, 1, "G") else 1
        elif c == "H":
            # keep H only between vowels or after silent-start handling
            if (i == 0 or _is_vowel(s, i - 1)) and _is_vowel(s, i + 1):
                add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            if _contains(s, i, 4, "JOSE") or _contains(s, 0, 4, "SAN "):
                # handleJ (commons-codec): H when "jose " follows, the WHOLE
                # input is the 4-letter "jose", or it starts with "san "
                if (i == 0 and ((i + 4 <= n and s[i + 4:i + 5] == " ") or n == 4)) \
                        or _contains(s, 0, 4, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                i += 1
            else:
                if i == 0 and not _contains(s, i, 4, "JOSE"):
                    add("J", "A")
                elif _is_vowel(s, i - 1) and not slavo \
                        and _contains(s, i + 1, 1, "A", "O"):
                    add("J", "H")
                elif i == last:
                    add_pri_only("J")
                elif not _contains(s, i + 1, 1, "L", "T", "K", "S", "N", "M",
                                   "B", "Z") \
                        and not _contains(s, i - 1, 1, "S", "K", "L"):
                    add("J")
                i += 2 if _contains(s, i + 1, 1, "J") else 1
        elif c == "K":
            add("K")
            i += 2 if _contains(s, i + 1, 1, "K") else 1
        elif c == "L":
            if _contains(s, i + 1, 1, "L"):
                # Spanish-style final ILLO/ILLA/ALLE or ALLE + AS/OS final
                if (i == n - 3 and _contains(s, i - 1, 4, "ILLO", "ILLA", "ALLE")) \
                        or ((_contains(s, last - 1, 2, "AS", "OS")
                             or _contains(s, last, 1, "A", "O"))
                            and _contains(s, i - 1, 4, "ALLE")):
                    add_pri_only("L")
                    i += 2
                    continue
                add("L")
                i += 2
            else:
                add("L")
                i += 1
        elif c == "M":
            add("M")
            if _contains(s, i - 1, 3, "UMB") \
                    and (i + 1 == last or _contains(s, i + 2, 2, "ER")) \
                    or _contains(s, i + 1, 1, "M"):
                i += 2
            else:
                i += 1
        elif c == "N":
            add("N")
            i += 2 if _contains(s, i + 1, 1, "N") else 1
        elif c == "P":
            if _contains(s, i + 1, 1, "H"):
                add("F")
                i += 2
            else:
                add("P")
                i += 2 if _contains(s, i + 1, 1, "P", "B") else 1
        elif c == "Q":
            add("K")
            i += 2 if _contains(s, i + 1, 1, "Q") else 1
        elif c == "R":
            # french final -IER
            if i == last and not slavo and _contains(s, i - 2, 2, "IE") \
                    and not _contains(s, i - 4, 2, "ME", "MA"):
                add_alt_only("R")
            else:
                add("R")
            i += 2 if _contains(s, i + 1, 1, "R") else 1
        elif c == "S":
            if _contains(s, i - 1, 3, "ISL", "YSL"):
                i += 1  # silent: island, isle
            elif i == 0 and _contains(s, i, 5, "SUGAR"):
                add("X", "S")
                i += 1
            elif _contains(s, i, 2, "SH"):
                if _contains(s, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # Germanic
                else:
                    add("X")
                i += 2
            elif _contains(s, i, 3, "SIO", "SIA") or _contains(s, i, 4, "SIAN"):
                if slavo:
                    add("S")
                else:
                    add("S", "X")
                i += 3
            elif (i == 0 and _contains(s, i + 1, 1, "M", "N", "L", "W")) \
                    or _contains(s, i + 1, 1, "Z"):
                add("S", "X")
                i += 2 if _contains(s, i + 1, 1, "Z") else 1
            elif _contains(s, i, 2, "SC"):
                if _contains(s, i + 2, 1, "H"):
                    if _contains(s, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if _contains(s, i + 3, 2, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and not _is_vowel(s, 3) and s[3:4] != "W":
                            add("X", "S")
                        else:
                            add("X")
                elif _contains(s, i + 2, 1, "I", "E", "Y"):
                    add("S")
                else:
                    add("SK")
                i += 3
            else:
                if i == last and _contains(s, i - 2, 2, "AI", "OI"):
                    add_alt_only("S")  # french: resnais, artois
                else:
                    add("S")
                i += 2 if _contains(s, i + 1, 1, "S", "Z") else 1
        elif c == "T":
            if _contains(s, i, 4, "TION"):
                add("X")
                i += 3
            elif _contains(s, i, 3, "TIA", "TCH"):
                add("X")
                i += 3
            elif _contains(s, i, 2, "TH") or _contains(s, i, 3, "TTH"):
                if _contains(s, i + 2, 2, "OM", "AM") \
                        or _contains(s, 0, 4, "VAN ", "VON ") \
                        or _contains(s, 0, 3, "SCH"):
                    add("T")
                else:
                    add("0", "T")
                i += 2
            else:
                add("T")
                i += 2 if _contains(s, i + 1, 1, "T", "D") else 1
        elif c == "V":
            add("F")
            i += 2 if _contains(s, i + 1, 1, "V") else 1
        elif c == "W":
            if _contains(s, i, 2, "WR"):
                add("R")
                i += 2
            elif i == 0 and (_is_vowel(s, i + 1) or _contains(s, i, 2, "WH")):
                if _is_vowel(s, i + 1):
                    add("A", "F")
                else:
                    add("A")
                i += 1
            elif (i == last and _is_vowel(s, i - 1)) \
                    or _contains(s, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") \
                    or _contains(s, 0, 3, "SCH"):
                add_alt_only("F")
                i += 1
            elif _contains(s, i, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
            else:
                i += 1  # else skip
        elif c == "X":
            if not (i == last and (_contains(s, i - 3, 3, "IAU", "EAU")
                                   or _contains(s, i - 2, 2, "AU", "OU"))):
                add("KS")
            i += 2 if _contains(s, i + 1, 1, "C", "X") else 1
        elif c == "Z":
            if _contains(s, i + 1, 1, "H"):
                add("J")
                i += 2
            else:
                if _contains(s, i + 1, 2, "ZO", "ZI", "ZA") \
                        or (slavo and i > 0 and s[i - 1] != "T"):
                    add("S", "TS")
                else:
                    add("S")
                i += 2 if _contains(s, i + 1, 1, "Z") else 1
        else:
            i += 1

    return "".join(pri)[:max_code_len], "".join(alt)[:max_code_len]
