"""Porter stemming algorithm — PorterStemFilter analog.

Semantics ported from the reference implementation
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java``,
itself Release 3 of Porter 1980 with the two marked bug fixes):

- words of length <= 2 are returned unchanged (``stem(int):479`` requires
  ``k > k0+1`` before any step runs);
- step1 plurals/-ed/-ing (``:254-277``), step2 y->i (``:281-286``),
  step3 double suffices (``:292-332`` — including the ``logi -> log`` rule),
  step4 -ic-/-ful/-ness (``:336-354``), step5 tail suffixes at m()>1
  (``:358-409`` with the Bug-2 ``j >= 0`` guard on ``ion``), step6 final -e /
  -ll (``:413-422``);
- ``cons()`` treats any non-aeiou char as a consonant ('y' context-dependent,
  ``:111-120``) — digits and '_' in code-like tokens therefore count as
  consonants, matching the reference byte-for-byte.

The stemmer is applied per *unique* term (the analysis chain maps
vocabularies, not token streams), so a process-wide memo keeps the cost
negligible next to tokenization.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _cons(b: str, i: int) -> bool:
    c = b[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _cons(b, i - 1)
    return True


def _m(b: str, j: int) -> int:
    """Number of consonant sequences in b[0..j]."""
    n = 0
    i = 0
    while True:
        if i > j:
            return n
        if not _cons(b, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _cons(b, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _cons(b, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(b: str, j: int) -> bool:
    return any(not _cons(b, i) for i in range(j + 1))


def _doublec(b: str, j: int) -> bool:
    if j < 1:
        return False
    if b[j] != b[j - 1]:
        return False
    return _cons(b, j)


def _cvc(b: str, i: int) -> bool:
    if i < 2 or not _cons(b, i) or _cons(b, i - 1) or not _cons(b, i - 2):
        return False
    return b[i] not in "wxy"


class _State:
    __slots__ = ("b", "k", "j")

    def __init__(self, word: str):
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        for i in range(l):
            if self.b[o + i] != s[i]:
                return False
        self.j = self.k - l
        return True

    def setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            self.b[o + i] = ch
        self.k = self.j + len(s)

    def r(self, s: str) -> None:
        if _m("".join(self.b), self.j) > 0:
            self.setto(s)

    def stem_str(self) -> str:
        return "".join(self.b[: self.k + 1])


def _step1(st: _State) -> None:
    b = st.b
    if b[st.k] == "s":
        if st.ends("sses"):
            st.k -= 2
        elif st.ends("ies"):
            st.setto("i")
        elif b[st.k - 1] != "s":
            st.k -= 1
    if st.ends("eed"):
        if _m("".join(st.b), st.j) > 0:
            st.k -= 1
    elif (st.ends("ed") or st.ends("ing")) and _vowel_in_stem("".join(st.b), st.j):
        st.k = st.j
        if st.ends("at"):
            st.setto("ate")
        elif st.ends("bl"):
            st.setto("ble")
        elif st.ends("iz"):
            st.setto("ize")
        elif _doublec("".join(st.b), st.k):
            ch = st.b[st.k]
            st.k -= 1
            if ch in ("l", "s", "z"):
                st.k += 1
        elif _m("".join(st.b), st.k) == 1 and _cvc("".join(st.b), st.k):
            st.j = st.k
            st.setto("e")


def _step2(st: _State) -> None:
    if st.ends("y") and _vowel_in_stem("".join(st.b), st.j):
        st.b[st.k] = "i"


_STEP3 = {
    "a": (("ational", "ate"), ("tional", "tion")),
    "c": (("enci", "ence"), ("anci", "ance")),
    "e": (("izer", "ize"),),
    "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
    "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
    "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
    "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
    "g": (("logi", "log"),),
}

_STEP4 = {
    "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
    "i": (("iciti", "ic"),),
    "l": (("ical", "ic"), ("ful", "")),
    "s": (("ness", ""),),
}

_STEP5 = {
    "a": ("al",),
    "c": ("ance", "ence"),
    "e": ("er",),
    "i": ("ic",),
    "l": ("able", "ible"),
    "n": ("ant", "ement", "ment", "ent"),
    "o": ("ion", "ou"),
    "s": ("ism",),
    "t": ("ate", "iti"),
    "u": ("ous",),
    "v": ("ive",),
    "z": ("ize",),
}


def _suffix_table(st: _State, table) -> None:
    if st.k == 0:
        return  # Bug-1 guard
    rules = table.get(st.b[st.k - 1] if table is _STEP3 else st.b[st.k])
    if not rules:
        return
    for suf, rep in rules:
        if st.ends(suf):
            st.r(rep)
            return


def _step5(st: _State) -> None:
    if st.k == 0:
        return  # Bug-1 guard
    rules = _STEP5.get(st.b[st.k - 1])
    if not rules:
        return
    for suf in rules:
        if st.ends(suf):
            if suf == "ion" and not (st.j >= 0 and st.b[st.j] in ("s", "t")):
                return  # Bug-2 guard: 'ion' needs preceding s/t
            break
    else:
        return
    if _m("".join(st.b), st.j) > 1:
        st.k = st.j


def _step6(st: _State) -> None:
    st.j = st.k
    b = "".join(st.b)
    if st.b[st.k] == "e":
        a = _m(b, st.k)  # j == k here
        if a > 1 or (a == 1 and not _cvc(b, st.k - 1)):
            st.k -= 1
    # the -ll branch measures m() against j (the ENTRY k), even if the -e
    # branch just shortened the word — reference PorterStemmer.java:413-422
    if st.b[st.k] == "l" and _doublec("".join(st.b), st.k) and _m(b, st.j) > 1:
        st.k -= 1


_MEMO: dict[str, str] = {}


def porter_stem(word: str) -> str:
    """Stem one lowercase token. Length <= 2 → unchanged (reference ``:479``)."""
    if len(word) <= 2:
        return word
    hit = _MEMO.get(word)
    if hit is not None:
        return hit
    st = _State(word)
    _step1(st)
    _step2(st)
    _suffix_table(st, _STEP3)
    _suffix_table(st, _STEP4)
    _step5(st)
    _step6(st)
    out = st.stem_str()
    if len(_MEMO) < 1_000_000:
        _MEMO[word] = out
    return out
