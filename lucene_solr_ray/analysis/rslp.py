"""RSLP stemmer engine (``analysis/pt/RSLPStemmerBase.java``) + the
Galician and Portuguese-RSLP stemmers built on it
(``gl/GalicianStemmer.java``, ``pt/PortugueseStemmer.java``).

The rule descriptions in ``data/{galician,portuguese}.rslp`` are the
reference's published RSLP rule data (Orengo & Huyck's RSLP algorithm /
the RSLG adaptation; shipped unmodified from the reference resources,
Apache-2.0). Each step is an ordered rule list: ``(suffix, min_stem,
replacement, exceptions)``; a step fires at most ONE rule. Step header
flag ``B`` selects whole-word (1) vs ends-with (0) exception matching.
"""
from __future__ import annotations

import os
import re
from functools import lru_cache

_HEADER = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*$')
_STRIP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))$')
_REP = re.compile(r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\}\s*(,|(\}\s*;))$')
_EXC = re.compile(
    r'^\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))$'
)


class _Rule:
    __slots__ = ("suffix", "min", "replacement", "exc_words", "exc_suffixes")

    def __init__(self, suffix, min_, replacement, exc, whole_word):
        self.suffix = suffix
        self.min = min_
        self.replacement = replacement
        self.exc_words = frozenset(exc) if (exc and whole_word) else None
        self.exc_suffixes = tuple(exc) if (exc and not whole_word) else None

    def apply(self, s: str):
        """Return the rewritten word, or None if the rule doesn't match."""
        if not s.endswith(self.suffix):
            return None
        if len(s) - len(self.suffix) < self.min:
            return None
        if self.exc_words is not None and s in self.exc_words:
            return None
        if self.exc_suffixes is not None and s.endswith(self.exc_suffixes):
            return None
        return s[: -len(self.suffix)] + self.replacement


class _Step:
    __slots__ = ("name", "rules", "min", "suffixes")

    def __init__(self, name, rules, min_, suffixes):
        self.name = name
        self.rules = rules
        if min_ == 0:
            min_ = min(r.min + len(r.suffix) for r in rules)
        self.min = min_
        self.suffixes = tuple(suffixes) if suffixes else None

    def apply(self, s: str) -> str:
        if len(s) < self.min:
            return s
        if self.suffixes is not None and not s.endswith(self.suffixes):
            return s
        for r in self.rules:
            out = r.apply(s)
            if out is not None:
                return out
        return s


def _parse_list(s: str):
    if not s.strip():
        return None
    return [x.strip()[1:-1] for x in s.split(",")]


@lru_cache(maxsize=None)
def _load(resource: str) -> dict:
    """Parse a .rslp description (same grammar as RSLPStemmerBase.parse)."""
    path = os.path.join(os.path.dirname(__file__), "data", resource)
    steps: dict[str, _Step] = {}
    lines = [
        ln.strip()
        for ln in open(path, encoding="utf-8")
        if ln.strip() and not ln.strip().startswith("#")
    ]
    i = 0
    while i < len(lines):
        m = _HEADER.match(lines[i])
        if not m:
            raise ValueError(f"bad step header at {resource}:{i}: {lines[i]}")
        name, min_, whole = m.group(1), int(m.group(2)), m.group(3) == "1"
        conds = _parse_list(m.group(4))
        i += 1
        rules: list[_Rule] = []
        while i < len(lines):
            line = lines[i]
            i += 1
            if (m := _STRIP.match(line)) is not None:
                rules.append(_Rule(m.group(1), int(m.group(2)), "", None, whole))
            elif (m := _REP.match(line)) is not None:
                rules.append(
                    _Rule(m.group(1), int(m.group(2)), m.group(3), None, whole)
                )
            elif (m := _EXC.match(line)) is not None:
                rules.append(
                    _Rule(m.group(1), int(m.group(2)), m.group(3),
                          _parse_list(m.group(4)), whole)
                )
            else:
                raise ValueError(f"bad rule at {resource}: {line}")
            if line.endswith(";"):
                break
        steps[name] = _Step(name, rules, min_, conds)
    return steps


_GL_ACCENTS = str.maketrans("áéêíóú", "aeeiou")
_PT_ACCENTS = str.maketrans(
    "àáâãäåçèéêëìíîïñòóôõöùúûüýÿ", "aaaaaaceeeeiiiinooooouuuuyy"
)


def galician_stem(term: str) -> str:
    """GalicianStemmer (``gl/GalicianStemmer.java:53-82``): Plural →
    Unification → Adverb → Augmentative (repeat until fixed) → Noun or
    Verb → Vowel → RSLG accent removal."""
    steps = _load("galician.rslp")
    s = steps["Plural"].apply(term)
    s = steps["Unification"].apply(s)
    s = steps["Adverb"].apply(s)
    while True:
        t = steps["Augmentative"].apply(s)
        if t == s:
            break
        s = t
    t = steps["Noun"].apply(s)
    if t == s:
        t = steps["Verb"].apply(s)
    s = steps["Vowel"].apply(t)
    return s.translate(_GL_ACCENTS)


def portuguese_rslp_stem(term: str) -> str:
    """PortugueseStemmer (``pt/PortugueseStemmer.java:47-100``, the full
    RSLP): Plural → Adverb → Feminine → Augmentative → Noun, else Verb,
    else Vowel → accent removal."""
    steps = _load("portuguese.rslp")
    s = steps["Plural"].apply(term)
    s = steps["Adverb"].apply(s)
    s = steps["Feminine"].apply(s)
    s = steps["Augmentative"].apply(s)
    t = steps["Noun"].apply(s)
    if t == s:
        t = steps["Verb"].apply(s)
        if t == s:
            t = steps["Vowel"].apply(s)
    return t.translate(_PT_ACCENTS)


def portuguese_minimal_stem(term: str) -> str:
    """PortugueseMinimalStemmer (``pt/PortugueseMinimalStemmer.java``):
    just the RSLP Plural step."""
    return _load("portuguese.rslp")["Plural"].apply(term)


def galician_minimal_stem(term: str) -> str:
    """GalicianMinimalStemmer (``gl/GalicianMinimalStemmer.java``):
    just the RSLG Plural step."""
    return _load("galician.rslp")["Plural"].apply(term)
