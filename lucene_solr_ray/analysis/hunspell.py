"""Hunspell dictionary stemming — a faithful re-implementation of the
reference's ``lucene/analysis/common/src/java/org/apache/lucene/analysis/
hunspell/{Dictionary,Stemmer}.java`` semantics (NOT full hunspell: exactly
the feature set Lucene 7.7 supports — PFX/SFX with conditions and
continuation classes, FLAG long/num, AF/AM aliases, KEEPCASE, CIRCUMFIX,
NEEDAFFIX/PSEUDOROOT, ONLYINCOMPOUND, IGNORE, ICONV/OCONV, FULLSTRIP,
COMPLEXPREFIXES, LANG tr_TR/az_AZ alternate casing, escapes, morphological
``st:`` stem exceptions). Validated against the reference's own
hunspell test dictionaries (tests/test_hunspell.py).

The reference builds FSTs over affix strings and an offline-sorted word
FST; this implementation uses plain dicts keyed by affix/entry strings —
the lookup semantics (all prefix/suffix lengths tried, zero affix
included, FULLSTRIP gating the empty-stem case) are identical.
"""

from __future__ import annotations

import re

__all__ = ["HunspellDictionary", "HunspellStemmer"]

_WS = re.compile(r"\s+")


def _parse_flags(raw: str, mode: str) -> tuple[int, ...]:
    """FlagParsingStrategy: UTF-8 (one char per flag), long (two ASCII
    chars combined), num (comma-separated integers)."""
    if not raw:
        return ()
    if mode == "num":
        out = []
        for part in raw.strip().split(","):
            digits = re.sub(r"[^0-9]", "", part)
            if digits:
                out.append(int(digits))
        return tuple(out)
    if mode == "long":
        if len(raw) % 2 == 1:
            raise ValueError(f"Invalid flags (odd length): {raw!r}")
        return tuple(
            (ord(raw[i]) << 8) | ord(raw[i + 1])
            for i in range(0, len(raw), 2)
        )
    return tuple(ord(c) for c in raw)


def _escape_dash(cond: str) -> str:
    out = []
    for i, ch in enumerate(cond):
        if ch == "-" and (i == 0 or cond[i - 1] != "\\"):
            out.append("\\-")
        else:
            out.append(ch)
    return "".join(out)


class _Affix:
    __slots__ = ("flag", "strip", "pattern", "append_flags", "cross",
                 "ord")

    def __init__(self, flag, strip, pattern, append_flags, cross, ord_):
        self.flag = flag
        self.strip = strip
        self.pattern = pattern          # compiled regex or None (".*")
        self.append_flags = append_flags
        self.cross = cross
        self.ord = ord_


class HunspellDictionary:
    """Parses .aff/.dic content (strings) per Dictionary.java."""

    def __init__(self, aff: str, dics: list[str] | str,
                 ignore_case: bool = False):
        if isinstance(dics, str):
            dics = [dics]
        self.ignore_case = ignore_case
        self.flag_mode = "utf8"
        self.prefixes: dict[str, list[_Affix]] = {}
        self.suffixes: dict[str, list[_Affix]] = {}
        self.keepcase: int | None = None
        self.circumfix: int | None = None
        self.needaffix: int | None = None
        self.onlyincompound: int | None = None
        self.ignore: frozenset[str] = frozenset()
        self.iconv: dict[str, str] = {}
        self.oconv: dict[str, str] = {}
        self.full_strip = False
        self.complex_prefixes = False
        self.two_stage = False
        self.alternate_casing = False
        self.aliases: list[str] = []
        self.morph_aliases: list[str] = []
        #: entry -> list of (flags frozenset, stem_exception or None)
        self.words: dict[str, list[tuple[frozenset, str | None]]] = {}
        self.has_stem_exceptions = False
        self._affix_count = 0
        self._saw_af_count = False
        self._saw_am_count = False
        self._parse_aff(aff)
        for dic in dics:
            self._parse_dic(dic)

    # ------------------------------------------------------------ parsing

    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        if lines and lines[0].startswith("﻿"):
            lines[0] = lines[0][1:]
        it = iter(lines)
        for line in it:
            if line.startswith("AF"):
                # parseAlias: the FIRST AF line is the count, the rest are
                # the alias values in order (empty value allowed)
                parts = _WS.split(line.strip())
                if not self._saw_af_count:
                    self._saw_af_count = True
                else:
                    self.aliases.append(parts[1] if len(parts) > 1 else "")
            elif line.startswith("AM"):
                # parseMorphAlias: first AM line is the count; values keep
                # their leading whitespace (so " st:" matching works)
                if not self._saw_am_count:
                    self._saw_am_count = True
                else:
                    self.morph_aliases.append(line[2:])
            elif line.startswith("PFX"):
                self._parse_affix_block(line, it, is_suffix=False)
            elif line.startswith("SFX"):
                self._parse_affix_block(line, it, is_suffix=True)
            elif line.startswith("FLAG"):
                mode = _WS.split(line.strip())[1]
                self.flag_mode = {"long": "long", "num": "num"}.get(
                    mode, "utf8")
            elif line.strip() == "COMPLEXPREFIXES":
                self.complex_prefixes = True
            elif line.startswith("CIRCUMFIX"):
                self.circumfix = self._one_flag(line)
            elif line.startswith("KEEPCASE"):
                self.keepcase = self._one_flag(line)
            elif line.startswith(("NEEDAFFIX", "PSEUDOROOT")):
                self.needaffix = self._one_flag(line)
            elif line.startswith("ONLYINCOMPOUND"):
                self.onlyincompound = self._one_flag(line)
            elif line.startswith("IGNORE"):
                self.ignore = frozenset(_WS.split(line.strip())[1])
            elif line.startswith(("ICONV", "OCONV")):
                parts = _WS.split(line.strip())
                n = int(parts[1])
                table = {}
                for _k in range(n):
                    row = _WS.split(next(it).strip())
                    table[row[1]] = row[2]
                if parts[0] == "ICONV":
                    self.iconv = table
                else:
                    self.oconv = table
            elif line.startswith("FULLSTRIP"):
                self.full_strip = True
            elif line.startswith("LANG"):
                lang = line[4:].strip()
                self.alternate_casing = lang in ("tr_TR", "az_AZ")

    def _one_flag(self, line: str) -> int:
        parts = _WS.split(line.strip())
        if len(parts) != 2:
            raise ValueError(f"Illegal declaration: {line!r}")
        flags = _parse_flags(parts[1], self.flag_mode)
        if len(flags) != 1:
            raise ValueError(f"expected one flag: {line!r}")
        return flags[0]

    def _parse_affix_block(self, header, it, is_suffix) -> None:
        args = _WS.split(header.strip())
        cross = args[2] == "Y"
        num = int(args[3])
        target = self.suffixes if is_suffix else self.prefixes
        for _ in range(num):
            line = next(it)
            rule = _WS.split(line.strip())
            if len(rule) < 4:
                raise ValueError(
                    f"affix rule with fewer than four elements: {line!r}")
            flag = _parse_flags(rule[1], self.flag_mode)[0]
            strip = "" if rule[2] == "0" else rule[2]
            affix_arg = rule[3]
            append_flags: tuple[int, ...] = ()
            sep = affix_arg.rfind("/")
            if sep != -1:
                flag_part = affix_arg[sep + 1:]
                affix_arg = affix_arg[:sep]
                if self.aliases:
                    flag_part = self.aliases[int(flag_part) - 1]
                append_flags = _parse_flags(flag_part, self.flag_mode)
                self.two_stage = True
            if affix_arg == "0":
                affix_arg = ""
            condition = rule[4] if len(rule) > 4 else "."
            if condition.startswith("[") and "]" not in condition:
                condition += "]"
            if "-" in condition:
                condition = _escape_dash(condition)
            if condition == "." or condition == strip:
                pattern = None
            else:
                regex = (f".*{condition}" if is_suffix
                         else f"{condition}.*")
                pattern = re.compile(regex, re.DOTALL)
            if self.ignore or self.iconv:
                affix_arg = self.clean_input(affix_arg)
            aff = _Affix(flag, strip, pattern,
                         frozenset(append_flags), cross,
                         self._affix_count)
            self._affix_count += 1
            target.setdefault(affix_arg, []).append(aff)

    _FLAG_SEP = "\x1f"
    _MORPH_SEP = "\x1e"

    @classmethod
    def _unescape_entry(cls, entry: str) -> str:
        # unescapeEntry (Dictionary.java:717-744): \x escapes, '/' becomes
        # the flag separator, morph data preserved after the morph boundary
        out = []
        end = cls._morph_boundary(entry)
        i = 0
        while i < end:
            ch = entry[i]
            if ch == "\\" and i + 1 < len(entry):
                out.append(entry[i + 1])
                i += 2
                continue
            if ch == "/":
                out.append(cls._FLAG_SEP)
            elif ch not in (cls._MORPH_SEP, cls._FLAG_SEP):
                out.append(ch)
            i += 1
        out.append(cls._MORPH_SEP)
        for ch in entry[end:]:
            if ch not in (cls._FLAG_SEP, cls._MORPH_SEP):
                out.append(ch)
        return "".join(out)

    @staticmethod
    def _index_space_tab(text: str, start: int) -> int:
        p1 = text.find("\t", start)
        p2 = text.find(" ", start)
        if p1 >= 0 and p2 >= 0:
            return min(p1, p2)
        return max(p1, p2)

    @classmethod
    def _morph_boundary(cls, line: str) -> int:
        end = cls._index_space_tab(line, 0)
        if end == -1:
            return len(line)
        while 0 <= end < len(line):
            if (line[end] == "\t"
                    or (end + 3 < len(line)
                        and line[end + 1].isalpha()
                        and line[end + 2].isalpha()
                        and line[end + 3] == ":")):
                break
            end = cls._index_space_tab(line, end + 1)
        if end == -1:
            return len(line)
        return end

    def _parse_stem_exception(self, morph: str) -> str | None:
        if self.morph_aliases:
            try:
                morph = self.morph_aliases[int(morph.strip()) - 1]
            except ValueError:
                pass
        idx = morph.find(" st:")
        if idx < 0:
            idx = morph.find("\tst:")
        if idx >= 0:
            end = self._index_space_tab(morph, idx + 1)
            if end < 0:
                end = len(morph)
            return morph[idx + 4:end]
        return None

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for raw in lines[1:]:   # first line is the (approximate) count
            if not raw or raw[0] in ("/", "#", "\t"):
                continue
            line = self._unescape_entry(raw)
            morph_start = line.index(self._MORPH_SEP)
            morph = line[morph_start + 1:]
            if morph and not self.has_stem_exceptions:
                self.has_stem_exceptions = (
                    self._parse_stem_exception(morph) is not None)
            flag_sep = line.find(self._FLAG_SEP)
            if flag_sep == -1:
                entry = line[:morph_start]
                flags: frozenset = frozenset()
            else:
                entry = line[:flag_sep]
                flag_part = line[flag_sep + 1:morph_start]
                if self.aliases:
                    flag_part = self.aliases[int(flag_part) - 1]
                flags = frozenset(_parse_flags(flag_part, self.flag_mode))
            if self.ignore or self.iconv or self.ignore_case:
                entry = self.clean_input(entry)
            exc = self._parse_stem_exception(morph) if morph else None
            self.words.setdefault(entry, []).append((flags, exc))

    # ------------------------------------------------------------ runtime

    @property
    def needs_input_cleaning(self) -> bool:
        return bool(self.ignore or self.iconv or self.ignore_case)

    def case_fold(self, ch: str) -> str:
        if self.alternate_casing:
            if ch == "I":
                return "ı"
            if ch == "İ":
                return "i"
        return ch.lower()

    @staticmethod
    def _apply_mappings(table: dict[str, str], s: str) -> str:
        # longest-match-at-each-position conversion (applyMappings)
        if not table:
            return s
        keys = sorted(table, key=len, reverse=True)
        out = []
        i = 0
        while i < len(s):
            for k in keys:
                if s.startswith(k, i):
                    out.append(table[k])
                    i += len(k)
                    break
            else:
                out.append(s[i])
                i += 1
        return "".join(out)

    def clean_input(self, s: str) -> str:
        out = []
        for ch in s:
            if ch in self.ignore:
                continue
            if self.ignore_case and not self.iconv:
                ch = self.case_fold(ch)
            out.append(ch)
        res = "".join(out)
        if self.iconv:
            res = self._apply_mappings(self.iconv, res)
            if self.ignore_case:
                res = "".join(self.case_fold(c) for c in res)
        return res

    def lookup_word(self, word: str):
        return self.words.get(word)


class HunspellStemmer:
    """Stemmer.java: generates every dictionary stem of a word (affix
    stripping with cross-product/continuation/circumfix/keepcase rules,
    case-variant union for TITLE/UPPER input)."""

    def __init__(self, dictionary: HunspellDictionary):
        self.d = dictionary

    def stem(self, word: str) -> list[str]:
        d = self.d
        if d.needs_input_cleaning:
            word = d.clean_input(word)
        case = self._case_of(word)
        if case == "upper":
            title = word[0] + "".join(d.case_fold(c) for c in word[1:])
            lower = d.case_fold(title[0]) + title[1:]
            return (self._do_stem(word, False)
                    + self._do_stem(title, True)
                    + self._do_stem(lower, True))
        if case == "title":
            lower = d.case_fold(word[0]) + word[1:]
            return self._do_stem(word, False) + self._do_stem(lower, True)
        return self._do_stem(word, False)

    def unique_stems(self, word: str) -> list[str]:
        stems = self.stem(word)
        seen: set = set()
        out = []
        for s in stems:
            key = s.lower() if self.d.ignore_case else s
            if key not in seen:
                seen.add(key)
                out.append(s)
        return out

    def _case_of(self, word: str) -> str:
        if self.d.ignore_case or not word or not word[0].isupper():
            return "exact"
        seen_upper = seen_lower = False
        for ch in word[1:]:
            if ch.isupper():
                seen_upper = True
            else:
                seen_lower = True
        if not seen_lower:
            return "upper"
        if not seen_upper:
            return "title"
        return "exact"

    def _do_stem(self, word: str, case_variant: bool) -> list[str]:
        d = self.d
        stems: list[str] = []
        forms = d.lookup_word(word)
        if forms:
            for flags, exc in forms:
                if (case_variant and d.keepcase is not None
                        and d.keepcase in flags):
                    continue
                if d.needaffix is not None and d.needaffix in flags:
                    continue
                if (d.onlyincompound is not None
                        and d.onlyincompound in flags):
                    continue
                stems.append(self._new_stem(word, exc))
        stems.extend(self._stem(word, None, -1, -1, 0, True, True,
                                False, False, case_variant))
        return stems

    def _new_stem(self, word: str, exc: str | None) -> str:
        d = self.d
        s = exc if exc is not None else word
        if d.oconv:
            s = d._apply_mappings(d.oconv, s)
        return s

    def _stem(self, word, previous, prev_flag, prefix_flag,
              depth, do_prefix, do_suffix, previous_was_prefix,
              circumfix, case_variant) -> list[str]:
        d = self.d
        stems: list[str] = []
        n = len(word)
        if do_prefix and d.prefixes:
            limit = n if d.full_strip else n - 1
            for i in range(0, max(limit, 0)):
                affixes = d.prefixes.get(word[:i])
                if affixes is None:
                    continue
                for aff in affixes:
                    if aff is previous:
                        continue
                    if not self._compatible(aff, depth, prev_flag, False):
                        continue
                    de_affixed = word[i:]
                    stripped = aff.strip + de_affixed
                    if aff.pattern is not None and not aff.pattern.fullmatch(
                            stripped):
                        continue
                    stems.extend(self._apply_affix(
                        stripped, aff, -1, depth, True, circumfix,
                        case_variant))
        if do_suffix and d.suffixes:
            limit = 0 if d.full_strip else 1
            for i in range(n, limit - 1, -1):
                affixes = d.suffixes.get(word[i:])
                if affixes is None:
                    continue
                for aff in affixes:
                    if aff is previous:
                        continue
                    if not self._compatible(aff, depth, prev_flag,
                                            previous_was_prefix):
                        continue
                    de_affixed = word[:i]
                    stripped = de_affixed + aff.strip
                    if aff.pattern is not None and not aff.pattern.fullmatch(
                            stripped):
                        continue
                    stems.extend(self._apply_affix(
                        stripped, aff, prefix_flag, depth, False,
                        circumfix, case_variant))
        return stems

    def _compatible(self, aff, depth, prev_flag, previous_was_prefix):
        d = self.d
        if depth == 0:
            if d.onlyincompound is None:
                return True
            return d.onlyincompound not in aff.append_flags
        if aff.cross:
            allowed = (d.onlyincompound is None
                       or d.onlyincompound not in aff.append_flags)
            return allowed and self._cross_checked(
                prev_flag, aff.append_flags, previous_was_prefix)
        return False

    @staticmethod
    def _cross_checked(flag, flags, match_empty):
        return (not flags and match_empty) or flag in flags

    def _apply_affix(self, stripped, aff, prefix_flag, depth, is_prefix,
                     circumfix, case_variant) -> list[str]:
        d = self.d
        stems: list[str] = []
        forms = d.lookup_word(stripped)
        if forms:
            for flags, exc in forms:
                if aff.flag not in flags:
                    continue
                chained_prefix = (d.complex_prefixes and depth == 1
                                  and is_prefix)
                if (not chained_prefix and prefix_flag >= 0
                        and prefix_flag not in flags):
                    # chain the prefix through the suffix continuation
                    if not self._cross_checked(
                            prefix_flag, aff.append_flags, False):
                        continue
                if d.circumfix is not None:
                    if circumfix != (d.circumfix in aff.append_flags):
                        continue
                if (case_variant and d.keepcase is not None
                        and d.keepcase in flags):
                    continue
                if (d.onlyincompound is not None
                        and d.onlyincompound in flags):
                    continue
                stems.append(self._new_stem(stripped, exc))
        if d.circumfix is not None and not circumfix and is_prefix:
            circumfix = d.circumfix in aff.append_flags
        if aff.cross:
            if depth == 0:
                if is_prefix:
                    stems.extend(self._stem(
                        stripped, aff, aff.flag, aff.flag, 1,
                        d.complex_prefixes and d.two_stage, True, True,
                        circumfix, case_variant))
                elif not d.complex_prefixes and d.two_stage:
                    stems.extend(self._stem(
                        stripped, aff, aff.flag, prefix_flag, 1,
                        False, True, False, circumfix, case_variant))
            elif depth == 1:
                if is_prefix and d.complex_prefixes:
                    stems.extend(self._stem(
                        stripped, aff, aff.flag, aff.flag, 2,
                        False, True, True, circumfix, case_variant))
                elif (not is_prefix and not d.complex_prefixes
                      and d.two_stage):
                    stems.extend(self._stem(
                        stripped, aff, aff.flag, prefix_flag, 2,
                        False, True, False, circumfix, case_variant))
        return stems


def hunspell_token_fn(aff: str, dics, ignore_case: bool = False,
                      dedup: bool = True, longest_only: bool = False):
    """HunspellStemFilter analog (``hunspell/HunspellStemFilter.java``):
    returns ``token -> list of output stems``. Unknown words pass through
    unchanged; ``longest_only`` keeps just the longest stem (ties broken
    on reverse text order, :136-147); ``dedup`` removes duplicates (off
    when longest_only, as in the reference)."""
    stemmer = HunspellStemmer(HunspellDictionary(aff, dics, ignore_case))
    dedup = dedup and not longest_only

    def fn(token: str) -> list[str]:
        stems = (stemmer.unique_stems(token) if dedup
                 else stemmer.stem(token))
        if not stems:
            return [token]
        if longest_only and len(stems) > 1:
            return [max(stems, key=lambda s: (len(s), s))]
        return stems

    return fn
