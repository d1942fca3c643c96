"""Hunspell Dictionary/Stemmer vs the reference's OWN test suite: every
``assertStemsTo`` assertion from the 30 StemmerTestBase subclasses under
``analysis/common/src/test/.../hunspell/`` is replayed against the
matching .aff/.dic fixtures (281 assertions covering conditions,
continuation classes, circumfix, complex prefixes, keepcase, needaffix,
onlyincompound, ignore, iconv/oconv, fullstrip, flag long/num, AF/AM
aliases, escapes, spaces, morph data, alternate Turkic casing)."""

import codecs
import os
import re

import pytest

from lucene_solr_ray.analysis.hunspell import (
    HunspellDictionary,
    HunspellStemmer,
    hunspell_token_fn,
)

_TDIR = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/hunspell"
)


def _junescape(s: str) -> str:
    return codecs.decode(
        s.encode("latin-1", "backslashreplace").decode("latin-1"),
        "unicode_escape",
    )


def _load_cases():
    cases = []
    for fn in sorted(os.listdir(_TDIR)):
        if not fn.startswith("Test") or not fn.endswith(".java"):
            continue
        src = open(os.path.join(_TDIR, fn), encoding="utf-8").read()
        if "StemmerTestBase" not in src:
            continue
        m = re.search(
            r'init\((?:(true|false),\s*)?"([^"]+)",\s*'
            r'((?:"[^"]+"(?:,\s*)?)+)\)', src)
        if not m:
            continue
        asserts = [
            (_junescape(am.group(1)),
             sorted(_junescape(s)
                    for s in re.findall(r'"((?:[^"\\]|\\.)*)"',
                                        am.group(2))))
            for am in re.finditer(
                r'assertStemsTo\("((?:[^"\\]|\\.)*)"'
                r'((?:,\s*"(?:[^"\\]|\\.)*")*)\)', src)
        ]
        cases.append(
            (fn, m.group(1) == "true", m.group(2),
             re.findall(r'"([^"]+)"', m.group(3)), asserts))
    return cases


_CASES = _load_cases() if os.path.isdir(_TDIR) else []


@pytest.mark.skipif(not _CASES, reason="reference not present")
def test_fixture_census():
    assert len(_CASES) == 30
    assert sum(len(a) for *_x, a in _CASES) == 281


@pytest.mark.skipif(not _CASES, reason="reference not present")
@pytest.mark.parametrize(
    "name,ignore_case,aff,dics,asserts",
    _CASES,
    ids=[c[0] for c in _CASES],
)
def test_reference_assertions(name, ignore_case, aff, dics, asserts):
    aff_text = open(f"{_TDIR}/{aff}", encoding="utf-8").read()
    dic_texts = [open(f"{_TDIR}/{d}", encoding="utf-8").read()
                 for d in dics]
    st = HunspellStemmer(
        HunspellDictionary(aff_text, dic_texts, ignore_case=ignore_case))
    bad = []
    for word, want in asserts:
        got = sorted(st.stem(word))
        if got != want:
            bad.append((word, got, want))
    assert bad == []


@pytest.mark.skipif(not _CASES, reason="reference not present")
def test_token_fn():
    aff = open(f"{_TDIR}/simple.aff", encoding="utf-8").read()
    dic = open(f"{_TDIR}/simple.dic", encoding="utf-8").read()
    fn = hunspell_token_fn(aff, dic)
    assert fn("lucene") == ["lucene", "lucen"]
    assert fn("solr") == ["olr"]
    assert fn("unknownword") == ["unknownword"]  # pass-through
    fnl = hunspell_token_fn(aff, dic, longest_only=True)
    assert fnl("lucene") == ["lucene"]
