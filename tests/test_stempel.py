"""Stempel Polish stemmer (analysis/stempel.py) — reference goldens from
``analysis/stempel/src/test/.../pl/TestPolishAnalyzer.java`` plus
structural checks of the Egothor table reader and Diff interpreter."""

from lucene_solr_ray.analysis.stempel import (
    StempelStemmer,
    diff_apply,
    polish_stem,
)
from lucene_solr_ray.analysis.tokenizer import (
    PolishAnalyzer,
    analyze_with_positions,
)


def test_reference_goldens():
    # TestPolishAnalyzer.testBasics
    assert polish_stem("studenta") == "student"
    assert polish_stem("studenci") == "student"


def test_analyzer_chain():
    # "był" is a Polish stopword
    assert analyze_with_positions("studenta był studenci",
                                  PolishAnalyzer()) == [
        ("student", 0), ("student", 2),
    ]


def test_min_length_passthrough():
    assert polish_stem("ab") == "ab"


def test_table_structure():
    st = StempelStemmer()
    # stemmer_20000.tbl is a backward MultiTrie2
    assert type(st.trie).__name__ == "_MultiTrie2"
    assert not st.trie.forward
    assert len(st.trie.tries) >= 1


def test_diff_apply():
    # patch commands: R=replace, D=delete run, I=insert, -=skip
    assert diff_apply("kot", "Rb") == "kob"       # replace last with 'b'
    assert diff_apply("kotki", "Da") == "kotk"    # delete 1 at end
    assert diff_apply("abc", "-a" + "Rz") == "azc"  # skip 1, replace
