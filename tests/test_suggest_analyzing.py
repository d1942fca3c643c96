"""AnalyzingSuggester analog semantics (suggest/analyzing/
AnalyzingSuggester.java + AnalyzingSuggesterTest.java behaviors that the
SQL oracle can't express: preserveSep, position holes, graph expansion,
exactFirst, surface-form caps)."""
from lucene_solr_ray.analysis.tokenizer import StandardAnalyzer
from lucene_solr_ray.search.suggest_analyzing import (
    AnalyzingSuggester,
    analyzed_paths,
)


def test_preserve_sep_discriminates_token_boundaries():
    # javadoc: with PRESERVE_SEP, "fastapple" does NOT match "fast apple"
    items = [("fast apple", 10), ("fastapple computer", 5)]
    sep = AnalyzingSuggester(items, preserve_sep=True)
    assert [s for s, _ in sep.lookup("fastapple", 5)] == ["fastapple computer"]
    nosep = AnalyzingSuggester(items, preserve_sep=False)
    got = [s for s, _ in nosep.lookup("fastapple", 5)]
    assert set(got) == {"fast apple", "fastapple computer"}
    assert got[0] == "fast apple"  # weight 10 > 5


def test_position_holes_from_stopwords():
    # "ghost of the christmas": stopwords leave holes at positions 1-2;
    # a query without the holes must not match unless
    # preservePositionIncrements=False (AnalyzingSuggesterTest
    # testStandard / testNoPreservePositionIncrements)
    items = [("ghost of the christmas", 7)]
    with_holes = AnalyzingSuggester(items)
    assert with_holes.lookup("ghost christmas", 5) == []
    no_holes = AnalyzingSuggester(items, preserve_position_increments=False)
    assert no_holes.lookup("ghost christmas", 5) == [
        ("ghost of the christmas", 7)]
    # querying WITH the stopwords reproduces the holes → matches either way
    assert with_holes.lookup("ghost of the chris", 5) == [
        ("ghost of the christmas", 7)]


def test_graph_expansion_via_synonyms():
    a = StandardAnalyzer(synonyms=(("wifi", "wireless"),))
    sugg = AnalyzingSuggester([("wifi router", 3), ("lan cable", 1)],
                              analyzer=a)
    # the synonym arc creates a second analyzed path, so the surface is
    # reachable from the synonym's spelling
    assert sugg.lookup("wireless r", 5) == [("wifi router", 3)]
    assert sugg.lookup("wifi rout", 5) == [("wifi router", 3)]
    # and the surface is deduped when both paths match the same prefix
    paths = analyzed_paths("wifi router", a)
    assert len(paths) == 2


def test_exact_first_promotes_typed_surface():
    items = [("x y", 10), ("x y z", 50), ("x y w", 30)]
    plain = AnalyzingSuggester(items, exact_first=False)
    assert [s for s, _ in plain.lookup("x y", 5)] == ["x y z", "x y w", "x y"]
    ef = AnalyzingSuggester(items, exact_first=True)
    assert [s for s, _ in ef.lookup("x y", 5)] == ["x y", "x y z", "x y w"]


def test_max_surface_forms_per_analyzed_form():
    # "RED BOLT" and "red bolt" analyze identically; cap=1 keeps the best
    items = [("RED BOLT", 2), ("red bolt", 9)]
    capped = AnalyzingSuggester(items, max_surface_forms=1)
    assert capped.lookup("red b", 5) == [("red bolt", 9)]
    full = AnalyzingSuggester(items)
    assert full.lookup("red b", 5) == [("red bolt", 9), ("RED BOLT", 2)]


def test_weight_then_surface_ordering_and_k():
    items = [("qq b", 5), ("qq c", 5), ("qq aa", 5), ("qq d", 9)]
    sugg = AnalyzingSuggester(items)
    got = sugg.lookup("qq", 3)
    assert got == [("qq d", 9), ("qq aa", 5), ("qq b", 5)]


def test_stopword_query_analyzes_away():
    # javadoc bullet: "a" alone is stopped out → no results (the analyzed
    # form is empty), mirroring the reference's StopFilter caveat
    sugg = AnalyzingSuggester([("a b", 5)])
    assert sugg.lookup("a", 5) == []


def test_empty_lookup_returns_nothing():
    sugg = AnalyzingSuggester([("foo", 1)])
    assert sugg.lookup("", 5) == []
    assert sugg.lookup("zzz", 5) == []
