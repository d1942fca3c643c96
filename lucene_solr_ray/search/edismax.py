"""Extended DisMax query parser (Solr's edismax).

Reference semantics:
- ``solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java``:
  the user query is split into clauses (bare words, quoted phrases, ``+`` /
  ``-`` prefixed terms); every positive clause becomes a DisjunctionMaxQuery
  over the ``qf`` fields with per-field boosts and the shared ``tie``; the
  clauses assemble into one BooleanQuery (bare → SHOULD, ``+`` → MUST,
  ``-`` → MUST_NOT) with minimumNumberShouldMatch from the ``mm`` spec.
- ``solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java``
  ``calculateMinShouldMatch`` / ``setMinShouldMatch``: ``mm`` supports plain
  ints, negative ints, percentages, negative percentages and conditional
  ``N<spec`` lists — ported operation-for-operation below.
- ``pf`` (phrase fields): the sequence of analyzed query terms is re-added
  as one phrase query per pf field (slop ``ps``) in a SHOULD clause, so docs
  matching the words in order get an additive boost
  (ExtendedDismaxQParser.addShingledPhraseQueries, pf2/pf3 shingles omitted).

mm is applied only when there are optional (SHOULD) clauses, like
``SolrPluginUtils.setMinShouldMatch`` which counts Occur.SHOULD clauses.
"""

from __future__ import annotations

import re

from .query import (
    BooleanQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    PhraseQuery,
    Query,
    TermQuery,
)

CONTENT_FIELD = "content"

_CLAUSE_RE = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')


def calculate_min_should_match(optional_count: int, spec: str) -> int:
    """Port of ``SolrPluginUtils.calculateMinShouldMatch`` (same branch
    structure and integer truncation):

    - ``"3"`` → 3; ``"-2"`` → optional_count - 2
    - ``"75%"`` → int(optional_count * 75 / 100) (toward zero)
    - ``"-25%"`` → optional_count + int(optional_count * -25 / 100)
    - ``"2<-25% 9<3"`` → conditional: walking the space-separated list, if
      optional_count <= N the current result stands, else result is
      recomputed from that condition's sub-spec
    Final clamp: min(optional_count, max(result, 0)).
    """
    result = optional_count
    spec = spec.strip()
    if "<" in spec:
        for s in spec.split(" "):
            upper, _, sub = s.partition("<")
            if optional_count <= int(upper):
                return result
            result = calculate_min_should_match(optional_count, sub)
        return result
    if "%" in spec:
        percent = int(spec[: spec.index("%")])
        calc = (result * percent) / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    return optional_count if optional_count < result else (0 if result < 0 else result)


def _field_clause(
    word: str,
    qf: dict[str, float],
    tie: float,
    analyzer,
    keyword_fields: tuple[str, ...],
) -> Query | None:
    """One bare word → DisjunctionMaxQuery over the qf fields. The content
    field analyzes the word (a stopword analyzes to nothing and drops that
    disjunct); keyword fields take it verbatim (StringField semantics).
    Returns None when no field yields a term (the whole clause is dropped,
    matching edismax's stopword behavior)."""
    from ..analysis.tokenizer import analyze_with_positions

    disjuncts: list[Query] = []
    for f, boost in qf.items():
        if f in keyword_fields:
            disjuncts.append(TermQuery(word, boost=boost, field=f))
        else:
            analyzed = analyze_with_positions(word, analyzer)
            if analyzed:
                disjuncts.append(TermQuery(analyzed[0][0], boost=boost, field=f))
    if not disjuncts:
        return None
    if len(disjuncts) == 1:
        return disjuncts[0]
    return DisjunctionMaxQuery(tuple(disjuncts), tie_breaker=tie)


def _phrase_clause(
    words: list[str], field: str, boost: float, slop: int, analyzer
) -> Query | None:
    """Analyzed phrase over ``words`` (positions preserve stopword gaps,
    like the classic parser's quoted phrases)."""
    from ..analysis.tokenizer import analyze_with_positions

    analyzed = analyze_with_positions(" ".join(words), analyzer)
    if not analyzed:
        return None
    terms = tuple(t for t, _ in analyzed)
    rel = tuple(p for _, p in analyzed)
    if len(terms) == 1:
        return TermQuery(terms[0], boost=boost, field=field)
    return PhraseQuery(terms, rel, boost=boost, field=field, slop=slop)


def edismax_query(
    user_query: str,
    qf: dict[str, float],
    mm: str | int = "100%",
    pf: dict[str, float] | None = None,
    tie: float = 0.0,
    ps: int = 0,
    analyzer=None,
    keyword_fields: tuple[str, ...] = ("repo", "path", "commit", "lang"),
    bf: str | None = None,
    boost: str | None = None,
    bq: Query | None = None,
) -> Query:
    """Parse a user query string into the edismax query tree.

    qf: {field: boost}; mm: SolrPluginUtils spec (applied to SHOULD count);
    pf: {field: boost} phrase-boost fields (slop ``ps``); tie: DisMax
    tie-breaker shared by every per-word disjunction; bf: additive function
    boost (a FunctionQuery SHOULD clause — SolrPluginUtils.addFieldBoosts /
    ExtendedDismaxQParser boostFunctions loop); bq: additive boost query
    (SHOULD clause); boost: multiplicative function (BoostQParserPlugin →
    BoostedQuery wrapping everything).
    """
    from ..analysis.tokenizer import StandardAnalyzer

    if analyzer is None:
        analyzer = StandardAnalyzer()
    if not qf:
        raise ValueError("edismax needs at least one qf field")

    must: list[Query] = []
    should: list[Query] = []
    must_not: list[Query] = []
    positive_words: list[str] = []  # feed pf (MUST_NOT words excluded)

    q = user_query.strip()
    if q in ("", "*:*"):
        return MatchAllQuery()
    for sign, phrase, word in _CLAUSE_RE.findall(q):
        if word:
            clause = _field_clause(word, qf, tie, analyzer, keyword_fields)
        else:
            clause = _phrase_clause(phrase.split(), CONTENT_FIELD, 1.0, 0, analyzer)
        if clause is None:
            continue
        if sign == "+":
            must.append(clause)
            if word:
                positive_words.append(word)
        elif sign == "-":
            must_not.append(clause)
        else:
            should.append(clause)
            if word:
                positive_words.append(word)

    if not must and not should:
        # only prohibited clauses (or everything analyzed away): match nothing
        # unless there are must_nots, in which case Solr matches all minus them
        if must_not:
            return BooleanQuery(must=[MatchAllQuery()], must_not=must_not)
        return BooleanQuery()

    msm = calculate_min_should_match(len(should), str(mm)) if should else 0

    if not must and len(should) == 1 and not must_not:
        inner: Query = should[0]
    else:
        inner = BooleanQuery(
            must=must, should=should, must_not=must_not, min_should_match=msm
        )

    # pf/bf/bq: the parsed user query becomes a MUST clause of a fresh
    # top-level BooleanQuery and each boost a SHOULD clause — pure additive
    # score boosts that can never change the match set
    # (ExtendedDismaxQParser.parse: query.add(parsedUserQuery, Occur.MUST),
    # then addPhraseFieldQueries / boostQueries / boostFunctions as SHOULD)
    extra: list[Query] = []
    if pf and len(positive_words) > 1:
        for f, b in pf.items():
            ph = _phrase_clause(positive_words, f, b, ps, analyzer)
            if ph is not None:
                extra.append(ph)
    if bq is not None:
        extra.append(bq)
    if bf is not None:
        from .query import FunctionQuery

        extra.append(FunctionQuery(bf))
    if extra:
        inner = BooleanQuery(must=[inner], should=extra)
    if boost is not None:
        from .query import BoostedQuery

        inner = BoostedQuery(inner, boost)
    return inner
