"""Query model + a classic-parser subset.

Query nodes mirror the reference surface (SURVEY.md §2.4): ``TermQuery``
(search/TermQuery.java), ``BooleanQuery`` with MUST / SHOULD / MUST_NOT and
``minimumNumberShouldMatch`` (search/BooleanQuery.java,
Boolean2ScorerSupplier.java:30-97), ``MatchAllDocsQuery``, boosts
(search/BoostQuery.java). The parser covers the classic-syntax subset used by
the reference query fixtures: ``a AND b``, ``OR``, ``NOT x`` / ``-x``,
``+x``, parentheses, and bare-term juxtaposition (default OR, like
``QueryParserBase`` with default OR operator). Phrases are parsed but raise
until positional indexing lands (v2).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np

#: the analyzed full-text field; every query node defaults to it
CONTENT_FIELD = "content"


class Query:
    pass


@dataclass(frozen=True)
class TermQuery(Query):
    """Single-term query; ``field`` selects the indexed field (FieldInfos
    analog — keyword fields are matched verbatim, content is analyzed)."""

    term: str
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class MatchAllQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class BlendedTermQuery(Query):
    """Cross-term stats blending (``search/BlendedTermQuery.java:275-288``):
    every term scores with df = max(df_i) (⇔ the minimum idf of the set; ttf
    blending is moot for BM25). ``rewrite="boolean"`` sums the per-term
    scores (BOOLEAN_REWRITE, :133); ``rewrite="dismax"`` takes
    max + (sum-max)·tie (DisjunctionMaxRewrite, :150)."""

    terms: tuple[str, ...]
    rewrite: str = "boolean"
    tie_breaker: float = 0.01
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Phrase query: terms at relative positions (gaps from removed
    stopwords preserved, like the classic parser's analyzed phrases).
    ``slop=0`` → search/PhraseQuery.java + ExactPhraseMatcher.java semantics;
    ``slop>0`` → SloppyPhraseMatcher.java: freq = Σ 1/(1+matchLength) over
    the heap-propagated match sequence. Scoring uses the summed idf of all
    term occurrences (PhraseWeight / idfExplain over the TermStatistics
    array)."""

    terms: tuple[str, ...]
    rel_positions: tuple[int, ...]
    boost: float = 1.0
    field: str = CONTENT_FIELD
    slop: int = 0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase where each position holds one or more alternative terms
    (search/MultiPhraseQuery.java): per-slot postings are the union of the
    slot's terms (UnionPostingsEnum — merged sorted positions), matched by
    the same exact/sloppy matchers; idf = Σ idf over ALL terms of all slots
    (MultiPhraseWeight termStatistics loop)."""

    terms: tuple[tuple[str, ...], ...]  # one inner tuple per phrase slot
    rel_positions: tuple[int, ...]
    boost: float = 1.0
    field: str = CONTENT_FIELD
    slop: int = 0


@dataclass(frozen=True)
class PhrasePrefixQuery(Query):
    """Phrase whose LAST position is a prefix — match_phrase_prefix semantics
    (the MultiPhrasePrefix pattern over search/MultiPhraseQuery.java):
    rewrite expands the prefix against the term dictionary (first
    ``max_expansions`` terms in dictionary order, like
    MultiPhrasePrefixQuery's maxExpansions) and scores as a MultiPhraseQuery.
    No expansions → matches nothing."""

    terms: tuple[str, ...]  # fixed leading phrase terms (may be empty)
    prefix: str
    max_expansions: int = 50
    boost: float = 1.0
    field: str = CONTENT_FIELD
    slop: int = 0


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Union of terms scored as if one term: stats = (max df, max ttf) of the
    set, per-doc freq = Σ tf across synonyms (search/SynonymQuery.java)."""

    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """Score a term from its per-occurrence float payloads
    (queries/payloads/PayloadScoreQuery.java over a single-term span +
    PayloadDecoder.FLOAT_DECODER + {Min,Max,Average,Sum}PayloadFunction).

    Per matching doc, every occurrence contributes a payload factor
    (occurrences without a payload decode to 1.0 — FLOAT_DECODER's
    null-payload branch); the factors fold through ``func`` and docScore
    (``numPayloadsSeen > 0 ? ... : 1``). ``include_span_score`` multiplies
    by the wrapped term's BM25 score (PayloadSpanScorer.scoreCurrentDoc).
    Requires an index built with ``StandardAnalyzer(delimited_payload=...)``.
    """

    term: str
    func: str = "avg"  # avg | min | max | sum
    include_span_score: bool = True
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Every matching doc scores ``boost`` (search/ConstantScoreQuery.java)."""

    query: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class BoostQuery(Query):
    """Multiply the wrapped query's scores (search/BoostQuery.java); rewritten
    into the wrapped node's boost where possible."""

    query: "Query"
    boost: float


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(sub) + tie_breaker * Σ(other subs)
    (search/DisjunctionMaxQuery.java, DisjunctionMaxScorer.score)."""

    disjuncts: tuple["Query", ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class CoveringQuery(Query):
    """``lucene/sandbox/src/java/org/apache/lucene/search/CoveringQuery.java``
    + ``CoveringScorer.java``: a disjunction whose minimumNumberMatch is a
    per-doc long value — minMatch = max(1, source(doc))
    (CoveringScorer.java:127-133; a doc with no value never matches), a doc
    matches when #matching clauses ≥ minMatch, score = Σ matching sub-scores
    (CoveringScorer.java:204-209). The value source reads the numeric
    doc-value ``field``, optionally transformed ``offset + (value % mod)``
    (LongValuesSource expression analog — keeps minMatch within
    [1, len(queries)] on corpora whose raw values exceed the clause count)."""

    queries: tuple["Query", ...] = ()
    field: str = "field_len"
    mod: int | None = None
    offset: int = 0


# --- multi-term queries: expanded against the term dictionary at rewrite time
#     (AutomatonQuery family; Lucene 7 default CONSTANT_SCORE_REWRITE) ---


@dataclass(frozen=True)
class PrefixQuery(Query):
    prefix: str
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class WildcardQuery(Query):
    pattern: str  # ``*`` = any run, ``?`` = one char (search/WildcardQuery.java)
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class RegexpQuery(Query):
    pattern: str  # anchored full-term match (search/RegexpQuery.java)
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class TermRangeQuery(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class FuzzyQuery(Query):
    term: str
    max_edits: int = 2  # Levenshtein ≤ 2 (search/FuzzyQuery.java)
    prefix_length: int = 0
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """Semi-join vs a set of terms, constant-score (search/TermInSetQuery.java)."""

    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class NumericRangeQuery(Query):
    """Numeric range over a stored numeric doc column — PointRangeQuery
    analog (``search/PointRangeQuery.java``, BKD tree replaced by Parquet
    row-group statistics pushdown on the docs files). Constant-score
    (ConstantScoreWeight: every match scores ``boost``)."""

    field: str  # numeric docs column, e.g. "field_len"
    lower: float | int | None = None
    upper: float | int | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class DocValuesNumbersQuery(Query):
    """``lucene/sandbox/.../search/DocValuesNumbersQuery.java``: docs whose
    numeric doc-value is in the given set; constant score (the doc-values
    twin of TermInSetQuery for numerics)."""

    field: str
    numbers: tuple[int, ...] = ()
    boost: float = 1.0


@dataclass(frozen=True)
class DocValuesTermsQuery(Query):
    """``lucene/sandbox/.../search/DocValuesTermsQuery.java``: docs whose
    keyword doc-value (stored column, SortedDocValues analog) is in the
    given set; constant score."""

    field: str
    values: tuple[str, ...] = ()
    boost: float = 1.0


MULTI_TERM_TYPES = (PrefixQuery, WildcardQuery, RegexpQuery, TermRangeQuery, FuzzyQuery)


@dataclass
class FunctionScoreQuery(Query):
    """``queries/function/FunctionScoreQuery.java:76-78,168-181``
    (boostByValue): score = ``(float)((innerScore · fieldValue) · boost)``
    with fieldValue from a numeric doc-value column
    (DoubleValuesSource.fromLongField analog). ``transform='log1p'`` composes
    ``ln(1 + value)`` on the source (a common saturating popularity boost);
    match set = the inner query's."""

    query: Query = None
    field: str = "field_len"
    transform: str = "identity"  # or "log1p"
    boost: float = 1.0


@dataclass(frozen=True)
class FeatureQuery(Query):
    """Static-feature scoring over a FeatureField posting
    (``document/FeatureField.java`` newLogQuery/newSaturationQuery/
    newSigmoidQuery + ``document/FeatureQuery.java``): iterate the
    (field, feature) posting list, decode the feature value from the term
    freq, score = boost · fn(value). No norms, no idf; typically a SHOULD
    clause next to a BM25 query.

    ``function``: ``"log"`` → w·ln(a + S); ``"saturation"`` →
    w·(1 − pivot/(S + pivot)) (pivot=None → avg feature value at rewrite,
    FeatureField.java:539-551); ``"sigmoid"`` → w·(1 − pivot^a/(S^a + pivot^a)).
    """

    feature: str
    function: str = "saturation"
    pivot: float | None = None
    scaling_a: float = 1.0
    exp: float = 1.0
    boost: float = 1.0
    field: str = "features"

    def __post_init__(self):
        if self.function not in ("log", "saturation", "sigmoid"):
            raise ValueError(f"unknown feature function {self.function!r}")
        if self.function == "sigmoid" and self.pivot is None:
            raise ValueError("sigmoid requires an explicit pivot")


@dataclass(frozen=True)
class FunctionQuery(Query):
    """``queries/function/FunctionQuery.java:87-120`` (AllScorer): matches
    every doc; score = ``boost · expr(doc values)``. ``expr`` is an
    expressions-module source whose identifiers are numeric doc-value
    columns. This is Solr's ``bf=`` additive boost when added as a SHOULD
    clause next to a MUST user query (SolrPluginUtils.addFieldBoosts)."""

    expr: str = "1"
    boost: float = 1.0


@dataclass(frozen=True)
class GraphTermsQuery(Query):
    """Solr ``{!graphTerms f=.. maxDocFreq=N}t1,t2,..``
    (search/GraphTermsQParserPlugin.java:71-153): constant-score
    disjunction over the given terms AFTER dropping every term whose global
    docFreq exceeds ``max_doc_freq`` — the hub-node safety valve for graph
    traversals."""

    terms: tuple[str, ...] = ()
    max_doc_freq: int = 2**31 - 1
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass(frozen=True)
class ExternalFileFunctionQuery(Query):
    """Solr ExternalFileField (``solr/core/.../schema/ExternalFileField.java``
    + ``FileFloatSource.java``): per-doc floats keyed by a doc field, loaded
    from OUTSIDE the index (re-loadable without reindexing), usable only in
    function queries. Matches every doc (AllScorer); score = boost ·
    mapping.get(key_field value, default). The mapping rides in the query
    object, so it reaches segment tasks through the existing one-``ray.put``
    query broadcast — no per-task reshipping."""

    key_field: str = "repo"
    mapping: tuple = ()  # tuple of (key, float) pairs — hashable/frozen
    default: float = 0.0
    boost: float = 1.0

    def lookup(self) -> dict:
        return dict(self.mapping)


@dataclass(frozen=True)
class FunctionRangeQuery(Query):
    """Solr ``{!frange l=.. u=..}func`` (FunctionRangeQParserPlugin +
    ``queries/function/ValueSourceRangeFilter.java`` ValueSourceScorer):
    match docs whose function value lies in [l, u] (bounds optional,
    inclusive by default), constant score = boost."""

    expr: str = "1"
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class BoostedQuery(Query):
    """``queries/function/BoostedQuery.java:92-113`` (CustomScorer / Solr's
    ``boost=`` param, BoostQParserPlugin): score = inner score ·
    ``expr(doc values)``; match set = the inner query's."""

    query: Query = None
    expr: str = "1"


@dataclass(frozen=True)
class ExpandedTermsQuery(Query):
    """Internal: a rewritten multi-term query — constant-score union over the
    expanded concrete terms (CONSTANT_SCORE_REWRITE result)."""

    terms: tuple[str, ...]
    boost: float = 1.0
    field: str = CONTENT_FIELD


@dataclass
class CommonTermsQuery(Query):
    """``queries/CommonTermsQuery.java:90-209``: split terms into low/high
    document frequency at ``df > ceil(maxTermFrequency·maxDoc)`` (fractional
    cutoff; an absolute cutoff applies when ``max_term_frequency >= 1``,
    :157-159), then rewrite to
    ``MUST(Bool(lowFreqOccur lows, lowMsm)) SHOULD(Bool(highFreqOccur highs,
    highMsm))`` (:188-208). If no low-frequency terms remain, the
    high-frequency group is promoted to a conjunction (``highFreqOccur=MUST``)
    "to prevent slow queries" (:179-187). Fractional minimum-should-match
    values are ``Math.round(frac · numOptional)`` (:141-146)."""

    terms: tuple[str, ...] = ()
    max_term_frequency: float = 0.01
    high_freq_occur: str = "should"  # MUST_NOT is rejected (:92-99)
    low_freq_occur: str = "should"
    low_freq_min_should_match: float = 0.0
    high_freq_min_should_match: float = 0.0
    field: str = CONTENT_FIELD

    def __post_init__(self):
        if "must_not" in (self.high_freq_occur, self.low_freq_occur):
            raise ValueError("occur should be MUST or SHOULD but was MUST_NOT")


def _ctq_min_should_match(frac: float, num_optional: int) -> int:
    # CommonTermsQuery.java:141-146 (Math.round = floor(x + 0.5))
    if frac >= 1.0 or frac == 0.0:
        return int(frac)
    return math.floor(frac * num_optional + 0.5)


def _rewrite_common_terms(q: CommonTermsQuery, reader) -> Query:
    stats = reader.term_stats(sorted((q.field, t) for t in set(q.terms)))
    max_doc = reader.stats.doc_count
    # (int) Math.ceil(maxTermFrequency * (float) maxDoc) — float32 product (:158)
    cutoff = math.ceil(float(np.float32(q.max_term_frequency) * np.float32(max_doc)))
    low: list[TermQuery] = []
    high: list[TermQuery] = []
    for t in q.terms:  # clause order preserved (:152-166)
        df = stats.get((q.field, t), (0, 0))[0]
        is_high = df > 0 and (
            (q.max_term_frequency >= 1.0 and df > q.max_term_frequency)
            or df > cutoff
        )
        (high if is_high else low).append(TermQuery(t, field=q.field))
    low_occur, high_occur = q.low_freq_occur, q.high_freq_occur
    low_msm = high_msm = 0
    if low_occur == "should" and low:
        low_msm = _ctq_min_should_match(q.low_freq_min_should_match, len(low))
    if high_occur == "should" and high:
        high_msm = _ctq_min_should_match(q.high_freq_min_should_match, len(high))
    if not low and high_msm == 0 and high_occur != "must":
        high_occur = "must"  # :179-187
    outer = BooleanQuery()
    if low:
        lb = BooleanQuery(min_should_match=low_msm)
        (lb.must if low_occur == "must" else lb.should).extend(low)
        outer.must.append(lb)
    if high:
        hb = BooleanQuery(min_should_match=high_msm)
        (hb.must if high_occur == "must" else hb.should).extend(high)
        outer.should.append(hb)
    return rewrite(outer, reader)


@dataclass
class BooleanQuery(Query):
    """MUST / SHOULD / MUST_NOT / FILTER clauses (BooleanClause.Occur;
    FILTER constrains matches like MUST but contributes no score,
    search/BooleanWeight.java)."""

    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    min_should_match: int = 0
    filter: list = field(default_factory=list)

    def terms(self) -> set[tuple[str, str]]:
        out: set[tuple[str, str]] = set()
        for q in (*self.must, *self.should, *self.must_not, *self.filter):
            out |= query_terms(q)
        return out


def query_terms(q: Query) -> set[tuple[str, str]]:
    """→ set of (field, term) pairs the query touches (TermContext analog)."""
    from .spans import SPAN_TYPES, span_terms

    if isinstance(q, SPAN_TYPES):
        return span_terms(q)
    from .intervals import IntervalQuery, interval_terms

    if isinstance(q, IntervalQuery):
        return {(q.field, t) for t in interval_terms(q)}
    if isinstance(q, TermQuery):
        return {(q.field, q.term)}
    if isinstance(q, PayloadScoreQuery):
        return {(q.field, q.term)}
    if isinstance(q, FeatureQuery):
        return {(q.field, q.feature)}
    from .termautomaton import TermAutomatonQuery

    if isinstance(q, TermAutomatonQuery):
        return {(q.field, t) for t in q.terms()}
    if isinstance(q, GraphTermsQuery):
        return {(q.field, t) for t in q.terms}
    if isinstance(q, PhraseQuery):
        return {(q.field, t) for t in q.terms}
    if isinstance(q, MultiPhraseQuery):
        return {(q.field, t) for slot in q.terms for t in slot}
    if isinstance(q, (SynonymQuery, ExpandedTermsQuery, TermInSetQuery, CommonTermsQuery,
                      BlendedTermQuery)):
        return {(q.field, t) for t in q.terms}
    if isinstance(q, (ConstantScoreQuery, BoostQuery, FunctionScoreQuery)):
        return query_terms(q.query)
    if isinstance(q, BoostedQuery):
        return query_terms(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        out: set[str] = set()
        for d in q.disjuncts:
            out |= query_terms(d)
        return out
    if isinstance(q, CoveringQuery):
        out = set()
        for c in q.queries:
            out |= query_terms(c)
        return out
    if isinstance(q, BooleanQuery):
        return q.terms()
    return set()


def needs_positions(q: Query) -> bool:
    """Whether evaluating ``q`` reads position (or payload) streams — used to
    prune ``pos_blob``/``pay_blob`` out of the postings parquet read
    (IndexOptions-aware I/O: a pure term/boolean batch reads ~half the
    bytes). Unknown query types conservatively return True."""
    if isinstance(q, (PhraseQuery, MultiPhraseQuery, PhrasePrefixQuery,
                      PayloadScoreQuery)):
        return True
    if isinstance(q, (TermQuery, MatchAllQuery, SynonymQuery,
                      ExpandedTermsQuery, TermInSetQuery, BlendedTermQuery,
                      CommonTermsQuery, NumericRangeQuery,
                      DocValuesNumbersQuery, DocValuesTermsQuery,
                      FunctionQuery, FunctionRangeQuery, FeatureQuery,
                      ExternalFileFunctionQuery, PrefixQuery, WildcardQuery,
                      RegexpQuery, TermRangeQuery, FuzzyQuery)):
        return False
    if isinstance(q, (ConstantScoreQuery, BoostQuery, FunctionScoreQuery)):
        return needs_positions(q.query)
    if isinstance(q, BoostedQuery):
        return needs_positions(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        return any(needs_positions(d) for d in q.disjuncts)
    if isinstance(q, CoveringQuery):
        return any(needs_positions(c) for c in q.queries)
    if isinstance(q, BooleanQuery):
        return any(
            needs_positions(c)
            for c in (*q.must, *q.should, *q.must_not, *q.filter)
        )
    return True  # spans, intervals, unknown extensions → read positions


def has_payload_query(q: Query) -> bool:
    """Whether the tree contains a PayloadScoreQuery (validated up-front
    against the manifest's ``payloads`` flag — an index built without
    DelimitedPayload analysis cannot answer it)."""
    if isinstance(q, PayloadScoreQuery):
        return True
    from .spans import SpanPayloadCheckQuery

    if isinstance(q, SpanPayloadCheckQuery):
        return True
    if isinstance(q, (ConstantScoreQuery, BoostQuery, FunctionScoreQuery)):
        return has_payload_query(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        return any(has_payload_query(d) for d in q.disjuncts)
    if isinstance(q, CoveringQuery):
        return any(has_payload_query(c) for c in q.queries)
    if isinstance(q, BooleanQuery):
        return any(
            has_payload_query(c)
            for c in (*q.must, *q.should, *q.must_not, *q.filter)
        )
    return False


def numeric_fields(q: Query, include_ranges: bool = True) -> set[str]:
    """Doc-value columns the query needs (PointValues / SortedDocValues
    analog — string columns load through the same pruned docs read)."""
    if isinstance(q, NumericRangeQuery):
        # include_ranges=False: fields used ONLY by pure range queries —
        # satisfiable from the point index (BKD analog) without loading
        # the doc-values column
        return {q.field} if include_ranges else set()
    if isinstance(q, (DocValuesNumbersQuery, DocValuesTermsQuery)):
        return {q.field}
    if isinstance(q, FunctionScoreQuery):
        return {q.field} | numeric_fields(q.query, include_ranges)
    if isinstance(q, FunctionQuery):
        from .expressions import compile_expression, variables

        return variables(compile_expression(q.expr)) - {"_score"}
    if isinstance(q, FunctionRangeQuery):
        from .expressions import compile_expression, variables

        return variables(compile_expression(q.expr)) - {"_score"}
    if isinstance(q, ExternalFileFunctionQuery):
        return {q.key_field}
    if isinstance(q, BoostedQuery):
        from .expressions import compile_expression, variables

        return (variables(compile_expression(q.expr)) - {"_score"}) | numeric_fields(q.query, include_ranges)
    if isinstance(q, (ConstantScoreQuery, BoostQuery)):
        return numeric_fields(q.query, include_ranges)
    if isinstance(q, DisjunctionMaxQuery):
        out: set[str] = set()
        for d in q.disjuncts:
            out |= numeric_fields(d, include_ranges)
        return out
    if isinstance(q, CoveringQuery):
        out = {q.field}
        for c in q.queries:
            out |= numeric_fields(c, include_ranges)
        return out
    if isinstance(q, BooleanQuery):
        out = set()
        for c in (*q.must, *q.should, *q.must_not, *q.filter):
            out |= numeric_fields(c, include_ranges)
        return out
    return set()


def rewrite(q: Query, reader) -> Query:
    """Query.rewrite analog (search/IndexSearcher.java:683-689): expand
    multi-term queries against the term dictionary, fold boosts down."""
    if isinstance(q, BoostQuery):
        inner = rewrite(q.query, reader)
        if isinstance(inner, TermQuery):
            return TermQuery(inner.term, inner.boost * q.boost, inner.field)
        if isinstance(inner, PhraseQuery):
            return PhraseQuery(inner.terms, inner.rel_positions, inner.boost * q.boost,
                               inner.field, inner.slop)
        if isinstance(inner, MultiPhraseQuery):
            return MultiPhraseQuery(inner.terms, inner.rel_positions, inner.boost * q.boost,
                                    inner.field, inner.slop)
        if isinstance(inner, (SynonymQuery, ExpandedTermsQuery, TermInSetQuery)):
            return type(inner)(inner.terms, inner.boost * q.boost, inner.field)
        if isinstance(inner, ConstantScoreQuery):
            return ConstantScoreQuery(inner.query, inner.boost * q.boost)
        return BoostQuery(inner, q.boost)
    if isinstance(q, MULTI_TERM_TYPES):
        return ExpandedTermsQuery(tuple(sorted(reader.expand_terms(q))), _mt_boost(q), q.field)
    if isinstance(q, TermInSetQuery):
        return ExpandedTermsQuery(tuple(sorted(q.terms)), q.boost, q.field)
    if isinstance(q, CommonTermsQuery):
        return _rewrite_common_terms(q, reader)
    if isinstance(q, PhrasePrefixQuery):
        exp = sorted(reader.expand_terms(PrefixQuery(q.prefix, field=q.field)))
        exp = exp[: q.max_expansions]
        if not exp:
            return BooleanQuery()  # no dictionary term matches → match nothing
        slots = tuple([(t,) for t in q.terms] + [tuple(exp)])
        return MultiPhraseQuery(slots, tuple(range(len(slots))), q.boost,
                                q.field, q.slop)
    if isinstance(q, GraphTermsQuery):
        stats = reader.term_stats([(q.field, t) for t in q.terms])
        keep = tuple(sorted(
            t for t in q.terms
            if 0 < stats.get((q.field, t), (0, 0))[0] <= q.max_doc_freq
        ))
        return ExpandedTermsQuery(keep, q.boost, q.field)
    if isinstance(q, FeatureQuery):
        if q.function == "saturation" and q.pivot is None:
            # pivot = decodeFeatureValue((float)(ttf/df)) over the whole index
            # (FeatureField.computePivotFeatureValue:539-551); missing term →
            # pivot 1 (never scored anyway)
            from ..util.feature import decode_feature_values

            df, ttf = reader.term_stats([(q.field, q.feature)]).get(
                (q.field, q.feature), (0, 0)
            )
            pivot = (
                float(decode_feature_values(np.float32(ttf / df))[()])
                if df
                else 1.0
            )
            return FeatureQuery(q.feature, "saturation", pivot=pivot,
                                boost=q.boost, field=q.field)
        return q
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(rewrite(q.query, reader), q.boost)
    if isinstance(q, FunctionScoreQuery):
        return FunctionScoreQuery(rewrite(q.query, reader), q.field, q.transform, q.boost)
    if isinstance(q, BoostedQuery):
        return BoostedQuery(rewrite(q.query, reader), q.expr)
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            tuple(rewrite(d, reader) for d in q.disjuncts), q.tie_breaker
        )
    if isinstance(q, CoveringQuery):
        return CoveringQuery(
            tuple(rewrite(c, reader) for c in q.queries), q.field, q.mod, q.offset
        )
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            must=[rewrite(c, reader) for c in q.must],
            should=[rewrite(c, reader) for c in q.should],
            must_not=[rewrite(c, reader) for c in q.must_not],
            min_should_match=q.min_should_match,
            filter=[rewrite(c, reader) for c in q.filter],
        )
    return q


def _mt_boost(q) -> float:
    return getattr(q, "boost", 1.0)


_TOKEN = re.compile(r"\(|\)|\"[^\"]*\"|AND\b|OR\b|NOT\b|[+\-]?[^\s()]+")
_FIELD_TOKEN = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", re.S)
_BOOST_SUFFIX = re.compile(r"^(.+?)\^(\d+(?:\.\d+)?)$", re.S)
_FUZZY_SUFFIX = re.compile(r"^(.+?)~(\d*)$", re.S)
_PHRASE_SUFFIX = re.compile(r"^(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?$")
_GROUP_BOOST = re.compile(r"^\^(\d+(?:\.\d+)?)$")

#: fields parsed VERBATIM (StringField analog); everything else is analyzed
DEFAULT_KEYWORD_FIELDS = ("repo", "path", "lang")


def parse_query(s: str, analyzer=None,
                keyword_fields: tuple[str, ...] = DEFAULT_KEYWORD_FIELDS,
                default_field: str = CONTENT_FIELD) -> Query:
    """Recursive-descent parser for the classic subset, incl. ``field:term``
    (``queryparser/classic/QueryParserBase.java:105``).

    Terms are passed through the analyzer (lowercase etc.) like
    ``QueryParserBase`` analyzes query text with the index analyzer; values
    of ``keyword_fields`` are kept verbatim (StringField semantics).
    """
    from ..analysis.tokenizer import StandardAnalyzer, analyze_with_positions

    analyzer = analyzer or StandardAnalyzer()
    kw_fields = set(keyword_fields)
    toks = _TOKEN.findall(s)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def advance():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or(fld=CONTENT_FIELD):
        left = [parse_and(fld)]
        while peek() in ("OR",) or (peek() is not None and peek() not in (")", "AND", "OR")):
            if peek() == "OR":
                advance()
            left.append(parse_and(fld))
        left = [q for q in left if q is not None]
        if len(left) == 1:
            return left[0]
        bq = BooleanQuery()
        for q in left:
            if isinstance(q, _Neg):
                bq.must_not.append(q.q)
            elif isinstance(q, _Req):
                bq.must.append(q.q)
            else:
                bq.should.append(q)
        return bq

    def parse_and(fld=CONTENT_FIELD):
        parts = [parse_unary(fld)]
        while peek() == "AND":
            advance()
            parts.append(parse_unary(fld))
        parts = [q for q in parts if q is not None]
        if len(parts) == 1:
            return parts[0]
        bq = BooleanQuery()
        for q in parts:
            if isinstance(q, _Neg):
                bq.must_not.append(q.q)
            else:
                bq.must.append(q.q if isinstance(q, _Req) else q)
        return bq

    def group_boost(q):
        """Optional ``^N`` token after a closing paren (QueryParser.jj:
        Clause boost applies to the whole group)."""
        nxt = peek()
        if q is not None and nxt is not None and _GROUP_BOOST.match(nxt):
            advance()
            return BoostQuery(_strip(q), float(nxt[1:]))
        return q

    def normalize(text, fld):
        """Analyzer.normalize analog for multi-term/range endpoints:
        lowercase without tokenizing (QueryParserBase.analyzeMultitermTerm);
        keyword-field values stay verbatim (StringField)."""
        return text if fld in kw_fields else text.lower()

    def parse_range(fld, tok):
        """``[lower TO upper]`` / ``{lower TO upper}`` (multi-token; ``*``
        = open end; QueryParserBase.getRangeQuery)."""
        include_lower = tok[0] == "["
        lower = tok[1:]
        if peek() == "TO":
            advance()
        up = advance() if peek() is not None else ""
        include_upper = True
        if up and up[-1] in "]}":
            include_upper = up[-1] == "]"
            up = up[:-1]
        lo = None if lower in ("*", "") else normalize(lower, fld)
        hi = None if up in ("*", "") else normalize(up, fld)
        return TermRangeQuery(lo, hi, include_lower, include_upper, field=fld)

    def parse_unary(fld=CONTENT_FIELD):
        t = peek()
        if t is None:
            return None
        if t == "NOT":
            advance()
            inner = parse_unary(fld)
            return _Neg(_strip(inner))
        if t == "(":
            advance()
            q = parse_or(fld)
            if peek() == ")":
                advance()
            return group_boost(q)
        tok = advance()
        req = neg = False
        if tok.startswith("+"):
            req, tok = True, tok[1:]
        elif tok.startswith("-"):
            neg, tok = True, tok[1:]

        def wrap(q):
            return _Neg(q) if neg else (_Req(q) if req else q)

        if tok == "*:*":  # MatchAllDocsQuery (QueryParser.jj STAR COLON STAR)
            return wrap(MatchAllQuery())
        m = _FIELD_TOKEN.match(tok)
        if m and not tok.startswith('"'):
            fld, tok = m.group(1), m.group(2)
        elif tok.endswith(":") and peek() == "(":  # field:(grouped clauses)
            fld = tok[:-1]
            advance()
            q = parse_or(fld)
            if peek() == ")":
                advance()
            return wrap(group_boost(q))
        if tok.startswith('"'):
            slop = 0
            boost = None
            nxt = peek()
            if nxt is not None and (sm := _PHRASE_SUFFIX.match(nxt)) and nxt:
                # "a b"~2 slop and/or "a b"^3 boost suffix
                advance()
                if sm.group(1):
                    slop = int(sm.group(1))
                if sm.group(2):
                    boost = float(sm.group(2))
            analyzed = analyze_with_positions(tok.strip('"'), analyzer)
            if not analyzed:
                return None
            if len(analyzed) == 1:
                q: Query = TermQuery(analyzed[0][0], field=fld)
            else:
                base = analyzed[0][1]
                q = PhraseQuery(
                    terms=tuple(t for t, _ in analyzed),
                    rel_positions=tuple(p - base for _, p in analyzed),
                    field=fld,
                    slop=slop,
                )
            return wrap(BoostQuery(q, boost) if boost is not None else q)
        boost = None
        mb = _BOOST_SUFFIX.match(tok)
        if mb and "^" not in mb.group(1):  # term^2 boost suffix
            tok, boost = mb.group(1), float(mb.group(2))

        def boosted(q):
            return wrap(BoostQuery(q, boost) if boost is not None else q)

        if tok and tok[0] in "[{":  # range (consumes TO + upper tokens)
            return boosted(parse_range(fld, tok))
        if "*" in tok or "?" in tok:  # wildcard / prefix
            pat = normalize(tok, fld)
            if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
                return boosted(PrefixQuery(pat[:-1], field=fld))
            return boosted(WildcardQuery(pat, field=fld))
        mf = _FUZZY_SUFFIX.match(tok)
        if mf:  # term~ / term~1 fuzzy (int editDistance, FuzzyQuery default 2)
            edits = int(mf.group(2)) if mf.group(2) else 2
            return boosted(
                FuzzyQuery(normalize(mf.group(1), fld), max_edits=edits, field=fld)
            )
        if fld in kw_fields:  # verbatim term (StringField)
            return boosted(TermQuery(tok.strip('"'), field=fld))
        analyzed = analyze_with_positions(tok, analyzer)
        if not analyzed:
            return None
        if len(analyzed) == 1:
            q = TermQuery(analyzed[0][0], field=fld)
        else:  # one input word analyzed into several terms → OR them
            q = BooleanQuery(should=[TermQuery(t0, field=fld) for t0, _ in analyzed])
        return boosted(q)

    q = parse_or(default_field)
    q = _strip(q)
    if isinstance(q, _Neg):  # pure negative query matches nothing (Lucene semantics)
        return BooleanQuery(must_not=[q.q])
    if q is None:
        return BooleanQuery()
    return q


#: unfielded-clause marker used by parse_multifield (never a real field name)
_MULTI_SENTINEL = "\x00multi"

#: leaf query types that carry a ``field`` and expand per-field
_MULTI_LEAVES = (TermQuery, PhraseQuery, MultiPhraseQuery, PrefixQuery,
                 WildcardQuery, RegexpQuery, FuzzyQuery, TermRangeQuery)


def _expand_multi(q: Query, fields: tuple[str, ...], boosts: dict | None):
    import dataclasses

    if q is None:
        return None
    if isinstance(q, BoostQuery):
        return BoostQuery(_expand_multi(q.query, fields, boosts), q.boost)
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(_expand_multi(q.query, fields, boosts), q.boost)
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            must=[_expand_multi(c, fields, boosts) for c in q.must],
            should=[_expand_multi(c, fields, boosts) for c in q.should],
            must_not=[_expand_multi(c, fields, boosts) for c in q.must_not],
            min_should_match=q.min_should_match,
            filter=[_expand_multi(c, fields, boosts) for c in q.filter],
        )
    if isinstance(q, _MULTI_LEAVES) and q.field == _MULTI_SENTINEL:
        parts: list[Query] = []
        for f in fields:
            qf = dataclasses.replace(q, field=f)
            b = boosts.get(f) if boosts else None
            parts.append(BoostQuery(qf, b) if b is not None and b != 1.0 else qf)
        return parts[0] if len(parts) == 1 else BooleanQuery(should=parts)
    return q


def parse_multifield(s: str, fields: tuple[str, ...],
                     boosts: dict[str, float] | None = None, analyzer=None,
                     keyword_fields: tuple[str, ...] = DEFAULT_KEYWORD_FIELDS) -> Query:
    """MultiFieldQueryParser analog (``queryparser/classic/
    MultiFieldQueryParser.java:56-120, getFieldQuery :214-243``): classic
    syntax where every CLAUSE without an explicit ``field:`` expands to a
    SHOULD disjunction of that clause over ``fields`` (per-field BoostQuery
    when ``boosts`` gives one) — ``a AND b`` over (f1, f2) becomes
    ``(f1:a OR f2:a) AND (f1:b OR f2:b)``, never a whole-query OR. Like the
    reference (one analyzer for every field), clause text is analyzed with
    the single query analyzer regardless of target field."""
    tree = parse_query(s, analyzer=analyzer, keyword_fields=keyword_fields,
                       default_field=_MULTI_SENTINEL)
    return _expand_multi(tree, tuple(fields), boosts)


def parse_complex_phrase(phrase: str, reader, slop: int = 0, analyzer=None,
                         field: str = CONTENT_FIELD) -> Query:
    """ComplexPhraseQueryParser analog
    (``lucene/queryparser/src/java/org/apache/lucene/queryparser/complexPhrase/
    ComplexPhraseQueryParser.java``): a quoted phrase whose embedded words may
    be wildcards, prefixes or fuzzy terms. Each word becomes a span clause —
    multi-term words expand against the term dictionary into a SpanOr of
    SpanTerms (SpanRewriteMethod), plain words analyze to a SpanTerm — and
    the clauses compose under an ordered SpanNearQuery with ``slop``
    (ComplexPhraseQuery.rewrite; in-order like the reference default)."""
    from ..analysis.tokenizer import StandardAnalyzer, analyze_with_positions
    from .spans import SpanNearQuery, SpanOrQuery, SpanTermQuery

    analyzer = analyzer or StandardAnalyzer()
    clauses = []
    for word in phrase.split():
        mf = _FUZZY_SUFFIX.match(word)
        if "*" in word or "?" in word:
            pat = word.lower()
            if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
                mt: Query = PrefixQuery(pat[:-1], field=field)
            else:
                mt = WildcardQuery(pat, field=field)
            terms = sorted(reader.expand_terms(mt))
        elif mf:
            edits = int(mf.group(2)) if mf.group(2) else 2
            terms = sorted(
                reader.expand_terms(
                    FuzzyQuery(mf.group(1).lower(), max_edits=edits, field=field)
                )
            )
        else:
            analyzed = analyze_with_positions(word, analyzer)
            terms = [analyzed[0][0]] if analyzed else []
        if not terms:
            return BooleanQuery()  # unmatchable slot → match nothing
        if len(terms) == 1:
            clauses.append(SpanTermQuery(terms[0], field=field))
        else:
            clauses.append(
                SpanOrQuery(tuple(SpanTermQuery(t, field=field) for t in terms))
            )
    if not clauses:
        return BooleanQuery()
    if len(clauses) == 1:
        return clauses[0]
    return SpanNearQuery(tuple(clauses), slop=slop, field=field)


@dataclass
class _Neg:
    q: Query


@dataclass
class _Req:
    q: Query


def _strip(q):
    if isinstance(q, _Req):
        return q.q
    return q


def parse_maxscore(qstr: str, tie: float = 0.0, analyzer=None) -> Query:
    """Solr ``{!maxscore tie=..}`` (solr/core/.../search/MaxScoreQParser.java):
    parse exactly like the lucene parser, then regroup — all SHOULD clauses
    move into one DisjunctionMaxQuery(tie) (only the best SHOULD clause
    contributes, plus tie·rest), MUST / MUST_NOT / FILTER pass through."""
    q = parse_query(qstr, analyzer=analyzer)
    if not isinstance(q, BooleanQuery):
        return q
    if not q.should:
        return q
    dmq = DisjunctionMaxQuery(tuple(q.should), tie)
    return BooleanQuery(
        must=list(q.must), should=[dmq], must_not=list(q.must_not),
        filter=list(q.filter), min_should_match=0,
    )
