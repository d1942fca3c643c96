"""MoreLikeThis — ``lucene/queries/src/java/org/apache/lucene/queries/mlt/
MoreLikeThis.java`` semantics:

interesting terms of the source doc scored ``tf · idf`` with
``idf = ln((numDocs+1)/(df+1)) + 1`` (the default TFIDF similarity's idf,
ClassicSimilarity.java:74), filtered by ``minTermFreq``/``minDocFreq``/
``maxDocFreq`` (:660-678), top ``maxQueryTerms`` (:649-686) OR'd into a
BooleanQuery (createQuery:618-642, boost off by default). Ties at equal
score break by term asc (the reference's PQ leaves ties unspecified; ours is
pinned deterministic).

Source-doc term freqs come from re-analyzing stored content (the
``like(Reader)`` path :600-612 — term vectors are not stored)."""

from __future__ import annotations

import math

from ..analysis.tokenizer import StandardAnalyzer, analyze_with_positions
from .query import BooleanQuery, CONTENT_FIELD, TermQuery

DEFAULT_MIN_TERM_FREQ = 2  # MoreLikeThis.java:156
DEFAULT_MIN_DOC_FREQ = 5  # :164
DEFAULT_MAX_QUERY_TERMS = 25  # :226


def interesting_terms(
    searcher,
    doc_id: int,
    *,
    field: str = CONTENT_FIELD,
    min_term_freq: int = DEFAULT_MIN_TERM_FREQ,
    min_doc_freq: int = DEFAULT_MIN_DOC_FREQ,
    max_doc_freq: int | None = None,
    max_query_terms: int = DEFAULT_MAX_QUERY_TERMS,
) -> list[tuple[str, float]]:
    """→ [(term, tf·idf score)] best-first. Requires stored content."""
    docs = searcher.reader.fetch_docs([int(doc_id)], columns=["doc_id", "content"])
    if not docs.num_rows:
        return []
    text = docs["content"][0].as_py() or ""
    tf: dict[str, int] = {}
    for t, _p in analyze_with_positions(text, StandardAnalyzer()):
        tf[t] = tf.get(t, 0) + 1
    cand = [t for t, f in tf.items() if not (min_term_freq > 0 and f < min_term_freq)]
    if not cand:
        return []
    stats = searcher.reader.term_stats(sorted((field, t) for t in cand))
    num_docs = searcher.reader.field_doc_count(field)
    scored: list[tuple[float, str]] = []
    for t in cand:
        df, _ttf = stats.get((field, t), (0, 0))
        if df == 0 or (min_doc_freq > 0 and df < min_doc_freq):
            continue
        if max_doc_freq is not None and df > max_doc_freq:
            continue
        idf = math.log((num_docs + 1) / float(df + 1)) + 1.0
        scored.append((tf[t] * idf, t))
    scored.sort(key=lambda st: (-st[0], st[1]))
    return [(t, s) for s, t in scored[:max_query_terms]]


def mlt_query(searcher, doc_id: int, **kwargs) -> BooleanQuery:
    """The MoreLikeThis query for ``doc_id`` (SHOULD over interesting terms)."""
    field = kwargs.get("field", CONTENT_FIELD)
    terms = interesting_terms(searcher, doc_id, **kwargs)
    return BooleanQuery(should=[TermQuery(t, field=field) for t, _s in terms])


def mlt_search(searcher, doc_id: int, k: int = 10, use_ray: bool = True, **kwargs):
    """Top-k docs like ``doc_id``, source doc excluded (Solr MLT component
    behavior) → pyarrow Table (rank, doc_id)."""
    import numpy as np
    import pyarrow as pa

    q = mlt_query(searcher, doc_id, **kwargs)
    if not q.should:
        return pa.table({"rank": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())})
    res = searcher.search({"q": q}, k=k + 1, use_ray=use_ray)
    ids = [d for d in res["doc_id"].to_pylist() if d != doc_id][:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(ids)), pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )
