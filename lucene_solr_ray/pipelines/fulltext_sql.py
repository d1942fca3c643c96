"""DuckDB oracle-SQL builder for the fulltext engine entries.

Replicates the engine's semantics exactly in ANSI-ish SQL so the driver's
side-by-side comparison (CORRECTNESS gate) verifies the whole pipeline:

- tokenization: ``regexp_extract_all(lower(text), '[\\p{L}\\p{N}_]+')`` is
  bit-identical to the Python analyzer's ``\\w+`` on this data;
- maxTokenLength=255 + the 33 StandardAnalyzer stopwords;
- doc ids: dense rank over the (source, path, commit) mapping used by
  ``corpus.documents_as_corpus``;
- SmallFloat intToByte4/byte4ToInt quantization via integer bit ops;
- BM25 with the engine's float64 op order (the engine's sql-compat mode;
  the reference-faithful float32 mode is verified against the in-repo
  brute-force oracle in pytest instead — SURVEY.md §2.6).

All float constants are injected with ``repr()`` so DuckDB parses the exact
same doubles Python computes with.
"""

from __future__ import annotations

import re

from ..analysis.tokenizer import ENGLISH_STOP_WORDS

K1 = 1.2
B = 0.75
W_COEF = K1 + 1  # 2.2000000000000002; repr-injected below

STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))

TOKEN_RE_SQL = r"[\p{L}\p{N}_]+"

# dense doc ids over the documents_as_corpus mapping (corpus.py)
CORPUS_CTE = """
corpus AS (
  SELECT row_number() OVER (ORDER BY source, 'doc/' || doc_id, printf('%040x', doc_id)) - 1 AS did,
         doc_id AS orig_id, source, lang, 'doc/' || doc_id AS path, text
  FROM documents
)"""

# v >= 8: keep top 4 significant bits (SmallFloat.longToInt4 floor quantization)
_QUANT = """
CASE WHEN flen < 32 THEN flen
     ELSE 24 + (((flen-24) >> (length(bin(flen-24))-4)) << (length(bin(flen-24))-4))
END"""

_NORM_BYTE = """
CASE WHEN flen < 24 THEN flen
     WHEN flen - 24 < 8 THEN flen
     ELSE 24 + ((((flen-24) >> (length(bin(flen-24))-4)) & 7) | ((length(bin(flen-24))-3) << 3))
END"""


def prelude(corpus_cte: str = CORPUS_CTE) -> str:
    return f"""
WITH {corpus_cte},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
tf AS (SELECT did, tok, count(*) AS tf FROM kept GROUP BY did, tok),
fl AS (
  SELECT c.did, count(k.tok) AS flen FROM corpus c LEFT JOIN kept k ON c.did = k.did GROUP BY c.did
),
quant AS (SELECT did, flen, {_QUANT} AS qlen, {_NORM_BYTE} AS nbyte FROM fl),
stats AS (
  SELECT (SELECT count(*) FROM corpus) AS dc,
         (SELECT coalesce(sum(flen), 0) FROM fl) AS sttf
),
idf AS (
  SELECT tok, count(*) AS df,
         ln(1 + ((SELECT dc FROM stats) - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM tf GROUP BY tok
),
avg_dl AS (SELECT CAST(sttf AS DOUBLE) / dc AS avgdl FROM stats)
"""


def sql_doc_norms() -> str:
    return prelude() + """
SELECT CAST(did AS BIGINT) AS doc_id, CAST(flen AS BIGINT) AS field_len,
       CAST(nbyte AS BIGINT) AS norm_byte
FROM quant ORDER BY did
"""


def sql_term_stats(limit: int = 200) -> str:
    return prelude() + f"""
SELECT i.tok AS term, CAST(i.df AS BIGINT) AS df, CAST(sum(t.tf) AS BIGINT) AS ttf
FROM idf i JOIN tf t ON i.tok = t.tok
GROUP BY i.tok, i.df
ORDER BY df DESC, term ASC LIMIT {limit}
"""


def sql_collection_stats() -> str:
    return prelude() + """
SELECT CAST((SELECT dc FROM stats) AS BIGINT) AS doc_count,
       CAST((SELECT sttf FROM stats) AS BIGINT) AS sum_ttf,
       CAST((SELECT count(*) FROM tf) AS BIGINT) AS sum_df,
       CAST((SELECT count(DISTINCT tok) FROM tf) AS BIGINT) AS distinct_terms
"""


def _score_cte(terms: list[str]) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    # engine float64 op order: weight = (idf*boost)*(k1+1); norm = k1*((1-b) + (b*qlen)/avgdl);
    # score = (weight*tf)/(tf+norm)
    return f"""
sc AS (
  SELECT k.did, k.tok,
         ((i.idf * {1.0!r}) * {K1 + 1!r}) * k.tf
           / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS s
  FROM tf k JOIN quant q USING (did) JOIN idf i ON k.tok = i.tok
  WHERE k.tok IN ({tl})
),
agg AS (SELECT did, sum(s) AS score, count(*) AS nmatch FROM sc GROUP BY did)
"""


def sql_topk(qid: str, kind: str, terms: list[str], k: int,
             not_terms: list[str] | None = None, msm: int = 0,
             with_score: bool = False) -> str:
    """One top-k query → (query_id, rank, doc_id[, score]).

    kind: 'term' | 'or' | 'and' | 'and_not' | 'msm'. ``score`` is emitted only
    for single-term queries (float64 bit-exact); boolean sums drop it because
    SQL's sum() order is unspecified at the last-ulp level (rank is stable).
    """
    terms = sorted(terms)
    if kind == "term":
        assert len(terms) == 1
        cond = "nmatch >= 1"
    elif kind == "or":
        cond = "nmatch >= 1"
    elif kind == "and":
        cond = f"nmatch = {len(terms)}"
    elif kind == "and_not":
        cond = f"nmatch = {len(terms)}"
    elif kind == "msm":
        cond = f"nmatch >= {msm}"
    else:
        raise ValueError(kind)
    notclause = ""
    if not_terms:
        ntl = ", ".join(f"'{t}'" for t in sorted(not_terms))
        notclause = f" AND did NOT IN (SELECT did FROM tf WHERE tok IN ({ntl}))"
    score_col = ", score" if with_score else ""
    return prelude() + "," + _score_cte(terms) + f"""
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id{score_col}
FROM agg WHERE {cond}{notclause}
ORDER BY score DESC, did ASC LIMIT {k}
"""


_TOKPOS_CTES = f"""
rawt AS (
  SELECT did, regexp_extract_all(lower(text), '{TOKEN_RE_SQL}') AS toks FROM corpus
),
tpos AS (
  SELECT did, unnest(generate_series(1, greatest(len(toks), 1))) AS i, toks
  FROM rawt WHERE len(toks) > 0
),
tp AS (SELECT did, toks[i] AS tok, i - 1 AS p FROM tpos WHERE i <= len(toks)),
ktp AS (
  SELECT did, tok, p FROM tp
  WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
)"""


def sql_phrase(qid: str, terms: list[str], rel: list[int], k: int) -> str:
    """Exact-phrase top-k: self-joins on the emitted-token position column;
    freq = matching start count; weight = summed idf (engine float64 order)."""
    joins = []
    conds = [f"t0.tok = '{terms[0]}'"]
    for i in range(1, len(terms)):
        joins.append(
            f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p = t0.p + {rel[i] - rel[0]}"
        )
        conds.append(f"t{i}.tok = '{terms[i]}'")
    idf_sum = " + ".join(f"(SELECT idf FROM idf WHERE tok = '{t}')" for t in terms)
    return prelude() + f""",
{_TOKPOS_CTES},
ph AS (
  SELECT t0.did, count(*) AS freq
  FROM ktp t0 {' '.join(joins)}
  WHERE {' AND '.join(conds)}
  GROUP BY t0.did
),
scored AS (
  SELECT ph.did,
         ((({idf_sum}) * {1.0!r}) * {K1 + 1!r}) * ph.freq
           / (ph.freq + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS score
  FROM ph JOIN quant q ON q.did = ph.did
)
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
"""


def sql_graph_terms(specs: list[dict]) -> str:
    """graphTerms oracle: docs containing any given term whose GLOBAL df is
    within the cap."""
    parts = []
    for sp in specs:
        tl = ", ".join(f"'{t}'" for t in sorted(sp["terms"]))
        parts.append(prelude() + f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT tf.did FROM tf JOIN idf USING (tok)
      WHERE tf.tok IN ({tl}) AND idf.df <= {sp["max_df"]}) t(did)
ORDER BY did""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_mmr_rerank(term: str, topn: int, lam: float, k: int = 10) -> str:
    """MMR oracle: BM25 top-N candidates with min-max rel, then a recursive
    CTE replays the greedy argmax of round(λ·rel − (1−λ)·maxsim, 9) with
    doc-id tie-break; cosine over DOUBLE-cast embedding lists."""
    return prelude() + "," + _term_score_cte("s1", term) + f""",
topn AS (SELECT did, score FROM s1 ORDER BY score DESC, did ASC LIMIT {topn}),
mm AS (SELECT min(score) AS lo, max(score) AS hi FROM topn),
cand AS (
  SELECT t.did,
         CASE WHEN (SELECT hi FROM mm) > (SELECT lo FROM mm)
              THEN (t.score - (SELECT lo FROM mm))
                   / ((SELECT hi FROM mm) - (SELECT lo FROM mm))
              ELSE 1.0 END AS rel,
         CAST(e.embedding AS DOUBLE[]) AS emb
  FROM topn t JOIN embeddings e ON e.vec_id = t.did
)
SELECT rank, doc_id FROM (
  WITH RECURSIVE mmr(it, sel, pick) AS (
    SELECT 0, CAST([] AS BIGINT[]), CAST(NULL AS BIGINT)
    UNION ALL
    SELECT it + 1, list_append(sel, p.did), p.did
    FROM mmr, LATERAL (
      SELECT c.did
      FROM cand c
      WHERE NOT list_contains(mmr.sel, c.did)
      ORDER BY round({lam!r} * c.rel - CASE WHEN len(mmr.sel) = 0 THEN 0.0
                ELSE {1 - lam!r} * (SELECT max(list_cosine_similarity(c2.emb, c.emb))
                                    FROM cand c2 WHERE list_contains(mmr.sel, c2.did)) END, 9) DESC,
               c.did ASC
      LIMIT 1
    ) p
    WHERE it < {k}
  )
  SELECT CAST(it - 1 AS BIGINT) AS rank, CAST(pick AS BIGINT) AS doc_id
  FROM mmr WHERE it > 0
) ORDER BY rank
"""


def sql_maxscore(specs: list[dict], k: int = 10) -> str:
    """{!maxscore} oracle: should clauses fold through
    max + (sum − max)·tie (DisjunctionMaxScorer order: disjuncts summed in
    repr-sorted ≡ term-alphabetical order); must clauses add on top and
    define the doc set."""
    parts = []
    for sp in specs:
        toks = sp["q"].split()
        must = sorted(t[1:] for t in toks if t.startswith("+"))
        should = sorted(t for t in toks if not t.startswith(("+", "-")))
        ctes, names = [], []
        for i, t in enumerate(must + should):
            ctes.append(_term_score_cte(f"m{i}", t))
            names.append(f"m{i}")
        m_names = names[:len(must)]
        s_names = names[len(must):]
        joins = []
        base = m_names[0] if m_names else s_names[0]
        for nm in names:
            if nm == base:
                continue
            jk = "JOIN" if nm in m_names else "LEFT JOIN"
            joins.append(f"{jk} {nm} ON {nm}.did = {base}.did")
        if not m_names:
            # pure disjunction: FULL OUTER union of should matches — each
            # later disjunct joins on the COALESCED did of all prior ones
            # (joining on the first disjunct alone would split docs missing
            # it into duplicate partial rows; same pattern as the edismax
            # oracle)
            sel = s_names[0]
            for i, nm in enumerate(s_names[1:], start=1):
                prior = ", ".join(f"{p}.did" for p in s_names[:i])
                sel += f" FULL OUTER JOIN {nm} ON coalesce({prior}) = {nm}.did"
            did = "coalesce(" + ", ".join(f"{nm}.did" for nm in s_names) + ")"
            u = (f"SELECT {did} AS did, "
                 + ", ".join(
                     f"coalesce({nm}.score, 0.0) AS s{j}"
                     for j, nm in enumerate(s_names))
                 + f" FROM {sel}")
        else:
            u = (f"SELECT {base}.did AS did, "
                 + ", ".join(
                     f"coalesce({nm}.score, 0.0) AS s{j}"
                     for j, nm in enumerate(s_names))
                 + ", " + " + ".join(f"{nm}.score" for nm in m_names) + " AS msum"
                 + f" FROM {base} " + " ".join(joins))
        svars = [f"s{j}" for j in range(len(s_names))]
        smax = f"greatest({', '.join(svars)})" if len(svars) > 1 else svars[0]
        ssum = " + ".join(svars)
        dmax = f"({smax} + (({ssum}) - {smax}) * {sp['tie']!r})"
        score = f"msum + {dmax}" if m_names else dmax
        parts.append(prelude() + "," + ",".join(c.lstrip(",\n") for c in ctes) + f""",
u AS ({u})
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM (SELECT did, {score} AS score FROM u)
ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_term_automaton(specs: list[dict], k: int = 10) -> str:
    """TermAutomatonQuery oracle: slots of (offset, alternative terms) —
    freq = count of start positions where every slot has one of its terms at
    start+offset; weight = summed idf of ALL automaton terms (engine float64
    order; terms missing from the corpus contribute nothing, matching
    idfExplain's stats-bearing-terms-only sum)."""
    parts = []
    for sp in specs:
        slots = sp["slots"]
        base_off = slots[0][0]
        joins, conds = [], []
        for i, (off, terms) in enumerate(slots):
            tl = ", ".join(f"'{t}'" for t in terms)
            if i == 0:
                conds.append(f"t0.tok IN ({tl})")
            else:
                joins.append(
                    f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p = t0.p + {off - base_off}"
                )
                conds.append(f"t{i}.tok IN ({tl})")
        all_terms = [t for _, ts in slots for t in ts]
        idf_sum = " + ".join(
            f"coalesce((SELECT idf FROM idf WHERE tok = '{t}'), 0.0)"
            for t in all_terms
        )
        parts.append(prelude() + f""",
{_TOKPOS_CTES},
ph AS (
  SELECT t0.did, count(*) AS freq
  FROM ktp t0 {' '.join(joins)}
  WHERE {' AND '.join(conds)}
  GROUP BY t0.did
),
scored AS (
  SELECT ph.did,
         ((({idf_sum}) * {1.0!r}) * {K1 + 1!r}) * ph.freq
           / (ph.freq + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS score
  FROM ph JOIN quant q ON q.did = ph.did
)
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_phrase_sloppy_union(specs: list[dict]) -> str:
    """Sloppy-phrase match sets → (query_id, doc_id).

    A doc matches iff some choice of one position per term has normalized
    width ``greatest(p_i - i) - least(p_i - i) <= slop`` — equivalent to the
    engine's SloppyPhraseMatcher existence result for distinct-term phrases
    (the heap propagation always discovers a minimal-width alignment)."""
    parts = []
    for s in specs:
        terms, slop, qid = s["terms"], s["slop"], s["qid"]
        joins = " ".join(
            f"JOIN ktp t{i} ON t{i}.did = t0.did" for i in range(1, len(terms))
        )
        conds = " AND ".join(f"t{i}.tok = '{t}'" for i, t in enumerate(terms))
        norm = [f"(t{i}.p - {i})" for i in range(len(terms))]
        width = f"greatest({', '.join(norm)}) - least({', '.join(norm)})"
        parts.append(f"""
SELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT t0.did AS did FROM ktp t0 {joins}
      WHERE {conds} AND {width} <= {slop})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_phrase_union(specs: list[dict]) -> str:
    parts = [sql_phrase(s["qid"], s["terms"], s["rel"], s["k"]) for s in specs]
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


def sql_phrase_prefix(specs: list[dict]) -> str:
    """match_phrase_prefix oracle: fixed leading terms at consecutive kept
    positions, any kept token with the prefix at the next position →
    (query_id, doc_id) match sets. (The engine caps dictionary expansion at
    max_expansions=50; spec prefixes are chosen to expand below the cap, so
    the unbounded LIKE is equivalent.)"""
    parts = []
    for s in specs:
        terms = s["terms"]
        n = len(terms)
        joins = " ".join(
            f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p = t0.p + {i}"
            for i in range(1, n + 1)
        )
        conds = " AND ".join(f"t{i}.tok = '{t}'" for i, t in enumerate(terms))
        parts.append(f"""
SELECT '{s["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT t0.did AS did FROM ktp t0 {joins}
      WHERE {conds} AND t{n}.tok LIKE '{s["prefix"]}%')""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_prefix_union(specs: list[dict]) -> str:
    """Constant-score prefix retrieval: (query_id, doc_id) sets."""
    parts = [
        f"""SELECT '{s["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT did FROM tf WHERE tok LIKE '{s["prefix"]}%')"""
        for s in specs
    ]
    return prelude() + " " + " UNION ALL ".join(parts)


def sql_facets(term: str, field: str = "source") -> str:
    """Facet counts over docs matching ``term`` → (value, count)."""
    return prelude() + f"""
SELECT c.{field} AS value, CAST(count(*) AS BIGINT) AS count
FROM (SELECT DISTINCT did FROM tf WHERE tok = '{term}') m JOIN corpus c USING (did)
GROUP BY c.{field} ORDER BY count DESC, value
"""


def sql_facet_range(term: str, start: int, end: int, gap: int) -> str:
    """Range-facet oracle over field_len for docs matching ``term``:
    'before', every [lo, lo+gap) bucket of [start, end) (zero counts
    included), 'after' — ordered before, ascending starts, after."""
    n_buckets = (end - start + gap - 1) // gap
    return prelude() + f""",
matched AS (
  SELECT q.flen FROM (SELECT DISTINCT did FROM tf WHERE tok = '{term}') m
  JOIN quant q USING (did)
),
buckets AS (
  SELECT 0 AS ord, 'before' AS bucket, count(*) FILTER (flen < {start}) AS count FROM matched
  UNION ALL
  SELECT 1 + i AS ord, CAST({start} + i * {gap} AS VARCHAR) AS bucket,
         (SELECT count(*) FROM matched
          WHERE flen >= {start} + i * {gap} AND flen < {start} + (i + 1) * {gap}) AS count
  FROM (SELECT unnest(generate_series(0, {n_buckets - 1})) AS i)
  UNION ALL
  SELECT {n_buckets + 1} AS ord, 'after' AS bucket, count(*) FILTER (flen >= {end}) AS count FROM matched
)
SELECT bucket, CAST(count AS BIGINT) AS count FROM buckets ORDER BY ord
"""


def sql_grouped_search(term: str, n_groups: int, docs_per_group: int) -> str:
    """Grouped top-k oracle: top groups by best float64 BM25 score for
    ``term`` (tie: value asc), docs within a group by (score desc, did asc).
    → (group, group_rank, rank, doc_id, score)."""
    return prelude() + "," + _score_cte([term]) + f""",
g AS (SELECT c.source AS grp, a.did, a.score FROM agg a JOIN corpus c USING (did)),
best AS (SELECT grp, max(score) AS best FROM g GROUP BY grp),
sel AS (
  SELECT grp, row_number() OVER (ORDER BY best DESC, grp ASC) - 1 AS group_rank
  FROM best ORDER BY best DESC, grp ASC LIMIT {n_groups}
),
ranked AS (
  SELECT g.grp, s.group_rank,
         row_number() OVER (PARTITION BY g.grp ORDER BY g.score DESC, g.did ASC) - 1 AS rank,
         g.did, g.score
  FROM g JOIN sel s ON g.grp = s.grp
)
SELECT grp AS "group", CAST(group_rank AS BIGINT) AS group_rank,
       CAST(rank AS BIGINT) AS rank, CAST(did AS BIGINT) AS doc_id, score
FROM ranked WHERE rank < {docs_per_group} ORDER BY group_rank, rank
"""


def sql_termvectors(doc_ids: list[int]) -> str:
    """Term-vector oracle: per-doc (term, tf) for the fixed doc ids."""
    dl = ", ".join(str(d) for d in sorted(doc_ids))
    return prelude() + f"""
SELECT CAST(did AS BIGINT) AS doc_id, tok AS term, CAST(tf AS BIGINT) AS tf
FROM tf WHERE did IN ({dl}) ORDER BY did, tok
"""


def sql_facet_hierarchy(term: str, f1: str = "source", f2: str = "lang") -> str:
    """Taxonomy facet oracle: counts at both levels of the ``f1/f2`` dimension
    path over docs matching ``term``; level-1 = roll-up of children.
    → (level, path, count), count desc / path asc within level."""
    return prelude() + f""",
m AS (SELECT DISTINCT did FROM tf WHERE tok = '{term}'),
l2 AS (
  SELECT c.{f1} AS v1, c.{f2} AS v2, count(*) AS n
  FROM m JOIN corpus c USING (did) GROUP BY c.{f1}, c.{f2}
)
SELECT CAST(1 AS BIGINT) AS level, v1 AS path, CAST(sum(n) AS BIGINT) AS count
FROM l2 GROUP BY v1
UNION ALL
SELECT CAST(2 AS BIGINT) AS level, v1 || '/' || v2 AS path, CAST(n AS BIGINT) AS count
FROM l2
ORDER BY level, count DESC, path
"""


def sql_facet_sampled(term: str, field: str = "source", rate_pct: int = 40) -> str:
    """Sampled facet oracle: deterministic md5 doc sampler
    (first 15 hex nibbles of md5(str(doc_id)) mod 100 < rate_pct), counts over
    the sample → (value, count)."""
    return prelude() + f""",
m AS (SELECT DISTINCT did FROM tf WHERE tok = '{term}'),
s AS (
  SELECT did FROM m
  WHERE CAST(('0x' || substr(md5(CAST(did AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < {rate_pct}
)
SELECT c.{field} AS value, CAST(count(*) AS BIGINT) AS count
FROM s JOIN corpus c USING (did)
GROUP BY c.{field} ORDER BY count DESC, value
"""


def sql_sorted_by_field(term: str, field: str = "path", k: int = 10, desc: bool = False) -> str:
    """Top-k matching docs ordered by a stored field (TopFieldCollector)."""
    direction = "DESC" if desc else "ASC"
    return prelude() + f"""
SELECT CAST(m.did AS BIGINT) AS doc_id, c.{field} AS {field}
FROM (SELECT DISTINCT did FROM tf WHERE tok = '{term}') m JOIN corpus c USING (did)
ORDER BY c.{field} {direction}, m.did ASC LIMIT {k}
"""


def _term_score_cte(name: str, term: str, boost: float = 1.0) -> str:
    """CTE ``name`` = (did, score) BM25 float64 scores of one term (engine op
    order; same expression as ``_score_cte``)."""
    return f"""
{name} AS (
  SELECT k.did,
         ((i.idf * {boost!r}) * {K1 + 1!r}) * k.tf
           / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS score
  FROM tf k JOIN quant q USING (did) JOIN idf i ON k.tok = i.tok
  WHERE k.tok = '{term}'
)"""


def sql_cluster_results(term: str, topn: int, k: int, iters: int,
                        dim: int = 64) -> str:
    """Search-result-clustering oracle: replays the engine's deterministic
    spherical k-means EXACTLY by unrolling the fixed Lloyd iterations into
    chained CTEs — BM25 top-N hits joined to embeddings, L2-normalized,
    evenly-spaced init (np.linspace index semantics incl. the exact
    endpoint), per-iteration argmax-dot assignment with first-max (lowest
    cluster) tie-break, mean→renormalize centroid update that keeps the
    previous centroid for empty/zero-norm clusters. Output = the LAST
    iteration's assignment (the engine updates centroids once more after
    it, unused)."""
    cte = prelude() + "," + _term_score_cte("s1", term) + f""",
hits AS (SELECT did FROM s1 ORDER BY score DESC, did ASC LIMIT {topn}),
emb0 AS (
  SELECT e.vec_id AS did, e.embedding AS v
  FROM embeddings e JOIN hits h ON e.vec_id = h.did
),
pts AS (
  SELECT did, i AS d, CAST(v[i] AS DOUBLE) AS val
  FROM emb0, generate_series(1, {dim}) AS g(i)
),
nrm AS (SELECT did, greatest(sqrt(sum(val * val)), 1e-12) AS n
        FROM pts GROUP BY did),
npts AS MATERIALIZED (SELECT p.did, p.d, p.val / q.n AS val
         FROM pts p JOIN nrm q USING (did)),
ranked AS (SELECT did, row_number() OVER (ORDER BY did ASC) - 1 AS idx
           FROM emb0),
nn AS (SELECT count(*) AS n, least({k}, count(*)) AS kk FROM emb0),
init_idx AS (
  SELECT j AS c,
         CASE WHEN (SELECT kk FROM nn) = 1 THEN 0
              WHEN j = (SELECT kk FROM nn) - 1 THEN (SELECT n FROM nn) - 1
              ELSE CAST(floor(j * (((SELECT n FROM nn) - 1.0)
                                   / ((SELECT kk FROM nn) - 1))) AS BIGINT)
         END AS idx
  FROM generate_series(0, {k - 1}) AS s(j)
  WHERE j < (SELECT kk FROM nn)
),
cent0 AS MATERIALIZED (
  SELECT ii.c, p.d, p.val
  FROM init_idx ii JOIN ranked r ON r.idx = ii.idx
  JOIN npts p ON p.did = r.did
)"""
    for t in range(iters):
        cte += f""",
asg{t} AS MATERIALIZED (
  SELECT did, c FROM (
    SELECT s.did, s.c,
           row_number() OVER (PARTITION BY s.did
                              ORDER BY s.dp DESC, s.c ASC) AS rn
    FROM (SELECT p.did, ct.c, sum(p.val * ct.val) AS dp
          FROM npts p JOIN cent{t} ct USING (d)
          GROUP BY p.did, ct.c) s) WHERE rn = 1
)"""
        if t < iters - 1:
            cte += f""",
mstats{t} AS (
  SELECT a.c, p.d, avg(p.val) AS mv
  FROM asg{t} a JOIN npts p USING (did) GROUP BY a.c, p.d
),
mnorm{t} AS (SELECT c, sqrt(sum(mv * mv)) AS nn FROM mstats{t} GROUP BY c),
cent{t + 1} AS MATERIALIZED (
  SELECT ct.c, ct.d,
         CASE WHEN ms.mv IS NOT NULL AND mn.nn > 1e-12
              THEN ms.mv / mn.nn ELSE ct.val END AS val
  FROM cent{t} ct
  LEFT JOIN mstats{t} ms ON ms.c = ct.c AND ms.d = ct.d
  LEFT JOIN mnorm{t} mn ON mn.c = ct.c
)"""
    last = iters - 1
    return cte + f""",
sizes AS (SELECT c, count(*) AS sz FROM asg{last} GROUP BY c)
SELECT CAST(a.did AS BIGINT) AS doc_id, CAST(a.c AS BIGINT) AS cluster,
       CAST(s.sz AS BIGINT) AS cluster_size
FROM asg{last} a JOIN sizes s USING (c)
ORDER BY doc_id
"""


def sql_terms_enum(prefixes: list[str]) -> str:
    """TermsComponent oracle: per prefix, matching kept-token dictionary
    entries with global df, term-ordered."""
    parts = [
        prelude() + f"""
SELECT '{p}' AS prefix, tok AS term, CAST(df AS BIGINT) AS df
FROM idf WHERE tok LIKE '{p}%' ORDER BY tok
"""
        for p in prefixes
    ]
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_filter_query(k: int = 10) -> str:
    """FILTER-clause oracle: fm = MUST merge + FILTER window (score = merge's
    BM25 only), ff = pure FILTER spark (score 0 → doc-id order), fo = SHOULD
    (vector, customer) + FILTER data."""
    fm = prelude() + "," + _term_score_cte("s1", "merge") + f""",
fb AS (SELECT DISTINCT did FROM tf WHERE tok = 'window')
SELECT 'fm' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM s1 JOIN fb USING (did) ORDER BY score DESC, did ASC LIMIT {k}
"""
    ff = prelude() + f"""
SELECT 'ff' AS query_id,
       CAST(row_number() OVER (ORDER BY did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT did FROM tf WHERE tok = 'spark') ORDER BY did ASC LIMIT {k}
"""
    fo = prelude() + "," + _score_cte(["customer", "vector"]) + f""",
fb AS (SELECT DISTINCT did FROM tf WHERE tok = 'data')
SELECT 'fo' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM agg JOIN fb USING (did) WHERE nmatch >= 1
ORDER BY score DESC, did ASC LIMIT {k}
"""
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in (fm, ff, fo))


def sql_dismax(specs: list[dict]) -> str:
    """DisMax oracle (DisjunctionMaxScorer.score): per doc,
    max + ((sum) - max) * tie over {content BM25 score, keyword constant
    score}, engine float64 op order (sum first, subtract max, scale, add)."""
    parts = []
    for sp in specs:
        kw = _kw_score_sql(sp["kw_col"] if sp["kw_col"] != "source" else "source",
                           sp["kw_val"])
        parts.append(prelude() + "," + _term_score_cte("s1", sp["term"]) + f""",
kw AS (SELECT did, {kw} AS score FROM corpus WHERE {sp["kw_col"]} = '{sp["kw_val"]}'),
u AS (
  SELECT coalesce(s1.did, kw.did) AS did,
         coalesce(s1.score, 0.0) AS sa, coalesce(kw.score, 0.0) AS sb
  FROM s1 FULL OUTER JOIN kw ON s1.did = kw.did
),
sc2 AS (
  SELECT did,
         greatest(sa, sb) + ((sa + sb) - greatest(sa, sb)) * {sp["tie"]!r} AS score
  FROM u
)
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM sc2 ORDER BY score DESC, did ASC LIMIT 10
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_join_scored(specs: list[dict]) -> str:
    """Scored-join oracle (JoinUtil ScoreMode.Max/Total/Avg): per-value
    aggregate of from-doc BM25 scores, every doc with that value scored by
    the aggregate → (query_id, rank, doc_id)."""
    agg_sql = {"max": "max(score)", "total": "sum(score)",
               "avg": "sum(score) / count(*)"}
    parts = []
    for sp in specs:
        parts.append(prelude() + "," + _term_score_cte("s1", sp["term"]) + f""",
fv AS (SELECT s1.did, s1.score, c.{sp["col"]} AS v FROM s1 JOIN corpus c USING (did)),
va AS (SELECT v, {agg_sql[sp["mode"]]} AS vs FROM fv GROUP BY v),
hits AS (SELECT c.did, va.vs FROM corpus c JOIN va ON c.{sp["col"]} = va.v)
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY vs DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM hits ORDER BY vs DESC, did ASC LIMIT 10
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_classify_nb(sample_max: int) -> str:
    """Naive Bayes oracle (SimpleNaiveBayesClassifier formulas): per sampled
    doc and class, ln(nc) - ln(N) + Σ tf·ln((co+1)/(avgU·nc + N)); assigned
    = argmax (lexicographic tie-break). Docs with no kept tokens are skipped
    (no likelihood evidence)."""
    return prelude() + f""",
dt AS (SELECT DISTINCT did, tok FROM kept),
co AS (
  SELECT dt.tok, c.lang, count(*) AS n
  FROM dt JOIN corpus c USING (did) GROUP BY dt.tok, c.lang
),
cls AS (SELECT lang, count(*) AS nc FROM corpus GROUP BY lang),
st AS (
  SELECT (SELECT count(*) FROM corpus) AS n_docs,
         (SELECT count(*) FROM dt) AS sum_df
),
tfs AS (
  SELECT did, tok, count(*) AS tf FROM kept WHERE did < {sample_max}
  GROUP BY did, tok
),
sc AS (
  SELECT t.did, cl.lang,
         ln(CAST(cl.nc AS DOUBLE)) - ln(CAST(st.n_docs AS DOUBLE))
         + sum(t.tf * ln((coalesce(co.n, 0) + 1)
                         / (CAST(st.sum_df AS DOUBLE) / st.n_docs * cl.nc + st.n_docs))) AS score
  FROM tfs t CROSS JOIN cls cl CROSS JOIN st
  LEFT JOIN co ON co.tok = t.tok AND co.lang = cl.lang
  GROUP BY t.did, cl.lang, cl.nc, st.n_docs, st.sum_df
)
SELECT CAST(did AS BIGINT) AS doc_id, lang AS assigned
FROM (SELECT did, lang,
             row_number() OVER (PARTITION BY did ORDER BY score DESC, lang ASC) AS rn
      FROM sc)
WHERE rn = 1 ORDER BY did
"""


def sql_classify_bm25nb(sample_max: int) -> str:
    """BM25NB oracle (BM25NBClassifier formulas): the keyword class field
    omits norms, so the class-term BM25 top-1 is exactly idf_c; per
    (tok, lang) the SHOULD-clause maximum is weight_tok · max over class
    docs of tf/(tf + k1·((1−b) + b·qlen/avgdl)); score = ln(idf_c) +
    Σ tf·ln(idf_c + max-part); assigned = argmax (lexicographic
    tie-break, matching the engine's strictly-greater replace)."""
    return prelude() + f""",
mxp AS (
  SELECT t.tok, c.lang,
         max(CAST(t.tf AS DOUBLE)
             / (t.tf + {K1!r} * ((1 - {B!r})
                + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl)))) AS mx
  FROM tf t JOIN quant q USING (did) JOIN corpus c USING (did)
  GROUP BY t.tok, c.lang
),
cls AS (
  SELECT lang, count(*) AS nc,
         ln(1 + ((SELECT dc FROM stats) - count(*) + 0.5)
               / (count(*) + 0.5)) AS cidf
  FROM corpus GROUP BY lang
),
tfs AS (SELECT did, tok, tf FROM tf WHERE did < {sample_max}),
sc AS (
  SELECT t.did, cl.lang,
         ln(cl.cidf)
         + sum(t.tf * ln(cl.cidf
               + coalesce(i.idf * {K1 + 1!r} * m.mx, 0))) AS score
  FROM tfs t CROSS JOIN cls cl
  JOIN idf i ON i.tok = t.tok
  LEFT JOIN mxp m ON m.tok = t.tok AND m.lang = cl.lang
  GROUP BY t.did, cl.lang, cl.cidf
)
SELECT CAST(did AS BIGINT) AS doc_id, lang AS assigned
FROM (SELECT did, lang,
             row_number() OVER (PARTITION BY did ORDER BY score DESC, lang ASC) AS rn
      FROM sc)
WHERE rn = 1 ORDER BY did
"""


def sql_pivot_facets(term: str) -> str:
    """Pivot-facet oracle: nested (repo=source, lang, count) over docs
    matching ``term`` (column NAMES follow the engine's repo/lang fields)."""
    return prelude() + f""",
m AS (SELECT DISTINCT did FROM tf WHERE tok = '{term}')
SELECT c.source AS repo, c.lang AS lang, CAST(count(*) AS BIGINT) AS count
FROM m JOIN corpus c USING (did)
GROUP BY c.source, c.lang
"""


def sql_drill_sideways(term: str, repo_val: str, lang_val: str) -> str:
    """DrillSideways oracle over dims repo (=source) and lang: each dim's
    counts with its own filter removed, the other dim's filter + the base
    term query applied → (dim, value, count)."""
    return prelude() + f""",
m AS (SELECT DISTINCT did FROM tf WHERE tok = '{term}')
SELECT 'lang' AS dim, c.lang AS value, CAST(count(*) AS BIGINT) AS count
FROM m JOIN corpus c USING (did) WHERE c.source = '{repo_val}'
GROUP BY c.lang
UNION ALL
SELECT 'repo' AS dim, c.source AS value, CAST(count(*) AS BIGINT) AS count
FROM m JOIN corpus c USING (did) WHERE c.lang = '{lang_val}'
GROUP BY c.source
"""


def sql_field_stats(term: str) -> str:
    """StatsComponent oracle: exact integer moments of field_len over the
    docs matching ``term``; mean/stddev computed from the integer moments in
    float64 with the engine's op order (Solr StatsValuesFactory stddev:
    sqrt((count*sumsq - sum^2)/(count*(count-1)))."""
    return prelude() + f""",
m AS (SELECT DISTINCT did FROM tf WHERE tok = '{term}'),
v AS (SELECT q.flen FROM m JOIN quant q USING (did)),
mo AS (
  SELECT count(*) AS n, CAST(coalesce(sum(flen), 0) AS BIGINT) AS s,
         CAST(coalesce(sum(flen * flen), 0) AS BIGINT) AS sq,
         min(flen) AS mn, max(flen) AS mx
  FROM v
)
SELECT CAST(n AS BIGINT) AS count, CAST(mn AS BIGINT) AS min,
       CAST(mx AS BIGINT) AS max, s AS sum,
       CASE WHEN n = 0 THEN NULL ELSE CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END AS mean,
       CASE WHEN n = 0 THEN NULL
            WHEN n = 1 THEN 0.0
            ELSE sqrt((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
       END AS stddev
FROM mo
"""


def sql_rescore(first_term: str, second_term: str, first_k: int, k: int,
                weight: float) -> str:
    """QueryRescorer oracle: top-``first_k`` hits of ``first_term``, combined
    score = first + weight*second (0 when the hit doesn't match the second
    term), re-sorted (score desc, did asc), top ``k``."""
    return prelude() + "," + _term_score_cte("s1", first_term) + "," \
        + _term_score_cte("s2", second_term) + f""",
first_pass AS (SELECT did, score FROM s1 ORDER BY score DESC, did ASC LIMIT {first_k}),
comb AS (
  SELECT f.did, f.score + {weight!r} * coalesce(s2.score, 0.0) AS score
  FROM first_pass f LEFT JOIN s2 USING (did)
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM comb ORDER BY score DESC, did ASC LIMIT {k}
"""


def sql_index_sorted(term: str, k: int = 10) -> str:
    """Oracle for the lang-index-sorted build (``setIndexSort`` analog):
    doc ids are dense ranks over (lang, repo, path, commit), so the
    early-terminating sorted search's answer is the first k matches in
    doc-id order → (doc_id, lang)."""
    return f"""
WITH corpus AS (
  SELECT row_number() OVER (
           ORDER BY lang, source, 'doc/' || doc_id, printf('%040x', doc_id)
         ) - 1 AS did,
         lang, text
  FROM documents
),
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
m AS (
  SELECT DISTINCT did FROM toks
  WHERE tok = '{term}' AND length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
)
SELECT CAST(m.did AS BIGINT) AS doc_id, c.lang AS lang
FROM m JOIN corpus c USING (did)
ORDER BY c.lang ASC, m.did ASC LIMIT {k}
"""


def _kw_score_sql(col: str, value: str) -> str:
    """BM25 score of one keyword-field term (StringField: tf=1, omitNorms →
    norm=k1, BM25Similarity.java:263), engine float64 op order."""
    dfk = f"(SELECT count(*) FROM corpus WHERE {col} = '{value}')"
    idf = f"ln(1 + ((SELECT dc FROM stats) - {dfk} + 0.5) / ({dfk} + 0.5))"
    return f"((({idf}) * {1.0!r}) * {K1 + 1!r}) * {1.0!r} / ({1.0!r} + {K1!r})"


def sql_field_search(specs: list[dict]) -> str:
    """field:term query set → (query_id, rank, doc_id).

    kinds: 'kw' (keyword term only — constant score, rank = doc order),
    'kw_and_content' (MUST keyword + MUST content term; score = kw_const +
    content_score, the engine's canonical clause order), 'path_prefix'
    (constant-score doc set, rank = doc order)."""
    parts = []
    for sp in specs:
        qid = sp["qid"]
        if sp["kind"] == "kw":
            parts.append(prelude() + f"""
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (ORDER BY did) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM corpus WHERE {sp['col']} = '{sp['value']}' ORDER BY did LIMIT {sp['k']}
""")
        elif sp["kind"] == "kw_and_content":
            kw = _kw_score_sql(sp["col"], sp["value"])
            parts.append(prelude() + "," + _score_cte([sp["term"]]) + f"""
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (ORDER BY {kw} + a.score DESC, a.did ASC) - 1 AS BIGINT) AS rank,
       CAST(a.did AS BIGINT) AS doc_id
FROM agg a JOIN corpus c USING (did)
WHERE c.{sp['col']} = '{sp['value']}' AND a.nmatch >= 1
ORDER BY {kw} + a.score DESC, a.did ASC LIMIT {sp['k']}
""")
        elif sp["kind"] == "path_prefix":
            parts.append(prelude() + f"""
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (ORDER BY did) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM corpus WHERE path LIKE '{sp['prefix']}%' ORDER BY did
""")
        else:
            raise ValueError(sp["kind"])
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


def sql_numeric_range(specs: list[dict]) -> str:
    """Numeric range query set over field_len → (query_id, rank, doc_id).

    Pure ranges are constant-score: top-k = first k doc ids. The combined
    spec ('term' present) is MUST(term) + MUST(range): score = 1.0 (the
    range clause's constant, accumulated first in the engine's canonical
    clause order) + the term's BM25 score, ranked desc with doc-id asc
    tie-break."""
    parts = []
    for sp in specs:
        qid, k = sp["qid"], sp["k"]
        conds = []
        if sp.get("lower") is not None:
            op = ">=" if sp.get("include_lower", True) else ">"
            conds.append(f"flen {op} {sp['lower']}")
        if sp.get("upper") is not None:
            op = "<=" if sp.get("include_upper", True) else "<"
            conds.append(f"flen {op} {sp['upper']}")
        cond = " AND ".join(conds) if conds else "TRUE"
        if "term" in sp:
            parts.append(prelude() + "," + _score_cte([sp["term"]]) + f"""
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (ORDER BY {1.0!r} + a.score DESC, a.did ASC) - 1 AS BIGINT) AS rank,
       CAST(a.did AS BIGINT) AS doc_id
FROM agg a JOIN quant q USING (did)
WHERE a.nmatch >= 1 AND {cond.replace('flen', 'q.flen')}
ORDER BY {1.0!r} + a.score DESC, a.did ASC LIMIT {k}
""")
        else:
            parts.append(prelude() + f"""
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (ORDER BY did) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM fl WHERE {cond} ORDER BY did LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


def sql_topk_union(specs: list[dict]) -> str:
    """UNION ALL of several sql_topk queries (shared column set)."""
    with_score = all(s.get("with_score") for s in specs)
    parts = [
        sql_topk(s["qid"], s["kind"], s["terms"], s["k"],
                 s.get("not_terms"), s.get("msm", 0), with_score)
        for s in specs
    ]
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


# ---------------------------------------------------------------------------
# analyzer-variant preludes (filter chains): the CTE names (tf, fl, quant,
# stats, idf, avg_dl) are kept identical to prelude()'s so _score_cte and the
# top-k SELECT bodies work verbatim over any variant index.
# ---------------------------------------------------------------------------

_VARIANT_TAIL = f"""
tf AS (SELECT did, tok, count(*) AS tf FROM emitted GROUP BY did, tok),
fl AS (
  SELECT c.did, count(b.tok) AS flen FROM corpus c LEFT JOIN base b ON c.did = b.did GROUP BY c.did
),
quant AS (SELECT did, flen, {_QUANT} AS qlen, {_NORM_BYTE} AS nbyte FROM fl),
stats AS (
  -- avgdl divides sumTotalTermFreq (ALL emitted tokens, overlaps included —
  -- BM25Similarity.avgFieldLength:87-101) even though per-doc norm lengths
  -- discount overlaps; Lucene's own asymmetry, kept faithfully
  SELECT (SELECT count(*) FROM corpus) AS dc,
         (SELECT count(*) FROM emitted) AS sttf
),
idf AS (
  SELECT tok, count(*) AS df,
         ln(1 + ((SELECT dc FROM stats) - count(*) + 0.5) / (count(*) + 0.5)) AS idf
  FROM tf GROUP BY tok
),
avg_dl AS (SELECT CAST(sttf AS DOUBLE) / dc AS avgdl FROM stats)
"""


def prelude_shingle(lo: int, hi: int) -> str:
    """ShingleFilter index (no stopwords): emitted = unigrams + space-joined
    n-grams of consecutive tokens for n in lo..hi; norm length counts only
    unigrams (shingles are posIncr-0 overlaps under discountOverlaps)."""
    shingle_selects = "\n".join(
        f"  UNION ALL SELECT did, unnest([array_to_string(ts[i:i+{n - 1}], ' ')"
        f" for i in generate_series(1, len(ts) - {n - 1})]) AS tok FROM tokl"
        for n in range(lo, hi + 1)
    )
    return f"""
WITH {CORPUS_CTE},
tokl AS (
  SELECT did, list_filter(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
                          t -> length(t) <= 255) AS ts
  FROM corpus
),
base AS (SELECT did, unnest(ts) AS tok FROM tokl),
emitted AS (
  SELECT did, tok FROM base
{shingle_selects}
),{_VARIANT_TAIL}"""


def prelude_edge_ngram(lo: int, hi: int) -> str:
    """EdgeNGramTokenFilter index (default stopwords): each kept token is
    REPLACED by its prefixes of length lo..min(hi, len); tokens shorter than
    lo vanish; norm length counts one position per surviving token (the first
    gram; the rest are overlaps)."""
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
base AS (SELECT did, tok FROM kept WHERE length(tok) >= {lo}),
emitted AS (
  SELECT did, unnest([tok[1:g] for g in generate_series({lo}, {hi}) if length(tok) >= g]) AS tok
  FROM kept
),{_VARIANT_TAIL}"""


def prelude_synonyms(pairs: list[tuple[str, str]]) -> str:
    """SynonymFilter index: each (src → syn) pair ADDS the synonym token at
    the source's position (overlap; excluded from the norm length)."""
    syn_selects = "\n".join(
        f"  UNION ALL SELECT did, '{syn}' AS tok FROM base WHERE tok = '{src}'"
        for src, syn in pairs
    )
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
base AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
emitted AS (
  SELECT did, tok FROM base
{syn_selects}
),{_VARIANT_TAIL}"""


def _de_step(ends3: str, s_endings_pos: int) -> str:
    """One German light-stem step (de/GermanLightStemmer.java step1/step2) as
    a CASE over column ``t``; the two steps differ only in the 3-char suffix
    and where the valid s/st-ending letter sits."""
    s_end = ", ".join(f"'{c}'" for c in "bdfghklmnt")
    if s_endings_pos == 1:  # step1: e[mnrs] strips, s after valid ending
        return f"""
CASE WHEN length(t) > 5 AND right(t, 3) = '{ends3}' THEN left(t, length(t)-3)
     WHEN length(t) > 4 AND right(t, 2) IN ('em','en','er','es') THEN left(t, length(t)-2)
     WHEN length(t) > 3 AND right(t, 1) = 'e' THEN left(t, length(t)-1)
     WHEN length(t) > 3 AND right(t, 1) = 's'
          AND substr(t, length(t)-1, 1) IN ({s_end}) THEN left(t, length(t)-1)
     ELSE t END"""
    return f"""
CASE WHEN length(t) > 5 AND right(t, 3) = '{ends3}' THEN left(t, length(t)-3)
     WHEN length(t) > 4 AND right(t, 2) IN ('er','en') THEN left(t, length(t)-2)
     WHEN length(t) > 4 AND right(t, 2) = 'st'
          AND substr(t, length(t)-2, 1) IN ({s_end}) THEN left(t, length(t)-2)
     ELSE t END"""


#: GermanNormalizationFilter on ASCII input (the corpus tokens are \\w+
#: ASCII, so the umlaut/ß arms of the FSM never fire): ae→a and oe→o
#: always; ue→u when not preceded by a vowel or q. Left-to-right global
#: regex replacement is equivalent to the single-pass FSM on this alphabet
#: (verified against german_normalize over the corpus vocabulary in
#: tests/test_lang_analysis.py).
_DE_NORM_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(tok,"
    " 'ae', 'a', 'g'), 'oe', 'o', 'g'),"
    " '(^|[^aeiouyq])ue', '\\1u', 'g')"
)


def prelude_german() -> str:
    """GermanAnalyzer index oracle: German snowball stopwords →
    normalization → UniNE light stem (two CASE steps)."""
    from ..analysis.lang import GERMAN_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(GERMAN_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
denorm AS (SELECT did, {_DE_NORM_SQL} AS t FROM kept),
dest1 AS (SELECT did, {_de_step('ern', 1)} AS t FROM denorm),
emitted AS MATERIALIZED (SELECT did, {_de_step('est', 2)} AS tok FROM dest1),{_VARIANT_TAIL}"""


#: SpanishLightStemmer on ASCII input (es/SpanishLightStemmer.java; accent
#: fold never fires on \w+ ASCII corpus tokens)
_ES_STEM_SQL = """
CASE WHEN length(t) < 5 THEN t
     WHEN right(t, 1) IN ('o','a','e') THEN left(t, length(t)-1)
     WHEN right(t, 4) = 'eses' THEN left(t, length(t)-2)
     WHEN right(t, 3) = 'ces' THEN left(t, length(t)-3) || 'z'
     WHEN right(t, 2) IN ('os','as','es') THEN left(t, length(t)-2)
     ELSE t END"""


def prelude_spanish() -> str:
    """SpanishAnalyzer index oracle: Spanish snowball stopwords → UniNE
    light stem (single CASE)."""
    from ..analysis.lang import SPANISH_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(SPANISH_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
es0 AS (SELECT did, tok AS t FROM kept),
emitted AS MATERIALIZED (SELECT did, {_ES_STEM_SQL} AS tok FROM es0),{_VARIANT_TAIL}"""


#: ItalianLightStemmer on ASCII input (it/ItalianLightStemmer.java; accent
#: fold never fires on \w+ ASCII corpus tokens): strip a final vowel, two
#: chars when preceded by i/h per the elision/plural rules; len < 6 passes
_IT_STEM_SQL = """
CASE WHEN length(t) < 6 THEN t
     WHEN right(t, 1) = 'e' THEN
          CASE WHEN substr(t, length(t)-1, 1) IN ('i','h')
               THEN left(t, length(t)-2) ELSE left(t, length(t)-1) END
     WHEN right(t, 1) = 'i' THEN
          CASE WHEN substr(t, length(t)-1, 1) IN ('h','i')
               THEN left(t, length(t)-2) ELSE left(t, length(t)-1) END
     WHEN right(t, 1) IN ('a','o') THEN
          CASE WHEN substr(t, length(t)-1, 1) = 'i'
               THEN left(t, length(t)-2) ELSE left(t, length(t)-1) END
     ELSE t END"""


def prelude_italian() -> str:
    """ItalianAnalyzer index oracle: Italian snowball stopwords → Savoy
    light stem (elision is a no-op on apostrophe-free tokens)."""
    from ..analysis.lang import ITALIAN_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(ITALIAN_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
it0 AS (SELECT did, tok AS t FROM kept),
emitted AS MATERIALIZED (SELECT did, {_IT_STEM_SQL} AS tok FROM it0),{_VARIANT_TAIL}"""


def prelude_portuguese() -> str:
    """PortugueseAnalyzer index oracle (pt/PortugueseLightStemmer.java on
    the ASCII corpus alphabet): suffix removal → feminine normalization →
    final-vowel strip → accent fold. Accented SUFFIX branches (éis/óis/
    ões/ães) can't fire on \w+ ASCII tokens, but the ona→ão and esa→ês
    REWRITES can introduce accents that the trailing fold removes — the
    replace() tail replays exactly that."""
    from ..analysis.lang import PORTUGUESE_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(PORTUGUESE_STOP_WORDS))
    sfx = """
CASE WHEN length(t) > 4 AND right(t, 2) = 'es'
          AND substr(t, length(t)-2, 1) IN ('r','s','l','z') THEN left(t, length(t)-2)
     WHEN length(t) > 3 AND right(t, 2) = 'ns' THEN left(t, length(t)-2) || 'm'
     WHEN length(t) > 4 AND right(t, 3) = 'eis' THEN left(t, length(t)-3) || 'el'
     WHEN length(t) > 4 AND right(t, 3) = 'ais' THEN left(t, length(t)-2) || 'l'
     WHEN length(t) > 4 AND right(t, 2) = 'is' THEN left(t, length(t)-1) || 'l'
     WHEN length(t) > 6 AND right(t, 5) = 'mente' THEN left(t, length(t)-5)
     WHEN length(t) > 3 AND right(t, 1) = 's' THEN left(t, length(t)-1)
     ELSE t END"""
    fem = """
CASE WHEN NOT (length(t) > 3 AND right(t, 1) = 'a') THEN t
     WHEN length(t) > 7 AND right(t, 4) IN ('inha','iaca','eira') THEN left(t, length(t)-1) || 'o'
     WHEN length(t) > 6 AND right(t, 3) IN ('osa','ica','ida','ada','iva','ama') THEN left(t, length(t)-1) || 'o'
     WHEN length(t) > 6 AND right(t, 3) = 'ona' THEN left(t, length(t)-3) || 'ão'
     WHEN length(t) > 6 AND right(t, 3) = 'ora' THEN left(t, length(t)-1)
     WHEN length(t) > 6 AND right(t, 3) = 'esa' THEN left(t, length(t)-3) || 'ês'
     WHEN length(t) > 6 AND right(t, 2) = 'na' THEN left(t, length(t)-1) || 'o'
     ELSE t END"""
    strip = """
CASE WHEN length(t) > 4 AND right(t, 1) IN ('e','a','o') THEN left(t, length(t)-1)
     ELSE t END"""
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
pt0 AS (SELECT did, tok AS orig, tok AS t FROM kept),
pt1 AS (SELECT did, orig, {sfx} AS t FROM pt0),
pt2 AS (SELECT did, orig, {fem} AS t FROM pt1),
pt3 AS (SELECT did, orig, {strip} AS t FROM pt2),
emitted AS MATERIALIZED (
  SELECT did, CASE WHEN length(orig) < 4 THEN orig
                   ELSE replace(replace(t, 'ã', 'a'), 'ê', 'e') END AS tok
  FROM pt3
),{_VARIANT_TAIL}"""


def _fr_stem_ctes() -> str:
    """FrenchLightStemmer (fr/FrenchLightStemmer.java) as CTE stages over
    (did, t [, done]): the Java method's early ``return norm(...)`` branches
    set ``done``; fall-through branches (trice/ète/ique) transform without
    terminating; every path ends in the norm() tail. Accent folding is
    omitted — corpus tokens are ASCII (the full stemmer incl. accents is
    golden-tested in tests/test_lang_analysis.py)."""
    L = "length(t)"

    def strip(n: int, add: str = "") -> str:
        a = f" || '{add}'" if add else ""
        return f"left(t, {L}-{n}){a}"

    # terminal group 1: issement issant ement ficatrice ficateur catrice
    # cateur atrice ateur
    g1 = f"""
CASE WHEN {L} > 9 AND right(t, 8) = 'issement' THEN {strip(7, 'r')}
     WHEN {L} > 8 AND right(t, 6) = 'issant' THEN {strip(5, 'r')}
     WHEN {L} > 6 AND right(t, 5) = 'ement' THEN
          CASE WHEN {L}-4 > 3 AND right(left(t, {L}-4), 3) = 'ive'
               THEN {strip(6, 'f')} ELSE {strip(4)} END
     WHEN {L} > 11 AND right(t, 9) = 'ficatrice' THEN {strip(7, 'er')}
     WHEN {L} > 10 AND right(t, 8) = 'ficateur' THEN {strip(6, 'er')}
     WHEN {L} > 9 AND right(t, 7) = 'catrice' THEN {strip(7, 'quer')}
     WHEN {L} > 8 AND right(t, 6) = 'cateur' THEN {strip(6, 'quer')}
     WHEN {L} > 8 AND right(t, 6) = 'atrice' THEN {strip(6, 'er')}
     WHEN {L} > 7 AND right(t, 5) = 'ateur' THEN {strip(5, 'er')}
     ELSE t END"""
    g1_done = (
        f"(({L} > 9 AND right(t, 8) = 'issement') OR ({L} > 8 AND right(t, 6) = 'issant')"
        f" OR ({L} > 6 AND right(t, 5) = 'ement') OR ({L} > 11 AND right(t, 9) = 'ficatrice')"
        f" OR ({L} > 10 AND right(t, 8) = 'ficateur') OR ({L} > 9 AND right(t, 7) = 'catrice')"
        f" OR ({L} > 8 AND right(t, 6) = 'cateur') OR ({L} > 8 AND right(t, 6) = 'atrice')"
        f" OR ({L} > 7 AND right(t, 5) = 'ateur'))"
    )
    # terminal group 2 (after the trice fall-through): ième teuse teur euse
    # ère ive folle/molle nnelle nnel
    g2 = f"""
CASE WHEN done THEN t
     WHEN {L} > 5 AND right(t, 4) = 'ième' THEN {strip(4)}
     WHEN {L} > 7 AND right(t, 5) = 'teuse' THEN {strip(3, 'r')}
     WHEN {L} > 6 AND right(t, 4) = 'teur' THEN {strip(2, 'r')}
     WHEN {L} > 5 AND right(t, 4) = 'euse' THEN {strip(2)}
     WHEN {L} > 8 AND right(t, 3) = 'ère' THEN {strip(3, 'er')}
     WHEN {L} > 7 AND right(t, 3) = 'ive' THEN {strip(2, 'f')}
     WHEN {L} > 4 AND (right(t, 5) = 'folle' OR right(t, 5) = 'molle') THEN {strip(3, 'u')}
     WHEN {L} > 9 AND right(t, 6) = 'nnelle' THEN {strip(5)}
     WHEN {L} > 9 AND right(t, 4) = 'nnel' THEN {strip(3)}
     ELSE t END"""
    g2_done = (
        f"(done OR ({L} > 5 AND right(t, 4) = 'ième') OR ({L} > 7 AND right(t, 5) = 'teuse')"
        f" OR ({L} > 6 AND right(t, 4) = 'teur') OR ({L} > 5 AND right(t, 4) = 'euse')"
        f" OR ({L} > 8 AND right(t, 3) = 'ère') OR ({L} > 7 AND right(t, 3) = 'ive')"
        f" OR ({L} > 4 AND (right(t, 5) = 'folle' OR right(t, 5) = 'molle'))"
        f" OR ({L} > 9 AND right(t, 6) = 'nnelle') OR ({L} > 9 AND right(t, 4) = 'nnel'))"
    )
    # terminal group 3 (after ète/ique fall-throughs): esse inage
    # isation(+ual) isateur ation ition
    g3 = f"""
CASE WHEN done THEN t
     WHEN {L} > 8 AND right(t, 4) = 'esse' THEN {strip(3)}
     WHEN {L} > 7 AND right(t, 5) = 'inage' THEN {strip(3)}
     WHEN {L} > 9 AND right(t, 7) = 'isation' THEN
          CASE WHEN {L}-7 > 5 AND right(left(t, {L}-7), 3) = 'ual'
               THEN {strip(9, 'el')} ELSE {strip(7)} END
     WHEN {L} > 9 AND right(t, 7) = 'isateur' THEN {strip(7)}
     WHEN {L} > 8 AND right(t, 5) = 'ation' THEN {strip(5)}
     WHEN {L} > 8 AND right(t, 5) = 'ition' THEN {strip(5)}
     ELSE t END"""
    # norm(): adjacent-duplicate-letter collapse (len>4), ie strip (len>4),
    # then a len>4-guarded sequential r/e/e/double-letter strip
    collapse = (
        f"array_to_string([t[i] for i in generate_series(1, {L})"
        f" if i = 1 OR t[i] != t[i-1] OR NOT regexp_matches(t[i], '^[a-z]$')], '')"
    )
    return f"""
fr0 AS (SELECT did, tok AS t FROM kept),
fr1 AS (SELECT did,
  CASE WHEN length(t) > 5 AND right(t, 1) = 'x' THEN
         CASE WHEN substr(t, length(t)-2, 1) = 'a' AND substr(t, length(t)-1, 1) = 'u'
                   AND substr(t, length(t)-3, 1) != 'e'
              THEN left(t, length(t)-2) || 'l'
              ELSE left(t, length(t)-1) END
       ELSE t END AS t FROM fr0),
fr2 AS (SELECT did,
  CASE WHEN length(t) > 3 AND right(t, 1) = 'x' THEN left(t, length(t)-1) ELSE t END AS t
  FROM fr1),
fr3 AS (SELECT did,
  CASE WHEN length(t) > 3 AND right(t, 1) = 's' THEN left(t, length(t)-1) ELSE t END AS t
  FROM fr2),
fr4 AS (SELECT did, {g1} AS t, {g1_done} AS done FROM fr3),
fr5 AS (SELECT did,
  CASE WHEN NOT done AND {L} > 6 AND right(t, 5) = 'trice'
       THEN left(t, {L}-4) || 'eur' ELSE t END AS t, done FROM fr4),
fr6 AS (SELECT did, {g2} AS t, {g2_done} AS done FROM fr5),
fr7 AS (SELECT did,
  CASE WHEN NOT done AND {L} > 4 AND right(t, 3) = 'ète'
       THEN left(t, {L}-3) || 'et' ELSE t END AS t, done FROM fr6),
fr8 AS (SELECT did,
  CASE WHEN NOT done AND {L} > 8 AND right(t, 4) = 'ique'
       THEN left(t, {L}-4) ELSE t END AS t, done FROM fr7),
fr9 AS (SELECT did, {g3} AS t FROM fr8),
nr1 AS (SELECT did,
  CASE WHEN {L} > 4 THEN {collapse} ELSE t END AS t FROM fr9),
nr2 AS (SELECT did,
  CASE WHEN {L} > 4 AND right(t, 2) = 'ie' THEN left(t, {L}-2) ELSE t END AS t FROM nr1),
nr3 AS (SELECT did, t, {L} > 4 AS g FROM nr2),
nr4 AS (SELECT did,
  CASE WHEN g AND right(t, 1) = 'r' THEN left(t, {L}-1) ELSE t END AS t, g FROM nr3),
nr5 AS (SELECT did,
  CASE WHEN g AND right(t, 1) = 'e' THEN left(t, {L}-1) ELSE t END AS t, g FROM nr4),
nr6 AS (SELECT did,
  CASE WHEN g AND right(t, 1) = 'e' THEN left(t, {L}-1) ELSE t END AS t, g FROM nr5),
emitted AS MATERIALIZED (SELECT did,
  CASE WHEN g AND {L} >= 2 AND t[{L}] = t[{L}-1] AND regexp_matches(t[{L}], '^[a-z]$')
       THEN left(t, {L}-1) ELSE t END AS tok FROM nr6)"""
    # ^ MATERIALIZED: the downstream tf/stats/score CTEs reference emitted
    # several times; inlining re-expands the whole 18-stage chain per
    # reference and the optimizer chokes (>200 s at sf0.001 vs 0.3 s)


_SQL_VOWELS = "'a','e','i','o','u','y'"

#: SwedishLightStemmer (sv/SwedishLightStemmer.java:66-110) on column t
#: AFTER the final-s strip; pure ASCII suffix rules, no accent arm.
_SV_STEM_SQL = f"""
CASE WHEN length(t) > 7 AND right(t, 5) IN ('elser','heten') THEN left(t, length(t)-5)
     WHEN length(t) > 6 AND right(t, 4) IN ('arne','erna','ande','else','aste','orna','aren') THEN left(t, length(t)-4)
     WHEN length(t) > 5 AND right(t, 3) IN ('are','ast','het') THEN left(t, length(t)-3)
     WHEN length(t) > 4 AND right(t, 2) IN ('ar','er','or','en','at','te','et') THEN left(t, length(t)-2)
     WHEN length(t) > 3 AND right(t, 1) IN ('t','a','e','n') THEN left(t, length(t)-1)
     ELSE t END"""


def prelude_swedish() -> str:
    """SwedishAnalyzer index oracle: Swedish snowball stopwords → light
    stem (final -s strip stage, then one suffix CASE)."""
    from ..analysis.lang import SWEDISH_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(SWEDISH_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
sv0 AS (
  SELECT did, CASE WHEN length(tok) > 4 AND right(tok, 1) = 's'
                   THEN left(tok, length(tok)-1) ELSE tok END AS t
  FROM kept
),
emitted AS MATERIALIZED (SELECT did, {_SV_STEM_SQL} AS tok FROM sv0),{_VARIANT_TAIL}"""


#: HungarianLightStemmer (hu/HungarianLightStemmer.java:89-142) removeCase
#: on ASCII input (accent fold never fires on \\w+ ASCII tokens). SQL
#: position map: s[len-1-k] == substr(t, length(t)-k, 1).
_HU_CASE_SQL = f"""
CASE WHEN length(t) > 6 AND right(t, 4) = 'kent' THEN left(t, length(t)-4)
     WHEN length(t) > 5 AND right(t, 3) IN ('nak','nek','val','vel','ert','rol','ban','ben','bol','nal','nel','hoz','hez','tol') THEN left(t, length(t)-3)
     WHEN length(t) > 5 AND right(t, 2) IN ('al','el') AND substr(t, length(t)-2, 1) NOT IN ({_SQL_VOWELS})
          AND substr(t, length(t)-2, 1) = substr(t, length(t)-3, 1) THEN left(t, length(t)-3)
     WHEN length(t) > 4 AND right(t, 2) IN ('at','et','ot','va','ve','ra','re','ba','be','ul','ig') THEN left(t, length(t)-2)
     WHEN length(t) > 4 AND right(t, 2) IN ('on','en') AND substr(t, length(t)-2, 1) NOT IN ({_SQL_VOWELS}) THEN left(t, length(t)-2)
     WHEN length(t) > 4 AND right(t, 1) IN ('t','n') THEN left(t, length(t)-1)
     WHEN length(t) > 4 AND right(t, 1) IN ('a','e') AND substr(t, length(t)-1, 1) = substr(t, length(t)-2, 1)
          AND substr(t, length(t)-1, 1) NOT IN ({_SQL_VOWELS}) THEN left(t, length(t)-2)
     ELSE t END"""

_HU_POSS_SQL = f"""
CASE WHEN length(t) > 6 AND right(t, 4) IN ('atok','otok','etek') AND substr(t, length(t)-4, 1) NOT IN ({_SQL_VOWELS}) THEN left(t, length(t)-4)
     WHEN length(t) > 6 AND right(t, 4) IN ('itek','itok') THEN left(t, length(t)-4)
     WHEN length(t) > 5 AND right(t, 3) IN ('unk','tok','tek') AND substr(t, length(t)-3, 1) NOT IN ({_SQL_VOWELS}) THEN left(t, length(t)-3)
     WHEN length(t) > 5 AND right(t, 3) = 'juk' AND substr(t, length(t)-3, 1) IN ({_SQL_VOWELS}) THEN left(t, length(t)-3)
     WHEN length(t) > 5 AND right(t, 3) = 'ink' THEN left(t, length(t)-3)
     WHEN length(t) > 4 AND right(t, 2) IN ('am','em','om','ad','ed','od','uk') AND substr(t, length(t)-2, 1) NOT IN ({_SQL_VOWELS}) THEN left(t, length(t)-2)
     WHEN length(t) > 4 AND right(t, 2) IN ('nk','ja','je') AND substr(t, length(t)-2, 1) IN ({_SQL_VOWELS}) THEN left(t, length(t)-2)
     WHEN length(t) > 4 AND right(t, 2) IN ('im','id','ik') THEN left(t, length(t)-2)
     WHEN length(t) > 3 AND right(t, 1) IN ('a','e') AND substr(t, length(t)-1, 1) NOT IN ({_SQL_VOWELS}) THEN left(t, length(t)-1)
     WHEN length(t) > 3 AND right(t, 1) IN ('m','d') AND substr(t, length(t)-1, 1) IN ({_SQL_VOWELS}) THEN left(t, length(t)-1)
     WHEN length(t) > 3 AND right(t, 1) = 'i' THEN left(t, length(t)-1)
     ELSE t END"""

#: plural strip with the Java fallthrough: -[aoe]k strips two only at
#: length > 4, any other -k strips one at length > 3
_HU_PLUR_SQL = """
CASE WHEN length(t) > 4 AND right(t, 1) = 'k' AND substr(t, length(t)-1, 1) IN ('a','o','e') THEN left(t, length(t)-2)
     WHEN length(t) > 3 AND right(t, 1) = 'k' THEN left(t, length(t)-1)
     ELSE t END"""

_HU_NORM_SQL = """
CASE WHEN length(t) > 3 AND right(t, 1) IN ('a','e','i','o') THEN left(t, length(t)-1)
     ELSE t END"""


def prelude_hungarian() -> str:
    """HungarianAnalyzer index oracle: Hungarian snowball stopwords →
    UniNE light stem as four CTE stages (case → possessive → plural →
    normalize); the accent fold never fires on the ASCII corpus."""
    from ..analysis.lang import HUNGARIAN_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(HUNGARIAN_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
hu0 AS (SELECT did, tok AS t FROM kept),
hu1 AS (SELECT did, {_HU_CASE_SQL} AS t FROM hu0),
hu2 AS (SELECT did, {_HU_POSS_SQL} AS t FROM hu1),
hu3 AS (SELECT did, {_HU_PLUR_SQL} AS t FROM hu2),
emitted AS MATERIALIZED (SELECT did, {_HU_NORM_SQL} AS tok FROM hu3),{_VARIANT_TAIL}"""


#: FinnishLightStemmer (fi/FinnishLightStemmer.java:85-100) step1, one
#: application. The Java recursion re-checks -kin/-ko until no match;
#: three chained applications reach the fixpoint for every token the
#: \\w+ corpus can produce (tokens needing deeper recursion would have to
#: stack 'kin'/'ko' suffixes past length 8; the dellinen/dellisuus arms
#: are verified absent from the corpus vocabulary in tests).
_FI_STEP1_SQL = """
CASE WHEN length(t) > 8 AND right(t, 3) = 'kin' THEN left(t, length(t)-3)
     WHEN length(t) > 8 AND right(t, 2) = 'ko' THEN left(t, length(t)-2)
     WHEN length(t) > 11 AND right(t, 8) = 'dellinen' THEN left(t, length(t)-8)
     WHEN length(t) > 11 AND right(t, 9) = 'dellisuus' THEN left(t, length(t)-9)
     ELSE t END"""

_FI_STEP2_SQL = """
CASE WHEN length(t) > 5 AND right(t, 3) IN ('lla','tse','sti') THEN left(t, length(t)-3)
     WHEN length(t) > 5 AND right(t, 2) = 'ni' THEN left(t, length(t)-2)
     WHEN length(t) > 5 AND right(t, 2) = 'aa' THEN left(t, length(t)-1)
     ELSE t END"""

_FI_STEP3_SQL = f"""
CASE WHEN length(t) > 8 AND right(t, 4) = 'nnen' THEN left(t, length(t)-4) || 's'
     WHEN length(t) > 8 AND right(t, 5) = 'ntena' THEN left(t, length(t)-5) || 's'
     WHEN length(t) > 8 AND right(t, 4) = 'tten' THEN left(t, length(t)-4)
     WHEN length(t) > 8 AND right(t, 5) = 'eiden' THEN left(t, length(t)-5)
     WHEN length(t) > 6 AND right(t, 4) IN ('neen','niin','seen','teen','inen') THEN left(t, length(t)-4)
     WHEN length(t) > 6 AND substr(t, length(t)-2, 1) = 'h' AND substr(t, length(t)-1, 1) IN ({_SQL_VOWELS})
          AND right(t, 1) = 'n' THEN left(t, length(t)-3)
     WHEN length(t) > 6 AND right(t, 3) = 'den' THEN left(t, length(t)-3) || 's'
     WHEN length(t) > 6 AND right(t, 4) = 'ksen' THEN left(t, length(t)-4) || 's'
     WHEN length(t) > 6 AND right(t, 3) IN ('ssa','sta','lla','lta','tta','ksi','lle') THEN left(t, length(t)-3)
     WHEN length(t) > 5 AND right(t, 2) IN ('na','ne') THEN left(t, length(t)-2)
     WHEN length(t) > 5 AND right(t, 3) = 'nei' THEN left(t, length(t)-3)
     WHEN length(t) > 4 AND right(t, 2) IN ('ja','ta') THEN left(t, length(t)-2)
     WHEN length(t) > 4 AND right(t, 1) = 'a' THEN left(t, length(t)-1)
     WHEN length(t) > 4 AND right(t, 1) = 'n' AND substr(t, length(t)-1, 1) IN ({_SQL_VOWELS}) THEN left(t, length(t)-2)
     WHEN length(t) > 4 AND right(t, 1) = 'n' THEN left(t, length(t)-1)
     ELSE t END"""

#: norm1: the hde→ksi rewrite falls through to the suffix checks
_FI_NORM1A_SQL = """
CASE WHEN length(t) > 5 AND right(t, 3) = 'hde' THEN left(t, length(t)-3) || 'ksi'
     ELSE t END"""

_FI_NORM1B_SQL = """
CASE WHEN length(t) > 4 AND right(t, 2) IN ('ei','at') THEN left(t, length(t)-2)
     WHEN length(t) > 3 AND right(t, 1) IN ('t','s','j','e','a','i') THEN left(t, length(t)-1)
     ELSE t END"""

_FI_NORM2A_SQL = """
CASE WHEN length(t) > 8 AND right(t, 1) IN ('e','o','u') THEN left(t, length(t)-1)
     ELSE t END"""

_FI_NORM2B_SQL = """
CASE WHEN length(t) > 4 AND right(t, 1) = 'i' THEN left(t, length(t)-1)
     ELSE t END"""

#: adjacent k/p/t run collapse (norm2's delete loop); two replace passes
#: collapse runs up to length 4 — longer same-letter runs are verified
#: absent from the corpus vocabulary in tests
_FI_NORM2C_SQL = """
CASE WHEN length(t) > 4 THEN
          replace(replace(replace(replace(replace(replace(t,
            'kk','k'),'kk','k'),'pp','p'),'pp','p'),'tt','t'),'tt','t')
     ELSE t END"""


def prelude_finnish() -> str:
    """FinnishAnalyzer index oracle: Finnish snowball stopwords → Savoy
    light stem as chained CTE stages (step1 ×3 to reach the recursion
    fixpoint, step2, step3, norm1 split around the hde→ksi fall-through,
    norm2 split around the i-strip); ä/å/ö fold never fires on ASCII."""
    from ..analysis.lang import FINNISH_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(FINNISH_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
fi0 AS (SELECT did, CASE WHEN length(tok) < 4 THEN NULL ELSE tok END AS t,
               tok FROM kept),
fi1 AS (SELECT did, {_FI_STEP1_SQL} AS t, tok FROM (SELECT did, {_FI_STEP1_SQL} AS t, tok FROM (SELECT did, {_FI_STEP1_SQL} AS t, tok FROM fi0 WHERE t IS NOT NULL))),
fi2 AS (SELECT did, {_FI_STEP2_SQL} AS t, tok FROM fi1),
fi3 AS (SELECT did, {_FI_STEP3_SQL} AS t, tok FROM fi2),
fi4 AS (SELECT did, {_FI_NORM1B_SQL} AS t, tok FROM (SELECT did, {_FI_NORM1A_SQL} AS t, tok FROM fi3)),
fi5 AS (SELECT did, {_FI_NORM2C_SQL} AS t, tok FROM (SELECT did, {_FI_NORM2B_SQL} AS t, tok FROM (SELECT did, {_FI_NORM2A_SQL} AS t, tok FROM fi4))),
emitted AS MATERIALIZED (
  SELECT did, t AS tok FROM fi5
  UNION ALL
  SELECT did, tok FROM fi0 WHERE t IS NULL
),{_VARIANT_TAIL}"""


#: GermanMinimalStemmer (de/GermanMinimalStemmer.java:57-89) on ASCII
#: input (umlaut fold never fires on \\w+ ASCII tokens)
_DE_MIN_SQL = """
CASE WHEN length(t) < 5 THEN t
     WHEN length(t) > 6 AND right(t, 3) = 'nen' THEN left(t, length(t)-3)
     WHEN length(t) > 5 AND right(t, 2) IN ('en','se','es','er') THEN left(t, length(t)-2)
     WHEN right(t, 1) IN ('n','e','s','r') THEN left(t, length(t)-1)
     ELSE t END"""


def prelude_norwegian() -> str:
    """NorwegianAnalyzer (light stem, BOKMAAL) oracle: Norwegian snowball
    stopwords → genitive-s strip → ONE suffix rule in the reference's
    branch order (``no/NorwegianLightStemmer.java:86-174``; every bokmål
    suffix is ASCII, so the replay is complete)."""
    from ..analysis.lang import NORWEGIAN_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(NORWEGIAN_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
nog AS (
  SELECT did, CASE WHEN length(tok) > 4 AND right(tok, 1) = 's'
                   THEN left(tok, length(tok)-1) ELSE tok END AS t
  FROM kept
),
emitted AS MATERIALIZED (SELECT did, CASE
  WHEN length(t) > 7 AND right(t,5) IN ('heter','heten') THEN left(t, length(t)-5)
  WHEN length(t) > 5 AND right(t,3) IN ('dom','het') THEN left(t, length(t)-3)
  WHEN length(t) > 7 AND right(t,5) IN ('elser','elsen') THEN left(t, length(t)-5)
  WHEN length(t) > 6 AND right(t,4) IN ('ende','else','este','eren') THEN left(t, length(t)-4)
  WHEN length(t) > 5 AND right(t,3) IN ('ere','est','ene') THEN left(t, length(t)-3)
  WHEN length(t) > 4 AND right(t,2) IN ('er','en','et','st','te') THEN left(t, length(t)-2)
  WHEN length(t) > 3 AND right(t,1) IN ('a','e','n') THEN left(t, length(t)-1)
  ELSE t END AS tok FROM nog),{_VARIANT_TAIL}"""


def prelude_czech() -> str:
    """CzechAnalyzer oracle: Czech stopwords → case removal → possessive
    removal → palatalization normalize (``cz/CzechStemmer.java:44-160``;
    only the ASCII-reachable branches are replayed — endings with
    diacritics cannot occur in the ASCII corpus tokens)."""
    from ..analysis.lang import CZECH_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(CZECH_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
cz1 AS (
  SELECT did, CASE
    WHEN length(tok) > 7 AND right(tok,5) = 'atech' THEN left(tok, length(tok)-5)
    WHEN length(tok) > 6 AND right(tok,4) = 'etem' THEN left(tok, length(tok)-4)
    WHEN length(tok) > 5 AND right(tok,3) IN ('ech','ich','ata','aty','ama','ami','ovi') THEN left(tok, length(tok)-3)
    WHEN length(tok) > 4 AND right(tok,2) IN ('em','es','at','os','us','mi','ou') THEN left(tok, length(tok)-2)
    WHEN length(tok) > 3 AND right(tok,1) IN ('a','e','i','o','u','y') THEN left(tok, length(tok)-1)
    ELSE tok END AS t
  FROM kept
),
cz2 AS (
  SELECT did, CASE WHEN length(t) > 5 AND right(t,2) IN ('ov','in')
                   THEN left(t, length(t)-2) ELSE t END AS t
  FROM cz1
),
emitted AS MATERIALIZED (SELECT did, CASE
  WHEN right(t,1) = 'c' THEN left(t, length(t)-1) || 'k'
  WHEN right(t,1) = 'z' THEN left(t, length(t)-1) || 'h'
  WHEN length(t) > 1 AND substr(t, length(t)-1, 1) = 'e' THEN left(t, length(t)-2) || right(t,1)
  ELSE t END AS tok FROM cz2),{_VARIANT_TAIL}"""


def prelude_indonesian() -> str:
    """IndonesianAnalyzer oracle over the word-mapped corpus (see
    pipelines/fulltext.py INDONESIAN_MAP): the map's derived forms are
    stemmed via the reference's OWN published word→stem ground truth
    (TestIndonesianStemmer.java checkOneTerm pairs) — an oracle independent
    of the engine's algorithm implementation."""
    from ..analysis.lang import INDONESIAN_STOP_WORDS
    from .fulltext import INDONESIAN_MAP

    stop = ", ".join(f"'{w}'" for w in sorted(INDONESIAN_STOP_WORDS))
    mapped = "lower(text)"
    for w, d, _s in INDONESIAN_MAP:
        mapped = f"regexp_replace({mapped}, '\\b{w}\\b', '{d}', 'g')"
    lookup = " ".join(
        f"WHEN '{d}' THEN '{s}'" for _w, d, s in INDONESIAN_MAP
    )
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all({mapped}, '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
emitted AS MATERIALIZED (
  SELECT did, CASE tok {lookup} ELSE tok END AS tok FROM kept
),{_VARIANT_TAIL}"""


def _prelude_snowball(stop_words, word_map) -> str:
    """Shared oracle for the Snowball analyzer variants (ft_danish /
    ft_dutch / ft_romanian): corpus words mapped to language forms, then
    stemmed via the reference's OWN vocab ground truth
    (TestSnowballVocabData.zip) — independent of the engine's algorithm.
    Unmapped tokens pass through (fixpoints, pinned in
    tests/test_snowball.py)."""
    # apostrophe-bearing stopwords (ca/ga elision forms) need SQL escaping;
    # they can never match a [\p{L}\p{N}_]+ token, but keep the lists whole
    stop = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(stop_words))
    mapped = "lower(text)"
    for w, d, _s in word_map:
        mapped = f"regexp_replace({mapped}, '\\b{w}\\b', '{d}', 'g')"
    lookup = " ".join(f"WHEN '{d}' THEN '{s}'" for _w, d, s in word_map)
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all({mapped}, '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
emitted AS MATERIALIZED (
  SELECT did, CASE tok {lookup} ELSE tok END AS tok FROM kept
),{_VARIANT_TAIL}"""


def prelude_danish() -> str:
    """DanishAnalyzer oracle (da/DanishAnalyzer.java:118-126 chain)."""
    from ..analysis.snowball import DANISH_STOP_WORDS
    from .fulltext import SNOWBALL_DA_MAP

    return _prelude_snowball(DANISH_STOP_WORDS, SNOWBALL_DA_MAP)


def prelude_dutch() -> str:
    """DutchAnalyzer oracle (nl/DutchAnalyzer.java:150-160 chain,
    including the default StemmerOverrideFilter row kind→kinder)."""
    from ..analysis.snowball import DUTCH_STOP_WORDS
    from .fulltext import SNOWBALL_NL_MAP

    return _prelude_snowball(DUTCH_STOP_WORDS, SNOWBALL_NL_MAP)


def prelude_romanian() -> str:
    """RomanianAnalyzer oracle (ro/RomanianAnalyzer.java:120-127 chain)."""
    from ..analysis.snowball import ROMANIAN_STOP_WORDS
    from .fulltext import SNOWBALL_RO_MAP

    return _prelude_snowball(ROMANIAN_STOP_WORDS, SNOWBALL_RO_MAP)


def prelude_porter2() -> str:
    """Porter2 English oracle: default English stop list, stems via the
    published english vocab ground truth."""
    from ..analysis.tokenizer import ENGLISH_STOP_WORDS
    from .fulltext import PORTER2_MAP

    return _prelude_snowball(ENGLISH_STOP_WORDS, PORTER2_MAP)


def prelude_snowball_porter() -> str:
    """Classic Snowball Porter oracle: default English stop list, stems
    from the porter vocab ground truth."""
    from ..analysis.tokenizer import ENGLISH_STOP_WORDS
    from .fulltext import SNOWBALL_PORTER_MAP

    return _prelude_snowball(ENGLISH_STOP_WORDS, SNOWBALL_PORTER_MAP)


def prelude_turkish_snowball() -> str:
    """Snowball Turkish oracle (stems from the turkish vocab ground
    truth; Turkish stop list)."""
    from ..analysis.lang2 import TURKISH_STOP_WORDS
    from .fulltext import SNOWBALL_TR_MAP

    return _prelude_snowball(TURKISH_STOP_WORDS, SNOWBALL_TR_MAP)


def prelude_arabic_snowball() -> str:
    """Snowball Arabic oracle (stems from the arabic vocab ground truth;
    Arabic stop list)."""
    from ..analysis.lang import ARABIC_STOP_WORDS
    from .fulltext import SNOWBALL_AR_MAP

    return _prelude_snowball(ARABIC_STOP_WORDS, SNOWBALL_AR_MAP)


def prelude_lovins() -> str:
    """Lovins oracle (stems from the lovins vocab ground truth; English
    stop list)."""
    from ..analysis.tokenizer import ENGLISH_STOP_WORDS
    from .fulltext import LOVINS_MAP

    return _prelude_snowball(ENGLISH_STOP_WORDS, LOVINS_MAP)


def prelude_kraaij_pohlmann() -> str:
    """Kraaij-Pohlmann oracle (stems from the kraaij_pohlmann vocab
    ground truth; Dutch stop list)."""
    from ..analysis.snowball import DUTCH_STOP_WORDS
    from .fulltext import KP_MAP

    return _prelude_snowball(DUTCH_STOP_WORDS, KP_MAP)


def prelude_catalan() -> str:
    """Snowball Catalan oracle (stems from ca/TestCatalanAnalyzer goldens
    / the golden-validated transcription)."""
    from ..analysis.lang3 import CATALAN_STOP_WORDS
    from .fulltext import SNOWBALL_CA_MAP

    return _prelude_snowball(CATALAN_STOP_WORDS, SNOWBALL_CA_MAP)


def prelude_basque() -> str:
    """Snowball Basque oracle (stems from eu/TestBasqueAnalyzer goldens)."""
    from ..analysis.lang3 import BASQUE_STOP_WORDS
    from .fulltext import SNOWBALL_EU_MAP

    return _prelude_snowball(BASQUE_STOP_WORDS, SNOWBALL_EU_MAP)


def prelude_irish() -> str:
    """Snowball Irish oracle (stems from ga/TestIrishAnalyzer goldens)."""
    from ..analysis.lang3 import IRISH_STOP_WORDS
    from .fulltext import SNOWBALL_GA_MAP

    return _prelude_snowball(IRISH_STOP_WORDS, SNOWBALL_GA_MAP)


def prelude_armenian() -> str:
    """Snowball Armenian oracle (stems from hy/TestArmenianAnalyzer
    goldens)."""
    from ..analysis.lang3 import ARMENIAN_STOP_WORDS
    from .fulltext import SNOWBALL_HY_MAP

    return _prelude_snowball(ARMENIAN_STOP_WORDS, SNOWBALL_HY_MAP)


def prelude_lithuanian() -> str:
    """Snowball Lithuanian oracle (stems from the TestLithuanianStemming
    corpus)."""
    from ..analysis.lang3 import LITHUANIAN_STOP_WORDS
    from .fulltext import SNOWBALL_LT_MAP

    return _prelude_snowball(LITHUANIAN_STOP_WORDS, SNOWBALL_LT_MAP)


def prelude_hunspell() -> str:
    """Hunspell chain oracle: the inline dictionary's inflections mapped
    to their stems; everything else passes through (Hunspell pass-through
    for unknown words)."""
    from ..analysis.tokenizer import ENGLISH_STOP_WORDS
    from .fulltext import HUNSPELL_MAP

    return _prelude_snowball(ENGLISH_STOP_WORDS, HUNSPELL_MAP)


def prelude_icu_folding() -> str:
    """ICU folding oracle: injected forms mapped via the TestICUFolding
    goldens; pure-ASCII tokens are folding fixpoints."""
    from ..analysis.tokenizer import ENGLISH_STOP_WORDS
    from .fulltext import ICU_FOLD_MAP

    return _prelude_snowball(ENGLISH_STOP_WORDS, ICU_FOLD_MAP)


def prelude_polish() -> str:
    """Stempel Polish oracle (studenta/studenci stems from
    TestPolishAnalyzer; the rest from the embedded table)."""
    from ..analysis.lang3 import POLISH_STOP_WORDS
    from .fulltext import STEMPEL_MAP

    return _prelude_snowball(POLISH_STOP_WORDS, STEMPEL_MAP)


def prelude_swedish_snowball() -> str:
    """Snowball SwedishAnalyzer oracle (sv/SwedishAnalyzer.java default
    chain)."""
    from ..analysis.lang import SWEDISH_STOP_WORDS
    from .fulltext import SNOWBALL_SV_MAP

    return _prelude_snowball(SWEDISH_STOP_WORDS, SNOWBALL_SV_MAP)


def prelude_norwegian_snowball() -> str:
    """Snowball NorwegianAnalyzer oracle (no/NorwegianAnalyzer.java
    default chain)."""
    from ..analysis.lang import NORWEGIAN_STOP_WORDS
    from .fulltext import SNOWBALL_NO_MAP

    return _prelude_snowball(NORWEGIAN_STOP_WORDS, SNOWBALL_NO_MAP)


def prelude_russian_snowball() -> str:
    """Snowball RussianAnalyzer oracle (ru/RussianAnalyzer.java default
    chain); the map injects Cyrillic forms."""
    from ..analysis.lang import RUSSIAN_STOP_WORDS
    from .fulltext import SNOWBALL_RU_MAP

    return _prelude_snowball(RUSSIAN_STOP_WORDS, SNOWBALL_RU_MAP)


def prelude_german_snowball() -> str:
    """Snowball German oracle (SnowballPorterFilterFactory
    language=German; stems from the german vocab ground truth)."""
    from ..analysis.lang import GERMAN_STOP_WORDS
    from .fulltext import SNOWBALL_DE_MAP

    return _prelude_snowball(GERMAN_STOP_WORDS, SNOWBALL_DE_MAP)


def prelude_german2() -> str:
    """Snowball German2 oracle (digraph-folding variant; stems from the
    german2 vocab ground truth)."""
    from ..analysis.lang import GERMAN_STOP_WORDS
    from .fulltext import SNOWBALL_DE2_MAP

    return _prelude_snowball(GERMAN_STOP_WORDS, SNOWBALL_DE2_MAP)


def prelude_spanish_snowball() -> str:
    """Snowball Spanish oracle (language=Spanish; stems from the spanish
    vocab ground truth)."""
    from ..analysis.lang import SPANISH_STOP_WORDS
    from .fulltext import SNOWBALL_ES_MAP

    return _prelude_snowball(SPANISH_STOP_WORDS, SNOWBALL_ES_MAP)


def prelude_portuguese_snowball() -> str:
    """Snowball Portuguese oracle (language=Portuguese; stems from the
    portuguese vocab ground truth)."""
    from ..analysis.lang import PORTUGUESE_STOP_WORDS
    from .fulltext import SNOWBALL_PT_MAP

    return _prelude_snowball(PORTUGUESE_STOP_WORDS, SNOWBALL_PT_MAP)


def prelude_italian_snowball() -> str:
    """Snowball Italian oracle (language=Italian; stems from the italian
    vocab ground truth)."""
    from ..analysis.lang import ITALIAN_STOP_WORDS
    from .fulltext import SNOWBALL_IT_MAP

    return _prelude_snowball(ITALIAN_STOP_WORDS, SNOWBALL_IT_MAP)


def prelude_french_snowball() -> str:
    """Snowball French oracle (language=French; stems from the french
    vocab ground truth; elision no-op on apostrophe-free tokens)."""
    from ..analysis.lang import FRENCH_STOP_WORDS
    from .fulltext import SNOWBALL_FR_MAP

    return _prelude_snowball(FRENCH_STOP_WORDS, SNOWBALL_FR_MAP)


def prelude_finnish_snowball() -> str:
    """Snowball FinnishAnalyzer oracle (fi/FinnishAnalyzer.java default
    chain)."""
    from ..analysis.lang import FINNISH_STOP_WORDS
    from .fulltext import SNOWBALL_FI_MAP

    return _prelude_snowball(FINNISH_STOP_WORDS, SNOWBALL_FI_MAP)


def prelude_hungarian_snowball() -> str:
    """Snowball HungarianAnalyzer oracle (hu/HungarianAnalyzer.java
    default chain)."""
    from ..analysis.lang import HUNGARIAN_STOP_WORDS
    from .fulltext import SNOWBALL_HU_MAP

    return _prelude_snowball(HUNGARIAN_STOP_WORDS, SNOWBALL_HU_MAP)


def prelude_decompound() -> str:
    """DictionaryCompoundWordTokenFilter oracle: kept originals (the norm
    anchors) plus every dictionary subword of length 2..15 found at any
    start offset of a token of length >= 5, as overlaps."""
    from .fulltext import DECOMPOUND_DICT, DECOMPOUND_MAP

    mapped = "lower(text)"
    for w, d in DECOMPOUND_MAP:
        mapped = f"regexp_replace({mapped}, '\\b{w}\\b', '{d}', 'g')"
    dict_sql = ", ".join(f"'{w}'" for w in DECOMPOUND_DICT)
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all({mapped}, '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
base AS (SELECT did, tok FROM kept),
subs AS (
  SELECT k.did, substr(k.tok, g1.i, g2.j) AS tok
  FROM kept k, generate_series(1, 255) g1(i), generate_series(2, 15) g2(j)
  WHERE length(k.tok) >= 5
    AND g1.i + g2.j - 1 <= length(k.tok)
    AND substr(k.tok, g1.i, g2.j) IN ({dict_sql})
),
emitted AS MATERIALIZED (
  SELECT did, tok FROM kept UNION ALL SELECT did, tok FROM subs
),{_VARIANT_TAIL}"""


def prelude_galician() -> str:
    """GalicianAnalyzer oracle over the word-mapped corpus (see
    pipelines/fulltext.py GALICIAN_MAP): stems come from the reference's
    published gltestdata ground truth, independent of the engine's RSLP
    engine implementation."""
    from ..analysis.lang2 import GALICIAN_STOP_WORDS
    from .fulltext import GALICIAN_MAP

    stop = ", ".join(f"'{w}'" for w in sorted(GALICIAN_STOP_WORDS))
    mapped = "lower(text)"
    for w, d, _s in GALICIAN_MAP:
        mapped = f"regexp_replace({mapped}, '\\b{w}\\b', '{d}', 'g')"
    lookup = " ".join(f"WHEN '{d}' THEN '{s}'" for _w, d, s in GALICIAN_MAP)
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all({mapped}, '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
emitted AS MATERIALIZED (
  SELECT did, CASE tok {lookup} ELSE tok END AS tok FROM kept
),{_VARIANT_TAIL}"""


def prelude_english_minimal() -> str:
    """StandardAnalyzer(stem='english_minimal') oracle over the pluralized
    corpus (ENGLISH_MIN_MAP): default English stopwords → the Harman
    S-stemmer rules (``en/EnglishMinimalStemmer.java:28-48``) replayed as
    one CASE."""
    from .fulltext import ENGLISH_MIN_MAP

    mapped = "lower(text)"
    for w, p in ENGLISH_MIN_MAP:
        mapped = f"regexp_replace({mapped}, '\\b{w}\\b', '{p}', 'g')"
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all({mapped}, '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
base AS (SELECT did, tok FROM kept),
emitted AS MATERIALIZED (SELECT did, CASE
  WHEN length(tok) < 3 OR right(tok,1) != 's' THEN tok
  WHEN substr(tok, length(tok)-1, 1) IN ('u','s') THEN tok
  WHEN substr(tok, length(tok)-1, 1) = 'e' THEN
    CASE WHEN length(tok) > 3 AND substr(tok, length(tok)-2, 1) = 'i'
              AND substr(tok, length(tok)-3, 1) NOT IN ('a','e')
         THEN left(tok, length(tok)-3) || 'y'
         WHEN substr(tok, length(tok)-2, 1) IN ('i','a','o','e') THEN tok
         ELSE left(tok, length(tok)-1) END
  ELSE left(tok, length(tok)-1) END AS tok FROM kept),{_VARIANT_TAIL}"""


def prelude_cjk() -> str:
    """CJKAnalyzer index oracle over the Katakana-mapped corpus (see
    pipelines/fulltext.py ft_cjk): translate() a→ア…, tokenize into
    Katakana runs vs other \\w runs, bigram each run of >= 2 codepoints
    (lone codepoints stay unigrams, non-Katakana tokens pass through),
    then the CJK stop filter (analysis/cjk/stopwords.txt)."""
    from ..analysis.cjkfilter import CJK_STOP_WORDS
    from .fulltext import CJK_MAP_DST, CJK_MAP_SRC

    stop = ", ".join(f"'{w}'" for w in sorted(CJK_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
runs AS (
  SELECT did, unnest(regexp_extract_all(
    translate(lower(text), '{CJK_MAP_SRC}', '{CJK_MAP_DST}'),
    '[ァ-ヺ]+|[0-9_]+')) AS tok
  FROM corpus
),
big AS (
  SELECT did, unnest([substr(tok, i, 2)
                      for i in generate_series(1, length(tok) - 1)]) AS tok
  FROM runs WHERE length(tok) >= 2 AND regexp_matches(tok, '^[ァ-ヺ]')
  UNION ALL
  SELECT did, tok FROM runs
  WHERE length(tok) = 1 OR NOT regexp_matches(tok, '^[ァ-ヺ]')
),
kept AS (
  SELECT did, tok FROM big WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
emitted AS MATERIALIZED (SELECT did, tok FROM kept),{_VARIANT_TAIL}"""


def prelude_german_minimal() -> str:
    """StandardAnalyzer(stem='german_minimal') index oracle: default
    English stopwords → GermanMinimalStemFilter (a Solr filter-factory
    chain, not a reference analyzer preset) as one CASE."""
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
base AS (SELECT did, tok FROM kept),
dm0 AS (SELECT did, tok AS t FROM kept),
emitted AS MATERIALIZED (SELECT did, {_DE_MIN_SQL} AS tok FROM dm0),{_VARIANT_TAIL}"""


def prelude_french_minimal() -> str:
    """StandardAnalyzer(stem='french_minimal') index oracle
    (fr/FrenchMinimalStemmer.java:57-72 on the ASCII corpus — the é strip
    can't fire on \\w+ ASCII tokens): the -x/-aux branch returns
    immediately; the s → r → e strips are SEQUENTIAL, staged as nested
    CASE expressions gated on the ORIGINAL token (length ≥ 6, not
    x-final), with a final adjacent-duplicate collapse."""
    gate = "length(tok) >= 6 AND right(tok, 1) <> 'x'"
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
base AS (SELECT did, tok FROM kept),
fmx AS (
  SELECT did, tok,
         CASE WHEN length(tok) >= 6 AND right(tok, 1) = 'x' THEN
              CASE WHEN substr(tok, length(tok)-2, 1) = 'a'
                        AND substr(tok, length(tok)-1, 1) = 'u'
                   THEN left(tok, length(tok)-2) || 'l'
                   ELSE left(tok, length(tok)-1) END
              ELSE NULL END AS xres
  FROM kept
),
fm1 AS (SELECT did, tok, xres,
        CASE WHEN xres IS NULL AND {gate} AND right(tok, 1) = 's'
             THEN left(tok, length(tok)-1) ELSE tok END AS t FROM fmx),
fm2 AS (SELECT did, tok, xres,
        CASE WHEN xres IS NULL AND {gate} AND right(t, 1) = 'r'
             THEN left(t, length(t)-1) ELSE t END AS t FROM fm1),
fm3 AS (SELECT did, tok, xres,
        CASE WHEN xres IS NULL AND {gate} AND right(t, 1) = 'e'
             THEN left(t, length(t)-1) ELSE t END AS t FROM fm2),
fm4 AS (SELECT did, tok, xres,
        CASE WHEN xres IS NULL AND {gate}
                  AND right(t, 1) = substr(t, length(t)-1, 1)
             THEN left(t, length(t)-1) ELSE t END AS t FROM fm3),
emitted AS MATERIALIZED (
  SELECT did, coalesce(xres, t) AS tok FROM fm4
),{_VARIANT_TAIL}"""


def prelude_french() -> str:
    """FrenchAnalyzer index oracle: elision is a no-op on apostrophe-free
    \\w+ tokens; French snowball stopwords → UniNE light stem (CTE chain)."""
    from ..analysis.lang import FRENCH_STOP_WORDS

    stop = ", ".join(f"'{w}'" for w in sorted(FRENCH_STOP_WORDS))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({stop})
),
base AS (SELECT did, tok FROM kept),
{_fr_stem_ctes()},{_VARIANT_TAIL}"""


def sql_topk_variant(prelude_sql: str, specs: list[dict]) -> str:
    """UNION ALL of single/boolean top-k queries over an analyzer-variant
    prelude. Scores are emitted only for single-term queries (float64 exact,
    like sql_topk)."""
    parts = []
    with_score = all(s["kind"] == "term" for s in specs)
    for s in specs:
        terms = sorted(s["terms"])
        cond = "nmatch >= 1" if s["kind"] in ("term", "or") else f"nmatch = {len(terms)}"
        score_col = ", score" if with_score else ""
        parts.append(
            prelude_sql
            + ","
            + _score_cte(terms)
            + f"""
SELECT '{s["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id{score_col}
FROM agg WHERE {cond}
ORDER BY score DESC, did ASC LIMIT {s["k"]}
"""
        )
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


def sql_topk_classic(terms: list[str], k: int) -> str:
    """ClassicSimilarity (TF-IDF) single-term top-k with exact float64 scores:
    score = (sqrt(tf) * idf) * (1/sqrt(qlen)), idf = ln((dc+1)/(df+1)) + 1
    (ClassicSimilarity.java:40-74, TFIDFSimilarity.java:599-612)."""
    parts = []
    for t in sorted(terms):
        parts.append(prelude() + f""",
scored AS (
  SELECT k.did,
         (sqrt(k.tf) * ({1.0!r} * (ln(((SELECT dc FROM stats) + 1) / CAST((SELECT count(DISTINCT did) FROM tf WHERE tok = '{t}') + 1 AS DOUBLE)) + {1.0!r})))
           * ({1.0!r} / sqrt(q.qlen)) AS score
  FROM tf k JOIN quant q USING (did) WHERE k.tok = '{t}'
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_topk_lmdirichlet(terms: list[str], k: int, mu: float) -> str:
    """LM-Dirichlet single-term top-k, float64:
    p = (ttf+1)/(sumTTF+1); score = max(0, boost*(ln(1 + tf/(mu*p)) +
    ln(mu/(docLen+mu)))) with docLen = quantized length
    (LMDirichletSimilarity.java:66-71, LMSimilarity.java:154-156)."""
    parts = []
    for t in sorted(terms):
        pexpr = (f"(CAST((SELECT sum(tf) FROM tf WHERE tok = '{t}') + 1 AS DOUBLE)"
                 f" / ((SELECT sttf FROM stats) + 1))")
        parts.append(prelude() + f""",
scored AS (
  SELECT k.did,
         greatest({1.0!r} * (ln(1 + k.tf / ({mu!r} * {pexpr})) + ln({mu!r} / (q.qlen + {mu!r}))), 0.0) AS score
  FROM tf k JOIN quant q USING (did) WHERE k.tok = '{t}'
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_function_boost(terms: list[str], k: int) -> str:
    """FunctionScoreQuery.boostByValue oracle
    (queries/function/FunctionScoreQuery.java:76-78,176-177): score =
    (bm25(term) · ln(1 + field_len)) · boost, float64, exact scores."""
    parts = []
    for t in sorted(terms):
        parts.append(prelude() + f""",
scored AS (
  SELECT k.did,
         ((((i.idf * {1.0!r}) * {K1 + 1!r}) * k.tf
            / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))))
          * ln({1.0!r} + q.flen)) * {1.0!r} AS score
  FROM tf k JOIN quant q USING (did) JOIN idf i ON k.tok = i.tok
  WHERE k.tok = '{t}'
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_common_terms(specs: list[dict]) -> str:
    """CommonTermsQuery oracle (queries/CommonTermsQuery.java:148-209):
    terms split low/high at ``df > ceil(float32(maxtf)·float32(maxDoc))``
    (computed dynamically in SQL so classification follows the data), rewritten
    to MUST(low group) + SHOULD(high group). Supports low_occur must|should
    with msm=0 and high_occur=should; when no low terms remain the high group
    is a conjunction (:179-187). rank+doc_id (BM25 float64 sums)."""
    parts = []
    for sp in specs:
        qid, k, terms, maxtf = sp["qid"], sp["k"], sp["terms"], sp["maxtf"]
        assert sp.get("high", "should") == "should" and maxtf < 1.0
        low_cond = ("agg.nlow = nq.nlowq" if sp.get("low", "should") == "must"
                    else "agg.nlow >= 1")
        tl = ", ".join(f"'{t}'" for t in terms)
        parts.append(prelude() + f""",
sc AS (
  SELECT k.did, k.tok,
         ((i.idf * {1.0!r}) * {K1 + 1!r}) * k.tf
           / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS s
  FROM tf k JOIN quant q USING (did) JOIN idf i ON k.tok = i.tok
  WHERE k.tok IN ({tl})
),
cls AS (
  SELECT i.tok,
         CASE WHEN i.df > CAST(ceil(CAST({maxtf!r} AS FLOAT) * CAST((SELECT dc FROM stats) AS FLOAT)) AS BIGINT)
              THEN 1 ELSE 0 END AS ishigh
  FROM idf i WHERE i.tok IN ({tl})
),
nq AS (
  SELECT {len(terms)} - (SELECT count(*) FROM cls WHERE ishigh = 1) AS nlowq,
         (SELECT count(*) FROM cls WHERE ishigh = 1) AS nhighq
),
agg AS (
  SELECT s.did,
         sum(CASE WHEN c.ishigh = 0 THEN s.s END) AS slow,
         count(CASE WHEN c.ishigh = 0 THEN 1 END) AS nlow,
         sum(CASE WHEN c.ishigh = 1 THEN s.s END) AS shigh,
         count(CASE WHEN c.ishigh = 1 THEN 1 END) AS nhigh
  FROM sc s JOIN cls c USING (tok) GROUP BY s.did
)
SELECT '{qid}' AS query_id,
       CAST(row_number() OVER (
         ORDER BY (CASE WHEN nq.nlowq = 0 THEN agg.shigh
                        ELSE agg.slow + coalesce(agg.shigh, 0) END) DESC, agg.did ASC
       ) - 1 AS BIGINT) AS rank,
       CAST(agg.did AS BIGINT) AS doc_id
FROM agg, nq
WHERE CASE WHEN nq.nlowq = 0 THEN agg.nhigh = nq.nhighq ELSE {low_cond} END
ORDER BY (CASE WHEN nq.nlowq = 0 THEN agg.shigh
               ELSE agg.slow + coalesce(agg.shigh, 0) END) DESC, agg.did ASC
LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


#: precomputed ln(2) — injected verbatim so SQL divides by the exact same
#: double the engine's ``similarities._LOG2`` holds (SimilarityBase.java:50)
LOG2 = 0.6931471805599453


def sql_topk_dfr(terms: list[str], k: int) -> str:
    """DFR In-B-H2 (c=1) single-term top-k, float64 sql-compat
    (DFRSimilarity.java:110-114, BasicModelIn.java:33-37, AfterEffectB.java:32-36,
    NormalizationH2.java:52): tfn = tf·log2(1 + avgdl/len);
    score = (boost·(tfn·log2((N+1)/(df+0.5))))·((ttf+2)/((df+1)·(tfn+1)))."""
    parts = []
    for t in sorted(terms):
        df = f"(SELECT count(DISTINCT did) FROM tf WHERE tok = '{t}')"
        ttf = f"(SELECT CAST(sum(tf) AS BIGINT) FROM tf WHERE tok = '{t}')"
        parts.append(prelude() + f""",
base AS (
  SELECT k.did,
         k.tf * (ln({1.0!r} + ({1.0!r} * (SELECT avgdl FROM avg_dl)) / q.qlen) / {LOG2!r}) AS tfn
  FROM tf k JOIN quant q USING (did) WHERE k.tok = '{t}'
),
scored AS (
  SELECT did,
         ({1.0!r} * (tfn * (ln(((SELECT dc FROM stats) + 1) / ({df} + 0.5)) / {LOG2!r})))
           * (CAST({ttf} + 2 AS DOUBLE) / (({df} + 1) * (tfn + {1.0!r}))) AS score
  FROM base
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_topk_ib(terms: list[str], k: int) -> str:
    """IB LL-DF-H2 (c=1) single-term top-k, float64 sql-compat
    (IBSimilarity.java:98-104, DistributionLL.java:33-35, LambdaDF.java:32-34):
    λ = (df+1)/(N+1); score = boost·(-ln(λ/(tfn+λ)))."""
    parts = []
    for t in sorted(terms):
        df = f"(SELECT count(DISTINCT did) FROM tf WHERE tok = '{t}')"
        lam = f"(({df} + {1.0!r}) / ((SELECT dc FROM stats) + {1.0!r}))"
        parts.append(prelude() + f""",
base AS (
  SELECT k.did,
         k.tf * (ln({1.0!r} + ({1.0!r} * (SELECT avgdl FROM avg_dl)) / q.qlen) / {LOG2!r}) AS tfn
  FROM tf k JOIN quant q USING (did) WHERE k.tok = '{t}'
),
scored AS (
  SELECT did, {1.0!r} * (- ln({lam} / (tfn + {lam}))) AS score FROM base
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_topk_jm(terms: list[str], k: int, lam: float) -> str:
    """LM Jelinek-Mercer single-term top-k, float64 sql-compat
    (LMJelinekMercerSimilarity.java:54-59, LMSimilarity.java:154-156):
    p = (ttf+1)/(sumTTF+1); score = boost·ln(1 + ((1-λ)·tf/len)/(λ·p))."""
    oml = 1.0 - lam
    parts = []
    for t in sorted(terms):
        p = (f"(CAST((SELECT sum(tf) FROM tf WHERE tok = '{t}') + 1 AS DOUBLE)"
             f" / ((SELECT sttf FROM stats) + {1.0!r}))")
        parts.append(prelude() + f""",
scored AS (
  SELECT k.did,
         {1.0!r} * ln({1.0!r} + (({oml!r} * k.tf) / q.qlen) / ({lam!r} * {p})) AS score
  FROM tf k JOIN quant q USING (did) WHERE k.tok = '{t}'
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_mlt(srcs: list[int], k: int, min_tf: int = 2, min_df: int = 5,
            max_terms: int = 25) -> str:
    """MoreLikeThis oracle: interesting terms by tf*(ln((dc+1)/(df+1))+1)
    (filters tf>=min_tf, df>=min_df; top max_terms, tie term asc), then a
    BM25 SHOULD query over them; rank+doc_id, source doc excluded."""
    parts = []
    for src in srcs:
        parts.append(prelude() + f""",
sel AS (
  SELECT k.tok,
         k.tf * (ln(((SELECT dc FROM stats) + 1) / CAST(i.df + 1 AS DOUBLE)) + {1.0!r}) AS ms
  FROM tf k JOIN idf i USING (tok)
  WHERE k.did = {src} AND k.tf >= {min_tf} AND i.df >= {min_df}
  ORDER BY ms DESC, k.tok ASC LIMIT {max_terms}
),
sc AS (
  SELECT k.did,
         ((i.idf * {1.0!r}) * {K1 + 1!r}) * k.tf
           / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS s
  FROM tf k JOIN quant q USING (did) JOIN idf i ON k.tok = i.tok
  WHERE k.tok IN (SELECT tok FROM sel)
),
agg AS (SELECT did, sum(s) AS score FROM sc GROUP BY did)
SELECT '{src}' AS query_id,
       CAST(row_number() OVER (ORDER BY round(score, 6) DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM agg WHERE did <> {src}
ORDER BY round(score, 6) DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_classify_knn(srcs: list[int], k: int = 10, min_tf: int = 2,
                     min_df: int = 5, max_terms: int = 25) -> str:
    """KNearestNeighborClassifier oracle: the sql_mlt neighbor machinery per
    sample doc, then a class vote — count desc, round(Σ neighbor score, 6)
    desc, class asc (engine tie order)."""
    parts = []
    for src in srcs:
        parts.append(prelude() + f""",
sel AS (
  SELECT k.tok,
         k.tf * (ln(((SELECT dc FROM stats) + 1) / CAST(i.df + 1 AS DOUBLE)) + {1.0!r}) AS ms
  FROM tf k JOIN idf i USING (tok)
  WHERE k.did = {src} AND k.tf >= {min_tf} AND i.df >= {min_df}
  ORDER BY ms DESC, k.tok ASC LIMIT {max_terms}
),
sc AS (
  SELECT k.did,
         ((i.idf * {1.0!r}) * {K1 + 1!r}) * k.tf
           / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS s
  FROM tf k JOIN quant q USING (did) JOIN idf i ON k.tok = i.tok
  WHERE k.tok IN (SELECT tok FROM sel)
),
agg AS (SELECT did, sum(s) AS score FROM sc GROUP BY did),
nb AS (
  SELECT did, score FROM agg WHERE did <> {src}
  ORDER BY round(score, 6) DESC, did ASC LIMIT {k}
),
vote AS (
  SELECT c.lang AS cls, count(*) AS n, round(sum(nb.score), 6) AS ssum
  FROM nb JOIN corpus c ON c.did = nb.did GROUP BY c.lang
)
SELECT CAST({src} AS BIGINT) AS doc_id,
       (SELECT cls FROM vote ORDER BY n DESC, ssum DESC, cls ASC LIMIT 1) AS assigned
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_classify_knn_fuzzy(srcs: list[int], k: int = 10) -> str:
    """KNearestFuzzyClassifier oracle (classification/KNearestFuzzyClassifier
    .java + utils/NearestFuzzyQuery.java): per sample doc, fuzzy variants of
    its unique tokens (ed ≤ 1, 2-char prefix, |len diff| ≤ 1), per-token
    top-50 by (boost desc, variant asc), variant score = boost²·idf(df_src
    or avg variant df), global top-300 (source, variant) pairs, per-variant
    SUMMED weights × artificial-df=1 idf × (k1+1), BM25 tf-saturation over
    the quantized norms, top-k neighbor class vote boost/hits."""
    parts = []
    for src in srcs:
        parts.append(prelude() + f""",
srctoks AS (SELECT DISTINCT tok FROM tf WHERE did = {src}),
vars AS (
  SELECT s.tok AS src_tok, i.tok AS v, i.df AS vdf,
         CASE WHEN i.tok = s.tok THEN CAST(1.0 AS DOUBLE)
              ELSE 1.0 - 1.0 / CAST(least(length(s.tok), length(i.tok)) AS DOUBLE)
         END AS boost
  FROM srctoks s JOIN idf i
    ON starts_with(i.tok, substr(s.tok, 1, 2))
   AND abs(length(i.tok) - length(s.tok)) <= 1
   AND levenshtein(i.tok, s.tok) <= 1
),
srcdf AS (
  SELECT src_tok,
         coalesce(max(CASE WHEN v = src_tok THEN vdf END), 0) AS df0,
         sum(vdf) // count(*) AS avgdf
  FROM vars GROUP BY src_tok
),
tidf AS (
  SELECT src_tok,
         ln(CAST((SELECT dc FROM stats) + 1 AS DOUBLE)
            / (CASE WHEN df0 > 0 THEN df0 ELSE avgdf END + 1)) + 1.0 AS tidf
  FROM srcdf
),
capped AS (
  SELECT src_tok, v, boost FROM (
    SELECT src_tok, v, boost,
           row_number() OVER (PARTITION BY src_tok
                              ORDER BY boost DESC, v ASC) AS rn
    FROM vars) WHERE rn <= 50
),
top300 AS (
  SELECT v, sc FROM (
    SELECT c.v, (c.boost * c.boost) * t.tidf AS sc,
           row_number() OVER (ORDER BY (c.boost * c.boost) * t.tidf DESC,
                              c.v ASC, c.src_tok ASC) AS rn
    FROM capped c JOIN tidf t USING (src_tok)) WHERE rn <= 300
),
w AS (
  SELECT v,
         (sum(sc) * ln(1 + (CAST((SELECT dc FROM stats) AS DOUBLE) - 1 + 0.5)
                           / (1 + 0.5))) * {K1 + 1.0!r} AS wt
  FROM top300 GROUP BY v
),
sc AS (
  SELECT k.did,
         ww.wt * k.tf
           / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen)
                               / (SELECT avgdl FROM avg_dl))) AS s
  FROM tf k JOIN w ww ON k.tok = ww.v JOIN quant q USING (did)
),
agg AS (SELECT did, sum(s) AS score FROM sc GROUP BY did),
nb AS (
  SELECT did, score FROM agg WHERE did <> {src}
  ORDER BY round(score, 6) DESC, did ASC LIMIT {k}
),
ms AS (SELECT max(score) AS m FROM nb),
vote AS (
  SELECT c.lang AS cls, sum(nb.score / (SELECT m FROM ms)) AS boost
  FROM nb JOIN corpus c ON c.did = nb.did GROUP BY c.lang
)
SELECT CAST({src} AS BIGINT) AS doc_id,
       (SELECT cls FROM vote
        ORDER BY round(boost / (SELECT count(*) FROM nb), 9) DESC,
                 cls ASC LIMIT 1) AS assigned
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_suggest_prefix(prefixes: list[str], num: int = 5) -> str:
    parts = []
    for pre in prefixes:
        parts.append(prelude() + f"""
SELECT '{pre}' AS query_id, tok AS term, CAST(df AS BIGINT) AS df
FROM idf WHERE tok LIKE '{pre}%'
ORDER BY df DESC, tok ASC LIMIT {num}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_suggest_analyzing(queries: list[str], num: int = 5) -> str:
    """AnalyzingSuggester oracle: part names are lowercase single-spaced
    token sequences, so the analyzed key (tokens joined by SEP_LABEL) maps
    1:1 onto the surface with ' ' as separator — the analyzed-prefix match
    is a plain LIKE prefix. EXACT_FIRST: a suggestion equal to the typed
    key sorts first regardless of weight; then weight desc, surface asc
    (the engine's deterministic tie-break)."""
    parts = []
    for q in queries:
        parts.append(f"""
WITH items AS (
  SELECT p_name AS suggestion,
         MAX(CAST(round(p_retailprice * 100) AS BIGINT)) AS weight
  FROM part GROUP BY p_name
)
SELECT '{q}' AS query_id,
       CAST(row_number() OVER (
          ORDER BY (suggestion = '{q}') DESC, weight DESC, suggestion ASC
       ) - 1 AS BIGINT) AS rank,
       suggestion, weight
FROM items WHERE suggestion LIKE '{q}%'
ORDER BY rank LIMIT {num}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_spellcheck(inputs: list[str], max_edits: int = 2, num: int = 5) -> str:
    parts = []
    for w in inputs:
        parts.append(prelude() + f""",
indf AS (SELECT coalesce((SELECT df FROM idf WHERE tok = '{w}'), 0) AS v)
SELECT '{w}' AS query_id, tok AS term,
       CAST(levenshtein(tok, '{w}') AS BIGINT) AS dist, CAST(df AS BIGINT) AS df
FROM idf
WHERE tok <> '{w}' AND levenshtein(tok, '{w}') <= {max_edits}
  AND df > (SELECT v FROM indf)
ORDER BY dist ASC, df DESC, tok ASC LIMIT {num}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_join(specs: list[dict]) -> str:
    """Query-time join oracle: semi-join on the from-side's distinct values."""
    parts = []
    for sp in specs:
        parts.append(prelude() + f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM corpus WHERE {sp["col"]} IN (
  SELECT DISTINCT c.{sp["col"]}
  FROM corpus c JOIN (SELECT DISTINCT did FROM tf WHERE tok = '{sp["term"]}') m USING (did)
)
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_span_near(specs: list[dict]) -> str:
    """Ordered span-near match sets: exists p1 < p2 < ... (non-overlapping,
    term spans are width-1) with total gap Σ(p_{i+1} - p_i - 1) <= slop."""
    parts = []
    for sp in specs:
        terms, slop, qid = sp["terms"], sp["slop"], sp["qid"]
        joins = " ".join(
            f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p > t{i-1}.p"
            for i in range(1, len(terms))
        )
        conds = " AND ".join(f"t{i}.tok = '{t}'" for i, t in enumerate(terms))
        n = len(terms)
        width = f"(t{n-1}.p - t0.p - {n - 1})"
        parts.append(f"""
SELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT t0.did AS did FROM ktp t0 {joins}
      WHERE {conds} AND {width} <= {slop})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def _cp_cond(i: int, word: str) -> str:
    """One complex-phrase word → a token predicate on ktp alias t{i}."""
    m = re.match(r"^(.+?)~(\d*)$", word)
    if "*" in word or "?" in word:
        like = word.lower().replace("*", "%").replace("?", "_")
        return f"t{i}.tok LIKE '{like}'"
    if m:
        edits = int(m.group(2)) if m.group(2) else 2
        return f"levenshtein(t{i}.tok, '{m.group(1).lower()}') <= {edits}"
    return f"t{i}.tok = '{word.lower()}'"


def sql_complex_phrase(specs: list[dict]) -> str:
    """ComplexPhraseQueryParser match-set oracle: ordered span-near where a
    word may be a wildcard (LIKE), fuzzy (levenshtein) or plain term —
    identical to dictionary expansion then OR-ing, since both sides see the
    same analyzed token stream."""
    parts = []
    for sp in specs:
        words, slop, qid = sp["phrase"].split(), sp["slop"], sp["qid"]
        joins = " ".join(
            f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p > t{i-1}.p"
            for i in range(1, len(words))
        )
        conds = " AND ".join(_cp_cond(i, w) for i, w in enumerate(words))
        n = len(words)
        width = f"(t{n-1}.p - t0.p - {n - 1})"
        parts.append(f"""
SELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT t0.did AS did FROM ktp t0 {joins}
      WHERE {conds} AND {width} <= {slop})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_parser(specs: list[dict]) -> str:
    """Extended classic-parser match-set oracles, one hand-expanded twin per
    spec qid (the engine side parses the raw query string)."""
    bodies = {
        "p_prefix": "SELECT DISTINCT did FROM tf WHERE tok LIKE 'mer%'",
        "p_wildcard": "SELECT DISTINCT did FROM tf WHERE tok LIKE 'm_rge'",
        "p_fuzzy": "SELECT DISTINCT did FROM tf WHERE levenshtein(tok, 'mergd') <= 1",
        "p_range_kw": "SELECT did FROM corpus WHERE source >= 'src2' AND source <= 'src5'",
        "p_range_content": (
            "SELECT DISTINCT did FROM tf WHERE tok >= 'window' AND tok <= 'windy'"
        ),
        "p_field_group": """
  SELECT did FROM corpus WHERE lang IN ('en', 'fr')
    AND EXISTS (SELECT 1 FROM tf WHERE tf.did = corpus.did AND tf.tok = 'merge')""",
        "p_boost_or": (
            "SELECT DISTINCT did FROM tf WHERE tok IN ('spark', 'merge')"
        ),
        "p_matchall_not": """
  SELECT did FROM corpus WHERE NOT EXISTS
    (SELECT 1 FROM tf WHERE tf.did = corpus.did AND tf.tok = 'spark')""",
    }
    parts = [
        f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM ({bodies[sp["qid"]]})"""
        for sp in specs
    ]
    return prelude() + " " + " UNION ALL ".join(parts)


def sql_intervals(specs: list[dict]) -> str:
    """IntervalQuery match-set oracles. For two distinct width-1 terms the
    candidate-pair existence tests below are exactly equivalent to the
    engine's minimal-interval existence (a candidate contains a minimal
    interval of no greater width, and every minimal interval is a
    candidate); CONTAINING additionally needs true minimality, encoded by
    the double cursor p1 = min(y > p0) and p0 = max(x < p1)."""
    parts = []
    for sp in specs:
        qid, w, kind = sp["qid"], sp["width"], sp["kind"]
        if kind in ("ordered", "unordered", "not_containing", "containing"):
            a, b = sp["terms"]
        if kind == "ordered":
            body = f"""
  SELECT DISTINCT t0.did AS did FROM ktp t0
  JOIN ktp t1 ON t1.did = t0.did AND t1.p > t0.p
  WHERE t0.tok = '{a}' AND t1.tok = '{b}' AND t1.p - t0.p + 1 <= {w}"""
        elif kind == "unordered":
            body = f"""
  SELECT DISTINCT t0.did AS did FROM ktp t0
  JOIN ktp t1 ON t1.did = t0.did AND t1.p <> t0.p
  WHERE t0.tok = '{a}' AND t1.tok = '{b}'
    AND greatest(t0.p, t1.p) - least(t0.p, t1.p) + 1 <= {w}"""
        elif kind == "or_ordered":
            ors = ", ".join(f"'{t}'" for t in sp["or_terms"])
            body = f"""
  SELECT DISTINCT t0.did AS did FROM ktp t0
  JOIN ktp t1 ON t1.did = t0.did AND t1.p > t0.p
  WHERE t0.tok IN ({ors}) AND t1.tok = '{sp["then"]}'
    AND t1.p - t0.p + 1 <= {w}"""
        elif kind == "not_containing":
            body = f"""
  SELECT DISTINCT t0.did AS did FROM ktp t0
  JOIN ktp t1 ON t1.did = t0.did AND t1.p > t0.p
  WHERE t0.tok = '{a}' AND t1.tok = '{b}' AND t1.p - t0.p + 1 <= {w}
    AND NOT EXISTS (SELECT 1 FROM ktp c WHERE c.did = t0.did
                    AND c.tok = '{sp["other"]}' AND c.p BETWEEN t0.p AND t1.p)"""
        elif kind == "containing":
            body = f"""
  SELECT DISTINCT did FROM (
    SELECT x.did, x.p AS p0, min(y.p) AS p1
    FROM ktp x JOIN ktp y ON y.did = x.did AND y.p > x.p AND y.tok = '{b}'
    WHERE x.tok = '{a}' GROUP BY x.did, x.p
  ) cand
  WHERE p1 - p0 + 1 <= {w}
    AND NOT EXISTS (SELECT 1 FROM ktp x2 WHERE x2.did = cand.did
                    AND x2.tok = '{a}' AND x2.p > cand.p0 AND x2.p < cand.p1)
    AND EXISTS (SELECT 1 FROM ktp c WHERE c.did = cand.did
                AND c.tok = '{sp["other"]}' AND c.p BETWEEN cand.p0 AND cand.p1)"""
        else:
            raise ValueError(kind)
        parts.append(f"""
SELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id FROM ({body})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_span_multiterm(specs: list[dict]) -> str:
    """SpanMultiTermQueryWrapper oracle: ordered span-near where a clause may
    be a dictionary-expanded prefix — the SQL twin uses LIKE on the token
    (identical to expanding the dictionary then OR-ing, since both sides see
    the same analyzed token stream)."""
    parts = []
    for sp in specs:
        clauses, slop, qid = sp["clauses"], sp["slop"], sp["qid"]
        joins = " ".join(
            f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p > t{i-1}.p"
            for i in range(1, len(clauses))
        )
        conds = " AND ".join(
            f"t{i}.tok LIKE '{v}%'" if kind == "prefix" else f"t{i}.tok = '{v}'"
            for i, (kind, v) in enumerate(clauses)
        )
        n = len(clauses)
        width = f"(t{n-1}.p - t0.p - {n - 1})"
        parts.append(f"""
SELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT t0.did AS did FROM ktp t0 {joins}
      WHERE {conds} AND {width} <= {slop})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_elevate(term: str, elevated: list[int], k: int) -> str:
    """QueryElevationComponent oracle: configured ids (valid, in configured
    order, truncated to k) are pinned to the top whether or not they match;
    organic BM25 hits follow with the pinned ids excluded → (rank, doc_id,
    elevated)."""
    vals = ", ".join(f"({pos}, {did})" for pos, did in enumerate(elevated))
    return prelude() + "," + _score_cte([term]) + f""",
elev(pos, did) AS (VALUES {vals}),
pinned AS (
  -- valid ids keep configured order, then truncate to k (engine: filter
  -- invalid first, slice [:k] second)
  SELECT pos2 - 1 AS pos, did FROM (
    SELECT row_number() OVER (ORDER BY pos) AS pos2, did FROM elev
    WHERE did >= 0 AND did < (SELECT dc FROM stats)
  ) WHERE pos2 <= {k}
),
np AS (SELECT count(*) AS n FROM pinned),
organic AS (
  SELECT did, row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS orank
  FROM agg WHERE did NOT IN (SELECT did FROM pinned)
),
combined AS (
  SELECT pos AS r, did, TRUE AS elevated FROM pinned
  UNION ALL
  SELECT (SELECT n FROM np) + orank AS r, did, FALSE AS elevated
  FROM organic WHERE orank < {k} - (SELECT n FROM np)
)
SELECT CAST(r AS BIGINT) AS rank, CAST(did AS BIGINT) AS doc_id, elevated
FROM combined ORDER BY r
"""


def sql_realtime_get(ids: list[int]) -> str:
    """RealTimeGet oracle: stored fields by dense doc id; sha256 invariant
    checked end-to-end (per-row content sha256 equality)."""
    idl = ", ".join(str(i) for i in ids)
    return f"""
WITH {CORPUS_CTE}
SELECT CAST(did AS BIGINT) AS doc_id, source AS repo, path, lang,
       sha256(text) AS content_sha256
FROM corpus WHERE did IN ({idl}) ORDER BY did
"""


def sql_facet_query(specs: list[tuple[str, str]]) -> str:
    """facet.query oracle: each spec is (qid, parsed-kind) where the engine
    side runs the classic parser; the SQL twins are hand-expanded per query
    shape (AND / OR / AND-NOT / term)."""
    parts = []
    for qid, kind, terms, not_terms in specs:
        tl = ", ".join(f"'{t}'" for t in terms)
        if kind == "and":
            sub = f"""SELECT count(*) FROM (
  SELECT did FROM tf WHERE tok IN ({tl}) GROUP BY did
  HAVING count(DISTINCT tok) = {len(terms)})"""
        elif kind == "or":
            sub = f"SELECT count(DISTINCT did) FROM tf WHERE tok IN ({tl})"
        elif kind == "and_not":
            ntl = ", ".join(f"'{t}'" for t in not_terms)
            sub = f"""SELECT count(*) FROM (
  (SELECT did FROM tf WHERE tok IN ({tl}) GROUP BY did
   HAVING count(DISTINCT tok) = {len(terms)})
  EXCEPT (SELECT DISTINCT did FROM tf WHERE tok IN ({ntl})))"""
        else:
            raise ValueError(kind)
        parts.append(f"SELECT '{qid}' AS facet_query, CAST(({sub}) AS BIGINT) AS n")
    return prelude() + " " + " UNION ALL ".join(parts)


def sql_span_contain(specs: list[dict]) -> str:
    """SpanContaining/SpanWithin match-set oracle. Big spans follow
    NearSpansOrdered's enumeration exactly — for each first-clause position
    p0, the span ends at the FIRST second-clause position p1 > p0 (cursor
    advances "as little as necessary"), kept iff p1 - p0 - 1 <= slop; a doc
    matches iff some such span contains a little-term position (the monotone
    ContainSpans cursors are exact for width-1 littles)."""
    parts = []
    for sp in specs:
        parts.append(f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id FROM (
  SELECT DISTINCT big.did FROM (
    SELECT t0.did, t0.p AS p0, min(t1.p) AS p1
    FROM ktp t0 JOIN ktp t1 ON t1.did = t0.did AND t1.p > t0.p AND t1.tok = '{sp["b"]}'
    WHERE t0.tok = '{sp["a"]}' GROUP BY t0.did, t0.p
    HAVING min(t1.p) - t0.p - 1 <= {sp["slop"]}
  ) big
  JOIN ktp lt ON lt.did = big.did AND lt.tok = '{sp["little"]}'
                AND lt.p BETWEEN big.p0 AND big.p1
)""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_export(term: str) -> str:
    """/export oracle: full sorted match set (sort = path asc, doc id asc)."""
    return prelude() + f"""
SELECT CAST(row_number() OVER (ORDER BY c.path, c.did) - 1 AS BIGINT) AS rank,
       CAST(c.did AS BIGINT) AS doc_id, c.path
FROM corpus c JOIN (SELECT DISTINCT did FROM tf WHERE tok = '{term}') m USING (did)
ORDER BY c.path, c.did
"""


def sql_collapse(term: str, k: int, expand_rows: int) -> str:
    """Collapse/expand oracle: heads = per-group best (score desc, did asc),
    ranked (score desc, group asc); expanded = next rows of head groups."""
    return prelude() + "," + _score_cte([term]) + f""",
vals AS (SELECT did, source AS v FROM corpus),
scored AS (SELECT a.did, a.score, v.v FROM agg a JOIN vals v USING (did)),
rn AS (
  SELECT did, score, v,
         row_number() OVER (PARTITION BY v ORDER BY score DESC, did ASC) AS r
  FROM scored
),
heads AS (
  SELECT v, did, score,
         row_number() OVER (ORDER BY score DESC, v ASC) - 1 AS grank
  FROM rn WHERE r = 1 ORDER BY score DESC, v ASC LIMIT {k}
)
SELECT 'collapsed' AS section, v AS group_val,
       CAST(grank AS BIGINT) AS rank, CAST(did AS BIGINT) AS doc_id, score
FROM heads
UNION ALL
SELECT 'expanded', rn.v, CAST(rn.r - 2 AS BIGINT), CAST(rn.did AS BIGINT), rn.score
FROM rn JOIN heads USING (v) WHERE rn.r BETWEEN 2 AND {1 + expand_rows}
"""


def sql_suggest_infix(substrings: list[str], num: int = 5) -> str:
    parts = []
    for sub in substrings:
        parts.append(f"""
SELECT '{sub}' AS substring, tok AS term, CAST(df AS BIGINT) AS df
FROM (SELECT tok, df FROM idf WHERE tok LIKE '%{sub}%'
      ORDER BY df DESC, tok ASC LIMIT {num})""")
    return prelude() + " " + " UNION ALL ".join(parts)


def sql_deep_page(term: str, page_size: int, n_pages: int) -> str:
    """cursorMark oracle: global rank // page_size = page, rank within page."""
    return prelude() + "," + _score_cte([term]) + f"""
SELECT CAST((row_number() OVER w - 1) // {page_size} AS BIGINT) AS page,
       CAST((row_number() OVER w - 1) % {page_size} AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM agg
WINDOW w AS (ORDER BY score DESC, did ASC)
QUALIFY row_number() OVER w <= {page_size * n_pages}
ORDER BY page, rank
"""


def sql_blended(specs: list[dict], k: int) -> str:
    """BlendedTermQuery oracle: every term scores with the set's minimum idf
    (= max df — BlendedTermQuery.java:275-288), SHOULD-summed."""
    parts = []
    for sp in specs:
        tl = ", ".join(f"'{t}'" for t in sorted(sp["terms"]))
        parts.append(prelude() + f""",
bidf AS (SELECT min(idf) AS v FROM idf WHERE tok IN ({tl})),
sc AS (
  SELECT k.did,
         (((SELECT v FROM bidf) * {1.0!r}) * {K1 + 1!r}) * k.tf
           / (k.tf + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS s
  FROM tf k JOIN quant q USING (did)
  WHERE k.tok IN ({tl})
),
agg AS (SELECT did, sum(s) AS score FROM sc GROUP BY did)
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM agg ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def _ltr_first_pass(term: str, rerank_k: int) -> str:
    return prelude() + "," + _score_cte([term]) + f""",
fp AS (SELECT did, score FROM agg ORDER BY score DESC, did ASC LIMIT {rerank_k}),
feats AS (
  SELECT fp.did, fp.score, CAST(q.qlen AS DOUBLE) AS flen
  FROM fp JOIN quant q USING (did)
)"""


def sql_ltr_linear(term: str, rerank_k: int, k: int,
                   weights: tuple, vf: float) -> str:
    w0, w1, w2 = weights
    return _ltr_first_pass(term, rerank_k) + f"""
SELECT CAST(row_number() OVER (ORDER BY ltr_score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, ltr_score
FROM (SELECT did, (({w0!r} * score + {w1!r} * flen) + {w2!r} * {vf!r}) AS ltr_score FROM feats)
ORDER BY ltr_score DESC, did ASC LIMIT {k}
"""


def _tree_case(spec) -> str:
    if not isinstance(spec, tuple):
        return repr(float(spec))
    f, thr, l, r = spec
    col = {0: "score", 1: "flen"}[f]
    return (f"CASE WHEN {col} <= {thr!r} THEN {_tree_case(l)} "
            f"ELSE {_tree_case(r)} END")


def sql_ltr_trees(term: str, rerank_k: int, k: int, trees: tuple) -> str:
    expr = " + ".join(f"{w!r} * ({_tree_case(t)})" for w, t in trees)
    return _ltr_first_pass(term, rerank_k) + f"""
SELECT CAST(row_number() OVER (ORDER BY ltr_score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, ltr_score
FROM (SELECT did, ({expr}) AS ltr_score FROM feats)
ORDER BY ltr_score DESC, did ASC LIMIT {k}
"""


#: FeatureField freq of an exactly-representable positive int (flen < 2^24):
#: floatToIntBits(flen) >>> 15 rebuilt from integer parts — exponent byte
#: (bits(flen)-1+127) << 8 plus the top 8 mantissa bits (validated
#: element-exact against util/feature.encode_feature_values for 1..20000)
FEATURE_FREQ_SQL = """(
  ((length(bin(flen)) - 1 + 127) << 8)
  + (CASE WHEN length(bin(flen)) - 1 <= 8
          THEN flen << (8 - (length(bin(flen)) - 1))
          ELSE flen >> ((length(bin(flen)) - 1) - 8) END - 256)
)"""

#: decode(encode(flen)) for positive ints — floor to 9 significant bits
#: (1 implicit + 8 stored mantissa bits), i.e. the feature value the scorer
#: actually sees (FeatureField.java:195-210)
FEATURE_VALUE_SQL = """(
  CASE WHEN flen < 512 THEN flen
       ELSE ((flen >> (length(bin(flen))-9)) << (length(bin(flen))-9)) END
)"""


def sql_feature_field(terms: list[str], pivot: float, log_term: str,
                      k: int = 10) -> str:
    """FeatureField oracle: BM25 MUST term + feature SHOULD over 'doclen'
    (= content token count), engine double op order. sat_* adds
    0.5·(1 − pivot/(S + pivot)), log_* adds 0.3·ln(1 + S), S = the
    9-significant-bit floor-quantized flen (docs matching a content term
    always have flen > 0, so the feature clause always matches)."""
    parts = []
    for t in terms:
        parts.append(prelude() + "," + _term_score_cte("s1", t) + f""",
sc AS (
  SELECT s1.did,
         s1.score + {0.5!r} * (1.0 - {pivot!r} / (CAST({FEATURE_VALUE_SQL} AS DOUBLE) + {pivot!r})) AS score
  FROM s1 JOIN quant q USING (did)
)
SELECT 'sat_{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM sc ORDER BY score DESC, did ASC LIMIT {k}
""")
    parts.append(prelude() + "," + _term_score_cte("s1", log_term) + f""",
sc AS (
  SELECT s1.did,
         s1.score + {0.3!r} * ln(1.0 + CAST({FEATURE_VALUE_SQL} AS DOUBLE)) AS score
  FROM s1 JOIN quant q USING (did)
)
SELECT 'log_{log_term}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM sc ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_external_file(k: int = 10) -> str:
    """ExternalFileField oracle: external value recomputed from the source
    name (srcN → 0.5 + (N%7)/4; N%5==4 absent → defVal 0)."""
    val = ("CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 4 THEN 0.0 "
           "ELSE 0.5 + (CAST(substr(source, 4) AS INT) % 7) * 0.25 END")
    eff_only = prelude() + f"""
SELECT 'eff_only' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM (SELECT did, {val} AS score FROM corpus)
ORDER BY score DESC, did ASC LIMIT {k}
"""
    eff_boost = prelude() + "," + _term_score_cte("s1", "merge") + f""",
sc AS (
  SELECT s1.did, s1.score + 2.0 * ({val}) AS score
  FROM s1 JOIN corpus c ON s1.did = c.did
)
SELECT 'eff_boost' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM sc ORDER BY score DESC, did ASC LIMIT {k}
"""
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in (eff_only, eff_boost))


def sql_fingerprint_filter(max_size: int = 1024) -> str:
    """FingerprintFilter oracle: per-doc DISTINCT sorted token concat;
    '' when nothing survives analysis or the concat (incl. separators)
    exceeds maxOutputTokenSize."""
    return prelude() + f""",
uniq AS (SELECT DISTINCT did, tok FROM kept),
fp AS (
  SELECT did,
         string_agg(tok, ' ' ORDER BY tok) AS f,
         count(*) - 1 + sum(length(tok)) AS size
  FROM uniq GROUP BY did
)
SELECT c.orig_id AS doc_id,
       CASE WHEN fp.f IS NULL OR fp.size > {max_size} THEN '' ELSE fp.f END AS fingerprint
FROM corpus c LEFT JOIN fp ON c.did = fp.did
ORDER BY c.orig_id
"""


def sql_frange(expr: str, specs: list[dict], k: int = 10) -> str:
    """frange oracle: the compiled expression AST renders to SQL (same
    association order); pure franges rank by doc id (constant score),
    the filtered spec ranks by the MUST term's BM25."""
    from ..search.expressions import compile_expression, to_sql

    sql_expr = to_sql(compile_expression(expr), {"field_len": "flen"})
    parts = []
    for sp in specs:
        conds = []
        if sp.get("lower") is not None:
            conds.append(
                f"v {'>=' if sp.get('include_lower', True) else '>'} {sp['lower']!r}"
            )
        if sp.get("upper") is not None:
            conds.append(
                f"v {'<=' if sp.get('include_upper', True) else '<'} {sp['upper']!r}"
            )
        where = " AND ".join(conds) or "TRUE"
        if "term" in sp:
            parts.append(prelude() + "," + _term_score_cte("s1", sp["term"]) + f""",
fr AS (SELECT did FROM (SELECT did, {sql_expr} AS v FROM quant) WHERE {where})
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM s1 JOIN fr USING (did) ORDER BY score DESC, did ASC LIMIT {k}
""")
        else:
            parts.append(prelude() + f"""
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id
FROM (SELECT did, {sql_expr} AS v FROM quant) WHERE {where}
ORDER BY did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_field_exists() -> str:
    """Field-existence oracle: the sparse 'enlen' feature exists exactly for
    lang='en' docs with flen > 0; counts per source."""
    return prelude() + """
SELECT c.source AS value, CAST(count(*) AS BIGINT) AS count
FROM corpus c JOIN quant q ON c.did = q.did
WHERE c.lang = 'en' AND q.flen > 0
GROUP BY c.source ORDER BY count DESC, value ASC
"""


def sql_schema_info() -> str:
    """Field listing oracle: recompute each indexed field's stats from the
    documents table (keyword fields: one term per doc; the features field's
    sum_ttf is the exact FeatureField freq encoding summed). num_terms is
    GLOBAL distinct terms per field (Luke/FieldInfos semantics) — for the
    features field that is the count of feature names actually present:
    'doclen' when any doc has flen > 0, 'enlen' when any en doc does."""
    return prelude() + f""",
feat AS (
  SELECT
    (SELECT count(*) FROM quant WHERE flen > 0)
      + (SELECT count(*) FROM quant q JOIN corpus c ON q.did = c.did
         WHERE q.flen > 0 AND c.lang = 'en') AS sdf,
    (SELECT coalesce(sum({FEATURE_FREQ_SQL}), 0) FROM quant WHERE flen > 0)
      + (SELECT coalesce(sum({FEATURE_FREQ_SQL}), 0) FROM quant q JOIN corpus c ON q.did = c.did
         WHERE q.flen > 0 AND c.lang = 'en') AS sttf
)
SELECT * FROM (
  SELECT 'content' AS field,
         CAST((SELECT dc FROM stats) AS BIGINT) AS doc_count,
         CAST((SELECT count(DISTINCT tok) FROM tf) AS BIGINT) AS num_terms,
         CAST((SELECT count(*) FROM tf) AS BIGINT) AS sum_df,
         CAST((SELECT sttf FROM stats) AS BIGINT) AS sum_ttf,
         TRUE AS has_norms
  UNION ALL
  SELECT 'lang', CAST((SELECT count(*) FROM corpus) AS BIGINT),
         CAST((SELECT count(DISTINCT lang) FROM corpus) AS BIGINT),
         CAST((SELECT count(*) FROM corpus) AS BIGINT),
         CAST((SELECT count(*) FROM corpus) AS BIGINT), FALSE
  UNION ALL
  SELECT 'path', CAST((SELECT count(*) FROM corpus) AS BIGINT),
         CAST((SELECT count(DISTINCT path) FROM corpus) AS BIGINT),
         CAST((SELECT count(*) FROM corpus) AS BIGINT),
         CAST((SELECT count(*) FROM corpus) AS BIGINT), FALSE
  UNION ALL
  SELECT 'repo', CAST((SELECT count(*) FROM corpus) AS BIGINT),
         CAST((SELECT count(DISTINCT source) FROM corpus) AS BIGINT),
         CAST((SELECT count(*) FROM corpus) AS BIGINT),
         CAST((SELECT count(*) FROM corpus) AS BIGINT), FALSE
  UNION ALL
  SELECT 'features', CAST((SELECT count(*) FROM corpus) AS BIGINT),
         CAST((SELECT CASE WHEN EXISTS (SELECT 1 FROM quant WHERE flen > 0) THEN 1 ELSE 0 END
               + CASE WHEN EXISTS (SELECT 1 FROM quant q JOIN corpus c ON q.did = c.did
                                   WHERE q.flen > 0 AND c.lang = 'en') THEN 1 ELSE 0 END) AS BIGINT),
         CAST((SELECT sdf FROM feat) AS BIGINT),
         CAST((SELECT sttf FROM feat) AS BIGINT), FALSE
) ORDER BY field
"""


def sql_expr_sort(term: str, rerank_k: int, k: int, expr: str) -> str:
    """Expression-sort oracle: the compiled AST renders to SQL with the same
    association order, over the same first-pass candidates."""
    from ..search.expressions import compile_expression, to_sql

    sql_expr = to_sql(compile_expression(expr),
                      {"_score": "score", "field_len": "flen"})
    return _ltr_first_pass(term, rerank_k) + f"""
SELECT CAST(row_number() OVER (ORDER BY expr_score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, expr_score
FROM (SELECT did, {sql_expr} AS expr_score FROM feats)
ORDER BY expr_score DESC, did ASC LIMIT {k}
"""


def sql_span_posrange(specs: list[dict]) -> str:
    parts = []
    for sp in specs:
        parts.append(f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT did FROM ktp
      WHERE tok = '{sp["term"]}' AND p >= {sp["start"]} AND p + 1 <= {sp["end"]})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_facets_prefix(term: str, prefix: str) -> str:
    return prelude() + f""",
m AS (SELECT DISTINCT did FROM tf WHERE tok = '{term}')
SELECT c.source AS value, CAST(count(*) AS BIGINT) AS n
FROM corpus c JOIN m USING (did)
WHERE c.source LIKE '{prefix}%'
GROUP BY c.source ORDER BY value
"""


def sql_facet_interval(term: str, intervals: list[str]) -> str:
    parts = []
    for spec in intervals:
        lo_inc = spec[0] == "["
        hi_inc = spec[-1] == "]"
        lo_s, hi_s = spec[1:-1].split(",")
        conds = []
        if lo_s != "*":
            conds.append(f"flen {'>=' if lo_inc else '>'} {int(lo_s)}")
        if hi_s != "*":
            conds.append(f"flen {'<=' if hi_inc else '<'} {int(hi_s)}")
        where = " AND ".join(conds) or "TRUE"
        parts.append(f"""
SELECT '{spec}' AS interval, CAST(count(*) AS BIGINT) AS n
FROM quant JOIN (SELECT DISTINCT did FROM tf WHERE tok = '{term}') m USING (did)
WHERE {where}""")
    return prelude() + " " + " UNION ALL ".join(parts)


def sql_explain(term: str, top: int) -> str:
    """Explanation oracle: the same component formulas in the same float64
    op order over the top hits."""
    return prelude() + "," + _score_cte([term]) + f""",
topd AS (SELECT did, score FROM agg ORDER BY score DESC, did ASC LIMIT {top})
SELECT CAST(t.did AS BIGINT) AS doc_id,
       CAST(k.tf AS BIGINT) AS tf,
       CAST(q.qlen AS DOUBLE) AS qlen,
       CAST(i.df AS DOUBLE) AS df,
       i.idf AS idf,
       (i.idf * {1.0!r}) * {K1 + 1!r} AS weight,
       {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl)) AS norm,
       t.score AS score
FROM topd t
JOIN tf k ON k.did = t.did AND k.tok = '{term}'
JOIN quant q ON q.did = t.did
JOIN idf i ON i.tok = '{term}'
"""


def sql_multi_sort(term: str, k: int) -> str:
    return prelude() + f""",
m AS (SELECT DISTINCT did FROM tf WHERE tok = '{term}')
SELECT CAST(did AS BIGINT) AS doc_id, c.lang,
       CAST(q.flen AS BIGINT) AS field_len,
       CAST(row_number() OVER (ORDER BY c.lang ASC, q.flen DESC, did ASC) - 1 AS BIGINT) AS rank
FROM m JOIN corpus c USING (did) JOIN fl q USING (did)
ORDER BY c.lang ASC, q.flen DESC, did ASC LIMIT {k}
"""


def sql_multi_term(specs: list[dict]) -> str:
    """Multi-term match-set oracle: dictionary predicate per kind (wildcard
    → LIKE; regexp → anchored full match; fuzzy → plain Levenshtein ≤ k;
    range → lexicographic bounds)."""
    parts = []
    for sp in specs:
        if sp["kind"] == "wildcard":
            like = sp["pattern"].replace("*", "%").replace("?", "_")
            cond = f"tok LIKE '{like}'"
        elif sp["kind"] == "regexp":
            cond = f"regexp_full_match(tok, '{sp['pattern']}')"
        elif sp["kind"] == "fuzzy":
            cond = f"levenshtein(tok, '{sp['term']}') <= {sp['max_edits']}"
        else:
            cs = []
            if sp.get("lower") is not None:
                cs.append(f"tok {'>=' if sp.get('include_lower', True) else '>'} '{sp['lower']}'")
            if sp.get("upper") is not None:
                cs.append(f"tok {'<=' if sp.get('include_upper', True) else '<'} '{sp['upper']}'")
            cond = " AND ".join(cs) or "TRUE"
        parts.append(f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT did FROM tf WHERE {cond})""")
    return prelude() + " " + " UNION ALL ".join(parts)


def sql_lm_logprob() -> str:
    """Unigram-LM oracle: one ln() per (doc, term) — scalar libm both sides."""
    return prelude() + """,
ttfs AS (SELECT tok, sum(tf) AS ttf FROM tf GROUP BY tok)
SELECT CAST(k.did AS BIGINT) AS doc_id, k.tok AS term,
       CAST(k.tf AS BIGINT) AS tf,
       ln(CAST(s.ttf AS DOUBLE) / (SELECT sttf FROM stats)) AS ln_p
FROM tf k JOIN ttfs s USING (tok)
"""


def sql_multi_phrase(specs: list[dict]) -> str:
    """MultiPhrase match-set oracle: slot i's token ∈ its alternative set at
    position p0 + i."""
    parts = []
    for sp in specs:
        slots = sp["slots"]
        joins, conds = [], []
        for i, slot in enumerate(slots):
            inl = ", ".join(f"'{t}'" for t in sorted(slot))
            if i == 0:
                conds.append(f"t0.tok IN ({inl})")
            else:
                joins.append(f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p = t0.p + {i}")
                conds.append(f"t{i}.tok IN ({inl})")
        parts.append(f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT t0.did AS did FROM ktp t0 {' '.join(joins)}
      WHERE {' AND '.join(conds)})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_model_rerank(term: str, rerank_k: int, k: int) -> str:
    """Model-rerank oracle: the deterministic stub logit is md5-replicable."""
    return prelude() + "," + _score_cte([term]) + f""",
fp AS (SELECT did FROM agg ORDER BY score DESC, did ASC LIMIT {rerank_k}),
m AS (
  SELECT did,
         (CAST(('0x' || substr(md5('xenc|{term}|' || CAST(did AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1000000) / 1000000.0 AS model_score
  FROM fp
)
SELECT CAST(row_number() OVER (ORDER BY model_score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, model_score
FROM m ORDER BY model_score DESC, did ASC LIMIT {k}
"""


def sql_check_index() -> str:
    return prelude() + """
SELECT CAST((SELECT dc FROM stats) AS BIGINT) AS docs,
       CAST((SELECT count(*) FROM tf) AS BIGINT) AS term_doc_pairs,
       CAST((SELECT sttf FROM stats) AS BIGINT) AS sum_ttf
"""


def sql_multi_phrase_sloppy(specs: list[dict]) -> str:
    """Sloppy MultiPhrase oracle: one position per slot (token ∈ slot set),
    normalized width ≤ slop — exact for pairwise-disjoint slot sets."""
    parts = []
    for sp in specs:
        slots, slop, qid = sp["slots"], sp["slop"], sp["qid"]
        joins = " ".join(
            f"JOIN ktp t{i} ON t{i}.did = t0.did" for i in range(1, len(slots))
        )
        conds = " AND ".join(
            f"t{i}.tok IN ({', '.join(repr(t) for t in sorted(slot))})"
            for i, slot in enumerate(slots)
        )
        norm = [f"(t{i}.p - {i})" for i in range(len(slots))]
        width = f"greatest({', '.join(norm)}) - least({', '.join(norm)})"
        parts.append(f"""
SELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT t0.did AS did FROM ktp t0 {joins}
      WHERE {conds} AND {width} <= {slop})""")
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_nested_bool() -> str:
    return prelude() + """
SELECT CAST(did AS BIGINT) AS doc_id FROM (
  (SELECT DISTINCT did FROM tf WHERE tok IN ('join', 'merge'))
  INTERSECT (SELECT DISTINCT did FROM tf WHERE tok IN ('vector', 'window'))
  EXCEPT (SELECT DISTINCT did FROM tf WHERE tok = 'slow')
) ORDER BY did
"""


def sql_synonym_query(terms: list[str], k: int) -> str:
    tl = ", ".join(f"'{t}'" for t in sorted(terms))
    return prelude() + f""",
syn AS (SELECT did, sum(tf) AS f FROM tf WHERE tok IN ({tl}) GROUP BY did),
minidf AS (SELECT min(idf) AS v FROM idf WHERE tok IN ({tl})),
sc AS (
  SELECT s.did,
         (((SELECT v FROM minidf) * {1.0!r}) * {K1 + 1!r}) * s.f
           / (s.f + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS score
  FROM syn s JOIN quant q USING (did)
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM sc ORDER BY score DESC, did ASC LIMIT {k}
"""


def sql_term_set(terms: list[str]) -> str:
    tl = ", ".join(f"'{t}'" for t in sorted(terms))
    return prelude() + f"""
SELECT CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT did FROM tf WHERE tok IN ({tl})) ORDER BY did
"""


def sql_constant_score(prefix: str, boost: float) -> str:
    return prelude() + f"""
SELECT CAST(did AS BIGINT) AS doc_id, CAST({boost!r} AS DOUBLE) AS score
FROM (SELECT DISTINCT did FROM tf WHERE tok LIKE '{prefix}%') ORDER BY did
"""


def sql_span_first_or(terms: list[str], n: int) -> str:
    tl = ", ".join(f"'{t}'" for t in sorted(terms))
    return prelude() + "," + _TOKPOS_CTES + f"""
SELECT CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT did FROM ktp WHERE tok IN ({tl}) AND p + 1 <= {n})
ORDER BY did
"""


def sql_search_fl(term: str, k: int) -> str:
    return prelude() + "," + _score_cte([term]) + f"""
SELECT CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, c.path, c.lang, score
FROM agg JOIN corpus c USING (did)
ORDER BY score DESC, did ASC LIMIT {k}
"""


def sql_spell_collate(query_terms: list[str], max_edits: int = 2) -> str:
    """Collation oracle: per-term best correction (unknown terms only) by
    (levenshtein asc, df desc, term asc), then the conjunctive hit count."""
    fixes = []
    for i, t in enumerate(query_terms):
        fixes.append(f"""
fix{i} AS (
  SELECT CASE WHEN EXISTS (SELECT 1 FROM idf WHERE tok = '{t}') THEN '{t}'
         ELSE coalesce((SELECT tok FROM idf
                        WHERE levenshtein(tok, '{t}') <= {max_edits}
                          AND df > 0
                        ORDER BY levenshtein(tok, '{t}') ASC, df DESC, tok ASC
                        LIMIT 1), '{t}') END AS t
)""")
    n = len(query_terms)
    sel = " || ' ' || ".join(f"(SELECT t FROM fix{i})" for i in range(n))
    conds = " AND ".join(
        f"EXISTS (SELECT 1 FROM tf x{i} WHERE x{i}.did = d.did AND x{i}.tok = (SELECT t FROM fix{i}))"
        for i in range(n)
    )
    return prelude() + "," + ",".join(fixes) + f"""
SELECT {sel} AS collation,
       CAST((SELECT count(*) FROM (SELECT DISTINCT did FROM tf) d WHERE {conds}) AS BIGINT) AS hits
"""


def sql_df_histogram(bucket: int) -> str:
    return prelude() + f"""
SELECT CAST((df // {bucket}) * {bucket} AS BIGINT) AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_terms
FROM idf GROUP BY 1 ORDER BY 1
"""


# parent/child block corpus (fulltext._blockjoin_corpus): children = the
# documents rows, + one parent row per source whose path sorts last in its
# source group; dense ids over the same (repo, path, commit) sort
BLOCKJOIN_CORPUS_CTE = """
corpus AS (
  SELECT row_number() OVER (ORDER BY repo, path, commitid) - 1 AS did,
         repo AS source, lang, path, text
  FROM (
    SELECT source AS repo, 'doc/' || doc_id AS path,
           printf('%040x', doc_id) AS commitid, lang, text FROM documents
    UNION ALL
    SELECT source, 'zzz/parent', repeat('f', 40), 'parent', 'blockparent src'
    FROM (SELECT DISTINCT source FROM documents)
  )
)"""


def sql_block_join(terms: list[str], modes: list[str], k: int) -> str:
    """ToParentBlockJoinQuery oracle: child BM25 scores over the block
    corpus, parent = the source's sentinel row, per-ScoreMode aggregation.
    ``max`` emits the bit-exact score; total/avg/none emit NULL (rank +
    n_children compared)."""
    parts = []
    for t in terms:
        for mode in modes:
            if mode == "max":
                rank_by, score_sel = "max(s) DESC, pdid ASC", "max(s)"
            elif mode == "total":
                rank_by, score_sel = "sum(s) DESC, pdid ASC", "NULL"
            elif mode == "avg":
                rank_by, score_sel = "sum(s) / count(*) DESC, pdid ASC", "NULL"
            else:  # none: all-zero scores → doc-order tie-break
                rank_by, score_sel = "pdid ASC", "NULL"
            parts.append(f"""
SELECT 'bj_{t}_{mode}' AS query_id,
       CAST(row_number() OVER (ORDER BY {rank_by}) - 1 AS BIGINT) AS rank,
       CAST(pdid AS BIGINT) AS parent_id,
       CAST(count(*) AS BIGINT) AS n_children,
       CAST({score_sel} AS DOUBLE) AS score
FROM child_hits WHERE tok = '{t}'
GROUP BY pdid ORDER BY {rank_by} LIMIT {k}""")
    tl = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    body = "\nUNION ALL\n".join(f"({p})" for p in parts)
    return prelude(BLOCKJOIN_CORPUS_CTE) + "," + _score_cte(sorted(set(terms))) + f""",
par AS (SELECT source, did AS pdid FROM corpus WHERE path = 'zzz/parent'),
child_hits AS (
  SELECT sc.did, sc.tok, sc.s, par.pdid
  FROM sc JOIN corpus c ON sc.did = c.did JOIN par ON c.source = par.source
  WHERE c.path <> 'zzz/parent' AND sc.tok IN ({tl})
)
{body}
"""


# pair-joined identifier corpus for the WordDelimiter entry: the same RE2
# regexp_replace as pipelines/fulltext._wd_corpus (verified identical across
# DuckDB / Arrow / Python re for non-overlapping leftmost scans)
WD_CORPUS_CTE = r"""
corpus AS (
  SELECT row_number() OVER (ORDER BY source, 'doc/' || doc_id, printf('%040x', doc_id)) - 1 AS did,
         doc_id AS orig_id, source, lang, 'doc/' || doc_id AS path,
         regexp_replace(text, '([a-z]+) ([a-z]+)', '\1_\2', 'g') AS text
  FROM documents
)"""


def prelude_word_delimiter() -> str:
    """WordDelimiter index (preserve_original + catenate): each raw token
    splits at underscores into parts (own positions → counted in the norm
    length); tokens that split also emit the original and the delimiter-free
    catenation as posIncr-0 overlaps (in ``emitted`` for tf/ttf, not in
    ``base``/norms). maxTokenLength applies to the RAW token, stopwords to
    every emitted term — the engine chain order.

    SCOPE: the oracle models UNDERSCORE splits only, which is exhaustive for
    this entry's derived corpus (lowercase words pair-joined with ``_`` —
    no case or digit transitions can occur). The engine's case-change and
    letter↔digit splitting is pinned separately by the golden tests in
    tests/test_analysis_filters.py (wd_parts golden vocabulary +
    Arrow-vs-Python equivalence); do NOT reuse this prelude over a corpus
    with mixed-case or alphanumeric tokens."""
    return f"""
WITH {WD_CORPUS_CTE},
rawt AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
tokl AS (
  SELECT did, tok, list_filter(str_split(tok, '_'), p -> p <> '') AS parts
  FROM rawt WHERE length(tok) <= 255
),
pre_base AS (
  SELECT did, tok FROM tokl WHERE len(parts) = 1 AND parts[1] = tok
  UNION ALL SELECT did, unnest(parts) AS tok FROM tokl WHERE len(parts) > 1
),
base AS (SELECT did, tok FROM pre_base WHERE tok NOT IN ({STOPLIST_SQL})),
emitted AS (
  SELECT did, tok FROM base
  UNION ALL SELECT did, tok FROM tokl
    WHERE len(parts) > 1 AND tok NOT IN ({STOPLIST_SQL})
  UNION ALL SELECT did, array_to_string(parts, '') AS tok FROM tokl
    WHERE len(parts) > 1 AND array_to_string(parts, '') NOT IN ({STOPLIST_SQL})
),{_VARIANT_TAIL}"""


def _html_strip_expr(col: str) -> str:
    """Render analysis.tokenizer.HTML_STRIP_RULES as nested DuckDB
    regexp_replace calls — the exact same RE2 chain the engine applies."""
    from ..analysis.tokenizer import HTML_STRIP_RULES

    expr = col
    for pat, repl in HTML_STRIP_RULES:
        p = pat.replace("'", "''")
        r = repl.replace("'", "''").replace("\\", "\\\\")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


def prelude_html_strip() -> str:
    """html_strip CharFilter index over the HTML-ified corpus (markup added
    by pipelines/fulltext._html_corpus with the same literals)."""
    from ..pipelines.fulltext import HTML_PRE, HTML_SUF

    pre = HTML_PRE.replace("'", "''")
    suf = HTML_SUF.replace("'", "''")
    return f"""
WITH html_raw AS (
  SELECT row_number() OVER (ORDER BY source, 'doc/' || doc_id, printf('%040x', doc_id)) - 1 AS did,
         '{pre}' || regexp_replace(text, '(table|merge)', '<b>\\1</b>', 'g') || '{suf}' AS text
  FROM documents
),
corpus AS (SELECT did, {_html_strip_expr("text")} AS text FROM html_raw),
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
base AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
emitted AS (SELECT did, tok FROM base),{_VARIANT_TAIL}"""


def sql_covering(terms: list[str], mods: list[int]) -> str:
    """CoveringQuery oracle: a doc matches when its matching-clause count ≥
    max(1, 1 + (field_len % mod)) (CoveringScorer.java:127-133)."""
    parts = [
        f"""
SELECT 'cov_mod{mod}' AS query_id, CAST(a.did AS BIGINT) AS doc_id
FROM agg a JOIN quant q ON a.did = q.did
WHERE a.nmatch >= greatest(1, 1 + (q.flen % {mod}))
ORDER BY doc_id"""
        for mod in mods
    ]
    body = "\nUNION ALL\n".join(f"({p})" for p in parts)
    return prelude() + "," + _score_cte(sorted(set(terms))) + f"\n{body}\n"


def prelude_ngram(lo: int, hi: int) -> str:
    """NGramTokenFilter index (default stopwords): each kept token is
    REPLACED by all its substrings of length lo..hi; tokens shorter than lo
    vanish; one position anchor per surviving token (the offset-0 lo-gram),
    the rest are overlaps."""
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
base AS (SELECT did, tok FROM kept WHERE length(tok) >= {lo}),
emitted AS (
  SELECT did, unnest(flatten(list_transform(generate_series({lo}, {hi}),
         g -> list_transform(generate_series(1, length(tok) - g + 1),
              o -> tok[o:o+g-1])))) AS tok
  FROM kept
),{_VARIANT_TAIL}"""


def prelude_length_filter(lo: int, hi: int) -> str:
    """LengthFilter index (default stopwords): tokens outside [lo, hi] are
    dropped before the stop filter; no overlaps."""
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
base AS (
  SELECT did, tok FROM toks
  WHERE length(tok) <= 255 AND length(tok) BETWEEN {lo} AND {hi}
    AND tok NOT IN ({STOPLIST_SQL})
),
emitted AS (SELECT did, tok FROM base),{_VARIANT_TAIL}"""


def sql_docvalues_set(term: str, langs: tuple, lens: tuple, k: int) -> str:
    """DocValues set-query oracle: lang-set filtered BM25 top-k + a numeric
    set-membership full match stream (constant score 1.0, doc order)."""
    ll = ", ".join(f"'{x}'" for x in langs)
    nl = ", ".join(str(x) for x in lens)
    return prelude() + "," + _score_cte([term]) + f"""
SELECT * FROM (
  SELECT 'dvt' AS query_id,
         CAST(row_number() OVER (ORDER BY a.score DESC, a.did ASC) - 1 AS BIGINT) AS rank,
         CAST(a.did AS BIGINT) AS doc_id,
         CAST(a.score AS DOUBLE) AS score
  FROM agg a JOIN corpus c ON a.did = c.did
  WHERE c.lang IN ({ll})
  ORDER BY a.score DESC, a.did ASC LIMIT {k}
)
UNION ALL
SELECT 'dvn' AS query_id,
       CAST(row_number() OVER (ORDER BY did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id,
       CAST(1.0 AS DOUBLE) AS score
FROM quant WHERE flen IN ({nl})
"""


def sql_block_join_children(sources: tuple) -> str:
    """ToChildBlockJoinQuery oracle over the block corpus: children of the
    selected sources' parent rows, each scored with the parent's
    content:blockparent BM25 score (single term → bit-exact float64)."""
    sl = ", ".join(f"'{s}'" for s in sources)
    return prelude(BLOCKJOIN_CORPUS_CTE) + "," + _score_cte(["blockparent"]) + f"""
, par AS (
  SELECT c.source, c.did AS pdid, sc.s AS pscore
  FROM corpus c JOIN sc ON sc.did = c.did
  WHERE c.path = 'zzz/parent' AND c.source IN ({sl})
)
SELECT CAST(c.did AS BIGINT) AS child_id,
       CAST(p.pdid AS BIGINT) AS parent_id,
       CAST(p.pscore AS DOUBLE) AS score
FROM corpus c JOIN par p ON c.source = p.source
WHERE c.path <> 'zzz/parent'
ORDER BY child_id
"""


def sql_func_termfreq(t1: str, t2: str, first_k: int, k: int, expr_sql: str) -> str:
    """termfreq() function-query oracle: BM25 top-first_k for t1, rerank by
    the expression over (score, termfreq(t2)) — engine float64 op order."""
    return prelude() + "," + _score_cte([t1]) + f""",
first AS (
  SELECT did, s AS score FROM sc WHERE tok = '{t1}'
  ORDER BY s DESC, did ASC LIMIT {first_k}
),
tfq AS (SELECT did, tf FROM tf WHERE tok = '{t2}'),
vals AS (
  SELECT f.did, {expr_sql} AS expr_score
  FROM first f LEFT JOIN tfq t ON f.did = t.did
)
SELECT CAST(row_number() OVER (ORDER BY expr_score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id,
       CAST(expr_score AS DOUBLE) AS expr_score
FROM vals ORDER BY expr_score DESC, did ASC LIMIT {k}
"""


def sql_wordbreak(inputs: list[str], num: int) -> str:
    """WordBreakSpellChecker oracle: single-break splits with both halves in
    the dictionary, ranked (max(df) desc, lhs asc) per input."""
    vals = ", ".join(f"('{t}')" for t in inputs)
    return prelude() + f""",
df AS (SELECT tok, count(DISTINCT did) AS df FROM tf GROUP BY tok),
inputs(term) AS (VALUES {vals}),
splits AS (
  SELECT i.term, p, substr(i.term, 1, p) AS lhs, substr(i.term, p + 1) AS rhs
  FROM inputs i, unnest(generate_series(1, length(i.term) - 1)) AS s(p)
),
cand AS (
  SELECT s.term, s.lhs, s.rhs, greatest(dl.df, dr.df) AS freq
  FROM splits s JOIN df dl ON dl.tok = s.lhs JOIN df dr ON dr.tok = s.rhs
),
ranked AS (
  SELECT term AS input,
         CAST(row_number() OVER (PARTITION BY term ORDER BY freq DESC, lhs ASC) - 1 AS BIGINT) AS rank,
         lhs, rhs, CAST(freq AS BIGINT) AS freq
  FROM cand
)
SELECT * FROM ranked WHERE rank < {num} ORDER BY input, rank
"""


def sql_reverse_wildcard(suffixes: list[str]) -> str:
    """Leading-wildcard oracle: docs with any kept token ending in the
    suffix (what the reversed-prefix rewrite must equal)."""
    parts = [
        f"""
SELECT 'rw_{suf}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM (SELECT DISTINCT did FROM kept WHERE tok LIKE '%{suf}')
ORDER BY doc_id"""
        for suf in suffixes
    ]
    body = "\nUNION ALL\n".join(f"({p})" for p in parts)
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
kept AS (
  SELECT did, tok FROM toks WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
)
{body}
"""


def sql_graph_synonym(specs: list[dict]) -> str:
    """Graph-synonym oracle: union of per-path positional matches (phrase
    self-joins for multi-token paths, simple membership for single terms)."""
    path_sqls = []
    for sp in specs:
        per_path = []
        for path in sp["paths"]:
            if len(path) == 1:
                per_path.append(
                    f"SELECT DISTINCT did FROM ktp WHERE tok = '{path[0]}'"
                )
            else:
                joins = " ".join(
                    f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p = t0.p + {i}"
                    for i in range(1, len(path))
                )
                conds = " AND ".join(
                    f"t{i}.tok = '{t}'" for i, t in enumerate(path)
                )
                per_path.append(
                    f"SELECT DISTINCT t0.did AS did FROM ktp t0 {joins} WHERE {conds}"
                )
        union = " UNION ".join(f"({p})" for p in per_path)
        path_sqls.append(f"""
SELECT '{sp["qid"]}' AS query_id, CAST(did AS BIGINT) AS doc_id
FROM ({union}) ORDER BY doc_id""")
    body = "\nUNION ALL\n".join(f"({p})" for p in path_sqls)
    return f"WITH {CORPUS_CTE},{_TOKPOS_CTES.lstrip()}\n{body}\n"


def sql_keywords(doc_ids: list[int], top: int) -> str:
    """tf·idf keyword oracle: per-doc rank by tf·idf (engine BM25 idf)."""
    dl = ", ".join(str(d) for d in doc_ids)
    return prelude() + f"""
SELECT CAST(did AS BIGINT) AS doc_id, CAST(rank AS BIGINT) AS rank, term,
       CAST(score AS DOUBLE) AS score
FROM (
  SELECT k.did, k.tok AS term, k.tf * i.idf AS score,
         row_number() OVER (PARTITION BY k.did
                            ORDER BY k.tf * i.idf DESC, k.tok ASC) - 1 AS rank
  FROM tf k JOIN idf i ON k.tok = i.tok
  WHERE k.did IN ({dl})
)
WHERE rank < {top} ORDER BY doc_id, rank
"""


def sql_diversified(term: str, max_per_key: int, k: int) -> str:
    """DiversifiedTopDocsCollector oracle: global top-k with ≤max_per_key
    hits per lang (within-key prune by (score desc, doc asc))."""
    return prelude() + "," + _score_cte([term]) + f""",
keyranked AS (
  SELECT s.did, c.lang, s.s AS score,
         row_number() OVER (PARTITION BY c.lang ORDER BY s.s DESC, s.did ASC) AS kr
  FROM sc s JOIN corpus c ON s.did = c.did
)
SELECT CAST(rank AS BIGINT) AS rank, CAST(did AS BIGINT) AS doc_id, lang,
       CAST(score AS DOUBLE) AS score
FROM (
  SELECT did, lang, score,
         row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS rank
  FROM keyranked WHERE kr <= {max_per_key}
)
WHERE rank < {k} ORDER BY rank
"""


def sql_strdist(target: str, k: int) -> str:
    """strdist(edit) function-sort oracle: levenshtein(path, target) asc,
    doc asc, top-k."""
    return f"""
WITH {CORPUS_CTE}
SELECT CAST(row_number() OVER (ORDER BY levenshtein(path, '{target}'), did) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id,
       CAST(levenshtein(path, '{target}') AS BIGINT) AS dist
FROM corpus ORDER BY dist, did LIMIT {k}
"""


def sql_suggest_fuzzy(qs: list[str], num: int, max_edits: int = 1) -> str:
    """FuzzySuggester oracle: prefix-truncated Levenshtein ≤ max_edits with
    an exact first char, weight = df."""
    parts = []
    for q in qs:
        ql = q.replace("'", "''")
        parts.append(f"""
SELECT '{ql}' AS q,
       CAST(row_number() OVER (ORDER BY df DESC, tok ASC) - 1 AS BIGINT) AS rank,
       tok AS term, CAST(df AS BIGINT) AS df
FROM dfp
WHERE substr(tok, 1, 1) = '{ql[0]}'
  AND levenshtein(substr(tok, 1, {len(q)}), '{ql}') <= {max_edits}
ORDER BY df DESC, tok ASC LIMIT {num}""")
    body = "\nUNION ALL\n".join(f"({p})" for p in parts)
    return prelude() + f""",
dfp AS (SELECT tok, count(DISTINCT did) AS df FROM tf GROUP BY tok)
{body}
"""


def sql_payload(k: int) -> str:
    """PayloadScoreQuery oracle — analytic, from the RAW text (non-circular):
    the engine indexes a derived corpus where the first ``merge`` per doc
    carries payload 2.5 and every ``spark`` carries 0.5; occurrences without
    a payload decode to 1.0. Hence per matching doc:
    sum(merge)=tf+1.5, avg=(tf+1.5)/tf, max=2.5; the span-score entry is the
    engine-float64 BM25 term score × (0.5·tf). All factors are exact binary
    fractions, so every fold is IEEE-exact in both engines."""
    subqs = []
    for qid, expr in [
        ("pay_sum_merge", "CAST(tf AS DOUBLE) + 1.5"),
        ("pay_avg_merge", "(CAST(tf AS DOUBLE) + 1.5) / tf"),
        ("pay_max_merge", "CAST(2.5 AS DOUBLE)"),
    ]:
        subqs.append(f"""
SELECT * FROM (
  SELECT '{qid}' AS query_id,
         CAST(row_number() OVER (ORDER BY {expr} DESC, did ASC) - 1 AS BIGINT) AS rank,
         CAST(did AS BIGINT) AS doc_id, CAST({expr} AS DOUBLE) AS score
  FROM tf WHERE tok = 'merge'
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)""")
    subqs.append(f"""
SELECT * FROM (
  SELECT 'pay_span_spark' AS query_id,
         CAST(row_number() OVER (ORDER BY a.score * (0.5 * t.tf) DESC, a.did ASC) - 1 AS BIGINT) AS rank,
         CAST(a.did AS BIGINT) AS doc_id, CAST(a.score * (0.5 * t.tf) AS DOUBLE) AS score
  FROM agg a JOIN tf t ON t.did = a.did AND t.tok = 'spark'
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)""")
    return prelude() + "," + _score_cte(["spark"]) + "\nUNION ALL".join(subqs)


_EDISMAX_LANGS = frozenset({"en", "de", "es", "fr", "zh"})


def sql_edismax(specs: list[dict], kw_boost: float, k: int) -> str:
    """edismax oracle with bit-exact float64 scores: each positive clause is
    one (did, s) CTE — a content BM25 score, or the kw_boost'ed keyword
    constant score when the word is a lang code (the clause DisMax resolves
    to one field because lang codes never appear in the content vocabulary;
    a one-sub DisMax scores max + tie·0 = the sub exactly). Clause sums are
    written as explicit left-associative additions over coalesce(s, 0.0) —
    the engine's canonical accumulation order (must clauses first, then
    should, then pf phrases) — so no sum() aggregate reorders the floats."""
    from ..search.edismax import calculate_min_should_match

    parts = []
    for sp in specs:
        must, should, nots = [], [], []
        for tok in sp["q"].split():
            sign, w = (tok[0], tok[1:]) if tok[0] in "+-" else ("", tok)
            (nots if sign == "-" else must if sign == "+" else should).append(w)
        msm = calculate_min_should_match(len(should), str(sp["mm"]))
        # the engine accumulates clauses in canonical repr-sorted order
        # (SegmentScorer._clauses) — for same-shape DisMax word clauses that
        # is alphabetical word order; additions below follow it exactly
        must, should = sorted(must), sorted(should)

        ctes, names = [], {}
        for i, w in enumerate(must + should):
            nm = f"cl{i}"
            names[w] = nm
            if w in _EDISMAX_LANGS:
                dfk = f"(SELECT count(*) FROM corpus WHERE lang = '{w}')"
                idf = f"ln(1 + ((SELECT dc FROM stats) - {dfk} + 0.5) / ({dfk} + 0.5))"
                kw = f"((({idf}) * {kw_boost!r}) * {K1 + 1!r}) * {1.0!r} / ({1.0!r} + {K1!r})"
                ctes.append(f"{nm} AS (SELECT did, {kw} AS s FROM corpus WHERE lang = '{w}')")
            else:
                ctes.append(
                    _term_score_cte(nm, w).strip().lstrip("\n").rstrip()
                    .replace("AS score", "AS s", 1).replace("score", "s")
                )
        n_must, n_should = len(must), len(should)
        m_names = [f"cl{i}" for i in range(n_must)]
        s_names = [f"cl{n_must + i}" for i in range(n_should)]

        if m_names:
            mjoin = m_names[0]
            for nm in m_names[1:]:
                mjoin += f" JOIN {nm} USING (did)"
            mscore = " + ".join(f"{nm}.s" for nm in m_names)
            sel = f"SELECT {m_names[0]}.did AS did, ({mscore}) AS ms FROM {mjoin}"
            base = f"base AS ({sel})"
            joins = "".join(f" LEFT JOIN {nm} ON {nm}.did = b.did" for nm in s_names)
            addc = "".join(f" + coalesce({nm}.s, 0.0)" for nm in s_names)
            nm_expr = " + ".join(
                f"(CASE WHEN {nm}.did IS NOT NULL THEN 1 ELSE 0 END)" for nm in s_names
            ) or "0"
            full = (
                f"full_t AS (SELECT b.did, (b.ms{addc}) AS score, ({nm_expr}) AS nm "
                f"FROM base b{joins})"
            )
            ctes += [base, full]
            cond = f"nm >= {msm}" if s_names else "TRUE"
        else:
            # full outer join chain over the should clauses
            prev_keys = []
            fj = s_names[0]
            for nm in s_names[1:]:
                prev_keys.append(fj.split()[0] if not prev_keys else None)
                fj += f" FULL OUTER JOIN {nm} ON coalesce({', '.join(f'{p}.did' for p in s_names[:s_names.index(nm)])}) = {nm}.did"
            did_expr = f"coalesce({', '.join(f'{nm}.did' for nm in s_names)})"
            addc = " + ".join(f"coalesce({nm}.s, 0.0)" for nm in s_names)
            nm_expr = " + ".join(
                f"(CASE WHEN {nm}.did IS NOT NULL THEN 1 ELSE 0 END)" for nm in s_names
            )
            full = (
                f"full_t AS (SELECT {did_expr} AS did, ({addc}) AS score, ({nm_expr}) AS nm "
                f"FROM {fj})"
            )
            ctes.append(full)
            cond = f"nm >= {max(1, msm)}"

        notc = ""
        for w in nots:
            if w in _EDISMAX_LANGS:
                notc += f" AND did NOT IN (SELECT did FROM corpus WHERE lang = '{w}')"
            else:
                notc += f" AND did NOT IN (SELECT did FROM tf WHERE tok = '{w}')"

        # outer-boolean SHOULD boosts (pf phrase / bq query / bf function):
        # the engine accumulates them in repr-sorted clause order
        # (FunctionQuery < PhraseQuery < TermQuery), each added to the MUST
        # user-query sum — replicate as ordered left-assoc additions
        adds: list[tuple[str, str, str]] = []  # (repr key, sql term, join)
        if sp.get("pf"):
            words = must + should
            # pf phrase word order = positive_words in QUERY order (not the
            # engine's clause-accumulation sort)
            qwords = [t.lstrip("+") for t in sp["q"].split() if not t.startswith("-")]
            idf_sum = " + ".join(f"(SELECT idf FROM idf WHERE tok = '{w}')" for w in qwords)
            joins, conds = [], [f"t0.tok = '{qwords[0]}'"]
            for i in range(1, len(qwords)):
                joins.append(f"JOIN ktp t{i} ON t{i}.did = t0.did AND t{i}.p = t0.p + {i}")
                conds.append(f"t{i}.tok = '{qwords[i]}'")
            ctes.append(
                f"ph AS (SELECT t0.did, count(*) AS freq FROM ktp t0 {' '.join(joins)} "
                f"WHERE {' AND '.join(conds)} GROUP BY t0.did)"
            )
            ctes.append(f"""phs AS (
  SELECT ph.did,
         ((({idf_sum}) * {sp["pf"]!r}) * {K1 + 1!r}) * ph.freq
           / (ph.freq + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen) / (SELECT avgdl FROM avg_dl))) AS s
  FROM ph JOIN quant q ON q.did = ph.did
)""")
            adds.append(("PhraseQuery", "coalesce(phs.s, 0.0)",
                         " LEFT JOIN phs ON phs.did = full_t.did"))
        if sp.get("bq"):
            bq_term, bq_boost = sp["bq"]
            ctes.append(
                _term_score_cte("bqs", bq_term, bq_boost).strip().lstrip("\n").rstrip()
                .replace("AS score", "AS s", 1).replace("score", "s")
            )
            adds.append(("TermQuery", "coalesce(bqs.s, 0.0)",
                         " LEFT JOIN bqs ON bqs.did = full_t.did"))
        fn_col = {"field_len": "qv.flen"}
        needs_qv = False
        if sp.get("bf"):
            from ..search.expressions import compile_expression, to_sql as expr_sql

            adds.append(("FunctionQuery",
                         expr_sql(compile_expression(sp["bf"]), fn_col), ""))
            needs_qv = True
        adds.sort(key=lambda a: a[0])
        final_score = "score" + "".join(f" + {t}" for _, t, _ in adds)
        pf_join = "".join(j for _, _, j in adds)
        if sp.get("boost"):
            from ..search.expressions import compile_expression, to_sql as expr_sql

            final_score = f"({final_score}) * {expr_sql(compile_expression(sp['boost']), fn_col)}"
            needs_qv = True
        if needs_qv:
            pf_join += " LEFT JOIN quant qv ON qv.did = full_t.did"

        body = prelude() + ",\n" + _TOKPOS_CTES + ",\n" + ",\n".join(ctes) + f"""
SELECT '{sp["qid"]}' AS query_id,
       CAST(row_number() OVER (ORDER BY {final_score} DESC, full_t.did ASC) - 1 AS BIGINT) AS rank,
       CAST(full_t.did AS BIGINT) AS doc_id, CAST({final_score} AS DOUBLE) AS score
FROM full_t{pf_join} WHERE {cond}{notc}
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""
        parts.append(body)
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_func_scale(term: str, lo: float, hi: float, k: int) -> str:
    """ScaleFloatFunction oracle (queries/function/valuesource/
    ScaleFloatFunction.java:56-96): score = term BM25 · scale value, where
    scale = ((v - min) / (max - min)) * (hi - lo) + lo over the whole
    corpus's field_len — min/max are exact integers, so the SQL subselects
    equal the engine's inlined constants bit-for-bit."""
    scale = (
        f"(((CAST(q.flen AS DOUBLE) - (SELECT CAST(min(flen) AS DOUBLE) FROM quant))"
        f" / ((SELECT CAST(max(flen) AS DOUBLE) FROM quant)"
        f" - (SELECT CAST(min(flen) AS DOUBLE) FROM quant)))"
        f" * {hi - lo!r} + {lo!r})"
    )
    return prelude() + "," + _term_score_cte("ts", term) + f"""
SELECT CAST(row_number() OVER (ORDER BY ts.score * {scale} DESC, ts.did ASC) - 1 AS BIGINT) AS rank,
       CAST(ts.did AS BIGINT) AS doc_id,
       CAST(ts.score * {scale} AS DOUBLE) AS score
FROM ts JOIN quant q ON q.did = ts.did
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def sql_payload_check(k: int) -> str:
    """SpanPayloadCheckQuery oracle — analytic from the raw text (the
    annotated corpus puts 2.5 on the FIRST merge per doc and 0.5 on every
    spark): pc_spark ⇔ freq = tf(spark); pc_first_merge ⇔ freq = 1;
    pc_merge_bare ⇔ freq = tf(merge)−1 over docs with tf ≥ 2; pc_pair ⇔
    freq = 1 where the doc's first merge is immediately followed by spark.
    Scores use the span kernel (weight = Σ idf in sorted-term order)."""

    def body(qid: str, src: str, freq: str, idf_terms: list[str]) -> str:
        idf_sum = " + ".join(
            f"(SELECT idf FROM idf WHERE tok = '{t}')" for t in idf_terms
        )
        e = (
            f"((({idf_sum}) * {1.0!r}) * {K1 + 1!r}) * ({freq})"
            f" / (({freq}) + {K1!r} * (({1.0 - B!r}) + ({B!r} * q.qlen)"
            f" / (SELECT avgdl FROM avg_dl)))"
        )
        return f"""
SELECT * FROM (
  SELECT '{qid}' AS query_id,
         CAST(row_number() OVER (ORDER BY {e} DESC, q.did ASC) - 1 AS BIGINT) AS rank,
         CAST(q.did AS BIGINT) AS doc_id, CAST({e} AS DOUBLE) AS score
  FROM {src}
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)"""

    parts = [
        body("pc_spark",
             "(SELECT did, tf FROM tf WHERE tok = 'spark') f JOIN quant q USING (did)",
             "f.tf", ["spark"]),
        body("pc_first_merge",
             "(SELECT DISTINCT did FROM tf WHERE tok = 'merge') f JOIN quant q USING (did)",
             "1", ["merge"]),
        body("pc_merge_bare",
             "(SELECT did, tf FROM tf WHERE tok = 'merge' AND tf >= 2) f JOIN quant q USING (did)",
             "f.tf - 1", ["merge"]),
        body("pc_pair",
             """(SELECT fm.did FROM (SELECT did, min(p) AS p FROM ktp WHERE tok = 'merge' GROUP BY did) fm
       JOIN ktp sp ON sp.did = fm.did AND sp.p = fm.p + 1 AND sp.tok = 'spark') f
      JOIN quant q USING (did)""",
             "1", ["merge", "spark"]),
    ]
    return prelude() + ",\n" + _TOKPOS_CTES + "\nUNION ALL".join(parts)


def prelude_common_grams() -> str:
    """CommonGramsFilter index: emitted = kept unigrams (stopwords removed)
    UNION the ``w1_w2`` bigrams of consecutive stream tokens where either
    side is a stopword (posIncr-0 overlaps → flen counts unigrams only,
    while sttf/avgdl counts everything — the reference's asymmetry)."""
    return f"""
WITH {CORPUS_CTE},
tokl AS (
  SELECT did, list_filter(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
                          t -> length(t) <= 255) AS ts
  FROM corpus
),
base AS (
  SELECT did, tok FROM (SELECT did, unnest(ts) AS tok FROM tokl)
  WHERE tok NOT IN ({STOPLIST_SQL})
),
cgrams AS (
  SELECT did, unnest([ts[i] || '_' || ts[i+1] for i in generate_series(1, len(ts) - 1)
                      if list_contains([{STOPLIST_SQL}], ts[i])
                      or list_contains([{STOPLIST_SQL}], ts[i+1])]) AS tok
  FROM tokl
),
emitted AS (SELECT did, tok FROM base UNION ALL SELECT did, tok FROM cgrams),{_VARIANT_TAIL}"""


def prelude_keep_words(keep: tuple[str, ...]) -> str:
    """KeepWordFilter index: only the keep-set words are emitted (dropped
    tokens still consume positions — irrelevant here, no phrase specs);
    norm lengths and avgdl collapse to keep-set counts."""
    keep_sql = ", ".join(f"'{w}'" for w in sorted(keep))
    return f"""
WITH {CORPUS_CTE},
toks AS (
  SELECT did, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok FROM corpus
),
base AS (
  SELECT did, tok FROM toks
  WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL}) AND tok IN ({keep_sql})
),
emitted AS (SELECT did, tok FROM base),{_VARIANT_TAIL}"""


def prelude_limit_tokens(n: int) -> str:
    """LimitTokenCountFilter index: only the first ``n`` kept (post-stop)
    tokens of each doc are emitted; norm lengths and avgdl reflect the
    truncation (list slice keeps the original token order)."""
    return f"""
WITH {CORPUS_CTE},
tokl AS (
  SELECT did, list_filter(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}'),
                          t -> length(t) <= 255 AND NOT list_contains([{STOPLIST_SQL}], t)) AS ts
  FROM corpus
),
emitted AS (SELECT did, unnest(ts[1:{n}]) AS tok FROM tokl),
base AS (SELECT did, tok FROM emitted),{_VARIANT_TAIL}"""


def sql_topk_sweetspot(terms: list[str], params: tuple, k: int) -> str:
    """SweetSpotSimilarity single-term top-k with exact float64 scores
    (lucene/misc SweetSpotSimilarity.java): tf = base for freq ≤ min else
    sqrt(freq + base² − min); lengthNorm = 1/sqrt(steepness·(|l−min| +
    |l−max| − (max−min)) + 1) over the QUANTIZED length; idf = Classic's
    ln((dc+1)/(df+1)) + 1."""
    mn, mx, s, tmin, tbase = params
    parts = []
    norm = (
        f"({1.0!r} / sqrt(({s!r} * ((abs(q.qlen - {float(mn)!r}) + abs(q.qlen - {float(mx)!r}))"
        f" - ({float(mx)!r} - {float(mn)!r})) + {1.0!r})))"
    )
    tf_f = (
        f"(CASE WHEN k.tf <= {tmin!r} THEN {tbase!r}"
        f" ELSE sqrt(k.tf + {tbase!r} * {tbase!r} - {tmin!r}) END)"
    )
    for t in sorted(terms):
        idf = (
            f"({1.0!r} * (ln(((SELECT dc FROM stats) + 1) /"
            f" CAST((SELECT count(DISTINCT did) FROM tf WHERE tok = '{t}') + 1 AS DOUBLE)) + {1.0!r}))"
        )
        parts.append(prelude() + f""",
scored AS (
  SELECT k.did, ({tf_f} * {idf}) * {norm} AS score
  FROM tf k JOIN quant q USING (did) WHERE k.tok = '{t}'
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_topk_axiomatic(terms: list[str], k: int, s: float = 0.25,
                       kk: float = 0.35) -> str:
    """Axiomatic F2EXP single-term top-k, float64 exact: score =
    tf/((tf + s) + (s·docLen)/avgdl) · pow((N+1)/df, k) with docLen = the
    QUANTIZED length and avgdl = sumTTF/docCount (SimilarityBase); boosts
    ignored (Axiomatic.score never reads stats.getBoost())."""
    parts = []
    for t in sorted(terms):
        dfq = f"(SELECT CAST(count(DISTINCT did) AS DOUBLE) FROM tf WHERE tok = '{t}')"
        score = (
            f"(k.tf / ((k.tf + {s!r}) + (({s!r} * q.qlen) / (SELECT avgdl FROM avg_dl))))"
            f" * pow(((SELECT dc FROM stats) + {1.0!r}) / {dfq}, {kk!r})"
        )
        parts.append(prelude() + f""",
scored AS (
  SELECT k.did, {score} AS score
  FROM tf k JOIN quant q USING (did) WHERE k.tok = '{t}'
)
SELECT '{t}' AS query_id,
       CAST(row_number() OVER (ORDER BY score DESC, did ASC) - 1 AS BIGINT) AS rank,
       CAST(did AS BIGINT) AS doc_id, score
FROM scored ORDER BY score DESC, did ASC LIMIT {k}
""")
    return " UNION ALL ".join(f"SELECT * FROM ({p_})" for p_ in parts)


def sql_surround() -> str:
    """Surround-parser match-set oracles (hand-expanded twins of
    SURROUND_SPECS): W = ordered span-near width ≤ N−1; N(unordered, two
    single terms) ⇔ |p1−p0|−1 ≤ N−1; or() groups become IN-lists;
    truncations LIKE; top-level and/not become IN / NOT IN did filters."""
    ordered2 = (
        "SELECT DISTINCT t0.did AS did FROM ktp t0 "
        "JOIN ktp t1 ON t1.did = t0.did AND t1.p > t0.p "
        "WHERE {c0} AND {c1} AND (t1.p - t0.p - 1) <= {slop}"
    )
    unordered2 = (
        "SELECT DISTINCT t0.did AS did FROM ktp t0 "
        "JOIN ktp t1 ON t1.did = t0.did AND t1.p <> t0.p "
        "WHERE {c0} AND {c1} AND (abs(t1.p - t0.p) - 1) <= {slop}"
    )
    bodies = {
        "sur_w": ordered2.format(c0="t0.tok = 'merge'", c1="t1.tok = 'spark'", slop=2),
        "sur_n": unordered2.format(c0="t0.tok = 'merge'", c1="t1.tok = 'spark'", slop=2),
        "sur_or_w": ordered2.format(
            c0="t0.tok IN ('merge', 'spark')", c1="t1.tok = 'window'", slop=1),
        "sur_trunc": ordered2.format(
            c0="t0.tok LIKE 'mer%'", c1="t1.tok = 'window'", slop=1),
        "sur_bool": (
            ordered2.format(c0="t0.tok = 'merge'", c1="t1.tok = 'spark'", slop=2)
            + " AND t0.did IN (SELECT did FROM tf WHERE tok = 'window')"
            + " AND t0.did NOT IN (SELECT did FROM tf WHERE tok = 'dup')"
        ),
        "sur_infix": unordered2.format(
            c0="t0.tok = 'merge'", c1="t1.tok = 'window'", slop=3),
    }
    parts = [
        f"\nSELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id FROM ({body})"
        for qid, body in bodies.items()
    ]
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


def sql_simple_parser() -> str:
    """SimpleQueryParser match-set oracles (hand-expanded twins of
    SIMPLE_SPECS). sp_not: 'merge -window' under the OR default operator is
    merge-docs ∪ (everything − window-docs) — the reference wraps a negated
    clause as (MUST_NOT x, SHOULD MatchAll). sp_broken: the extraneous '('
    and '"' vanish, leaving 'merge OR window'."""
    merge_d = "SELECT did FROM tf WHERE tok = 'merge'"
    window_d = "SELECT did FROM tf WHERE tok = 'window'"
    bodies = {
        "sp_or": f"SELECT DISTINCT did FROM tf WHERE tok IN ('merge', 'window')",
        "sp_and": f"SELECT did FROM ({merge_d}) INTERSECT SELECT did FROM ({window_d})",
        "sp_not": (f"SELECT did FROM ({merge_d}) UNION "
                   f"SELECT did FROM corpus WHERE did NOT IN ({window_d})"),
        "sp_phrase": ("SELECT DISTINCT t0.did AS did FROM ktp t0 "
                      "JOIN ktp t1 ON t1.did = t0.did "
                      "WHERE t0.tok = 'fast' AND t1.tok = 'key' "
                      "AND abs(t1.p - t0.p - 1) <= 1"),
        "sp_prefix": ("SELECT DISTINCT did FROM tf WHERE tok LIKE 'mer%' "
                      f"AND did IN ({window_d})"),
        "sp_fuzzy": ("SELECT DISTINCT did FROM tf "
                     "WHERE levenshtein(tok, 'mrge') <= 1 OR tok = 'spark'"),
        "sp_broken": "SELECT DISTINCT did FROM tf WHERE tok IN ('merge', 'window')",
    }
    parts = [
        f"\nSELECT '{qid}' AS query_id, CAST(did AS BIGINT) AS doc_id FROM ({body})"
        for qid, body in bodies.items()
    ]
    return prelude() + "," + _TOKPOS_CTES + " " + " UNION ALL ".join(parts)


SQL_FIELD_ANALYSIS = f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
base AS (
  SELECT doc_id, regexp_extract_all(text, '{TOKEN_RE_SQL}') AS ts FROM docs
),
posn AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(ts), 1))) AS i, ts
  FROM base
),
tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ts[i] AS term
  FROM posn WHERE len(ts) >= i AND length(ts[i]) <= 255
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, 'tokenize' AS stage, pos, term FROM tok
UNION ALL
SELECT CAST(doc_id AS BIGINT), 'lowercase', pos, lower(term) FROM tok
UNION ALL
SELECT CAST(doc_id AS BIGINT), 'stopfilter', pos, lower(term) FROM tok
WHERE lower(term) NOT IN ({STOPLIST_SQL})
ORDER BY doc_id, stage, pos
"""
