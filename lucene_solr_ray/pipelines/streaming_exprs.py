"""Driver entries for the streaming-expression surface
(``lucene_solr_ray.streaming`` — Solr streaming expressions as Ray Data
pipelines; reference syntax from
``solr/solrj/src/test/.../StreamDecoratorTest.java``).

Each entry is one expression string run end-to-end through the parser +
stream factory, with a DuckDB twin for the CORRECTNESS gate. Float columns
pass through joins/filters unchanged (bit-exact), and the one aggregated
float column (``l_quantity``) is integer-valued in TPC-H, so float64 partial
sums are exact in any accumulation order.
"""

from __future__ import annotations

import pyarrow as pa

from ..streaming import run_expression

ST_ROLLUP_EXPR = (
    'rollup(search(lineitem, q=*:*, fl="l_returnflag,l_linestatus,l_quantity", '
    'sort="l_returnflag asc"), over="l_returnflag,l_linestatus", '
    "sum(l_quantity), min(l_quantity), max(l_quantity), avg(l_quantity), count(*))"
)


def st_rollup(sf_dir: str) -> pa.Table:
    """RollupStream over lineitem (TPC-H Q1 shape) via the expression
    language — combiner partials per block, one final combine."""
    return run_expression(ST_ROLLUP_EXPR, sf_dir)


SQL_ST_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)          AS "sum(l_quantity)",
       min(l_quantity)          AS "min(l_quantity)",
       max(l_quantity)          AS "max(l_quantity)",
       sum(l_quantity) / count(*) AS "avg(l_quantity)",
       CAST(count(*) AS BIGINT) AS "count(*)"
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


ST_JOIN_TOPK_EXPR = (
    'top(innerJoin(search(orders, q="o_orderstatus:F", '
    'fl="o_orderkey,o_custkey,o_totalprice", sort="o_custkey asc"), '
    'search(customer, fl="c_custkey,c_name,c_mktsegment", sort="c_custkey asc"), '
    'on="o_custkey=c_custkey"), n=20, sort="o_orderkey asc")'
)


def st_join_topk(sf_dir: str) -> pa.Table:
    """innerJoin (broadcast hash side) + RankStream top-n."""
    return run_expression(ST_JOIN_TOPK_EXPR, sf_dir)


SQL_ST_JOIN_TOPK = """
SELECT o_orderkey, o_custkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderstatus = 'F'
ORDER BY o_orderkey ASC LIMIT 20
"""


ST_UNIQUE_HAVING_EXPR = (
    'having(unique(search(events, q=*:*, fl="event_id,user_id,event_type,value", '
    'sort="user_id asc, event_id asc"), over="user_id"), gt(value, 50))'
)


def st_unique_having(sf_dir: str) -> pa.Table:
    """UniqueStream (sort-order-first tuple per key, associative per-block
    reduce) filtered by HavingStream evaluators."""
    return run_expression(ST_UNIQUE_HAVING_EXPR, sf_dir)


SQL_ST_UNIQUE_HAVING = """
WITH firsts AS (
  SELECT event_id, user_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
  FROM events
)
SELECT event_id, user_id, event_type, value
FROM firsts WHERE rn = 1 AND value > 50
"""


ST_FACET_EXPR = (
    'facet(documents, q=*:*, buckets="source,lang", '
    'bucketSorts="count(*) desc, source asc, lang asc", bucketSizeLimit=10, '
    "count(*), sum(n_chars))"
)


def st_facet(sf_dir: str) -> pa.Table:
    """FacetStream: aggregate pushed into the engine, bucket sort + limit."""
    return run_expression(ST_FACET_EXPR, sf_dir)


SQL_ST_FACET = """
SELECT source, lang,
       CAST(count(*) AS BIGINT)     AS "count(*)",
       CAST(sum(n_chars) AS BIGINT) AS "sum(n_chars)"
FROM documents GROUP BY source, lang
ORDER BY count(*) DESC, source ASC, lang ASC LIMIT 10
"""


ST_COMPLEMENT_EXPR = (
    'complement(search(part, fl="p_partkey,p_brand", sort="p_partkey asc"), '
    'search(lineitem, q="l_quantity:[* TO 5]", fl="l_partkey", '
    'sort="l_partkey asc"), on="p_partkey=l_partkey")'
)


def st_complement(sf_dir: str) -> pa.Table:
    """ComplementStream: parts never sold in small quantities (broadcast
    anti-join on the key column only; q range pushed to the right-side
    scan)."""
    return run_expression(ST_COMPLEMENT_EXPR, sf_dir)


SQL_ST_COMPLEMENT = """
SELECT p_partkey, p_brand FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity <= 5)
"""


ST_FETCH_ROLLUP_EXPR = (
    'rollup(fetch(nation, search(supplier, fl="s_suppkey,s_nationkey", '
    'sort="s_nationkey asc"), on="s_nationkey=n_nationkey", fl="n_name"), '
    'over="n_name", count(*))'
)


def st_fetch_rollup(sf_dir: str) -> pa.Table:
    """FetchStream field decoration composed under a rollup: suppliers per
    nation name."""
    return run_expression(ST_FETCH_ROLLUP_EXPR, sf_dir)


SQL_ST_FETCH_ROLLUP = """
SELECT n_name, CAST(count(*) AS BIGINT) AS "count(*)"
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


ST_TIMESERIES_EXPR = (
    'timeseries(events, q=*:*, field="ts", start="2024-01-01T00:00:00Z", '
    'end="2024-01-31T00:00:00Z", gap="+2DAYS", count(*), min(value), max(value))'
)


def st_timeseries(sf_dir: str) -> pa.Table:
    """TimeSeriesStream: fixed-gap date buckets with metrics; empty buckets
    emitted (count 0, metrics null)."""
    return run_expression(ST_TIMESERIES_EXPR, sf_dir)


SQL_ST_TIMESERIES = """
WITH b AS (
  SELECT unnest(range(TIMESTAMP '2024-01-01 00:00:00',
                      TIMESTAMP '2024-01-31 00:00:00', INTERVAL 2 DAY)) AS lo
),
agg AS (
  SELECT lo, count(e.event_id) AS c, min(e.value) AS mn, max(e.value) AS mx
  FROM b LEFT JOIN events e ON e.ts >= b.lo AND e.ts < b.lo + INTERVAL 2 DAY
  GROUP BY lo
)
SELECT strftime(lo, '%Y-%m-%dT%H:%M:%SZ') AS ts,
       CAST(c AS BIGINT) AS "count(*)", mn AS "min(value)", mx AS "max(value)"
FROM agg ORDER BY lo
"""


ST_RANDOM_EXPR = 'random(events, q="event_type:click", rows=25, fl="event_id,user_id", seed="7")'


def st_random(sf_dir: str) -> pa.Table:
    """RandomStream: deterministic md5-order sample (distributed hash-order
    top-k; the reference's random_<seed> sort field analog)."""
    return run_expression(ST_RANDOM_EXPR, sf_dir)


SQL_ST_RANDOM = """
SELECT event_id, user_id FROM events WHERE event_type = 'click'
ORDER BY md5('7|' || CAST(event_id AS VARCHAR)) LIMIT 25
"""


ST_KNN_ID = 7
ST_KNN_EXPR = f'knn(documents, id={ST_KNN_ID}, qf="content", k=10)'


def st_knn(sf_dir: str) -> pa.Table:
    """KnnStream: MoreLikeThis neighbors of one doc via the index."""
    return run_expression(ST_KNN_EXPR, sf_dir)


ST_SIG_EXPR = (
    'significantTerms(documents, q="merge", limit=20, minDocFreq=5, '
    "maxDocFreq=0.95, minTermLength=3)"
)


def st_significant(sf_dir: str) -> pa.Table:
    """significantTerms: foreground-vs-background term scan over the index
    (full postings decode, combiner partials)."""
    return run_expression(ST_SIG_EXPR, sf_dir)


def sql_st_significant(qterm: str = "merge", limit: int = 20, min_df: int = 5,
                       max_frac: float = 0.95, min_len: int = 3) -> str:
    """Oracle: SignificantTermsQParserPlugin.java:209 score
    log(fg)*(log((numDocs+1)/(df+1))+1), rank by (round(score,6) desc,
    term asc)."""
    from . import fulltext_sql as _fs

    return _fs.prelude() + f""",
fgd AS (SELECT DISTINCT did FROM tf WHERE tok = '{qterm}'),
cand AS (
  SELECT t.tok, i.df, count(*) AS fg
  FROM tf t JOIN idf i USING (tok) JOIN fgd USING (did)
  WHERE length(t.tok) >= {min_len}
  GROUP BY t.tok, i.df
),
flt AS (
  SELECT tok, df, fg,
         round(ln(fg) * (ln(((SELECT dc FROM stats) + 1) / CAST(df + 1 AS DOUBLE)) + {1.0!r}), 6) AS sc
  FROM cand
  WHERE fg > 0 AND df >= {min_df} AND df <= {max_frac!r} * (SELECT dc FROM stats)
)
SELECT CAST(row_number() OVER (ORDER BY sc DESC, tok ASC) - 1 AS BIGINT) AS rank,
       tok AS term, CAST(fg AS BIGINT) AS fg, CAST(df AS BIGINT) AS df
FROM flt ORDER BY sc DESC, tok ASC LIMIT {limit}
"""


ST_UPDATE_DEST = "/tmp/lsr_st_update_out"
ST_UPDATE_EXPR = (
    f'update({ST_UPDATE_DEST}, search(orders, q="o_orderstatus:F", '
    'fl="o_orderkey,o_totalprice", sort="o_orderkey asc"))'
)


def st_update(sf_dir: str) -> pa.Table:
    """UpdateStream sink: write the stream to partitioned parquet (one file
    per block → resumable output), emit the indexed-count ack."""
    return run_expression(ST_UPDATE_EXPR, sf_dir)


SQL_ST_UPDATE = """
SELECT CAST(count(*) AS BIGINT) AS batchIndexed FROM orders WHERE o_orderstatus = 'F'
"""


ST_CARTESIAN_EXPR = (
    'parallel(cartesianProduct(search(embeddings, q="vec_id:[0 TO 9]", '
    'fl="vec_id,embedding", sort="vec_id asc"), embedding), '
    'partitionKeys="vec_id")'
)


def st_cartesian(sf_dir: str) -> pa.Table:
    """CartesianProductStream under parallel(): one tuple per list element."""
    return run_expression(ST_CARTESIAN_EXPR, sf_dir)


SQL_ST_CARTESIAN = """
SELECT vec_id, unnest(embedding) AS embedding
FROM embeddings WHERE vec_id BETWEEN 0 AND 9
"""


# 3-hop chained join: customer → nation → region, rolled up per region —
# the multi-hop dimension-decoration shape (every TPC-H table family member
# now has a streaming-expression consumer)
ST_REGION_ROLLUP_EXPR = (
    'rollup(fetch(region, fetch(nation, '
    'search(customer, fl="c_custkey,c_nationkey", sort="c_nationkey asc"), '
    'on="c_nationkey=n_nationkey", fl="n_regionkey"), '
    'on="n_regionkey=r_regionkey", fl="r_name"), '
    'over="r_name", count(*))'
)


def st_region_rollup(sf_dir: str) -> pa.Table:
    """Chained FetchStream hops (customer→nation→region) under a rollup:
    customers per region name."""
    return run_expression(ST_REGION_ROLLUP_EXPR, sf_dir)


SQL_ST_REGION_ROLLUP = """
SELECT r_name, CAST(count(*) AS BIGINT) AS "count(*)"
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# --- graph streams (io/graph/: GatherNodesStream, ShortestPathStream) ---

# two-hop BFS: BUILDING customers → their orders → suppliers that shipped
# them, with per-supplier edge counts at the leaves
ST_NODES_EXPR = (
    'nodes(lineitem, '
    'nodes(orders, '
    'search(customer, q="c_mktsegment:BUILDING", fl="c_custkey", sort="c_custkey asc"), '
    'walk="c_custkey->o_custkey", gather="o_orderkey"), '
    'walk="node->l_orderkey", gather="l_suppkey", count(*))'
)


def st_nodes(sf_dir: str) -> pa.Table:
    """gatherNodes / nodes(): breadth-first graph hops, each one a broadcast
    frontier + predicate-pushdown scan (zero shuffle) with combiner-pattern
    per-node metrics."""
    return run_expression(ST_NODES_EXPR, sf_dir)


SQL_ST_NODES = """
WITH roots AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
h1 AS (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM roots)
)
SELECT CAST(l_suppkey AS BIGINT) AS node,
       CAST(count(*) AS BIGINT)  AS "count(*)",
       CAST(2 AS BIGINT)         AS level
FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM h1)
GROUP BY l_suppkey ORDER BY node
"""


ST_SCORE_NODES_EXPR = (
    f"scoreNodes({ST_NODES_EXPR}, collection=lineitem, field=l_suppkey)"
)


def st_score_nodes(sf_dir: str) -> pa.Table:
    """scoreNodes(): tf-idf relevance over gathered graph nodes —
    nodeScore = gathered count × ln((N+1)/(df+1)), df from a pruned
    frontier-filtered scan. Bit-exact float64 oracle (one ln per node)."""
    return run_expression(ST_SCORE_NODES_EXPR, sf_dir)


SQL_ST_SCORE_NODES = """
WITH roots AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
h1 AS (
  SELECT DISTINCT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM roots)
),
g AS (
  SELECT l_suppkey AS node, count(*) AS c
  FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM h1)
  GROUP BY l_suppkey
),
df AS (
  SELECT l_suppkey AS node, count(*) AS df FROM lineitem
  WHERE l_suppkey IN (SELECT node FROM g) GROUP BY l_suppkey
),
n AS (SELECT count(*) AS nr FROM lineitem)
SELECT CAST(g.node AS BIGINT) AS node,
       CAST(g.c AS BIGINT)    AS "count(*)",
       CAST(2 AS BIGINT)      AS level,
       CAST(g.c AS DOUBLE) * ln((CAST((SELECT nr FROM n) AS DOUBLE) + 1)
                                 / (CAST(df.df AS DOUBLE) + 1)) AS nodeScore
FROM g JOIN df USING (node) ORDER BY nodeScore DESC, node ASC
"""


SP_CUST = 1  # walk customer 1's order-succession chain end to end
SP_MAX_DEPTH = 64


def _order_chain_edges(sf_dir: str):
    """Directed edge relation over orders: (src, dst) = consecutive orders of
    the same customer in (o_orderdate, o_orderkey) order — sparse disjoint
    chains derived with one groupby (partials = 3 pruned columns)."""
    from ..streaming.streams import _sized_parquet

    ds = _sized_parquet(
        f"{sf_dir}/orders.parquet", ["o_orderkey", "o_custkey", "o_orderdate"], None
    )

    def pairs(group: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group,
            sort_keys=[("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
        )
        a = group["o_orderkey"].take(idx).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": pa.array(a[:-1], pa.int64()), "dst": pa.array(a[1:], pa.int64())}
        )

    return ds.groupby("o_custkey").map_groups(pairs, batch_format="pyarrow")


def graph_shortest_path(sf_dir: str) -> pa.Table:
    """shortestPath(): frontier-broadcast BFS over the derived order-chain
    edges, from customer SP_CUST's first order to their last; emits every
    shortest path as ``a->b->c`` plus its hop count."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..streaming.streams import shortest_paths

    t = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    t = t.filter(pc.equal(t["o_custkey"], SP_CUST))
    idx = pc.sort_indices(
        t, sort_keys=[("o_orderdate", "ascending"), ("o_orderkey", "ascending")]
    )
    keys = t["o_orderkey"].take(idx)
    if len(keys) == 0:  # customer has no orders — the oracle returns 0 rows
        return pa.table(
            {"path": pa.array([], pa.string()), "length": pa.array([], pa.int64())}
        )
    start, end = keys[0].as_py(), keys[len(keys) - 1].as_py()
    return shortest_paths(
        _order_chain_edges(sf_dir), start, end, max_depth=SP_MAX_DEPTH
    )


SQL_GRAPH_SHORTEST_PATH = f"""
WITH RECURSIVE
e AS (
  SELECT o_orderkey AS src,
         lead(o_orderkey) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS dst
  FROM orders
),
ed AS (SELECT DISTINCT src, dst FROM e WHERE dst IS NOT NULL),
sp AS (SELECT o_orderkey AS k FROM orders WHERE o_custkey = {SP_CUST}
       ORDER BY o_orderdate, o_orderkey LIMIT 1),
ep AS (SELECT o_orderkey AS k FROM orders WHERE o_custkey = {SP_CUST}
       ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1),
walk(node, path, depth) AS (
  SELECT k, [k], 0 FROM sp
  UNION ALL
  SELECT ed.dst, list_append(walk.path, ed.dst), walk.depth + 1
  FROM walk JOIN ed ON ed.src = walk.node
  WHERE walk.depth < {SP_MAX_DEPTH} AND NOT list_contains(walk.path, ed.dst)
),
hits AS (SELECT path, depth FROM walk WHERE node = (SELECT k FROM ep))
SELECT array_to_string(path, '->') AS path, CAST(depth AS BIGINT) AS length
FROM hits WHERE depth = (SELECT min(depth) FROM hits) ORDER BY path
"""


# ---------------------------------------------------------------------------
# Parallel SQL handler (solr/core/.../handler/sql/ — SQL lowered onto
# streaming expressions, SolrTable/SolrAggregate/SolrFilter/SolrSort rules)
# ---------------------------------------------------------------------------

# avg over l_quantity (small integers in double): the partial sums are
# integer-exact, so the parallel combine matches DuckDB's sequential sum
# bit-for-bit (l_extendedprice's fractional sums are float-order-dependent)
SQL_GROUPBY_STMT = (
    "SELECT l_returnflag, sum(l_quantity) AS sum_qty, "
    "avg(l_quantity) AS avg_qty, count(*) AS cnt "
    "FROM lineitem WHERE l_quantity < 30 GROUP BY l_returnflag "
    "HAVING count(*) > 10 ORDER BY l_returnflag ASC"
)
SQL_SELECT_STMT = (
    "SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 100000 "
    "ORDER BY o_totalprice DESC, o_custkey ASC LIMIT 20"
)
SQL_DISTINCT_STMT = "SELECT DISTINCT c_nationkey FROM customer ORDER BY c_nationkey ASC"
SQL_STATS_STMT = (
    "SELECT count(*) AS cnt, min(l_discount) AS min_disc, max(l_tax) AS max_tax "
    "FROM lineitem"
)


def st_sql_groupby(sf_dir: str):
    """Parallel SQL: GROUP BY + HAVING lowered to
    rollup(search(sort=keys)) -> having -> select -> sort."""
    from ..streaming.sql import run_sql

    return run_sql(SQL_GROUPBY_STMT, sf_dir)


def st_sql_select(sf_dir: str):
    """Parallel SQL: WHERE pushdown (q param -> parquet filter) + ORDER BY +
    LIMIT lowered to top(search(...))."""
    from ..streaming.sql import run_sql

    return run_sql(SQL_SELECT_STMT, sf_dir)


def st_sql_distinct(sf_dir: str):
    """Parallel SQL: SELECT DISTINCT lowered to unique(search(...))."""
    from ..streaming.sql import run_sql

    return run_sql(SQL_DISTINCT_STMT, sf_dir)


def st_sql_stats(sf_dir: str):
    """Parallel SQL: bare aggregates lowered to stats(collection, metrics)."""
    from ..streaming.sql import run_sql

    return run_sql(SQL_STATS_STMT, sf_dir)


#: oracles are the statements themselves (CAST count to BIGINT: DuckDB's
#: count(*) is already BIGINT; sums over doubles stay double on both sides)
SQL_ST_SQL_GROUPBY = SQL_GROUPBY_STMT
SQL_ST_SQL_SELECT = SQL_SELECT_STMT
SQL_ST_SQL_DISTINCT = SQL_DISTINCT_STMT
SQL_ST_SQL_STATS = SQL_STATS_STMT


# ---------------------------------------------------------------------------
# Streaming ML (FeaturesSelectionStream / TextLogitStream)
# ---------------------------------------------------------------------------

ML_NUM_TERMS = 15
ML_ITERATIONS = 8
ML_ALPHA = 0.05


def st_features(sf_dir: str):
    """features(): distributed IGain term selection over documents.text with
    outcome lang == 'en' (IGainTermsQParserPlugin math incl. the
    numDocs-docFreq+1 quirk; idf_d per FeaturesSelectionStream)."""
    from ..streaming.mlstreams import features_select

    return features_select(sf_dir, "documents", "text", "lang", "en", ML_NUM_TERMS)


def st_train_logreg(sf_dir: str):
    """train(): TextLogitStream shard protocol — per-partition sequential
    gradient passes, federated weight averaging per iteration. Iterative →
    rows-only driver check; convergence pinned by pytest."""
    from ..streaming.mlstreams import train_logreg

    return train_logreg(sf_dir, "documents", "text", "lang", "en",
                        num_terms=ML_NUM_TERMS, iterations=ML_ITERATIONS,
                        alpha=ML_ALPHA)


def _sql_entropy(p: str) -> str:
    return (f"CASE WHEN ({p}) <= 0 OR ({p}) >= 1 THEN 0.0 "
            f"ELSE -({p}) * ln({p}) - (1.0 - ({p})) * ln(1.0 - ({p})) END")


def sql_st_features(num_terms: int = ML_NUM_TERMS) -> str:
    """Exact IGain oracle: same tokenization chain as the engine analyzer
    (lower, \\w+, len<=255, stopwords), same formula and tie-break."""
    from .fulltext_sql import STOPLIST_SQL, TOKEN_RE_SQL

    hc = _sql_entropy("(SELECT np FROM st) * 1.0 / (SELECT nd FROM st)")
    hin = _sql_entropy("xc * 1.0 / df")
    hout = _sql_entropy("((SELECT np FROM st) - xc) * 1.0 / ((SELECT nd FROM st) - df + 1)")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '{TOKEN_RE_SQL}')) AS tok
  FROM documents
),
kept AS (
  SELECT DISTINCT doc_id, lang, tok FROM toks
  WHERE length(tok) <= 255 AND tok NOT IN ({STOPLIST_SQL})
),
st AS (
  SELECT count(*) AS nd, count(*) FILTER (lang = 'en') AS np FROM documents
),
ts AS (
  SELECT tok, count(*) AS df, count(*) FILTER (lang = 'en') AS xc
  FROM kept GROUP BY tok
),
scored AS (
  SELECT tok AS term,
         ({hc}) - ((df * 1.0 / (SELECT nd FROM st)) * ({hin})
                   + (1.0 - df * 1.0 / (SELECT nd FROM st)) * ({hout})) AS score,
         ln((SELECT nd FROM st) * 1.0 / (df + 1.0)) AS idf_d
  FROM ts
)
SELECT CAST(row_number() OVER (ORDER BY score DESC, term ASC) - 1 AS BIGINT) AS rank,
       term, score, idf_d
FROM scored ORDER BY score DESC, term ASC LIMIT {num_terms}
"""
