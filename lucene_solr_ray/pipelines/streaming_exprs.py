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
