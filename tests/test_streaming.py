"""Streaming-expression surface: parser golden tests (grammar mirrors
``StreamExpressionParser.java``), decorator semantics vs DuckDB, and
composition — modeled on ``StreamDecoratorTest.java``."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from lucene_solr_ray.streaming import parse_expression, run_expression
from lucene_solr_ray.streaming.parser import StreamExpression
from lucene_solr_ray.streaming.streams import parse_q, parse_sort_spec

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parse_basic_search():
    e = parse_expression('search(collection1, q=*:*, fl="id,a_s", sort="a_f asc, a_i asc")')
    assert e.name == "search"
    assert e.positionals == ["collection1"]
    assert e.named == {"q": "*:*", "fl": "id,a_s", "sort": "a_f asc, a_i asc"}


def test_parse_nested_and_trailing_comma():
    e = parse_expression(
        'rollup(search(c, q=*:*, fl="a_s,a_i", sort="a_s asc"), over="a_s", '
        "sum(a_i), count(*),)"
    )
    assert e.name == "rollup"
    subs = e.sub_expressions()
    assert [s.name for s in subs] == ["search", "sum", "count"]
    assert subs[1].positionals == ["a_i"]
    assert subs[2].positionals == ["*"]
    assert e.named["over"] == "a_s"


def test_parse_quoted_escapes_and_named_expression():
    e = parse_expression('having(search(c, q="id:(0 3 \\"x\\")", sort="a asc"), eq(a_i, 9))')
    assert e.sub_expressions()[0].named["q"] == 'id:(0 3 "x")'
    pred = e.sub_expressions()[1]
    assert pred.name == "eq" and pred.positionals == ["a_i", "9"]


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_expression("search(c")
    with pytest.raises(ValueError):
        parse_expression('search(c, q="unterminated)')
    with pytest.raises(ValueError):
        parse_expression("search(c)x")


def test_sort_spec():
    assert parse_sort_spec("a_f asc, a_i desc") == [("a_f", True), ("a_i", False)]
    assert parse_sort_spec("a_f") == [("a_f", True)]


def test_parse_q_subset():
    import pyarrow as pa

    sch = pa.schema([("k", pa.int64()), ("s", pa.string())])
    assert parse_q("*:*", sch) is None
    assert parse_q("k:5", sch) is not None
    assert parse_q("k:[2 TO 8] AND s:x", sch) is not None
    with pytest.raises(ValueError):
        parse_q("nope:1", sch)


# ---------------------------------------------------------------------------
# stream semantics vs DuckDB (sf0.001)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "part lineitem orders customer nation supplier events documents embeddings".split():
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_rollup_matches_sql(ray_session, con):
    t = run_expression(
        'rollup(search(lineitem, q=*:*, fl="l_returnflag,l_quantity", '
        'sort="l_returnflag asc"), over="l_returnflag", '
        "sum(l_quantity), avg(l_quantity), count(*))",
        SF,
    ).to_pandas().sort_values("l_returnflag").reset_index(drop=True)
    e = con.sql(
        "SELECT l_returnflag, sum(l_quantity) AS s, sum(l_quantity)/count(*) AS a, "
        "count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"
    ).df()
    assert list(t["sum(l_quantity)"]) == list(e["s"])
    assert list(t["avg(l_quantity)"]) == list(e["a"])
    assert list(t["count(*)"]) == list(e["n"])


def test_q_pushdown_range(ray_session, con):
    t = run_expression(
        'search(lineitem, q="l_quantity:{10 TO 20] AND l_returnflag:A", '
        'fl="l_orderkey,l_quantity", sort="l_orderkey asc")',
        SF,
    )
    n = con.sql(
        "SELECT count(*) FROM lineitem WHERE l_quantity > 10 AND l_quantity <= 20 "
        "AND l_returnflag = 'A'"
    ).fetchone()[0]
    assert t.num_rows == n


def test_inner_join_and_top(ray_session, con):
    t = run_expression(
        'top(innerJoin(search(orders, fl="o_orderkey,o_custkey", sort="o_custkey asc"), '
        'search(customer, fl="c_custkey,c_name", sort="c_custkey asc"), '
        'on="o_custkey=c_custkey"), n=7, sort="o_orderkey desc")'
        , SF,
    )
    e = con.sql(
        "SELECT o_orderkey, o_custkey, c_name FROM orders JOIN customer "
        "ON o_custkey=c_custkey ORDER BY o_orderkey DESC LIMIT 7"
    ).df()
    assert t.num_rows == 7
    # top() emits in comparator order
    assert t["o_orderkey"].to_pylist() == list(e["o_orderkey"])
    assert t["c_name"].to_pylist() == list(e["c_name"])


def test_left_outer_join_keeps_unmatched(ray_session, con):
    t = run_expression(
        'leftOuterJoin(search(customer, fl="c_custkey,c_name", sort="c_custkey asc"), '
        'search(orders, q="o_orderstatus:F", fl="o_custkey,o_orderkey", '
        'sort="o_custkey asc"), on="c_custkey=o_custkey")',
        SF,
    )
    n = con.sql(
        "SELECT count(*) FROM customer LEFT JOIN "
        "(SELECT * FROM orders WHERE o_orderstatus='F') o ON c_custkey=o_custkey"
    ).fetchone()[0]
    assert t.num_rows == n
    assert t["o_orderkey"].null_count > 0


def test_unique_picks_sort_order_first(ray_session, con):
    t = run_expression(
        'unique(search(events, fl="event_id,user_id", '
        'sort="user_id asc, event_id asc"), over="user_id")',
        SF,
    )
    e = con.sql(
        "SELECT user_id, min(event_id) AS event_id FROM events GROUP BY user_id"
    ).df()
    got = dict(zip(t["user_id"].to_pylist(), t["event_id"].to_pylist()))
    exp = dict(zip(e["user_id"], e["event_id"]))
    assert got == exp


def test_unique_desc_order(ray_session, con):
    t = run_expression(
        'unique(search(events, fl="event_id,user_id", '
        'sort="user_id asc, event_id desc"), over="user_id")',
        SF,
    )
    e = con.sql(
        "SELECT user_id, max(event_id) AS event_id FROM events GROUP BY user_id"
    ).df()
    got = dict(zip(t["user_id"].to_pylist(), t["event_id"].to_pylist()))
    assert got == dict(zip(e["user_id"], e["event_id"]))


def test_having_evaluator_tree(ray_session, con):
    t = run_expression(
        'having(search(events, fl="event_id,value", sort="event_id asc"), '
        "and(gt(value, 10), not(gteq(value, 100))))",
        SF,
    )
    n = con.sql("SELECT count(*) FROM events WHERE value > 10 AND value < 100").fetchone()[0]
    assert t.num_rows == n


def test_intersect_complement_partition(ray_session, con):
    inter = run_expression(
        'intersect(search(part, fl="p_partkey", sort="p_partkey asc"), '
        'search(lineitem, fl="l_partkey", sort="l_partkey asc"), '
        'on="p_partkey=l_partkey")',
        SF,
    )
    comp = run_expression(
        'complement(search(part, fl="p_partkey", sort="p_partkey asc"), '
        'search(lineitem, fl="l_partkey", sort="l_partkey asc"), '
        'on="p_partkey=l_partkey")',
        SF,
    )
    total = con.sql("SELECT count(*) FROM part").fetchone()[0]
    assert inter.num_rows + comp.num_rows == total


def test_select_renames_and_merge(ray_session):
    t = run_expression(
        'merge(select(search(nation, fl="n_nationkey,n_name", sort="n_nationkey asc"), '
        '"n_nationkey as k", "n_name as name"), '
        'select(search(region, fl="r_regionkey,r_name", sort="r_regionkey asc"), '
        '"r_regionkey as k", "r_name as name"), on="k asc")',
        SF,
    )
    assert t.column_names == ["k", "name"]
    assert t.num_rows == 30  # 25 nations + 5 regions
    assert t["k"].to_pylist() == sorted(t["k"].to_pylist())


def test_stats_stream(ray_session, con):
    t = run_expression('stats(lineitem, q="l_returnflag:A", sum(l_quantity), count(*))', SF)
    s, n = con.sql(
        "SELECT sum(l_quantity), count(*) FROM lineitem WHERE l_returnflag='A'"
    ).fetchone()
    assert t.num_rows == 1
    assert t["sum(l_quantity)"][0].as_py() == s
    assert t["count(*)"][0].as_py() == n


def test_tuple_merge_right_wins(ray_session):
    """Non-key column collisions: right stream's field survives
    (Tuple.merge semantics in BiJoinStream)."""
    t = run_expression(
        'innerJoin(search(nation, fl="n_nationkey,n_name,n_regionkey", '
        'sort="n_nationkey asc"), '
        'select(search(region, fl="r_regionkey,r_name", sort="r_regionkey asc"), '
        '"r_regionkey as n_regionkey2", "r_name as n_name"), '
        'on="n_regionkey=n_regionkey2")',
        SF,
    )
    # n_name collides → right (region name) wins
    assert set(t["n_name"].to_pylist()) <= {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    }


def test_timeseries_buckets_and_empties(ray_session, con):
    t = run_expression(
        'timeseries(events, q=*:*, field="ts", start="2024-01-01T00:00:00Z", '
        'end="2024-01-31T00:00:00Z", gap="+5DAYS", count(*))',
        SF,
    )
    assert t.num_rows == 6  # ceil(30/5)
    assert t["ts"][0].as_py() == "2024-01-01T00:00:00Z"
    n = con.sql(
        "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01' "
        "AND ts < TIMESTAMP '2024-01-31'"
    ).fetchone()[0]
    assert sum(t["count(*)"].to_pylist()) == n
    # far-future window → all-empty buckets still emitted with count 0
    empty = run_expression(
        'timeseries(events, q=*:*, field="ts", start="2030-01-01T00:00:00Z", '
        'end="2030-01-03T00:00:00Z", gap="+1DAY", count(*))',
        SF,
    )
    assert empty.num_rows == 2 and empty["count(*)"].to_pylist() == [0, 0]


def test_random_deterministic_sample(ray_session, con):
    a = run_expression('random(events, q=*:*, rows=9, fl="event_id,user_id", seed="s1")', SF)
    b = run_expression('random(events, q=*:*, rows=9, fl="event_id,user_id", seed="s1")', SF)
    c = run_expression('random(events, q=*:*, rows=9, fl="event_id,user_id", seed="s2")', SF)
    assert a.equals(b)
    assert a["event_id"].to_pylist() != c["event_id"].to_pylist()
    exp = con.sql(
        "SELECT event_id FROM events ORDER BY md5('s1|' || CAST(event_id AS VARCHAR)) LIMIT 9"
    ).df()
    assert a["event_id"].to_pylist() == list(exp["event_id"])


def test_knn_matches_mlt(ray_session):
    from lucene_solr_ray.pipelines.fulltext import get_searcher
    from lucene_solr_ray.search.mlt import mlt_search

    t = run_expression('knn(documents, id=5, qf="content", k=8)', SF)
    assert t.num_rows == 8
    assert 5 not in t["doc_id"].to_pylist()
    assert t["rank"].to_pylist() == list(range(8))


def test_significant_terms_scores(ray_session, con):
    """Engine scan vs a brute-force tokenization oracle (score formula from
    SignificantTermsQParserPlugin.java:209)."""
    from lucene_solr_ray.pipelines.streaming_exprs import sql_st_significant

    t = run_expression(
        'significantTerms(documents, q="merge", limit=12, minDocFreq=5, '
        "maxDocFreq=0.95, minTermLength=3)",
        SF,
    )
    exp = con.sql(sql_st_significant("merge", 12)).df()
    assert t["term"].to_pylist() == list(exp["term"])
    assert t["fg"].to_pylist() == list(exp["fg"])
    assert t["df"].to_pylist() == list(exp["df"])


def test_update_sink_writes_parquet(ray_session, con):
    import pyarrow.dataset as pads

    t = run_expression(
        'update(/tmp/lsr_test_update_sink, search(nation, fl="n_nationkey,n_name", '
        'sort="n_nationkey asc"))',
        SF,
    )
    assert t["batchIndexed"][0].as_py() == 25
    d = pads.dataset("/tmp/lsr_test_update_sink")
    assert d.count_rows() == 25
    # idempotent re-run: same count, no append-doubling
    t2 = run_expression(
        'update(/tmp/lsr_test_update_sink, search(nation, fl="n_nationkey,n_name", '
        'sort="n_nationkey asc"))',
        SF,
    )
    assert t2["batchIndexed"][0].as_py() == 25


def test_parallel_validates_partition_keys(ray_session):
    with pytest.raises(ValueError):
        run_expression(
            'parallel(search(nation, fl="n_name", sort="n_name asc"), '
            'partitionKeys="nope")',
            SF,
        )


def test_cartesian_product_explodes(ray_session, con):
    t = run_expression(
        'cartesianProduct(search(embeddings, q="vec_id:[0 TO 2]", '
        'fl="vec_id,embedding", sort="vec_id asc"), embedding)',
        SF,
    )
    n = con.sql(
        "SELECT sum(len(embedding)) FROM "
        f"'{SF}/embeddings.parquet' WHERE vec_id BETWEEN 0 AND 2"
    ).fetchone()[0]
    assert t.num_rows == n


# ---------------------------------------------------------------------------
# graph streams (io/graph/: GatherNodesStream, ShortestPathStream)
# ---------------------------------------------------------------------------

def test_nodes_literal_roots(ray_session, con):
    """nodes() with literal roots (`"v1,v2->field"`): one hop, distinct
    gathered nodes, level 1."""
    t = run_expression(
        'nodes(orders, walk="1,2->o_custkey", gather="o_orderkey")', SF
    )
    exp = con.sql(
        f"SELECT DISTINCT o_orderkey FROM '{SF}/orders.parquet' "
        "WHERE o_custkey IN (1, 2) ORDER BY o_orderkey"
    ).df()["o_orderkey"].tolist()
    assert t.column("node").to_pylist() == exp
    assert set(t.column("level").to_pylist()) == {1}


def test_nodes_metrics_and_level(ray_session, con):
    """Nested nodes(): the outer hop reads the inner's `node` column and
    aggregates count(*) per gathered node at level 2."""
    t = run_expression(
        'nodes(lineitem, nodes(orders, walk="1->o_custkey", gather="o_orderkey"), '
        'walk="node->l_orderkey", gather="l_suppkey", count(*))',
        SF,
    )
    exp = con.sql(
        f"""SELECT l_suppkey, count(*) AS c FROM '{SF}/lineitem.parquet'
        WHERE l_orderkey IN (SELECT o_orderkey FROM '{SF}/orders.parquet' WHERE o_custkey = 1)
        GROUP BY l_suppkey ORDER BY l_suppkey"""
    ).df()
    assert t.column("node").to_pylist() == exp["l_suppkey"].tolist()
    assert t.column("count(*)").to_pylist() == exp["c"].tolist()
    assert set(t.column("level").to_pylist()) == {2}


def test_shortest_paths_diamond_all_paths(ray_session):
    """All equal-length shortest paths are emitted (ShortestPathStream
    collects every one), and longer routes are ignored."""
    import pyarrow as pa

    from lucene_solr_ray.streaming.streams import shortest_paths

    #      1 -> 2 -> 4
    #      1 -> 3 -> 4       (two shortest, length 2)
    #      1 -> 5 -> 6 -> 4  (longer, ignored)
    edges = pa.table(
        {
            "src": pa.array([1, 1, 2, 3, 1, 5, 6], pa.int64()),
            "dst": pa.array([2, 3, 4, 4, 5, 6, 4], pa.int64()),
        }
    )
    t = shortest_paths(edges, 1, 4)
    assert t.column("path").to_pylist() == ["1->2->4", "1->3->4"]
    assert t.column("length").to_pylist() == [2, 2]


def test_shortest_paths_unreachable_and_max_depth(ray_session):
    import pyarrow as pa

    from lucene_solr_ray.streaming.streams import shortest_paths

    edges = pa.table(
        {"src": pa.array([1, 2, 3], pa.int64()), "dst": pa.array([2, 3, 4], pa.int64())}
    )
    assert shortest_paths(edges, 1, 99).num_rows == 0  # unreachable
    trivial = shortest_paths(edges, 1, 1)  # start == end: the depth-0 path
    assert trivial.column("path").to_pylist() == ["1"]
    assert trivial.column("length").to_pylist() == [0]
    assert shortest_paths(edges, 1, 4, max_depth=2).num_rows == 0  # depth cap
    t = shortest_paths(edges, 1, 4, max_depth=3)
    assert t.column("path").to_pylist() == ["1->2->3->4"]


def test_shortest_path_expression_form(ray_session):
    """shortestPath() over a parquet collection via the expression language
    (nation: n_nationkey -> n_regionkey is a 1-hop bipartite edge set)."""
    t = run_expression(
        'shortestPath(nation, from="6", to="1", edge="n_nationkey=n_regionkey", '
        "maxDepth=4)",
        SF,
    )
    assert t.column("path").to_pylist() == ["6->1"]
    assert t.column("length").to_pylist() == [1]


def test_score_nodes_idf_ordering(ray_session, con):
    """scoreNodes(): tf-idf node decoration — scores sorted desc, and a
    missing count(*) metric on the inner stream is rejected."""
    t = run_expression(
        'scoreNodes(nodes(lineitem, nodes(orders, walk="1,2->o_custkey", '
        'gather="o_orderkey"), walk="node->l_orderkey", gather="l_suppkey", '
        "count(*)), collection=lineitem, field=l_suppkey)",
        SF,
    )
    scores = t.column("nodeScore").to_pylist()
    assert scores == sorted(scores, reverse=True)
    assert t.num_rows > 0 and all(s > 0 for s in scores)
    with pytest.raises(ValueError):
        run_expression(
            'scoreNodes(nodes(orders, walk="1->o_custkey", gather="o_orderkey"), '
            "collection=orders, field=o_orderkey)",
            SF,
        )


def test_unique_group_first_null_keys():
    """UniqueStream kernel: adjacent null keys are ONE group (review r4 —
    fill_null(True) used to emit every null-keyed row), null-vs-value
    transitions still split, and empty-string keys are real groups."""
    import pyarrow as pa

    from lucene_solr_ray.streaming.streams import group_first

    t = pa.table({
        "k": pa.array([None, None, "a", "a", "", None, "b"]),
        "v": pa.array([5, 3, 2, 1, 9, 4, 7]),
    })
    out = group_first(t, ["k", "v"], [True, True], ["k"])
    got = {(r["k"], r["v"]) for r in out.to_pylist()}
    # one representative per distinct key incl. the null group and ""
    assert got == {("", 9), ("a", 1), ("b", 7), (None, 3)}


def test_unique_rejects_sort_not_leading_with_over():
    """UniqueStream.java:64-70 rejects substreams whose comparator does not
    lead with the equalitor fields; silently deduping runs would be wrong."""
    import pytest

    from lucene_solr_ray.streaming import run_expression

    with pytest.raises(ValueError, match="must lead"):
        run_expression(
            'unique(sort(search(orders, q=*:*, fl="o_custkey,o_totalprice",'
            ' sort="o_custkey asc"), by="o_totalprice asc"),'
            ' over="o_custkey")', "/root/testdata/sf0.001")
