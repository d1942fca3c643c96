"""Parallel SQL handler (solr/core/.../handler/sql/): SQL compiled onto
streaming expressions, mirroring the reference's Calcite lowering
(SolrTable builds search/rollup/stats/unique streams; SolrFilter pushes
WHERE into q; SolrSort lowers ORDER BY/LIMIT)."""

import duckdb
import pandas as pd
import pytest

from lucene_solr_ray.streaming.sql import run_sql, sql_to_stream

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "customer", "events")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _check(sql: str, con, ray_session):
    got = run_sql(sql, SF).to_pandas()
    want = con.sql(sql).df()
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )
    return got


def test_where_pushdown_shapes():
    s = sql_to_stream(
        "SELECT a, b FROM orders WHERE a > 5 AND b = 'x' AND c <= 3 "
        "ORDER BY a ASC LIMIT 5"
    )
    assert 'q="a:{5 TO *] AND b:x AND c:[* TO 3]"' in s
    assert s.startswith("top(")


def test_groupby_lowering_shape():
    s = sql_to_stream(
        "SELECT k, sum(v) AS sv FROM events GROUP BY k ORDER BY k ASC"
    )
    assert "rollup(search(events," in s and 'over="k"' in s
    assert 'select(' in s and "sum(v) as sv" in s
    assert s.startswith("sort(")


def test_select_where_order_limit(con, ray_session):
    _check(
        "SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 50000 "
        "ORDER BY o_totalprice DESC, o_custkey ASC LIMIT 15",
        con, ray_session,
    )


def test_group_by_having(con, ray_session):
    got = _check(
        "SELECT l_returnflag, l_linestatus, count(*) AS cnt, max(l_quantity) AS mx "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus "
        "HAVING count(*) > 5 ORDER BY l_returnflag ASC, l_linestatus ASC",
        con, ray_session,
    )
    assert len(got) >= 2


def test_distinct(con, ray_session):
    _check(
        "SELECT DISTINCT event_type FROM events ORDER BY event_type ASC",
        con, ray_session,
    )


def test_bare_aggregates(con, ray_session):
    got = _check(
        "SELECT count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi "
        "FROM orders", con, ray_session,
    )
    assert len(got) == 1


def test_errors():
    with pytest.raises(ValueError, match="LIMIT requires ORDER BY"):
        sql_to_stream("SELECT a FROM t LIMIT 5")
    with pytest.raises(ValueError, match="GROUP BY without aggregates"):
        sql_to_stream("SELECT a FROM t GROUP BY a ORDER BY a ASC")
    with pytest.raises(ValueError, match="HAVING requires GROUP BY"):
        sql_to_stream("SELECT count(*) AS c FROM t HAVING count(*) > 5")
    with pytest.raises(ValueError, match="require GROUP BY"):
        # bare column + aggregate without GROUP BY: previously lowered to a
        # stats() stream projecting a column stats never emits
        sql_to_stream("SELECT a, count(*) AS c FROM t")
    with pytest.raises(ValueError, match="WHERE literal"):
        sql_to_stream("SELECT a FROM t WHERE b = 'x AND y' ORDER BY a ASC")
    with pytest.raises(ValueError, match="GROUP BY"):
        sql_to_stream("SELECT a, b, sum(c) AS s FROM t GROUP BY a ORDER BY a ASC")
    with pytest.raises(ValueError):
        sql_to_stream("SELECT a FROM t WHERE a <> 3 ORDER BY a ASC")
    with pytest.raises(ValueError, match="unknown collection"):
        run_sql("SELECT a FROM nosuch ORDER BY a ASC", SF)
