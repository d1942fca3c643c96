"""Solr analytics contrib analog (pipelines/analytics.py): expression
parser/compiler unit tests + DuckDB-exact parity for every driver entry.

Reference semantics pinned here:
- percentile ordinal = round(p·size − .5) ≡ floor(p·size)
  (solr/contrib/analytics .../reduction/data/SortedListCollector.java:197)
- ordinal(k) index = k−1 / size+k (SortedListCollector.java:200-205)
- median of even-size numeric list = mean of two middles
  (MedianFunction.java:166-173)
- fill_missing / filter / remove / exists missing-propagation
  (function/mapping/{FillMissingFunction,FilterFunction,RemoveFunction,
  ExistsFunction}.java)
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from lucene_solr_ray.pipelines import analytics as an

SF = "/root/testdata/sf0.001"


# ----------------------------- parser ------------------------------------


def test_parse_nested_call():
    ast = an.parse_expr("sum(mult(n_chars, 2))")
    assert ast == ("call", "sum", [("call", "mult", [("field", "n_chars"), ("const", 2)])])


def test_parse_string_and_float_consts():
    assert an.parse_expr("concat_sep('|', lang, source)")[2][0] == ("const", "|")
    assert an.parse_expr("percentile(99.9, n_chars)")[2][0] == ("const", 99.9)
    assert an.parse_expr("ordinal(-3, n_chars)")[2][0] == ("const", -3)


def test_parse_rejects_bad_input():
    with pytest.raises(ValueError):
        an.parse_expr("sum(n_chars")
    with pytest.raises(ValueError):
        an.parse_expr("sum(n_chars) trailing")
    with pytest.raises(ValueError):
        an.split_reduction("mult(n_chars, 2)")  # no reduction at top


# ------------------------- mapping semantics ------------------------------


def _df():
    return pd.DataFrame(
        {
            "x": [1.0, 2.0, None, 4.0],
            "s": ["a", "b", None, "a"],
        }
    )


def _ev(expr):
    return an.eval_mapping(an.parse_expr(expr), _df())


def test_missing_propagates_through_arithmetic():
    vals, ok = _ev("add(mult(x, 2), 1)")
    assert list(ok) == [True, True, False, True]
    assert vals[0] == 3.0 and vals[3] == 9.0


def test_fill_missing_and_exists():
    vals, ok = _ev("fill_missing(x, -1)")
    assert list(ok) == [True, True, True, True]
    assert vals[2] == -1.0
    vals, ok = _ev("exists(x)")
    assert list(ok) == [True] * 4
    assert list(vals) == [True, True, False, True]


def test_filter_and_remove():
    _, ok = _ev("filter(x, gt(x, 1))")
    assert list(ok) == [False, True, False, True]
    _, ok = _ev("remove(s, 'a')")
    assert list(ok) == [False, True, False, False]


def test_if_selects_branch_validity():
    # if(cond, x, 0): rows where cond picks the missing branch are missing
    vals, ok = _ev("if(gt(fill_missing(x, 10), 3), x, 0)")
    assert list(ok) == [True, True, False, True]
    assert vals[0] == 0.0 and vals[3] == 4.0


def test_top_bottom_rowwise():
    vals, _ = _ev("top(x, 2.5)")
    assert list(vals[[0, 1, 3]]) == [2.5, 2.5, 4.0]
    vals, _ = _ev("bottom(x, 2.5)")
    assert list(vals[[0, 1, 3]]) == [1.0, 2.0, 2.5]


# ------------------------ reduction index math ----------------------------


def test_percentile_ordinal_reference_index():
    # 10 sorted values 0..9: p50 → ordinal round(.5·10 − .5) = 5 → value 5
    st = {float(v): 1 for v in range(10)}
    assert an._finalize("percentile", (0.5,), st) == 5.0
    assert an._finalize("percentile", (0.9,), st) == 9.0
    assert an._finalize("ordinal", (1,), st) == 0.0
    assert an._finalize("ordinal", (-1,), st) == 9.0
    assert an._finalize("median", (), st) == 4.5  # even: (4+5)/2
    st[10.0] = 1
    assert an._finalize("median", (), st) == 5.0  # odd: middle


def test_histogram_partials_merge_exact():
    a = an._partial("median", (), np.array([1.0, 2.0, 2.0]), np.ones(3, bool), None)
    b = an._partial("median", (), np.array([2.0, 3.0]), np.ones(2, bool), None)
    merged = an._merge("median", a, b)
    assert merged == {1.0: 1, 2.0: 3, 3.0: 1}
    assert an._finalize("median", (), merged) == 2.0


def test_moment_partials_are_exact_ints_for_int_streams():
    p = an._partial("sum", (), np.array([3.0, 4.0]), np.ones(2, bool), None)
    assert p == (2, 7, 25) and isinstance(p[1], int)


# --------------------------- oracle parity --------------------------------

ENTRIES = [
    ("an_ungrouped", an.SQL_AN_UNGROUPED),
    ("an_value_facet", an.SQL_AN_VALUE_FACET),
    ("an_range_facet", an.SQL_AN_RANGE_FACET),
    ("an_pivot_facet", an.SQL_AN_PIVOT_FACET),
    ("an_mapping_row", an.SQL_AN_MAPPING_ROW),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return c


@pytest.mark.parametrize("name,sql", ENTRIES)
def test_analytics_matches_oracle_exactly(ray_session, con, name, sql):
    got = getattr(an, name)(SF).to_pandas()
    exp = con.sql(sql).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)


def test_string_of_nullable_int_column_no_crash():
    """string() over a nullable numeric column: NaN slots must not reach
    int() (review r4 — `int(nan)` ValueError); invalid rows stay masked."""
    vals, ok = _ev("string(x)")
    assert list(ok) == [True, True, False, True]
    assert [v for v, o in zip(vals, ok) if o] == ["1", "2", "4"]


def test_concat_sep_empty_string_part():
    """concat_sep: an EMPTY first part still contributes its separator —
    '' + sep + next, matching the reference ConcatFunction and the SQL
    `a || sep || b` (review r4: out=='' misdetected continuation rows)."""
    df = pd.DataFrame({"a": ["", "x"], "b": ["y", "z"]})
    vals, ok = an.eval_mapping(an.parse_expr("concat_sep('|', a, b)"), df)
    assert list(vals) == ["|y", "x|z"]
    assert list(ok) == [True, True]
