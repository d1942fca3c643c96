"""Expression compiler (lucene/expressions js subset): grammar, precedence,
scalar-libm evaluation, SQL rendering parity."""

import math

import numpy as np
import pytest

from lucene_solr_ray.search.expressions import (
    compile_expression,
    evaluate,
    to_sql,
)


def _ev(expr_str, **binds):
    binds.setdefault("_unused", 0.0)
    arrs = {k: np.array([v], dtype=np.float64) for k, v in binds.items()}
    return evaluate(compile_expression(expr_str), arrs)[0]


def test_precedence_and_assoc():
    assert _ev("2 + 3 * 4") == 14.0
    assert _ev("(2 + 3) * 4") == 20.0
    assert _ev("2 - 3 - 4") == -5.0  # left-assoc
    assert _ev("12 / 2 / 3") == 2.0
    assert _ev("-2 * 3") == -6.0


def test_functions_and_vars():
    assert _ev("ln(1.0 + x)", x=math.e - 1) == pytest.approx(1.0)
    assert _ev("max(a, b) + min(a, b)", a=3.0, b=5.0) == 8.0
    assert _ev("pow(x, 2) + sqrt(y)", x=3.0, y=16.0) == 13.0
    assert _ev("abs(-x)", x=7.5) == 7.5


def test_errors():
    with pytest.raises(ValueError):
        compile_expression("1 +")
    with pytest.raises(ValueError):
        compile_expression("nope(1)")
    with pytest.raises(ValueError):
        compile_expression("ln(1, 2)")
    with pytest.raises(ValueError):
        compile_expression("(1 + 2")


def test_sql_rendering_matches_duckdb():
    import duckdb

    expr = "0.3 * s + ln(1.0 + f) - 0.001 * f + max(s, 2.0)"
    ast = compile_expression(expr)
    py = _ev(expr, s=1.75, f=37.0)
    sql = to_sql(ast, {"s": "s", "f": "f"})
    got = duckdb.sql(f"SELECT {sql} AS v FROM (SELECT 1.75::DOUBLE AS s, 37.0::DOUBLE AS f)").fetchone()[0]
    assert got == py  # bit-exact: same association order, libm both sides


def test_zero_right_operand_does_not_divide():
    import numpy as np

    from lucene_solr_ray.search.expressions import compile_expression, evaluate

    # regression: the evaluator once computed a/b eagerly for every binary
    # node, raising ZeroDivisionError whenever the right operand was 0
    node = compile_expression("ln(1.0 + x)")
    out = evaluate(node, {"x": np.array([0.0, 1.0])})
    assert out[0] == 0.0 and out[1] > 0.0
