"""DateMathParser goldens (solr/util/DateMathParser.java semantics)."""

from datetime import datetime

import pytest

from lucene_solr_ray.util.datemath import parse_date_math

NOW = datetime(2024, 1, 21, 13, 14, 15, 678000)


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("NOW", NOW),
        ("NOW/DAY", datetime(2024, 1, 21)),
        ("NOW/HOUR", datetime(2024, 1, 21, 13)),
        ("NOW/MINUTE", datetime(2024, 1, 21, 13, 14)),
        ("NOW/SECOND", datetime(2024, 1, 21, 13, 14, 15)),
        ("NOW/MONTH", datetime(2024, 1, 1)),
        ("NOW/YEAR", datetime(2024, 1, 1)),
        ("NOW/DAY-7DAYS", datetime(2024, 1, 14)),
        ("NOW+2HOURS/HOUR", datetime(2024, 1, 21, 15)),
        ("NOW/DAY+1MONTH", datetime(2024, 2, 21)),
        # Calendar.add clamps day-of-month
        ("2024-01-31T10:00:00Z/DAY+1MONTH", datetime(2024, 2, 29)),
        ("2023-01-31T00:00:00Z+1MONTH", datetime(2023, 2, 28)),
        ("2024-03-31T00:00:00Z-1MONTH", datetime(2024, 2, 29)),
        ("2024-01-31T10:00:00Z/DAY+1MONTH-12HOURS", datetime(2024, 2, 28, 12)),
        ("NOW-1YEAR/YEAR", datetime(2023, 1, 1)),
        ("NOW/DAY+6MONTHS+3DAYS", datetime(2024, 7, 24)),
        ("2024-01-21T13:14:15.678Z", NOW),
        ("NOW+90MINUTES/HOUR", datetime(2024, 1, 21, 14)),
        ("NOW/MILLI", datetime(2024, 1, 21, 13, 14, 15, 678000)),
    ],
)
def test_date_math(expr, expected):
    assert parse_date_math(expr, NOW) == expected


def test_date_math_errors():
    with pytest.raises(ValueError):
        parse_date_math("NOW/FORTNIGHT", NOW)
    with pytest.raises(ValueError):
        parse_date_math("NOW+DAYS", NOW)
    with pytest.raises(ValueError):
        parse_date_math("yesterday", NOW)
