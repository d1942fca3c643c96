"""Solr date math — ``solr/core/src/java/org/apache/solr/util/DateMathParser.java``.

Grammar: an optional explicit UTC instant (``2024-03-01T00:00:00Z``) or
``NOW``, followed by any sequence of

- ``/UNIT``   — round DOWN to the unit (zero every smaller field)
- ``+N UNIT`` / ``-N UNIT`` — calendar arithmetic (months/years clamp the
  day-of-month exactly like ``Calendar.add``)

Units (CALENDAR_UNITS): YEAR(S), MONTH(S), DAY(S)/DATE(S), HOUR(S),
MINUTE(S)/MINUTES, SECOND(S)/SECONDS, MILLI(S)/MILLISECOND(S).

All math is UTC (the reference defaults to UTC unless a TZ param is set).
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta

_UNIT = {
    "YEAR": "year", "YEARS": "year",
    "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day", "DATES": "day",
    "HOUR": "hour", "HOURS": "hour",
    "MINUTE": "minute", "MINUTES": "minute",
    "SECOND": "second", "SECONDS": "second",
    "MILLI": "milli", "MILLIS": "milli",
    "MILLISECOND": "milli", "MILLISECONDS": "milli",
}

_OP = re.compile(r"/([A-Z]+)|([+-])(\d+)([A-Z]+)")


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    if unit == "milli":
        return dt.replace(microsecond=dt.microsecond // 1000 * 1000)
    raise ValueError(unit)


def _add(dt: datetime, n: int, unit: str) -> datetime:
    if unit == "year":
        return _add(dt, 12 * n, "month")
    if unit == "month":
        total = dt.year * 12 + (dt.month - 1) + n
        y, m = divmod(total, 12)
        m += 1
        # Calendar.add clamps day-of-month (Jan 31 + 1MONTH = Feb 29/28)
        day = min(dt.day, calendar.monthrange(y, m)[1])
        return dt.replace(year=y, month=m, day=day)
    delta = {
        "day": timedelta(days=n),
        "hour": timedelta(hours=n),
        "minute": timedelta(minutes=n),
        "second": timedelta(seconds=n),
        "milli": timedelta(milliseconds=n),
    }[unit]
    return dt + delta


def parse_date_math(expr: str, now: datetime) -> datetime:
    """Evaluate a Solr date-math expression relative to ``now`` (UTC naive)."""
    expr = expr.strip()
    if expr.startswith("NOW"):
        dt, rest = now, expr[3:]
    else:
        m = re.match(r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?)Z?", expr)
        if not m:
            raise ValueError(f"bad date math base: {expr!r}")
        dt = datetime.fromisoformat(m.group(1))
        rest = expr[m.end():]
    pos = 0
    while pos < len(rest):
        m = _OP.match(rest, pos)
        if not m:
            raise ValueError(f"bad date math op at {rest[pos:]!r} in {expr!r}")
        if m.group(1):  # /UNIT round
            unit = _UNIT.get(m.group(1))
            if unit is None:
                raise ValueError(f"unknown unit {m.group(1)!r}")
            dt = _round_down(dt, unit)
        else:
            unit = _UNIT.get(m.group(4))
            if unit is None:
                raise ValueError(f"unknown unit {m.group(4)!r}")
            n = int(m.group(3)) * (1 if m.group(2) == "+" else -1)
            dt = _add(dt, n, unit)
        pos = m.end()
    return dt
