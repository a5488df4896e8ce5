"""Date/time helpers with the reference's (= pandas) conventions.

The big semantic trap (SURVEY.md §2.7 D7): pandas ``dt.dayofweek`` is
Monday=0..Sunday=6 while Spark ``dayofweek`` is Sunday=1..Saturday=7.
The reference's ``is_weekend = day_of_week >= 5`` (dashboard.py:116)
depends on the pandas numbering, so we centralize the conversion here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pandas_weekday(col: Column | str) -> Column:
    """Monday=0 .. Sunday=6 (pandas ``dt.dayofweek`` parity; ref dashboard.py:115)."""
    c = F.col(col) if isinstance(col, str) else col
    return ((F.dayofweek(c) + 5) % 7).cast("int")


def is_weekend(col: Column | str) -> Column:
    """1 for Sat/Sun else 0 (ref dashboard.py:116: ``(dow>=5).astype(int)``)."""
    return (pandas_weekday(col) >= 5).cast("int")


def day_name(col: Column | str) -> Column:
    """English weekday name ('Monday'...) — pandas ``dt.day_name()`` parity
    (ref dashboard.py:603)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "EEEE")


def sale_date(col: Column | str) -> Column:
    """'yyyy-MM-dd' string — Mongo ``$dateToString %Y-%m-%d`` parity
    (ref dashboard.py:79-82)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd")


def week_start(col: Column | str) -> Column:
    """Monday-start week bucket as a date — pandas ``to_period('W').start_time``
    parity (ref EDA.ipynb:2044 cell 21). Spark date_trunc('week') is also
    Monday-start: exact match."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("week", c).cast("date")
