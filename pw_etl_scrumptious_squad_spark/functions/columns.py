"""Column expression helpers shared across operators.

All of these are built-in-function compositions (no Python UDFs), so they
stay inside whole-stage codegen and vectorized execution at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_to_date(col: Column | str) -> Column:
    """Date half of the reference's timestamp split (``src/transform.py:171-176``
    stringifies and splits on ' '; ``to_date`` is the vectorized equivalent)."""
    return F.to_date(col)


def ts_to_time_string(col: Column | str) -> Column:
    """Time half of the split. Spark has no TimeType (SURVEY.md §1.2); the
    reference's observable value is the 'HH:MM:SS' string, reproduced exactly
    by ``date_format``."""
    return F.date_format(col, "HH:mm:ss")


def iso_day_of_week(col: Column | str) -> Column:
    """ISO weekday Mon=1..Sun=7 (reference uses ``dt.isocalendar().day``,
    ``src/transform.py:55``; golden test pins 2023-03-26 Sunday -> 7).

    Spark's ``dayofweek`` is Sun=1..Sat=7 — the wrong convention;
    ``weekday`` is Mon=0..Sun=6, so +1.
    """
    return F.weekday(col) + F.lit(1)


def currency_name(code: Column | str) -> Column:
    """CASE mapping GBP/USD/EUR -> full name, else the string '0'.

    The reference's ``np.select`` default is integer 0 rendered as ``0``
    (``src/transform.py:92-105``); observable behavior (seed codes AAA/BBB/CCC
    come out '0') is preserved as a string for a typed column.
    """
    code = F.col(code) if isinstance(code, str) else code
    return (
        F.when(code == "GBP", F.lit("British Pound Sterling"))
        .when(code == "USD", F.lit("United States Dollar"))
        .when(code == "EUR", F.lit("Euro"))
        .otherwise(F.lit("0"))
    )
