"""Time-series regularization: hourly gap-fill + forward-fill.

The standard last-mile transform between an event stream and anything
that consumes a REGULAR grid (dashboards, joins against dim_date-style
calendars, feature windows for training): bucket events to the hour,
materialize the missing hours, and carry the last observation forward.
The reference has no time-series surface (its facts keep raw
timestamps, src/transform.py:34-62); this is the batch companion to
the engine's streaming session/window operators.

Scale shape (three map-friendly stages, one window):

1. Per (key, hour) last observation — ONE hash-agg with a max_by on
   the total order (ts, tiebreak), so ties cannot make the carried
   value engine- or partition-dependent. The order key is a
   zero-padded ``epoch_us-tiebreak`` string because DuckDB's max_by
   takes scalar keys only (no struct comparators): for non-negative
   fixed-width digits, lexicographic order IS numeric order, so both
   engines pick the identical row.
2. The dense grid — ``sequence()`` between each key's first and last
   hour, exploded map-side: grid size is sum over keys of their own
   span (never |keys| x |global span|), and no join against a
   generated calendar table is needed.
3. Forward fill — ``last(value, ignorenulls=True)`` over (key ORDER BY
   hour), ONE window whose partitioning is the natural key; at cluster
   scale this is the only shuffle, and it reuses the stage-1
   aggregation's hash partitioning on the key.

Leading hours before a key's first observation cannot exist by
construction (the grid starts at the first observed hour), so the
output has no NULL carried values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_hourly(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Return one row per (key, hour) from each key's first to last
    observed hour: ``(key, hour, value, observed)`` where ``value`` is
    the hour's last observation — (ts, tiebreak) total order — carried
    forward across gap hours, and ``observed`` marks real hours."""
    hour = F.date_trunc("hour", F.col(ts_col))
    # Bias both components by 2^62 before zero-padding: for a negative
    # epoch (pre-1970 ts) or tiebreak, lpad('-123', ...) puts the sign
    # mid-string, breaking lexicographic==numeric AND diverging from
    # DuckDB's printf('%020d') rendering. Biased values are non-negative
    # for any input in [-2^62, 2^62) — ±146k years of microseconds, the
    # documented domain — and at most 19 digits, so fixed-width
    # lexicographic order IS numeric order in both engines (inputs
    # outside the domain overflow loudly under ANSI mode, never
    # silently misorder).
    bias = 1 << 62
    order_key = (
        f"concat(lpad(cast(unix_micros(cast({ts_col} as timestamp))"
        f" + {bias} as string), 20, '0'),"
        f" '-', lpad(cast({tiebreak_col} + {bias} as string), 20, '0'))"
    )
    per_hour = (
        df.groupBy(F.col(key_col).alias("key"), hour.alias("hour"))
        .agg(
            F.expr(f"max_by({value_col}, {order_key})").alias("obs_value")
        )
    )
    spans = per_hour.groupBy("key").agg(
        F.min("hour").alias("first_hour"), F.max("hour").alias("last_hour")
    )
    grid = spans.select(
        "key",
        F.explode(
            F.sequence(
                "first_hour", "last_hour", F.expr("INTERVAL 1 HOUR")
            )
        ).alias("hour"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_hour, ["key", "hour"], "left")
        .select(
            "key",
            "hour",
            F.last("obs_value", ignorenulls=True).over(w).alias("value"),
            F.col("obs_value").isNotNull().alias("observed"),
        )
    )
