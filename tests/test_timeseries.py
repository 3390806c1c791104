"""Gap-fill + forward-fill (operators/timeseries.py): fixtures pin the
grid bounds (first..last observed hour per key), the carried value
across multi-hour gaps, the within-hour (ts, tiebreak) total order, and
the observed flags; full value parity rides the catalog oracle
(y87_gap_fill_hourly)."""

from datetime import datetime

from pw_etl_scrumptious_squad_spark.operators.timeseries import (
    gap_fill_hourly,
)


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, value DOUBLE"
    )
    out = gap_fill_hourly(df, "user_id", "ts", "value", "event_id")
    return {
        (r["key"], r["hour"].hour): (r["value"], r["observed"])
        for r in out.collect()
    }


def test_gap_is_filled_and_carried_forward(spark):
    rows = [
        (1, _ts(2, 15), 7, 10.0),
        (2, _ts(5, 5), 7, 20.0),  # hours 3 and 4 are gaps
    ]
    got = _run(spark, rows)
    assert got == {
        (7, 2): (10.0, True),
        (7, 3): (10.0, False),
        (7, 4): (10.0, False),
        (7, 5): (20.0, True),
    }


def test_within_hour_last_observation_wins_with_tiebreak(spark):
    rows = [
        (1, _ts(2, 10), 7, 1.0),
        (2, _ts(2, 50), 7, 2.0),   # later ts wins the hour
        (3, _ts(2, 50), 7, 3.0),   # same ts: higher event_id wins
    ]
    got = _run(spark, rows)
    assert got[(7, 2)] == (3.0, True)


def test_grid_is_per_key_not_global(spark):
    rows = [
        (1, _ts(1), 7, 1.0),
        (2, _ts(3), 7, 2.0),
        (3, _ts(10), 9, 5.0),  # key 9 observed only at hour 10
    ]
    got = _run(spark, rows)
    assert {k for k in got if k[0] == 9} == {(9, 10)}
    assert {k[1] for k in got if k[0] == 7} == {1, 2, 3}


def test_single_observation_key_is_one_observed_row(spark):
    got = _run(spark, [(1, _ts(4, 30), 7, 9.5)])
    assert got == {(7, 4): (9.5, True)}


def test_negative_epoch_and_tiebreak_keep_numeric_order(spark):
    # pre-1970 timestamps: unix_micros is NEGATIVE, so an unbiased
    # zero-pad would put the '-' mid-string and make '-100' sort AFTER
    # '-999' lexicographically; the 2^62 bias keeps fixed-width
    # lexicographic == numeric. Same for negative tiebreak ids.
    rows = [
        (-5, datetime(1969, 12, 31, 2, 10), 7, 1.0),
        (-9, datetime(1969, 12, 31, 2, 50), 7, 2.0),  # later ts wins
        (-3, datetime(1969, 12, 31, 2, 50), 7, 3.0),  # -3 > -9: wins tie
    ]
    got = _run(spark, rows)
    assert got[(7, 2)] == (3.0, True)
