"""Data-quality operator tests: every check must fire on a planted
violation and stay silent on clean rows — including the NULL edge cases
(nullable FK is not an orphan; an unverifiable rule IS a violation)."""

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import dq


def test_unique_violations_finds_planted_dup(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d")], "k int, v string"
    )
    out = dq.unique_violations(df, ["k"]).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [(2, 2)]


def test_fk_orphans_ignores_null_fk(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    out = dq.fk_orphans(child, parent, "fk", "pk").collect()
    assert [r["id"] for r in out] == [2]  # 99 orphaned; NULL fk allowed


def test_null_violations_any_of(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (2, None, 2.0), (3, "y", None)],
        "id int, a string, b double",
    )
    out = dq.null_violations(df, ["a", "b"]).collect()
    assert sorted(r["id"] for r in out) == [2, 3]


def test_rule_violations_null_rule_counts(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None)], "id int, amt double"
    )
    out = dq.rule_violations(df, F.col("amt") >= 0).collect()
    # -1 fails the rule; NULL makes the rule unverifiable -> violation
    assert sorted(r["id"] for r in out) == [2, 3]


def test_dq_report_one_row_per_check_sorted(spark):
    df = spark.createDataFrame([(1,), (1,)], "k int")
    rep = dq.dq_report(
        {
            "b_unique": dq.unique_violations(df, ["k"]),
            "a_rule": dq.rule_violations(df, F.col("k") > 0),
        }
    ).collect()
    assert [(r["check_name"], r["n_violations"]) for r in rep] == [
        ("a_rule", 0),
        ("b_unique", 1),
    ]


def test_observed_counters_ride_the_action(spark):
    """Observation metrics arrive from the SAME job that materializes
    the frame — no second scan — and reconcile exactly."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, Decimal("10.00")), (None, Decimal("-2.50")), (3, Decimal("5.00"))],
        "k INT, amt DECIMAL(10,2)",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    out, obs = dq.observed(df, "fact_load", dq.standard_counters("k", "amt"))
    n = out.count()  # the one action
    got = obs.get
    assert n == 3
    assert got["n_rows"] == 3
    assert got["n_null_key"] == 1
    assert got["n_negative_amount"] == 1
    assert got["total_amount"] == Decimal("12.50")
