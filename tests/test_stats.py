"""Exact-quantile refinement and the one-pass profiler
(operators/stats.py): brute-force twins over adversarial value
distributions (duplicates, negatives, huge ranges, single value), the
pinned rank semantics, and profiler null/distinct/min-max accounting."""

import random

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators.stats import (
    exact_quantiles,
    profile_table,
)


def _brute(vals, p):
    s = sorted(vals)
    k = (len(s) - 1) * p // 100 + 1
    return s[k - 1]


def _check(spark, vals, ps=(50, 90, 99), branch=16):
    df = spark.createDataFrame([(v,) for v in vals], "v BIGINT")
    got = {
        r["quantile"]: r["value"]
        for r in exact_quantiles(df, "v", ps, branch=branch).collect()
    }
    assert got == {f"p{p}": _brute(vals, p) for p in ps}, (got, vals[:10])


def test_quantiles_random_with_duplicates(spark):
    rng = random.Random(42)
    vals = [rng.randrange(0, 1000) for _ in range(997)]
    _check(spark, vals)


def test_quantiles_huge_range_and_negatives(spark):
    rng = random.Random(7)
    vals = [rng.randrange(-(10**12), 10**12) for _ in range(500)]
    _check(spark, vals, branch=128)


def test_quantiles_full_bigint_domain(spark):
    # values beyond 2^53: DOUBLE division would misbucket boundary
    # values (the reason the bucket id is integer DIV), and a span
    # >= 2^63 (min near Long.MIN, max near Long.MAX) cannot even be
    # subtracted in int64 — the midpoint guard narrows by comparison
    # counts first. Both regimes in one fixture.
    lo, hi = -(2**63), 2**63 - 1
    rng = random.Random(11)
    vals = (
        [lo, lo + 1, hi, hi - 1, 0, -1, 1]
        + [rng.randrange(lo, hi) for _ in range(200)]
    )
    _check(spark, vals, branch=128)


def test_quantiles_boundary_past_2_53(spark):
    # a two-value distribution whose bucket boundary rounding under
    # DOUBLE division flips the bucket: exactness must not depend on
    # float rounding of (v - lo) / width
    base = (1 << 60) + 12345
    vals = [base] * 60 + [base + (1 << 40) + 1] * 40
    _check(spark, vals, ps=(50, 90), branch=16)


def test_quantiles_all_equal_and_single(spark):
    _check(spark, [5] * 100)
    _check(spark, [-3])


def test_quantiles_skewed_mass_in_one_bucket(spark):
    # 99% of the mass at one value forces the walk to narrow INTO a
    # duplicate-heavy bucket and finish by value counts
    vals = [1000000] * 990 + list(range(10))
    _check(spark, vals)


def test_quantiles_empty_yields_nulls(spark):
    df = spark.createDataFrame([], "v BIGINT")
    rows = exact_quantiles(df, "v").collect()
    assert [r["value"] for r in rows] == [None, None, None]


def test_quantiles_partitioning_invariance(spark):
    vals = list(range(0, 5000, 3)) * 2
    a = exact_quantiles(
        spark.createDataFrame([(v,) for v in vals], "v BIGINT").repartition(1),
        "v",
    ).collect()
    b = exact_quantiles(
        spark.createDataFrame([(v,) for v in vals], "v BIGINT").repartition(29),
        "v",
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_profile_counts_nulls_distinct_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, -1.0), (2, "b", None), (None, "a", 9.0)],
        "k BIGINT, s STRING, x DOUBLE",
    )
    got = {r["column_name"]: r for r in profile_table(df, ["k", "s", "x"]).collect()}
    assert got["k"]["n_rows"] == 4 and got["k"]["n_nulls"] == 1
    assert got["k"]["n_distinct"] == 2
    assert got["k"]["min_num"] == 1.0 and got["k"]["max_num"] == 2.0
    assert got["k"]["min_str"] is None
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_str"] == "a" and got["s"]["max_str"] == "b"
    assert got["s"]["min_num"] is None
    assert got["x"]["min_num"] == -1.0 and got["x"]["max_num"] == 9.0


def test_profile_is_two_aggregation_passes(spark):
    df = spark.createDataFrame([(1, "a")], "k BIGINT, s STRING")
    plan = (
        profile_table(df, ["k", "s"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # round-10 shape: the plain aggregates and the exact-distinct
    # aggregates are SEPARATE subtrees cross-joined 1-row x 1-row, so
    # the multi-distinct Expand replicates only the distinct columns,
    # never the min/max/null inputs (measured 3.2x on a 150k-row
    # profile). Exactly one cross join of the two 1-row aggregates; no
    # per-column union fan-out.
    assert plan.count("Join") == 1 and "Cross" in plan
    assert "Union" not in plan
    # the distinct side still plans through one Expand (exact tier)
    assert plan.count("Expand") == 1


def test_profile_hll_tier_no_expand_and_close_counts(spark):
    import random

    rng = random.Random(3)
    df = spark.createDataFrame(
        [(rng.randrange(500),) for _ in range(5000)], "k BIGINT"
    )
    exact = {r["column_name"]: r for r in profile_table(df, ["k"]).collect()}
    approx = {
        r["column_name"]: r
        for r in profile_table(df, ["k"], exact_distinct=False).collect()
    }
    # the HLL tier removes the per-distinct Expand input replica
    plan = (
        profile_table(df, ["k"], exact_distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan
    # counts agree within HLL's documented error envelope
    e, a = exact["k"]["n_distinct"], approx["k"]["n_distinct"]
    assert abs(a - e) <= max(3, 0.1 * e)
    assert approx["k"]["n_rows"] == 5000 and approx["k"]["n_nulls"] == 0


# ----- mergeable quantile sketch (round 10) -----

from pw_etl_scrumptious_squad_spark.operators.stats import (  # noqa: E402
    merge_quantile_sketches,
    quantile_sketch,
    sketch_quantiles,
)


def _sketch_check_envelope(spark, vals, sub_bits=7, ps=(50, 90, 99)):
    df = spark.createDataFrame([(v,) for v in vals], "v BIGINT")
    sk = quantile_sketch(df, "v", sub_bits=sub_bits)
    got = {
        r["quantile"]: r["value"]
        for r in sketch_quantiles(sk, ps, sub_bits).collect()
    }
    for p in ps:
        exact = _brute(vals, p)
        g = got[f"p{p}"]
        # the answer is the true quantile's bucket representative:
        # toward-zero, relative error < 2^(1-sub_bits)
        assert abs(g) <= abs(exact) or exact == 0
        assert abs(g - exact) <= max(1, abs(exact)) * 2 ** (1 - sub_bits), (
            p, g, exact,
        )


def test_sketch_error_envelope_random(spark):
    rng = random.Random(5)
    _sketch_check_envelope(spark, [rng.randrange(1, 10**12) for _ in range(2000)])


def test_sketch_error_envelope_negatives_and_skew(spark):
    rng = random.Random(9)
    vals = (
        [rng.randrange(-(10**9), 10**9) for _ in range(500)]
        + [0] * 50
        + [10**15] * 30
    )
    _sketch_check_envelope(spark, vals)


def test_sketch_matches_exact_on_small_values(spark):
    # |v| < 2^(sub_bits-1): every value is its own bucket -> the sketch
    # IS exact there
    vals = list(range(-60, 60)) * 3
    df = spark.createDataFrame([(v,) for v in vals], "v BIGINT")
    got = {
        r["quantile"]: r["value"]
        for r in sketch_quantiles(quantile_sketch(df, "v")).collect()
    }
    assert got == {f"p{p}": _brute(vals, p) for p in (50, 90, 99)}


def test_sketch_merge_is_exact_and_associative(spark):
    rng = random.Random(21)
    a = [rng.randrange(0, 10**10) for _ in range(700)]
    b = [rng.randrange(0, 10**10) for _ in range(300)]
    c = [rng.randrange(-(10**6), 0) for _ in range(200)]
    dfa = spark.createDataFrame([(v,) for v in a], "v BIGINT")
    dfb = spark.createDataFrame([(v,) for v in b], "v BIGINT")
    dfc = spark.createDataFrame([(v,) for v in c], "v BIGINT")
    dfall = spark.createDataFrame([(v,) for v in a + b + c], "v BIGINT")
    direct = sorted(
        map(tuple, quantile_sketch(dfall, "v").collect())
    )
    m1 = merge_quantile_sketches(
        quantile_sketch(dfa, "v"),
        merge_quantile_sketches(
            quantile_sketch(dfb, "v"), quantile_sketch(dfc, "v")
        ),
    )
    m2 = merge_quantile_sketches(
        merge_quantile_sketches(
            quantile_sketch(dfc, "v"), quantile_sketch(dfa, "v")
        ),
        quantile_sketch(dfb, "v"),
    )
    assert sorted(map(tuple, m1.collect())) == direct
    assert sorted(map(tuple, m2.collect())) == direct


def test_sketch_state_is_bounded(spark):
    # 200k values over the full positive range: occupied buckets stay
    # below the bucket-universe bound regardless of input size
    rng = random.Random(3)
    df = spark.createDataFrame(
        [(rng.randrange(1, 2**62),) for _ in range(200_000)], "v BIGINT"
    )
    n_buckets = quantile_sketch(df, "v", sub_bits=7).count()
    assert n_buckets < 64 * 2**7


def test_sketch_partition_invariance_and_empty(spark):
    vals = [v * 977 for v in range(4000)]
    a = sorted(map(tuple, quantile_sketch(
        spark.createDataFrame([(v,) for v in vals], "v BIGINT").repartition(1),
        "v").collect()))
    b = sorted(map(tuple, quantile_sketch(
        spark.createDataFrame([(v,) for v in vals], "v BIGINT").repartition(31),
        "v").collect()))
    assert a == b
    empty = spark.createDataFrame([], "v BIGINT")
    rows = sketch_quantiles(quantile_sketch(empty, "v")).collect()
    assert [r["value"] for r in rows] == [None, None, None]


# ---------------------------------------------------------------------------
# Per-group sketch quantiles (round-10 continuation)
# ---------------------------------------------------------------------------

def test_grouped_sketch_quantiles_match_global_reader_per_group(spark):
    from pw_etl_scrumptious_squad_spark.operators.stats import (
        grouped_sketch_quantiles,
        quantile_sketch,
        sketch_quantiles,
    )

    rows = [
        (g, (i * 7919 + hash(g) % 97) % 100_000 - 20_000)
        for g in ("a", "b", "c")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "grp STRING, v LONG").repartition(7)
    got = {
        (r["grp"], r["quantile"]): r["value"]
        for r in grouped_sketch_quantiles(df, "grp", "v").collect()
    }
    for g in ("a", "b", "c"):
        sub = df.filter(df.grp == g)
        want = {
            r["quantile"]: r["value"]
            for r in sketch_quantiles(quantile_sketch(sub, "v")).collect()
        }
        for q, v in want.items():
            assert got[(g, q)] == v, (g, q)


def test_grouped_sketch_quantiles_envelope_and_null_handling(spark):
    from pw_etl_scrumptious_squad_spark.operators.stats import (
        grouped_sketch_quantiles,
    )

    rows = [("g", i * 13 + 1) for i in range(1, 2000)] + [
        ("g", None),
        ("empty", None),
    ]
    df = spark.createDataFrame(rows, "grp STRING, v LONG")
    got = {
        r["quantile"]: r["value"]
        for r in grouped_sketch_quantiles(df, "grp", "v").collect()
        if r["grp"] == "g"
    }
    import statistics

    vals = sorted(i * 13 + 1 for i in range(1, 2000))
    for p in (50, 90, 99):
        k = (len(vals) - 1) * p // 100  # 0-indexed k-th smallest
        true = vals[k]
        rep = got[f"p{p}"]
        assert rep <= true  # bucket rep collapses toward zero
        assert (true - rep) / true < 2 ** -6  # sub_bits=7 envelope
    # a group with only NULLs produces no rows
    all_rows = grouped_sketch_quantiles(df, "grp", "v").collect()
    assert {r["grp"] for r in all_rows} == {"g"}


def test_grouped_sketch_quantiles_plan_has_no_collect_or_python(spark):
    from pw_etl_scrumptious_squad_spark.operators.stats import (
        grouped_sketch_quantiles,
    )

    df = spark.createDataFrame(
        [("a", 5), ("b", 9)], "grp STRING, v LONG"
    )
    out = grouped_sketch_quantiles(df, "grp", "v")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
