"""Salted aggregation/join must be result-identical to their unsalted
twins — salting only changes physical placement, never semantics."""

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import skew
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    # decimal sums so the two-phase re-association is exact (double sums
    # differ in the last ulp depending on grouping, which is fine at scale
    # but would make this equality test flaky)
    o = read_table(spark, SF, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice").cast("decimal(18,2)")
    )
    plain = (
        o.groupBy("o_orderpriority")
        .agg(
            F.sum("o_totalprice").alias("total"),
            F.count("o_orderkey").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("o_orderpriority")
        .collect()
    )
    salted = (
        skew.salted_aggregate(
            o,
            ["o_orderpriority"],
            {
                "total": ("sum", "o_totalprice"),
                "n": ("count", "o_orderkey"),
                "lo": ("min", "o_totalprice"),
                "hi": ("max", "o_totalprice"),
            },
            buckets=8,
        )
        .orderBy("o_orderpriority")
        .collect()
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in salted]


def test_salted_aggregate_rejects_non_algebraic(spark):
    o = read_table(spark, SF, "orders")
    try:
        skew.salted_aggregate(o, ["o_orderpriority"], {"x": ("avg", "o_totalprice")})
        raise AssertionError("avg must be rejected")
    except ValueError:
        pass


def test_salted_join_matches_plain(spark):
    o = read_table(spark, SF, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = read_table(spark, SF, "customer")
    plain = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in o.join(c, on="c_custkey").select("o_orderkey", "c_name").collect()
    )
    salted = sorted(
        (r["o_orderkey"], r["c_name"])
        for r in skew.salted_join(o, c, on="c_custkey", buckets=4)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert plain == salted


def test_salted_left_join_preserves_unmatched(spark):
    c = read_table(spark, SF, "customer")
    o = read_table(spark, SF, "orders").withColumnRenamed("o_custkey", "c_custkey")
    plain = c.join(o, on="c_custkey", how="left").count()
    salted = skew.salted_join(c, o, on="c_custkey", buckets=4, how="left").count()
    assert plain == salted
