"""Bloom-pruned semi-join must be value-identical to the plain leftsemi
join for ANY filter geometry (false positives are removed by the exact
follow-up join; Bloom filters cannot produce false negatives), while the
Bloom pass itself prunes the overwhelming majority of non-matching rows
without shuffling the fact side."""

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import join_opt
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, *cols):
    return [tuple(r) for r in df.orderBy(*cols).collect()]


def test_matches_plain_semi_join(spark):
    li = read_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    keys = (
        read_table(spark, SF, "orders")
        .where(F.col("o_totalprice") > 200000)
        .select("o_orderkey")
    )
    got = join_opt.bloom_prune_semi_join(
        li, keys, "l_orderkey", "o_orderkey", n_bits=1 << 16
    )
    exp = li.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey",
        "leftsemi",
    )
    assert _sorted_rows(got, "l_orderkey", "l_linenumber") == _sorted_rows(
        exp, "l_orderkey", "l_linenumber"
    )


def test_exact_even_with_degenerate_tiny_filter(spark):
    # 64-bit filter => huge false-positive rate; the exact semi-join must
    # still remove every false positive
    fact = spark.range(0, 5000).withColumnRenamed("id", "k")
    dim = spark.range(0, 5000, 500).withColumnRenamed("id", "k")
    got = join_opt.bloom_prune_semi_join(fact, dim, "k", n_bits=64, n_hashes=2)
    assert sorted(r.k for r in got.collect()) == list(range(0, 5000, 500))


def test_bloom_pass_prunes_nonmembers(spark):
    fact = spark.range(0, 20000).withColumnRenamed("id", "k")
    dim = spark.range(0, 20000, 100).withColumnRenamed("id", "k")  # 200 keys
    bloom = join_opt.build_bloom(dim, "k", n_bits=1 << 14)
    survivors = (
        fact.join(F.broadcast(bloom), how="cross")
        .where(
            join_opt._might_contain(
                F.col("bloom"), F.col("k"), 1 << 14, join_opt.DEFAULT_NUM_HASHES
            )
        )
        .count()
    )
    true_matches = 200
    fp = (survivors - true_matches) / (20000 - true_matches)
    assert survivors >= true_matches  # no false negatives, ever
    assert fp < 0.02  # 16384 bits / 200 keys => ~80 bits/key, fp ~ 0


def test_null_keys_never_match(spark):
    fact = spark.createDataFrame(
        [(1,), (2,), (None,)], "k int"
    )
    dim = spark.createDataFrame([(1,), (None,)], "k int")
    got = join_opt.bloom_prune_semi_join(fact, dim, "k", n_bits=1 << 10)
    assert [r.k for r in got.collect()] == [1]


def test_string_keys(spark):
    docs = read_table(spark, SF, "documents").select("doc_id", "lang")
    langs = spark.createDataFrame([("en",), ("fr",)], "lang string")
    got = join_opt.bloom_prune_semi_join(docs, langs, "lang", n_bits=1 << 10)
    exp = docs.join(langs, "lang", "leftsemi")
    assert _sorted_rows(got, "doc_id") == _sorted_rows(exp, "doc_id")


def test_fact_side_not_shuffled_before_probe(spark):
    # The probe must reach the fact via a one-row broadcast (BNLJ), never
    # an Exchange of the fact itself; the only fact shuffle allowed is the
    # exact semi-join on survivors (and AQE may even broadcast that here).
    fact = spark.range(0, 1000).withColumnRenamed("id", "k")
    dim = spark.range(0, 1000, 10).withColumnRenamed("id", "k")
    plan = join_opt.bloom_prune_semi_join(
        fact, dim, "k", n_bits=1 << 12
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the bloom build aggregates map-side before its (word-bounded) shuffle
    assert "partial_bit_or" in plan
