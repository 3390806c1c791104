"""Catalog extension set: deeper relational coverage (outer joins, JSON,
string/math scalar functions, multi-join analytics, as-of join) and the
hash-sketch operators (MinHash, SimHash) with full DuckDB oracles.

Registered into the same registry as catalog.py; imported from there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pw_etl_scrumptious_squad_spark.catalog import _t, register
from pw_etl_scrumptious_squad_spark.operators import dedup, similarity

# ---------------------------------------------------------------------------
# Relational depth
# ---------------------------------------------------------------------------


@register(
    "q11_outer_join_agg",
    "SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,"
    " CAST(coalesce(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(18,2)) AS total_spend"
    " FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey"
    " GROUP BY c.c_custkey ORDER BY c.c_custkey",
    "left outer join + aggregation with null-preserving counts",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("decimal(18,2)")
            .alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q12_json_extract",
    "SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events"
    " ORDER BY event_id",
    "JSON scalar extraction from a string column",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_val")
    ).orderBy("event_id")


@register(
    "q13_string_funcs",
    "SELECT c_custkey, upper(c_name) AS uname, substr(c_name, 1, 8) AS prefix8,"
    " concat(c_mktsegment, '-', c_name) AS seg_name,"
    " CAST(length(c_name) AS INTEGER) AS name_len,"
    " replace(c_name, '0', 'O') AS o_for_zero,"
    " CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS lev_building"
    " FROM customer ORDER BY c_custkey",
    "string scalar functions (upper/substr/concat/length/replace/levenshtein)",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.regexp_replace(F.col("c_name"), "0", "O").alias("o_for_zero"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias(
            "lev_building"
        ),
    ).orderBy("c_custkey")


@register(
    "q14_math_funcs",
    "SELECT o_orderkey, sqrt(o_totalprice) AS sqrt_price,"
    " ROUND(ln(o_totalprice), 4) AS ln_price,"
    " CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,"
    " CAST(floor(o_totalprice) AS BIGINT) AS floor_price,"
    " CAST(o_orderkey % 7 AS BIGINT) AS key_mod7"
    " FROM orders ORDER BY o_orderkey",
    "math scalar functions; sqrt is IEEE-exact cross-engine, ln rounded",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.sqrt("o_totalprice").alias("sqrt_price"),
        F.round(F.log("o_totalprice"), 4).alias("ln_price"),
        F.ceil("o_totalprice").alias("ceil_price"),
        F.floor("o_totalprice").alias("floor_price"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    ).orderBy("o_orderkey")


@register(
    "q15_shipping_priority",
    "SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS o_date,"
    " CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue"
    " FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey"
    " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
    " WHERE c.c_mktsegment = 'BUILDING'"
    " AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'"
    " AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'"
    " GROUP BY o.o_orderkey, o.o_orderdate"
    " ORDER BY revenue DESC, o_orderkey LIMIT 10",
    "TPC-H Q3-style: 3-way join, filtered, grouped revenue, top-10",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    )
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("o_date"))
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("decimal(18,4)").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q16_local_supplier_volume",
    "SELECT n.n_name, CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS revenue"
    " FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey"
    " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
    " JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey"
    " JOIN nation n ON s.s_nationkey = n.n_nationkey"
    " JOIN region r ON n.n_regionkey = r.r_regionkey"
    " WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY revenue DESC, n_name",
    "TPC-H Q5-style: 6-way join with local-supplier predicate",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(price * (F.lit(1) - disc)).cast("decimal(18,4)").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "q17_above_avg_orders",
    "WITH stats AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend,"
    " CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY o_custkey)"
    " SELECT o.o_orderkey, o.o_custkey FROM orders o JOIN stats t ON o.o_custkey = t.o_custkey"
    " WHERE CAST(o.o_totalprice AS DECIMAL(18,2)) * t.cnt > t.spend"
    " ORDER BY o.o_orderkey",
    "decorrelated 'above customer average' predicate (exact decimal algebra:"
    " price*cnt > sum avoids cross-engine division semantics)",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    stats = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(price).cast("decimal(18,2)").alias("spend"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        o.join(stats, o["o_custkey"] == stats["k"])
        .filter(price * F.col("cnt") > F.col("spend"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    )


@register(
    "r14_union_all_counts",
    "SELECT k, CAST(count(*) AS BIGINT) AS n FROM"
    " (SELECT c_custkey AS k FROM customer UNION ALL SELECT o_custkey AS k FROM orders)"
    " GROUP BY k ORDER BY k",
    "UNION ALL (bag semantics) + aggregation",
)
def r14(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf, "orders").select(F.col("o_custkey").alias("k"))
    return (
        c.unionByName(o)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


@register(
    "r15_asof_join",
    "SELECT p.event_id, p.user_id, p.ts,"
    " (SELECT max(v.ts) FROM events v WHERE v.user_id = p.user_id"
    "  AND v.event_type = 'view' AND v.ts < p.ts) AS last_view_ts"
    " FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id",
    "as-of join (latest prior 'view' per purchase): Spark lacks a native"
    " operator; expressed as a running max over a range window — one sort"
    " per user partition, no O(n^2) pair join",
)
def r15(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    last_view_us = F.max(
        F.when(F.col("event_type") == "view", F.col("us"))
    ).over(w)
    return (
        e.withColumn(
            "last_view_ts",
            F.timestamp_micros(last_view_us).cast("timestamp_ntz"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_view_ts")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Hash sketches with full oracles
# ---------------------------------------------------------------------------

_NUM_PERM = 8
_SIMHASH_BITS = 32


def _minhash_oracle() -> str:
    blocks = []
    for p in range(_NUM_PERM):
        blocks.append(
            "SELECT doc_id, "
            f"CAST({p} AS INTEGER) AS perm, "
            "list_aggregate(list_transform(shingles, "
            f"s -> CAST(concat('0x', substr(md5(concat('{p}|', s)), 1, 15)) AS BIGINT)"
            "), 'min') AS minhash_val FROM sh"
        )
    return (
        "WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
        "sh AS (SELECT doc_id, list_transform(range(1, greatest(len(toks) - 4, 0) + 1), "
        "i -> md5(array_to_string(toks[i:i+4], ' '))) AS shingles FROM tk) "
        + " UNION ALL ".join(blocks)
        + " ORDER BY doc_id, perm"
    )


@register(
    "d03_minhash_signatures",
    _minhash_oracle(),
    "MinHash signatures (8 md5-derived permutations over 5-token shingles),"
    " exploded to scalar rows for hashing",
)
def d03(spark: SparkSession, sf: str) -> DataFrame:
    sigs = dedup.minhash_signatures(
        _t(spark, sf, "documents"), "doc_id", "text", num_perm=_NUM_PERM
    )
    return sigs.select(
        "doc_id", F.posexplode("minhash").alias("perm", "minhash_val")
    ).orderBy("doc_id", "perm")


def _simhash_oracle() -> str:
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(_SIMHASH_BITS)
    )
    packed = " + ".join(
        f"CASE WHEN v{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE CAST(0 AS BIGINT) END"
        for i in range(_SIMHASH_BITS)
    )
    return (
        "WITH tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t"
        " FROM documents),"
        " h AS (SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok),"
        f" votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)"
        f" SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes ORDER BY doc_id"
    )


@register(
    "d04_simhash",
    _simhash_oracle(),
    "32-bit SimHash (md5-derived token hashes, per-bit majority vote)",
)
def d04(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash(
        _t(spark, sf, "documents"), "doc_id", "text", bits=_SIMHASH_BITS
    ).orderBy("doc_id")


@register(
    "d05_minhash_lsh_pairs",
    None,  # approximate candidate generation — verified exact-Jaccard subset
    "MinHash-LSH near-dup pairs (banded bucketing + exact-Jaccard verify);"
    " no SQL oracle: candidate generation is approximate by design, the"
    " exact-Jaccard contract is pinned by d02 and tests/test_dedup_similarity.py",
)
def d05(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_dedup(
        _t(spark, sf, "documents"), "doc_id", "text",
        num_perm=16, bands=8, threshold=0.5,
    ).orderBy("doc_a", "doc_b")


@register(
    "s02_ivf_topk",
    None,  # approximate by design; exactness oracle is s01 (brute force)
    "IVF approximate nearest neighbors (centroid routing, n_probe=3);"
    " recall vs the exact s01 baseline is asserted in tests",
)
def s02(spark: SparkSession, sf: str) -> DataFrame:
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = similarity.assign_ivf_cells(emb, centroids)
    return similarity.ivf_topk(
        assigned, centroids, queries, k=5, n_probe=3
    ).orderBy("query_id", "rank")
