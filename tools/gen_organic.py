"""Organic sf1.0 testdata generator (round-8 verdict item 5).

The x10/x100 scale sets (tools/gen_scale.py) are STRUCTURE-PRESERVING
replicas of sf0.1 — per-copy disjoint vocabularies, per-copy key
offsets — which proves per-copy operator scaling but leaves open
whether a CONTINUOUS corpus (one shared vocabulary, one continuous key
space, naturally-varying group sizes) behaves the same. This tool
generates a fresh sf1.0 set with the SAME distributions the driver's
sf0.1 exhibits (measured and documented below per table), entirely from
seeded md5 expressions — no copy structure anywhere:

- orders 1.5M / lineitem 6M (lines multinomially assigned to orders →
  per-order counts naturally Poisson(4), matching sf0.1's 1..17 spread)
- customer 150k / supplier 10k / part 200k; nation/region copied
  verbatim (fixed dimension tables)
- documents 50k: 10..100 words from the sf0.1 31-word vocabulary,
  lang en~41% + 4x~15%, 20 uniform sources, ~0.2% exact-dup pairs
- embeddings 20k: unit-normalized 64-dim, label = id%10 (sf0.1 has no
  real label clusters — measured within/across cosine 0.009/0.005)
- events 1M: 30 days of 2024-01, 1500x10 users, 5 uniform event types

Determinism: every value is md5(tag || id [|| position]) arithmetic —
independent of partitioning, re-runs byte-identical.

Usage: python tools/gen_organic.py [out_dir]   (default
scale_data/sf1_organic; ~150 MB)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pw_etl_scrumptious_squad_spark.session import get_spark  # noqa: E402
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table  # noqa: E402

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SF1 = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}


def _u(tag: str, *cols: str) -> str:
    """Deterministic uniform BIGINT in [0, 2^60) from md5(tag || cols)."""
    parts = ", ".join(["'" + tag + "'", *cols])
    return f"CAST(conv(substr(md5(concat_ws(':', {parts})), 1, 15), 16, 10) AS BIGINT)"


def generate(spark: SparkSession, src_dir: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)

    def w(df: DataFrame, name: str, parts: int = 16) -> None:
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print("wrote", name)

    # fixed dims: copied verbatim
    w(read_table(spark, src_dir, "region"), "region", 1)
    w(read_table(spark, src_dir, "nation"), "nation", 1)

    cust = spark.range(SF1["customer"]).selectExpr(
        "id AS c_custkey",
        "concat('Customer#', lpad(CAST(id AS STRING), 9, '0')) AS c_name",
        f"CAST({_u('c.nat', 'id')} % 25 AS INT) AS c_nationkey",
        f"CAST({_u('c.bal', 'id')} % 1100000 AS DOUBLE) / 100.0 - 1000.0"
        " AS c_acctbal",
        "element_at(array('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD',"
        f"'MACHINERY'), CAST({_u('c.seg', 'id')} % 5 AS INT) + 1)"
        " AS c_mktsegment",
    )
    w(cust, "customer", 4)

    supp = spark.range(SF1["supplier"]).selectExpr(
        "id AS s_suppkey",
        "concat('Supplier#', lpad(CAST(id AS STRING), 9, '0')) AS s_name",
        f"CAST({_u('s.nat', 'id')} % 25 AS INT) AS s_nationkey",
        f"CAST({_u('s.bal', 'id')} % 1000000 AS DOUBLE) / 100.0 AS s_acctbal",
    )
    w(supp, "supplier", 2)

    part = spark.range(SF1["part"]).selectExpr(
        "id AS p_partkey",
        "concat(element_at(array('large','hot','blue','dim','sly','calm',"
        f"'red','tan'), CAST({_u('p.adj', 'id')} % 8 AS INT) + 1), ' ',"
        " element_at(array('ring','bolt','washer','screw','nut','cap',"
        f"'pin','rod'), CAST({_u('p.noun', 'id')} % 8 AS INT) + 1))"
        " AS p_name",
        f"concat('Brand#', CAST({_u('p.brand', 'id')} % 25 AS INT)) AS p_brand",
        "element_at(array('PROMO','LARGE','STANDARD','ECONOMY','MEDIUM',"
        f"'SMALL'), CAST({_u('p.type', 'id')} % 6 AS INT) + 1) AS p_type",
        f"CAST({_u('p.size', 'id')} % 50 AS INT) + 1 AS p_size",
        "900.0 + CAST(id % 1000 AS DOUBLE) / 10.0 AS p_retailprice",
    )
    w(part, "part", 4)

    orders = spark.range(SF1["orders"]).selectExpr(
        "id AS o_orderkey",
        f"{_u('o.cust', 'id')} % {SF1['customer']} AS o_custkey",
        "element_at(array('O','P','F'),"
        f" CAST({_u('o.stat', 'id')} % 3 AS INT) + 1) AS o_orderstatus",
        f"1000.0 + CAST({_u('o.tp', 'id')} % 49900000 AS DOUBLE) / 100.0"
        " AS o_totalprice",
        "CAST(timestamp'1995-01-01 00:00:00' + make_interval(0, 0, 0,"
        f" CAST({_u('o.date', 'id')} % 2400 AS INT), 0, 0, 0) AS TIMESTAMP_NTZ)"
        " AS o_orderdate",
        "element_at(array('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED',"
        f"'5-LOW'), CAST({_u('o.prio', 'id')} % 5 AS INT) + 1)"
        " AS o_orderpriority",
    )
    w(orders, "orders", 8)

    # lineitem: 6M lines thrown uniformly at 1.5M orders -> per-order
    # counts are Poisson(4) with a natural 0..~17 spread (the organic
    # twin of sf0.1's measured 1..17 histogram). linenumber by window
    # within order — a one-time generation cost, not a query path.
    li_base = spark.range(SF1["lineitem"]).selectExpr(
        "id",
        f"{_u('l.ord', 'id')} % {SF1['orders']} AS l_orderkey",
        f"{_u('l.part', 'id')} % {SF1['part']} AS l_partkey",
        f"{_u('l.supp', 'id')} % {SF1['supplier']} AS l_suppkey",
        f"CAST({_u('l.qty', 'id')} % 50 AS DOUBLE) + 1.0 AS l_quantity",
        f"900.0 + CAST({_u('l.ep', 'id')} % 10410000 AS DOUBLE) / 100.0"
        " AS l_extendedprice",
        f"CAST({_u('l.disc', 'id')} % 11 AS DOUBLE) / 100.0 AS l_discount",
        f"CAST({_u('l.tax', 'id')} % 9 AS DOUBLE) / 100.0 AS l_tax",
        "element_at(array('A','N','R'),"
        f" CAST({_u('l.rf', 'id')} % 3 AS INT) + 1) AS l_returnflag",
        "element_at(array('O','F'),"
        f" CAST({_u('l.ls', 'id')} % 2 AS INT) + 1) AS l_linestatus",
        "CAST(timestamp'1995-01-02 00:00:00' + make_interval(0, 0, 0,"
        f" CAST({_u('l.ship', 'id')} % 2490 AS INT), 0, 0, 0) AS TIMESTAMP_NTZ)"
        " AS l_shipdate",
    )
    lineitem = li_base.selectExpr(
        "l_orderkey", "l_partkey", "l_suppkey",
        "CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY id)"
        " AS INT) AS l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    )
    w(lineitem, "lineitem", 16)

    events = spark.range(SF1["events"]).selectExpr(
        "id AS event_id",
        "CAST(timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0,"
        f" 0, CAST({_u('e.ts', 'id')} % 2592000 AS INT)) AS TIMESTAMP_NTZ)"
        " AS ts",
        f"{_u('e.user', 'id')} % 15000 AS user_id",
        "element_at(array('view','click','purchase','signup','error'),"
        f" CAST({_u('e.type', 'id')} % 5 AS INT) + 1) AS event_type",
        f"CAST({_u('e.val', 'id')} % 56021 AS DOUBLE) / 100.0 AS value",
        f"concat('{{\"k\": ', CAST({_u('e.k', 'id')} % 100 AS INT), '}}')"
        " AS props",
    )
    w(events, "events", 8)

    vocab_arr = "array(" + ", ".join(f"'{t}'" for t in VOCAB) + ")"
    # ~0.2% of docs reuse an earlier doc's seed -> exact-dup pairs at
    # the sf0.1 rate, scattered through a CONTINUOUS corpus
    docs = spark.range(SF1["documents"]).selectExpr(
        "id",
        "id AS doc_id",
        f"CASE WHEN {_u('d.dup', 'id')} % 500 = 0 THEN id % 997 ELSE id END"
        " AS seed_id",
    ).selectExpr(
        "doc_id",
        "array_join(transform(sequence(1,"
        f" CAST(10 + {_u('d.len', 'seed_id')} % 91 AS INT)),"
        f" i -> element_at({vocab_arr},"
        f" CAST({_u('d.tok', 'seed_id', 'CAST(i AS STRING)')} % 31 AS INT)"
        " + 1)), ' ') AS text",
        f"CASE WHEN {_u('d.lang', 'seed_id')} % 100 < 41 THEN 'en'"
        " ELSE element_at(array('zh','es','fr','de'),"
        f" CAST({_u('d.l2', 'seed_id')} % 4 AS INT) + 1) END AS lang",
        f"concat('src', CAST({_u('d.src', 'id')} % 20 AS INT)) AS source",
    ).selectExpr(
        "doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    )
    # 32 files: a real corpus is many-file; single-digit file counts cap
    # scan-stage parallelism and distort cross-set comparisons
    w(docs, "documents", 32)

    emb = (
        spark.range(SF1["embeddings"])
        .selectExpr(
            "id AS vec_id",
            # CLT gaussian-ish per dim: mean of 3 uniforms, centered
            "transform(sequence(1, 64), j -> CAST(("
            f" CAST({_u('v.a', 'id', 'CAST(j AS STRING)')} % 1000 AS DOUBLE)"
            f" + CAST({_u('v.b', 'id', 'CAST(j AS STRING)')} % 1000 AS DOUBLE)"
            f" + CAST({_u('v.c', 'id', 'CAST(j AS STRING)')} % 1000 AS DOUBLE)"
            " - 1498.5) / 1000.0 AS DOUBLE)) AS raw",
            "CAST(id % 10 AS INT) AS label",
        )
        .selectExpr(
            "vec_id",
            "CAST(transform(raw, x -> x / sqrt(aggregate(raw, CAST(0.0 AS"
            " DOUBLE), (acc, v) -> acc + v * v))) AS ARRAY<FLOAT>)"
            " AS embedding",
            "label",
        )
    )
    w(emb, "embeddings", 8)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "scale_data/sf1_organic"
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gen-organic")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, src, out)


if __name__ == "__main__":
    main()
