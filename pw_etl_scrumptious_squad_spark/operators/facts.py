"""Fact builders (reference ``src/transform.py:164-235``), Spark-first.

Each is a single projection: timestamp split into (date, 'HH:mm:ss' string)
via built-in ``to_date``/``date_format`` — the reference does this with a
per-row ``.apply`` lambda (``src/transform.py:171-176``), which is the slow
path; the built-ins are vectorized and stay in whole-stage codegen.

Surrogate record keys (``sales_record_id`` etc.) are sink-assigned
(``SERIAL PRIMARY KEY``, warehouse DDL ``setup_test_warehouse.sql:65``),
matching the reference where they are commented out
(``src/transform.py:169,194-195,220``). ``deterministic_record_id`` offers a
Spark-side alternative keyed on the natural key — at 100 TB a
``row_number`` over a global window would single-task; the deterministic
variant avoids that entirely.

Divergences (SURVEY.md §7.3):
- ``fact_payment``'s time column is named ``last_updated_time`` — the
  reference misnames it ``last_updated`` (``src/transform.py:225``).
- ``"unit price"`` keeps its literal space — it's the warehouse contract
  (``setup_test_warehouse.sql:74``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.functions.columns import (
    ts_to_date,
    ts_to_time_string,
)


def _split_audit_timestamps() -> list[Column]:
    return [
        ts_to_date("created_at").alias("created_date"),
        ts_to_time_string("created_at").alias("created_time"),
        ts_to_date("last_updated").alias("last_updated_date"),
        ts_to_time_string("last_updated").alias("last_updated_time"),
    ]


def create_fact_sales_order(sales_order: DataFrame) -> DataFrame:
    """Reference ``create_fact_sales_order`` (``src/transform.py:164-186``)."""
    return sales_order.select(
        "sales_order_id",
        *_split_audit_timestamps(),
        F.col("staff_id").alias("sales_staff_id"),
        "counterparty_id",
        "units_sold",
        F.col("unit_price").alias("unit price"),
        "currency_id",
        "design_id",
        "agreed_payment_date",
        "agreed_delivery_date",
        "agreed_delivery_location_id",
    )


def create_fact_purchase_order(purchase_order: DataFrame) -> DataFrame:
    """Reference ``create_fact_purchase_order`` (``src/transform.py:189-212``)."""
    return purchase_order.select(
        "purchase_order_id",
        *_split_audit_timestamps(),
        "staff_id",
        "counterparty_id",
        "item_code",
        "item_quantity",
        "item_unit_price",
        "currency_id",
        "agreed_delivery_date",
        "agreed_payment_date",
        "agreed_delivery_location_id",
    )


def create_fact_payment(payment: DataFrame) -> DataFrame:
    """Reference ``create_fact_payment`` (``src/transform.py:215-235``);
    drops account-number columns, keeps the corrected time-column name."""
    return payment.select(
        "payment_id",
        *_split_audit_timestamps(),
        "transaction_id",
        "counterparty_id",
        "payment_amount",
        "currency_id",
        "payment_type_id",
        "paid",
        "payment_date",
    )


def deterministic_record_id(df: DataFrame, natural_key: str, name: str) -> DataFrame:
    """Optional Spark-side surrogate key: dense sequence by natural key.

    ``row_number`` over an un-partitioned window serializes through one task;
    acceptable for dimension-sized frames, NOT for 100 TB facts — use
    :func:`ranked_surrogate_key` for anything that grows with the data,
    or let the warehouse sink assign (parity with the reference).
    """
    w = Window.orderBy(natural_key)
    return df.select(F.row_number().over(w).alias(name), "*")


def ranked_surrogate_key(
    df: DataFrame,
    natural_key: str | list[str],
    name: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense global-rank surrogate key WITHOUT the single-task window.

    ``row_number() OVER (ORDER BY key)`` funnels every row through one
    task — the textbook scale cliff for a key that must be dense AND
    ordered. The distributed equivalent is the zipWithIndex shape, kept
    declarative:

    1. range-repartition on the natural key (sampled boundaries; all rows
       with equal keys land in one partition, partitions are globally
       ordered), then MATERIALIZE so the sampled boundaries are frozen —
       the counting pass and the numbering pass must see the same
       assignment;
    2. count rows per partition — a tiny aggregate whose result is one row
       per partition (bounded by the partition count, never the data),
       collected and turned into cumulative offsets;
    3. ``row_number`` within each partition (ordered by the key) plus the
       partition's offset = the exact global rank.

    Value-identical to the global window when the key is unique (ties
    get arbitrary order in BOTH forms). Output is ``bigint`` — a dense id
    over 100 TB of rows overflows int32.
    """
    keys = [natural_key] if isinstance(natural_key, str) else list(natural_key)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    from pw_etl_scrumptious_squad_spark.checkpoint import materialize

    part = materialize(
        df.repartitionByRange(n, *keys).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    counts = {
        r["__pid"]: r["c"]
        for r in part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    pids = sorted(counts)
    offsets, acc = [], 0
    for pid in pids:
        offsets.append(acc)
        acc += counts[pid]
    omap = F.map_from_arrays(
        F.array(*[F.lit(p) for p in pids]),
        F.array(*[F.lit(o).cast("bigint") for o in offsets]),
    )
    w = Window.partitionBy("__pid").orderBy(*keys)
    return (
        part.select(
            (F.row_number().over(w) + omap[F.col("__pid")])
            .cast("bigint")
            .alias(name),
            "*",
        )
        .drop("__pid")
    )
