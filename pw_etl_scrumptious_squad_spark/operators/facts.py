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
    acceptable for dimension-sized frames, NOT for 100 TB facts — facts
    should let the warehouse sink assign (parity with the reference) or use
    the natural key directly.
    """
    w = Window.orderBy(natural_key)
    return df.select(F.row_number().over(w).alias(name), "*")
