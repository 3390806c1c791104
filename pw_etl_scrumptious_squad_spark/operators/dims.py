"""Dimension builders (reference ``src/transform.py:46-161``), Spark-first.

Each builder is a pure ``DataFrame -> DataFrame`` projection/join declared
with the DataFrame API so Catalyst prunes source columns at the scan and
picks broadcast-hash joins for the small sides. PII/audit columns
(``created_at``, ``last_updated``, contacts, managers, account numbers)
never appear in an output projection, so column pruning keeps them from
being read at all.

Reference-bug policy (SURVEY.md §7.3): implement the *intended* relational
semantics pinned by the warehouse DDL, document divergences:
- dim_counterparty uses a real equi-join, not the reference's positional
  index alignment (``src/transform.py:114-122``) which is only correct for
  pre-sorted input.
- dim_currency's unknown-code default is the string '0' (observable
  reference behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pw_etl_scrumptious_squad_spark.functions.columns import (
    currency_name,
    iso_day_of_week,
)


def create_dim_location(address: DataFrame) -> DataFrame:
    """Projection + rename (reference ``create_dim_location``,
    ``src/transform.py:64-77``): address_id -> location_id, drop audit cols."""
    return address.select(
        F.col("address_id").alias("location_id"),
        "address_line_1",
        "address_line_2",
        "district",
        "city",
        "postal_code",
        "country",
        "phone",
    )


def create_dim_design(design: DataFrame) -> DataFrame:
    """Projection (reference ``create_dim_design``, ``src/transform.py:80-89``)."""
    return design.select("design_id", "design_name", "file_location", "file_name")


def create_dim_currency(currency: DataFrame) -> DataFrame:
    """Projection + CASE mapping (reference ``create_dim_currency``,
    ``src/transform.py:92-105``)."""
    return currency.select(
        "currency_id",
        "currency_code",
        currency_name("currency_code").alias("currency_name"),
    )


def create_dim_counterparty(address: DataFrame, counterparty: DataFrame) -> DataFrame:
    """Equi inner join counterparty ⋈ address on legal_address_id = address_id
    (reference ``create_dim_counterparty``, ``src/transform.py:108-123``,
    intended semantics — see module docstring).

    ``address`` is a dimension-sized table: broadcast it so the join never
    shuffles the (potentially large) counterparty side.
    """
    return (
        counterparty.join(
            broadcast(address),
            counterparty["legal_address_id"] == address["address_id"],
            "inner",
        )
        .select(
            "counterparty_id",
            "counterparty_legal_name",
            F.col("address_line_1").alias("counterparty_legal_address_line_1"),
            F.col("address_line_2").alias("counterparty_legal_address_line_2"),
            F.col("district").alias("counterparty_legal_district"),
            F.col("city").alias("counterparty_legal_city"),
            F.col("postal_code").alias("counterparty_legal_postal_code"),
            F.col("country").alias("counterparty_legal_country"),
            F.col("phone").alias("counterparty_legal_phone_number"),
        )
    )


def create_dim_staff(staff: DataFrame, department: DataFrame) -> DataFrame:
    """Equi inner join on the shared ``department_id`` key + sort by staff_id
    (reference ``create_dim_staff``, ``src/transform.py:126-139``)."""
    return (
        staff.join(broadcast(department), on="department_id", how="inner")
        .select(
            "staff_id",
            "first_name",
            "last_name",
            "department_name",
            "location",
            "email_address",
        )
        .orderBy("staff_id")
    )


def create_dim_transaction(transaction: DataFrame) -> DataFrame:
    """Projection (reference ``create_dim_transaction``,
    ``src/transform.py:142-151``). Spark keeps nullable ints where pandas
    promoted them to float (SURVEY.md §1.3) — strictly better, documented."""
    return transaction.select(
        "transaction_id", "transaction_type", "sales_order_id", "purchase_order_id"
    )


def create_dim_payment_type(payment_type: DataFrame) -> DataFrame:
    """Projection (reference ``create_dim_payment_type``,
    ``src/transform.py:154-161``)."""
    return payment_type.select("payment_type_id", "payment_type_name")


def create_dim_date(
    spark: SparkSession,
    start_date: str = "2022-01-01",
    end_date: str = "2024-01-01",
) -> DataFrame:
    """Date-range generation + date-part extraction (reference
    ``create_dim_date``, ``src/transform.py:46-61``; default range hard-coded
    at the reference call site ``src/transform.py:276``).

    ``explode(sequence(...))`` generates rows JVM-side; all parts are
    built-in functions. day_of_week is ISO Mon=1..Sun=7 (golden
    ``test/test_transform.py:60``).
    """
    dates = spark.sql(
        f"""
        SELECT explode(sequence(
            to_date('{start_date}'), to_date('{end_date}'), interval 1 day
        )) AS date_id
        """
    )
    return dates.select(
        "date_id",
        F.year("date_id").alias("year"),
        F.month("date_id").alias("month"),
        F.dayofmonth("date_id").alias("day"),
        iso_day_of_week("date_id").alias("day_of_week"),
        F.date_format("date_id", "EEEE").alias("day_name"),
        F.date_format("date_id", "MMMM").alias("month_name"),
        F.quarter("date_id").alias("quarter"),
    )


def scd2_from_history(
    history: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event history:
    one version row per (key, attribute-state) RUN, with
    ``valid_from``/``valid_to`` effective ranges (``valid_to`` NULL for
    the current version) — the versioned-dim layer the reference's
    overwrite-style dims lack, and the standard lookup side of an as-of
    join (see r15) for point-in-time fact enrichment.

    Two windows over ONE (key, ts) partitioning — Spark reuses the
    exchange+sort: a lag marks rows where any attribute changed
    (null-safe), a running count of change-markers groups each run, and
    the version's range is [min(ts) of run, min(ts) of next run). At
    100 TB the history shuffles once on the key; version counts are tiny
    compared to events, so the output is the broadcastable side.
    """
    order = [F.col(ts_col), *[F.col(c) for c in (tiebreak_cols or [])]]
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = None
    for c in attr_cols:
        ne = ~F.col(c).eqNullSafe(F.lag(c).over(w))
        changed = ne if changed is None else changed | ne
    marked = history.withColumn(
        "__chg",
        F.when(F.lag(ts_col).over(w).isNull(), F.lit(1))  # first row: new run
        .when(changed, F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn("__ver", F.sum("__chg").over(w))
    versions = marked.groupBy(key_col, "__ver", *attr_cols).agg(
        F.min(ts_col).alias("valid_from")
    )
    nxt = Window.partitionBy(key_col).orderBy("__ver")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(nxt))
        .withColumn("version", F.col("__ver").cast("int"))
        .drop("__ver")
        .select(key_col, "version", *attr_cols, "valid_from", "valid_to")
    )
