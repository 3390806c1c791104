"""Totesys-shaped OLTP fixture derived EXPRESSION-ONLY from the testdata
tables, plus the row-level fingerprint of the full star-schema transform —
the c11 driver-window entry's machinery (round 8, verdict item 8).

The reference's actual end-to-end contract is the 11-table E->T->L
(``/root/reference/src/transform.py:256-308``: 11 OLTP inputs -> 8 dims +
3 facts). The pytest suite certifies it against live JDBC; this module
makes it DRIVER-certifiable: every OLTP table is a deterministic
projection of the driver's own parquet tables (customer/supplier/region/
part/orders/lineitem), so a DuckDB oracle can rebuild the same fixture,
run the same 11 builder definitions in SQL, and compare the UNION of all
outputs row by row.

Parity rules (the m04 arithmetic-twin pattern):
- every derived column is integer/modulo/string-concat arithmetic on key
  columns — no float folds, no engine-dependent formatting;
- money lands in the fingerprint as exact BIGINT cents
  (``ROUND(col * 100)``), never as decimal strings;
- NULLs (transaction's half-null FK pair) serialize as ``~`` via
  COALESCE on both engines;
- timestamps derive as ``o_orderdate + (key % 86400) seconds`` so the
  fact builders' date/time split exercises real non-midnight times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SEED_TS = "2023-01-01 10:00:00"

# per-output-table fingerprint columns, IN BUILDER OUTPUT ORDER; each item
# is (spark_expr_sql, duck_expr_sql) — identical except where dialect
# forces a twin (date_format vs strftime). Plain names mean the column is
# already a string/int/date castable identically.
_MONEY = "CAST(ROUND({c} * 100) AS BIGINT)"


def _ts_plus(key: str, base: str = "o_orderdate") -> F.Column:
    return F.expr(
        f"CAST({base} AS TIMESTAMP_NTZ) + make_interval(0, 0, 0, 0, 0, 0,"
        f" CAST({key} % 86400 AS INT))"
    )


def totesys_from_testdata(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Derive the 11 OLTP tables from the testdata parquet tables."""
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    region = read_table(spark, sf_dir, "region")
    part = read_table(spark, sf_dir, "part")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    seed = F.lit(SEED_TS).cast("timestamp_ntz")

    address = cust.select(
        F.col("c_custkey").cast("int").alias("address_id"),
        F.concat(
            (F.col("c_custkey") % 999 + 1).cast("string"),
            F.lit(" "),
            F.col("c_mktsegment"),
            F.lit(" St"),
        ).alias("address_line_1"),
        F.concat(F.lit("Suite "), (F.col("c_custkey") % 90 + 10).cast("string")).alias(
            "address_line_2"
        ),
        F.concat(F.lit("District "), (F.col("c_custkey") % 10).cast("string")).alias(
            "district"
        ),
        F.concat(F.lit("City "), (F.col("c_custkey") % 100).cast("string")).alias(
            "city"
        ),
        F.concat(F.lit("PC"), (F.col("c_custkey") % 1000).cast("string")).alias(
            "postal_code"
        ),
        F.concat(F.lit("Country "), (F.col("c_custkey") % 25).cast("string")).alias(
            "country"
        ),
        F.concat(F.lit("PH-"), F.col("c_custkey").cast("string")).alias("phone"),
        seed.alias("created_at"),
        seed.alias("last_updated"),
    )
    counterparty = supp.select(
        F.col("s_suppkey").cast("int").alias("counterparty_id"),
        F.col("s_name").alias("counterparty_legal_name"),
        # modulo: int32-safe at any replica scale, identity at gate scale
        ((F.col("s_suppkey") * 3) % 2000000000).cast("int").alias(
            "legal_address_id"
        ),
        F.concat(F.lit("cc"), F.col("s_suppkey").cast("string")).alias(
            "commercial_contact"
        ),
        F.concat(F.lit("dc"), F.col("s_suppkey").cast("string")).alias(
            "delivery_contact"
        ),
        seed.alias("created_at"),
        seed.alias("last_updated"),
    )
    currency = spark.createDataFrame(
        [(1, "GBP"), (2, "USD"), (3, "EUR"), (4, "ZZZ")],
        "currency_id INT, currency_code STRING",
    ).select("*", seed.alias("created_at"), seed.alias("last_updated"))
    department = region.select(
        (F.col("r_regionkey") + 1).cast("int").alias("department_id"),
        F.col("r_name").alias("department_name"),
        F.concat(F.lit("Loc "), F.col("r_regionkey").cast("string")).alias(
            "location"
        ),
        F.concat(F.lit("Mgr "), F.col("r_regionkey").cast("string")).alias(
            "manager"
        ),
        seed.alias("created_at"),
        seed.alias("last_updated"),
    )
    design = part.select(
        F.col("p_partkey").cast("int").alias("design_id"),
        F.col("p_name").alias("design_name"),
        F.concat(F.lit("/designs/"), (F.col("p_partkey") % 50).cast("string")).alias(
            "file_location"
        ),
        F.concat(
            F.lit("design_"), F.col("p_partkey").cast("string"), F.lit(".json")
        ).alias("file_name"),
        seed.alias("created_at"),
        seed.alias("last_updated"),
    )
    staff = supp.select(
        F.col("s_suppkey").cast("int").alias("staff_id"),
        F.concat(F.lit("F"), (F.col("s_suppkey") % 50).cast("string")).alias(
            "first_name"
        ),
        F.concat(F.lit("L"), (F.col("s_suppkey") % 97).cast("string")).alias(
            "last_name"
        ),
        ((F.col("s_suppkey") % 5) + 1).cast("int").alias("department_id"),
        F.concat(
            F.lit("s"), F.col("s_suppkey").cast("string"), F.lit("@example.com")
        ).alias("email_address"),
        seed.alias("created_at"),
        seed.alias("last_updated"),
    )
    payment_type = spark.createDataFrame(
        [
            (1, "SALES_RECEIPT"),
            (2, "SALES_REFUND"),
            (3, "PURCHASE_PAYMENT"),
            (4, "PURCHASE_REFUND"),
        ],
        "payment_type_id INT, payment_type_name STRING",
    ).select("*", seed.alias("created_at"), seed.alias("last_updated"))

    created = _ts_plus("o_orderkey")
    sales_order = orders.select(
        F.col("o_orderkey").cast("int").alias("sales_order_id"),
        ((F.col("o_orderkey") % 1000) + 1).cast("int").alias("design_id"),
        ((F.col("o_custkey") % 100) + 1).cast("int").alias("staff_id"),
        ((F.col("o_custkey") % 50) + 1).cast("int").alias("counterparty_id"),
        ((F.col("o_orderkey") % 500) + 1).cast("int").alias("units_sold"),
        (
            (F.col("o_orderkey") % 9999 + 1).cast("double") / F.lit(100.0)
        ).alias("unit_price"),
        ((F.col("o_orderkey") % 4) + 1).cast("int").alias("currency_id"),
        F.expr(
            "CAST(date_add(CAST(o_orderdate AS DATE),"
            " CAST(o_orderkey % 14 AS INT)) AS STRING)"
        ).alias("agreed_delivery_date"),
        F.expr(
            "CAST(date_add(CAST(o_orderdate AS DATE),"
            " CAST(o_orderkey % 30 AS INT)) AS STRING)"
        ).alias("agreed_payment_date"),
        ((F.col("o_orderkey") % 200) + 1).cast("int").alias(
            "agreed_delivery_location_id"
        ),
        created.alias("created_at"),
        F.expr(
            "CAST(o_orderdate AS TIMESTAMP_NTZ) + make_interval(0, 0, 0, 0, 1,"
            " 0, CAST(o_orderkey % 86400 AS INT))"
        ).alias("last_updated"),
    )
    pcreated = _ts_plus("l_orderkey * 7", base="l_shipdate")
    purchase_order = lineitem.select(
        # modulo keeps the id in int32 at ANY corpus scale (the x100
        # replica's offset keys push l_orderkey*8 past 2^31); below 250M
        # orders the modulo is the identity, so gate-scale values are
        # unchanged — mirrored in the oracle
        ((F.col("l_orderkey") * 8 + F.col("l_linenumber")) % 2000000000)
        .cast("int")
        .alias("purchase_order_id"),
        ((F.col("l_suppkey") % 100) + 1).cast("int").alias("staff_id"),
        ((F.col("l_suppkey") % 50) + 1).cast("int").alias("counterparty_id"),
        F.concat(F.lit("ITEM-"), F.col("l_partkey").cast("string")).alias(
            "item_code"
        ),
        F.expr("CAST(FLOOR(l_quantity) AS INT)").alias("item_quantity"),
        (
            (F.col("l_partkey") % 99999 + 1).cast("double") / F.lit(100.0)
        ).alias("item_unit_price"),
        ((F.col("l_orderkey") % 4) + 1).cast("int").alias("currency_id"),
        F.expr(
            "CAST(date_add(CAST(l_shipdate AS DATE),"
            " CAST(l_linenumber % 7 AS INT)) AS STRING)"
        ).alias("agreed_delivery_date"),
        F.expr(
            "CAST(date_add(CAST(l_shipdate AS DATE),"
            " CAST(l_linenumber % 21 AS INT)) AS STRING)"
        ).alias("agreed_payment_date"),
        ((F.col("l_partkey") % 200) + 1).cast("int").alias(
            "agreed_delivery_location_id"
        ),
        pcreated.alias("created_at"),
        pcreated.alias("last_updated"),
    )
    payment = orders.select(
        F.col("o_orderkey").cast("int").alias("payment_id"),
        F.col("o_orderkey").cast("int").alias("transaction_id"),
        ((F.col("o_custkey") % 50) + 1).cast("int").alias("counterparty_id"),
        (
            (F.col("o_orderkey") % 999999 + 1).cast("double") / F.lit(100.0)
        ).alias("payment_amount"),
        ((F.col("o_orderkey") % 4) + 1).cast("int").alias("currency_id"),
        ((F.col("o_orderkey") % 4) + 1).cast("int").alias("payment_type_id"),
        (F.col("o_orderkey") % 2 == 0).alias("paid"),
        F.expr("CAST(CAST(o_orderdate AS DATE) AS STRING)").alias(
            "payment_date"
        ),
        F.lit(11111).alias("company_ac_number"),
        F.lit(22222).alias("counterparty_ac_number"),
        created.alias("created_at"),
        created.alias("last_updated"),
    )
    transaction = orders.select(
        F.col("o_orderkey").cast("int").alias("transaction_id"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("SALE"))
        .otherwise(F.lit("PURCHASE"))
        .alias("transaction_type"),
        F.when(
            F.col("o_orderkey") % 2 == 0, F.col("o_orderkey").cast("int")
        ).alias("sales_order_id"),
        F.when(
            F.col("o_orderkey") % 2 == 1, F.col("o_orderkey").cast("int")
        ).alias("purchase_order_id"),
        created.alias("created_at"),
        created.alias("last_updated"),
    )
    return {
        "address": address,
        "counterparty": counterparty,
        "currency": currency,
        "department": department,
        "design": design,
        "payment_type": payment_type,
        "payment": payment,
        "purchase_order": purchase_order,
        "sales_order": sales_order,
        "staff": staff,
        "transaction": transaction,
    }


def star_fingerprint(star: dict[str, DataFrame]) -> DataFrame:
    """UNION of all 11 star outputs as (output_table, record) rows —
    the whole transform's value surface in one gate-safe frame. Record =
    '|'-joined columns in builder order; money as BIGINT cents; NULL as
    '~'."""

    def rec(df: DataFrame, name: str, exprs: list[str]) -> DataFrame:
        cols = ", ".join(f"COALESCE(CAST({e} AS STRING), '~')" for e in exprs)
        return df.selectExpr(
            f"'{name}' AS output_table",
            f"concat_ws('|', {cols}) AS record",
        )

    money = lambda c: f"CAST(ROUND(`{c}` * 100) AS BIGINT)"  # noqa: E731
    pieces = [
        rec(
            star["dim_date"],
            "dim_date",
            [
                "date_id", "year", "month", "day", "day_of_week",
                "day_name", "month_name", "quarter",
            ],
        ),
        rec(
            star["dim_staff"],
            "dim_staff",
            [
                "staff_id", "first_name", "last_name", "department_name",
                "location", "email_address",
            ],
        ),
        rec(
            star["dim_location"],
            "dim_location",
            [
                "location_id", "address_line_1", "address_line_2",
                "district", "city", "postal_code", "country", "phone",
            ],
        ),
        rec(
            star["dim_currency"],
            "dim_currency",
            ["currency_id", "currency_code", "currency_name"],
        ),
        rec(
            star["dim_design"],
            "dim_design",
            ["design_id", "design_name", "file_location", "file_name"],
        ),
        rec(
            star["dim_counterparty"],
            "dim_counterparty",
            [
                "counterparty_id", "counterparty_legal_name",
                "counterparty_legal_address_line_1",
                "counterparty_legal_address_line_2",
                "counterparty_legal_district", "counterparty_legal_city",
                "counterparty_legal_postal_code",
                "counterparty_legal_country",
                "counterparty_legal_phone_number",
            ],
        ),
        rec(
            star["dim_transaction"],
            "dim_transaction",
            [
                "transaction_id", "transaction_type", "sales_order_id",
                "purchase_order_id",
            ],
        ),
        rec(
            star["dim_payment_type"],
            "dim_payment_type",
            ["payment_type_id", "payment_type_name"],
        ),
        rec(
            star["fact_sales_order"],
            "fact_sales_order",
            [
                "sales_order_id", "created_date", "created_time",
                "last_updated_date", "last_updated_time", "sales_staff_id",
                "counterparty_id", "units_sold", money("unit price"),
                "currency_id", "design_id", "agreed_payment_date",
                "agreed_delivery_date", "agreed_delivery_location_id",
            ],
        ),
        rec(
            star["fact_purchase_order"],
            "fact_purchase_order",
            [
                "purchase_order_id", "created_date", "created_time",
                "last_updated_date", "last_updated_time", "staff_id",
                "counterparty_id", "item_code", "item_quantity",
                money("item_unit_price"), "currency_id",
                "agreed_delivery_date", "agreed_payment_date",
                "agreed_delivery_location_id",
            ],
        ),
        rec(
            star["fact_payment"],
            "fact_payment",
            [
                "payment_id", "created_date", "created_time",
                "last_updated_date", "last_updated_time", "transaction_id",
                "counterparty_id", money("payment_amount"), "currency_id",
                "payment_type_id", "paid", "payment_date",
            ],
        ),
    ]
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


# DuckDB oracle twin: rebuilds the SAME fixture from the same parquet
# tables and runs the SAME 11 builder definitions in SQL. Kept adjacent to
# the Spark derivations above so any edit is a visible two-sided change.
STAR_LIFECYCLE_ORACLE = """
WITH addr AS (
  SELECT CAST(c_custkey AS INTEGER) AS address_id,
    CAST(c_custkey % 999 + 1 AS VARCHAR) || ' ' || c_mktsegment || ' St' AS address_line_1,
    'Suite ' || CAST(c_custkey % 90 + 10 AS VARCHAR) AS address_line_2,
    'District ' || CAST(c_custkey % 10 AS VARCHAR) AS district,
    'City ' || CAST(c_custkey % 100 AS VARCHAR) AS city,
    'PC' || CAST(c_custkey % 1000 AS VARCHAR) AS postal_code,
    'Country ' || CAST(c_custkey % 25 AS VARCHAR) AS country,
    'PH-' || CAST(c_custkey AS VARCHAR) AS phone
  FROM customer),
cp AS (
  SELECT CAST(s_suppkey AS INTEGER) AS counterparty_id,
    s_name AS counterparty_legal_name,
    CAST((s_suppkey * 3) % 2000000000 AS INTEGER) AS legal_address_id
  FROM supplier),
cur AS (SELECT * FROM (VALUES (1, 'GBP'), (2, 'USD'), (3, 'EUR'), (4, 'ZZZ'))
  t(currency_id, currency_code)),
dept AS (
  SELECT CAST(r_regionkey + 1 AS INTEGER) AS department_id,
    r_name AS department_name,
    'Loc ' || CAST(r_regionkey AS VARCHAR) AS location
  FROM region),
des AS (
  SELECT CAST(p_partkey AS INTEGER) AS design_id, p_name AS design_name,
    '/designs/' || CAST(p_partkey % 50 AS VARCHAR) AS file_location,
    'design_' || CAST(p_partkey AS VARCHAR) || '.json' AS file_name
  FROM part),
stf AS (
  SELECT CAST(s_suppkey AS INTEGER) AS staff_id,
    'F' || CAST(s_suppkey % 50 AS VARCHAR) AS first_name,
    'L' || CAST(s_suppkey % 97 AS VARCHAR) AS last_name,
    CAST(s_suppkey % 5 + 1 AS INTEGER) AS department_id,
    's' || CAST(s_suppkey AS VARCHAR) || '@example.com' AS email_address
  FROM supplier),
pt AS (SELECT * FROM (VALUES (1, 'SALES_RECEIPT'), (2, 'SALES_REFUND'),
  (3, 'PURCHASE_PAYMENT'), (4, 'PURCHASE_REFUND'))
  t(payment_type_id, payment_type_name)),
so AS (
  SELECT CAST(o_orderkey AS INTEGER) AS sales_order_id,
    CAST(o_orderkey % 1000 + 1 AS INTEGER) AS design_id,
    CAST(o_custkey % 100 + 1 AS INTEGER) AS staff_id,
    CAST(o_custkey % 50 + 1 AS INTEGER) AS counterparty_id,
    CAST(o_orderkey % 500 + 1 AS INTEGER) AS units_sold,
    CAST(o_orderkey % 9999 + 1 AS DOUBLE) / 100.0 AS unit_price,
    CAST(o_orderkey % 4 + 1 AS INTEGER) AS currency_id,
    CAST(CAST(o_orderdate AS DATE) + CAST(o_orderkey % 14 AS INTEGER) AS VARCHAR)
      AS agreed_delivery_date,
    CAST(CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INTEGER) AS VARCHAR)
      AS agreed_payment_date,
    CAST(o_orderkey % 200 + 1 AS INTEGER) AS agreed_delivery_location_id,
    o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND AS created_at,
    o_orderdate + INTERVAL 1 HOUR + (o_orderkey % 86400) * INTERVAL 1 SECOND
      AS last_updated
  FROM orders),
po AS (
  SELECT CAST((l_orderkey * 8 + l_linenumber) % 2000000000 AS INTEGER)
    AS purchase_order_id,
    CAST(l_suppkey % 100 + 1 AS INTEGER) AS staff_id,
    CAST(l_suppkey % 50 + 1 AS INTEGER) AS counterparty_id,
    'ITEM-' || CAST(l_partkey AS VARCHAR) AS item_code,
    CAST(FLOOR(l_quantity) AS INTEGER) AS item_quantity,
    CAST(l_partkey % 99999 + 1 AS DOUBLE) / 100.0 AS item_unit_price,
    CAST(l_orderkey % 4 + 1 AS INTEGER) AS currency_id,
    CAST(CAST(l_shipdate AS DATE) + CAST(l_linenumber % 7 AS INTEGER) AS VARCHAR)
      AS agreed_delivery_date,
    CAST(CAST(l_shipdate AS DATE) + CAST(l_linenumber % 21 AS INTEGER) AS VARCHAR)
      AS agreed_payment_date,
    CAST(l_partkey % 200 + 1 AS INTEGER) AS agreed_delivery_location_id,
    l_shipdate + ((l_orderkey * 7) % 86400) * INTERVAL 1 SECOND AS created_at,
    l_shipdate + ((l_orderkey * 7) % 86400) * INTERVAL 1 SECOND AS last_updated
  FROM lineitem),
pay AS (
  SELECT CAST(o_orderkey AS INTEGER) AS payment_id,
    CAST(o_orderkey AS INTEGER) AS transaction_id,
    CAST(o_custkey % 50 + 1 AS INTEGER) AS counterparty_id,
    CAST(o_orderkey % 999999 + 1 AS DOUBLE) / 100.0 AS payment_amount,
    CAST(o_orderkey % 4 + 1 AS INTEGER) AS currency_id,
    CAST(o_orderkey % 4 + 1 AS INTEGER) AS payment_type_id,
    o_orderkey % 2 = 0 AS paid,
    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS payment_date,
    o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND AS created_at,
    o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND AS last_updated
  FROM orders),
trx AS (
  SELECT CAST(o_orderkey AS INTEGER) AS transaction_id,
    CASE WHEN o_orderkey % 2 = 0 THEN 'SALE' ELSE 'PURCHASE' END
      AS transaction_type,
    CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_orderkey AS INTEGER) END
      AS sales_order_id,
    CASE WHEN o_orderkey % 2 = 1 THEN CAST(o_orderkey AS INTEGER) END
      AS purchase_order_id,
    o_orderdate + (o_orderkey % 86400) * INTERVAL 1 SECOND AS created_at
  FROM orders),
u AS (
  SELECT 'dim_date' AS output_table, concat_ws('|',
      COALESCE(CAST(d AS VARCHAR), '~'),
      COALESCE(CAST(year(d) AS VARCHAR), '~'),
      COALESCE(CAST(month(d) AS VARCHAR), '~'),
      COALESCE(CAST(day(d) AS VARCHAR), '~'),
      COALESCE(CAST(isodow(d) AS VARCHAR), '~'),
      COALESCE(CAST(dayname(d) AS VARCHAR), '~'),
      COALESCE(CAST(monthname(d) AS VARCHAR), '~'),
      COALESCE(CAST(quarter(d) AS VARCHAR), '~')) AS record
    FROM (SELECT unnest(generate_series(DATE '2022-01-01', DATE '2024-01-01', INTERVAL 1 DAY))::DATE AS d)
  UNION ALL
  SELECT 'dim_staff' AS output_table, concat_ws('|',
      COALESCE(CAST(staff_id AS VARCHAR), '~'),
      COALESCE(CAST(first_name AS VARCHAR), '~'),
      COALESCE(CAST(last_name AS VARCHAR), '~'),
      COALESCE(CAST(department_name AS VARCHAR), '~'),
      COALESCE(CAST(location AS VARCHAR), '~'),
      COALESCE(CAST(email_address AS VARCHAR), '~')) AS record
    FROM stf JOIN dept USING (department_id)
  UNION ALL
  SELECT 'dim_location' AS output_table, concat_ws('|',
      COALESCE(CAST(address_id AS VARCHAR), '~'),
      COALESCE(CAST(address_line_1 AS VARCHAR), '~'),
      COALESCE(CAST(address_line_2 AS VARCHAR), '~'),
      COALESCE(CAST(district AS VARCHAR), '~'),
      COALESCE(CAST(city AS VARCHAR), '~'),
      COALESCE(CAST(postal_code AS VARCHAR), '~'),
      COALESCE(CAST(country AS VARCHAR), '~'),
      COALESCE(CAST(phone AS VARCHAR), '~')) AS record
    FROM addr
  UNION ALL
  SELECT 'dim_currency' AS output_table, concat_ws('|',
      COALESCE(CAST(currency_id AS VARCHAR), '~'),
      COALESCE(CAST(currency_code AS VARCHAR), '~'),
      COALESCE(CAST(CASE WHEN currency_code = 'GBP' THEN 'British Pound Sterling' WHEN currency_code = 'USD' THEN 'United States Dollar' WHEN currency_code = 'EUR' THEN 'Euro' ELSE '0' END AS VARCHAR), '~')) AS record
    FROM cur
  UNION ALL
  SELECT 'dim_design' AS output_table, concat_ws('|',
      COALESCE(CAST(design_id AS VARCHAR), '~'),
      COALESCE(CAST(design_name AS VARCHAR), '~'),
      COALESCE(CAST(file_location AS VARCHAR), '~'),
      COALESCE(CAST(file_name AS VARCHAR), '~')) AS record
    FROM des
  UNION ALL
  SELECT 'dim_counterparty' AS output_table, concat_ws('|',
      COALESCE(CAST(counterparty_id AS VARCHAR), '~'),
      COALESCE(CAST(counterparty_legal_name AS VARCHAR), '~'),
      COALESCE(CAST(address_line_1 AS VARCHAR), '~'),
      COALESCE(CAST(address_line_2 AS VARCHAR), '~'),
      COALESCE(CAST(district AS VARCHAR), '~'),
      COALESCE(CAST(city AS VARCHAR), '~'),
      COALESCE(CAST(postal_code AS VARCHAR), '~'),
      COALESCE(CAST(country AS VARCHAR), '~'),
      COALESCE(CAST(phone AS VARCHAR), '~')) AS record
    FROM cp JOIN addr ON cp.legal_address_id = addr.address_id
  UNION ALL
  SELECT 'dim_transaction' AS output_table, concat_ws('|',
      COALESCE(CAST(transaction_id AS VARCHAR), '~'),
      COALESCE(CAST(transaction_type AS VARCHAR), '~'),
      COALESCE(CAST(sales_order_id AS VARCHAR), '~'),
      COALESCE(CAST(purchase_order_id AS VARCHAR), '~')) AS record
    FROM trx
  UNION ALL
  SELECT 'dim_payment_type' AS output_table, concat_ws('|',
      COALESCE(CAST(payment_type_id AS VARCHAR), '~'),
      COALESCE(CAST(payment_type_name AS VARCHAR), '~')) AS record
    FROM pt
  UNION ALL
  SELECT 'fact_sales_order' AS output_table, concat_ws('|',
      COALESCE(CAST(sales_order_id AS VARCHAR), '~'),
      COALESCE(CAST(CAST(created_at AS DATE) AS VARCHAR), '~'),
      COALESCE(CAST(strftime(created_at, '%H:%M:%S') AS VARCHAR), '~'),
      COALESCE(CAST(CAST(last_updated AS DATE) AS VARCHAR), '~'),
      COALESCE(CAST(strftime(last_updated, '%H:%M:%S') AS VARCHAR), '~'),
      COALESCE(CAST(staff_id AS VARCHAR), '~'),
      COALESCE(CAST(counterparty_id AS VARCHAR), '~'),
      COALESCE(CAST(units_sold AS VARCHAR), '~'),
      COALESCE(CAST(CAST(ROUND(unit_price * 100) AS BIGINT) AS VARCHAR), '~'),
      COALESCE(CAST(currency_id AS VARCHAR), '~'),
      COALESCE(CAST(design_id AS VARCHAR), '~'),
      COALESCE(CAST(agreed_payment_date AS VARCHAR), '~'),
      COALESCE(CAST(agreed_delivery_date AS VARCHAR), '~'),
      COALESCE(CAST(agreed_delivery_location_id AS VARCHAR), '~')) AS record
    FROM so
  UNION ALL
  SELECT 'fact_purchase_order' AS output_table, concat_ws('|',
      COALESCE(CAST(purchase_order_id AS VARCHAR), '~'),
      COALESCE(CAST(CAST(created_at AS DATE) AS VARCHAR), '~'),
      COALESCE(CAST(strftime(created_at, '%H:%M:%S') AS VARCHAR), '~'),
      COALESCE(CAST(CAST(last_updated AS DATE) AS VARCHAR), '~'),
      COALESCE(CAST(strftime(last_updated, '%H:%M:%S') AS VARCHAR), '~'),
      COALESCE(CAST(staff_id AS VARCHAR), '~'),
      COALESCE(CAST(counterparty_id AS VARCHAR), '~'),
      COALESCE(CAST(item_code AS VARCHAR), '~'),
      COALESCE(CAST(item_quantity AS VARCHAR), '~'),
      COALESCE(CAST(CAST(ROUND(item_unit_price * 100) AS BIGINT) AS VARCHAR), '~'),
      COALESCE(CAST(currency_id AS VARCHAR), '~'),
      COALESCE(CAST(agreed_delivery_date AS VARCHAR), '~'),
      COALESCE(CAST(agreed_payment_date AS VARCHAR), '~'),
      COALESCE(CAST(agreed_delivery_location_id AS VARCHAR), '~')) AS record
    FROM po
  UNION ALL
  SELECT 'fact_payment' AS output_table, concat_ws('|',
      COALESCE(CAST(payment_id AS VARCHAR), '~'),
      COALESCE(CAST(CAST(created_at AS DATE) AS VARCHAR), '~'),
      COALESCE(CAST(strftime(created_at, '%H:%M:%S') AS VARCHAR), '~'),
      COALESCE(CAST(CAST(last_updated AS DATE) AS VARCHAR), '~'),
      COALESCE(CAST(strftime(last_updated, '%H:%M:%S') AS VARCHAR), '~'),
      COALESCE(CAST(transaction_id AS VARCHAR), '~'),
      COALESCE(CAST(counterparty_id AS VARCHAR), '~'),
      COALESCE(CAST(CAST(ROUND(payment_amount * 100) AS BIGINT) AS VARCHAR), '~'),
      COALESCE(CAST(currency_id AS VARCHAR), '~'),
      COALESCE(CAST(payment_type_id AS VARCHAR), '~'),
      COALESCE(CAST(paid AS VARCHAR), '~'),
      COALESCE(CAST(payment_date AS VARCHAR), '~')) AS record
    FROM pay
)
SELECT output_table, record FROM u ORDER BY output_table, record
"""
