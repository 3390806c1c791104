"""Golden tests for the 11 star-schema builders (reference test model:
test/test_transform.py — shapes, specific cells, golden dim_date rows)."""

from datetime import date

from pw_etl_scrumptious_squad_spark.operators import dims, facts
from pw_etl_scrumptious_squad_spark.plans import etl
from pw_etl_scrumptious_squad_spark.schemas import STAR_COLUMNS


def test_dim_location_projection_rename(totesys):
    out = dims.create_dim_location(totesys["address"])
    assert out.columns == STAR_COLUMNS["dim_location"]
    rows = {r["location_id"]: r for r in out.collect()}
    assert rows[3]["city"] == "City 3"
    assert "created_at" not in out.columns  # audit columns pruned


def test_dim_design(totesys):
    out = dims.create_dim_design(totesys["design"])
    assert out.columns == STAR_COLUMNS["dim_design"]
    assert out.count() == 6


def test_dim_currency_case_mapping(totesys):
    out = dims.create_dim_currency(totesys["currency"]).orderBy("currency_id")
    assert out.columns == STAR_COLUMNS["dim_currency"]
    names = [r["currency_name"] for r in out.collect()]
    # seed codes AAA/BBB come out '0' (reference observable behavior);
    # GBP maps to the full name.
    assert names == ["0", "0", "British Pound Sterling"]


def test_dim_counterparty_join(totesys):
    out = dims.create_dim_counterparty(
        totesys["address"], totesys["counterparty"]
    ).orderBy("counterparty_id")
    assert out.columns == STAR_COLUMNS["dim_counterparty"]
    rows = out.collect()
    assert len(rows) == 4
    # counterparties 3 and 4 share legal address 3 — a real join handles it
    # (the reference's positional alignment would not, src/transform.py:114-122)
    assert rows[2]["counterparty_legal_city"] == "City 3"
    assert rows[3]["counterparty_legal_city"] == "City 3"


def test_dim_staff_join_and_sort(totesys):
    out = dims.create_dim_staff(totesys["staff"], totesys["department"])
    assert out.columns == STAR_COLUMNS["dim_staff"]
    rows = out.collect()
    assert [r["staff_id"] for r in rows] == [1, 2, 3]  # sorted despite seed order
    assert rows[0]["department_name"] == "Sales"
    assert rows[2]["department_name"] == "Sales"  # staff 3 also dept 1


def test_dim_transaction_nullable_ints(totesys):
    out = dims.create_dim_transaction(totesys["transaction"]).orderBy("transaction_id")
    assert out.columns == STAR_COLUMNS["dim_transaction"]
    rows = out.collect()
    assert rows[0]["purchase_order_id"] is None  # stays a nullable int, not NaN
    assert rows[1]["sales_order_id"] is None
    assert dict(out.dtypes)["sales_order_id"] == "int"


def test_dim_payment_type(totesys):
    out = dims.create_dim_payment_type(totesys["payment_type"])
    assert out.columns == STAR_COLUMNS["dim_payment_type"]
    assert out.count() == 4


def test_dim_date_golden(spark):
    """Reference golden fixture: 2023-03-26 (Sunday) / 2023-03-27 (Monday) —
    load_test_db/data_test.py:1-24, test_transform.py:52-66."""
    out = dims.create_dim_date(spark, "2023-03-26", "2023-03-27").orderBy("date_id")
    assert out.columns == STAR_COLUMNS["dim_date"]
    sun, mon = out.collect()
    assert sun["date_id"] == date(2023, 3, 26)
    assert (sun["day_of_week"], mon["day_of_week"]) == (7, 1)  # ISO Mon=1..Sun=7
    assert sun["day_name"] == "Sunday"
    assert sun["month_name"] == "March"
    assert sun["quarter"] == 1
    assert sun["year"] == 2023


def test_dim_date_default_range(spark):
    out = dims.create_dim_date(spark)
    assert out.count() == 731  # 2022-01-01..2024-01-01 inclusive


def test_fact_sales_order(totesys):
    out = facts.create_fact_sales_order(totesys["sales_order"]).orderBy(
        "sales_order_id"
    )
    assert out.columns == STAR_COLUMNS["fact_sales_order"]
    r = out.first()
    assert r["created_date"] == date(2023, 1, 1)
    assert r["created_time"] == "10:00:00"  # HH:mm:ss string (no TimeType)
    assert r["last_updated_time"] == "10:00:00"
    assert r["unit price"] is not None  # literal-space column name kept


def test_fact_purchase_order(totesys):
    out = facts.create_fact_purchase_order(totesys["purchase_order"])
    assert out.columns == STAR_COLUMNS["fact_purchase_order"]
    assert out.count() == 6


def test_fact_payment(totesys):
    out = facts.create_fact_payment(totesys["payment"])
    assert out.columns == STAR_COLUMNS["fact_payment"]
    # corrected name for the reference's misnamed column (transform.py:225)
    assert "last_updated_time" in out.columns
    assert "company_ac_number" not in out.columns  # dropped like the reference


def test_transform_builds_all_outputs(spark, totesys):
    star = etl.transform(totesys, spark)
    assert sorted(star) == sorted(STAR_COLUMNS)
    for name, df in star.items():
        assert df.columns == STAR_COLUMNS[name], name


def test_transform_missing_table_raises(spark, totesys):
    partial = {k: v for k, v in totesys.items() if k != "payment"}
    try:
        etl.transform(partial, spark)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "payment" in str(e)


def test_scd2_from_history_runs_and_ranges(spark):
    """Attribute runs collapse to one version each; ranges are contiguous
    per key ([v.valid_to == next.valid_from]); the current version is
    open-ended (NULL valid_to); a re-appearing old value starts a NEW
    version (type-2, not type-1)."""
    from pyspark.sql import functions as F

    from pw_etl_scrumptious_squad_spark.operators.dims import scd2_from_history

    rows = [
        (1, "gold", "2024-01-01"),
        (1, "gold", "2024-01-05"),     # same run
        (1, "silver", "2024-02-01"),   # change
        (1, "gold", "2024-03-01"),     # back to gold -> NEW version
        (2, "bronze", "2024-01-10"),   # single-version key
    ]
    h = spark.createDataFrame(rows, "k int, tier string, d string").select(
        "k", "tier", F.to_date("d").alias("d")
    )
    out = sorted(
        (r["k"], r["version"], r["tier"], str(r["valid_from"]),
         r["valid_to"] and str(r["valid_to"]))
        for r in scd2_from_history(h, "k", ["tier"], "d").collect()
    )
    assert out == [
        (1, 1, "gold", "2024-01-01", "2024-02-01"),
        (1, 2, "silver", "2024-02-01", "2024-03-01"),
        (1, 3, "gold", "2024-03-01", None),
        (2, 1, "bronze", "2024-01-10", None),
    ]
