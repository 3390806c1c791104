"""SQL front-end parity: ad-hoc SQL over the registered views must match
DuckDB running the SAME statement over the same parquet — the end-user
contract for "bring your own query"."""

import duckdb
import pytest

from pw_etl_scrumptious_squad_spark import api

SF = "/root/testdata/sf0.001"

ADHOC = [
    # join + filter + agg, exact integer outputs
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n"
    " FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey"
    " WHERE c.c_mktsegment = 'BUILDING'"
    " GROUP BY o_orderpriority ORDER BY o_orderpriority",
    # correlated subquery
    "SELECT c_custkey FROM customer WHERE c_acctbal >"
    " (SELECT avg(c_acctbal) FROM customer) ORDER BY c_custkey",
    # set op + scalar functions
    "SELECT DISTINCT upper(n_name) AS n FROM nation"
    " WHERE n_regionkey <= 1 ORDER BY n",
]


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in ["orders", "customer", "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


def test_register_tables_idempotent_and_complete(spark):
    names = api.register_tables(spark, SF)
    assert "lineitem" in names and "documents" in names
    again = api.register_tables(spark, SF)  # replace, not error
    assert set(again) == set(names)
    assert spark.table("orders").count() > 0


@pytest.mark.parametrize("q", ADHOC)
def test_adhoc_sql_matches_duckdb(spark, ducks, q):
    got = [tuple(r) for r in api.sql(spark, SF, q).collect()]
    want = [tuple(r) for r in ducks.execute(q).fetchall()]
    assert got == want


def test_adhoc_sql_pushes_filters_down(spark):
    df = api.sql(
        spark,
        SF,
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]" in plan
