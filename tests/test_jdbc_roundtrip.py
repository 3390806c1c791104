"""REAL JDBC round-trip against embedded Apache Derby (ships in Spark's
jars for the Hive metastore): S1 catalog discovery, S2 full/partitioned
scans, S3 pushed-down CDC extraction, S6 batched append — the reference's
whole database surface (src/extract.py, src/load.py) against an actual
database instead of constructed-SQL unit tests."""

import datetime as dt

import pytest

from pw_etl_scrumptious_squad_spark.sources import jdbc as J


@pytest.fixture()
def cfg(tmp_path):
    return J.JdbcConfig(
        url=f"jdbc:derby:{tmp_path}/wh;create=true",
        user="app",
        password="",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        schema="APP",
        discover_sql=J.DISCOVER_TABLES_SQL_DERBY,
    )


def _seed(spark, cfg, table="customers"):
    t0 = dt.datetime(2023, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2023, 6, 1, 0, 0, 0)
    t2 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "ada", t0, t0),
        (2, "bob", t0, t1),   # updated after t0
        (3, "cyd", t1, t1),
        (4, "dee", t2, t2),   # created after t1
    ]
    df = spark.createDataFrame(
        rows,
        "id INT, name STRING, created_at TIMESTAMP, last_updated TIMESTAMP",
    )
    J.append_table(df, cfg, table, batch_size=2, num_partitions=1)
    return rows


def test_append_then_full_scan_roundtrip(spark, cfg):
    rows = _seed(spark, cfg)
    back = J.read_table(spark, cfg, "APP.customers")
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)
    # second append duplicates (reference load semantics, src/load.py:97-110);
    # keyed upsert is the parquet-side fix (sources/parquet.upsert_table)
    _seed(spark, cfg)
    assert J.read_table(spark, cfg, "APP.customers").count() == 8


def test_partitioned_parallel_scan(spark, cfg):
    _seed(spark, cfg)
    df = J.read_table(
        spark,
        cfg,
        "APP.customers",
        partition_column="id",
        lower_bound=1,
        upper_bound=5,
        num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 4  # range partitioning never drops rows


def test_cdc_incremental_scan_pushed_down(spark, cfg):
    _seed(spark, cfg)
    # strict-> on either audit column, evaluated BY THE DATABASE
    delta = J.read_incremental(
        spark,
        cfg,
        "APP.customers",
        created_after=dt.datetime(2023, 3, 1),
        updated_after=dt.datetime(2023, 3, 1),
    )
    assert sorted(r["id"] for r in delta.collect()) == [2, 3, 4]
    none = J.read_incremental(
        spark, cfg, "APP.customers", "2025-01-01 00:00:00",
        "2025-01-01 00:00:00",
    )
    assert none.count() == 0


def test_catalog_discovery(spark, cfg):
    _seed(spark, cfg, table="orders_wh")
    tables = J.discover_tables(spark, cfg)
    assert "ORDERS_WH" in [t.upper() for t in tables]


@pytest.mark.extended  # ~57 s; default tier: test_run_batch_etl (same
# transform via the batch driver), the per-step jdbc_roundtrip tests
# (append/scan, CDC drift), and the c11 star-lifecycle oracle
def test_end_to_end_etl_between_live_databases(spark, totesys, tmp_path):
    """The reference's whole lifecycle with real databases on both ends:
    seed an OLTP Derby, JDBC-CDC extract -> 11-table star transform ->
    batched JDBC load into a second Derby warehouse, then verify the
    warehouse contents and that a second extraction cycle is empty."""
    from pw_etl_scrumptious_squad_spark.plans import etl

    src = J.JdbcConfig(
        url=f"jdbc:derby:{tmp_path}/oltp;create=true",
        user="app",
        password="",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        schema="APP",
        discover_sql=J.DISCOVER_TABLES_SQL_DERBY,
    )
    wh = J.JdbcConfig(
        url=f"jdbc:derby:{tmp_path}/wh;create=true",
        user="app",
        password="",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        schema="APP",
        discover_sql=J.DISCOVER_TABLES_SQL_DERBY,
    )
    for name, df in totesys.items():
        J.append_table(df, src, name, num_partitions=1)

    star = etl.run_batch_etl_jdbc(
        spark, src, wh, str(tmp_path / "staging"), str(tmp_path / "state")
    )
    assert len(star) == 11

    # warehouse holds all 11 star tables with the expected contents
    wh_tables = {t.upper() for t in J.discover_tables(spark, wh)}
    assert {
        "DIM_DATE", "DIM_CURRENCY", "FACT_SALES_ORDER", "FACT_PAYMENT",
    } <= wh_tables
    fact = J.read_table(spark, wh, "APP.fact_sales_order")
    assert fact.count() == totesys["sales_order"].count()
    assert '"unit price"' in " ".join(f'"{c}"' for c in fact.columns)
    dim_date = J.read_table(spark, wh, "APP.dim_date")
    assert dim_date.count() == 731

    # second cycle: watermarks advanced, the DB-side CDC returns nothing
    deltas2 = etl.extract_jdbc(
        spark, src, str(tmp_path / "staging2"), str(tmp_path / "state")
    )
    assert all(df.count() == 0 for df in deltas2.values())


def test_v2_catalog_pushes_watermark_aggregate_into_db(spark, cfg):
    """The DSv2 JDBC catalog pushes the R5 watermark max-agg INTO the
    source database: the plan carries PushedAggregates and the scan's
    external query is the aggregate itself — one row over the wire."""
    import contextlib
    import io

    rows = _seed(spark, cfg)
    J.register_catalog(spark, cfg, name="derbysrc")
    q = spark.sql(
        "SELECT max(`created_at`) AS w_created,"
        " max(`last_updated`) AS w_updated"
        " FROM derbysrc.APP.customers"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedAggregates" in plan
    assert "MAX" in plan
    got = q.collect()[0]
    assert got["w_created"] == max(r[2] for r in rows)
    assert got["w_updated"] == max(r[3] for r in rows)

    # LIMIT: Spark's DerbyDialect does not advertise limit pushdown
    # (no PushedLimit in the plan — the FETCH FIRST rewrite is dialect
    # work Spark hasn't done for Derby); correctness is unaffected.
    # Postgres/MySQL dialects DO push it through this same catalog path.
    lq = spark.sql("SELECT * FROM derbysrc.APP.customers LIMIT 2")
    assert lq.count() == 2


def test_probe_skips_unchanged_tables(spark, cfg, tmp_path, monkeypatch):
    """extract_jdbc(probe=True): after a first cycle, an unchanged table
    must be skipped WITHOUT issuing the CDC delta query (the pushed-down
    one-row probe decides); after an insert, the delta query runs and
    picks up exactly the new row."""
    from pw_etl_scrumptious_squad_spark.plans import etl
    from pw_etl_scrumptious_squad_spark.sources import jdbc as realjdbc

    _seed(spark, cfg)
    state = str(tmp_path / "wm")
    staging = str(tmp_path / "stage")
    first = etl.extract_jdbc(
        spark, cfg, staging, state, tables=["customers"]
    )
    assert first["customers"].count() == 4

    # cycle 2, nothing changed: the CDC query must NOT run
    real_incremental = realjdbc.read_incremental

    def _forbidden(*a, **k):
        raise AssertionError("CDC query issued despite unchanged probe")

    monkeypatch.setattr(realjdbc, "read_incremental", _forbidden)
    second = etl.extract_jdbc(
        spark, cfg, staging, state, tables=["customers"], probe=True
    )
    assert second["customers"].count() == 0

    # new row arrives: probe sees the advanced max and the CDC query runs
    monkeypatch.setattr(realjdbc, "read_incremental", real_incremental)
    realjdbc.execute_update(
        spark,
        cfg,
        'INSERT INTO "APP"."customers" VALUES'
        " (5, 'eve', {ts '2025-01-01 00:00:00'}, {ts '2025-01-01 00:00:00'})",
    )
    third = etl.extract_jdbc(
        spark, cfg, staging, state, tables=["customers"], probe=True
    )
    rows = third["customers"].collect()
    assert len(rows) == 1 and rows[0]["id"] == 5


def test_cdc_schema_drift_add_column_between_cycles(spark, cfg, tmp_path):
    """Round-10 verdict item 7: a live source is not frozen — an
    ALTER TABLE ADD COLUMN between extract cycles must flow through
    (SELECT * picks it up) and the keyed merge into the lake must
    NULL-backfill the new column on pre-drift history rather than die
    on a column-count union mismatch; a TYPE change of an existing
    column must fail loudly instead of silently casting."""
    from pw_etl_scrumptious_squad_spark.plans import etl
    from pw_etl_scrumptious_squad_spark.sources import parquet as lake

    _seed(spark, cfg)
    staging, state, wh = (
        str(tmp_path / "stage"), str(tmp_path / "wm"), str(tmp_path / "lake")
    )
    first = etl.extract_jdbc(spark, cfg, staging, state, tables=["customers"])
    assert first["customers"].count() == 4
    lake.upsert_table(spark, first["customers"], wh, "customers", ["id"])

    # DDL between cycles + a post-drift row
    J.execute_update(
        spark, cfg,
        'ALTER TABLE "APP"."customers" ADD COLUMN "loyalty_tier" VARCHAR(10)',
    )
    J.execute_update(
        spark, cfg,
        'INSERT INTO "APP"."customers" VALUES (5, \'eve\','
        " {ts '2025-01-01 00:00:00'}, {ts '2025-01-01 00:00:00'}, 'gold')",
    )
    second = etl.extract_jdbc(spark, cfg, staging, state, tables=["customers"])
    assert "loyalty_tier" in second["customers"].columns
    rows = second["customers"].collect()
    assert len(rows) == 1 and rows[0]["loyalty_tier"] == "gold"

    # cycle-2 merge is green; old rows carry NULL in the new column
    lake.upsert_table(spark, second["customers"], wh, "customers", ["id"])
    got = {
        r["id"]: r["loyalty_tier"]
        for r in lake.snapshot_read(spark, wh, "customers").collect()
    }
    assert got == {1: None, 2: None, 3: None, 4: None, 5: "gold"}

    # a retired column: delta without 'name' merges, history keeps it
    import datetime as dtm

    t = dtm.datetime(2026, 1, 1)
    no_name = spark.createDataFrame(
        [(6, t, t, "silver")],
        "id INT, created_at TIMESTAMP, last_updated TIMESTAMP,"
        " loyalty_tier STRING",
    )
    lake.upsert_table(spark, no_name, wh, "customers", ["id"])
    back = {
        r["id"]: (r["name"], r["loyalty_tier"])
        for r in lake.snapshot_read(spark, wh, "customers").collect()
    }
    assert back[6] == (None, "silver") and back[1][0] == "ada"

    # type change of an existing column: loud error, no silent cast
    bad = spark.createDataFrame(
        [(7, 123, t, t, "x")],
        "id INT, name BIGINT, created_at TIMESTAMP,"
        " last_updated TIMESTAMP, loyalty_tier STRING",
    )
    with pytest.raises(TypeError, match="type changed"):
        lake.upsert_table(spark, bad, wh, "customers", ["id"])


def test_upsert_refuses_delta_missing_key_column(spark, tmp_path):
    """A delta that lost its merge KEY must be refused, never NULL-filled:
    alignment would collapse every delta row onto one NULL key and
    merge-destroy unrelated history."""
    from pw_etl_scrumptious_squad_spark.sources import parquet as lake

    wh = str(tmp_path / "lake")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, name STRING")
    lake.upsert_table(spark, base, wh, "t", ["id"])
    keyless = spark.createDataFrame([("c",)], "name STRING")
    with pytest.raises(ValueError, match="missing key column"):
        lake.upsert_table(spark, keyless, wh, "t", ["id"])
