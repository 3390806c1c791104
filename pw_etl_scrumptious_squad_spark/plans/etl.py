"""Batch ETL plan: extract -> transform -> load (reference's three Lambdas).

The reference runs three separate processes on EventBridge cron schedules,
handing off through S3 parquet (SURVEY.md §3). Here each stage is a pure
function over ``dict[str, DataFrame]`` inside one SparkSession; the stages
still compose through a parquet lake (so they can also run as independent
scheduled jobs), but nothing forces three processes — one driver submits all
stages and Catalyst sees the whole plan.

transform() maps the reference ``transform()`` (``src/transform.py:256-308``):
11 OLTP inputs -> 8 dims + 3 facts. Unlike the reference, missing inputs are
an explicit error up front rather than a mid-build crash
(``src/transform.py`` assumes all 11 exist — SURVEY.md §3.2 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pw_etl_scrumptious_squad_spark.operators import dims, facts
from pw_etl_scrumptious_squad_spark.operators.cdc import incremental_extract
from pw_etl_scrumptious_squad_spark.schemas import OLTP_SCHEMAS
from pw_etl_scrumptious_squad_spark.sources import parquet as lake
from pw_etl_scrumptious_squad_spark.sources.state import WatermarkStore

OLTP_TABLES = sorted(OLTP_SCHEMAS)


def extract(
    spark: SparkSession,
    source_dir: str,
    staging_dir: str,
    state_path: str,
    inclusive: bool = False,
) -> dict[str, DataFrame]:
    """Incremental extract from parquet snapshots (the JDBC variant swaps
    ``lake.read_table`` for ``jdbc.read_incremental`` — same plan shape).

    Writes only non-empty deltas to the staging lake, overwriting per table —
    the reference's delta-propagation contract (``src/extract.py:250-253``).
    """
    snapshots = {
        name: lake.read_table(spark, source_dir, name, OLTP_SCHEMAS[name])
        for name in OLTP_TABLES
        if lake.table_exists(source_dir, name)
    }
    store = WatermarkStore(spark, state_path)
    deltas = incremental_extract(snapshots, store, inclusive=inclusive)
    for name, df in deltas.items():
        lake.write_table(df, staging_dir, name)
    return deltas


def transform(tables: dict[str, DataFrame], spark: SparkSession) -> dict[str, DataFrame]:
    """All 11 star-schema builders (reference ``src/transform.py:256-308``)."""
    missing = [t for t in OLTP_TABLES if t not in tables]
    if missing:
        raise ValueError(f"transform requires all 11 OLTP tables; missing: {missing}")
    return {
        "dim_date": dims.create_dim_date(spark),
        "dim_staff": dims.create_dim_staff(tables["staff"], tables["department"]),
        "dim_location": dims.create_dim_location(tables["address"]),
        "dim_currency": dims.create_dim_currency(tables["currency"]),
        "dim_design": dims.create_dim_design(tables["design"]),
        "dim_counterparty": dims.create_dim_counterparty(
            tables["address"], tables["counterparty"]
        ),
        "dim_transaction": dims.create_dim_transaction(tables["transaction"]),
        "dim_payment_type": dims.create_dim_payment_type(tables["payment_type"]),
        "fact_sales_order": facts.create_fact_sales_order(tables["sales_order"]),
        "fact_purchase_order": facts.create_fact_purchase_order(
            tables["purchase_order"]
        ),
        "fact_payment": facts.create_fact_payment(tables["payment"]),
    }


def load(star: dict[str, DataFrame], warehouse_dir: str, mode: str = "append") -> None:
    """Load stage. Parquet-lake warehouse variant; the JDBC variant calls
    ``sources.jdbc.append_table`` per table (reference ``src/load.py:97-110``).

    Facts are partitioned by ``created_date`` for partition pruning at scale
    (the reference writes flat files; SURVEY.md §4 'partition pruning: none').
    """
    for name, df in star.items():
        partition_by = ["created_date"] if name.startswith("fact_") else None
        lake.write_table(df, warehouse_dir, name, mode=mode, partition_by=partition_by)


def load_transactional(star: dict[str, DataFrame], warehouse_dir: str) -> int:
    """Load stage with CROSS-TABLE atomicity: every star table publishes
    a versioned snapshot (publish-then-claim, never overwriting the
    live data a concurrent reader has file-listed), then ONE warehouse
    marker pins the whole ``{table: version}`` set. A reader using
    ``sources.warehouse.read_warehouse_snapshot`` can never join this
    cycle's dim against last cycle's fact, and a crash mid-load
    publishes nothing. Returns the warehouse snapshot id."""
    from pw_etl_scrumptious_squad_spark.sources import warehouse as wh

    pinned = {}
    for name, df in star.items():
        partition_by = ["created_date"] if name.startswith("fact_") else None
        pinned[name] = lake.write_table_snapshot(
            df, warehouse_dir, name, partition_by=partition_by
        )
    return wh.commit_warehouse_snapshot(warehouse_dir, pinned)


def run_batch_etl(
    spark: SparkSession,
    source_dir: str,
    staging_dir: str,
    warehouse_dir: str,
    state_path: str,
    alert_manager=None,
) -> dict[str, DataFrame]:
    """Full E->T->L cycle over a parquet OLTP snapshot.

    ``alert_manager`` (an :class:`~pw_etl_scrumptious_squad_spark.alerts.
    AlertManager`, optional) closes the reference's alarm->notification
    surface (``terraform/alarm.tf``): the fact_payment load is observed
    with the standard DQ counters (Observation rides the load action —
    no second pass) and the manager's thresholds are evaluated once per
    batch, firing its sink per violation."""
    extract(spark, source_dir, staging_dir, state_path)
    # Transform reads the staging lake on its own schedule in the reference;
    # full dims are re-derived each cycle (SURVEY.md §2.3). Here we re-read
    # the *source* snapshot for dims correctness and use staged deltas for
    # facts when present.
    tables = {
        name: lake.read_table(spark, source_dir, name, OLTP_SCHEMAS[name])
        for name in OLTP_TABLES
    }
    star = transform(tables, spark)
    obs = None
    if alert_manager is not None:
        from pw_etl_scrumptious_squad_spark.operators import dq

        observed_fact, obs = dq.observed(
            star["fact_payment"],
            "fact_payment_load",
            dq.standard_counters("payment_id", "payment_amount"),
        )
        star = dict(star, fact_payment=observed_fact)
    load(star, warehouse_dir, mode="overwrite")
    if alert_manager is not None:
        alert_manager.evaluate(obs.get, context="fact_payment_load")
    return star


def extract_jdbc(
    spark: SparkSession,
    cfg,
    staging_dir: str,
    state_path: str,
    tables: list[str] | None = None,
    probe: bool = False,
) -> dict[str, DataFrame]:
    """Incremental extract from a LIVE JDBC source: the CDC predicate is
    pushed into the database (reference ``src/extract.py:106-119`` —
    the DB does the delta filtering), watermarks advance from a
    distributed max-agg over each delta, and non-empty deltas stage to
    the parquet lake exactly like the parquet-snapshot variant.

    Per-table cost is the DB's index scan over the audit columns plus
    transfer of the delta rows only — the property that keeps a 3-minute
    cadence viable when the source is 10^9 rows.

    The delta is executed ONCE against the live source and pinned to
    disk: persist + count (one DB execution), stage to parquet, then the
    watermark max-agg and the RETURNED frame read the staged copy — not
    the JDBC scan, and not the Spark cache either (eviction would lazily
    re-execute the scan, letting rows committed since slip above the
    recorded watermark: staged contents, returned deltas and the
    watermark could diverge — at-least-once duplicates for append-mode
    consumers). Empty deltas return a literal empty frame for the same
    reason: a re-executed "empty" scan may no longer be empty.

    Schema drift (round 10): the CDC subquery is ``SELECT *``, so an
    upstream ``ALTER TABLE ADD COLUMN`` lands in the next delta
    automatically; the keyed merge path (``parquet.upsert_table``)
    NULL-backfills the new column onto already-loaded history and
    keeps retired columns as NULLs on new rows, while a TYPE change of
    an existing column fails loudly (``_align_evolving``) — never a
    silent cast. E2E-pinned against a live-Derby
    ``ALTER TABLE ADD COLUMN`` between cycles in
    tests/test_jdbc_roundtrip.py.

    ``probe=True`` prepends a pushed-down source-side watermark probe
    (``jdbc.probe_watermarks`` — one max-agg ROW per table, evaluated by
    the database): tables whose source maxima have not advanced past the
    stored watermark skip the CDC query entirely. The strict-``>``
    predicate makes the skip exact — a row qualifies only if some audit
    timestamp exceeds the stored watermark, which the probe would have
    seen. Most cycles on a rarely-changing source become metadata pings.
    """
    from pw_etl_scrumptious_squad_spark.sources import jdbc
    from pw_etl_scrumptious_squad_spark.sources.state import delta_watermark

    names = tables if tables is not None else OLTP_TABLES
    store = WatermarkStore(spark, state_path)
    probed = jdbc.probe_watermarks(spark, cfg, names) if probe else {}
    deltas: dict[str, DataFrame] = {}
    for name in names:
        wm = store.get(name)
        if probe:
            src_c, src_u = probed[name]
            unchanged_c = src_c is None or src_c <= wm.created_at
            unchanged_u = src_u is None or src_u <= wm.last_updated
            if unchanged_c and unchanged_u:
                # metadata-only schema resolution; no row transfer
                schema = cfg.apply(spark.read).option(
                    "dbtable",
                    jdbc.cdc_subquery(
                        f"{cfg.schema}.{name}", wm.created_at, wm.last_updated
                    ),
                ).load().schema
                deltas[name] = spark.createDataFrame([], schema)
                continue
        delta = jdbc.read_incremental(
            spark,
            cfg,
            f"{cfg.schema}.{name}",
            wm.created_at,
            wm.last_updated,
        ).persist()
        n_rows = delta.count()  # the single execution against the DB
        if n_rows > 0:
            lake.write_table(delta, staging_dir, name)
            staged = lake.read_table(spark, staging_dir, name, delta.schema)
            store.advance(name, delta_watermark(staged))
            deltas[name] = staged
        else:
            deltas[name] = spark.createDataFrame([], delta.schema)
        delta.unpersist()
    return deltas


def load_jdbc(star: dict[str, DataFrame], cfg, batch_size: int = 1000) -> None:
    """Warehouse load over JDBC: batched appends per star table
    (reference ``src/load.py:97-110``; ``num_partitions`` bounds
    concurrent warehouse connections)."""
    from pw_etl_scrumptious_squad_spark.sources import jdbc

    for name, df in star.items():
        jdbc.append_table(df, cfg, name, batch_size=batch_size, num_partitions=2)


def run_batch_etl_jdbc(
    spark: SparkSession,
    source_cfg,
    warehouse_cfg,
    staging_dir: str,
    state_path: str,
) -> dict[str, DataFrame]:
    """The reference's full lifecycle with REAL databases on both ends:
    JDBC CDC extract -> star-schema transform -> batched JDBC load
    (src/extract.py -> src/transform.py -> src/load.py). Dims re-derive
    from the full source each cycle (reference §2.3 semantics); the
    staged deltas remain available for delta-only fact processing."""
    from pw_etl_scrumptious_squad_spark.sources import jdbc

    extract_jdbc(spark, source_cfg, staging_dir, state_path)
    tables = {
        name: jdbc.read_table(
            spark, source_cfg, f"{source_cfg.schema}.{name}"
        )
        for name in OLTP_TABLES
    }
    star = transform(tables, spark)
    load_jdbc(star, warehouse_cfg)
    return star
