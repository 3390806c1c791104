"""JDBC source/sink (reference operators S1/S2/S3/S6).

The reference talks to Postgres through pg8000 cursors row-at-a-time
(``src/extract.py:92-119``) and loads through SQLAlchemy ``to_sql`` in
1000-row chunks (``src/load.py:97-110``). Spark's JDBC data source replaces
both: reads are partitioned range scans with predicate pushdown, writes are
batched prepared-statement inserts from every executor in parallel.

No database (or JDBC driver jar) ships in the test container, so these
helpers build fully-configured readers/writers and pure SQL strings; the
query-construction logic is unit-tested, the actual round-trip is exercised
only when a real warehouse URL is supplied.

Scale notes:
- Reads accept ``partition_column/num_partitions`` so a big source table
  becomes N parallel range scans instead of one executor pulling 100 TB
  through a single cursor.
- The CDC predicate is baked into the pushed-down ``dbtable`` subquery, so
  the source database does the delta filtering exactly like the reference's
  ``WHERE created_at > .. OR last_updated > ..`` (``src/extract.py:110-112``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

DISCOVER_TABLES_SQL = (
    "SELECT table_name FROM information_schema.tables "
    "WHERE table_schema = '{schema}' AND table_type = 'BASE TABLE'"
)

# Catalog discovery for warehouses without information_schema (used by the
# embedded-Derby round-trip tests; any {schema}-templated query works).
DISCOVER_TABLES_SQL_DERBY = (
    "SELECT t.tablename FROM SYS.SYSTABLES t "
    "JOIN SYS.SYSSCHEMAS s ON t.schemaid = s.schemaid "
    "WHERE s.schemaname = '{schema}' AND t.tabletype = 'T'"
)

# SQL built for the JDBC dbtable option is string-assembled (the JDBC
# source takes no bound parameters there), so identifiers and timestamp
# literals are allowlist-validated before interpolation — the reference's
# raw f-string SQL (src/extract.py:106-119) is injection-shaped.
_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")
_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d{1,9})?)?$"
)


def _check_ident(name: str, what: str = "identifier") -> str:
    """Validate a (possibly schema-qualified) SQL identifier. Raises on
    anything that could break out of identifier position."""
    for part in name.split("."):
        if not _IDENT_RE.match(part):
            raise ValueError(f"unsafe SQL {what}: {name!r}")
    return name


def _quote_ident(name: str, what: str = "identifier") -> str:
    """Validate then double-quote each part of a (possibly qualified)
    identifier. Quoting makes reserved words (the reference schema's
    ``transaction`` table) legal in any warehouse; for the snake_case
    names used throughout, quoted-lowercase is identical to unquoted on
    case-folding engines like Postgres."""
    _check_ident(name, what)
    return ".".join(f'"{part}"' for part in name.split("."))


def _ts_literal(value: datetime | str) -> str:
    """Render a timestamp as a quoted SQL literal; strings must already
    look like ISO timestamps (no quotes/escapes can reach the SQL)."""
    if isinstance(value, datetime):
        return value.isoformat(sep=" ")
    if not _TS_RE.match(value):
        raise ValueError(f"unsafe timestamp literal: {value!r}")
    return value


@dataclass(frozen=True)
class JdbcConfig:
    """Connection config (reference pulls this from SecretsManager or .env —
    ``src/extract.py:23-74``; here it's explicit and injectable)."""

    url: str  # jdbc:postgresql://host:port/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"
    schema: str = "public"
    # {schema}-templated catalog query; swap for warehouses that don't
    # speak information_schema (e.g. DISCOVER_TABLES_SQL_DERBY)
    discover_sql: str = DISCOVER_TABLES_SQL

    def apply(self, reader: DataFrameReader) -> DataFrameReader:
        return (
            reader.format("jdbc")
            .option("url", self.url)
            .option("user", self.user)
            .option("password", self.password)
            .option("driver", self.driver)
        )


def cdc_subquery(
    table: str, created_after: datetime | str, updated_after: datetime | str
) -> str:
    """The incremental-extract subquery (reference ``get_recents_table``,
    ``src/extract.py:106-119``): strict ``>`` on either audit timestamp.

    Kept strict-`>` for parity; the batch CDC plan layers a natural-key dedup
    on top so re-extraction can safely switch to ``>=`` (SURVEY.md §2.3).
    Identifiers and timestamps are allowlist-validated (see module note).
    """
    # {ts '...'} is the JDBC timestamp escape — the driver rewrites it to
    # the warehouse's native literal (verified against Postgres syntax and
    # live embedded Derby), unlike ANSI TIMESTAMP '...' which Derby rejects.
    # Audit columns are double-quoted: Spark's JDBC writer creates quoted
    # (case-exact) column names, and unquoted identifiers fold to the
    # warehouse's default case (upper on Derby) and would miss them;
    # quoted-lowercase equals unquoted-lowercase on Postgres.
    return (
        f"(SELECT * FROM {_quote_ident(table, 'table')} "
        f"WHERE \"created_at\" > {{ts '{_ts_literal(created_after)}'}} "
        f"OR \"last_updated\" > {{ts '{_ts_literal(updated_after)}'}})"
        " AS cdc_src"
    )


def discover_tables_subquery(
    schema: str = "public", sql: str = DISCOVER_TABLES_SQL
) -> str:
    """Catalog discovery (reference ``get_titles``, ``src/extract.py:77-89``)."""
    return f"({sql.format(schema=_check_ident(schema, 'schema'))}) AS t"


def read_table(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Full-table scan (reference ``get_whole_table``, ``src/extract.py:92-103``),
    parallelized into range partitions when a numeric key is given."""
    reader = cfg.apply(spark.read).option("dbtable", _quote_ident(table, "table"))
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def read_incremental(
    spark: SparkSession,
    cfg: JdbcConfig,
    table: str,
    created_after: datetime | str,
    updated_after: datetime | str,
) -> DataFrame:
    """Predicated (incremental) scan, predicate pushed into the source DB
    (reference ``get_recents_table``, ``src/extract.py:106-119``)."""
    reader = cfg.apply(spark.read).option(
        "dbtable", cdc_subquery(table, created_after, updated_after)
    )
    return reader.load()


def discover_tables(spark: SparkSession, cfg: JdbcConfig) -> list[str]:
    """List base tables in the configured schema (reference ``get_titles``)."""
    df = cfg.apply(spark.read).option(
        "dbtable", discover_tables_subquery(cfg.schema, cfg.discover_sql)
    ).load()
    return [row[0] for row in df.collect()]


def append_table(
    df: DataFrame,
    cfg: JdbcConfig,
    table: str,
    batch_size: int = 1000,
    num_partitions: int | None = None,
) -> None:
    """Warehouse append sink (reference ``to_sql(..., if_exists='append',
    chunksize=1000, method='multi')`` — ``src/load.py:97-110``).

    ``batchsize`` mirrors the 1000-row chunking; ``num_partitions`` bounds
    concurrent connections against the warehouse.
    """
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    (
        df.write.format("jdbc")
        .option("url", cfg.url)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", cfg.driver)
        .option(
            "dbtable",
            f"{_quote_ident(cfg.schema, 'schema')}.{_quote_ident(table, 'table')}",
        )
        .option("batchsize", str(batch_size))
        .mode("append")
        .save()
    )


def execute_update(spark: SparkSession, cfg: JdbcConfig, sql: str) -> int:
    """Run one DML/DDL statement against the database through the JVM's
    ``DriverManager`` (the JDBC driver jars are already on Spark's
    classpath — same ones the DataFrame reader/writer use). Returns the
    update count. This is the side-channel a transactional foreachBatch
    sink needs (DELETE of a replayed batch id) that the DataFrame writer
    API deliberately doesn't expose."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName(cfg.driver)
    props = jvm.java.util.Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    conn = jvm.java.sql.DriverManager.getConnection(cfg.url, props)
    try:
        stmt = conn.createStatement()
        try:
            return stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def register_catalog(
    spark: SparkSession,
    cfg: JdbcConfig,
    name: str = "src",
    push_down_aggregate: bool = True,
    push_down_limit: bool = True,
) -> str:
    """Register the connection as a Spark DSv2 JDBC CATALOG, upgrading
    the surface from the v1 reader (filter pushdown only) to v2
    pushdown of AGGREGATES and LIMIT into the source database.

    The payoff is the reference's watermark recovery (R5,
    ``src/extract.py:176-199``): ``SELECT max(created_at),
    max(last_updated) FROM {name}.{schema}.{table}`` now executes
    entirely inside the source DB — the extract job transfers ONE row
    instead of scanning the table through JDBC, which at a 100 TB
    source is the difference between a metadata ping and a full read.
    Verified live against embedded Derby (plan shows
    ``PushedAggregates``; `tests/test_jdbc_roundtrip.py`).
    """
    _check_ident(name, "catalog name")
    spark.conf.set(
        f"spark.sql.catalog.{name}",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
    )
    spark.conf.set(f"spark.sql.catalog.{name}.url", cfg.url)
    spark.conf.set(f"spark.sql.catalog.{name}.driver", cfg.driver)
    if cfg.user:
        spark.conf.set(f"spark.sql.catalog.{name}.user", cfg.user)
    if cfg.password:
        spark.conf.set(f"spark.sql.catalog.{name}.password", cfg.password)
    spark.conf.set(
        f"spark.sql.catalog.{name}.pushDownAggregate",
        "true" if push_down_aggregate else "false",
    )
    spark.conf.set(
        f"spark.sql.catalog.{name}.pushDownLimit",
        "true" if push_down_limit else "false",
    )
    return name


def probe_watermarks(
    spark: SparkSession,
    cfg: JdbcConfig,
    tables: list[str],
    catalog_name: str = "wmprobe",
) -> dict[str, tuple]:
    """One pushed-down max-agg per table: ``(max(created_at),
    max(last_updated))`` evaluated INSIDE the source database via the
    DSv2 catalog (see :func:`register_catalog`) — one row over the wire
    per table, no table scan through JDBC.

    This is the reference's watermark recovery (R5) turned into a
    pre-extract change probe: a CDC cycle compares these against its
    stored watermarks and skips the delta query entirely for unchanged
    tables. On an 11-table source polled every 3 minutes where most
    tables change rarely, most cycles become 11 metadata pings.
    """
    register_catalog(spark, cfg, catalog_name)
    out: dict[str, tuple] = {}
    for t in tables:
        _check_ident(t.split(".")[-1], "table")
        row = spark.sql(
            "SELECT max(`created_at`) AS c, max(`last_updated`) AS u"
            f" FROM {catalog_name}.{cfg.schema}.{t.split('.')[-1]}"
        ).collect()[0]
        out[t] = (row["c"], row["u"])
    return out
