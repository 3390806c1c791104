"""User-facing SQL front end: register the dataset's tables as temp
views once, then run arbitrary Spark SQL over them — the "bring your own
query" surface a user switching from the reference expects, on top of
the same ``read_table`` layer the catalog uses (so TIMESTAMP(NANOS)
handling, schema normalization, and scan pruning apply to ad-hoc SQL
too).

Catalyst treats a registered view exactly like the DataFrame it wraps:
filters and projections in the SQL text push down into the parquet scan,
joins pick broadcast/SMJ by size, AQE re-plans at runtime — nothing here
is interpreted, it is the same engine path as the catalog queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pw_etl_scrumptious_squad_spark.schemas import TESTDATA_SCHEMAS
from pw_etl_scrumptious_squad_spark.sources.parquet import (
    read_table,
    table_exists,
)


def register_tables(
    spark: SparkSession,
    base_dir: str,
    names: list[str] | None = None,
) -> list[str]:
    """Register every table under ``base_dir`` (or the given subset) as a
    temp view named after the table. Returns the registered names.
    Re-registering is idempotent (views are replaced)."""
    if names is None:
        names = [n for n in TESTDATA_SCHEMAS if table_exists(base_dir, n)]
    for n in names:
        read_table(spark, base_dir, n).createOrReplaceTempView(n)
    return names


def sql(spark: SparkSession, base_dir: str, query: str) -> DataFrame:
    """One-shot convenience: register the tables, run the statement."""
    register_tables(spark, base_dir)
    return spark.sql(query)
