"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator catalog
(pw_etl_scrumptious_squad_spark.catalog) for the DuckDB-oracle correctness
gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pw_etl_scrumptious_squad_spark import catalog as _catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.catalog()["q01_pricing_summary"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: e.build for name, e in sorted(_catalog.catalog().items())}


ORACLE_SF_DIR = "/root/testdata/sf0.01"  # the driver's correctness scale


def oracle_sql(sf_dir: str = ORACLE_SF_DIR) -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL-expressible
    operators — the driver records a weaker rows-only check for those).

    Data-dependent oracles (e.g. s02's trained-centroid literals) are
    materialized for ``sf_dir`` — the driver compares at sf0.01, the
    default; in-repo checkers pass the directory they're checking.
    """
    return {
        name: _catalog.resolve_oracle(e, sf_dir)
        for name, e in sorted(_catalog.catalog().items())
        if e.oracle is not None
    }
