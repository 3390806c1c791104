"""ORC source/sink — the second columnar at-rest format.

The reference's at-rest format is parquet (S4/S5;
``/root/reference/src/extract.py:122-156`` reads parquet drops); mixed
warehouses also land ORC (Hive-lineage pipelines), so the engine reads
and writes it natively — Spark bundles the vectorized native ORC reader
(``spark.sql.orc.impl=native``), with the same columnar properties that
make parquet the scale format: column pruning, predicate pushdown
(``spark.sql.orc.filterPushdown``), splittable stripes, per-stripe
statistics.

Same API shape as ``parquet.write_table``/``read_table``: explicit
overwrite semantics, optional hive-style partitioning. Timestamps are
written as ORC TIMESTAMP (no NANOS variant exists in the writer path,
so the parquet NANOS-robustness dance does not apply here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.format("orc").mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("orc").load(path)
