"""CSV / JSON-lines source connectors with enforced schemas.

The reference's only at-rest formats are parquet (S4/S5) and a Postgres
JDBC endpoint (S1–S3, S6); real ingestion pipelines also land delimited
and JSON-lines drops. These readers extend the source surface with the
two properties that matter at 100 TB:

- **Explicit schema, never inference.** ``inferSchema``/JSON sampling
  reads the ENTIRE input once before the real scan — doubling I/O on a
  100 TB drop — and silently changes types when a new file batch arrives.
  Schemas here come from the caller or ``TESTDATA_SCHEMAS``.
- **Quarantined corrupt records, never silent drops.** PERMISSIVE mode
  routes unparseable lines into a ``_corrupt_record`` column; callers
  split good/bad with :func:`split_corrupt` and land the bad rows in a
  dead-letter table instead of losing them (DROPMALFORMED) or failing a
  multi-hour job on one bad line (FAILFAST).

Both formats are splittable line-by-line (uncompressed or bgzip), so
Spark parallelizes a big drop across executors exactly like parquet —
but with no column pruning or predicate pushdown, so the connector is
for INGESTION; data should be rewritten to parquet (see
``parquet.write_table``) before repeated querying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: T.StructType) -> T.StructType:
    """The corrupt-record column must be part of the read schema for
    PERMISSIVE mode to populate it."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
    quarantine: bool = True,
) -> DataFrame:
    """Schema-enforced CSV read. With ``quarantine`` (default), malformed
    lines surface in ``_corrupt_record`` instead of aborting the scan or
    vanishing; without it, the read is FAILFAST (a bad line kills the job
    loudly — correct for curated hand-offs where corruption means a
    broken producer)."""
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE" if quarantine else "FAILFAST")
        # a record spanning lines via embedded newlines needs multiLine,
        # which kills splittability — keep it off; producers must escape
        .option("multiLine", False)
        .option("enforceSchema", True)
    )
    s = _schema_with_corrupt(schema) if quarantine else schema
    return reader.schema(s).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine: bool = True,
) -> DataFrame:
    """Schema-enforced JSON-lines read (one object per line; multi-line
    JSON arrays are not splittable and are rejected by convention)."""
    reader = spark.read.option(
        "mode", "PERMISSIVE" if quarantine else "FAILFAST"
    )
    s = _schema_with_corrupt(schema) if quarantine else schema
    return reader.schema(s).json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, dead_letter_rows). Dead letters
    keep only the raw line — the typed columns are null by definition.

    Spark refuses plans whose scan references ONLY ``_corrupt_record``
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the lazy
    re-parse would see the already-parsed row). The parsed frame is
    therefore cached before splitting, which is also what you want
    operationally: parse the drop once, serve both branches from the
    parse. At real ingestion scale, prefer landing the parsed frame to
    parquet once and splitting from THAT (one pass over the raw bytes);
    this helper is the in-memory equivalent for drop-sized inputs.
    """
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0).select(
            F.lit(None).cast("string").alias(CORRUPT_COL)
        )
    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    sep: str = ",",
    compression: str | None = "gzip",
) -> None:
    """CSV export (interchange with non-Spark consumers). Arrays/structs
    are not CSV-representable; callers serialize them first."""
    w = df.write.mode("overwrite").option("header", header).option("sep", sep)
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip"
) -> None:
    """JSON-lines export; nested types serialize naturally."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
