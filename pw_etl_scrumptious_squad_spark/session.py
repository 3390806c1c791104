"""SparkSession factory with defaults tuned for large-scale batch analytics.

100 TB posture (tested on local[N], designed for a 1000-executor cluster):

- **AQE on** (``spark.sql.adaptive.*``): runtime coalescing of shuffle
  partitions, skew-join splitting, and dynamic join-strategy switching mean
  one set of static configs survives a 100x scale-up.
- **Broadcast threshold 64 MiB**: every star-schema dimension in this engine
  (region/nation/supplier/currency/date and the totesys dims) stays far below
  this at any scale factor, so fact-dim joins are broadcast-hash joins with
  no shuffle of the fact side.
- **shuffle.partitions** defaults to 2x local cores; on a cluster set it
  high (2-3x total cores) and let AQE coalesce down — never the other way.
- **Session timezone UTC** and NTZ-friendly parquet reads so timestamp
  semantics match the reference's naive ``timestamp without time zone``
  (SURVEY.md §1.2) and the DuckDB oracle.
- **Arrow enabled** so any unavoidable Python boundary (Pandas UDFs in the
  multimodal/dedup paths) is batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "pw-etl-scrumptious-squad-spark"


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    session_tz: str = "UTC",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` so the same entry
    points run under the driver harness and on a real cluster (where the
    caller passes ``master=None`` via spark-submit and this just augments
    conf).
    """
    cpus = _cpus()
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", session_tz)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Parquet TIMESTAMP(NANOS) is unreadable by Spark otherwise; the
        # reader surfaces nanos as LongType and sources/parquet.py converts
        # to TIMESTAMP_NTZ (floor to micros, matching DuckDB's ns->us).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # PySpark 4's DataFrame error-context capture wraps EVERY
        # DataFrame/Column operation in up to four extra py4j
        # round-trips (getActiveSession + stackTrace-depth conf.get +
        # PySparkCurrentOrigin set/clear). Plan CONSTRUCTION for the
        # wide star/fingerprint builders measured 4475 py4j commands
        # with it on vs 1485 off — pure driver-side latency on every
        # query build, worth most on clusters where the driver is far
        # from the gateway. Plans, results, and executed bytecode are
        # identical; only error messages lose the "df['x'] referenced
        # at file:line" breadcrumb.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
