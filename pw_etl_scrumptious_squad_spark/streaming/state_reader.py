"""Streaming-state observability: read a query's state store as data.

At 100 TB a stateful stream (watermarked dedup, windowed rollups,
`applyInPandasWithState` processors) accumulates gigabytes of opaque
state under its checkpoint; when a pipeline misbehaves the FIRST
operational question is "what is actually IN the state store, and is
it draining?". Spark 4's State Data Source answers it with two batch
read formats over the checkpoint directory — no reprocessing, no
query restart, no state-store API code:

- ``state-metadata``: one row per stateful operator per store
  (operator id/name, store name, partition count, min/max batch id) —
  the map of what state exists;
- ``statestore``: the live key/value rows of one store at one batch
  (defaults: operator 0, store "default", the LAST committed batch) —
  supports time travel by ``batchId`` and per-side reads of
  stream-stream join state via ``joinSide``.

These wrappers pin the option names and compose the two into the
``state_summary`` health row a monitoring job would publish alongside
``streaming_cardinality_monitor``'s output. All reads are bounded by
state size, never by corpus size, and run as ordinary batch scans —
partitioned like the store itself (one task per state partition).

No reference counterpart (the reference's pipeline is stateless
Lambda-cron, SURVEY.md §2.3 maps its semantics); this extends the
repo's streaming surface (streaming/pipeline.py) the same way
alerts.py extends its DQ metrics — the observability half of an
operator family that already has the compute half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """One row per stateful operator/store under ``checkpoint_dir``:
    (operatorId, operatorName, stateStoreName, numPartitions,
    minBatchId, maxBatchId, ...)."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_state(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int | None = None,
    store_name: str | None = None,
    batch_id: int | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Key/value rows of one state store as a batch DataFrame
    (``key struct, value struct, partition_id``).

    Defaults follow the data source: operator 0, store "default", the
    last committed batch. ``batch_id`` time-travels to any retained
    batch (bounded by ``minBatchId`` in :func:`state_metadata`);
    ``join_side`` ("left"/"right") reads one side of stream-stream
    join state instead of ``store_name``. transformWithState
    queries additionally expose named state variables via the source's
    ``stateVarName`` option — exercising that here is env-gated for
    the same reason as the TWS parity test (the TWS worker needs
    google.protobuf, absent in this container)."""
    reader = spark.read.format("statestore")
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    return reader.load(checkpoint_dir)


def state_summary(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """Per-operator state health: metadata columns plus the CURRENT
    row count of each store — the "is state draining or growing?"
    number a monitor publishes per trigger. The driver loop is bounded
    by the number of stateful operators (a handful), never by state
    size; each count is a distributed scan of that store."""
    rows = []
    seen_joins: set[int] = set()
    for m in state_metadata(spark, checkpoint_dir).collect():
        # a stream-stream join lists its FOUR internal stores
        # (left/right x keyToNumValues/keyWithIndexToValue) in the
        # metadata, but its state is READ per join side — collapse to
        # two logical rows per join operator
        if m["operatorName"] == "symmetricHashJoin":
            if m["operatorId"] in seen_joins:
                continue
            seen_joins.add(int(m["operatorId"]))
            for side in ("left", "right"):
                n = read_state(
                    spark, checkpoint_dir,
                    operator_id=m["operatorId"], join_side=side,
                ).count()
                rows.append(
                    (
                        int(m["operatorId"]),
                        m["operatorName"],
                        side,
                        int(m["numPartitions"]),
                        int(m["minBatchId"]),
                        int(m["maxBatchId"]),
                        int(n),
                    )
                )
            continue
        n = read_state(
            spark, checkpoint_dir,
            operator_id=m["operatorId"],
            store_name=m["stateStoreName"],
        ).count()
        rows.append(
            (
                int(m["operatorId"]),
                m["operatorName"],
                m["stateStoreName"],
                int(m["numPartitions"]),
                int(m["minBatchId"]),
                int(m["maxBatchId"]),
                int(n),
            )
        )
    return spark.createDataFrame(
        rows,
        "operator_id INT, operator_name STRING, store_name STRING,"
        " num_partitions INT, min_batch_id BIGINT, max_batch_id BIGINT,"
        " state_rows BIGINT",
    ).repartition(1).sortWithinPartitions("operator_id", "store_name")


def state_key_census(
    spark: SparkSession,
    checkpoint_dir: str,
    operator_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Distribution of state across store partitions:
    (partition_id, n_keys) — the skew view. A hot partition here means
    a hot state key upstream (the same diagnosis operators/skew.py
    treats on the batch side)."""
    return (
        read_state(
            spark, checkpoint_dir,
            operator_id=operator_id, store_name=store_name,
        )
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_keys"))
    )
