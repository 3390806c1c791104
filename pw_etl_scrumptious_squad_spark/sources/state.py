"""Watermark state store for incremental (CDC) extraction.

The reference recovers its watermark by re-reading the **last delta file it
wrote** and computing max(created_at)/max(last_updated) over it with a
sort-based scan (``src/extract.py:176-199``) — fragile (state dies with the
file, and the file is overwritten every cycle) and O(n log n) where a max-agg
is O(n). Here the state is an explicit tiny parquet table
``(table_name, max_created_at, max_last_updated)`` — one row per source
table — read once per cycle and atomically replaced. At 100 TB the state
table is still a few KB; the expensive part (the max-agg over the delta)
runs distributed via ``df.agg(max(...))``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("table_name", T.StringType(), False),
        T.StructField("max_created_at", T.TimestampNTZType()),
        T.StructField("max_last_updated", T.TimestampNTZType()),
    ]
)

# The reference's implicit epoch: a table absent from the bucket gets a full
# scan (src/extract.py:211-214); EPOCH-valued watermarks reproduce that with
# one code path.
EPOCH = datetime(1970, 1, 1)


@dataclass(frozen=True)
class Watermark:
    created_at: datetime
    last_updated: datetime


def delta_watermark(df: DataFrame) -> Watermark | None:
    """Max-agg watermark over a delta (reference ``get_most_recent_time``,
    ``src/extract.py:176-199``, re-expressed as a single distributed agg)."""
    row = df.agg(
        F.max("created_at").alias("c"), F.max("last_updated").alias("u")
    ).first()
    if row is None or (row["c"] is None and row["u"] is None):
        return None
    return Watermark(created_at=row["c"] or EPOCH, last_updated=row["u"] or EPOCH)


class WatermarkStore:
    """Parquet-backed per-table watermark state."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def load(self) -> dict[str, Watermark]:
        local = self.path.removeprefix("file://")
        if "://" not in local and not os.path.exists(local):
            return {}
        rows = self.spark.read.schema(STATE_SCHEMA).parquet(self.path).collect()
        return {
            r["table_name"]: Watermark(
                created_at=r["max_created_at"] or EPOCH,
                last_updated=r["max_last_updated"] or EPOCH,
            )
            for r in rows
        }

    def get(self, table: str) -> Watermark:
        return self.load().get(table, Watermark(EPOCH, EPOCH))

    def save(self, state: dict[str, Watermark]) -> None:
        rows = [
            (name, wm.created_at, wm.last_updated)
            for name, wm in sorted(state.items())
        ]
        df = self.spark.createDataFrame(rows, STATE_SCHEMA)
        # Tiny table: single file, atomic-enough overwrite.
        df.coalesce(1).write.mode("overwrite").parquet(self.path)

    def advance(self, table: str, wm: Watermark | None) -> None:
        """Merge a new delta watermark for one table (monotone max)."""
        if wm is None:
            return
        state = self.load()
        prev = state.get(table, Watermark(EPOCH, EPOCH))
        state[table] = Watermark(
            created_at=max(prev.created_at, wm.created_at),
            last_updated=max(prev.last_updated, wm.last_updated),
        )
        self.save(state)
