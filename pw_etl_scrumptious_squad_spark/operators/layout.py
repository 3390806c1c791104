"""Z-ordered storage layout + min/max-manifest file skipping.

The multi-dimensional companion to operators/bucketed.py: bucketing
co-locates ONE join key; a Z-ORDER clusters TWO range dimensions into
the same files, so a box predicate over both touches a small fraction
of the layout instead of every file. This is Delta/Iceberg-style data
skipping built from public primitives: Spark's file listing never
consults parquet footers when choosing WHICH files to read (footer
min/max only prunes row groups inside files already opened), so the
layout writer also emits a tiny per-file min/max manifest and the
reader consults it BEFORE ``spark.read`` — at 100 TB the manifest is a
metadata-sized table and the skipped files were never listed, opened,
or scheduled.

Mechanics:

- ``zorder_key`` quantizes each dimension onto a ``bits``-wide integer
  grid (exact BIGINT arithmetic off the column's min/max) and
  interleaves the bits — points close in BOTH dimensions land close on
  the 1-D key (Morton order).
- ``write_zorder_layout`` range-partitions on that key into
  ``n_files`` output files (one file per range, so each file covers a
  compact Z-interval = a small tile of the 2-D space) and writes the
  manifest from the FILES AS WRITTEN (re-read grouped by
  ``input_file_name`` — never from a re-run of the nondeterministic
  range sampler).
- ``read_with_skipping`` keeps every file whose [min,max] interval
  intersects the predicate box on ALL dimensions (intersection is
  necessary for the file to contain a match, so skipping is provably
  lossless) and still applies the residual filter — row-group pruning
  inside the survivors comes free from the parquet reader.

No reference counterpart (the reference reads whole CSV/JSON objects,
src/extract.py:41-76); this is the storage-layout leg of the
100 TB toolkit next to bucketing (equi-join), Bloom-prune (semi-join),
and the snapshot/warehouse ACID layer.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_skipping_manifest.json"


def zorder_key(
    bounds: Mapping[str, tuple[int, int]], bits: int = 16
) -> "F.Column":
    """Morton (bit-interleaved) key over the given integer columns.

    ``bounds`` maps column name -> (min, max) observed values; each
    column is quantized to ``floor((x - min) * (2^bits - 1) / (max -
    min))`` with exact BIGINT math (constant-range columns quantize to
    0). Column order fixes which dimension takes the even bit lanes."""
    cols = list(bounds)
    qs = []
    for name in cols:
        lo, hi = bounds[name]
        span = int(hi) - int(lo)
        if span <= 0:
            qs.append(F.lit(0).cast("bigint"))
        else:
            qs.append(
                F.expr(
                    f"CAST((CAST(`{name}` AS BIGINT) - {int(lo)}) *"
                    f" {(1 << bits) - 1} DIV {span} AS BIGINT)"
                )
            )
    z = F.lit(0).cast("bigint")
    for lane, q in enumerate(qs):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)),
                i * len(qs) + lane,
            ).cast("bigint")
    return z


def write_zorder_layout(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 64,
) -> dict:
    """Write ``df`` z-ordered on ``cols`` into ``n_files`` parquet files
    under ``path`` plus a per-file min/max manifest. Returns the
    manifest dict. The min/max bounds collect is ONE row; the manifest
    collect is ``n_files`` rows — both driver-bounded metadata."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    b = df.agg(*aggs).first()
    bounds = {c: (b[f"mn_{c}"], b[f"mx_{c}"]) for c in cols}

    z = zorder_key(bounds, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )

    # manifest from the files as written: one pass grouped by file name
    written = spark.read.parquet(path)
    per_file = (
        written.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            *[
                g
                for c in cols
                for g in (
                    F.min(c).alias(f"mn_{c}"),
                    F.max(c).alias(f"mx_{c}"),
                )
            ],
        )
        .collect()
    )
    manifest = {
        "cols": list(cols),
        "files": [
            {
                "file": os.path.basename(r["file"]),
                "n_rows": int(r["n_rows"]),
                **{f"mn_{c}": int(r[f"mn_{c}"]) for c in cols},
                **{f"mx_{c}": int(r[f"mx_{c}"]) for c in cols},
            }
            for r in per_file
        ],
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def read_with_skipping(
    spark: SparkSession,
    path: str,
    ranges: Mapping[str, tuple[int, int]],
) -> tuple[DataFrame, int, int]:
    """Read the layout at ``path`` keeping only manifest files whose
    [min,max] intersects ``ranges`` on every column, then apply the
    residual filter. Returns (df, n_files_selected, n_files_total)."""
    with open(os.path.join(path, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    keep = []
    for entry in manifest["files"]:
        ok = True
        for c, (lo, hi) in ranges.items():
            if entry[f"mx_{c}"] < lo or entry[f"mn_{c}"] > hi:
                ok = False
                break
        if ok:
            keep.append(os.path.join(path, entry["file"]))
    total = len(manifest["files"])
    cond = None
    for c, (lo, hi) in ranges.items():
        this = (F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi))
        cond = this if cond is None else (cond & this)
    if not keep:
        # schema-stable empty frame: the full layout filtered to nothing
        return spark.read.parquet(path).filter(F.lit(False)), 0, total
    df = spark.read.parquet(*keep)
    return (df.filter(cond) if cond is not None else df), len(keep), total
