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
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.sources.parquet import (
    fs_read_text,
    fs_write_text,
    list_store,
)

MANIFEST_NAME = "_skipping_manifest.json"


def _join(path: str, name: str) -> str:
    """Scheme-agnostic child path (URIs and POSIX paths both use '/' —
    never ``os.path.join``, which is wrong on schemed URIs)."""
    return path.rstrip("/") + "/" + name


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
    # fail fast BEFORE any file lands: an empty input (or an all-NULL
    # z-column) yields NULL bounds, and discovering that mid-write
    # would leave a layout directory with no manifest that
    # read_with_skipping then chokes on
    bad = [c for c in cols if b[f"mn_{c}"] is None or b[f"mx_{c}"] is None]
    if bad:
        raise ValueError(
            f"write_zorder_layout: no non-NULL values to bound for"
            f" column(s) {bad} — empty input or all-NULL z-columns;"
            " nothing was written"
        )
    bounds = {c: (int(b[f"mn_{c}"]), int(b[f"mx_{c}"])) for c in cols}

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
                # last URI segment: input_file_name() returns full URIs
                # on schemed stores, and '/' is the separator for every
                # Hadoop scheme (os.path.basename is a POSIX-ism)
                "file": r["file"].rstrip("/").rsplit("/", 1)[-1],
                "n_rows": int(r["n_rows"]),
                **{f"mn_{c}": int(r[f"mn_{c}"]) for c in cols},
                **{f"mx_{c}": int(r[f"mx_{c}"]) for c in cols},
            }
            for r in per_file
        ],
    }
    # Hadoop FileSystem chain (not plain open()): the manifest must
    # publish wherever the data files live — file://, viewfs://,
    # s3a://, hdfs:// alike
    fs_write_text(_join(path, MANIFEST_NAME), json.dumps(manifest), spark)
    return manifest


def read_with_skipping(
    spark: SparkSession,
    path: str,
    ranges: Mapping[str, tuple[int, int]],
) -> tuple[DataFrame, int, int]:
    """Read the layout at ``path`` keeping only manifest files whose
    [min,max] intersects ``ranges`` on every column, then apply the
    residual filter. Returns (df, n_files_selected, n_files_total).

    Manifest and file resolution both ride the Hadoop FileSystem chain:
    surviving manifest names are resolved against an FS LISTING of the
    layout directory (never naive path concatenation against assumed
    local basenames), so a vacuumed/renamed file fails loudly here
    instead of surfacing as a scan error mid-job."""
    raw = fs_read_text(_join(path, MANIFEST_NAME), spark)
    if raw is None:
        raise FileNotFoundError(
            f"no {MANIFEST_NAME} under {path} — not a z-order layout"
            " (write_zorder_layout publishes the manifest with the data)"
        )
    manifest = json.loads(raw)
    listed = {name for name, is_dir in list_store(spark, path) if not is_dir}
    keep = []
    for entry in manifest["files"]:
        ok = True
        for c, (lo, hi) in ranges.items():
            if entry[f"mx_{c}"] < lo or entry[f"mn_{c}"] > hi:
                ok = False
                break
        if ok:
            if entry["file"] not in listed:
                raise FileNotFoundError(
                    f"manifest names {entry['file']} but the layout dir"
                    f" {path} does not contain it — layout and manifest"
                    " are out of sync"
                )
            keep.append(_join(path, entry["file"]))
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


# ---------------------------------------------------------------------------
# Per-file Bloom sidecar (round 10): EQUALITY file skipping — the point-
# lookup companion to the z-order manifest's range skipping above
# ---------------------------------------------------------------------------

BLOOM_META_NAME = "_bloom_meta.json"


def _bloom_dir(path: str, key_col: str) -> str:
    # leading underscore: Spark's parquet reader ignores the sidecar
    # when scanning the data directory itself
    return _join(path, f"_bloom_{key_col}")


def _bloom_pos_expr(key_expr: str, i_expr: str, m: int) -> str:
    """Bit position of hash i for a key: first 60 bits of
    md5(key '#' i) mod m — the repo's established cross-engine md5
    idiom (see curation._md5_unit_interval), all integer/JVM ops."""
    return (
        f"pmod(CAST(conv(substring(md5(concat(CAST({key_expr} AS STRING),"
        f" '#', CAST({i_expr} AS STRING))), 1, 15), 16, 10) AS BIGINT),"
        f" {int(m)})"
    )


def write_bloom_sidecar(
    spark: SparkSession,
    path: str,
    key_col: str,
    m_bits: int = 1 << 18,
    n_hashes: int = 4,
) -> dict:
    """Build a per-file Bloom index over ``key_col`` for the parquet
    layout at ``path``: for every data file, the positions
    ``md5(key '#' i) % m_bits`` (i < n_hashes) of every key in the file
    are OR-ed into a fixed-size bit array, stored SPARSELY as one
    parquet sidecar table ``(file, word, bits)`` of the non-zero 64-bit
    words (so an index over a low-cardinality file costs rows ∝ its
    distinct keys, not m_bits), plus a tiny JSON meta published through
    the Hadoop FS chain.

    Why file-level: parquet's own bloom filters prune ROW GROUPS inside
    files already opened; this sidecar prunes at PLANNING — skipped
    files are never listed, opened, or scheduled (the same layer as the
    z-order manifest, for equality predicates instead of boxes). At
    100 TB the sidecar is a metadata-sized table the driver probes with
    one pushdown-filtered scan.

    Build cost: ONE pass over the layout — explode the n_hashes
    positions per row (map-side), bit_or per (file, word). No false
    negatives BY CONSTRUCTION: every position of every present key is
    set, so :func:`read_with_bloom` can never skip a file containing
    the probed key (losslessness is equality-tested, not sampled).
    Sizing: FP rate per file ~ (1 - e^(-k*n/m))^k; the default
    m=262144, k=4 holds ~1% at 16k distinct keys per file."""
    df = spark.read.parquet(path)
    if key_col not in df.columns:
        raise ValueError(f"{key_col} not in layout columns {df.columns}")
    # integral/string keys only: positions hash CAST(key AS STRING) at
    # build time but the probe stringifies in PYTHON — identical for
    # ints and strings, but float/decimal renderings can differ between
    # the two (e.g. trailing zeros), which would silently break the
    # no-false-negative guarantee
    kind = dict(df.dtypes)[key_col]
    if kind not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise TypeError(
            f"bloom sidecar key must be an integral or string column,"
            f" got {key_col}: {kind} (float/decimal string renderings"
            " differ between the build and the probe)"
        )
    pos = _bloom_pos_expr(key_col, "i", m_bits)
    words = (
        df.select(
            F.input_file_name().alias("f"),
            F.explode(F.expr(f"sequence(0, {int(n_hashes) - 1})")).alias("i"),
            F.col(key_col),
        )
        .select(
            F.expr(
                "reverse(split(f, '/'))[0]"
            ).alias("file"),
            F.expr(pos).alias("pos"),
        )
        .select(
            "file",
            F.expr("pos DIV 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("file", "word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )
    words.write.mode("overwrite").parquet(_bloom_dir(path, key_col))
    meta = {"key_col": key_col, "m_bits": int(m_bits), "n_hashes": int(n_hashes)}
    fs_write_text(
        _join(_bloom_dir(path, key_col), BLOOM_META_NAME),
        json.dumps(meta),
        spark,
    )
    return meta


def read_with_bloom(
    spark: SparkSession,
    path: str,
    key_col: str,
    values,
) -> tuple[DataFrame, int, int]:
    """Point-lookup read through the Bloom sidecar: keep only files
    whose Bloom admits at least one probed value, then apply the exact
    ``key IN (values)`` filter (skipping is lossless — no false
    negatives; Bloom false positives only cost a scanned file, never a
    wrong row). Returns (df, n_files_selected, n_files_total).

    The probe is ONE filtered scan of the metadata-sized sidecar: the
    k probe positions per value are computed JVM-side with the same
    expression the build used (no cross-engine/driver hash parity to
    maintain), joined against the sidecar words, and a file survives a
    value when all k of its positions hit."""
    raw = fs_read_text(
        _join(_bloom_dir(path, key_col), BLOOM_META_NAME), spark
    )
    if raw is None:
        raise FileNotFoundError(
            f"no Bloom sidecar for {key_col} under {path} —"
            " write_bloom_sidecar publishes it with the meta"
        )
    meta = json.loads(raw)
    m, k = int(meta["m_bits"]), int(meta["n_hashes"])
    vals = list(values) if isinstance(values, (list, tuple, set)) else [values]
    if not vals:
        raise ValueError("read_with_bloom: empty probe value list")
    probe_rows = [(str(v), i) for v in vals for i in range(k)]
    probe = (
        spark.createDataFrame(probe_rows, "v STRING, i INT")
        .select(
            "v",
            F.expr(_bloom_pos_expr("v", "i", m)).alias("pos"),
        )
        .select(
            "v",
            F.expr("pos DIV 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("mask"),
        )
    )
    sidecar = spark.read.parquet(_bloom_dir(path, key_col))
    hits = (
        sidecar.join(F.broadcast(probe), "word")
        .filter(F.expr("(bits & mask) != 0"))
        .groupBy("file", "v")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == k)
        .select("file")
        .distinct()
        .collect()
    )
    listed = {
        name for name, is_dir in list_store(spark, path)
        if not is_dir and name.endswith(".parquet")
    }
    total = len(listed)
    keep = sorted(r["file"] for r in hits if r["file"] in listed)
    cond = F.col(key_col).isin([v for v in vals])
    if not keep:
        return spark.read.parquet(path).filter(F.lit(False)), 0, total
    df = spark.read.parquet(*[_join(path, name) for name in keep])
    return df.filter(cond), len(keep), total
