"""Bloom-sidecar equality skipping as a planner-integrated Python
DataSource — the equality leg next to ``layout_datasource``'s range
leg, over the same Spark 4 ``pyspark.sql.datasource`` API.

``operators/layout.py::read_with_bloom`` probes the per-file Bloom
sidecar BEFORE ``spark.read`` — correct, but the skipping decision
lives outside the query plan. This module registers the indexed layout
as a ``bloom_layout`` data source:

    spark.dataSource.register(BloomLayoutDataSource)
    df = (spark.read.format("bloom_layout")
          .option("path", layout_dir).option("key", "l_orderkey")
          .load()
          .filter("l_orderkey = 4999"))

Planner integration:

- ``pushFilters`` (Spark 4.1) collects ``EqualTo`` / ``In`` predicates
  the optimizer proved on the key column (conjuncts intersect); every
  filter is returned as residual — the prune is file-granular, Spark
  still evaluates the predicate row-wise, so skipping stays LOSSLESS
  exactly as the sidecar's no-false-negative contract guarantees
  (every position of every present key was set at build time).
- ``partitions()`` probes the metadata-sized sidecar (pyarrow, probe
  words only) with the SAME md5 positions the build computed JVM-side
  (``md5(key '#' i)`` first 60 bits mod m — ints and strings render
  identically in Python and Spark, the type restriction
  ``write_bloom_sidecar`` enforces) and schedules only admitting
  files; a contradictory or all-absent probe yields one empty
  schema-stable partition.
- ``read()`` streams the file's Arrow record batches.

Deployment note (same as layout_datasource): this leg assumes a
filesystem the driver and executors can open directly (local/NFS).
On an object store, keep the ``read_with_bloom`` helper (Hadoop
FileSystem chain) — same skipping decision, JVM scan.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
)

from pw_etl_scrumptious_squad_spark.operators.layout import BLOOM_META_NAME


class _BloomFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _bloom_dir(path: str, key: str) -> str:
    return os.path.join(path, f"_bloom_{key}")


def _positions(value, i: int, m: int) -> int:
    """Driver twin of layout._bloom_pos_expr: first 60 bits of
    md5(str(value) '#' str(i)) mod m. Identical to the JVM build for
    the integral/string keys the sidecar writer admits."""
    h = hashlib.md5(f"{value}#{i}".encode()).hexdigest()
    return int(h[:15], 16) % m


class BloomLayoutReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.key = options["key"]
        with open(
            os.path.join(_bloom_dir(self.path, self.key), BLOOM_META_NAME)
        ) as fh:
            self.meta = json.load(fh)
        # None = no equality constraint (keep every file); a set =
        # the intersection of pushed EqualTo/In value sets
        self.values: set | None = None

    def pushFilters(self, filters):
        for f in filters:
            attr = getattr(f, "attribute", None)
            col = attr[0] if attr and len(attr) == 1 else None
            if col != self.key:
                continue
            if isinstance(f, EqualTo) and isinstance(f.value, (int, str)):
                vals = {f.value}
            elif isinstance(f, In) and all(
                isinstance(v, (int, str)) for v in f.values
            ):
                vals = set(f.values)
            else:
                continue
            self.values = vals if self.values is None else (
                self.values & vals
            )
        # residual: the row-wise predicate still runs in Spark —
        # file skipping is lossless by the no-false-negative contract
        return filters

    def _data_files(self) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.path)
            if n.endswith(".parquet") and not n.startswith("_")
        )

    def partitions(self):
        files = self._data_files()
        if self.values is None:
            keep = files
        elif not self.values:
            keep = []  # contradictory conjunction, e.g. k = 1 AND k = 2
        else:
            m, k = int(self.meta["m_bits"]), int(self.meta["n_hashes"])
            probes = {
                v: [
                    (pos // 64, 1 << (pos % 64))
                    for pos in (_positions(v, i, m) for i in range(k))
                ]
                for v in self.values
            }
            words_needed = {w for ps in probes.values() for w, _ in ps}
            import pyarrow.dataset as pds

            bdir = _bloom_dir(self.path, self.key)
            side_files = [
                os.path.join(bdir, n)
                for n in os.listdir(bdir)
                if n.endswith(".parquet")
            ]
            table = pds.dataset(side_files).to_table(
                filter=pds.field("word").isin(list(words_needed))
            )
            bits: dict[tuple[str, int], int] = {}
            for fname, word, b in zip(
                table["file"].to_pylist(),
                table["word"].to_pylist(),
                table["bits"].to_pylist(),
            ):
                key = (fname, int(word))
                bits[key] = bits.get(key, 0) | int(b)
            keep = [
                f
                for f in files
                if any(
                    all(
                        bits.get((f, w), 0) & mask for w, mask in ps
                    )
                    for ps in probes.values()
                )
            ]
        out = [
            _BloomFile(os.path.join(self.path, f)) for f in keep
        ]
        # an all-skipped probe still needs one (empty) partition so the
        # scan produces a schema-stable zero-row result
        return out or [_BloomFile("")]

    def read(self, partition: _BloomFile):
        if not partition.path:
            return
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        yield from pf.iter_batches()


class BloomLayoutDataSource(DataSource):
    """``spark.read.format("bloom_layout").option("path", dir)
    .option("key", col)`` — see module docstring."""

    @classmethod
    def name(cls):
        return "bloom_layout"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options["path"]
        first = sorted(
            n
            for n in os.listdir(path)
            if n.endswith(".parquet") and not n.startswith("_")
        )[0]
        return from_arrow_schema(
            pq.ParquetFile(os.path.join(path, first)).schema_arrow
        )

    def reader(self, schema):
        return BloomLayoutReader(self.options)
