"""Custom connector via the Python DataSource API (Spark 4): a
deterministic synthetic-documents source, batch AND micro-batch stream.

The reference's only "sources" are Postgres tables and S3 parquet
(``src/extract.py``); this is the engine-side answer to "my data lives
somewhere Spark has no built-in reader for" — the public
``pyspark.sql.datasource`` plugin surface lets a pure-Python connector
participate in normal query planning:

    spark.dataSource.register(SyntheticDocsDataSource)
    spark.read.format("synthetic_docs").option("n_docs", 1000).load()
    spark.readStream.format("synthetic_docs").option("rows_per_batch", 100)

Scale design:
- ``partitions()`` splits the id range into ``num_partitions`` slices, so
  generation runs fully parallel on executors — the driver never touches
  a row (the same property a JDBC ``partitionColumn`` read has).
- Generation is seeded md5 per (seed, doc_id) — reruns and retries of a
  task produce byte-identical rows, which is what makes a synthetic
  source usable in tests and deterministic benchmarks (and is the same
  restart-reproducibility rule the curation samplers follow).
- The stream reader tracks a single monotonically-increasing doc_id
  offset; each micro-batch is the id slice [start, end), split over the
  same per-partition generator — so stream∪history equals the batch read
  of the same range (batch/stream parity, the property the streaming
  tests assert for every pipeline here).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

VOCAB = [
    "data", "table", "row", "scan", "merge", "key", "value", "join",
    "filter", "sort", "group", "window", "batch", "stream", "spark",
    "query", "fast", "slow", "big", "small",
]
LANGS = ["en", "de", "es", "fr", "zh"]


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _doc_row(seed: int, doc_id: int):
    """One deterministic document row for (seed, doc_id): token count and
    token choices come from md5 — no RNG state, safe under task retries."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    n_tokens = 5 + h[0] % 60
    toks = []
    # one md5 per 16 tokens (each byte picks a token) — bounded hashing
    for block in range((n_tokens + 15) // 16):
        hb = hashlib.md5(f"{seed}:{doc_id}:{block}".encode()).digest()
        toks.extend(VOCAB[b % len(VOCAB)] for b in hb)
    text = " ".join(toks[:n_tokens])
    return (
        doc_id,
        text,
        LANGS[h[1] % len(LANGS)],
        f"src{h[2] % 8}",
        len(text),
    )


def _gen_range(seed: int, start: int, end: int):
    for doc_id in range(start, end):
        yield _doc_row(seed, doc_id)


def _slices(start: int, end: int, n: int) -> list[_IdRange]:
    total = end - start
    n = max(1, min(n, total)) if total > 0 else 1
    step = -(-total // n) if total > 0 else 1
    return [
        _IdRange(s, min(s + step, end)) for s in range(start, end, step)
    ] or [_IdRange(start, start)]


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 7))
        self.n_docs = int(options.get("n_docs", 1000))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self):
        return _slices(0, self.n_docs, self.num_partitions)

    def read(self, partition: _IdRange):
        return _gen_range(self.seed, partition.start, partition.end)


class SyntheticDocsStreamReader(DataSourceStreamReader):
    """Offset = next unread doc_id (a dict for JSON round-tripping).

    Restart safety: a fresh instance starts ``_current = 0``, but on
    query restart Spark replays the checkpointed offsets through
    ``partitions(start, end)`` / ``commit(end)`` — ratcheting
    ``_current`` to the highest offset seen there means
    ``latestOffset()`` never regresses below the committed offset, so
    already-committed id ranges are not re-planned and re-emitted
    (stream==batch parity holds across restarts)."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 7))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.num_partitions = int(options.get("num_partitions", 4))
        self._current = 0

    def _ratchet(self, offset) -> None:
        if offset and "doc_id" in offset:
            self._current = max(self._current, int(offset["doc_id"]))

    def initialOffset(self):
        return {"doc_id": 0}

    def latestOffset(self):
        self._current += self.rows_per_batch
        return {"doc_id": self._current}

    def partitions(self, start, end):
        # recover from a checkpoint replay: never let the cursor sit
        # below an offset range the engine already planned
        self._ratchet(start)
        self._ratchet(end)
        return _slices(start["doc_id"], end["doc_id"], self.num_partitions)

    def read(self, partition: _IdRange):
        return _gen_range(self.seed, partition.start, partition.end)

    def commit(self, end):
        self._ratchet(end)


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_docs"

    def schema(self):
        return (
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint"
        )

    def reader(self, schema):
        return SyntheticDocsReader(self.options)

    def streamReader(self, schema):
        return SyntheticDocsStreamReader(self.options)
