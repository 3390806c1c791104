"""Streaming micro-batch throughput bench (round-7 verdict item 7):
everything streamed was parity-tested but never TIMED. This measures the
state-heaviest streaming path — ``streaming_incremental_dedup`` — over
the sf-dir documents split into N arrival files (one micro-batch each,
``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow``), and records wall
time, rows/s, emitted pairs, and the on-disk signature-store size into
``BENCH_scale.json`` under a ``"streaming"`` key (preserved by
tools/bench_scale.py's merge).

Usage: ``python tools/bench_stream.py [--batches 10] [--out BENCH_scale.json]``
(sf dir from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pw_etl_scrumptious_squad_spark.session import get_spark  # noqa: E402
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table  # noqa: E402
from pw_etl_scrumptious_squad_spark.streaming import pipeline as sp  # noqa: E402


def _du(path: str) -> int:
    total = 0
    for dp, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dp, f))
    return total


def main() -> None:
    args = sys.argv[1:]
    n_batches = 10
    out_path = "BENCH_scale.json"
    if "--batches" in args:
        n_batches = int(args[args.index("--batches") + 1])
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="bench-stream")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = docs.count()

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src = os.path.join(work, "arrivals")
        for i in range(n_batches):
            docs.filter(F.col("doc_id") % n_batches == i).coalesce(
                1
            ).write.mode("overwrite").parquet(
                os.path.join(src, f"arrival={i}.parquet")
            )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/arrival=*.parquet")
        )
        store_dir = os.path.join(work, "store")
        pairs_dir = os.path.join(work, "pairs")
        start = time.perf_counter()
        q = sp.streaming_incremental_dedup(
            stream,
            store_dir=store_dir,
            pairs_dir=pairs_dir,
            checkpoint_dir=os.path.join(work, "ckpt"),
            num_perm=16,
            bands=8,
            threshold=0.5,
        )
        q.awaitTermination()
        wall = time.perf_counter() - start
        n_pairs = spark.read.parquet(pairs_dir).count()
        store_rows = spark.read.parquet(store_dir).count()
        record = {
            "sf_dir": sf_dir,
            "batches": n_batches,
            "rows": n_rows,
            "wall_sec": round(wall, 3),
            "rows_per_sec": round(n_rows / wall, 1),
            "pairs_emitted": n_pairs,
            "state_store_rows": store_rows,
            "state_store_bytes": _du(store_dir),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    payload = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            payload = json.load(f)
    payload.setdefault("streaming", {})["stream_incremental_dedup"] = record
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"streaming": {"stream_incremental_dedup": record}}))


if __name__ == "__main__":
    main()
