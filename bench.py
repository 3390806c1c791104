"""Benchmark harness: headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Execution is forced with a noop-format write (full computation, no sink
cost, nothing collected to the driver). Each query runs once after a small
warm-up query primes the JVM/codegen.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pw_etl_scrumptious_squad_spark import catalog as catmod
from pw_etl_scrumptious_squad_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q02_topk_join",
    "q03_window_topn_per_group",
    "q04_rollup",
    "q08_distinct_agg",
    "q09_events_hourly",
    "q10_sessionize",
    "r06_cdc_filter",
    "r11_fact_build",
    "r13_keep_newest",
    "t01_token_stats",
    "t03_fingerprint",
    "d01_exact_dedup",
    "d02_ngram_jaccard",
    "s01_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catmod.catalog()

    # warm-up: prime JVM, codegen, and the parquet footer cache
    cat["r05_watermark_max"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        cat[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
