"""Isolated min-of-N noop-sink timing for named catalog entries.

Usage: python tools/time_queries.py [-n RUNS] query [query ...]

Same methodology as bench.py (warm-up worker spawn + table counts +
trained-literal hoists, noop sink, min-of-N) but only for the named
queries, so a single optimization can be measured without paying for
the whole suite.  Prints one line per query: "<min>s  runs=[...]  name".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pw_etl_scrumptious_squad_spark import catalog as catmod
from pw_etl_scrumptious_squad_spark.session import get_spark
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table


def main() -> None:
    args = sys.argv[1:]
    n_runs = 3
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catmod.catalog()

    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers).repartition(n_workers).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        read_table(spark, sf_dir, t).count()
    from pw_etl_scrumptious_squad_spark.catalog_ext import (
        _qc_weights,
        ivf_centroid_literals,
        pq_codebook_literals,
    )

    ivf_centroid_literals(sf_dir, spark)
    pq_codebook_literals(sf_dir, spark)
    _qc_weights(sf_dir, spark)
    try:
        print(f"load_start={os.getloadavg()[0]:.2f}")
    except OSError:
        pass
    for name in args:
        runs = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"time: {name}")
            start = time.perf_counter()
            cat[name].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - start, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"{min(runs):7.3f}s  runs={runs}  {name}")
    try:
        print(f"load_end={os.getloadavg()[0]:.2f}")
    except OSError:
        pass


if __name__ == "__main__":
    main()
