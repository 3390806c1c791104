"""Organic-sf1 validation bench (round-8 verdict item 5).

Runs every CATALOG-named query that has an x1/x10/x100 scaling curve in
BENCH_scale.json once (after warm-up) against the organic sf1.0 set
(tools/gen_organic.py — continuous distributions, no copy structure)
and records, per query:

- ``t_organic``   — measured seconds at organic sf1.0
- ``t10_copies``  — the copy-replicated x10 point (same nominal scale)
- ``t_alpha_pred``— t1 * 10^alpha_1_10 (what the recorded curve
                    predicts for a 10x input)
- ``ratio_vs_copies`` / ``ratio_vs_alpha``

If the copy-replication methodology were hiding superlinear behavior
that a continuous corpus exposes (shared-vocabulary shingle DFs, LSH
bucket skew, natural group-size spreads), these ratios blow up; ~1x
ratios certify the recorded alphas transfer to organic data.

Usage: python tools/bench_organic.py [organic_dir] [--out BENCH_scale.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pw_etl_scrumptious_squad_spark import catalog as catmod  # noqa: E402
from pw_etl_scrumptious_squad_spark.session import get_spark  # noqa: E402
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    organic = args[0] if args and not args[0].startswith("--") else (
        "scale_data/sf1_organic"
    )
    out_path = (
        args[args.index("--out") + 1] if "--out" in args else "BENCH_scale.json"
    )
    with open(out_path) as f:
        payload = json.load(f)
    curves = payload["queries"]

    spark = get_spark(app_name="bench-organic")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catmod.catalog()
    names = sorted(n for n in curves if n in cat)

    # warm-up: JVM + parquet footers + Python workers
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers).repartition(n_workers).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        read_table(spark, organic, t).count()

    results: dict[str, dict] = {}
    for name in names:
        # warm pass (untimed): absorbs per-sf memoized hoists (IVF/PQ
        # training, the y83 layout write, y79/y80 classifier training)
        # and first-execution codegen — the same costs bench.py's
        # min-of-N protocol discards. Round-9 change: the single-run
        # protocol was silently charging one-time preps to the organic
        # point (y83 measured its 6M-row layout WRITE, 14.8x the read).
        cat[name].build(spark, organic).write.format("noop").mode(
            "overwrite"
        ).save()
        start = time.perf_counter()
        cat[name].build(spark, organic).write.format("noop").mode(
            "overwrite"
        ).save()
        t_org = round(time.perf_counter() - start, 3)
        c = curves[name]
        pred = round(c["t1"] * (10.0 ** c["alpha_1_10"]), 3)
        results[name] = {
            "t_organic": t_org,
            "t10_copies": c["t10"],
            "t_alpha_pred": pred,
            "ratio_vs_copies": round(t_org / c["t10"], 3) if c["t10"] else None,
            "ratio_vs_alpha": round(t_org / pred, 3) if pred else None,
        }
        print(name, results[name])

    try:
        load = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        load = None
    # keep hand-written per-query adjudications across re-measures
    prior_annotations = payload.get("sf1_organic", {}).get("annotations")
    payload["sf1_organic"] = {
        "dir": organic,
        "load_avg": load,
        "n_queries": len(results),
        "queries": results,
        **({"annotations": prior_annotations} if prior_annotations else {}),
        "note": (
            "warm-then-timed per query (round 9): an untimed warm pass"
            " absorbs memoized hoists + codegen, matching bench.py's"
            " min-of-N discard; copy-point comparisons"
            " carry the usual shared-host noise band (see bench.py"
            " measurement protocol)"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    worst = sorted(
        results.items(), key=lambda kv: -(kv[1]["ratio_vs_copies"] or 0)
    )[:5]
    print(json.dumps({"sf1_organic_worst_vs_copies": dict(worst)}))


if __name__ == "__main__":
    main()
