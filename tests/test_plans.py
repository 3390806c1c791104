"""Physical-plan assertions: the optimizations the engine is designed
around must actually appear in the executed plans — filter pushdown into
the parquet scan, column pruning, broadcast joins for dims, whole-stage
codegen, and no accidental cartesian products. These tests freeze the
plan *shape*, complementing the DuckDB oracle which freezes the values."""

import contextlib
import io

import pytest

from pw_etl_scrumptious_squad_spark import catalog as catmod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cat():
    return catmod.catalog()


def plan_of(spark, cat, name, mode="formatted"):
    df = cat[name].build(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_cdc_filter_pushed_to_scan(spark, cat):
    plan = plan_of(spark, cat, "r06_cdc_filter")
    assert "PushedFilters:" in plan
    # the disjunctive CDC predicate is an Or over the two audit columns —
    # it must reach the parquet reader, not run post-scan only
    assert "Or(GreaterThan(o_orderdate" in plan.replace("\n", " ")


def test_pricing_summary_prunes_columns(spark, cat):
    plan = plan_of(spark, cat, "q01_pricing_summary")
    # lineitem has 11 columns; the scan must read only the 6 used
    assert "l_partkey" not in plan
    assert "l_linenumber" not in plan
    assert "l_tax" not in plan
    # whole-stage codegen must cover the scan->agg pipeline (AQE hides the
    # *(n) markers pre-execution, so ask for the codegen subtrees directly)
    codegen = plan_of(spark, cat, "q01_pricing_summary", "codegen")
    assert "WholeStageCodegen subtree" in codegen


def test_dim_joins_are_broadcast(spark, cat):
    for name in ["z02_topk_pagination", "q16_local_supplier_volume"]:
        plan = plan_of(spark, cat, name, "simple")
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_no_cartesian_in_pair_joins(spark, cat):
    # the blocked pair joins are range/equi conditions — a missing block
    # key would silently degrade to a cartesian product
    for name in ["d02_ngram_jaccard", "d06_embedding_neardup"]:
        plan = plan_of(spark, cat, name, "simple")
        assert "CartesianProduct" not in plan, name


def test_fact_build_single_stage(spark, cat):
    # pure projection queries must not shuffle (exchange only for the
    # final order-by)
    plan = plan_of(spark, cat, "r11_fact_build", "simple")
    assert plan.count("Exchange") <= 1


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both join sides on the key pre-partitions data at rest:
    the join plan must contain NO Exchange (the shuffle happened once at
    write time, amortized over every future join) — the at-rest layout
    strategy for repeated 100 TB fact-fact joins."""
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    sf = "/root/testdata/sf0.001"
    orders = read_table(spark, sf, "orders")
    lineitem = read_table(spark, sf, "lineitem")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/bkt'")
    try:
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("bkt.orders_b")
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("bkt.lineitem_b")
        # hint sort-merge: at sf0.001 the tables are broadcast-size, which
        # would bypass the bucketed layout this test is about
        li_b = spark.table("bkt.lineitem_b").hint("merge")
        joined = li_b.join(
            spark.table("bkt.orders_b"),
            li_b["l_orderkey"] == spark.table("bkt.orders_b")["o_orderkey"],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # no shuffle
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_partitioned_fact_write_prunes_on_read(spark, tmp_path, totesys):
    """plans/etl.load writes facts partitioned by created_date; a dated
    read must show PartitionFilters in the scan (partition pruning), so a
    day query over a 100 TB history touches one partition, not the table."""
    from pw_etl_scrumptious_squad_spark.operators import facts
    from pw_etl_scrumptious_squad_spark.sources.parquet import write_table

    fact = facts.create_fact_sales_order(totesys["sales_order"])
    write_table(fact, str(tmp_path), "fact_sales_order", partition_by=["created_date"])
    back = spark.read.parquet(str(tmp_path / "fact_sales_order.parquet"))
    day = back.filter(back["created_date"] == "2023-01-01")
    plan = day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(created_date" in plan.replace("#", "(").replace(
        "created_date(", "created_date"
    ) or "PartitionFilters" in plan
    # the filter must appear as a partition filter, not only a data filter
    seg = plan[plan.index("PartitionFilters") :]
    assert "created_date" in seg[: seg.index("]")]


def test_round2_ops_no_cartesian_no_full_broadcast(spark, cat):
    """y13 diff joins on the key; y14's band join and verify are equi
    joins; y15's bucket join is equi on (band, val) — none may degrade to
    a cartesian product, and the incremental dedup must never broadcast
    the corpus side (its base is unbounded at scale)."""
    for name in ["y13_snapshot_diff", "y14_incremental_neardup",
                 "y15_embedding_srp", "y16_source_quota"]:
        plan = plan_of(spark, cat, name, "simple")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_snapshot_diff_is_single_sort_merge_join(spark, cat):
    # both snapshots derive from one scan; the diff itself must be ONE
    # full-outer join keyed on o_orderkey (full outer can't broadcast)
    plan = plan_of(spark, cat, "y13_snapshot_diff", "simple")
    assert plan.count("SortMergeJoin") == 1
    assert "FullOuter" in plan


def test_dup_span_removal_shuffle_count_and_pruning(spark, cat):
    """y28 (k-gram-anchor mode) must read only (doc_id, text), never
    blow up into a cartesian/pair join, and partial-aggregate the anchor
    min BEFORE its exchange (map-side combine is what keeps a
    million-fold boilerplate anchor at count-shaped cost). Shuffles: 5 =
    anchor-min agg, span-to-firsts join leg, partial-span window, doc_id
    reassembly agg, terminal single-partition sort."""
    plan = plan_of(spark, cat, "y28_dup_span_removal")
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan
    assert "partial_min" in plan  # map-side combine on the anchor key
    simple = plan_of(spark, cat, "y28_dup_span_removal", "simple")
    assert simple.count("Exchange") <= 5
    assert "CartesianProduct" not in simple
    # the only join is span-content = anchor-content (equi); at this sf
    # the firsts side broadcasts, at scale it degrades to a shuffle join —
    # either way exactly one join and it is never nested-loop
    assert simple.count("Join") == 1
    assert "BroadcastNestedLoopJoin" not in simple


def test_correlated_exists_decorrelates_to_semi_anti(spark, cat):
    """z38's correlated EXISTS / NOT EXISTS must be decorrelated into
    semi/anti hash joins — no nested-loop re-execution of the subquery
    per outer row."""
    plan = plan_of(spark, cat, "z38_exists_correlated")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_on_dim_filtered_join(spark, tmp_path):
    """Joining a date-partitioned fact to a FILTERED dim must inject a
    dynamic-pruning subquery on the partition column: at 100 TB the fact
    scan reads only the partitions the dim filter selects, discovered at
    runtime — the star-schema access pattern DPP exists for."""
    from pyspark.sql import functions as F

    fact = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).cast("int").alias("part_key"),
        (F.col("id") * 2).alias("v"),
    )
    fact.write.mode("overwrite").partitionBy("part_key").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.range(10).select(
        F.col("id").cast("int").alias("part_key"),
        F.concat(F.lit("g"), F.col("id")).alias("grp"),
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(
        F.col("grp").isin("g3", "g7")
    )
    q = f.join(d, "part_key").groupBy("grp").agg(F.sum("v").alias("tv"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got = {r["grp"]: r["tv"] for r in q.collect()}
    assert set(got) == {"g3", "g7"}


def test_scalar_subqueries_decorrelate_to_aggregate_joins(spark, cat):
    """z40's two correlated scalar subqueries must decorrelate into
    aggregate joins over the orders scan — no per-row subquery
    re-execution, no cartesian."""
    plan = plan_of(spark, cat, "z40_scalar_subqueries")
    assert "CartesianProduct" not in plan
    # decorrelation materializes as hash aggregates joined back
    assert plan.count("HashAggregate") >= 2
    assert "Join" in plan


@pytest.mark.extended  # ~31 s suite-wide plan sweep; default tier:
# test_gate_contract runs the suite-wide CartesianProduct/BatchEvalPython
# plan audit over all 222 builds every run
def test_pair_outputs_have_no_single_partition_funnel(spark, cat):
    """Entries whose output grows with the corpus (near-dup pair lists:
    2.1M rows for d07 at sf0.1 alone) must not end in a
    repartition(1)+sort presentation funnel — the gate canonicalizer
    sorts rows itself, and a single-task sort of a corpus-sized result
    is exactly the straggler a 100x scale-up can't absorb."""
    for name in [
        "d01_exact_dedup",
        "d02_ngram_jaccard",
        "d03_minhash_signatures",
        "d05_minhash_lsh_pairs",
        "d06_embedding_neardup",
        "d07_simhash_neardup",
        "m04_image_dhash",
        "r03_equi_join_shared_key",
        "r12_surrogate_key",
        "r13_keep_newest",
        "t01_token_stats",
        # t06 excluded: its 1-row corpus-stats aggregate is a legitimate
        # SinglePartition exchange (broadcast scalar), not a funnel.
        # z29 excluded: its one SinglePartition is the 1-row Bloom-filter
        # bit_or reduce (a broadcast scalar by design). z32 excluded: the
        # vocab-ranking window runs over token TYPES (bounded), not docs.
        "x02_fineweb_pipeline",
        "y01_doc_chunks",
        "y02_pii_mask",
        "y05_dup_clusters",
        "y08_decontamination",
        "y09_mix_sample",
        "y10_repetition_metrics",
        "y11_embedding_quant",
        "y12_sequence_packing",
        "y13_snapshot_diff",
        "y14_incremental_neardup",
        "y15_embedding_srp",
        "y17_funnel",
        "y20_salted_agg",
        "y22_salted_join",
        "y24_scd2_dim",
        "y25_cluster_canon",
        "y26_shard_assign",
        "y28_dup_span_removal",
        "y30_srp_wide",
        "y31_simhash_wide",
        "y34_quality_rules",
        "y35_containment_pairs",
        "y38_source_overlap",
        "y39_ppl_buckets",
        "y46_incremental_novelty",
        "y48_semdedup_prune",
        "z22_big_orders",
        "z28_array_funcs",
        "z30_session_window",
        "z31_time_range_rolling",
        "z34_variant_json",
        # round-8 sweep: the round-7 crawl/codec entries emit one row
        # per doc/asset/record (corpus-proportional) — their terminal
        # repartition(1) sorts are gone and pinned gone
        "x04_image_neardup_pipeline",
        "y69_h264_annexb_screening",
        "y70_warc_ingest",
        "y71_script_detect",
        "y72_robots_filter",
        "x05_warc_corpus_pipeline",
        "c11_star_lifecycle",
        "y73_incremental_cc",
    ]:
        simple = plan_of(spark, cat, name, "simple")
        assert "SinglePartition" not in simple, name
