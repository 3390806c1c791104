"""Bucketed warehouse layout (operators/bucketed.py): the point of the
layout is PHYSICAL — the join and the follow-up aggregation must plan
with zero Exchange nodes — so these tests pin the plan shape, the
differential against the unbucketed twin, and the per-session write
memoization, while value correctness rides the catalog-wide oracle
sweep (tests/test_catalog_oracle.py::y74_bucketed_join)."""

import os

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import bucketed
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bucketed_agg(spark):
    lt = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "lineitem", SF, "l_orderkey"
    )
    ot = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "orders"), "orders", SF, "o_orderkey"
    )
    j = bucketed.bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey")
    return j.groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_date")).agg(
        F.count(F.lit(1)).alias("n_items")
    )


def test_join_and_agg_plan_has_zero_exchanges(spark):
    agg = _bucketed_agg(spark)
    plan = _plan(agg)
    # the merge hint pinned SortMergeJoin; bucketing must satisfy its
    # distribution requirement on BOTH sides, and the groupBy keys
    # contain the bucket key so the aggregation reuses the layout too
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    # both scans consume the bucket spec (not a plain file scan that
    # happens to avoid a shuffle some other way)
    assert plan.count("Bucketed: true") == 2
    assert plan.count("SelectedBucketsCount: 16 out of 16") == 2


def test_unbucketed_twin_needs_exchanges(spark):
    # differential: the SAME logical join over the raw parquet shuffles
    # both sides — what the layout write amortizes away
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders")
    j = li.join(o.hint("merge"), li["l_orderkey"] == o["o_orderkey"])
    plan = _plan(
        j.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    )
    assert "Exchange" in plan


def test_values_match_unbucketed_twin(spark):
    got = {
        (r["l_orderkey"], r["o_date"]): r["n_items"]
        for r in _bucketed_agg(spark).collect()
    }
    li = read_table(spark, SF, "lineitem")
    o = read_table(spark, SF, "orders")
    want = {
        (r["l_orderkey"], r["o_date"]): r["n_items"]
        for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_date"))
        .agg(F.count(F.lit(1)).alias("n_items"))
        .collect()
    }
    assert got == want


def test_layout_write_is_memoized_per_session(spark):
    lt = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "lineitem", SF, "l_orderkey"
    )
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    path = loc.removeprefix("file:")
    marker = os.path.join(path, "_SUCCESS")
    before = os.path.getmtime(marker)
    again = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "lineitem", SF, "l_orderkey"
    )
    assert again == lt
    assert os.path.getmtime(marker) == before  # no rewrite


def test_point_lookup_prunes_to_one_bucket(spark):
    # a literal-key filter reads 1 of 16 buckets — the layout gives
    # point lookups a 16x scan cut on top of the shuffle-free joins.
    # autoBucketedScan must be off for a bare filter: Spark auto-reverts
    # to a plain (better-parallelized) scan when the plan has no
    # distribution requirement, which also forfeits bucket pruning.
    lt = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "lineitem", SF, "l_orderkey"
    )
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prior = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        df = spark.table(lt).filter(F.col("l_orderkey") == 1102)
        assert "SelectedBucketsCount: 1 out of 16" in _plan(df)
    finally:
        spark.conf.set(key, prior)


def test_append_preserves_layout_and_join_stays_shuffle_free(spark, tmp_path):
    # warehouse maintenance: micro-batch appends into a bucketed table
    # must land in the right buckets (Spark enforces the bucket spec on
    # insert) so the recurring join NEVER silently regrows a shuffle
    li = read_table(spark, SF, "lineitem").limit(200)
    o = read_table(spark, SF, "orders").limit(50)
    lt, ot = "bkt_append_li", "bkt_append_o"
    for df, tbl, key in ((li, lt, "l_orderkey"), (o, ot, "o_orderkey")):
        bucketed.write_bucketed(
            df, tbl, key, 4, path=str(tmp_path / tbl)
        )
    before = spark.table(lt).count()
    li.limit(40).write.mode("append").format("parquet").insertInto(lt)
    assert spark.table(lt).count() == before + 40
    j = bucketed.bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey")
    plan = _plan(j.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")))
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    for tbl in (lt, ot):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_fresh_process_adopts_published_layout_without_rewriting(spark):
    # cross-process safety: the published dir is IMMUTABLE — a session
    # that doesn't have the table yet registers DDL over the existing
    # files (adopt), never drop+overwrite (which deleted files under a
    # concurrent reader's file listing — the FAILED_READ_FILE race the
    # full suite caught). Simulate the fresh process by clearing the
    # session memo + catalog entry.
    lt = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "lineitem", SF, "l_orderkey"
    )
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    marker = os.path.join(loc.removeprefix("file:"), "_SUCCESS")
    before = os.path.getmtime(marker)
    spark.sql(f"DROP TABLE {lt}")  # external: files stay
    bucketed._WRITTEN.discard((spark.sparkContext.applicationId, lt))
    again = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "lineitem", SF, "l_orderkey"
    )
    assert again == lt
    assert os.path.getmtime(marker) == before  # adopted, not rewritten
    # the DDL-registered table still carries the bucket spec the join needs
    plan = _plan(
        bucketed.bucketed_join(
            spark, lt,
            bucketed.ensure_bucketed(
                spark, read_table(spark, SF, "orders"), "orders", SF,
                "o_orderkey",
            ),
            "l_orderkey", "o_orderkey",
        ).groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    )
    assert "Exchange" not in plan


def test_rename_loser_adopts_winner_layout(spark, tmp_path, monkeypatch):
    # publish race, loser side: a concurrent winner publishes WHILE our
    # tmp layout is being built (after our final-dir probe missed) — we
    # must discard our tmp and adopt the winner's files, never clobber
    import os as _os

    from pw_etl_scrumptious_squad_spark.operators import bucketed as bkt

    li = read_table(spark, SF, "lineitem").limit(100)
    root = str(tmp_path / "race")
    src = str(tmp_path / "src")  # distinct fingerprint per test
    table = bkt.bucket_table_name("loser", src, "l_orderkey", 4)
    final = _os.path.join(root, table)

    real_write = bkt.write_bucketed

    def write_and_get_scooped(df, tbl, col, n, path):
        real_write(df, tbl, col, n, path)
        if not _os.path.exists(final):
            # the "winner" lands a complete layout mid-build
            real_write(df, tbl + "_w", col, n, path=str(tmp_path / "w"))
            spark.sql(f"DROP TABLE {tbl}_w")
            _os.makedirs(root, exist_ok=True)
            _os.rename(str(tmp_path / "w"), final)

    monkeypatch.setattr(bkt, "write_bucketed", write_and_get_scooped)
    got = bkt.ensure_bucketed(
        spark, li, "loser", src, "l_orderkey", 4, base_dir=root
    )
    monkeypatch.undo()
    assert got == table
    # winner's files intact, loser's tmp cleaned up, table readable
    assert spark.table(table).count() == 100
    leftovers = [d for d in _os.listdir(root) if d != table]
    assert leftovers == []
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_torn_publish_raises_then_self_heals(spark, tmp_path, monkeypatch):
    # round-8 advice: a publish whose rename/write failed must RAISE
    # instead of registering DDL over a missing/empty directory (the
    # silent-zero-rows failure). The torn final dir is garbage-collected
    # on the next attempt (an atomic rename only lands complete dirs,
    # so a dir without _SUCCESS is always a wreck).
    import os as _os

    import pytest

    from pw_etl_scrumptious_squad_spark.operators import bucketed as bkt

    li = read_table(spark, SF, "lineitem").limit(60)
    root = str(tmp_path / "r")
    src = str(tmp_path / "src2")

    def broken_write(df, tbl, col, n, path):
        _os.makedirs(path)  # no data files, no _SUCCESS

    monkeypatch.setattr(bkt, "write_bucketed", broken_write)
    with pytest.raises(OSError, match="publish failed"):
        bkt.ensure_bucketed(
            spark, li, "torn", src, "l_orderkey", 4, base_dir=root
        )
    monkeypatch.undo()
    table = bkt.bucket_table_name("torn", src, "l_orderkey", 4)
    assert not spark.catalog.tableExists(table)  # no zero-row table
    # retry with the real writer: the torn dir is cleared and replaced
    got = bkt.ensure_bucketed(
        spark, li, "torn", src, "l_orderkey", 4, base_dir=root
    )
    assert got == table
    assert spark.table(table).count() == 60
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_regenerated_source_gets_fresh_layout(spark, tmp_path):
    # round-8 advice (medium): the layout digest folds in a content
    # fingerprint of the source, so data REGENERATED at the same path
    # names (and builds) a new layout instead of silently adopting the
    # stale cached one
    import os as _os

    from pw_etl_scrumptious_squad_spark.operators import bucketed as bkt

    src = str(tmp_path / "gen")
    root = str(tmp_path / "layouts")
    spark.range(100).withColumnRenamed("id", "k").write.parquet(
        _os.path.join(src, "t.parquet")
    )
    df1 = spark.read.parquet(_os.path.join(src, "t.parquet"))
    t1 = bkt.ensure_bucketed(spark, df1, "gen", src, "k", 4, base_dir=root)
    assert spark.table(t1).count() == 100
    # regenerate the source at the SAME path with different rows
    spark.range(250).withColumnRenamed("id", "k").write.mode(
        "overwrite"
    ).parquet(_os.path.join(src, "t.parquet"))
    bkt._FPRINT.clear()  # a fresh process has no fingerprint memo
    df2 = spark.read.parquet(_os.path.join(src, "t.parquet"))
    t2 = bkt.ensure_bucketed(spark, df2, "gen", src, "k", 4, base_dir=root)
    assert t2 != t1  # new content -> new layout name, no stale adoption
    assert spark.table(t2).count() == 250
    for t in (t1, t2):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_layout_through_non_file_scheme(spark, tmp_path):
    # round-8 verdict item 8: the publish-then-adopt chain runs on the
    # Hadoop FileSystem API, so the layout works on s3a://-class stores.
    # Mount viewfs://lake/ over tmp_path (the same seam s3a credentials
    # ride) and run the full ensure->join->zero-exchange contract.
    from pw_etl_scrumptious_squad_spark.operators import bucketed as bkt
    from pw_etl_scrumptious_squad_spark.sources.parquet import (
        configure_object_store,
    )

    (tmp_path / "warehouse").mkdir()
    configure_object_store(
        spark,
        scheme="viewfs",
        extra_conf={
            "fs.viewfs.mounttable.bktlake.link./data": f"file:{tmp_path}"
        },
    )
    base = "viewfs://bktlake/data/warehouse"
    lt = bkt.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "vfs_li", SF,
        "l_orderkey", base_dir=base,
    )
    ot = bkt.ensure_bucketed(
        spark, read_table(spark, SF, "orders"), "vfs_o", SF,
        "o_orderkey", base_dir=base,
    )
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    assert loc.startswith("viewfs://bktlake/")  # genuinely on the scheme
    j = bkt.bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey")
    plan = _plan(j.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")))
    assert "Exchange" not in plan
    assert "SortMergeJoin" in plan
    assert j.count() > 0
    for t in (lt, ot):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_one_side_bucketed_store_shuffles_only_the_batch(spark, tmp_path):
    # the incremental-store geometry (shingle_df_store's "write it
    # bucketed by h" posture): a per-batch join against a bucketed
    # corpus-sized store shuffles ONLY the batch side — per-ingest cost
    # is the batch, never the store
    from pw_etl_scrumptious_squad_spark.operators.text import shingle_df_store

    docs = read_table(spark, SF, "documents")
    store = shingle_df_store(docs.filter(F.col("doc_id") % 50 != 0))
    bucketed.write_bucketed(
        store, "bkt_sh_store_t", "h", 8, path=str(tmp_path / "store")
    )
    batch = shingle_df_store(
        docs.filter(F.col("doc_id") % 50 == 0)
    ).withColumnRenamed("df", "batch_df")
    merged = (
        spark.table("bkt_sh_store_t")
        .hint("merge")
        .join(batch, "h")
        .groupBy("h")
        .agg(F.sum(F.col("df") + F.col("batch_df")).alias("total"))
    )
    plan = _plan(merged)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 1  # the store side scan
    # every Exchange sits on the BATCH branch: in toString's tree the
    # store is the join's left child, whose lines carry the ':'
    # continuation marker — no left-branch line may shuffle. (The batch
    # side legitimately carries its own agg shuffle plus an 8-bucket
    # redistribution; run shuffle.partitions == numBuckets and the agg
    # exchange is reused outright.)
    left_branch_exchanges = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and ln.lstrip().startswith(":")
    ]
    assert left_branch_exchanges == []
    assert "Exchange hashpartitioning(h" in plan  # batch redistributes to the store
    assert merged.count() > 0
    spark.sql("DROP TABLE IF EXISTS bkt_sh_store_t")


def test_one_file_per_bucket(spark):
    # precondition for Spark trusting sortBy order at read time, and the
    # proof that the pre-write repartition aligned tasks with buckets
    lt = bucketed.ensure_bucketed(
        spark, read_table(spark, SF, "lineitem"), "lineitem", SF, "l_orderkey"
    )
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]["data_type"]
    )
    path = loc.removeprefix("file:")
    data_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(data_files) == bucketed.DEFAULT_BUCKETS
