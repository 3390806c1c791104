"""Python DataSource API connector (sources/pydatasource.py): batch
determinism/parallelism and micro-batch stream parity with the batch read."""

import tempfile

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.sources.pydatasource import (
    SyntheticDocsDataSource,
)


def _register(spark):
    spark.dataSource.register(SyntheticDocsDataSource)


def test_batch_read_deterministic_and_partitioned(spark):
    _register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 500)
        .option("num_partitions", 8)
        .load()
    )
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.rdd.getNumPartitions() == 8
    rows1 = sorted(tuple(r) for r in df.collect())
    rows2 = sorted(
        tuple(r)
        for r in spark.read.format("synthetic_docs")
        .option("n_docs", 500)
        .load()
        .collect()
    )
    assert rows1 == rows2  # same seed => byte-identical regeneration
    assert len(rows1) == 500
    assert len({r[0] for r in rows1}) == 500  # ids unique
    n_chars_ok = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 500)
        .load()
        .filter(F.length("text") != F.col("n_chars"))
        .count()
    )
    assert n_chars_ok == 0


def test_different_seed_changes_content(spark):
    _register(spark)
    a = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 50)
        .option("seed", 1)
        .load()
        .agg(F.md5(F.concat_ws("|", F.collect_list("text"))).alias("h"))
        .first()["h"]
    )
    b = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 50)
        .option("seed", 2)
        .load()
        .agg(F.md5(F.concat_ws("|", F.collect_list("text"))).alias("h"))
        .first()["h"]
    )
    assert a != b


def test_stream_batches_union_to_batch_read(spark):
    _register(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("rows_per_batch", 40)
        .option("num_partitions", 4)
        .load()
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt-pydatasource-")
    q = (
        stream.writeStream.format("memory")
        .queryName("synthetic_docs_sink")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        # drain at least 3 micro-batches (>= 120 rows)
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql(
                "SELECT count(*) AS n FROM synthetic_docs_sink"
            ).first()["n"]
            if n >= 120:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql("SELECT * FROM synthetic_docs_sink").collect()
    }
    n = len(got)
    assert n >= 120
    # ids are the contiguous prefix [0, n) and every row equals the batch
    # read of the same range: stream == batch on the shared id range
    batch = {
        tuple(r)
        for r in spark.read.format("synthetic_docs")
        .option("n_docs", n)
        .load()
        .collect()
    }
    assert got == batch


def test_stream_reader_offset_ratchets_on_restart():
    """A fresh reader instance (query restart) must never hand the engine
    an offset below one it has already seen via the checkpoint-replayed
    partitions()/commit() calls — otherwise committed id ranges would be
    re-planned and re-emitted, breaking stream==batch parity."""
    from pw_etl_scrumptious_squad_spark.sources.pydatasource import (
        SyntheticDocsStreamReader,
    )

    r1 = SyntheticDocsStreamReader({"rows_per_batch": "100"})
    assert r1.latestOffset() == {"doc_id": 100}
    r1.partitions({"doc_id": 0}, {"doc_id": 100})
    r1.commit({"doc_id": 100})

    # restart: fresh instance, engine replays the committed batch range
    r2 = SyntheticDocsStreamReader({"rows_per_batch": "100"})
    r2.partitions({"doc_id": 100}, {"doc_id": 200})
    assert r2.latestOffset() == {"doc_id": 300}  # not 100

    # restart where only commit() fires before the next offset request
    r3 = SyntheticDocsStreamReader({"rows_per_batch": "100"})
    r3.commit({"doc_id": 500})
    assert r3.latestOffset()["doc_id"] >= 600


def test_zorder_layout_datasource_schedules_only_intersecting_files(
    spark, tmp_path
):
    """Round-10 verdict item 9: manifest skipping composed with Spark's
    OWN planner via the Python DataSource pushFilters API (Spark 4.1) —
    a box predicate reaches the reader during planning, partitions()
    schedules only manifest-intersecting files (pinned by scan
    partition count), values match the plain read exactly (filters stay
    residual -> lossless), and an impossible box yields one empty
    schema-stable partition. c16/y83's pre-listing helper keeps its own
    parity — this is the planner-integrated route over the same layout."""
    from pyspark.sql import functions as F

    from pw_etl_scrumptious_squad_spark.operators import layout as L
    from pw_etl_scrumptious_squad_spark.sources.layout_datasource import (
        ZOrderLayoutDataSource,
    )
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "zl")
    manifest = L.write_zorder_layout(
        spark, li, path, cols=("l_partkey", "l_suppkey"), n_files=32
    )
    n_files = len(manifest["files"])
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(ZOrderLayoutDataSource)
        full = spark.read.format("zorder_layout").option("path", path).load()
        assert full.rdd.getNumPartitions() == n_files
        assert full.count() == li.count()

        b = li.agg(
            F.min("l_partkey"), F.max("l_partkey"),
            F.min("l_suppkey"), F.max("l_suppkey"),
        ).first()
        pr = (b[0] + (b[1] - b[0]) // 4, b[0] + (b[1] - b[0]) // 2)
        sr = (b[2] + (b[3] - b[2]) // 4, b[2] + (b[3] - b[2]) // 2)
        boxed = full.filter(
            F.col("l_partkey").between(*pr) & F.col("l_suppkey").between(*sr)
        )
        # the skip happens AT PLANNING: the scan schedules only
        # manifest-intersecting files
        assert boxed.rdd.getNumPartitions() < n_files / 2
        got = sorted(
            (r["l_orderkey"], r["l_linenumber"])
            for r in boxed.select("l_orderkey", "l_linenumber").collect()
        )
        exp = sorted(
            (r["l_orderkey"], r["l_linenumber"])
            for r in li.filter(
                F.col("l_partkey").between(*pr)
                & F.col("l_suppkey").between(*sr)
            ).select("l_orderkey", "l_linenumber").collect()
        )
        assert got == exp and len(got) > 0

        none = full.filter(F.col("l_partkey") > 10**9)
        assert none.rdd.getNumPartitions() == 1  # single empty partition
        assert none.count() == 0
        assert "l_orderkey" in none.columns
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)


def test_bloom_layout_datasource_schedules_only_admitting_files(
    spark, tmp_path
):
    """Equality skipping composed with Spark's OWN planner (the
    round-10 layout_datasource pattern, Bloom leg): an EqualTo on the
    key column reaches the reader during planning, partitions()
    schedules only sidecar-admitting files (pinned by scan partition
    count), values match the plain read exactly (filters stay residual
    -> lossless), an absent key yields one empty schema-stable
    partition, and an unfiltered read schedules every file."""
    from pyspark.sql import functions as F

    from pw_etl_scrumptious_squad_spark.operators import layout as L
    from pw_etl_scrumptious_squad_spark.sources.bloom_datasource import (
        BloomLayoutDataSource,
    )
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    li = read_table(spark, "/root/testdata/sf0.001", "lineitem")
    path = str(tmp_path / "bl")
    li.repartitionByRange(16, "l_orderkey").write.mode("overwrite").parquet(
        path
    )
    L.write_bloom_sidecar(spark, path, "l_orderkey")
    n_files = len(
        [n for n in __import__("os").listdir(path) if n.endswith(".parquet")]
    )
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(BloomLayoutDataSource)
        full = (
            spark.read.format("bloom_layout")
            .option("path", path)
            .option("key", "l_orderkey")
            .load()
        )
        assert full.rdd.getNumPartitions() == n_files
        assert full.count() == li.count()

        probe = int(li.agg(F.min("l_orderkey")).first()[0])
        hit = full.filter(F.col("l_orderkey") == probe)
        # the skip happens AT PLANNING: clustered layout -> the key
        # lives in few files, so most are never scheduled
        assert hit.rdd.getNumPartitions() < max(2, n_files // 2)
        got = sorted(
            r["l_linenumber"] for r in hit.select("l_linenumber").collect()
        )
        exp = sorted(
            r["l_linenumber"]
            for r in li.filter(F.col("l_orderkey") == probe)
            .select("l_linenumber")
            .collect()
        )
        assert got == exp and len(got) > 0

        absent = full.filter(F.col("l_orderkey") == 10**12)
        assert absent.rdd.getNumPartitions() == 1  # single empty partition
        assert absent.count() == 0
        assert "l_linenumber" in absent.columns
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
