"""Z-order layout + manifest skipping (operators/layout.py): the point
is PHYSICAL — a 2-D box query must read a small fraction of the files
— so these tests pin the skip rate, the losslessness differential
against the full scan, the Morton key arithmetic, and the
empty-selection edge; value correctness also rides the catalog oracle
(y83_zorder_skipping)."""

import os

import pytest
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import layout as L
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


def test_zorder_key_interleaves_bits(spark):
    # 2 bits per dim for hand-checkable Morton codes over a 4x4 grid
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (2, 1)], "x INT, y INT"
    )
    z = L.zorder_key({"x": (0, 3), "y": (0, 3)}, bits=2)
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z).collect()
    }
    # x takes even lanes (0,2), y odd lanes (1,3)
    assert got[(0, 0)] == 0
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b0110  # x=10 -> lanes 2,0 = 0b0100; y=01 -> lane 1


def test_constant_column_quantizes_to_zero(spark):
    df = spark.createDataFrame([(5, 1), (5, 2)], "x INT, y INT")
    z = L.zorder_key({"x": (5, 5), "y": (1, 2)}, bits=4)
    vals = [r["z"] for r in df.withColumn("z", z).collect()]
    assert all(v >= 0 for v in vals)


def _layout(spark, tmp_path):
    li = read_table(spark, SF, "lineitem")
    path = str(tmp_path / "zlayout")
    manifest = L.write_zorder_layout(
        spark, li, path, cols=("l_partkey", "l_suppkey"), n_files=32
    )
    return li, path, manifest


def test_manifest_covers_all_rows_and_files(spark, tmp_path):
    li, path, manifest = _layout(spark, tmp_path)
    assert sum(e["n_rows"] for e in manifest["files"]) == li.count()
    assert len(manifest["files"]) <= 32
    assert os.path.exists(os.path.join(path, L.MANIFEST_NAME))


def test_box_query_skips_files_and_is_lossless(spark, tmp_path):
    li, path, manifest = _layout(spark, tmp_path)
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    pmn, pmx, smn, smx = b
    pr = (pmn + (pmx - pmn) // 4, pmn + (pmx - pmn) // 2)
    sr = (smn + (smx - smn) // 4, smn + (smx - smn) // 2)
    df, n_sel, n_tot = L.read_with_skipping(
        spark, path, {"l_partkey": pr, "l_suppkey": sr}
    )
    # the skip must be real: a ~1/16 box over a z-ordered layout
    # cannot need more than half the files
    assert n_sel < n_tot / 2, (n_sel, n_tot)
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in df.select("l_orderkey", "l_linenumber").collect()
    )
    exp = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.filter(
            F.col("l_partkey").between(*pr) & F.col("l_suppkey").between(*sr)
        ).select("l_orderkey", "l_linenumber").collect()
    )
    assert got == exp and len(got) > 0


def test_empty_box_returns_schema_stable_empty(spark, tmp_path):
    li, path, _ = _layout(spark, tmp_path)
    mx = li.agg(F.max("l_partkey")).first()[0]
    df, n_sel, _ = L.read_with_skipping(
        spark, path, {"l_partkey": (mx + 10, mx + 20)}
    )
    assert n_sel == 0
    assert df.count() == 0
    assert "l_orderkey" in df.columns


def test_single_dim_range_also_prunes(spark, tmp_path):
    # z-order degrades gracefully to one dimension: a narrow partkey
    # slice still skips files (the even bit lanes dominate ordering)
    li, path, _ = _layout(spark, tmp_path)
    b = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    lo = b[0] + (b[1] - b[0]) // 3
    hi = lo + max(1, (b[1] - b[0]) // 10)
    df, n_sel, n_tot = L.read_with_skipping(
        spark, path, {"l_partkey": (lo, hi)}
    )
    assert n_sel < n_tot
    assert df.count() == li.filter(F.col("l_partkey").between(lo, hi)).count()


def test_empty_input_fails_fast_before_writing(spark, tmp_path):
    li = read_table(spark, SF, "lineitem").filter(F.lit(False))
    path = str(tmp_path / "zempty")
    with pytest.raises(ValueError, match="no non-NULL values"):
        L.write_zorder_layout(
            spark, li, path, cols=("l_partkey", "l_suppkey"), n_files=8
        )
    # nothing landed: no half-written layout missing its manifest
    assert not os.path.exists(path)


def test_layout_round_trip_through_non_file_scheme(spark, tmp_path):
    """The manifest publish/read and file resolution must ride the
    Hadoop FileSystem chain (round-9 verdict item 1: layout.py was the
    one publish surface still on plain open()/os.path): write the
    layout to a viewfs:// URI, read it back with skipping through the
    same scheme, and check losslessness + a real skip."""
    from pw_etl_scrumptious_squad_spark.sources.parquet import (
        configure_object_store,
    )

    (tmp_path / "zlake").mkdir()
    configure_object_store(
        spark,
        scheme="viewfs",
        extra_conf={
            "fs.viewfs.mounttable.zlake.link./data": f"file:{tmp_path}/zlake"
        },
    )
    li = read_table(spark, SF, "lineitem")
    path = "viewfs://zlake/data/zlayout"
    manifest = L.write_zorder_layout(
        spark, li, path, cols=("l_partkey", "l_suppkey"), n_files=16
    )
    assert sum(e["n_rows"] for e in manifest["files"]) == li.count()
    b = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    pmn, pmx, smn, smx = b
    pr = (pmn + (pmx - pmn) // 4, pmn + (pmx - pmn) // 2)
    sr = (smn + (smx - smn) // 4, smn + (smx - smn) // 2)
    df, n_sel, n_tot = L.read_with_skipping(
        spark, path, {"l_partkey": pr, "l_suppkey": sr}
    )
    assert 0 < n_sel < n_tot
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in df.select("l_orderkey", "l_linenumber").collect()
    )
    exp = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.filter(
            F.col("l_partkey").between(*pr) & F.col("l_suppkey").between(*sr)
        ).select("l_orderkey", "l_linenumber").collect()
    )
    assert got == exp and len(got) > 0


def test_manifest_file_drift_fails_loudly(spark, tmp_path):
    li, path, manifest = _layout(spark, tmp_path)
    # simulate out-of-band deletion of a data file the manifest names
    victim = manifest["files"][0]["file"]
    os.unlink(os.path.join(path, victim))
    b = li.agg(F.min("l_partkey"), F.max("l_partkey"),
               F.min("l_suppkey"), F.max("l_suppkey")).first()
    with pytest.raises(FileNotFoundError, match="out of sync"):
        L.read_with_skipping(
            spark, path,
            {"l_partkey": (b[0], b[1]), "l_suppkey": (b[2], b[3])},
        )


# ----- per-file Bloom sidecar (round 10): equality file skipping -----

def _bloom_layout(spark, tmp_path, n_files=24):
    li = read_table(spark, SF, "lineitem")
    path = str(tmp_path / "blayout")
    li.repartitionByRange(n_files, "l_orderkey").write.mode(
        "overwrite"
    ).parquet(path)
    L.write_bloom_sidecar(spark, path, "l_orderkey")
    return li, path


def test_bloom_lookup_is_lossless_and_skips(spark, tmp_path):
    li, path = _bloom_layout(spark, tmp_path)
    keys = [r[0] for r in li.select("l_orderkey").distinct().limit(3).collect()]
    df, n_sel, n_tot = L.read_with_bloom(spark, path, "l_orderkey", keys)
    # point lookups on a range-clustered layout must skip most files
    assert 0 < n_sel <= len(keys) and n_sel < n_tot / 2
    got = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in df.select("l_orderkey", "l_linenumber").collect()
    )
    exp = sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.filter(F.col("l_orderkey").isin(keys))
        .select("l_orderkey", "l_linenumber").collect()
    )
    assert got == exp and len(got) > 0


def test_bloom_never_false_negative(spark, tmp_path):
    # the hard guarantee: EVERY present key must survive the skip —
    # probe a sample of 40 real keys one by one
    li, path = _bloom_layout(spark, tmp_path)
    keys = [
        r[0]
        for r in li.select("l_orderkey").distinct().limit(40).collect()
    ]
    df, n_sel, _ = L.read_with_bloom(spark, path, "l_orderkey", keys)
    want = li.filter(F.col("l_orderkey").isin(keys)).count()
    assert df.count() == want


def test_bloom_absent_key_and_missing_sidecar(spark, tmp_path):
    li, path = _bloom_layout(spark, tmp_path)
    df, n_sel, _ = L.read_with_bloom(spark, path, "l_orderkey", 10**12)
    # an absent key usually selects zero files (FP possible but ~1%);
    # rows are ALWAYS zero because the exact filter still applies
    assert n_sel <= 1
    assert df.count() == 0
    assert "l_partkey" in df.columns
    with pytest.raises(FileNotFoundError, match="no Bloom sidecar"):
        L.read_with_bloom(spark, path, "l_suppkey", 5)


def test_bloom_sidecar_through_non_file_scheme(spark, tmp_path):
    from pw_etl_scrumptious_squad_spark.sources.parquet import (
        configure_object_store,
    )

    (tmp_path / "blake").mkdir()
    configure_object_store(
        spark,
        scheme="viewfs",
        extra_conf={
            "fs.viewfs.mounttable.blake.link./data": f"file:{tmp_path}/blake"
        },
    )
    li = read_table(spark, SF, "lineitem")
    path = "viewfs://blake/data/blayout"
    li.repartitionByRange(16, "l_orderkey").write.mode("overwrite").parquet(path)
    L.write_bloom_sidecar(spark, path, "l_orderkey")
    key = li.select("l_orderkey").first()[0]
    df, n_sel, n_tot = L.read_with_bloom(spark, path, "l_orderkey", key)
    assert 0 < n_sel < n_tot
    assert df.count() == li.filter(F.col("l_orderkey") == key).count()
