"""CSV / JSON-lines connectors: schema enforcement, corrupt-record
quarantine, and round-trip fidelity against the parquet truth."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pw_etl_scrumptious_squad_spark.sources import delimited as dl
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


def _orders_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampNTZType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )


@pytest.fixture()
def orders(spark):
    return read_table(spark, SF, "orders").select(
        *[f.name for f in _orders_schema().fields]
    )


def test_csv_round_trip_matches_parquet_truth(spark, tmp_path, orders):
    path = str(tmp_path / "orders_csv")
    dl.write_csv(orders, path)
    back = dl.read_csv(spark, path, _orders_schema())
    good, bad = dl.split_corrupt(back)
    assert bad.count() == 0
    # nullability flags differ between a parquet scan and a CSV read;
    # names + types are the schema contract
    assert [(f.name, f.dataType) for f in good.schema.fields] == [
        (f.name, f.dataType) for f in orders.schema.fields
    ]
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in orders.columns]
    )
    assert (
        sorted(r[0] for r in good.select(key).collect())
        == sorted(r[0] for r in orders.select(key).collect())
    )


def test_jsonl_round_trip_with_nested_types(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, ["a", "b"], {"k": 2}), (2, [], {})],
        "id long, tags array<string>, attrs map<string,int>",
    )
    path = str(tmp_path / "nested_jsonl")
    dl.write_jsonl(df, path)
    back = dl.read_jsonl(spark, path, df.schema)
    good, bad = dl.split_corrupt(back)
    assert bad.count() == 0
    rows = {r["id"]: r for r in good.collect()}
    assert rows[1]["tags"] == ["a", "b"] and rows[1]["attrs"] == {"k": 2}
    assert rows[2]["tags"] == [] and rows[2]["attrs"] == {}


def test_corrupt_jsonl_rows_are_quarantined_not_dropped(spark, tmp_path):
    p = tmp_path / "drop" / "part-0.jsonl"
    os.makedirs(p.parent)
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "{this is not json}\n"
        '{"id": 3, "name": "also ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    good, bad = dl.split_corrupt(
        dl.read_jsonl(spark, str(p.parent), schema)
    )
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    dead = [r[dl.CORRUPT_COL] for r in bad.collect()]
    assert dead == ["{this is not json}"]


def test_csv_malformed_line_failfast_raises(spark, tmp_path):
    p = tmp_path / "drop" / "part-0.csv"
    os.makedirs(p.parent)
    p.write_text("id,n\n1,2\nnot_a_number,xyz,extra,cols\n")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("n", T.LongType())]
    )
    with pytest.raises(Exception):
        dl.read_csv(
            spark, str(p.parent), schema, quarantine=False
        ).collect()
    # and the quarantine path recovers the good row + captures the raw line
    good, bad = dl.split_corrupt(dl.read_csv(spark, str(p.parent), schema))
    assert [(r["id"], r["n"]) for r in good.collect()] == [(1, 2)]
    assert bad.count() == 1


def test_csv_output_is_gzip_compressed_and_splittable_layout(
    spark, tmp_path, orders
):
    path = str(tmp_path / "orders_gz")
    dl.write_csv(orders.repartition(4), path)
    parts = glob.glob(os.path.join(path, "part-*.csv.gz"))
    assert len(parts) == 4  # one file per partition -> parallel re-read
    with gzip.open(parts[0], "rt") as f:
        assert f.readline().startswith("o_orderkey")


def test_orc_round_trip_matches_parquet_truth(spark, tmp_path):
    """ORC write/read round-trips the lineitem slice value-exactly
    (timestamps, decimals-as-doubles, strings), with partitioning and
    a pushdown-friendly layout."""
    from pw_etl_scrumptious_squad_spark.sources import orc
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    truth = read_table(spark, "/root/testdata/sf0.001", "orders").limit(200)
    p = str(tmp_path / "orders_orc")
    orc.write_orc(truth, p, partition_by=["o_orderstatus"])
    back = orc.read_orc(spark, p)
    a = sorted(map(tuple, truth.select(sorted(truth.columns)).collect()))
    b = sorted(map(tuple, back.select(sorted(truth.columns)).collect()))
    assert a == b
    # partition pruning: a status filter must NOT scan every partition
    plan = (
        back.filter(back["o_orderstatus"] == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "o_orderstatus" in plan
