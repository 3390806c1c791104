"""State Data Source observability (streaming/state_reader.py): read a
stateful query's checkpoint state as data — metadata map, live
key/value rows, batch time travel, and the per-operator summary row a
monitor would publish."""

import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.streaming import pipeline as sp
from pw_etl_scrumptious_squad_spark.streaming import state_reader as sr

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def dedup_ckpt(spark, tmp_path_factory):
    """Run the watermarked dedup stream over two micro-batches (file b
    redelivers 250 events from file a) and hand back the checkpoint."""
    d = tmp_path_factory.mktemp("sr-ev")
    t = pq.read_table(f"{SF}/events.parquet")
    ids = t.column("event_id").to_numpy()
    pq.write_table(t.filter(pa.array(ids < 750)), str(d / "a.parquet"))
    pq.write_table(t.filter(pa.array(ids >= 500)), str(d / "b.parquet"))
    ckpt = tempfile.mkdtemp(prefix="ckpt-sr-")
    stream = sp.read_event_stream(spark, str(d), max_files_per_trigger=1)
    q = sp.run_available_now(
        sp.dedup_stream(stream), ckpt, "sr_dedup_sink", "append"
    )
    q.awaitTermination(120)
    return ckpt


def test_metadata_maps_the_stateful_operator(spark, dedup_ckpt):
    meta = sr.state_metadata(spark, dedup_ckpt).collect()
    assert len(meta) == 1
    m = meta[0]
    assert m["operatorName"] == "dedupeWithinWatermark"
    assert m["stateStoreName"] == "default"
    assert m["maxBatchId"] >= 1  # two files -> at least two batches


def test_state_rows_are_live_dedup_keys(spark, dedup_ckpt):
    st = sr.read_state(spark, dedup_ckpt)
    # key struct carries the dedup column; values are event_ids we fed
    assert st.schema["key"].dataType.fieldNames() == ["event_id"]
    keys = {r["key"]["event_id"] for r in st.collect()}
    assert keys  # watermark keeps a live suffix of the corpus
    all_ids = set(
        r["event_id"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id")
        .collect()
    )
    assert keys <= all_ids


def test_batch_time_travel_is_monotonic_for_append_only_keys(
    spark, dedup_ckpt
):
    meta = sr.state_metadata(spark, dedup_ckpt).first()
    first = sr.read_state(spark, dedup_ckpt, batch_id=meta["minBatchId"])
    last = sr.read_state(spark, dedup_ckpt, batch_id=meta["maxBatchId"])
    k0 = {r["key"]["event_id"] for r in first.collect()}
    k1 = {r["key"]["event_id"] for r in last.collect()}
    # batch 0 saw only file a (event_id < 750); later batches add b's
    # unexpired keys — earlier unexpired keys don't vanish between the
    # two reads of this short window
    assert k0 and max(k0) < 750
    assert max(k1) > max(k0)


def test_state_summary_publishes_one_health_row(spark, dedup_ckpt):
    rows = sr.state_summary(spark, dedup_ckpt).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row["operator_name"] == "dedupeWithinWatermark"
    live = sr.read_state(spark, dedup_ckpt).count()
    assert row["state_rows"] == live


def test_key_census_covers_all_live_keys(spark, dedup_ckpt):
    census = sr.state_key_census(spark, dedup_ckpt)
    total = census.agg(F.sum("n_keys")).first()[0]
    assert total == sr.read_state(spark, dedup_ckpt).count()
    # partition ids come from the store layout, not the data
    n_parts = sr.state_metadata(spark, dedup_ckpt).first()["numPartitions"]
    assert census.count() <= n_parts


def test_join_state_reads_per_side(spark, tmp_path):
    """Stream-stream join state is exposed per join SIDE, not via its
    internal store names — pins state_summary's symmetricHashJoin
    branch and the joinSide read path."""
    d = tmp_path / "ev-join"
    d.mkdir()
    t = pq.read_table(f"{SF}/events.parquet")
    pq.write_table(t, str(d / "a.parquet"))
    ckpt = tempfile.mkdtemp(prefix="ckpt-sr-join-")
    stream = sp.read_event_stream(spark, str(d))
    q = sp.run_available_now(
        sp.attribution_join(stream), ckpt, "sr_join_sink", "append"
    )
    q.awaitTermination(120)
    summary = sr.state_summary(spark, ckpt).collect()
    join_rows = {
        r["store_name"]: r
        for r in summary
        if r["operator_name"] == "symmetricHashJoin"
    }
    # the four internal stores collapse to two logical per-side rows
    assert sorted(join_rows) == ["left", "right"]
    left = sr.read_state(spark, ckpt, join_side="left")
    right = sr.read_state(spark, ckpt, join_side="right")
    assert join_rows["left"]["state_rows"] == left.count()
    assert join_rows["right"]["state_rows"] == right.count()
    assert left.count() > 0 and right.count() > 0
    # the trigger side carries the t_* columns, the outcome side o_*
    assert "t_user" in left.schema["value"].dataType.fieldNames()
    assert "o_user" in right.schema["value"].dataType.fieldNames()


def test_windowed_agg_state_matches_sink(spark, tmp_path):
    """Second operator shape: the hourly windowed rollup's store holds
    exactly the windows the sink emitted (availableNow drains the
    watermark, so state == final answer here)."""
    d = tmp_path / "ev-roll"
    d.mkdir()
    t = pq.read_table(f"{SF}/events.parquet")
    pq.write_table(t, str(d / "a.parquet"))
    ckpt = tempfile.mkdtemp(prefix="ckpt-sr-roll-")
    stream = sp.read_event_stream(spark, str(d))
    q = sp.run_available_now(
        sp.hourly_rollup(stream), ckpt, "sr_roll_sink", "complete"
    )
    q.awaitTermination(120)
    meta = sr.state_metadata(spark, ckpt).first()
    assert meta["operatorName"] == "stateStoreSave"
    st = sr.read_state(spark, ckpt)
    n_windows = spark.table("sr_roll_sink").count()
    assert st.count() == n_windows
