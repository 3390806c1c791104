"""CDC / watermark tests (reference scenario: FIXTURES.md §4,
test/test_extract.py:404-518 — after a first extraction, row 7 qualifies by
created_at, row 8 by last_updated, row 9 ties the watermark and is dropped
by the strict-> predicate)."""

from datetime import datetime
from decimal import Decimal

from pw_etl_scrumptious_squad_spark.operators.cdc import (
    extract_delta,
    incremental_extract,
)
from pw_etl_scrumptious_squad_spark.schemas import OLTP_SCHEMAS
from pw_etl_scrumptious_squad_spark.sources.state import (
    EPOCH,
    Watermark,
    WatermarkStore,
    delta_watermark,
)
from tests.conftest import LATER_CREATED, LATER_UPDATED, SEED_TS


def _sales_with_late_rows(spark, totesys):
    late = [
        (7, 1, 1, 1, 5, Decimal("9.99"), 1, "2023-03-01", "2023-03-05", 1,
         LATER_CREATED, SEED_TS),      # qualifies by created_at
        (8, 1, 1, 1, 5, Decimal("9.99"), 1, "2023-03-01", "2023-03-05", 1,
         SEED_TS, LATER_UPDATED),      # qualifies by last_updated
        (9, 1, 1, 1, 5, Decimal("9.99"), 1, "2023-03-01", "2023-03-05", 1,
         SEED_TS, SEED_TS),            # ties the watermark — strict > drops it
    ]
    return totesys["sales_order"].unionByName(
        spark.createDataFrame(late, OLTP_SCHEMAS["sales_order"])
    )


def test_strict_delta_matches_reference(spark, totesys):
    snapshot = _sales_with_late_rows(spark, totesys)
    wm = Watermark(created_at=SEED_TS, last_updated=SEED_TS)
    delta = extract_delta(snapshot, wm, inclusive=False)
    assert sorted(r["sales_order_id"] for r in delta.collect()) == [7, 8]


def test_inclusive_delta_recovers_tied_rows(spark, totesys):
    snapshot = _sales_with_late_rows(spark, totesys)
    wm = Watermark(created_at=SEED_TS, last_updated=SEED_TS)
    delta = extract_delta(
        snapshot, wm, inclusive=True, dedup_key="sales_order_id"
    )
    ids = sorted(r["sales_order_id"] for r in delta.collect())
    assert 9 in ids  # the row the reference silently loses
    assert len(ids) == len(set(ids))  # dedup keeps one version per key


def test_delta_watermark_max_agg(totesys):
    wm = delta_watermark(totesys["sales_order"])
    assert wm.created_at == SEED_TS
    assert wm.last_updated == SEED_TS


def test_watermark_store_roundtrip(spark, tmp_path):
    store = WatermarkStore(spark, str(tmp_path / "state.parquet"))
    assert store.load() == {}
    assert store.get("sales_order").created_at == EPOCH
    store.save({"sales_order": Watermark(SEED_TS, SEED_TS)})
    assert store.get("sales_order") == Watermark(SEED_TS, SEED_TS)
    # advance is a monotone max: stale watermarks never regress state
    store.advance("sales_order", Watermark(LATER_CREATED, SEED_TS))
    assert store.get("sales_order").created_at == LATER_CREATED
    store.advance("sales_order", Watermark(EPOCH, EPOCH))
    assert store.get("sales_order").created_at == LATER_CREATED


def test_incremental_extract_cycles(spark, totesys, tmp_path):
    """First cycle: full extraction (EPOCH watermark). Second: empty deltas.
    Third (after late rows appear): only the qualifying rows."""
    store = WatermarkStore(spark, str(tmp_path / "state.parquet"))
    tables = {"sales_order": totesys["sales_order"]}

    first = incremental_extract(tables, store)
    assert sorted(r["sales_order_id"] for r in first["sales_order"].collect()) == [
        1, 2, 3, 4, 5, 6,
    ]

    second = incremental_extract(tables, store)
    assert second == {}  # nothing new — non-empty-only contract

    with_late = {"sales_order": _sales_with_late_rows(spark, totesys)}
    third = incremental_extract(with_late, store)
    assert sorted(r["sales_order_id"] for r in third["sales_order"].collect()) == [7, 8]
    # watermark advanced to the late rows' timestamps
    wm = store.get("sales_order")
    assert wm.created_at == LATER_CREATED
    assert wm.last_updated == LATER_UPDATED


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_i_u_d(spark):
    from pw_etl_scrumptious_squad_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k int, name string, amt double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),       # unchanged -> no row
            (2, "b", 25.0),       # value update
            (3, "c", 30.0),       # NULL -> value is an update (null-safe)
            (5, "e", 50.0),       # insert
        ],
        "k int, name string, amt double",
    )
    rows = {
        r["k"]: (r["op"], r["name"], r["amt"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert rows == {
        2: ("U", "b", 25.0),
        3: ("U", "c", 30.0),
        4: ("D", "d", 40.0),   # delete carries the OLD values
        5: ("I", "e", 50.0),
    }


def test_snapshot_diff_compare_cols_subset_and_multi_key(spark):
    from pw_etl_scrumptious_squad_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, 1, "x", 9.0), (1, 2, "y", 8.0)],
        "k1 int, k2 int, name string, amt double",
    )
    new = spark.createDataFrame(
        [(1, 1, "x", 99.0), (1, 2, "CHANGED", 8.0)],
        "k1 int, k2 int, name string, amt double",
    )
    # comparing only `name`: the amt-only change must NOT surface
    rows = snapshot_diff(old, new, ["k1", "k2"], compare_cols=["name"]).collect()
    assert [(r["k1"], r["k2"], r["op"], r["name"]) for r in rows] == [
        (1, 2, "U", "CHANGED")
    ]
