"""Alerting seam (round 7 — the reference's CloudWatch-alarm -> SNS
surface, terraform/alarm.tf:17-76): declarative thresholds over observed
metrics fire a pluggable sink exactly once per violation per batch."""

from __future__ import annotations

import json

import pytest

from pw_etl_scrumptious_squad_spark.alerts import (
    Alert,
    AlertManager,
    Threshold,
    file_sink,
    log_sink,
)


def test_threshold_evaluation_semantics():
    t = Threshold("n_null_key", ">", 0)
    assert t.violated_by({"n_null_key": 1})
    assert not t.violated_by({"n_null_key": 0})
    assert not t.violated_by({})  # missing='ignore' default
    assert Threshold("hb", ">", 0, missing="alert").violated_by({})
    with pytest.raises(ValueError, match="unknown op"):
        Threshold("x", "~", 1)
    with pytest.raises(ValueError, match="missing"):
        Threshold("x", ">", 1, missing="maybe")
    with pytest.raises(TypeError, match="not numeric"):
        Threshold("x", ">", 1).violated_by({"x": "oops"})
    # every comparator
    assert Threshold("x", "<=", 5).violated_by({"x": 5})
    assert Threshold("x", "!=", 5).violated_by({"x": 4})
    assert not Threshold("x", "==", 5).violated_by({"x": 4})


def test_manager_fires_exactly_once_per_violation():
    fired: list[Alert] = []
    mgr = AlertManager(
        [
            Threshold("n_null_key", ">", 0),
            Threshold("n_rows", "<", 1, severity="warn"),
            Threshold("total", ">", 1e9),
        ],
        sink=fired.append,
    )
    out = mgr.evaluate(
        {"n_null_key": 3, "n_rows": 10, "total": 5.0}, context="batch-1"
    )
    assert [a.metric for a in fired] == ["n_null_key"]
    assert out == fired
    assert fired[0].observed == 3 and fired[0].severity == "error"
    assert "batch-1" in fired[0].message()
    # a second batch evaluates independently (once per batch, not sticky)
    mgr.evaluate({"n_null_key": 1, "n_rows": 10, "total": 0}, context="b2")
    assert len(fired) == 2

    with pytest.raises(ValueError, match="duplicate"):
        AlertManager([Threshold("a", ">", 1), Threshold("a", ">", 1)])


def test_file_and_log_sinks(tmp_path, caplog):
    path = str(tmp_path / "alerts.jsonl")
    mgr = AlertManager([Threshold("x", ">", 1)], sink=file_sink(path))
    mgr.evaluate({"x": 5}, context="c")
    mgr.evaluate({"x": 0}, context="c")
    mgr.evaluate({"x": 9}, context="c")
    lines = [json.loads(ln) for ln in open(path)]
    assert len(lines) == 2
    assert lines[0]["observed"] == 5 and lines[1]["observed"] == 9
    assert lines[0]["metric"] == "x" and lines[0]["severity"] == "error"

    import logging

    with caplog.at_level(logging.WARNING, logger="pw_etl.alerts"):
        log_sink(Alert("c", "x", 2, ">", 1, "warn"))
        log_sink(Alert("c", "x", 3, ">", 1, "error"))
    assert len(caplog.records) == 2
    assert caplog.records[0].levelno == logging.WARNING
    assert caplog.records[1].levelno == logging.ERROR


def test_run_batch_etl_fires_alerts_once_per_batch(spark, totesys, tmp_path):
    """The ETL wiring: counters observed DURING the load action (no
    second pass), thresholds evaluated once per batch. The seed data has
    zero NULL payment keys, so '>0 null keys' stays silent while an
    always-true rows threshold fires exactly once."""
    from pw_etl_scrumptious_squad_spark.plans import etl
    from pw_etl_scrumptious_squad_spark.sources import parquet as lake

    source = str(tmp_path / "oltp")
    for name, df in totesys.items():
        lake.write_table(df, source, name)

    fired: list[Alert] = []
    mgr = AlertManager(
        [
            Threshold("n_null_key", ">", 0),
            Threshold("n_rows", ">", 0, severity="info"),  # always fires
        ],
        sink=fired.append,
    )
    etl.run_batch_etl(
        spark,
        source,
        str(tmp_path / "staging"),
        str(tmp_path / "warehouse"),
        str(tmp_path / "state.parquet"),
        alert_manager=mgr,
    )
    assert [a.metric for a in fired] == ["n_rows"]
    assert fired[0].context == "fact_payment_load"
    assert fired[0].observed and fired[0].observed > 0
