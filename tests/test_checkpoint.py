"""Checkpoint-policy tests: iterative operators must truncate lineage
RELIABLY when the session is configured with a checkpoint dir (cluster
posture — executor loss survivable), and fall back to localCheckpoint
otherwise (local posture). One test function: the session-scoped spark
fixture is shared, so the no-dir assertions must run before the dir is
set (a SparkContext checkpoint dir cannot be unset)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.checkpoint import MODE_CONF, materialize
from pw_etl_scrumptious_squad_spark.operators import dedup


def _ckpt_files(root: str) -> list[str]:
    out = []
    for base, _dirs, files in os.walk(root):
        out.extend(os.path.join(base, f) for f in files)
    return out


def test_checkpoint_policy_modes_and_cc_parity(spark, tmp_path_factory):
    df = spark.range(100).withColumn("v", F.col("id") * 2)

    # --- before any dir is set -------------------------------------------
    assert spark.sparkContext.getCheckpointDir() is None
    # auto with no dir: local materialization, values intact
    out = materialize(df)
    assert out.count() == 100
    # reliable with no dir must fail loudly, not degrade silently
    spark.conf.set(MODE_CONF, "reliable")
    try:
        with pytest.raises(RuntimeError, match="checkpoint dir"):
            materialize(df)
        spark.conf.set(MODE_CONF, "bogus")
        with pytest.raises(ValueError, match="auto|local|reliable"):
            materialize(df)
    finally:
        spark.conf.set(MODE_CONF, "auto")

    # --- CC parity run WITHOUT a dir (local materialization) -------------
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "doc_a LONG, doc_b LONG"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 99)], "doc_id LONG"
    )
    expected = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 99: 99}
    local_labels = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, nodes).collect()
    }
    assert local_labels == expected

    # --- now set a dir: auto flips to RELIABLE checkpoints ---------------
    ckpt_dir = str(tmp_path_factory.mktemp("reliable_ckpt"))
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    try:
        assert _ckpt_files(ckpt_dir) == []
        out = materialize(df)
        assert out.count() == 100
        files = _ckpt_files(ckpt_dir)
        assert files, "auto mode with a checkpoint dir must write to it"

        # the iterative operator engages reliable checkpoints per round
        # and its labels are unchanged
        before = len(_ckpt_files(ckpt_dir))
        reliable_labels = {
            r["node"]: r["cluster_id"]
            for r in dedup.connected_components(pairs, nodes).collect()
        }
        assert reliable_labels == expected
        assert len(_ckpt_files(ckpt_dir)) > before

        # incremental dedup (signature materialization) also goes
        # reliable, values unchanged vs the local-mode run
        docs = spark.createDataFrame(
            [
                (i, "alpha beta gamma delta epsilon zeta " + suffix)
                for i, suffix in [
                    (1, "one"), (2, "one"), (5, "two"), (10, "one"),
                ]
            ],
            "doc_id LONG, text STRING",
        )
        base = docs.filter(F.col("doc_id") % 5 != 0)
        new = docs.filter(F.col("doc_id") % 5 == 0)

        def run_inc():
            return sorted(
                (r["doc_a"], r["doc_b"])
                for r in dedup.incremental_lsh_neardup(
                    base, new, "doc_id", threshold=0.5
                ).collect()
            )

        before = len(_ckpt_files(ckpt_dir))
        reliable_pairs = run_inc()
        assert len(_ckpt_files(ckpt_dir)) > before
        spark.conf.set(MODE_CONF, "local")
        assert run_inc() == reliable_pairs
        assert (1, 10) in reliable_pairs  # cross base/new near-dup found
        spark.conf.set(MODE_CONF, "auto")

        # explicit local pin ignores the dir
        spark.conf.set(MODE_CONF, "local")
        before = len(_ckpt_files(ckpt_dir))
        assert materialize(df).count() == 100
        assert len(_ckpt_files(ckpt_dir)) == before
    finally:
        # the dir cannot be unset on the shared context: pin the rest of
        # the suite back to local materialization (the pre-test posture)
        spark.conf.set(MODE_CONF, "local")
