"""Lineage-truncation policy for iterative / multi-pass operators.

Every iterative operator in this engine (connected components' star
rounds, incremental LSH dedup's store+batch union, MinHash/SimHash
signature reuse, the FineWeb-style staged pipeline) must materialize an
intermediate and truncate its lineage — otherwise the plan grows by one
join/union per round and Catalyst analysis time explodes.

HOW it materializes is an execution-posture decision, not a semantics
one, and the right answer differs by deployment:

- ``localCheckpoint()`` stores the blocks on the executors that computed
  them. Fast (no DFS write), fine on ``local[N]`` where "executor loss"
  means the whole JVM died anyway. On a 1000-executor cluster it is a
  liability: lineage is already truncated, so losing ONE executor loses
  blocks that can never be recomputed and the multi-hour job dies.
- ``checkpoint()`` writes the blocks to the reliable checkpoint
  directory (HDFS/object store via ``sc.setCheckpointDir``). One DFS
  round-trip per materialization, but executor loss is survivable —
  the 100 TB posture.

:func:`materialize` picks per the session-level ``pw_etl.checkpoint.mode``
conf:

- ``auto`` (default): reliable ``checkpoint()`` iff a checkpoint dir is
  configured on the SparkContext, else ``localCheckpoint()``. A cluster
  submit script sets the dir once; local runs need no setup.
- ``reliable``: always ``checkpoint()`` (raises if no dir is set — a
  misconfigured cluster job should fail loudly at the first round, not
  at hour three).
- ``local``: always ``localCheckpoint()`` (test/bench pinning).

All call sites chain it as ``df.transform(materialize)`` so the policy
is one function, injectable per session, with zero signature churn.

CLUSTER POSTURE — checkpoint cleanup: reliable ``checkpoint()`` files
are NOT deleted when the DataFrame is garbage-collected unless
``spark.cleaner.referenceTracking.cleanCheckpoints=true`` is set, so a
long-running cluster job that materializes per iteration (connected
components' star rounds, incremental dedup) accumulates checkpoint-dir
data unboundedly. A cluster submit script should set that conf alongside
``setCheckpointDir`` (the engine's :func:`get_spark` does not force it:
cleanup semantics — keep-for-restart vs reclaim-eagerly — are a
deployment decision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MODE_CONF = "pw_etl.checkpoint.mode"


def _mode(df: DataFrame) -> str:
    try:
        return df.sparkSession.conf.get(MODE_CONF, "auto") or "auto"
    except Exception:  # pragma: no cover - conf service unavailable
        return "auto"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` and truncate its lineage, reliably when the
    session is configured for it (see module docstring)."""
    mode = _mode(df)
    if mode not in ("auto", "local", "reliable"):
        raise ValueError(
            f"{MODE_CONF} must be auto|local|reliable, got {mode!r}"
        )
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    ckpt_dir = df.sparkSession.sparkContext.getCheckpointDir()
    if mode == "reliable" and not ckpt_dir:
        raise RuntimeError(
            f"{MODE_CONF}=reliable but no checkpoint dir is set; call "
            "spark.sparkContext.setCheckpointDir(<DFS path>) first"
        )
    if ckpt_dir:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
