"""Data-quality audit operators — the pre-load validation a warehouse
pipeline runs on every batch (the reference trusts its OLTP constraints;
a lake-side engine must re-check them, since parquet enforces nothing).

Each check returns the VIOLATING rows (composable: inspect, quarantine,
or just count); ``dq_report`` folds any set of checks into a one-row-per-
check summary. Scale shapes: null/rule checks are map-side scans (no
shuffle; the count is a partial agg), uniqueness is one hash-agg on the
key, FK orphan detection is a left-anti join that broadcasts the parent
key set when small — at 100 TB run the checks per partition-of-arrival,
not over the full history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unique_violations(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys appearing more than once: (key_cols..., n_rows)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_orphans(
    child: DataFrame, parent: DataFrame, fk_col: str, pk_col: str
) -> DataFrame:
    """Child rows whose foreign key has no parent (NULL fk is not an
    orphan — nullable FKs are a modeling choice, not a violation)."""
    keys = parent.select(F.col(pk_col).alias(fk_col)).distinct()
    return child.filter(F.col(fk_col).isNotNull()).join(
        keys, fk_col, "left_anti"
    )


def null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows with a NULL in any of the given required columns."""
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else cond | n
    return df.filter(cond)


def rule_violations(df: DataFrame, rule: Column) -> DataFrame:
    """Rows where the business rule does NOT hold (NULL-valued rule
    counts as a violation: an unverifiable row is not a verified one)."""
    return df.filter(~rule.eqNullSafe(F.lit(True)))


def dq_report(checks: dict[str, DataFrame]) -> DataFrame:
    """One row per named check: (check_name, n_violations). The union of
    scalar counts keeps every check's scan independent — a failing check
    never blocks the others from being measured."""
    out = None
    for name in sorted(checks):
        row = checks[name].agg(
            F.count(F.lit(1)).cast("bigint").alias("n_violations")
        ).select(F.lit(name).alias("check_name"), "n_violations")
        out = row if out is None else out.unionByName(row)
    return out


def observed(
    df: DataFrame, name: str, metrics: dict[str, Column]
):
    """Attach IN-FLIGHT data-quality counters to a frame: the metrics
    (any aggregate expressions) are computed DURING whatever action
    materializes the frame — Spark's Observation / CollectMetrics node —
    not by a second job. The checks above are exact second-pass probes;
    at 100 TB a second pass over the fact table costs as much as the
    load itself, so the production shape is: observe counters for free
    on every run, trigger the targeted second-pass check only when a
    counter moves.

    Returns ``(df, observation)``; read ``observation.get`` AFTER an
    action has run over the returned frame (it blocks until the metrics
    arrive)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return (
        df.observe(obs, *[c.alias(k) for k, c in sorted(metrics.items())]),
        obs,
    )


def standard_counters(key: Column | str, amount: Column | str) -> dict:
    """The counter set every fact load wants: row count, NULL-key count,
    negative-amount count, amount total (reconciles against the source
    side). Compose with :func:`observed`."""
    k, a = F.col(key) if isinstance(key, str) else key, (
        F.col(amount) if isinstance(amount, str) else amount
    )
    return {
        "n_rows": F.count(F.lit(1)),
        "n_null_key": F.sum(F.when(k.isNull(), 1).otherwise(0)),
        "n_negative_amount": F.sum(F.when(a < 0, 1).otherwise(0)),
        "total_amount": F.sum(a),
    }
