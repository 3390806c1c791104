"""Skew mitigation for shuffles at 100 TB scale.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew,
but two situations still need explicit salting on very large clusters:

- **Aggregation skew**: one hot key (e.g. a null-ish default id, a viral
  document) concentrates a groupBy partition. Spark's partial aggregation
  already combines map-side, which covers sum/count/min/max in practice —
  but high-cardinality aggregation buffers (collect_list, exact distinct)
  still ship every value of the hot key to one reducer. Two-phase salting
  bounds the per-task load to |key|/buckets.
- **Join skew**: AQE can split a skewed *shuffle* join, but only after the
  shuffle files exist; pre-salting avoids materializing the hot partition
  at all, and is the only option when the build side must replicate
  (a medium-size dim too big to broadcast).

Both helpers are pure DataFrame composition: salt columns are derived with
built-in hash/pmod expressions, never Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int, deterministic_cols: list[str] | None = None) -> Column:
    """Salt expression in [0, buckets): deterministic (hash of the given
    columns) when ``deterministic_cols`` is provided, otherwise a cheap
    per-row counter mod buckets. Determinism only matters for reproducible
    partition placement — join/agg RESULTS are identical either way."""
    if deterministic_cols:
        return F.pmod(F.hash(*deterministic_cols), F.lit(buckets)).cast("int")
    return F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation with a salted first phase.

    ``aggs`` maps output column -> (function, input column) where function is
    one of sum / count / min / max (algebraic aggregates that re-combine:
    phase 2 sums partial sums/counts, mins partial mins, maxes partial
    maxes). Phase 1 groups by (keys + salt) so a hot key spreads over
    ``buckets`` reduce tasks; phase 2 groups by keys alone over the tiny
    partial result.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1 = []
    phase2 = []
    for out, (fn, col) in aggs.items():
        if fn not in recombine:
            raise ValueError(
                f"{fn} is not an algebraic aggregate; salting would change "
                "its result — use a plain groupBy or a sketch instead"
            )
        first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[fn]
        phase1.append(first(col).alias(f"__p_{out}"))
        phase2.append(recombine[fn](f"__p_{out}").alias(out))
    salted = df.withColumn(SALT_COL, with_salt(df, buckets, salt_on))
    partial = salted.groupBy(*key_cols, SALT_COL).agg(*phase1)
    return partial.groupBy(*key_cols).agg(*phase2)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: the (large, skewed) ``left`` side gets a
    per-row salt; the (smaller) ``right`` side is replicated across all
    ``buckets`` salt values with ``explode``; the join key becomes
    (key, salt), so a hot key's rows land on ``buckets`` different tasks.

    Use when ``right`` is too big to broadcast but small enough to
    replicate xbuckets (the classic medium-dim case). Only the join key
    may be a column name shared between the two inputs.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join replicates the right side, so right/full-outer "
            "semantics would duplicate unmatched right rows; salt the other "
            "side instead"
        )
    salted_left = left.withColumn(SALT_COL, with_salt(left, buckets))
    # generators can't be nested in other expressions — explode bare, the
    # sequence elements are already int
    replicated_right = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_left.join(replicated_right, on=[on, SALT_COL], how=how)
    return out.drop(SALT_COL)
