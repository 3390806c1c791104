"""Custom aggregates via GROUPED_AGG pandas UDFs (Arrow-batched UDAF
surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the UDF type from REAL type hints; postponed (stringified) annotations
break the signature inspection.
"""

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Geometric mean, cross-engine-deterministic: per-element ln rounded
    to 9 dp, summed with exact math.fsum over sorted values (summation
    order cannot diverge), then exp(sum/n). Defined over POSITIVE values
    only — zero/negative/NULL elements are skipped (math.log would raise
    mid-aggregation otherwise), and an all-nonpositive group yields
    NULL."""
    vals = sorted(
        round(math.log(x), 9) for x in v if x is not None and x > 0
    )
    if not vals:
        return None
    return math.exp(math.fsum(vals) / len(vals))


@pandas_udf("long")
def n_rows(v: pd.Series) -> int:
    """Count companion for pandas-UDAF aggregations (Spark cannot mix
    GROUPED_AGG pandas UDFs with built-in aggregates in one agg())."""
    return len(v)
