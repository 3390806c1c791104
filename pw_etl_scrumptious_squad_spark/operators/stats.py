"""Table statistics at scale: exact quantiles without a sort, and a
one-pass column profiler.

Exact percentiles are the canonical "you cannot afford the obvious
plan" statistic: the textbook answer is a global sort (or a
row_number window), which at 100 TB is a full shuffle of every byte
just to read back three rows. :func:`exact_quantiles` replaces it with
iterative histogram refinement — a constant number of MAP-SIDE
partial-aggregation passes:

1. The value range [lo, hi] splits into ``branch`` equal buckets; one
   pass counts each bucket (a groupBy on a computed bucket id —
   map-side combine makes the shuffle ``branch`` rows per partition).
2. The driver walks the ``branch``-row histogram (bounded metadata,
   never data) to find the bucket containing the target rank, narrows
   [lo, hi] to it, and adjusts the rank by the mass below.
3. Repeat until the range is small, then one exact value-count pass
   picks the k-th smallest directly.

Passes = ceil(log_branch(range)) ≈ 5-6 for 40-bit integer domains with
branch=128 — each touching the (cached) value column only. Rank
semantics are pinned integer arithmetic: the p-th percentile is the
k-th smallest with k = (n-1)*p DIV 100 + 1 (1-indexed), so the result
is a VALUE FROM THE DATA, bit-exact, no interpolation to diverge on.

The reference has no statistics surface at all (its pandas frames are
48 rows, src/transform.py); this is infrastructure for the curation
operators (perplexity terciles, length cutoffs, mixture planning) that
currently derive cutoffs from window functions — the refinement form
is what survives when the column stops fitting in a shuffle.

:func:`profile_table` is the ANALYZE-TABLE companion: one aggregation
pass emits per-column row/null/exact-distinct counts plus typed
min/max. Exact multi-column distinct plans through Spark's Expand (one
replica of the input per distinct aggregate) — the honest exact cost;
at 100 TB swap exact distinct for the HLL sketch (y61's
approx_count_distinct) column by column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.checkpoint import materialize


def exact_quantiles(
    df: DataFrame,
    value: Column | str,
    percentiles: Sequence[int] = (50, 90, 99),
    branch: int = 128,
    max_passes: int = 64,
) -> DataFrame:
    """Exact percentiles of a BIGINT-valued expression by iterative
    histogram refinement (see module docstring). Returns a small frame
    ``(quantile STRING, value BIGINT)`` with one row per requested
    percentile (``'p50'`` etc.), built from driver-side literals the
    refinement produced — the histogram collects are ``branch`` rows
    per pass, never data rows. NULLs are excluded; an all-NULL/empty
    input yields NULL values."""
    spark = df.sparkSession
    v = F.col(value) if isinstance(value, str) else value
    vals = (
        df.select(v.cast("bigint").alias("v"))
        .filter(F.col("v").isNotNull())
        .transform(materialize)
    )
    n = vals.count()
    out = []
    if n == 0:
        return spark.createDataFrame(
            [(f"p{p}", None) for p in percentiles],
            "quantile STRING, value BIGINT",
        )
    b = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    # Per-percentile refinement state. All percentiles refine TOGETHER:
    # each level runs ONE histogram job covering every still-wide
    # percentile (an exploded per-percentile bucket expression), and
    # the exact finish is ONE value-count job over the union of the
    # narrowed ranges — the per-percentile arithmetic (ranks, widths,
    # narrowing) is unchanged, only its jobs are batched (guide §1.2 /
    # §2.6: three percentiles were paying three sequential pass chains
    # over the same cached column; measured 2.6s -> ~1.3s at sf0.1).
    state = []
    for p in percentiles:
        k = (n - 1) * p // 100 + 1  # 1-indexed k-th smallest
        lo, hi = int(b["lo"]), int(b["hi"])
        # Full-BIGINT-domain guard: if (v - lo) cannot be computed in
        # int64 (span >= 2^63 when min is deeply negative), halve the
        # range by midpoint count first — comparisons only, no column
        # arithmetic, so no overflow. At most two such passes are ever
        # needed (full-domain span is < 2^64).
        while hi - lo >= (1 << 63):
            mid = (lo + hi) // 2  # Python int: exact at any magnitude
            n_lo = vals.filter(F.col("v").between(lo, mid)).count()
            if k <= n_lo:
                hi = mid
            else:
                k -= n_lo
                lo = mid + 1
        state.append({"k": k, "lo": lo, "hi": hi})

    for _ in range(max_passes):
        active = [i for i, st in enumerate(state) if st["hi"] - st["lo"] > branch]
        if not active:
            break
        # one combined histogram pass: per active percentile, an
        # integer floor-division (DIV) bucket id — Column `/` is DOUBLE
        # division, which misbuckets boundary values once the range
        # passes ~2^53 and breaks the exact-for-BIGINT contract;
        # v - lo is non-negative inside the BETWEEN, so DIV == floor
        # and Spark's bucketing matches the driver's integer narrowing.
        widths = {}
        cases = []
        for i in active:
            st = state[i]
            widths[i] = (st["hi"] - st["lo"]) // branch + 1
            cases.append(
                f"CASE WHEN v BETWEEN {st['lo']} AND {st['hi']} THEN"
                f" named_struct('i', {i}, 'b',"
                f" (v - {st['lo']}) DIV {widths[i]}) END"
            )
        hist = (
            vals.select(
                F.explode(F.expr(f"array({', '.join(cases)})")).alias("s")
            )
            .filter(F.col("s").isNotNull())
            .groupBy("s.i", "s.b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_p: dict[int, list] = {i: [] for i in active}
        for r in hist:
            by_p[int(r["i"])].append((int(r["b"]), int(r["c"])))
        for i in active:
            st = state[i]
            cum = 0
            for bid, c in sorted(by_p[i]):
                if cum + c >= st["k"]:
                    st["lo"], st["hi"] = (
                        st["lo"] + bid * widths[i],
                        min(st["hi"], st["lo"] + (bid + 1) * widths[i] - 1),
                    )
                    st["k"] -= cum
                    break
                cum += c
            else:  # pragma: no cover - rank beyond range is impossible
                raise AssertionError("rank walked past the histogram")
    else:
        if any(st["hi"] - st["lo"] > branch for st in state):
            raise AssertionError("quantile refinement did not converge")

    # exact finish, one combined pass: value counts over the union of
    # the narrowed per-percentile ranges
    fin_cases = ", ".join(
        f"CASE WHEN v BETWEEN {st['lo']} AND {st['hi']} THEN"
        f" named_struct('i', {i}, 'v', v) END"
        for i, st in enumerate(state)
    )
    tail_rows = (
        vals.select(F.explode(F.expr(f"array({fin_cases})")).alias("s"))
        .filter(F.col("s").isNotNull())
        .groupBy("s.i", "s.v")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    tails: dict[int, list] = {i: [] for i in range(len(state))}
    for r in tail_rows:
        tails[int(r["i"])].append((int(r["v"]), int(r["c"])))
    for i, (p, st) in enumerate(zip(percentiles, state)):
        cum = 0
        got = None
        for val, c in sorted(tails[i]):
            if cum + c >= st["k"]:
                got = val
                break
            cum += c
        assert got is not None, "rank not found in final range"
        out.append((f"p{p}", got))
    return spark.createDataFrame(out, "quantile STRING, value BIGINT")


def profile_table(
    df: DataFrame, columns: Sequence[str], exact_distinct: bool = True
) -> DataFrame:
    """One-pass ANALYZE-style profile: for each named column emit
    ``(column_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str)``. Numeric columns carry typed DOUBLE min/max (exact
    selection, bit-stable — never a sum); everything else carries the
    string form (dates/strings order identically as ISO/ASCII text).
    ``exact_distinct=False`` is the documented 100 TB swap: per-column
    HLL sketches (``approx_count_distinct``) remove the Expand replica
    per distinct aggregate — ONE pass with no input blow-up, ~2%
    relative error, the right profile tier for a first look at a
    petabyte table (the exact tier stays the oracle-checked default)."""
    num_types = {"int", "bigint", "smallint", "tinyint", "double", "float"}
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    nd_aggs = []
    for c in columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__nulls_{c}")
        )
        nd = (
            F.countDistinct(c)
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        nd_aggs.append(nd.cast("bigint").alias(f"__nd_{c}"))
        if kinds[c] in num_types or kinds[c].startswith("decimal"):
            aggs.append(F.min(c).cast("double").alias(f"__mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__mx_{c}"))
        else:
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__mn_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__mx_{c}"))
    # The distinct counts live in their OWN aggregation, cross-joined
    # (1 row x 1 row) with the plain aggregates: multiple DISTINCT
    # aggregates plan through an Expand replica per distinct column,
    # and combining them with the plain aggs drags every min/max/null
    # input through that replicated stream — measured 2.1s combined vs
    # 0.6s + 0.2s split on a 150k-row profile (guide §1.2: don't
    # compute things you throw away; the Expand carries N+1 copies of
    # columns only one replica needs). Split, the Expand projects just
    # (column, gid) and the plain agg stays a plain map-side pass.
    wide = df.agg(*aggs).crossJoin(df.agg(*nd_aggs))
    rows = []
    for c in columns:
        numeric = kinds[c] in num_types or kinds[c].startswith("decimal")
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__mn_{c}") if numeric else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__mx_{c}") if numeric else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if numeric else F.col(f"__mn_{c}")).alias("min_str"),
                (F.lit(None).cast("string") if numeric else F.col(f"__mx_{c}")).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (round 10): HDR-histogram-style integer
# buckets — the constant-state streaming/100 TB companion to
# exact_quantiles (which stays the exact oracle tier)
# ---------------------------------------------------------------------------

def _bucket_rep_sql(v: str, sub_bits: int) -> str:
    """Bucket representative for a BIGINT expression, INTEGER-ONLY
    arithmetic (HDR-histogram geometry, Gil Tene's public design):
    keep the top ``sub_bits`` significant bits of ``|v|``, zero the
    rest, reapply the sign. bit-length via ``length(bin(x))`` — string
    length of the minimal binary rendering, exact in Spark and DuckDB
    alike, so the bucket function needs NO floating-point log and can
    never disagree across engines at a bucket boundary (the flaw a
    log-gamma DDSketch bucket would have). Values collapse toward zero
    onto their bucket's zero-side edge: |rep| <= |v| < |rep| + 2^shift
    with |rep| >= 2^(sub_bits-1+shift), so the relative error of rep
    as a stand-in for v is < 2^(1-sub_bits). Monotone in v, hence
    rank-preserving. Domain: v > Long.MIN (abs overflow is a loud
    ANSI error, never a silent misbucket)."""
    s = int(sub_bits)
    return (
        f"CASE WHEN {v} = 0 THEN CAST(0 AS BIGINT) ELSE"
        f" CAST(CASE WHEN {v} < 0 THEN -1 ELSE 1 END AS BIGINT) *"
        f" shiftleft(shiftright(abs({v}),"
        f" greatest(length(bin(abs({v}))) - {s}, 0)),"
        f" greatest(length(bin(abs({v}))) - {s}, 0)) END"
    )


def quantile_sketch(
    df: DataFrame, value: Column | str, sub_bits: int = 7
) -> DataFrame:
    """Build a mergeable quantile sketch of a BIGINT-valued expression:
    ``(rep BIGINT, n BIGINT)`` — one row per occupied exponential
    bucket, ``rep`` doubling as bucket id and representative value.

    Properties that make this the 100 TB / streaming tier next to
    :func:`exact_quantiles`:

    - ONE map-side-combined hash-agg pass; the shuffle is at most the
      bucket universe (< 64 * 2^sub_bits rows ~ 8k at sub_bits=7),
      regardless of input size.
    - MERGEABLE and associative: union two sketches and re-sum — the
      per-partition / per-micro-batch sketches combine in any order to
      the exact sketch of the union (:func:`merge_quantile_sketches`),
      which is what a 1000-executor tree-aggregate or a streaming
      store fold needs.
    - DETERMINISTIC: the bucket function is integer-only (no float
      log), so any engine reproduces the sketch bit-for-bit — the
      catalog entry carries a full-value DuckDB oracle, not an
      approximate comparison.
    - Bounded error BY CONSTRUCTION: any quantile read off the sketch
      is the true quantile's bucket representative, relative error
      < 2^(1-sub_bits) (~1.6% at sub_bits=7) — the envelope the tests
      pin against exact_quantiles.

    NULLs are excluded, matching exact_quantiles."""
    v = F.col(value) if isinstance(value, str) else value
    return (
        df.select(v.cast("bigint").alias("v"))
        .filter(F.col("v").isNotNull())
        .select(F.expr(_bucket_rep_sql("v", sub_bits)).alias("rep"))
        .groupBy("rep")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_quantile_sketches(*sketches: DataFrame) -> DataFrame:
    """Merge sketches (associative, order-free): union + re-sum by
    bucket. The merged sketch equals the sketch of the concatenated
    inputs exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("rep").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def sketch_quantiles(
    sketch: DataFrame,
    percentiles: Sequence[int] = (50, 90, 99),
    sub_bits: int = 7,
) -> DataFrame:
    """Read percentiles off a sketch: the k-th-smallest rank semantics
    pinned by exact_quantiles (k = (n-1)*p DIV 100 + 1), answered with
    the bucket representative holding that rank — a driver walk over
    the collected bucket table (bounded metadata: < 64 * 2^sub_bits
    rows by construction, never data). Returns ``(quantile STRING,
    value BIGINT)``; empty sketch yields NULLs."""
    spark = sketch.sparkSession
    rows = sorted(
        (int(r["rep"]), int(r["n"])) for r in sketch.collect()
    )
    total = sum(n for _, n in rows)
    out = []
    for p in percentiles:
        if total == 0:
            out.append((f"p{p}", None))
            continue
        k = (total - 1) * p // 100 + 1
        cum = 0
        got = None
        for rep, n in rows:
            cum += n
            if cum >= k:
                got = rep
                break
        out.append((f"p{p}", got))
    return spark.createDataFrame(out, "quantile STRING, value BIGINT")


def grouped_sketch_quantiles(
    df: DataFrame,
    group_col: str,
    value: Column | str,
    percentiles: Sequence[int] = (50, 90, 99),
    sub_bits: int = 7,
) -> DataFrame:
    """PER-GROUP percentiles off the mergeable HDR sketch — the
    groupwise companion to :func:`quantile_sketch` +
    :func:`sketch_quantiles`: ``(grp, quantile STRING, value BIGINT)``
    with the same k-th-smallest rank semantics
    (``k = (n-1)*p DIV 100 + 1``) answered by each group's bucket
    representative holding that rank.

    Unlike the global reader's driver walk (bounded there by ONE
    sketch), the per-group rank walk here is pure DataFrame: bucket
    counts per (group, rep), a per-group running sum over the rep
    order, and a min-rep-meeting-rank agg per (group, percentile) —
    so the operator scales to MILLIONS of groups (nothing collects;
    the widest shuffle is groups x occupied-buckets, <= 8k rows per
    group at sub_bits=7, and the percentile explode multiplies the
    bounded bucket table, never the input). Exactly the percentile a
    per-group sort + row_number would pick, up to the bucket
    representative (relative error < 2^(1-sub_bits)); deterministic
    integer bucket geometry, so the catalog entry carries a full value
    oracle. NULL values excluded per group, matching exact_quantiles;
    groups with no non-NULL values produce no rows."""
    v = F.col(value) if isinstance(value, str) else value
    base = (
        df.select(F.col(group_col).alias("grp"), v.cast("bigint").alias("v"))
        .filter(F.col("v").isNotNull())
        .select("grp", F.expr(_bucket_rep_sql("v", sub_bits)).alias("rep"))
        .groupBy("grp", "rep")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("rep")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("cum", F.sum("n").over(w))
    tot = base.groupBy("grp").agg(F.sum("n").cast("bigint").alias("total"))
    pcts = F.array(*[F.lit(int(p)) for p in percentiles])
    ranks = tot.select(
        "grp", "total", F.explode(pcts).alias("p")
    ).withColumn("k", F.expr("(total - 1) * p DIV 100 + 1"))
    return (
        cum.join(ranks, "grp")
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("grp", "p")
        .agg(F.min("rep").cast("bigint").alias("value"))
        .select(
            "grp",
            F.concat(F.lit("p"), F.col("p").cast("string")).alias(
                "quantile"
            ),
            "value",
        )
    )


def _bucket_rep_py(v: int, sub_bits: int) -> int:
    """Driver twin of :func:`_bucket_rep_sql` — Python ints, same
    integer-only HDR geometry (bit_length == length(bin(...)))."""
    if v == 0:
        return 0
    sign = -1 if v < 0 else 1
    a = abs(v)
    shift = max(a.bit_length() - int(sub_bits), 0)
    return sign * ((a >> shift) << shift)


def sketch_ranks(
    sketch: DataFrame,
    values: Sequence[int],
    sub_bits: int = 7,
) -> DataFrame:
    """INVERSE quantile off the mergeable sketch: for each probe value,
    how many (and what fraction of) sketched values are <= it —
    ``(probe BIGINT, est_rank BIGINT, total BIGINT, rank_ppb
    BIGINT)``.

    ``est_rank`` sums the counts of every bucket whose representative
    is <= the probe's OWN bucket representative. The bucket function
    is monotone (w <= v implies rep(w) <= rep(v)), so the estimate is
    ONE-SIDED: est_rank >= true rank(v) = |{w : w <= v}|, over by at
    most the probe bucket's population — the same bounded-error
    contract as the forward reader, in the other direction.
    ``rank_ppb = est_rank * 1e9 DIV total`` keeps the fraction an
    exact integer for the value oracle.

    Shape: probe reps are computed driver-side with the Python twin of
    the bucket function (exact integers), then ONE broadcast join +
    agg against the <= 8k-row sketch — the probe path never touches
    data, which is the point: a monitoring system can ask 'what
    fraction of yesterday's latencies exceeded X' straight off the
    persisted (or streaming) sketch store."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        [(int(v), _bucket_rep_py(int(v), sub_bits)) for v in values],
        "probe BIGINT, prep BIGINT",
    )
    total = sketch.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("total")
    )
    ranked = (
        probes.join(F.broadcast(sketch), F.col("rep") <= F.col("prep"), "left")
        .groupBy("probe")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0))
            .cast("bigint")
            .alias("est_rank")
        )
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "probe",
        "est_rank",
        "total",
        F.when(
            F.col("total") > 0,
            F.expr("est_rank * 1000000000L DIV total"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank_ppb"),
    )
