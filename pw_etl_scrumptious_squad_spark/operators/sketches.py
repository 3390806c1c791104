"""Mergeable frequency / cardinality sketches: Count-Min and KMV.

Two from-scratch sketch families rounding out the bounded-state belt
(HLL in curation.py, Misra-Gries in text.py, HDR quantile buckets in
stats.py):

- **Count-Min** (Cormode & Muthukrishnan 2005): a ``depth x width``
  counter matrix answering "how often did THIS item occur?" for ANY
  item with a one-sided error (never an undercount). The exact
  heavy-hitters tier (``text.heavy_hitters_exact``) answers "which
  items are frequent" exactly; Count-Min is its point-query companion
  when the probe set is not known up front and an eps*N overcount is
  acceptable — per-item state none, sketch state ``depth * width``
  counters regardless of corpus size.
- **KMV / k-minimum-values** (Bar-Yossef et al. 2002; Beyer et al.
  2007 for the theta-style set algebra): keep the ``k`` smallest
  distinct 60-bit item hashes per group; the k-th smallest value
  estimates the group's distinct count, and because the k smallest of
  a union are computable from the per-group sketches alone, UNION and
  INTERSECTION distinct estimates come from the same constant-size
  state — the cross-source overlap question (y38/y41) answered at
  sketch cost with set algebra HLL cannot do (HLL has no
  intersection).

Determinism contract (the y61/y90 posture): every hash is md5-derived
via the repo's Carter-Wegman split (h1 = first 15 hex chars, h2 =
chars 17-30), all arithmetic is integer (estimator division is
floor-division on arbitrary-precision ints driver-side, HUGEINT in the
DuckDB twin), so even the ESTIMATES are value-exact reproducible
cross-engine — catalog entries carry full value oracles, not
approximate comparisons.

Extension surface beyond the reference (/root/reference/src has no
sketch tier); cited papers are public.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hash space of the 60-bit md5 prefix: h1 in [0, 2^60)
HASH_SPACE = 1 << 60

_H1 = "cast(conv(substring(md5({i}), 1, 15), 16, 10) as bigint)"
_H2 = "cast(conv(substring(md5({i}), 17, 14), 16, 10) as bigint)"


def shingle_occurrences(
    df: DataFrame,
    text_col: str = "text",
    shingle_size: int = 5,
    keep_cols: tuple[str, ...] = (),
    impl: str = "auto",
    distinct_within_row: bool = False,
) -> DataFrame:
    """One row per shingle OCCURRENCE: ``(keep_cols..., item STRING)``
    where ``item`` is the shingle md5 (text.with_shingles semantics,
    incl. the short-doc whole-text fallback and the NULL-text ->
    ``md5('')`` row). The narrow input is spread before the
    ~n_tokens-per-row multiplier (the y52/y77 rule: parallelism must
    be set BEFORE a row-multiplying stage).

    ``impl``: ``'vectorized'`` (default under ``'auto'``) computes the
    shingle hashes per Arrow batch with ``hashlib.md5`` (byte-identical
    to Spark/DuckDB ``md5``) — the expression tier evaluates one
    INTERPRETED ``transform(sequence(...), i -> md5(concat_ws(...)))``
    lambda per shingle (measured ~7us/shingle at sf0.1, the whole cost
    of this stage), where the Python loop pays ~1us and parallelizes
    identically (guide §4.2). ``'expr'`` keeps the expression form,
    the structural twin of the shared-CTE DuckDB oracles; equality is
    asserted in tests including the degenerate-corpus battery.

    ``distinct_within_row``: emit each shingle hash at most ONCE per
    input row — exactly ``explode(array_distinct(__shingles))``, the
    map-side per-doc dedup every set-semantics consumer
    (decontamination, novelty, containment) wants BEFORE anything
    shuffles. Cross-row duplicates remain (dedup them downstream when
    global distinct is the contract)."""
    from pw_etl_scrumptious_squad_spark.operators.text import (
        _SQL_SHINGLES,
        _spread_narrow_input,
        with_shingles,
    )

    if impl not in ("auto", "vectorized", "expr"):
        raise ValueError(f"impl must be auto|vectorized|expr, got {impl!r}")
    narrow = _spread_narrow_input(
        df.select(*keep_cols, F.col(text_col).alias("__t"))
    )
    if impl in ("auto", "vectorized"):
        return _shingle_occurrences_vectorized(
            narrow, shingle_size, keep_cols, distinct_within_row
        )
    sh = F.col(_SQL_SHINGLES)
    if distinct_within_row:
        sh = F.array_distinct(sh)
    return with_shingles(narrow, "__t", shingle_size).select(
        *keep_cols, F.explode(sh).alias("item")
    )


def _shingle_occurrences_vectorized(
    narrow: DataFrame,
    shingle_size: int,
    keep_cols: tuple[str, ...],
    distinct_within_row: bool = False,
) -> DataFrame:
    """Arrow-batched implementation of :func:`shingle_occurrences` over
    the pre-spread narrow ``(keep_cols..., __t)`` projection. Exact
    expression-tier semantics, pinned by the parity tests: tokens =
    single-space split (empties kept), >= k tokens -> md5 of every
    k-token window rejoined with ' ', shorter -> md5 of the rejoined
    whole (== md5 of the text), NULL -> md5('') exactly like
    ``concat_ws`` over a NULL array."""
    import hashlib

    from pyspark.sql import types as T

    k = shingle_size

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            items: list[str] = []
            counts = np.empty(len(pdf), dtype="i8")
            for j, t in enumerate(pdf["__t"]):
                if t is None:
                    items.append(hashlib.md5(b"").hexdigest())
                    counts[j] = 1
                    continue
                toks = t.split(" ")
                if len(toks) >= k:
                    n0 = len(items)
                    row_items = (
                        hashlib.md5(
                            " ".join(toks[i : i + k]).encode("utf-8")
                        ).hexdigest()
                        for i in range(len(toks) - k + 1)
                    )
                    if distinct_within_row:
                        # == explode(array_distinct(...)): first-
                        # occurrence order, one row per distinct hash
                        items.extend(dict.fromkeys(row_items))
                    else:
                        items.extend(row_items)
                    counts[j] = len(items) - n0
                else:
                    items.append(hashlib.md5(t.encode("utf-8")).hexdigest())
                    counts[j] = 1
            out = {
                c: np.repeat(pdf[c].to_numpy(), counts) for c in keep_cols
            }
            out["item"] = items
            yield pd.DataFrame(out)

    schema = T.StructType(
        [narrow.schema[c] for c in keep_cols]
        + [T.StructField("item", T.StringType())]
    )
    return narrow.mapInPandas(gen, schema)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def _cms_positions(depth: int, width: int) -> str:
    """SQL array expr of the ``depth`` bucket positions for the (h1, h2)
    pair in scope: row r probes ``(h1 + r*h2) % width`` — pairwise-
    independent Carter-Wegman rows from ONE md5. ``h1 + r*h2 <
    2^60 + depth*2^56`` stays far under 2^63 for depth <= 64 (enforced
    in :func:`cms_sketch`)."""
    return (
        f"transform(sequence(0, {depth - 1}),"
        f" r -> (h1 + r * h2) % {width})"
    )


def _with_hashes(df: DataFrame, item_col: str) -> DataFrame:
    i = item_col
    return df.filter(F.col(i).isNotNull()).withColumn(
        "h1", F.expr(_H1.format(i=i))
    ).withColumn("h2", F.expr(_H2.format(i=i)))


def cms_sketch(
    df: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Count-Min sketch of an item-occurrence stream: ``(r INT, bucket
    BIGINT, n BIGINT)`` — one row per OCCUPIED counter (absent counter
    = 0), ``n`` the number of occurrences hashing to ``(r, bucket)``.

    100 TB shape: the explode multiplies rows ``depth``-fold MAP-SIDE
    only; the hash-agg's partial combine collapses each task's output
    to at most ``depth * width`` rows, so the one shuffle is bounded by
    the counter universe (16k rows at 4x4096) REGARDLESS of corpus or
    vocabulary size — the full term universe never shuffles, the same
    discipline as heavy_hitters_exact but with constant (not
    capacity-bounded) state. Mergeable exactly: counters sum
    (:func:`merge_cms_sketches`), so per-partition / per-micro-batch
    sketches fold associatively — the streaming twin
    (streaming/pipeline.py::streaming_cms) and a tree-aggregate both
    need exactly that.

    Estimate error is the textbook bound: est - true <= eps * N with
    probability 1 - delta over the hash draw, eps = e/width,
    delta = e^-depth; here the hash family is FIXED (md5), so the
    bound is heuristic but the sketch itself is deterministic and
    value-oracle-able."""
    if not (1 <= depth <= 64):
        raise ValueError("depth must be in [1, 64] (63-bit hash budget)")
    if width < 2:
        raise ValueError("width must be >= 2")
    return (
        _with_hashes(df, item_col)
        .select(
            F.posexplode(F.expr(_cms_positions(depth, width))).alias(
                "r", "bucket"
            )
        )
        .groupBy(F.col("r").cast("int").alias("r"), "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_cms_sketches(*sketches: DataFrame) -> DataFrame:
    """Merge Count-Min sketches built with the SAME (depth, width):
    element-wise counter sum — associative and exact (the merged sketch
    equals the sketch of the concatenated streams bit-for-bit)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "bucket").agg(
        F.sum("n").cast("bigint").alias("n")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Point-query the sketch for every probe item: ``(item, est_count
    BIGINT)`` with ``est_count = min over rows r of counter[r,
    (h1 + r*h2) % width]`` (missing counter = 0, so a never-seen item
    whose buckets are all unoccupied reads 0).

    The sketch is <= depth*width rows by construction — broadcast to
    the probe side, so estimation is one map-side join + a probe-sized
    agg: no shuffle touches anything corpus-sized."""
    p = _with_hashes(probes, item_col).select(
        F.col(item_col).alias("item"), "h1", "h2"
    )
    rows = p.select(
        "item",
        F.posexplode(F.expr(_cms_positions(depth, width))).alias(
            "r", "bucket"
        ),
    ).withColumn("r", F.col("r").cast("int"))
    joined = rows.join(F.broadcast(sketch), ["r", "bucket"], "left")
    return joined.groupBy("item").agg(
        F.min(F.coalesce(F.col("n"), F.lit(0)))
        .cast("bigint")
        .alias("est_count")
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch + set algebra
# ---------------------------------------------------------------------------

def kmv_sketch(
    df: DataFrame,
    group_col: str,
    item_col: str = "item",
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: ``(grp STRING, hs ARRAY<BIGINT>)`` — the
    ``k`` smallest DISTINCT 60-bit md5 hashes of the group's items,
    sorted ascending. ``len(hs) < k`` means the group's ENTIRE distinct
    hash set fits in the sketch (the exact regime).

    100 TB shape: the naive route (``distinct`` then per-group min-k)
    shuffles the full (group, item) universe — the exact cost KMV
    exists to avoid. Instead each partition folds its items through a
    bounded k-min-distinct state per group (numpy unique + head-k per
    Arrow batch — vectorized, no per-item Python), and the final merge
    aggregates ``n_partitions * k`` CANDIDATE rows per group, never the
    universe: state and shuffle are both O(groups * k). The partial
    sketches merge exactly (k smallest distinct of a union are
    computable from per-part k-min sets), so the result is
    partition-invariant by construction — pinned in tests."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = _with_hashes(df, item_col).select(
        F.col(group_col).cast("string").alias("grp"),
        F.col("h1").alias("h"),
    )

    def _fold(batches):
        import numpy as np
        import pandas as pd

        state: dict[str, "np.ndarray"] = {}
        for pdf in batches:
            for grp, sub in pdf.groupby("grp"):
                arr = np.unique(sub["h"].to_numpy(np.int64))
                prev = state.get(grp)
                if prev is not None:
                    arr = np.unique(np.concatenate([prev, arr]))
                state[grp] = arr[:k]  # np.unique sorts ascending
        if state:
            yield pd.DataFrame(
                {
                    "grp": list(state),
                    "hs": [s.tolist() for s in state.values()],
                }
            )

    partials = hashed.mapInPandas(_fold, "grp STRING, hs ARRAY<BIGINT>")
    return partials.groupBy("grp").agg(
        F.expr(
            f"slice(array_sort(array_distinct(flatten("
            f"collect_list(hs)))), 1, {k})"
        ).alias("hs")
    )


def _kmv_point_est(hs: list[int], k: int, space: int) -> int:
    """(k-1)/theta estimator on an EXACT-k sorted distinct-hash list;
    arbitrary-precision int floor-division (the DuckDB twin uses
    HUGEINT ``//`` — identical floor on positive operands)."""
    return (k - 1) * space // hs[k - 1]


def kmv_set_estimates(
    sketch: DataFrame,
    k: int = 256,
    pairs: list[tuple[str, str]] | None = None,
    space: int = HASH_SPACE,
) -> DataFrame:
    """Finalize KMV sketches into distinct-count estimates, with
    UNION / INTERSECTION rows per requested group pair: ``(set_expr
    STRING, n_kept BIGINT, est_distinct BIGINT)``.

    - group row: exact regime (``len(hs) < k``) reports the true
      distinct count; else ``(k-1) * space // hs[k-1]``.
    - ``a|b|union``: the k smallest of the union are EXACTLY
      computable from the two sketches (every union hash below the
      union's theta is below both groups' thetas, hence present in a
      sketch) — same estimator on the merged head.
    - ``a|b|intersect``: theta-style — count union-head members
      present in BOTH sketches (for x below the union theta,
      membership in the sketch IS membership in the set), scale by
      est_union / k. Both-exact pairs report true intersection.

    Sketches are O(groups * k) rows — collected and finalized with
    driver-side arbitrary-precision integer math (the y85/y90
    driver-walk pattern: bounded metadata, never data), keeping the
    estimator exact where BIGINT would overflow ((k-1) * 2^60 needs
    ~69 bits)."""
    spark = sketch.sparkSession
    kept = {
        r["grp"]: [int(x) for x in r["hs"]] for r in sketch.collect()
    }
    sets = {g: set(h) for g, h in kept.items()}
    out: list[tuple[str, int, int]] = []
    for g in sorted(kept):
        hs = kept[g]
        est = len(hs) if len(hs) < k else _kmv_point_est(hs, k, space)
        out.append((g, len(hs), est))
    for a, b in pairs or []:
        ha, hb = kept.get(a, []), kept.get(b, [])
        sa, sb = sets.get(a, set()), sets.get(b, set())
        merged = sorted(sa | sb)
        both_exact = len(ha) < k and len(hb) < k
        if both_exact:
            est_u = len(merged)
            est_i = len(sa & sb)
            n_kept_u = len(merged)
            m = est_i
        else:
            head = merged[:k]
            est_u = _kmv_point_est(head, k, space)
            m = sum(1 for x in head if x in sa and x in sb)
            est_i = m * est_u // k
            n_kept_u = len(head)
        out.append((f"{a}|{b}|union", n_kept_u, est_u))
        out.append((f"{a}|{b}|intersect", m, est_i))
    return spark.createDataFrame(
        out, "set_expr STRING, n_kept BIGINT, est_distinct BIGINT"
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Estimate an equi-join's OUTPUT CARDINALITY from two Count-Min
    sketches of the join keys, without executing the join: the
    inner product of matching counter rows, minimized over the depth
    rows (the AMS/CMS inner-product estimator — Cormode &
    Muthukrishnan 2005 §4.2). Returns one row ``(est_join_size
    BIGINT)``.

    The true join size is ``sum over keys of count_a(k) * count_b(k)``;
    each sketch row's inner product equals that sum PLUS cross-terms
    from colliding keys — always an overestimate, never an
    undercount, so the min over rows is a one-sided bound with error
    <= (N_a * N_b) * e / width in expectation.

    Why it matters at 100 TB: the sketches are depth*width counters
    built in one map-side pass per table (and mergeable, so per-
    partition or per-day sketches fold); the estimate itself joins two
    <= depth*width-row tables — a query planner or pipeline guard can
    price a join (detect a key-explosion blowup) for the cost of two
    scans and a metadata join, before committing a shuffle of the real
    tables. Both sketches must share (depth, width)."""
    a = sketch_a.select("r", "bucket", F.col("n").alias("na"))
    b = sketch_b.select("r", "bucket", F.col("n").alias("nb"))
    per_row = (
        a.join(b, ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("ip"))
    )
    return per_row.agg(
        F.min("ip").cast("bigint").alias("est_join_size")
    )
