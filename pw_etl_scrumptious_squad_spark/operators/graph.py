"""Link-graph analysis: integer-exact PageRank over a derived edge list.

A 100 TB web-curation pipeline ranks pages before it samples them
(quality-weighted mixing, crawl frontier prioritization, spam demotion
— the "authority" signal next to the content signals in
operators/curation.py). The reference has no graph surface at all (its
joins are two pandas merges, src/transform.py:113,131); this module is
a scale extension in the family of operators/dedup.py's connected
components: iterative graph algorithms expressed as DataFrame joins.

Why integer arithmetic: PageRank is a fixpoint of floating-point sums,
and float summation is order-dependent — a shuffle re-partitioning or
an engine swap can flip the last ulp, which a value-hash oracle would
flag as a wrong answer. Every quantity here is a BIGINT in units of
1e-12 rank ("pico-rank"): contributions are floor-divisions of integer
scores, per-node sums are exact BIGINT adds (order-free), and the
damping mix is an integer multiply-then-floor-divide. The result is
bit-identical across engines, partitionings, and iteration plans — the
same nano-grid-quantization posture operators/similarity.py uses for
IVF assignment ties.

Semantics (classic damped PageRank, dangling mass redistributed
uniformly, fixed iteration count so the oracle unrolls closed-form):

    s_0(v)   = SCALE DIV N
    inc_t(v) = SUM over edges u->v of  s_{t-1}(u) DIV outdeg(u)
    dang_t   = SUM of s_{t-1}(u) over u with outdeg(u) = 0
    s_t(v)   = ( (100-D) * (SCALE DIV N)
                 + D * (inc_t(v) + dang_t DIV N) ) DIV 100

with SCALE = 10^12 and D = 85 (the canonical 0.85 damping as an
integer percentage). All divisions are floor divisions of non-negative
BIGINTs, so Spark's ``DIV`` and DuckDB's ``//`` agree exactly.

Scale posture: each iteration is one shuffle (the groupBy(dst) of edge
contributions) plus one broadcast-sized 1-row aggregate (dangling
mass); N is collected once as a driver scalar and folded into the
update expression as a literal. When the driver-known score-table size
fits the broadcast budget, the contribution and update joins are
map-side broadcasts (no edge or score shuffle per round); past it they
are plain key joins — at cluster scale you pre-partition the edge list
by src ONCE (it is iteration-invariant) and only the per-iteration
score table moves. Lineage is truncated every iteration
via checkpoint.materialize — without it the 8-iteration plan is a
2^8-leaf join tree that stalls the optimizer long before it stalls the
executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pw_etl_scrumptious_squad_spark.checkpoint import materialize

SCALE = 10**12
DAMPING_PCT = 85


def transition_edges(lineitem: DataFrame) -> DataFrame:
    """Derive a directed part->part transition graph from order line
    adjacency: an edge src->dst for every pair of CONSECUTIVE line
    numbers within one order (the market-basket "bought then bought"
    sequence), self-loops dropped, deduplicated.

    One order-basket groupBy + a map-side pair expansion instead of the
    self-equi-join (round-10 guide §2.4, the cooccurrence_edges shape):
    each order's ``(ln, pk)`` structs fold into one array and every
    element pairs with the elements one line number ahead inside a
    higher-order expression. Semantics are EXACTLY the join's —
    including the cross product when a line number repeats within an
    order (the synthetic testdata does repeat them, which rules out a
    lead()-window form) — but the join stage and its second shuffle of
    the aliased table are gone; an order's lines all land in one task,
    the same bounded-basket posture as cooccurrence_edges (TPC-H
    orders hold <= 7 lines)."""
    rows = lineitem.select(
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
    )
    combos = F.expr(
        "flatten(transform(xs, x ->"
        " transform(filter(xs, y -> y.ln = x.ln + 1),"
        " y -> struct(x.pk AS src, y.pk AS dst))))"
    )
    return (
        rows.groupBy("ok")
        .agg(F.collect_list(F.struct("ln", "pk")).alias("xs"))
        .select(F.explode(combos).alias("p"))
        .select("p.src", "p.dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    damping_pct: int = DAMPING_PCT,
    scale: int = SCALE,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Integer-exact damped PageRank over a directed edge list
    (columns ``src``, ``dst``; caller dedupes). Returns
    ``(node BIGINT, pico_rank BIGINT)`` — pico_rank is the score in
    1e-12 units after ``iterations`` rounds; divide by 1e12 for the
    conventional probability reading. Deterministic to the bit: every
    step is BIGINT arithmetic (see module docstring)."""
    edges = edges.select("src", "dst").transform(materialize)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .transform(materialize)
    )
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    # N lands on the driver as ONE bigint (the y97 posture: a scalar is
    # not data). The previous 1-row n_frame broadcast was rebuilt by
    # every iteration of every materialize window — 9+ broadcast
    # exchanges and their BroadcastNestedLoopJoin crossJoins for one
    # constant. As a literal, SCALE DIV N folds at plan time and the
    # per-iteration crossJoin disappears (guide §1.2: don't compute
    # things you already know). Arithmetic is unchanged: Python's //
    # equals SQL DIV on non-negative BIGINTs.
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node", F.lit(None).cast("bigint").alias("pico_rank")
        )
    base_score = scale // n_nodes

    scores = nodes.select("node", F.lit(base_score).cast("bigint").alias("score"))
    # out-degree sits beside the score for the whole fold so the
    # per-iteration contribution is a projection, not a join
    scored = (
        scores.join(outdeg, scores["node"] == outdeg["src"], "left")
        .select("node", "score", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
        .transform(materialize)
    )

    # Driver-decided join strategy for the per-iteration joins (guide
    # §3.1): the score table has exactly n_nodes rows of three BIGINTs
    # and the contribution table at most n_nodes of two, but both sit
    # behind checkpoint scans that carry no statistics, so Spark plans
    # sort-merge unless told. When the driver-known size fits the
    # session broadcast budget, broadcasting the score side of the
    # contribution join and the contribution side of the update join
    # leaves ONE exchange per iteration (the groupBy(dst) partial agg)
    # instead of shuffling edges and scores every round. Past the
    # budget the original shuffle-join shape stands.
    try:
        bcast_budget = int(
            edges.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except (TypeError, ValueError):
        bcast_budget = 10 * 1024 * 1024
    small = bcast_budget > 0 and n_nodes * 32 <= bcast_budget

    for it in range(iterations):
        senders = scored.filter(F.col("outdeg") > 0)
        if small:
            senders = broadcast(senders)
        contrib = (
            senders.join(edges, senders["node"] == edges["src"])
            .groupBy("dst")
            .agg(
                F.sum(F.expr("score DIV outdeg")).cast("bigint").alias("inc")
            )
        )
        if small:
            contrib = broadcast(contrib)
        dang = scored.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg") == 0, F.col("score"))), F.lit(0)
            )
            .cast("bigint")
            .alias("dang")
        )
        scored = (
            scored.join(contrib, scored["node"] == contrib["dst"], "left")
            .crossJoin(broadcast(dang))
            .select(
                "node",
                F.expr(
                    f"CAST(({100 - damping_pct} * {base_score}L"
                    f" + {damping_pct} *"
                    " (COALESCE(inc, CAST(0 AS BIGINT))"
                    f" + dang DIV {n_nodes}L))"
                    " DIV 100 AS BIGINT)"
                ).alias("score"),
                "outdeg",
            )
        )
        # lineage policy, not semantics: a barrier every iteration pays
        # one eager job per round (the fixed cost that dominated the
        # measured x1 point); every-other-round keeps the plan depth
        # bounded at 2 join-agg layers, which Catalyst handles flat
        if (it + 1) % max(1, checkpoint_every) == 0 or it == iterations - 1:
            scored = scored.transform(materialize)
    return scored.select("node", F.col("score").alias("pico_rank"))


def pagerank_oracle_sql(
    iterations: int = 8,
    damping_pct: int = DAMPING_PCT,
    scale: int = SCALE,
) -> str:
    """The DuckDB twin of :func:`pagerank` over
    :func:`transition_edges`, UNROLLED (fixed iteration count makes the
    recursion a closed-form CTE chain — no recursive-CTE aggregation
    semantics to depend on). Every arithmetic step mirrors the Spark
    expression exactly: BIGINT floor division on non-negative values."""
    head = (
        "WITH e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst"
        " FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey"
        " AND b.l_linenumber = a.l_linenumber + 1"
        " WHERE a.l_partkey <> b.l_partkey),"
        " nd AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),"
        " nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nd),"
        " od AS MATERIALIZED (SELECT src, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM e GROUP BY src),"
        " s0 AS MATERIALIZED (SELECT nd.node,"
        f" CAST({scale} AS BIGINT) // nn.n_nodes AS score,"
        " COALESCE(od.outdeg, CAST(0 AS BIGINT)) AS outdeg"
        " FROM nd CROSS JOIN nn LEFT JOIN od ON nd.node = od.src)"
    )
    steps = []
    for t in range(1, iterations + 1):
        p = f"s{t - 1}"
        steps.append(
            f", i{t} AS MATERIALIZED (SELECT e.dst, CAST(SUM({p}.score // {p}.outdeg)"
            f" AS BIGINT) AS inc FROM {p} JOIN e ON {p}.node = e.src"
            f" WHERE {p}.outdeg > 0 GROUP BY e.dst)"
            f", d{t} AS MATERIALIZED (SELECT CAST(COALESCE(SUM(CASE WHEN outdeg = 0"
            f" THEN score END), 0) AS BIGINT) AS dang FROM {p})"
            f", s{t} AS MATERIALIZED (SELECT {p}.node,"
            f" CAST(({100 - damping_pct} * (CAST({scale} AS BIGINT)"
            f" // nn.n_nodes) + {damping_pct} * (COALESCE(i{t}.inc,"
            f" CAST(0 AS BIGINT)) + d{t}.dang // nn.n_nodes)) // 100"
            f" AS BIGINT) AS score, {p}.outdeg"
            f" FROM {p} CROSS JOIN nn CROSS JOIN d{t}"
            f" LEFT JOIN i{t} ON {p}.node = i{t}.dst)"
        )
    return (
        head
        + "".join(steps)
        + f" SELECT node, score AS pico_rank FROM s{iterations}"
        " ORDER BY node"
    )


def cooccurrence_edges(
    lineitem: DataFrame, max_parts_per_order: int = 64
) -> DataFrame:
    """Derive an UNDIRECTED part co-purchase graph: an edge (a, b) with
    ``a < b`` for every pair of distinct parts appearing in the same
    order, deduplicated across orders. Orders with more than
    ``max_parts_per_order`` distinct parts are EXCLUDED before pairing
    — a B-part order emits B^2/2 pairs from one task, so one
    pathological basket could wedge the stage (the LSH bucket-cap
    rule); the cap is a documented contract the oracle mirrors, not a
    silent truncation, and TPC-H-shaped orders (<= 7 lines) never
    approach it."""
    parts = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    # One groupBy instead of distinct + count-agg + key-attach join +
    # self-join (the round-10 plan fix: the old shape shuffled the
    # (ok, pk) table FOUR times and computed the kept-orders subtree
    # twice under the a/b aliases; collect_set makes a pre-distinct
    # redundant — set semantics dedup per order during the partial
    # aggregation). A basket is <= max_parts_per_order parts by the cap,
    # so the per-order pair expansion is a bounded map-side higher-order
    # expression over the sorted part array — a < b falls out of the
    # sort, no join anywhere. Shuffles: basket groupBy, final pair
    # distinct.
    baskets = (
        parts.groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("ps"))
        .filter(F.size("ps") <= max_parts_per_order)
        .filter(F.size("ps") >= 2)
    )
    combos = F.expr(
        "flatten(transform(ps, (x, i) ->"
        " transform(slice(ps, i + 2, size(ps) - i - 1),"
        " y -> struct(x AS a, y AS b))))"
    )
    return (
        baskets.select(F.explode(combos).alias("p"))
        .select("p.a", "p.b")
        .distinct()
    )


def triangle_stats(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    assume_canonical: bool = False,
) -> DataFrame:
    """Exact triangle count + global clustering coefficient over an
    undirected edge list, via DEGREE-ORDERED ORIENTATION (the classic
    O(m^1.5) algorithm; Schank & Wagner 2005) closed by ADJACENCY
    INTERSECTION (the edge-iterator formulation): orient every edge
    from its lower-(degree, id) endpoint to the higher, build each
    source's sorted out-neighbor array once, and count per oriented
    edge (u, v) the size of N+(u) ∩ N+(v). Returns ONE row:
    ``(n_nodes, n_edges, n_wedges, n_triangles, global_cc_ppb)`` — all
    BIGINT, the coefficient as exact parts-per-billion
    ``(3 * T * 1e9) DIV wedges`` so the value oracle compares
    integers, never a float ratio.

    Why orientation is the 100 TB shape: the naive wedge count per
    node is C(deg, 2) — a celebrity node with degree 1e6 contributes
    5e11 wedges from ONE key, the skew that kills the naive
    triangle join. Orienting by (degree, id) bounds every node's
    OUT-degree by O(sqrt(m)) for any degree distribution (a node with
    out-degree d has d neighbors of degree >= its own, so
    d^2 <= sum of degrees = 2m), so per-edge intersection work is
    bounded by O(sqrt(m)) and m^1.5 total. Each triangle is counted
    exactly once: for a triangle ordered a < b < c by (degree, id),
    only the edge (a, b) has c in both out-neighborhoods. Why
    intersection instead of the textbook wedge self-join: the wedge
    stream IS the m^1.5 term — enumerating it as rows means an
    m^1.5-row join input, whereas the adjacency table holds the same
    information in O(m) cells, so nothing bigger than the edge list is
    ever shuffled (optimization guide §2.3/§8: move decisions onto the
    compact representation). Shuffles: a degree agg, two node-keyed
    key-attach joins, the adjacency groupBy, and the two
    adjacency-attach joins — the degree and adjacency attaches are
    broadcast (map-side, no edge-list exchange) when the driver-known
    edge count fits the session budget, plain key joins past it — O(m)
    either way; in the broadcast regime the oriented projection is a
    cheap scan, so its materialize barrier is skipped (one fewer
    sequential job — guide §2.6) and the edge count itself runs
    concurrently with the degree materialize.
    n_wedges reports the UNDIRECTED wedge count (sum of C(deg, 2)) —
    the clustering-coefficient denominator — computed from the degree
    table, not enumerated."""
    # ``assume_canonical=True`` is the caller's guarantee that the edge
    # list is already (a < b, distinct) — cooccurrence_edges emits exactly
    # that — which drops a full corpus-sized canonicalization shuffle
    # (least/greatest + distinct over every edge) from the plan. The
    # general entry point keeps the canonicalization for arbitrary input.
    if assume_canonical:
        und = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    else:
        und = (
            edges.select(
                F.least(F.col(a_col), F.col(b_col)).alias("a"),
                F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    und = materialize(und)
    # the edge count drives two driver-side decisions below (degree
    # broadcast, adjacency broadcast) but is not needed until after the
    # degree materialize — run it CONCURRENTLY with that job instead of
    # as one more entry in the sequential job chain (guide §2.6: overlap
    # independent jobs; the loop entries' residual cost is exactly this
    # scheduler-latency floor). InheritableThread propagates the py4j
    # thread-locals (job group/description) the way the CC speculative
    # round already relies on.
    from pyspark import InheritableThread

    n_e_box: dict = {}

    def _count_edges() -> None:
        try:
            n_e_box["n"] = und.count()  # cached blocks; a metadata read
        except Exception as exc:  # pragma: no cover - surfaced on join
            n_e_box["err"] = exc

    count_thread = InheritableThread(target=_count_edges)
    count_thread.start()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    deg = materialize(deg)
    count_thread.join()
    if "err" in n_e_box:
        raise n_e_box["err"]
    n_e = n_e_box["n"]
    try:
        bcast_budget = int(
            und.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
        )
    except (TypeError, ValueError):
        bcast_budget = 10 * 1024 * 1024
    # Small regime (driver-known sizes — checkpoint scans carry no
    # statistics, so Spark cannot make these calls itself): the degree
    # table has at most 2*n_e rows of two BIGINTs; when that fits the
    # session broadcast budget the two key-attach joins become map-side
    # broadcasts (no exchange of the edge list) AND the oriented
    # projection becomes a cheap scan-over-checkpoint, so its
    # materialize barrier buys nothing — skipping it removes one
    # sequential job from the chain. Past the budget the original
    # shape (shuffle joins + oriented barrier, O(m) bytes) stands.
    small = bcast_budget > 0 and 2 * n_e * 16 <= bcast_budget
    deg_a = deg.withColumnRenamed("v", "a")
    deg_b = deg.withColumnRenamed("v", "b")
    if small:
        deg_a, deg_b = F.broadcast(deg_a), F.broadcast(deg_b)
    keyed = (
        und.join(deg_a, "a")
        .withColumnRenamed("d", "da")
        .join(deg_b, "b")
        .withColumnRenamed("d", "db")
    )
    oriented = keyed.select(
        F.when(
            F.struct("da", "a") < F.struct("db", "b"), F.col("a")
        )
        .otherwise(F.col("b"))
        .alias("src"),
        F.when(
            F.struct("da", "a") < F.struct("db", "b"), F.col("b")
        )
        .otherwise(F.col("a"))
        .alias("dst"),
    )
    if not small:
        oriented = materialize(oriented)
    # adjacency closing: ONE groupBy folds the oriented edges into each
    # source's sorted out-neighbor array (total cells = m, per-array
    # length <= O(sqrt(m)) by the orientation bound), then every
    # oriented edge (u, v) contributes |N+(u) ∩ N+(v)| triangles via a
    # codegen'd array_intersect — the m^1.5 wedge stream of the
    # self-join formulation never exists as rows. Join-strategy pick
    # (guide §3.1): the adjacency relation's size is driver-known
    # metadata (the materialized edge count — a checkpoint scan carries
    # no size statistics, so Spark cannot make this call itself); when
    # it fits the session's broadcast budget both attach joins are
    # broadcast and the edge list is never shuffled at all, past the
    # budget they are plain key joins — O(m) bytes either way.
    adj = oriented.groupBy("src").agg(
        F.sort_array(F.collect_list("dst")).alias("nb")
    )
    adj = materialize(adj)
    adj_u = adj.select(F.col("src"), F.col("nb").alias("nb_u"))
    adj_v = adj.select(F.col("src").alias("dst"), F.col("nb").alias("nb_v"))
    if bcast_budget > 0 and n_e * 16 <= bcast_budget:
        adj_u, adj_v = F.broadcast(adj_u), F.broadcast(adj_v)
    tri = (
        oriented.select("src", "dst")
        .join(adj_u, "src")
        .join(adj_v, "dst", "left")
        .select(
            F.when(
                F.col("nb_v").isNull(), F.lit(0)
            )
            .otherwise(F.size(F.array_intersect("nb_u", "nb_v")))
            .alias("c")
        )
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("bigint").alias("t"))
    )
    summary = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("bigint").alias("n_wedges"),
    )
    n_edges = und.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        summary.crossJoin(n_edges)
        .crossJoin(tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("t").alias("n_triangles"),
            F.when(F.col("n_wedges") > 0, F.expr("3L * t * 1000000000L DIV n_wedges"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("global_cc_ppb"),
        )
    )
