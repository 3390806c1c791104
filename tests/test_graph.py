"""Integer-exact PageRank (operators/graph.py): hand-computable
fixtures pin the arithmetic contract (floor division, dangling
redistribution, damping mix), a partitioning A/B pins order
independence, and value parity vs the unrolled DuckDB oracle rides the
catalog sweep (y81_part_pagerank)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import graph as G

SCALE = G.SCALE


def _pr(spark, edges, iterations, npart=None):
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    if npart:
        df = df.repartition(npart)
    rows = G.pagerank(df, iterations=iterations).collect()
    return {r["node"]: r["pico_rank"] for r in rows}


def test_single_edge_one_iteration_closed_form(spark):
    # nodes {1,2}, edge 1->2; s0 = SCALE/2; node 2 has no out-edges so
    # its whole score is dangling mass
    got = _pr(spark, [(1, 2)], iterations=1)
    s0 = SCALE // 2
    dang = s0  # node 2's score
    base = 15 * (SCALE // 2)
    assert got[1] == (base + 85 * (0 + dang // 2)) // 100
    assert got[2] == (base + 85 * (s0 // 1 + dang // 2)) // 100


def test_two_cycle_is_symmetric_fixpoint(spark):
    # 1<->2: symmetric, no dangling; every iteration reproduces
    # (15*(S/2) + 85*(S/2))/100 = S/2 exactly — a true integer fixpoint
    got = _pr(spark, [(1, 2), (2, 1)], iterations=7)
    assert got[1] == got[2] == SCALE // 2


def test_star_sink_accumulates_rank(spark):
    # 1->3, 2->3: the sink must outrank the sources, mass conserved
    # modulo floor loss (sum <= SCALE, within n_nodes picounits)
    got = _pr(spark, [(1, 3), (2, 3)], iterations=4)
    assert got[3] > got[1] == got[2]
    assert sum(got.values()) <= SCALE
    assert sum(got.values()) >= SCALE - 100 * 3


def test_partitioning_invariance(spark):
    edges = [(i, (i * 7) % 23) for i in range(23) if i != (i * 7) % 23]
    a = _pr(spark, edges, iterations=5, npart=1)
    b = _pr(spark, edges, iterations=5, npart=17)
    assert a == b


def test_oracle_sql_matches_spark_on_fixture(spark, tmp_path):
    # lineitem-shaped fixture through BOTH transition_edges and the
    # oracle's edge derivation, so the adjacency join is covered too
    rows = [
        # (orderkey, linenumber, partkey)
        (1, 1, 10), (1, 2, 11), (1, 3, 10),
        (2, 1, 11), (2, 2, 12),
        (3, 1, 12), (3, 2, 12),  # self-loop dropped
        (4, 1, 13),              # no successor
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey BIGINT, l_linenumber INT, l_partkey BIGINT"
    )
    got = sorted(
        (r["node"], r["pico_rank"])
        for r in G.pagerank(G.transition_edges(li)).collect()
    )
    pdf = li.toPandas()
    con = duckdb.connect()
    con.register("lineitem", pdf)
    exp = [(int(a), int(b)) for a, b in con.execute(G.pagerank_oracle_sql()).fetchall()]
    con.close()
    assert got == exp


def test_empty_edges_raise_nothing_and_return_empty(spark):
    e = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert G.pagerank(e, iterations=2).count() == 0


def test_plan_has_no_cartesian_or_row_python(spark):
    li_rows = [(1, 1, 10), (1, 2, 11), (2, 1, 11), (2, 2, 10)]
    li = spark.createDataFrame(
        li_rows, "l_orderkey BIGINT, l_linenumber INT, l_partkey BIGINT"
    )
    df = G.pagerank(G.transition_edges(li), iterations=2)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Triangle counting (round-10 continuation)
# ---------------------------------------------------------------------------

def _tri(spark, edges):
    df = spark.createDataFrame(edges, "a LONG, b LONG")
    return G.triangle_stats(df).first().asDict()


def test_triangles_known_graphs(spark):
    # K4: 4 triangles, 12 wedges, cc = 1.0 exactly
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    got = _tri(spark, k4)
    assert got == {
        "n_nodes": 4,
        "n_edges": 6,
        "n_wedges": 12,
        "n_triangles": 4,
        "global_cc_ppb": 1_000_000_000,
    }
    # path 1-2-3: one wedge, no triangle
    assert _tri(spark, [(1, 2), (2, 3)]) == {
        "n_nodes": 3,
        "n_edges": 2,
        "n_wedges": 1,
        "n_triangles": 0,
        "global_cc_ppb": 0,
    }
    # star K1,5: the celebrity-hub shape the orientation defuses —
    # C(5,2)=10 wedges from the degree table, zero triangles
    star = [(0, i) for i in range(1, 6)]
    got = _tri(spark, star)
    assert (got["n_wedges"], got["n_triangles"]) == (10, 0)
    # two disjoint triangles + a bridge edge
    g = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    got = _tri(spark, g)
    assert got["n_triangles"] == 2
    assert got["n_edges"] == 7


def test_triangles_input_canonicalization_and_invariance(spark):
    # duplicate edges, reversed orientation, self-loops: all cleaned up
    messy = [(2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3), (1, 3)]
    got = _tri(spark, messy)
    assert got == {
        "n_nodes": 3,
        "n_edges": 3,
        "n_wedges": 3,
        "n_triangles": 1,
        "global_cc_ppb": 1_000_000_000,
    }
    # partition invariance
    df = spark.createDataFrame(messy, "a LONG, b LONG")
    one = G.triangle_stats(df.repartition(1)).first().asDict()
    many = G.triangle_stats(df.repartition(9)).first().asDict()
    assert one == many == got


def test_triangles_match_bruteforce_on_random_graph(spark):
    import itertools
    import random

    rng = random.Random(7)
    nodes = list(range(30))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
            )
            if a != b
        }
    )
    eset = set(edges)
    want = sum(
        1
        for x, y, z in itertools.combinations(nodes, 3)
        if (x, y) in eset and (y, z) in eset and (x, z) in eset
    )
    got = _tri(spark, edges)
    assert got["n_triangles"] == want
    assert got["n_edges"] == len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert got["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())


def test_cooccurrence_cap_excludes_big_baskets(spark):
    rows = [(1, i, 100 + i) for i in range(1, 4)] + [
        (2, i, 200 + i) for i in range(1, 70)
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey BIGINT, l_linenumber INT, l_partkey BIGINT"
    )
    e = G.cooccurrence_edges(li, max_parts_per_order=64)
    # order 2 (69 distinct parts) is excluded entirely; order 1 gives
    # C(3,2)=3 edges
    assert e.count() == 3
    assert e.filter(F.col("a") >= 200).count() == 0
