"""Entity resolution (operators/linkage.py) and exact heavy hitters
(operators/text.py::heavy_hitters_exact): fixtures pin the match
semantics (blocking recall, transitive closure, canonical pick) and
the sketch-exactness guarantee (candidates can over-admit, never
miss), including a brute-force twin on random corpora."""

import random

import pytest
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import linkage as LK
from pw_etl_scrumptious_squad_spark.operators.text import heavy_hitters_exact


def test_blocked_pairs_respect_block_and_distance(spark):
    names = spark.createDataFrame(
        [("aaa ring",), ("aab ring",), ("zzz ring",), ("aaa widget",)],
        "name STRING",
    )
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in LK.blocked_fuzzy_pairs(names, "name", max_dist=2).collect()
    }
    # "aaa widget" blocks apart (last token) even though it is within
    # distance 2 of nothing anyway; "zzz ring" shares the block but
    # fails the distance verify — blocking bounds candidates, the
    # edit distance decides
    assert got == {("aaa ring", "aab ring", 1)}


def test_resolve_entities_transitive_and_counts(spark):
    # chain: "aaaa x" - "aaab x" - "aabb x" (each link dist 1, ends dist 2)
    rows = [("aaaa x",)] * 3 + [("aaab x",)] * 2 + [("aabb x",)] + [("zzzz y",)]
    df = spark.createDataFrame(rows, "n STRING")
    got = {
        r["canonical_name"]: (r["n_variants"], r["n_mentions"])
        for r in LK.resolve_entities(df, "n", max_dist=2).collect()
    }
    assert got == {"aaaa x": (3, 6), "zzzz y": (1, 1)}


def test_resolve_entities_no_matches_is_identity(spark):
    df = spark.createDataFrame(
        [("alpha one",), ("beta two",), ("gamma three",)], "n STRING"
    )
    got = {r["canonical_name"] for r in LK.resolve_entities(df, "n").collect()}
    assert got == {"alpha one", "beta two", "gamma three"}


def _brute_hh(texts, denom):
    from collections import Counter

    c = Counter(t for s in texts for t in s.split(" ") if t)
    total = sum(c.values())
    thr = (total + denom - 1) // denom
    return {k: v for k, v in c.items() if v >= thr}


def test_heavy_hitters_exact_matches_brute_force(spark):
    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(50)]
    # Zipf-ish: low ids hugely more frequent
    texts = [
        " ".join(rng.choice(vocab[: 1 + rng.randrange(50)]) for _ in range(30))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = {
        r["token"]: r["n_occurrences"]
        for r in heavy_hitters_exact(df, denom=50, capacity=64).collect()
    }
    assert got == _brute_hh(texts, 50)


def test_heavy_hitters_partitioning_invariance(spark):
    texts = [f"a a a b{i % 7} c" for i in range(40)]
    a = {
        (r["token"], r["n_occurrences"])
        for r in heavy_hitters_exact(
            spark.createDataFrame([(t,) for t in texts], "text STRING").repartition(1),
            denom=10,
            capacity=16,
        ).collect()
    }
    b = {
        (r["token"], r["n_occurrences"])
        for r in heavy_hitters_exact(
            spark.createDataFrame([(t,) for t in texts], "text STRING").repartition(13),
            denom=10,
            capacity=16,
        ).collect()
    }
    assert a == b and ("a", 120) in a


def test_heavy_hitters_capacity_guard(spark):
    df = spark.createDataFrame([("x",)], "text STRING")
    with pytest.raises(ValueError):
        heavy_hitters_exact(df, denom=4096, capacity=100)


def test_heavy_hitters_empty_and_null_texts(spark):
    df = spark.createDataFrame(
        [("",), (None,), ("solo solo solo",)], "text STRING"
    )
    got = {
        r["token"]: r["n_occurrences"]
        for r in heavy_hitters_exact(df, denom=2, capacity=8).collect()
    }
    assert got == {"solo": 3}
