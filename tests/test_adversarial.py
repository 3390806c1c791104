"""Adversarial-corpus battery: the approximate-mode dedup routes must
stay BOUNDED (star covers / identical-signature collapse engage) on the
two classic worst cases — an all-identical corpus and a Zipfian
duplicate-cluster corpus — while the exact modes on the same inputs emit
exactly their closed-form pair counts. A 100 TB crawl WILL contain a
boilerplate page duplicated 10^6 times; these tests are that page at
test scale.

Candidate-count assertions run at 50k-100k docs (the counting paths are
O(n)); verified-pair assertions use smaller clusters because the TRUE
output of an exact near-dup op on n identical docs is C(n,2) rows —
output-bound by definition, so bounding the input is the only honest way
to bound the test."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import dedup

TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def _identical_docs(spark, n: int, text: str = TEXT):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(text).alias("text"),
        F.lit("en").alias("lang"),
    )


def test_lsh_candidates_all_identical_100k_star_cover(spark):
    """100k identical docs: every band bucket blows past the cap, the
    star cover engages, and the candidate set is exactly n-1 star pairs
    to the representative — not the C(n,2) ~ 5e9 a naive bucket
    self-join would attempt."""
    n = 100_000
    sigs = dedup.minhash_signatures(
        _identical_docs(spark, n), "doc_id", "text", num_perm=16
    )
    cands = dedup.lsh_candidate_pairs(sigs, bands=4)
    assert cands.count() == n - 1
    # all star pairs share the minimum-id representative
    assert cands.agg(F.max("doc_a")).first()[0] == 0


def test_minhash_lsh_dedup_identical_cluster_verified(spark):
    """End-to-end on 5k identical docs: n-1 verified pairs, all at
    Jaccard exactly 1.0 (the star cover bounds the candidate set; the
    verify stage keeps every emitted value exact)."""
    n = 5_000
    out = dedup.minhash_lsh_dedup(
        _identical_docs(spark, n), "doc_id", "text", num_perm=16, bands=4
    )
    rows = out.agg(
        F.count(F.lit(1)).alias("n"), F.min("jaccard").alias("mn")
    ).first()
    assert rows["n"] == n - 1
    assert rows["mn"] == 1.0


def test_wide_hamming_identical_group_collapse_50k(spark):
    """Approximate wide-SimHash tier on 50k identical docs: the
    identical-signature groups star-collapse BEFORE banding (lossless —
    hamming-0 classes), so the output is exactly n-1 pairs at hamming 0
    and the band join never sees the cluster."""
    n = 50_000
    sigs = dedup.simhash_words(
        _identical_docs(spark, n), "doc_id", "text", bits=128
    )
    out = dedup.hamming_near_pairs_words(
        sigs, bits=128, bands=8, max_hamming=7,
        sig_col="simhash_words", exact=False,
    )
    got = out.agg(
        F.count(F.lit(1)).alias("n"), F.max("hamming").alias("mx")
    ).first()
    assert got["n"] == n - 1
    assert got["mx"] == 0


def test_wide_hamming_exact_mode_closed_form(spark):
    """Exact mode may not drop output: 300 identical docs emit exactly
    C(300,2) pairs (the documented mode rule — no output-changing guards
    in exact mode)."""
    n = 300
    sigs = dedup.simhash_words(
        _identical_docs(spark, n), "doc_id", "text", bits=128
    )
    out = dedup.hamming_near_pairs_words(
        sigs, bits=128, bands=8, max_hamming=7,
        sig_col="simhash_words", exact=True,
    )
    assert out.count() == n * (n - 1) // 2


@pytest.mark.extended  # ~23 s adversarial battery; default tier: the
# identical-group collapse and bucket-cap tests cover the same guard
def test_zipfian_clusters_candidate_counts_closed_form(spark):
    """Zipf-duplicated corpus (cluster k has ~N/k identical members,
    disjoint vocabularies between clusters): the LSH candidate count is
    exactly sum_k [C(c_k,2) if c_k <= cap else c_k - 1] — small clusters
    pair fully, oversized clusters star-collapse, clusters never mix."""
    cap = 1_000  # dedup._LSH_BUCKET_CAP
    top = 30_000
    sizes = {k: max(1, top // k) for k in range(1, 60)}
    clusters = spark.createDataFrame(
        [(k, c) for k, c in sizes.items()], "k INT, c INT"
    )
    docs = clusters.select(
        F.explode(F.expr("sequence(1, c)")).alias("i"),
        "k",
    ).select(
        (F.col("k") * 1_000_000 + F.col("i")).alias("doc_id"),
        # one distinct token per cluster => identical within, disjoint across
        F.concat(
            F.lit("tok"), F.col("k").cast("string"),
            F.lit(" filler words shared nowhere "),
            F.lit("tok"), F.col("k").cast("string"),
        ).alias("text"),
    )
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", num_perm=16)
    got = dedup.lsh_candidate_pairs(sigs, bands=4).count()
    expected = sum(
        (c * (c - 1) // 2) if c <= cap else c - 1 for c in sizes.values()
    )
    assert got == expected


def test_jaccard_routes_identical_cluster(spark):
    """Token-set Jaccard: the exact tier on 400 identical docs emits
    exactly C(400,2). The forced LSH tier pairs fully below the
    1000-doc bucket cap (sub-cap cluster: C(n,2), nothing dropped) and
    star-collapses above it (n-1 pairs) — all at Jaccard exactly 1.0."""
    n = 400
    docs = _identical_docs(spark, n)
    exact = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", "lang", 0.9, n_rows_hint=n
    )
    assert exact.count() == n * (n - 1) // 2
    # below the cap the LSH tier is lossless on the cluster
    lsh_small = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text", "lang", 0.9, max_exact_rows=0, n_rows_hint=n
    )
    got = lsh_small.agg(
        F.count(F.lit(1)).alias("n"), F.min("jaccard").alias("mn")
    ).first()
    assert got["n"] == n * (n - 1) // 2 and got["mn"] == 1.0
    # above the cap the star cover engages: n-1 pairs to the representative
    big = 2_000
    lsh_big = dedup.ngram_jaccard_pairs(
        _identical_docs(spark, big), "doc_id", "text", "lang", 0.9,
        max_exact_rows=0, n_rows_hint=big,
    )
    got_big = lsh_big.agg(
        F.count(F.lit(1)).alias("n"), F.min("jaccard").alias("mn")
    ).first()
    assert got_big["n"] == big - 1 and got_big["mn"] == 1.0


def test_embedding_ivf_route_identical_vectors(spark):
    """IVF-cell route on 500 identical vectors: all land in one cell and
    every qualifying pair is emitted — C(500,2) at cosine 1.0. The
    output IS quadratic in the true dup-cluster size (that is the
    answer, not a blow-up); the route's job is to never COMPARE beyond
    the cell, which the cell-keyed join guarantees."""
    n = 500
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr("array(1.0f, 2.0f, 3.0f, 4.0f)").alias("embedding"),
    )
    out = dedup.embedding_neardup_pairs(
        vecs, threshold=0.95, max_exact_rows=0, n_rows_hint=n
    )
    got = out.agg(
        F.count(F.lit(1)).alias("n"), F.min("cosine_sim").alias("mn")
    ).first()
    assert got["n"] == n * (n - 1) // 2
    assert got["mn"] == 1.0


def test_containment_guard_tier_kills_boilerplate(spark):
    """Containment dedup's guard tier (max_shingle_df): on an
    all-identical corpus every shingle has df = n, so the guard drops
    them all and emits zero pairs — the explicit opt-in that trades the
    boilerplate cluster away instead of materializing C(n,2) rows."""
    n = 2_000
    docs = _identical_docs(spark, n).select("doc_id", "text")
    guarded = dedup.containment_pairs(docs, threshold=0.8, max_shingle_df=1)
    assert guarded.count() == 0
