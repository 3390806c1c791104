"""Tests for the training-data-pipeline extension operators: fuzzy dedup
(MinHash-LSH, SimHash), and IVF approximate similarity search (quality
measured against the exact brute-force baseline)."""

import pytest
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import dedup, similarity
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_near_dups(spark):
    """sf0.001 documents plus planted near-duplicates: copies of doc 0 and
    doc 1 with one token changed (high Jaccard), ids 9000/9001."""
    docs = read_table(spark, SF, "documents").select("doc_id", "text", "lang")
    base = {r["doc_id"]: r for r in docs.filter(F.col("doc_id") < 2).collect()}
    planted = spark.createDataFrame(
        [
            (9000, base[0]["text"] + " extra", base[0]["lang"]),
            (9001, base[1]["text"].replace(" ", " ", 1) + " tail word", base[1]["lang"]),
        ],
        "doc_id long, text string, lang string",
    )
    return docs.unionByName(planted)


def test_minhash_vectorized_bit_equals_expr(docs_with_near_dups, spark):
    """The Arrow/numpy MinHash tier must be BIT-identical to the
    expression tier (the DuckDB oracles' structural twin) — same
    shingling (whole-text fallback, NULL -> md5('')), same h1/h2 digest
    split, same min(h1 + p*h2) in int64 — across signature widths and
    shingle sizes, including degenerate rows."""
    degenerate = spark.createDataFrame(
        [
            (9100, None, "en"),
            (9101, "", "en"),
            (9102, "a b", "en"),
            (9103, "x  y   z", "de"),
            (9104, "a a a a a a a a a a", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    df = docs_with_near_dups.unionByName(degenerate)

    def sig(impl, num_perm, k):
        return sorted(
            (r["doc_id"], tuple(r["minhash"]))
            for r in dedup.minhash_signatures(
                df, "doc_id", num_perm=num_perm, shingle_size=k, impl=impl
            ).collect()
        )

    for num_perm, k in [(16, 5), (8, 9)]:
        assert sig("vectorized", num_perm, k) == sig("expr", num_perm, k)


def test_minhash_lsh_finds_planted_dups(docs_with_near_dups):
    pairs = dedup.minhash_lsh_dedup(
        docs_with_near_dups, "doc_id", "text",
        num_perm=16, bands=8, threshold=0.5,
    )
    found = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (0, 9000) in found
    assert (1, 9001) in found
    for a, b in found:
        assert a < b  # canonical pair order


def test_lsh_candidates_superset_of_high_jaccard(docs_with_near_dups):
    """Banding with 8 bands of 2 rows catches >=0.9-Jaccard pairs reliably."""
    sigs = dedup.minhash_signatures(docs_with_near_dups, "doc_id", num_perm=16)
    cands = dedup.lsh_candidate_pairs(sigs, bands=8)
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    exact = dedup.jaccard_verify(
        cands, docs_with_near_dups, "doc_id", threshold=0.9
    )
    for r in exact.collect():
        assert (r["doc_a"], r["doc_b"]) in cand_set


def test_simhash_deterministic_and_near_for_dups(docs_with_near_dups):
    sh = dedup.simhash(docs_with_near_dups, "doc_id", bits=32)
    vals = {r["doc_id"]: r["simhash"] for r in sh.collect()}
    again = {r["doc_id"]: r["simhash"] for r in dedup.simhash(
        docs_with_near_dups, "doc_id", bits=32).collect()}
    assert vals == again  # deterministic
    # planted near-dup has small Hamming distance to its source
    ham = bin(vals[0] ^ vals[9000]).count("1")
    assert ham <= 6


def test_ivf_recall_against_bruteforce(spark):
    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = similarity.assign_ivf_cells(emb, centroids)
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5)
    approx = similarity.ivf_topk(assigned, centroids, queries, k=5, n_probe=3)
    exact_set = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    approx_set = {(r["query_id"], r["match_id"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # probing 3/10 cells recovers most true neighbors
    # every approx hit must be a genuine corpus vector with a sane score
    for r in approx.collect():
        assert -1.0 <= r["cosine_sim"] <= 1.0


def test_assign_ivf_cells_exhaustive(spark):
    emb = read_table(spark, SF, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = similarity.assign_ivf_cells(emb, centroids)
    assert assigned.count() == emb.count()  # every vector lands in one cell
    assert assigned.select("cell").distinct().count() <= centroids.count()


def test_embedding_neardup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [2.0, 0.0, 0.0], 0),   # same direction as 1 -> cosine 1.0
        (3, [0.0, 1.0, 0.0], 0),   # orthogonal to 1/2
        (4, [1.0, 0.0, 0.0], 1),   # same direction but different block
    ]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    pairs = dedup.embedding_neardup_pairs(
        df, "vec_id", "embedding", "label", threshold=0.9
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["cosine_sim"]) for r in pairs] == [
        (1, 2, 1.0)
    ]


def test_ngram_jaccard_multiword_bitmask(spark):
    # 70+ distinct tokens spans two 64-bit mask words; word boundaries
    # (bits 62, 63, 64) must not corrupt the per-pair popcount sums
    docs = [(1, "a b c d", "x"), (2, "a b c e", "x"), (3, "z9 z8", "x")] + [
        (10 + i, f"w{i}", "y") for i in range(70)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, lang STRING")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", "lang", 0.5
        ).collect()
    }
    assert got == {(1, 2): 0.6}  # |{a,b,c}| / |{a,b,c,d,e}|


def test_ngram_jaccard_huge_vocab_fallback(spark):
    # >1024 distinct tokens exceeds the bitmask cap and must fall back to
    # the array_intersect path with identical results
    docs = [(1, "a b c d", "x"), (2, "a b c e", "x")] + [
        (10 + i, f"u{i} u{i + 1}", "y") for i in range(0, 2200, 2)
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, lang STRING")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", "lang", 0.5
        ).collect()
    }
    assert got == {(1, 2): 0.6}


def test_kmeans_ivf_beats_or_matches_sampled_centroids(spark):
    """Trained (k-means) centroids must not lose recall vs the naive
    sampled-row centroids at the same k / n_probe — the s02 catalog entry
    uses the trained path on the strength of this property."""
    emb = read_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5)
    exact_set = {(r["query_id"], r["match_id"]) for r in exact.collect()}

    def recall_of(centroids):
        assigned = similarity.assign_ivf_cells(emb, centroids)
        assert assigned.count() == emb.count()
        approx = similarity.ivf_topk(
            assigned, centroids, queries, k=5, n_probe=3,
            centroid_id="centroid_id",
        )
        hits = {(r["query_id"], r["match_id"]) for r in approx.collect()}
        return len(exact_set & hits) / len(exact_set)

    trained = similarity.train_ivf_centroids(emb, k=10)
    assert trained.count() == 10
    sampled = emb.filter(F.col("vec_id") % 50 == 0).limit(10).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    r_trained = recall_of(trained)
    r_sampled = recall_of(sampled)
    assert r_trained >= 0.5
    assert r_trained >= r_sampled


def test_simhash_near_pairs_finds_planted_dups(docs_with_near_dups):
    pairs = dedup.simhash_near_pairs(
        docs_with_near_dups, "doc_id", "text", bits=32, bands=8, max_hamming=6
    )
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert (0, 9000) in found  # planted near-dup is hamming-near
    assert all(h <= 6 for h in found.values())


def test_simhash_near_pairs_guards(docs_with_near_dups):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.simhash_near_pairs(docs_with_near_dups, "doc_id", max_hamming=8, bands=8)
    with _pytest.raises(ValueError):
        dedup.simhash_near_pairs(docs_with_near_dups, "doc_id", bits=32, bands=7)


def _plan_str(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_ngram_guard_routes_to_lsh_no_broadcast(spark):
    """Above max_exact_rows the pair stage must take the banded path:
    no full-side broadcast anywhere in the plan, and high-Jaccard pairs
    are still found (the banded path's verify keeps them value-exact)."""
    docs = [(i, f"tok{i} tok{i+1} tok{i+2} filler{i%7}", "x") for i in range(200)]
    docs += [(900, "a b c d e f g h", "x"), (901, "a b c d e f g i", "x")]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, lang STRING")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        guarded = dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", "lang", 0.7, max_exact_rows=100
        )
        rows = guarded.collect()
        plan = _plan_str(guarded)
        assert "Broadcast" not in plan  # nothing broadcast in the scale path
        assert "SortMergeJoin" in plan  # bucket/verify joins shuffle on keys
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    found = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert found[(900, 901)] == pytest.approx(7 / 9, abs=1e-9)
    # exact path (cap not hit) agrees on the high-jaccard pair set
    exact = dedup.ngram_jaccard_pairs(df, "doc_id", "text", "lang", 0.7)
    exact_found = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in exact.collect()
    }
    assert found == exact_found


def test_embedding_guard_routes_to_cells_no_full_broadcast(spark):
    """Above max_exact_rows the quadratic stage must be the within-cell
    Arrow matmul (one FlatMapGroupsInPandas per (blk, cell) group) —
    never a corpus-side broadcast or a cartesian join. Assignment is a
    map-side argmax against the driver-collected centroid matrix."""
    import math

    rows = [
        (i, [math.cos(i / 40.0), math.sin(i / 40.0), 0.0], 0)
        for i in range(300)
    ]
    rows += [(900, [1.0, 0.0, 0.0], 0), (901, [2.0, 0.0, 0.0], 0)]
    df = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, label INT"
    )
    guarded = dedup.embedding_neardup_pairs(
        df, "vec_id", "embedding", "label",
        threshold=0.9999, max_exact_rows=100, n_cells=4,
    )
    rows_out = guarded.collect()
    plan = _plan_str(guarded)
    # the quadratic stage is the grouped Arrow matmul, keyed on (blk, cell)
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    found = {(r["doc_a"], r["doc_b"]) for r in rows_out}
    assert (900, 901) in found  # same-direction vectors share a cell
    for a, b in found:
        assert a < b


def test_row_count_hint_skips_path_picking_job(spark):
    """With n_rows_hint supplied, building the guarded dedup DataFrames
    must trigger ZERO Spark jobs (no path-picking count pass); without
    the hint, at least one job runs at build time. Values are identical
    either way."""
    docs = [(i, f"alpha beta gamma delta tok{i}", "x") for i in range(50)]
    ddf = spark.createDataFrame(docs, "doc_id LONG, text STRING, lang STRING")
    vecs = [(i, [float(i % 7), 1.0, 0.5], 0) for i in range(50)]
    vdf = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # embedding path: the hint leaves NOTHING to run at build time
    sc.setJobGroup("hinted-emb", "hint probe")
    hinted_emb = dedup.embedding_neardup_pairs(
        vdf, "vec_id", "embedding", "label", 0.3, n_rows_hint=50
    )
    assert list(tracker.getJobIdsForGroup("hinted-emb")) == []

    # ngram path: the exact tier still runs its (capped, documented)
    # vocabulary probe at build time; the hint must remove exactly the
    # full-input count pass on top of it
    sc.setJobGroup("hinted-ng", "hint probe")
    hinted_ng = dedup.ngram_jaccard_pairs(
        ddf, "doc_id", "text", "lang", 0.5, n_rows_hint=50
    )
    hinted_jobs = len(tracker.getJobIdsForGroup("hinted-ng"))
    sc.setJobGroup("counted-ng", "count probe")
    counted_ng = dedup.ngram_jaccard_pairs(ddf, "doc_id", "text", "lang", 0.5)
    counted_jobs = len(tracker.getJobIdsForGroup("counted-ng"))
    assert counted_jobs > hinted_jobs  # the count pass is gone
    sc.setJobGroup("results", "collect")

    key = lambda r: (r["doc_a"], r["doc_b"], r["jaccard"])  # noqa: E731
    assert sorted(map(key, hinted_ng.collect())) == sorted(
        map(key, counted_ng.collect())
    )
    assert hinted_emb.count() > 0  # hinted embedding path builds and runs


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """1k identical docs collapse into one bucket per band; the capped
    path must emit star pairs (O(B)) instead of all pairs (O(B^2)),
    keeping every member connected to the representative."""
    docs = [(i, "same exact text repeated many times over", "x") for i in range(1000)]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING, lang STRING")
    sigs = dedup.minhash_signatures(df, "doc_id", num_perm=16)
    pairs = dedup.lsh_candidate_pairs(sigs, bands=8, bucket_cap=100)
    got = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    # star: exactly n-1 pairs, all anchored at the representative (min id)
    assert len(got) == 999
    assert all(a == 0 for a, _ in got)
    assert {b for _, b in got} == set(range(1, 1000))
    # under the cap, the same corpus yields all pairs as before
    small = spark.createDataFrame(docs[:20], "doc_id LONG, text STRING, lang STRING")
    sp = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(small, "doc_id", num_perm=16), bands=8
    )
    assert sp.count() == 20 * 19 // 2


def test_hamming_bucket_cap_bounds_degenerate_corpus(spark):
    """1k identical bit-signatures (one viral doc cluster) collapse into
    one bucket per band; the capped hamming path must emit star pairs
    (O(B)) instead of all pairs (O(B^2)), anchored at the representative."""
    sigs = spark.createDataFrame(
        [(i, 0x5A5A5A5A) for i in range(1000)], "doc_id LONG, simhash LONG"
    )
    pairs = dedup.hamming_near_pairs(
        sigs, bits=32, bands=8, max_hamming=3, bucket_cap=100
    )
    got = [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs.collect()]
    assert len(got) == 999
    assert all(a == 0 and h == 0 for a, _, h in got)
    assert {b for _, b, _ in got} == set(range(1, 1000))
    # under the cap, output is unchanged: all pairs survive the verify
    small = spark.createDataFrame(
        [(i, 0x5A5A5A5A) for i in range(20)], "doc_id LONG, simhash LONG"
    )
    assert (
        dedup.hamming_near_pairs(small, bits=32, bands=8, max_hamming=3).count()
        == 20 * 19 // 2
    )


def test_connected_components_chain_clique_singleton(spark):
    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, singleton 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12)],
        "doc_a LONG, doc_b LONG",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "doc_id LONG"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, nodes, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


# ---------------------------------------------------------------------------
# incremental_lsh_neardup
# ---------------------------------------------------------------------------


def test_incremental_matches_full_run_restricted_to_new(docs_with_near_dups):
    """The incremental pass over a batch must find exactly the full-run
    pairs that touch the batch (banding is deterministic, so the candidate
    spaces agree)."""
    docs = docs_with_near_dups
    new_pred = F.col("doc_id") % 5 == 0
    full = dedup.minhash_lsh_dedup(
        docs, "doc_id", "text", num_perm=16, bands=8, threshold=0.5
    )
    expected = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in full.collect()
        if r["doc_a"] % 5 == 0 or r["doc_b"] % 5 == 0
    }
    inc = dedup.incremental_lsh_neardup(
        docs.filter(~new_pred),
        docs.filter(new_pred),
        "doc_id",
        "text",
        num_perm=16,
        bands=8,
        threshold=0.5,
    )
    got = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in inc.collect()}
    assert got == expected
    assert got  # 9000/9001 planted dups make the batch side non-trivial


def test_incremental_accepts_persisted_signature_store(docs_with_near_dups):
    """Passing a precomputed signature store must not change the result
    (the store is exactly minhash_signatures of the base side)."""
    docs = docs_with_near_dups
    new_pred = F.col("doc_id") % 5 == 0
    base = docs.filter(~new_pred)
    new = docs.filter(new_pred)
    kw = dict(num_perm=16, bands=8, threshold=0.5)
    store = dedup.minhash_signatures(base, "doc_id", "text", 16).localCheckpoint()
    with_store = dedup.incremental_lsh_neardup(
        base, new, "doc_id", "text", base_sigs=store, **kw
    )
    without = dedup.incremental_lsh_neardup(base, new, "doc_id", "text", **kw)
    assert sorted(map(tuple, with_store.collect())) == sorted(
        map(tuple, without.collect())
    )


# ---------------------------------------------------------------------------
# SRP embedding signatures
# ---------------------------------------------------------------------------


def test_srp_signature_deterministic_and_locality(spark):
    """Identical vectors share a signature; a tiny perturbation flips at
    most a few bits; an orthogonal-ish vector differs in many."""
    base = [0.5, -1.0, 0.25, 2.0] * 4  # dim 16
    near = list(base)
    near[0] += 0.001
    far = [-x for x in base]
    df = spark.createDataFrame(
        [(0, base), (1, list(base)), (2, near), (3, far)],
        "vec_id long, embedding array<float>",
    )
    sig = {r["vec_id"]: r["srp_sig"] for r in similarity.srp_signatures(
        df, bits=32).collect()}
    again = {r["vec_id"]: r["srp_sig"] for r in similarity.srp_signatures(
        df, bits=32).collect()}
    assert sig == again  # deterministic planes (md5-derived)
    assert sig[0] == sig[1]  # identical input, identical signature
    assert bin(sig[0] ^ sig[2]).count("1") <= 3  # near vector ~ near bits
    # negation lands on the opposite side of EVERY hyperplane
    assert bin(sig[0] ^ sig[3]).count("1") == 32


def test_srp_banded_pairs_equal_bruteforce(spark):
    """hamming_near_pairs over SRP signatures is EXACT (pigeonhole): the
    banded join must return precisely the brute-force hamming<=k set."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, v))
        if i % 10 == 0:  # planted near-dup partner
            rows.append((1000 + i, [x + rng.uniform(-0.01, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sigs = similarity.srp_signatures(df, bits=32).localCheckpoint()
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.hamming_near_pairs(
            sigs, bits=32, bands=8, max_hamming=7,
            id_col="vec_id", sig_col="srp_sig",
        ).collect()
    }
    sv = {r["vec_id"]: r["srp_sig"] for r in sigs.collect()}
    ids = sorted(sv)
    brute = {
        (a, b, bin(sv[a] ^ sv[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sv[a] ^ sv[b]).count("1") <= 7
    }
    assert got == brute
    assert any(b == 1000 + a for a, b, _ in got)  # planted partners found


def test_srp_wide_words_extend_scalar_signature(spark):
    """The 128-bit word signature's low 32 bits equal the 32-bit scalar
    signature (same md5-seeded planes, j-indexed), and the wide banded
    path in a pigeonhole-exact config returns precisely the brute-force
    hamming<=k set over the word signatures."""
    import random

    rng = random.Random(23)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(16)]
        rows.append((i, v))
        if i % 10 == 0:
            rows.append((1000 + i, [x + rng.uniform(-0.005, 0.005) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    scalar = {
        r["vec_id"]: r["srp_sig"]
        for r in similarity.srp_signatures(df, bits=32).collect()
    }
    wide = {
        r["vec_id"]: r["srp_words"]
        for r in similarity.srp_signature_words(df, bits=128).collect()
    }
    assert all(len(w) == 2 for w in wide.values())
    for i, w in wide.items():
        assert w[0] & 0xFFFFFFFF == scalar[i]
    # pigeonhole-exact config over words: banded == brute force
    sigs = similarity.srp_signature_words(df, bits=128).localCheckpoint()
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.hamming_near_pairs_words(
            sigs, bits=128, bands=16, max_hamming=15, id_col="vec_id"
        ).collect()
    }

    def ham(a, b):
        return sum(
            bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
            for x, y in zip(wide[a], wide[b])
        )

    ids = sorted(wide)
    brute = {
        (a, b, ham(a, b))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ham(a, b) <= 15
    }
    assert got == brute
    assert any(b == 1000 + a for a, b, _ in got)


def test_srp_wide_band_selectivity_grows_past_scalar_cap(spark):
    """The scale rationale for wide signatures, measured: 32-bit/8-band
    slices top out at 2^4=16 bucket values per band, so bucket sizes grow
    linearly with the corpus; 128-bit/8-band slices (16-bit values) keep
    splitting. Assert the wide path's distinct bucket count per band
    blows past the scalar cap on a corpus of ~1k random vectors."""
    import random

    rng = random.Random(7)
    df = spark.createDataFrame(
        [
            (i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(1000)
        ],
        "vec_id long, embedding array<float>",
    )
    scalar_sigs = similarity.srp_signatures(df, bits=32).localCheckpoint()
    wide_sigs = similarity.srp_signature_words(df, bits=128).localCheckpoint()
    sv = [r["srp_sig"] for r in scalar_sigs.collect()]
    wv = [r["srp_words"] for r in wide_sigs.collect()]
    # band 0 value sets: scalar = low 4 bits, wide = low 16 bits of word 0
    scalar_buckets = {s & 0xF for s in sv}
    wide_buckets = {w[0] & 0xFFFF for w in wv}
    assert len(scalar_buckets) <= 16  # structurally capped
    assert len(wide_buckets) > 16  # keeps splitting as the corpus grows
    # max bucket size shrinks accordingly (the quadratic-join risk metric)
    from collections import Counter

    worst_scalar = max(Counter(s & 0xF for s in sv).values())
    worst_wide = max(Counter(w[0] & 0xFFFF for w in wv).values())
    assert worst_wide * 4 < worst_scalar


def test_keep_canonical_best_score_per_cluster(spark):
    """keep_canonical keeps exactly one doc per component — the highest
    score, ties broken by lowest id — and labels every input row with its
    cluster, size, and canonical flag."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    docs = spark.createDataFrame(
        [
            (1, 0.5), (2, 0.9), (3, 0.9),   # cluster 1: tie 2 vs 3 -> 2
            (10, 0.1), (11, 0.2),            # cluster 10: 11 wins
            (99, 0.7),                       # singleton: itself
        ],
        "doc_id LONG, score DOUBLE",
    )
    rows = dedup.keep_canonical(docs, pairs, "doc_id", "score").collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 6
    assert {i for i, r in by_id.items() if r["is_canonical"] == 1} == {2, 11, 99}
    assert by_id[3]["cluster_id"] == 1 and by_id[3]["cluster_size"] == 3
    assert by_id[10]["cluster_id"] == 10 and by_id[10]["cluster_size"] == 2
    assert by_id[99]["cluster_size"] == 1


def test_drop_duplicate_spans_semantics(spark):
    # doc 1 owns both spans; doc 2 repeats doc 1's first span (dropped)
    # then has a fresh one; doc 3 is pure boilerplate -> empty clean_text
    a = "a b c d e"  # one 5-token span
    b = "f g h i j"
    c = "k l m n o"
    df = spark.createDataFrame(
        [(1, f"{a} {b}"), (2, f"{a} {c}"), (3, f"{a} {b}")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_dropped"])
        for r in dedup.drop_duplicate_spans(
            df, "doc_id", "text", span_tokens=5
        ).collect()
    }
    assert got[1] == (f"{a} {b}", 2, 0)  # first occurrence keeps everything
    assert got[2] == (c, 2, 1)
    assert got[3] == ("", 2, 2)  # fully-duplicated doc still emits a row


def test_drop_duplicate_spans_unaligned_offset(spark):
    """A passage duplicated at a +1-token offset inside an otherwise
    distinct document is caught by the k-gram-anchor mode (and provably
    invisible to aligned-only detection)."""
    passage = "p1 p2 p3 p4 p5"  # 5 tokens = one span at k=5
    # doc 1 contains the passage span-aligned; doc 2 embeds it shifted by
    # one token ("x" prefix), doc 3 repeats it span-aligned again
    df = spark.createDataFrame(
        [
            (1, f"{passage} t1 t2 t3 t4 t5"),
            (2, f"x {passage} u1 u2 u3 u4"),
            (3, f"{passage} v1 v2 v3 v4 v5"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_dropped"])
        for r in dedup.drop_duplicate_spans(
            df, "doc_id", "text", span_tokens=5
        ).collect()
    }
    assert got[1] == (f"{passage} t1 t2 t3 t4 t5", 0)
    # doc 2's aligned spans ("x p1 p2 p3 p4", "p5 u1 u2 u3 u4") are unique
    # strings — untouched; but doc 3's span-aligned copy of the passage is
    # dropped because the content's first occurrence is doc 1's anchor
    assert got[2][1] == 0
    assert got[3] == ("v1 v2 v3 v4 v5", 1)

    # same corpus where only doc 2 (the +1-offset copy) precedes doc 3:
    # doc 3's aligned span must STILL be dropped — its content appeared
    # earlier solely as an UNALIGNED anchor inside doc 2. This is exactly
    # the pair the aligned-only mode cannot see.
    df2 = spark.createDataFrame(
        [
            (2, f"x {passage} u1 u2 u3 u4"),
            (3, f"{passage} v1 v2 v3 v4 v5"),
        ],
        "doc_id LONG, text STRING",
    )
    anchored = {
        r["doc_id"]: r["n_dropped"]
        for r in dedup.drop_duplicate_spans(
            df2, "doc_id", "text", span_tokens=5
        ).collect()
    }
    assert anchored == {2: 0, 3: 1}
    aligned_only = {
        r["doc_id"]: r["n_dropped"]
        for r in dedup.drop_duplicate_spans(
            df2, "doc_id", "text", span_tokens=5, anchor_unaligned=False
        ).collect()
    }
    assert aligned_only == {2: 0, 3: 0}  # the documented blind spot


def test_drop_duplicate_spans_identity_when_unique(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(13))) for i in range(20)],
        "doc_id LONG, text STRING",
    )
    out = dedup.drop_duplicate_spans(df, "doc_id", "text", span_tokens=5)
    rows = out.collect()
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    assert all(r["n_dropped"] == 0 for r in rows)
    # span partition + reassembly is the identity on duplicate-free text,
    # including the partial trailing span (13 = 5 + 5 + 3 tokens)
    assert all(r["clean_text"] == orig[r["doc_id"]] for r in rows)


def test_connected_components_long_path_converges_logarithmically(spark):
    """The alternating large-star/small-star loop must converge in
    O(log n) rounds on a path graph — plain min-label propagation would
    need O(diameter) = 255 rounds here, so max_iter=12 proves the star
    variant is actually doing the diameter-halving."""
    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a LONG, doc_b LONG"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id LONG")
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(
            pairs, nodes, "doc_id", max_iter=12
        ).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_connected_components_reversed_and_shuffled_edges(spark):
    """Orientation and order of the input pairs must not matter."""
    pairs = spark.createDataFrame(
        [(7, 3), (3, 9), (9, 7), (2, 1), (1, 2)], "doc_a LONG, doc_b LONG"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 7, 9, 42]], "doc_id LONG"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, nodes, "doc_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 7: 3, 9: 3, 42: 42}


def test_train_ivf_centroids_pinned_for_fixed_seed(spark):
    """Determinism guard for the s02 oracle: the embedded-centroid DuckDB
    twin is only value-exact if Spark ML k-means reproduces these exact
    float32 centroids for seed=7 on sf0.001 embeddings. If a Spark
    version bump shifts k-means|| behavior, this pin fails loudly instead
    of the oracle silently drifting."""
    import hashlib

    emb = read_table(spark, SF, "embeddings")
    cent = similarity.train_ivf_centroids(emb, k=10, seed=7)
    rows = [
        (int(r["centroid_id"]), [float(x) for x in r["embedding"]])
        for r in cent.orderBy("centroid_id").collect()
    ]
    assert hashlib.md5(repr(rows).encode()).hexdigest() == (
        "3f2978b80c9a0138a5a08fca38eb229d"
    )


def test_simhash_words_deterministic_and_near_for_dups(docs_with_near_dups):
    """128-bit wide SimHash: deterministic, identical docs hash equal,
    near-duplicates land within a small hamming distance, and the banded
    wide pair join finds them."""
    docs = docs_with_near_dups
    sigs = dedup.simhash_words(docs, "doc_id", "text", bits=128)
    vals = {r["doc_id"]: tuple(r["simhash_words"]) for r in sigs.collect()}
    again = {
        r["doc_id"]: tuple(r["simhash_words"])
        for r in dedup.simhash_words(docs, "doc_id", "text", bits=128).collect()
    }
    assert vals == again
    assert all(len(v) == 2 for v in vals.values())
    # exact copies (the fixture plants copies of doc 0 at high ids)
    pairs = dedup.hamming_near_pairs_words(
        sigs, bits=128, bands=16, max_hamming=12, sig_col="simhash_words"
    )
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    # brute-force twin on the collected signatures
    def ham(a, b):
        return sum(bin((x ^ y) & (2**64 - 1)).count("1") for x, y in zip(a, b))
    expected = {
        (i, j): ham(vals[i], vals[j])
        for i in vals for j in vals
        if i < j and ham(vals[i], vals[j]) <= 12
    }
    assert got == expected


def test_srp_words_matmul_expr_parity(spark):
    """The Arrow-matmul and pure-expression wide-SRP paths must be
    bit-identical — both are exact int64 arithmetic, so this is an
    equality, not a tolerance."""
    emb = read_table(spark, SF, "embeddings")
    a = {
        r["vec_id"]: tuple(r["srp_words"])
        for r in similarity.srp_signature_words(emb, bits=128, impl="expr").collect()
    }
    b = {
        r["vec_id"]: tuple(r["srp_words"])
        for r in similarity.srp_signature_words(emb, bits=128, impl="matmul").collect()
    }
    assert a == b


def test_simhash_words_vectorized_expr_parity(spark):
    """The Arrow-vectorized and explode+agg wide-SimHash paths must be
    bit-identical (both integer-exact over the same md5 slices)."""
    docs = read_table(spark, SF, "documents").limit(300)
    a = {
        r["doc_id"]: tuple(r["simhash_words"])
        for r in dedup.simhash_words(docs, "doc_id", "text", impl="expr").collect()
    }
    b = {
        r["doc_id"]: tuple(r["simhash_words"])
        for r in dedup.simhash_words(docs, "doc_id", "text", impl="vectorized").collect()
    }
    assert a == b


def test_ivf_index_probe_partition_pruned(spark, tmp_path):
    """Disk-resident IVF: the probe must (a) return exactly what the
    in-memory ivf_topk returns for the same assignment, and (b) scan
    ONLY the probed cell partitions — static partition pruning visible
    in the physical plan."""
    emb = read_table(spark, SF, "embeddings")
    cent = similarity.train_ivf_centroids(emb, k=10, seed=7)
    assigned = similarity.assign_ivf_cells(emb, cent)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(assigned, path)

    queries = emb.filter(F.col("vec_id") < 5)
    got = similarity.probe_ivf_index(
        spark, path, cent, queries, k=5, n_probe=3
    )
    expected = similarity.ivf_topk(assigned, cent, queries, k=5, n_probe=3)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )

    # pruning: the scan plan carries a partition filter on cell, and the
    # number of selected partitions is bounded by the probed cells
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_containment_pairs_embedded_doc(spark):
    """A short doc fully embedded inside a longer host must emit
    contained=1 with overlap 1.0; unrelated docs emit nothing; the
    max_shingle_df guard drops boilerplate-driven pairs."""
    from pw_etl_scrumptious_squad_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon zeta eta theta"
    host = "intro words here " + quote + " closing commentary tail words"
    rows = [
        (1, quote),
        (2, host),
        (3, "completely different content with other tokens entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = dedup.containment_pairs(df, threshold=0.8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"], r["contained"]) == (1, 2, 1)
    assert r["overlap_coef"] == 1.0
    # guard tier: dropping every shingle seen in >1 doc kills the pair
    got2 = dedup.containment_pairs(df, threshold=0.8, max_shingle_df=1).collect()
    assert got2 == []


def test_embedding_decontaminate_flags_near_copies(spark):
    """A corpus vector equal to an eval vector is contaminated with
    cos_ppb == 1e9; an orthogonal one is not; best_eval_id is the argmax
    with deterministic tie-break."""
    from pw_etl_scrumptious_squad_spark.operators import curation

    ev = [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0, 0.0])]
    corpus = [
        (1, [1.0, 0.0, 0.0, 0.0]),      # copy of eval 100
        (2, [0.0, 0.0, 1.0, 0.0]),      # orthogonal to both
        (3, [0.6, 0.8, 0.0, 0.0]),      # closer to 200 (0.8) than 100 (0.6)
    ]
    schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    got = {
        r["vec_id"]: r
        for r in curation.embedding_decontaminate(
            spark.createDataFrame(corpus, schema),
            spark.createDataFrame(ev, schema),
        ).collect()
    }
    assert got[1]["best_eval_id"] == 100
    assert got[1]["cos_ppb"] == 1_000_000_000
    assert got[1]["contaminated"] == 1
    assert got[2]["contaminated"] == 0 and got[2]["cos_ppb"] == 0
    assert got[3]["best_eval_id"] == 200 and got[3]["contaminated"] == 0


def test_ivfpq_index_roundtrip_pruned_and_recall(spark, tmp_path):
    """Composed IVF-PQ (round 7): (a) the disk probe returns exactly
    what the in-memory ivfpq_topk returns for the same assignment and
    codebooks; (b) the code scan is partition-pruned to the probed
    cells; (c) recall vs the exact brute-force top-k clears a floor
    despite double approximation (cell pruning + quantization): pure PQ
    at 8x64 measures ~0.4 on these weak-neighbor-structure synthetic
    vectors (test_pq_adc_recall_sanity) and 3/10-cell IVF pruning
    multiplies in, so the floor is 'well above the ~0.01 chance
    overlap', not 'high'."""
    emb = read_table(spark, SF, "embeddings")
    cent = similarity.train_ivf_centroids(emb, k=10, seed=7)
    cb = similarity.train_pq_codebooks(emb, m=8, ksub=64)
    assigned = similarity.assign_ivf_cells(emb, cent)
    path = str(tmp_path / "ivfpq_index")
    similarity.write_ivfpq_index(assigned, cb, path)

    queries = emb.filter(F.col("vec_id") < 10)
    got = similarity.probe_ivfpq_index(
        spark, path, cent, cb, queries, k=5, n_probe=3
    )
    codes = similarity.pq_encode(emb, cb).join(
        assigned.select("vec_id", "cell"), "vec_id"
    )
    expected = similarity.ivfpq_topk(
        codes, cent, cb, queries, k=5, n_probe=3
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )

    # (b) static partition pruning on the code scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]
    # the disk layout stores codes only — never raw vectors
    import os
    files = []
    for root, _dirs, names in os.walk(path):
        files += [os.path.join(root, f) for f in names if f.endswith(".parquet")]
    import pyarrow.parquet as pq
    cols = set(pq.ParquetFile(files[0]).schema_arrow.names)
    assert "embedding" not in cols and {"vec_id", "sub", "code"} <= cols

    # (c) recall floor vs exact brute force
    exact = similarity.cosine_topk_bruteforce(emb, queries, k=5)
    exact_set = {(r["query_id"], r["match_id"]) for r in exact.collect()}
    got_set = {(r["query_id"], r["match_id"]) for r in got.collect()}
    recall = len(exact_set & got_set) / len(exact_set)
    assert recall >= 0.15, recall


def test_assign_ivf_cells_matmul_parity(spark):
    """The matmul assignment tier must agree cell-for-cell with the
    oracle-checked expression form (argmax first-max + ascending cell
    order == max_by ties-to-lowest-cell) on real data and on trained
    centroids."""
    emb = read_table(spark, SF, "embeddings")
    for cent in (
        emb.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        ),
        similarity.train_ivf_centroids(emb, k=10, seed=7),
    ):
        a = {
            r["vec_id"]: r["cell"]
            for r in similarity.assign_ivf_cells(emb, cent).collect()
        }
        b = {
            r["vec_id"]: r["cell"]
            for r in similarity.assign_ivf_cells_matmul(emb, cent).collect()
        }
        assert a == b


def test_star_identical_cluster_equivalence(spark):
    """star_identical=True must yield the SAME connected components /
    canonical picks as the full pair list (hamming-0 classes collapse
    to stars losslessly; cross-class near pairs connect through the
    representatives) while emitting far fewer pairs on duplicate-heavy
    corpora."""
    from pw_etl_scrumptious_squad_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "t" * (5 + i % 9)) for i in range(120)],
        "doc_id LONG, text STRING",
    )
    media = mm.synthetic_ppm_mirrored(docs, mirror_groups=6)
    hashes = mm.image_dhash(media).select(
        F.col("asset_id").alias("doc_id"), "dhash"
    )
    full = dedup.hamming_near_pairs(
        hashes, bits=64, bands=8, max_hamming=4, sig_col="dhash"
    )
    starred = dedup.hamming_near_pairs(
        hashes, bits=64, bands=8, max_hamming=4, sig_col="dhash",
        star_identical=True,
    )
    n_full, n_star = full.count(), starred.count()
    assert n_star < n_full  # 20-doc identical classes: 190 pairs -> 19
    nodes = docs.select("doc_id")
    lab_full = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(full, nodes).collect()
    }
    lab_star = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(starred, nodes).collect()
    }
    assert lab_full == lab_star


def test_incremental_cc_equals_full_recompute(spark):
    """Round-8 incremental CC: every merge topology folds into existing
    labels identically to a full recompute — cross-component merge,
    intra-component no-op edge, a chain through a NEW node joining two
    old components, a brand-new pair, an isolated new node, and an
    empty batch."""
    from pw_etl_scrumptious_squad_spark.operators import dedup

    base_nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 5, 6, 10, 30, 31]], "doc_id LONG"
    )
    base_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (30, 31)], "doc_a LONG, doc_b LONG"
    )
    base = dedup.connected_components(base_pairs, base_nodes, "doc_id")
    assert {r["node"]: r["cluster_id"] for r in base.collect()} == {
        1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 10: 10, 30: 30, 31: 30,
    }

    new_nodes = spark.createDataFrame(
        [(i,) for i in [20, 21, 22, 40]], "doc_id LONG"
    )
    new_edges = spark.createDataFrame(
        [
            (3, 5),    # merges components {1,2,3} and {5,6}
            (1, 2),    # intra-component no-op
            (20, 21),  # brand-new pair
            (6, 22),   # new node joins the merged component
            (22, 10),  # ...and chains it to old singleton 10
        ],
        "doc_a LONG, doc_b LONG",
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in dedup.incremental_connected_components(
            base, new_edges, new_nodes=new_nodes
        ).collect()
    }
    # full recompute over the union graph
    all_nodes = base_nodes.unionByName(new_nodes)
    all_pairs = base_pairs.unionByName(new_edges)
    want = {
        r["node"]: r["cluster_id"]
        for r in dedup.connected_components(
            all_pairs, all_nodes, "doc_id"
        ).collect()
    }
    assert got == want
    assert got[22] == 1 and got[10] == 1 and got[6] == 1  # chained merge
    assert got[20] == 20 and got[21] == 20                # new pair
    assert got[40] == 40                                  # isolated new
    assert got[30] == 30 and got[31] == 30                # untouched

    # empty batch: labels unchanged, new node labels itself
    empty = spark.createDataFrame([], "doc_a LONG, doc_b LONG")
    got2 = {
        r["node"]: r["cluster_id"]
        for r in dedup.incremental_connected_components(
            base, empty, new_nodes=spark.createDataFrame([(99,)], "doc_id LONG")
        ).collect()
    }
    assert got2 == {**{r["node"]: r["cluster_id"] for r in base.collect()}, 99: 99}


# ---------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2022 ExactSubstr) — round 9
# ---------------------------------------------------------------------------


def _brute_exactsubstr(docs: dict[int, str], k: int) -> dict[int, str]:
    """Reference semantics, spelled naively: mask every character
    covered by a k-window whose content occurs earlier in (doc_id, pos)
    order; splice masked characters out."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(docs):
        t = docs[d]
        for p in range(len(t) - k + 1):
            occ.setdefault(t[p : p + k], []).append((d, p))
    masked: dict[int, set[int]] = {}
    for lst in occ.values():
        if len(lst) > 1:
            for d, p in sorted(lst)[1:]:
                masked.setdefault(d, set()).update(range(p, p + k))
    return {
        d: "".join(ch for i, ch in enumerate(t) if i not in masked.get(d, set()))
        for d, t in docs.items()
    }


def _run_exactsubstr(spark, docs: dict[int, str], k: int, fn) -> dict[int, str]:
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id LONG, text STRING"
    )
    return {r["doc_id"]: r["clean_text"] for r in fn(df, k=k).collect()}


def test_exact_substring_dedup_matches_brute_force(spark):
    docs = {
        # 1 is the first occurrence of the shared sentence -> untouched
        1: "the quick brown fox jumps over the lazy dog near the river bank",
        # 2 repeats that whole sentence inside other text -> spliced out
        2: "PREFIX the quick brown fox jumps over the lazy dog near the river bank SUFFIX",
        # 3 is a verbatim copy of 1 -> fully removed
        3: "the quick brown fox jumps over the lazy dog near the river bank",
        # 4 shares nothing long enough
        4: "completely different content that appears only once in this corpus",
        # 5 shorter than k -> untouched by construction
        5: "tiny",
        # 6 periodic self-overlap inside ONE doc
        6: "ab" * 40,
    }
    k = 20
    want = _brute_exactsubstr(docs, k)
    got = _run_exactsubstr(spark, docs, k, dedup.exact_substring_dedup)
    assert got == want
    assert got[1] == docs[1]          # first occurrence kept verbatim
    assert got[3] == ""               # exact copy fully removed
    assert "quick brown" not in got[2]  # the repeated span left doc 2
    assert got[2].startswith("PREFIX ") and got[2].endswith(" SUFFIX")
    assert got[4] == docs[4]
    assert got[5] == docs[5]


def test_exact_substring_sa_tier_is_output_identical(spark):
    docs = {
        1: "shared shared shared payload one two three four five six seven",
        2: "noise shared shared shared payload one two three four five six seven tail",
        3: "x" * 15,
        4: "shared shared shared payload one two three four five six seven",
        5: "unique text with no duplicated window at all in this tiny corpus",
    }
    k = 25
    want = _brute_exactsubstr(docs, k)
    # both tiers, including a shard count that splits the corpus so
    # cross-shard duplicates exercise the digest merge
    got_gram = _run_exactsubstr(spark, docs, k, dedup.exact_substring_dedup)
    got_sa = _run_exactsubstr(
        spark, docs, k,
        lambda df, k: dedup.exact_substring_dedup_sa(df, k=k, num_shards=3),
    )
    assert got_gram == want
    assert got_sa == want


def test_exact_substring_dedup_fuzz_small_alphabet(spark):
    """Adversarial fuzz: random low-alphabet corpora maximize overlap
    pathologies (periodicity, nested repeats, cross-doc chains); both
    tiers must equal the brute-force twin on every one."""
    import random

    rng = random.Random(90210)
    for trial in range(4):
        docs = {
            d: "".join(rng.choice("abc ") for _ in range(rng.randint(0, 60)))
            for d in range(rng.randint(2, 8))
        }
        k = rng.randint(3, 8)
        want = _brute_exactsubstr(docs, k)
        got = _run_exactsubstr(spark, docs, k, dedup.exact_substring_dedup)
        assert got == want, (trial, k, docs)
        got_sa = _run_exactsubstr(
            spark, docs, k,
            lambda df, k: dedup.exact_substring_dedup_sa(df, k=k, num_shards=2),
        )
        assert got_sa == want, (trial, k, docs)
