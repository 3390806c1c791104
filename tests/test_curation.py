"""Unit/property tests for operators/curation.py (decontamination,
stratified sampling, repetition metrics, int8 quantization) on small
synthetic frames — semantics the sf-oracle parity tests can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_flags_planted_overlap(spark):
    eval_docs = _docs(
        spark, [(100, "alpha beta gamma delta epsilon zeta eta theta", "en")]
    )
    corpus = _docs(
        spark,
        [
            # contains the full 8-token eval shingle verbatim
            (1, "x alpha beta gamma delta epsilon zeta eta theta y", "en"),
            # shares tokens but no 8-token shingle
            (2, "alpha beta gamma something else entirely here now", "en"),
            (3, "totally unrelated text with no overlap at all", "en"),
        ],
    )
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in curation.decontaminate(
            corpus, eval_docs, shingle_size=8, min_overlap=1
        ).collect()
    }
    assert out[1][0] >= 1 and out[1][1] is True
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    # every corpus doc gets a row (left join keeps clean docs)
    assert set(out) == {1, 2, 3}


def test_decontaminate_min_overlap_threshold(spark):
    eval_docs = _docs(spark, [(100, "a b c d e f g h i j", "en")])
    # doc 1 contains two distinct eval shingles, doc 2 exactly one
    corpus = _docs(
        spark,
        [
            (1, "a b c d e f g h i j", "en"),
            (2, "z a b c d e f g h z", "en"),
        ],
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in curation.decontaminate(
            corpus, eval_docs, shingle_size=8, min_overlap=2
        ).collect()
    }
    assert out[1] is True
    assert out[2] is False


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------


def test_stratified_sample_deterministic_and_rate(spark):
    n = 2000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    rates = {"en": 0.5, "zh": 0.0}
    a = curation.stratified_sample(df, "lang", rates, "doc_id", "s1")
    b = curation.stratified_sample(df, "lang", rates, "doc_id", "s1")
    rows_a = sorted(r["doc_id"] for r in a.collect())
    rows_b = sorted(r["doc_id"] for r in b.collect())
    assert rows_a == rows_b  # same seed -> byte-identical sample
    assert all(i % 2 == 0 for i in rows_a)  # zh rate 0 drops every odd id
    # md5 draw is uniform: expect ~500 of the 1000 en docs (binomial
    # 6-sigma bound ~ +/-95)
    assert 400 <= len(rows_a) <= 600
    # a different seed yields a different (but same-rate) sample
    c = curation.stratified_sample(df, "lang", rates, "doc_id", "s2")
    assert sorted(r["doc_id"] for r in c.collect()) != rows_a


def test_stratified_sample_default_rate_drops_unknown_strata(spark):
    df = _docs(spark, [(1, "t", "xx"), (2, "t", "en")])
    out = curation.stratified_sample(df, "lang", {"en": 1.0}, "doc_id", "s")
    assert [r["doc_id"] for r in out.collect()] == [2]


# ---------------------------------------------------------------------------
# repetition_metrics
# ---------------------------------------------------------------------------


def test_repetition_metrics_degenerate_and_clean(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam spam", "en"),  # all bigrams identical
            (2, "one two three four five", "en"),  # no repeats
            (3, "hi", "en"),  # shorter than any n-gram
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in curation.repetition_metrics(df, ns=(2, 3)).collect()
    }
    # doc 1: 4 bigrams, all "spam spam" -> 100% dup mass
    assert out[1]["dup_2gram_ppm"] == 1_000_000
    assert out[1]["max_2gram_count"] == 4
    assert out[1]["dup_3gram_ppm"] == 1_000_000
    # doc 2: all n-grams unique
    assert out[2]["dup_2gram_ppm"] == 0
    assert out[2]["max_2gram_count"] == 1
    # doc 3: no n-grams at all -> zero-filled, still present
    assert out[3]["dup_2gram_ppm"] == 0
    assert out[3]["max_3gram_count"] == 0


def test_repetition_metrics_partial_duplication_exact_ppm(spark):
    # tokens a b a b c -> bigrams: "a b","b a","a b","b c"; "a b" twice
    # dup mass 2 of 4 -> exactly 500000 ppm
    df = _docs(spark, [(1, "a b a b c", "en")])
    row = curation.repetition_metrics(df, ns=(2,)).collect()[0]
    assert row["dup_2gram_ppm"] == 500_000
    assert row["max_2gram_count"] == 2


# ---------------------------------------------------------------------------
# quantize_embeddings
# ---------------------------------------------------------------------------


def test_quantize_embeddings_roundtrip_bound_and_range(spark):
    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.001, 0.002, -0.003, 0.004]),
            (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in curation.quantize_embeddings(df).collect()}
    for vid, vec in [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.001, 0.002, -0.003, 0.004])]:
        scale = out[vid]["scale"]
        codes = [int(c) for c in out[vid]["codes_csv"].split(",")]
        assert scale == pytest.approx(max(abs(x) for x in vec) / 127.0)
        assert all(-127 <= c <= 127 for c in codes)
        # dequantization error bounded by half a quantization step
        for c, x in zip(codes, vec):
            assert abs(c * scale - x) <= scale / 2 + 1e-12
        # the max-|v| component maps to exactly +/-127
        assert max(abs(c) for c in codes) == 127
    # zero vector: scale 0, all codes 0, no NaN/NULL
    assert out[3]["scale"] == 0.0
    assert out[3]["codes_csv"] == "0,0,0,0"


# ---------------------------------------------------------------------------
# pack_chunks
# ---------------------------------------------------------------------------


def test_pack_chunks_greedy_boundaries_cross_doc(spark):
    # one 'en' stream: sizes 30,30,30 -> bins [0,0,|1]; then doc 2 joins
    # the same stream: 50 -> overflows fill 30 -> bin 2; 10 -> fits bin 2
    chunks = spark.createDataFrame(
        [
            ("en", 1, 0, 30),
            ("en", 1, 1, 30),
            ("en", 1, 2, 30),
            ("en", 2, 0, 50),
            ("en", 2, 1, 10),
            ("zh", 3, 0, 70),  # separate stream: bins restart at 0
        ],
        "lang string, doc_id bigint, chunk_idx int, n_chunk_tokens int",
    )
    out = {
        (r["lang"], r["doc_id"], r["chunk_idx"]): (r["bin_id"], r["bin_fill"])
        for r in curation.pack_chunks(
            chunks, budget=64, stream_col="lang"
        ).collect()
    }
    assert out[("en", 1, 0)] == (0, 30)
    assert out[("en", 1, 1)] == (0, 60)
    assert out[("en", 1, 2)] == (1, 30)
    assert out[("en", 2, 0)] == (2, 50)
    assert out[("en", 2, 1)] == (2, 60)
    assert out[("zh", 3, 0)] == (0, 70)  # oversized chunk gets its own bin


def test_pack_chunks_never_splits_and_respects_budget(spark):
    import random

    rng = random.Random(7)
    rows = [
        ("s", i // 4, i % 4, rng.randint(1, 32)) for i in range(200)
    ]
    chunks = spark.createDataFrame(
        rows, "lang string, doc_id bigint, chunk_idx int, n_chunk_tokens int"
    )
    out = curation.pack_chunks(chunks, budget=64, stream_col="lang").collect()
    assert len(out) == 200  # every chunk assigned exactly once
    fills = {}
    for r in out:
        fills[r["bin_id"]] = max(fills.get(r["bin_id"], 0), r["bin_fill"])
    assert all(f <= 64 for f in fills.values())  # no bin over budget
    # greedy tightness: no bin (except possibly the last) could have
    # absorbed the FIRST chunk of the next bin
    ordered = sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"]))
    for prev, cur in zip(ordered, ordered[1:]):
        if cur["bin_id"] == prev["bin_id"] + 1 and cur["bin_fill"] == cur["n_chunk_tokens"]:
            assert prev["bin_fill"] + cur["n_chunk_tokens"] > 64


# ---------------------------------------------------------------------------
# top_k_per_group
# ---------------------------------------------------------------------------


def test_top_k_per_group_matches_naive_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = [(f"g{i % 7}", i, rng.random()) for i in range(500)]
    # skewed group: one domain with 10x the rows of the others
    rows += [("viral", 10_000 + i, rng.random()) for i in range(700)]
    df = spark.createDataFrame(rows, "grp string, id bigint, score double")
    order = [F.desc("score"), F.asc("id")]
    got = sorted(
        (r["grp"], r["id"], r["rnk"])
        for r in curation.top_k_per_group(df, "grp", 5, order).collect()
    )
    w = Window.partitionBy("grp").orderBy(*order)
    naive = sorted(
        (r["grp"], r["id"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 5)
        .collect()
    )
    assert got == naive
    assert len(got) == 8 * 5  # every group capped at exactly k


def test_top_k_per_group_local_prune_in_plan(spark):
    """The two-phase shape must be visible in the plan: a window keyed by
    SPARK_PARTITION_ID before the per-group window."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        F.col("id"),
        F.rand(1).alias("score"),
    )
    plan = curation.top_k_per_group(
        df, "grp", 3, [F.desc("score"), F.asc("id")]
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan


# ---------------------------------------------------------------------------
# merge_aggregates (incremental view maintenance)
# ---------------------------------------------------------------------------


def test_merge_aggregates_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    rows = [(i % 5, float(i), i) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, amt double, seq int")

    def partial(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("amt").alias("total"),
            F.min("amt").alias("lo"),
            F.max("amt").alias("hi"),
        )

    merged = curation.merge_aggregates(
        partial(df.filter(F.col("seq") < 60)),
        partial(df.filter(F.col("seq") >= 60)),
        ["k"],
        {"n": "count", "total": "sum", "lo": "min", "hi": "max"},
    )
    got = sorted(map(tuple, merged.collect()))
    full = sorted(map(tuple, partial(df).collect()))
    assert got == full


def test_merge_aggregates_rejects_non_algebraic(spark):
    import pytest

    df = spark.createDataFrame([(1, 1.0)], "k int, amt double")
    with pytest.raises(ValueError, match="not algebraic"):
        curation.merge_aggregates(df, df, ["k"], {"amt": "avg"})


def test_assign_shards_partitions_corpus_and_balances_tokens(spark):
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    d = read_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    a = curation.assign_shards(d, 8, "doc_id", "n_tokens", 16)
    # exact partition: every doc in exactly one shard
    assert a.count() == d.count()
    assert a.select("doc_id").distinct().count() == d.count()
    manifest = {
        r["shard"]: r["tok"]
        for r in a.groupBy("shard").agg(F.sum("n_tokens").alias("tok")).collect()
    }
    assert set(manifest) == set(range(8))
    spread = max(manifest.values()) / min(manifest.values())
    assert spread < 1.1, f"token imbalance {spread:.3f}"
    # deterministic under repartitioning: same assignment either way
    b = curation.assign_shards(d.repartition(13), 8, "doc_id", "n_tokens", 16)
    assert (
        sorted((r["doc_id"], r["shard"]) for r in a.collect())
        == sorted((r["doc_id"], r["shard"]) for r in b.collect())
    )


def test_inverted_index_postings_and_df_cap(spark):
    from pw_etl_scrumptious_squad_spark.operators import text as textops

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),   # apple deduped within doc
            (2, "banana cherry"),
            (3, "banana"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["term"]: r
        for r in textops.inverted_index(docs, df_cap=2).collect()
    }
    assert rows["apple"]["n_docs"] == 1 and rows["apple"]["postings"] == "1"
    assert rows["cherry"]["postings"] == "2"
    # banana (3 docs) exceeds the cap: exact count, NULL postings
    assert rows["banana"]["n_docs"] == 3
    assert rows["banana"]["postings"] is None


def test_encode_token_ids_ranks_by_frequency_and_handles_oov(spark):
    from pw_etl_scrumptious_squad_spark.operators import text as textops

    docs = spark.createDataFrame(
        [(1, "b b a c"), (2, "b a")],
        "doc_id long, text string",
    )
    # freq: b=3 -> id 1, a=2 -> id 2, c=1 -> id 3
    rows = {r["doc_id"]: r for r in textops.encode_token_ids(docs).collect()}
    assert rows[1]["token_ids"] == "1,1,2,3" and rows[1]["n_tokens"] == 4
    assert rows[2]["token_ids"] == "1,2"


def test_source_overlap_matrix_known_jaccard(spark):
    """Two sources built from overlapping shingle sets produce the exact
    Jaccard; sources sharing nothing emit no pair row."""
    from pw_etl_scrumptious_squad_spark.operators import curation

    # 6-token docs -> two 5-token shingles each; srcA and srcB share
    # exactly one doc's text (2 shingles), srcC shares nothing
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, shared, "srcA"),
        (2, "eta theta iota kappa lambda mu", "srcA"),
        (3, shared, "srcB"),
        (4, "nu xi omicron pi rho sigma", "srcB"),
        (5, "tau upsilon phi chi psi omega", "srcC"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    got = {
        (r["src_a"], r["src_b"]): r
        for r in curation.source_overlap_matrix(df).collect()
    }
    assert set(got) == {("srcA", "srcB")}
    r = got[("srcA", "srcB")]
    # each source has 4 distinct shingles, 2 shared -> J = 2/6
    assert (r["n_a"], r["n_b"], r["n_shared"]) == (4, 4, 2)
    assert r["jaccard"] == round(2 / 6, 6)


def test_perplexity_buckets_split_and_short(spark):
    """Boilerplate docs score highest (head), the rare doc lands in
    tail, 1-token docs get 'short'; terciles are per-language."""
    from pw_etl_scrumptious_squad_spark.operators import curation

    rows = [(i, "the quick brown fox jumps", "en") for i in range(6)]
    rows += [
        (100, "the slow brown cat naps", "en"),
        (101, "zebra quark nebula xylophone banjo", "en"),
        (102, "solo", "en"),
        (200, "der schnelle braune fuchs springt", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    got = {r["doc_id"]: r["bucket"] for r in curation.perplexity_buckets(df).collect()}
    assert got[102] == "short"
    assert got[0] == "head"          # boilerplate = most probable
    assert got[100] == "tail" or got[101] == "tail"
    assert got[200] in {"head", "middle", "tail"}  # own language partition
    en_buckets = [got[i] for i in range(6)] + [got[100], got[101]]
    assert {"head", "middle", "tail"} <= set(en_buckets)


def test_perplexity_buckets_approx_tier_agrees_off_cutoff(spark):
    """Round-8 scale tier: exact ntile vs percentile_approx cutoffs.
    (a) buckets agree for every doc whose score is not tied at a
    cutoff; (b) per-bucket counts stay within the tie band; (c) the
    sketch runs with NO per-language sort (no WindowExec over lang in
    the plan); (d) 'short' routing identical."""
    from pw_etl_scrumptious_squad_spark.operators import curation

    # 60 en + 30 de docs from the sf0.001 corpus gives a continuous
    # score spread (few exact ties)
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    docs = (
        read_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text", "lang")
        .filter("lang IN ('en', 'de')")
        .limit(90)
        .localCheckpoint()
    )
    exact = {
        r["doc_id"]: (r["bucket"], r["avg_logprob"])
        for r in curation.perplexity_buckets(docs).collect()
    }
    approx_df = curation.perplexity_buckets(docs, exact=False)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no per-language sort task anywhere
    approx = {
        r["doc_id"]: (r["bucket"], r["avg_logprob"])
        for r in approx_df.collect()
    }
    assert exact.keys() == approx.keys()
    # scores identical (same scoring pipeline), shorts identical
    for d in exact:
        assert exact[d][1] == approx[d][1]
        assert (exact[d][0] == "short") == (approx[d][0] == "short")
    # disagreements only at tied/cutoff-adjacent scores: for each lang,
    # collect the scores where the two tiers disagree and check each is
    # EQUAL to some other doc's score (a tie ntile had to split) or
    # adjacent to the tercile boundary rank
    import collections

    by_lang_scores = collections.defaultdict(list)
    rows = {
        r["doc_id"]: r
        for r in docs.join(
            approx_df.select("doc_id"), "doc_id", "left_semi"
        ).collect()
    }
    for d, (b_e, s) in exact.items():
        if s is not None:
            by_lang_scores[rows[d]["lang"]].append(s)
    n_disagree = 0
    for d in exact:
        if exact[d][0] != approx[d][0]:
            n_disagree += 1
            s = exact[d][1]
            lang = rows[d]["lang"]
            ranked = sorted(by_lang_scores[lang], reverse=True)
            n = len(ranked)
            # boundary band: within one position of a tercile edge, or
            # tied with another doc
            pos = ranked.index(s)
            near_edge = any(
                abs(pos - edge) <= 1 or abs(pos + ranked.count(s) - 1 - edge) <= 1
                for edge in (n // 3 - 1, n // 3, 2 * n // 3 - 1, 2 * n // 3)
            )
            assert ranked.count(s) > 1 or near_edge, (d, s, pos, n)
    # the tie band is small
    assert n_disagree <= max(4, len(exact) // 10)


def test_ivf_cell_profile_counts_and_dominant_label(spark):
    from pw_etl_scrumptious_squad_spark.operators import similarity

    cent = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "centroid_id INT, embedding ARRAY<FLOAT>"
    )
    vecs = [
        (1, [1.0, 0.0], 7),
        (2, [1.0, 0.0], 7),
        (3, [0.9, 0.1], 8),
        (4, [0.0, 1.0], 9),
    ]
    emb = spark.createDataFrame(vecs, "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
    assigned = similarity.assign_ivf_cells(emb, cent).join(
        emb.select("vec_id", "label"), "vec_id"
    )
    got = {r["cell"]: r for r in similarity.ivf_cell_profile(assigned, cent).collect()}
    assert got[0]["n_vecs"] == 3 and got[0]["top_label"] == 7
    assert got[1]["n_vecs"] == 1 and got[1]["top_label"] == 9
    assert got[1]["mean_cos"] == 1.0
    assert 0.99 < got[0]["mean_cos"] <= 1.0


def test_source_overlap_sketch_identical_and_disjoint(spark):
    """Identical sources agree on every MinHash component (est 1.0);
    disjoint sources agree on none (est 0.0); estimates sit within the
    MinHash error envelope of the exact Jaccard."""
    from pw_etl_scrumptious_squad_spark.operators import curation

    same = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, same, "A"),
        (2, same, "B"),
        (3, "nu xi omicron pi rho sigma tau upsilon phi chi", "C"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    got = {
        (r["src_a"], r["src_b"]): r["est_jaccard"]
        for r in curation.source_overlap_sketch(df).collect()
    }
    assert got[("A", "B")] == 1.0
    assert got[("A", "C")] == 0.0 and got[("B", "C")] == 0.0


def test_plan_token_mixture_allocation_and_caps(spark):
    """Budget splits by language weight then bucket weight normalized
    over PRESENT buckets; scarce strata cap at max_epochs."""
    from pw_etl_scrumptious_squad_spark.operators import curation

    rows = (
        [("en", "head", 100)] * 50        # 5000 tokens available
        + [("en", "tail", 100)] * 2       # scarce: 200 tokens
        + [("de", "head", 100)] * 10      # de has ONLY head
    )
    df = spark.createDataFrame(rows, "lang STRING, bucket STRING, n_tokens INT")
    got = {
        (r["lang"], r["bucket"]): r
        for r in curation.plan_token_mixture(
            df, 10_000, {"en": 0.8, "de": 0.2}, {"head": 0.6, "tail": 0.1}
        ).collect()
    }
    # en budget 8000; present buckets head+tail -> norm 0.7:
    # head target 8000*6/7=6857, tail target 8000*1/7=1143
    assert got[("en", "head")]["target_tokens"] == 6857
    assert got[("en", "tail")]["target_tokens"] == 1143
    # tail has only 200 tokens -> capped at 2 epochs = 400 expected
    assert got[("en", "tail")]["rate_ppm"] == 2_000_000
    assert got[("en", "tail")]["expected_tokens"] == 400
    # de: only bucket present -> whole de budget, rate 2000/1000 = 2.0 capped
    assert got[("de", "head")]["target_tokens"] == 2000
    assert got[("de", "head")]["rate_ppm"] == 2_000_000
    # en head under-subscribed: rate = 6857.14.../5000
    assert 1_371_000 < got[("en", "head")]["rate_ppm"] < 1_372_000


def test_embedding_decontaminate_same_id_exact_copy_flags(spark):
    """An exact copy that PRESERVED its id must still flag (the most
    blatant contamination case); exclude_self=True opts back into
    identity exclusion; an empty eval set yields every corpus row with
    contaminated=0 instead of an empty frame."""
    schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    ev = spark.createDataFrame([(1, [1.0, 0.0, 0.0, 0.0])], schema)
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),  # same id AND same vector as eval
            (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        ],
        schema,
    )
    got = {
        r["vec_id"]: r
        for r in curation.embedding_decontaminate(corpus, ev).collect()
    }
    assert got[1]["best_eval_id"] == 1
    assert got[1]["cos_ppb"] == 1_000_000_000
    assert got[1]["contaminated"] == 1
    assert got[2]["contaminated"] == 0

    # opt-in self-exclusion: corpus row 1 is never compared to eval 1,
    # but it still surfaces (orthogonal best match, contaminated=0)
    got_ex = {
        r["vec_id"]: r
        for r in curation.embedding_decontaminate(
            corpus, ev, exclude_self=True
        ).collect()
    }
    assert set(got_ex) == {1, 2}
    assert got_ex[1]["best_eval_id"] is None
    assert got_ex[1]["cos_ppb"] is None
    assert got_ex[1]["contaminated"] == 0

    # empty eval set: every corpus row emitted as clean
    empty = spark.createDataFrame([], schema)
    got_empty = {
        r["vec_id"]: r
        for r in curation.embedding_decontaminate(corpus, empty).collect()
    }
    assert set(got_empty) == {1, 2}
    assert all(r["contaminated"] == 0 for r in got_empty.values())
    assert all(r["best_eval_id"] is None for r in got_empty.values())


def test_plan_token_mixture_zero_weight_normalizer_and_unallocated(spark):
    """A language whose only present bucket carries zero weight gets an
    explicit 0 allocation (not NULL), and emit_unallocated=True surfaces
    budget aimed at a language absent from the data."""
    rows = [("en", "head", 100)] * 10 + [("zz", "short", 100)] * 5
    df = spark.createDataFrame(rows, "lang STRING, bucket STRING, n_tokens INT")
    plan = curation.plan_token_mixture(
        df,
        10_000,
        {"en": 0.5, "zz": 0.2, "fr": 0.3},  # fr absent from the data
        {"head": 1.0, "short": 0.0},
        emit_unallocated=True,
    )
    got = {(r["lang"], r["bucket"]): r for r in plan.collect()}
    # zz's only present bucket has weight 0 -> bwsum 0 -> explicit zeros
    assert got[("zz", "short")]["target_tokens"] == 0
    assert got[("zz", "short")]["rate_ppm"] == 0
    assert got[("zz", "short")]["expected_tokens"] == 0
    # en gets its full language share
    assert got[("en", "head")]["target_tokens"] == 5000
    # fr's 3000 + zz's zeroed 2000 surface as the unallocated shortfall
    assert got[("__unallocated__", "")]["target_tokens"] == 5000
    # default: no synthetic row
    plan_def = curation.plan_token_mixture(
        df, 10_000, {"en": 0.5}, {"head": 1.0, "short": 0.0}
    )
    assert not any(
        r["lang"] == "__unallocated__" for r in plan_def.collect()
    )


def test_semdedup_prune_keep_low_centroid_similarity(spark):
    """SemDeDup prune: within a cell, of a near-dup pair the member with
    the LOWER cosine-to-centroid is kept (paper's keep-low policy),
    exact duplicates tie-break to the lowest id, sub-threshold neighbors
    and singleton cells are untouched."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id INT, embedding ARRAY<FLOAT>",
    )
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),    # cell 0, cent_cos = 1.0
            (2, [0.99, 0.02, 0.0, 0.0]),  # near-dup of 1, cent_cos < 1
            (3, [0.0, 1.0, 0.0, 0.0]),    # alone in cell 1
            (4, [0.6, 0.0, 0.8, 0.0]),    # cell 0 but cos(1,4)=0.6 < 0.9
            (5, [1.0, 0.0, 0.0, 0.0]),    # exact duplicate of 1, higher id
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    from pw_etl_scrumptious_squad_spark.operators import curation

    got = {
        r["vec_id"]: r
        for r in curation.semdedup_prune(
            corpus, cents, threshold_ppb=900_000_000
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1]["cell"] == 0 and got[1]["cent_ppb"] == 1_000_000_000
    # 2 has the lowest cent-cos of the {1,2,5} dup group -> kept
    assert got[2]["kept"] == 1
    # 1 dropped by 2 (lower cent); 5 dropped by both 2 and the id-tie
    assert got[1]["kept"] == 0
    assert got[5]["kept"] == 0
    # singleton cell and sub-threshold neighbor keep
    assert got[3]["kept"] == 1 and got[3]["cell"] == 1
    assert got[4]["kept"] == 1


def test_dsir_importance_orders_target_like_docs(spark):
    """A doc sharing the target subset's distinctive bigrams scores
    above a doc made of raw-only bigrams; per-doc counts are exact and
    sub-2-token docs are excluded."""
    rows = [
        (1, "alpha beta alpha beta", 1),     # target
        (2, "alpha beta gamma", 1),          # target
        (3, "delta epsilon delta epsilon", 0),
        (4, "alpha beta alpha", 0),          # raw but target-like
        (5, "delta epsilon zeta", 0),        # raw-like
        (6, "solo", 0),                      # 1 token -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, t INT")
    got = {
        r["doc_id"]: r
        for r in curation.dsir_importance(
            docs, F.col("t") == 1, n_buckets=64
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1]["n_bigrams"] == 3 and got[5]["n_bigrams"] == 2
    # target-like raw doc outranks the raw-like one
    assert got[4]["score"] > got[5]["score"]
    # 'alpha beta'-heavy target doc scores positive, raw-only negative
    assert got[1]["score"] > 0 > got[3]["score"]


def test_segment_dedup_keeps_first_occurrence_only(spark):
    """With 2-token segments: a segment repeated across docs survives
    only at its minimal (doc_id, seg_idx); the md5 fingerprints the
    kept text in segment order; an all-duplicate doc hashes ''."""
    import hashlib

    rows = [
        (1, "a b c d"),       # segs: 'a b', 'c d'
        (2, "a b e f"),       # 'a b' dups doc 1 -> keeps 'e f'
        (3, "c d a b"),       # both dup doc 1 -> keeps nothing
        (4, "c d c d"),       # seg 0 dups doc1; seg 1 dups its own seg 0
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r
        for r in curation.segment_dedup(docs, seg_tokens=2).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert (got[1]["n_segs"], got[1]["n_kept"]) == (2, 2)
    assert got[1]["dedup_md5"] == md5("a b c d")
    assert (got[2]["n_segs"], got[2]["n_kept"]) == (2, 1)
    assert got[2]["dedup_md5"] == md5("e f")
    assert (got[3]["n_segs"], got[3]["n_kept"]) == (2, 0)
    assert got[3]["dedup_md5"] == md5("")
    assert (got[4]["n_segs"], got[4]["n_kept"]) == (2, 0)


# ---------------------------------------------------------------------------
# Trainable quality classifier (round 9): distributed training must be
# BIT-IDENTICAL to a pure-Python twin (the y51 BPE determinism pattern),
# and application must behave like a real seed-set filter.
# ---------------------------------------------------------------------------


def _py_qc_train(docs, labels, n_buckets=256, iters=8, lr_ppm=500_000):
    """Pure-Python twin of curation.quality_classifier_train: same
    features (md5-60bit % buckets + intercept), same hard-sigmoid
    integer arithmetic, same half-up weight quantization."""
    import hashlib
    from fractions import Fraction

    S = 1_000_000_000_000
    feats = {}
    for d, text in docs.items():
        row = {-1: 1}
        for tok in text.split(" "):
            if tok:
                b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets
                row[b] = row.get(b, 0) + 1
        feats[d] = row
    n = len(docs)
    w = {}
    for _ in range(iters):
        grad = {}
        for d, row in feats.items():
            mq = sum(w.get(b, 0) * c for b, c in row.items())
            s4 = max(0, min(4 * S, mq + 2 * S))
            r4 = s4 - labels[d] * 4 * S
            for b, c in row.items():
                grad[b] = grad.get(b, 0) + r4 * c
        for b, g4 in grad.items():
            delta = Fraction(lr_ppm, 1_000_000) * Fraction(g4) / (4 * n)
            w[b] = w.get(b, 0) - int((delta + Fraction(1, 2)).__floor__())
    return {b: q for b, q in w.items() if q != 0}


def test_quality_classifier_train_matches_python_twin(spark):
    from pyspark.sql import functions as F

    from pw_etl_scrumptious_squad_spark.operators import curation

    docs = {
        1: "the quick brown fox likes clean prose and citations",
        2: "click here buy now cheap cheap cheap deals deals",
        3: "a measured paragraph with varied vocabulary and structure",
        4: "buy buy buy now now cheap click subscribe",
        5: "an encyclopedia entry describing the history of printing",
        6: "winner winner claim your prize now click click",
    }
    labels = {1: 1, 2: 0, 3: 1, 4: 0, 5: 1, 6: 0}
    df = spark.createDataFrame(
        [(d, t, labels[d]) for d, t in docs.items()],
        "doc_id LONG, text STRING, y INT",
    )
    got_df = curation.quality_classifier_train(
        df, F.col("y") == 1, n_buckets=64, iters=8
    )
    got = {r["bkt"]: r["wq"] for r in got_df.collect()}
    want = _py_qc_train(docs, labels, n_buckets=64, iters=8)
    assert got == want  # bit-identical weights, every bucket

    # the classifier actually separates the seed sets: every positive
    # doc scores a strictly higher margin than every negative doc
    scored = {
        r["doc_id"]: (r["margin_pq"], r["keep"])
        for r in curation.quality_classifier_apply(
            df,
            spark.createDataFrame(sorted(got.items()), "bkt BIGINT, wq BIGINT"),
            n_buckets=64,
        ).collect()
    }
    pos = [scored[d][0] for d, y in labels.items() if y == 1]
    neg = [scored[d][0] for d, y in labels.items() if y == 0]
    assert min(pos) > max(neg)
    # an unseen doc made of seed-negative vocabulary lands negative
    unseen = spark.createDataFrame(
        [(99, "cheap deals click now buy")], "doc_id LONG, text STRING"
    )
    r99 = curation.quality_classifier_apply(
        unseen,
        spark.createDataFrame(sorted(got.items()), "bkt BIGINT, wq BIGINT"),
        n_buckets=64,
    ).collect()[0]
    assert r99["keep"] is False


def test_quality_classifier_degenerate_inputs(spark):
    from pyspark.sql import functions as F

    from pw_etl_scrumptious_squad_spark.operators import curation

    # empty corpus trains to an empty weight table
    empty = spark.createDataFrame([], "doc_id LONG, text STRING, y INT")
    w = curation.quality_classifier_train(empty, F.col("y") == 1, n_buckets=16)
    assert w.count() == 0
    # single-class corpus: every margin moves the same direction, and
    # apply on a doc with NO overlapping buckets scores exactly 0
    one = spark.createDataFrame(
        [(1, "aaa bbb", 1), (2, "aaa ccc", 1)], "doc_id LONG, text STRING, y INT"
    )
    w1 = curation.quality_classifier_train(one, F.col("y") == 1, n_buckets=16, iters=4)
    out = curation.quality_classifier_apply(
        spark.createDataFrame([(9, "")], "doc_id LONG, text STRING"),
        w1.filter(F.col("bkt") != -1),  # drop intercept: no shared buckets
        n_buckets=16,
    ).collect()[0]
    assert out["margin_pq"] == 0 and out["keep"] is False


# ---------------------------------------------------------------------------
# Cumulative distinct over a day series (round-10 continuation)
# ---------------------------------------------------------------------------

def _cum_events(spark, rows):
    from datetime import datetime

    data = [
        (datetime(2024, 3, d, 12, 0, 0), int(u)) for d, u in rows
    ]
    return spark.createDataFrame(data, "ts TIMESTAMP_NTZ, user_id LONG")


def test_cumulative_distinct_exact_tier_matches_bruteforce(spark):
    from pw_etl_scrumptious_squad_spark.operators.curation import (
        cumulative_distinct_daily,
    )

    rows = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 1), (4, 9), (4, 9), (5, 1)]
    out = {
        str(r["day"]): (r["n_new"], r["exact_cum_distinct"])
        for r in cumulative_distinct_daily(_cum_events(spark, rows)).collect()
    }
    # day1: {1,2}; day2: +{3}; day3: +{}; day4: +{9}; day5: +{}
    assert out["2024-03-01"] == (2, 2)
    assert out["2024-03-02"] == (1, 3)
    assert out["2024-03-03"] == (0, 3)
    assert out["2024-03-04"] == (1, 4)
    assert out["2024-03-05"] == (0, 4)


def test_cumulative_distinct_is_monotone_and_audited(spark):
    from pw_etl_scrumptious_squad_spark.operators.curation import (
        cumulative_distinct_daily,
    )

    rows = [(d, (d * 37 + i) % 500) for d in range(1, 21) for i in range(80)]
    got = (
        cumulative_distinct_daily(_cum_events(spark, rows))
        .orderBy("day")
        .collect()
    )
    exacts = [r["exact_cum_distinct"] for r in got]
    ests = [r["hll_cum_estimate"] for r in got]
    assert exacts == sorted(exacts)  # cumulative: never decreases
    assert ests == sorted(ests)  # register max-merge: never decreases
    for r in got:
        # p=8 envelope with headroom: these cardinalities (80..500 on
        # 256 registers) sit in the classic bias trough at the
        # linear-counting -> raw-estimate handoff (n ~ 2.5m), where
        # uncorrected HLL error runs ~2-4 sigma; deterministic hashes
        # make the bound exact-repeatable, not a flaky tolerance
        assert abs(r["rel_error"]) < 0.3


def test_cumulative_final_day_equals_collapsed_global_sketch(spark):
    """Max-merging day registers across the whole series must yield the
    SAME final sketch as hashing every event into one day — the
    merge-equals-global property the operator rests on."""
    from pw_etl_scrumptious_squad_spark.operators.curation import (
        cumulative_distinct_daily,
    )

    rows = [(d, (d * 13 + i) % 300) for d in range(1, 11) for i in range(50)]
    multi = (
        cumulative_distinct_daily(_cum_events(spark, rows))
        .orderBy("day")
        .collect()
    )
    collapsed = cumulative_distinct_daily(
        _cum_events(spark, [(1, u) for _, u in rows])
    ).collect()
    assert len(collapsed) == 1
    assert multi[-1]["hll_cum_estimate"] == collapsed[0]["hll_cum_estimate"]
    assert (
        multi[-1]["exact_cum_distinct"]
        == collapsed[0]["exact_cum_distinct"]
    )
