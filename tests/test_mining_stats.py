"""Round-5 additions: hard-negative mining, Zipf slope, source-KL drift.

Same strategy as tests/test_geometry_routes.py: the DuckDB oracle pins
the value-exact small-scale path (y53/y54/y55); these tests pin the
matmul scale route against the expression tier and the semantics against
closed-form pure-python ground truth.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators import curation, similarity, text

SF = "/root/testdata/sf0.001"


def _read(spark, table):
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    return read_table(spark, SF, table)


def test_hard_negative_routes_identical(spark):
    """Expression tier (oracle-matched) vs Arrow-matmul scale route:
    identical (query_id, neg_id, cos_ppb, rank) rows on the real
    embeddings PLUS planted degenerates (NULL label, NULL embedding,
    zero vector) — degenerates sit on neither side in both routes."""
    emb = _read(spark, "embeddings").select("vec_id", "embedding", "label")
    base = list(
        emb.filter(F.col("vec_id") == 0).select("embedding").first()[
            "embedding"
        ]
    )
    extra = spark.createDataFrame(
        [
            (10_001, base, None),  # NULL label
            (10_002, None, 3),  # NULL embedding
            (10_003, [0.0] * len(base), 4),  # zero vector
        ],
        "vec_id long, embedding array<float>, label int",
    )
    corpus = emb.unionByName(extra)
    a = similarity.hard_negative_mining(corpus, k=3)
    b = similarity.hard_negative_mining(
        corpus, k=3, n_rows_hint=10**9
    )
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) > 0
    touched = {r[0] for r in ra} | {r[1] for r in ra}
    assert not touched & {10_001, 10_002, 10_003}


def test_hard_negative_closed_form(spark):
    """Known geometry: anchors must pick the most-similar DIFFERENT-label
    vector, ranked by quantized cosine then id."""
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.01], 0),  # same label as 0 -> never 0's negative
        (2, [0.9, 0.1], 1),  # hard negative for 0
        (3, [0.0, 1.0], 1),  # easy negative for 0
    ]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.hard_negative_mining(vecs, k=1).collect()
    top = {r["query_id"]: r["neg_id"] for r in out}
    assert top[0] == 2  # hardest different-label neighbor
    assert top[2] in (0, 1) and top[3] in (0, 1)
    # k honored, rank dense from 1
    out3 = similarity.hard_negative_mining(vecs, k=5).collect()
    by_q = {}
    for r in out3:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_zipf_slope_closed_form(spark):
    """A corpus built to an exact power law c(r) = 64 / 2^(r-1) over 4
    ranks fits slope = -ln2-per-ln-rank... not linear in ln space unless
    freqs ARE rank^s — so instead build c(r) = round(100 * r^-1) and
    assert against a pure-python replica of the SAME quantized OLS."""
    freqs = {f"tok{r:02d}": max(1, round(100 / r)) for r in range(1, 11)}
    words = []
    for t, c in freqs.items():
        words.extend([t] * c)
    docs = spark.createDataFrame(
        [(1, " ".join(words), "xx")], "doc_id long, text string, lang string"
    )
    out = text.zipf_slope(docs, top_n=100).collect()
    assert len(out) == 1
    row = out[0]
    # python replica: same tie-break (count desc, token asc), same
    # ppb-quantized terms
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.log(r), math.log(c))
        for r, (_, c) in enumerate(ranked, start=1)
    ]
    q = lambda v: int(round(v * 1e9))  # noqa: E731
    n = len(pts)
    sx = sum(q(x) for x, _ in pts)
    sy = sum(q(y) for _, y in pts)
    sxy = sum(q(x * y) for x, y in pts)
    sxx = sum(q(x * x) for x, _ in pts)
    slope = ((n * (sxy / 1e9)) - ((sx / 1e9) * (sy / 1e9))) / (
        (n * (sxx / 1e9)) - ((sx / 1e9) * (sx / 1e9))
    )
    assert row["n_points"] == n
    assert row["top_mass"] == sum(freqs.values())
    assert abs(row["slope"] - round(slope, 6)) < 1e-9
    # a 1/r law must fit slope ~ -1
    assert -1.1 < row["slope"] < -0.9


def test_zipf_slope_real_corpus(spark):
    docs = _read(spark, "documents")
    out = text.zipf_slope(docs).collect()
    assert len(out) >= 1
    for r in out:
        assert r["slope"] < 0  # frequency decreases with rank, always


def test_source_kl_identity_is_zero(spark):
    """A single-source corpus IS the corpus marginal: every smoothed
    term cancels, KL = 0 exactly (including the unseen-bucket term)."""
    docs = spark.createDataFrame(
        [(1, "a b c a b a", "only", "xx")],
        "doc_id long, text string, source string, lang string",
    )
    out = curation.source_kl_divergence(docs).collect()
    assert len(out) == 1
    assert out[0]["kl_nats"] == 0.0
    assert out[0]["n_tokens"] == 6


def test_source_kl_closed_form(spark):
    """Two disjoint-vocabulary sources: pure-python replica of the same
    bucket hash + quantized term sum must match to the 6-dp output."""
    b = 4096
    s1 = ["alpha", "beta", "gamma"] * 4
    s2 = ["delta", "epsilon"] * 6
    docs = spark.createDataFrame(
        [(1, " ".join(s1), "s1", "xx"), (2, " ".join(s2), "s2", "xx")],
        "doc_id long, text string, source string, lang string",
    )
    out = {
        r["source"]: r
        for r in curation.source_kl_divergence(docs, n_buckets=b).collect()
    }

    def bkt(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % b

    from collections import Counter

    per = {"s1": Counter(bkt(t) for t in s1), "s2": Counter(bkt(t) for t in s2)}
    corpus = per["s1"] + per["s2"]
    nc = sum(corpus.values())
    for src, cnt in per.items():
        ns = sum(cnt.values())
        klq = 0
        for bucket, cb in corpus.items():
            csb = cnt.get(bucket, 0)
            ps = (csb + 1) / (ns + b)
            pc = (cb + 1) / (nc + b)
            klq += int(round(ps * math.log(ps / pc) * 1e9))
        p0s = (0 + 1) / (ns + b)
        p0c = (0 + 1) / (nc + b)
        t0q = int(round(p0s * math.log(p0s / p0c) * 1e9))
        klq += (b - len(corpus)) * t0q
        expected = round(klq / 1e9, 6)
        assert out[src]["kl_nats"] == expected
        assert out[src]["n_tokens"] == ns
        assert out[src]["kl_nats"] > 0  # disjoint vocab = real drift


def test_hard_negatives_ivf_full_probe_equals_exact(spark):
    """Probing EVERY cell makes the candidate set complete (each vector
    is a candidate in exactly its top-1 cell, and every anchor reaches
    every cell), so the IVF route must equal the exact tier row for
    row — recall loss can only come from unprobed cells."""
    emb = _read(spark, "embeddings").select("vec_id", "embedding", "label")
    cents = (
        emb.filter(F.col("vec_id") < 6)
        .select(
            F.col("vec_id").cast("int").alias("centroid_id"), "embedding"
        )
    )
    exact = similarity.hard_negative_mining(emb, k=3)
    ivf = similarity.hard_negatives_ivf(emb, cents, k=3, n_probe=6)
    ra = sorted(map(tuple, exact.collect()))
    rb = sorted(map(tuple, ivf.collect()))
    assert ra == rb
    assert len(ra) > 0


def test_hard_negatives_ivf_partial_probe_subset(spark):
    """n_probe=1: emitted pairs are a subset of the full pair space with
    EXACT scores — every (query, neg, cos_ppb) must match the exact
    tier's scoring of that same pair (d05's emitted-pairs-exact rule)."""
    emb = _read(spark, "embeddings").select("vec_id", "embedding", "label")
    cents = (
        emb.filter(F.col("vec_id") < 6)
        .select(
            F.col("vec_id").cast("int").alias("centroid_id"), "embedding"
        )
    )
    ivf = similarity.hard_negatives_ivf(emb, cents, k=3, n_probe=1).collect()
    assert len(ivf) > 0
    # full exact pair scoring (k large enough to include all pairs)
    full = similarity.hard_negative_mining(emb, k=10**6).collect()
    scores = {(r["query_id"], r["neg_id"]): r["cos_ppb"] for r in full}
    for r in ivf:
        assert scores[(r["query_id"], r["neg_id"])] == r["cos_ppb"]


def test_stratified_split_exact_quotas(spark):
    """Quotas per stratum must equal the largest-remainder apportionment
    exactly, every row is assigned exactly once, and the assignment is a
    pure function of the id (re-run identical)."""
    rows = [(i, "en" if i < 17 else "fr") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    splits = [("train", 800_000), ("val", 100_000), ("test", 100_000)]
    out = curation.stratified_split(docs, ["lang"], splits).collect()
    assert len(out) == 30  # total partition: every row exactly once
    assert len({r["doc_id"] for r in out}) == 30
    from collections import Counter

    got = Counter((r["lang"], r["split"]) for r in out)
    # en: n=17 -> shares 13.6/1.7/1.7 -> base 13/1/1, leftover 2 ->
    # remainders .6/.7/.7: val,test get the units (ties by position)
    assert got[("en", "train")] == 13
    assert got[("en", "val")] == 2
    assert got[("en", "test")] == 2
    # fr: n=13 -> 10.4/1.3/1.3 -> base 10/1/1, leftover 1 -> train (.4
    # is the largest remainder)
    assert got[("fr", "train")] == 11
    assert got[("fr", "val")] == 1
    assert got[("fr", "test")] == 1
    # determinism: identical on re-run
    again = curation.stratified_split(docs, ["lang"], splits).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # seed rotation changes membership but not quotas
    rot = curation.stratified_split(
        docs, ["lang"], splits, seed_tag="v2"
    ).collect()
    assert Counter((r["lang"], r["split"]) for r in rot) == got
    assert sorted(map(tuple, rot)) != sorted(map(tuple, out))


def test_stratified_split_rejects_bad_weights(spark):
    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    import pytest

    with pytest.raises(ValueError):
        curation.stratified_split(docs, ["lang"], [("a", 1), ("b", 2)])


def test_oov_rate_closed_form(spark):
    """vocab_size=2 over a known distribution: top-2 tokens by (count
    desc, token asc) are in-vocab, everything else is OOV."""
    docs = spark.createDataFrame(
        [
            (1, "a a a b b c"),  # vocab = {a, b}; c is OOV
            (2, "c c d"),  # all OOV
            (3, "a b"),  # none OOV
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.oov_rate(docs, vocab_size=2).collect()}
    assert out[1]["n_tokens"] == 6 and out[1]["n_oov"] == 1
    assert out[1]["oov_rate"] == round(1 / 6, 9)
    assert out[2]["n_tokens"] == 3 and out[2]["n_oov"] == 3
    assert out[2]["oov_rate"] == 1.0
    assert out[3]["n_oov"] == 0 and out[3]["oov_rate"] == 0.0


def test_bpe_encode_parity_and_closed_form(spark):
    """bpe_encode must reproduce a pure-python scan-and-skip encoder
    word for word (same merges, same order), fingerprint included."""
    import hashlib as _hl

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "the lowest newest the the",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges_df = text.bpe_train(docs, num_merges=8)
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert len(merges) > 0
    out = {r["doc_id"]: r for r in text.bpe_encode(docs, merges_df).collect()}

    def enc_word(w):
        s = list(w) + ["</w>"]
        for left, right in merges:
            o, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    o.append(left + right)
                    i += 2
                else:
                    o.append(s[i])
                    i += 1
            s = o
        return s

    for i, t in enumerate(texts):
        words = [w for w in t.lower().split(" ") if w]
        toks = [tok for w in words for tok in enc_word(w)]
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["fertility"] == round(len(toks) / len(words), 9)
        assert (
            out[i]["tokens_md5"]
            == _hl.md5(" ".join(toks).encode()).hexdigest()
        )


def test_bpe_encode_accepts_pair_list(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa ab")], "doc_id long, text string"
    )
    out = text.bpe_encode(docs, [("a", "a")]).collect()[0]
    # 'aa' -> [aa, </w>] (2), 'ab' -> [a, b, </w>] (3)
    assert out["n_words"] == 3 and out["n_tokens"] == 2 + 2 + 3


def test_pq_encode_matches_python_argmin(spark):
    """pq_encode's quantized-integer L2 argmin vs a pure-python replica
    over the same trained codebooks."""
    import numpy as np

    emb = _read(spark, "embeddings").select("vec_id", "embedding")
    cb = similarity.train_pq_codebooks(emb, m=4, ksub=8)
    codes = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in similarity.pq_encode(emb, cb).collect()
    }
    cents = {}
    for r in cb.collect():
        cents[(r["sub"], r["code"])] = np.floor(
            np.asarray(r["center"], dtype="f8") * 1e6 + 0.5
        ).astype("i8")
    rows = emb.collect()
    d = len(rows[0]["embedding"]) // 4
    for r in rows[:50]:
        qv = np.floor(
            np.asarray(r["embedding"], dtype="f8") * 1e6 + 0.5
        ).astype("i8")
        for sub in range(4):
            xs = qv[sub * d : (sub + 1) * d]
            best = min(
                (
                    (
                        int((c * c).sum() - 2 * (xs * c).sum()),
                        code,
                    )
                    for (s, code), c in cents.items()
                    if s == sub
                ),
            )[1]
            assert codes[(r["vec_id"], sub)] == best


def test_pq_encode_vectorized_matches_expr_tier(spark):
    """The Arrow/numpy int64-matmul encode tier must choose codes
    bit-identically to the expression tier (same quantized grid, same
    min_by(code, struct(dist, code)) tie rule), with and without the
    driver-side codebook_rows shortcut."""
    emb = _read(spark, "embeddings").select("vec_id", "embedding")
    cb = similarity.train_pq_codebooks(emb, m=4, ksub=8)
    rows = [(r["sub"], r["code"], list(r["center"])) for r in cb.collect()]
    expr = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in similarity.pq_encode(emb, cb, impl="expr").collect()
    }
    vec = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in similarity.pq_encode(emb, cb, impl="vectorized").collect()
    }
    lit = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in similarity.pq_encode(emb, cb, codebook_rows=rows).collect()
    }
    assert expr == vec == lit and len(expr) > 0


def test_pq_adc_recall_sanity(spark):
    """ADC top-5 must overlap the exact cosine top-5 well above chance
    (PQ is lossy, not random) and scores must be deterministic."""
    emb = _read(spark, "embeddings").select("vec_id", "embedding")
    cb = similarity.train_pq_codebooks(emb, m=8, ksub=64)
    codes = similarity.pq_encode(emb, cb)
    queries = emb.filter(F.col("vec_id") < 10)
    adc = similarity.pq_adc_topk(codes, cb, queries, k=5).collect()
    exact = similarity.cosine_topk_bruteforce(
        emb, queries, k=5, round_digits=6
    ).collect()
    by_q_adc, by_q_ex = {}, {}
    for r in adc:
        by_q_adc.setdefault(r["query_id"], set()).add(r["match_id"])
    for r in exact:
        by_q_ex.setdefault(r["query_id"], set()).add(r["match_id"])
    hits = sum(
        len(by_q_adc[q] & by_q_ex[q]) for q in by_q_ex if q in by_q_adc
    )
    total = sum(len(v) for v in by_q_ex.values())
    # chance overlap of two 5-sets in a 500-corpus is ~0.01; PQ at
    # 8x64 on these weak-neighbor-structure synthetic vectors measures
    # ~0.4 — well above chance, the honest PQ trade
    assert hits / total >= 0.3, f"ADC recall {hits}/{total} suspiciously low"
    again = similarity.pq_adc_topk(codes, cb, queries, k=5).collect()
    assert sorted(map(tuple, adc)) == sorted(map(tuple, again))


def test_hardneg_ivf_tie_spillover_exact(spark):
    """Adversarial ties: many candidates with IDENTICAL vectors (equal
    cos_ppb) straddling the k-th boundary — the vectorized per-cell
    selection must keep the LOWEST neg_ids, exactly like the window."""
    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(0, base, 0)]  # anchor, label 0
    # 6 identical candidates with label 1 -> all tie at cos_ppb; k=3
    # must keep neg_ids 1, 2, 3
    rows += [(i, base, 1) for i in range(1, 7)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = spark.createDataFrame(
        [(0, base)], "centroid_id int, embedding array<float>"
    )
    out = similarity.hard_negatives_ivf(vecs, cents, k=3, n_probe=1)
    got = sorted(
        (r["neg_id"], r["rank"])
        for r in out.filter(F.col("query_id") == 0).collect()
    )
    assert got == [(1, 1), (2, 2), (3, 3)]
    exact = similarity.hard_negative_mining(vecs, k=3)
    ge = sorted(
        (r["neg_id"], r["rank"])
        for r in exact.filter(F.col("query_id") == 0).collect()
    )
    assert ge == got


def test_hll_distinct_accuracy_and_small_range(spark):
    """p=8 HLL: relative error within ~3 sigma (1.04/sqrt(256) = 6.5%)
    on a 5000-distinct corpus; tiny cardinalities route through linear
    counting and land near-exact."""
    big = spark.createDataFrame(
        [("big", f"tok{i}") for i in range(5000)]
        + [("small", f"s{i}") for i in range(12)],
        "source string, tok string",
    )
    out = {
        r["source"]: r["hll_estimate"]
        for r in curation.hll_distinct(big, ["source"], "tok").collect()
    }
    assert abs(out["big"] - 5000) / 5000 < 0.20
    assert abs(out["small"] - 12) / 12 < 0.20


def test_hll_registers_merge_as_max(spark):
    """The sketch's merge rule: estimating the UNION of two groups must
    equal collapsing them into one group (registers are element-wise
    maxima — order/partitioning free)."""
    rows = [("a", f"x{i}") for i in range(300)] + [
        ("b", f"x{i}") for i in range(150, 450)
    ]
    df = spark.createDataFrame(rows, "source string, tok string")
    merged = df.select(F.lit("u").alias("source"), "tok")
    one = curation.hll_distinct(merged, ["source"], "tok").collect()[0]
    two = curation.hll_distinct(
        df.select(F.lit("u").alias("source"), "tok"), ["source"], "tok"
    ).collect()[0]
    assert one["hll_estimate"] == two["hll_estimate"]


def test_weighted_sample_proportional_and_deterministic(spark):
    """ES keys: a doc with 50x the weight must be drawn far more often
    across seed rotations; k is exact per stratum; membership is a pure
    function of (seed, id)."""
    rows = [(0, "en", 5000)] + [(i, "en", 100) for i in range(1, 101)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    hits = 0
    for seed in range(20):
        got = {
            r["doc_id"]
            for r in curation.weighted_sample(
                docs, k=5, weight_col="n_chars",
                strata_cols=["lang"], seed_tag=f"s{seed}",
            ).collect()
        }
        assert len(got) == 5
        hits += 0 in got
    # P(heavy doc in a uniform 5-of-101 sample) ~ 5%; weight 50x makes
    # it near-certain (ES inclusion prob is weight-proportional)
    assert hits >= 15
    a = curation.weighted_sample(
        docs, k=5, weight_col="n_chars", strata_cols=["lang"]
    ).collect()
    b = curation.weighted_sample(
        docs, k=5, weight_col="n_chars", strata_cols=["lang"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # zero/NULL weights never drawn
    z = spark.createDataFrame(
        [(1, "en", 0), (2, "en", None), (3, "en", 10)],
        "doc_id long, lang string, n_chars long",
    )
    zz = curation.weighted_sample(
        z, k=5, weight_col="n_chars", strata_cols=["lang"]
    ).collect()
    assert [r["doc_id"] for r in zz] == [3]


def test_pmi_collocations_closed_form(spark):
    """Known corpus: 'new york' always adjacent -> PMI = ln(N/c_x) when
    c_xy == c_x == c_y; a frequent-but-independent pair scores lower."""
    import math

    text_rows = [("new york " * 6 + "the cat " + "the dog " * 5).strip()]
    docs = spark.createDataFrame(
        [(1, text_rows[0])], "doc_id long, text string"
    )
    out = text.pmi_collocations(docs, min_count=5, k=10).collect()
    by_pair = {(r["x"], r["y"]): r for r in out}
    assert ("new", "york") in by_pair
    ny = by_pair[("new", "york")]
    assert ny["pair_count"] == 6
    # replicate: pmi = round(quantized ln(cxy*N/(cx*cy)) / 1e9, 6)
    total = len(text_rows[0].split(" ")) - 1
    cxy, cx, cy = 6, 6, 6
    exp = round(
        int(round(math.log(cxy * total / (cx * cy)) * 1e9)) / 1e9, 6
    )
    assert ny["pmi"] == exp
