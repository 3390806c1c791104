"""Property-based tests (hypothesis): operator results must match
Python-computed ground truth on randomized small corpora — catches
edge cases the fixed testdata can't (empty docs, single tokens,
duplicate texts, hot keys)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.functions.columns import iso_day_of_week
from pw_etl_scrumptious_squad_spark.operators import dedup

VOCAB = [f"w{i}" for i in range(8)]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _ground_truth_pairs(texts, threshold):
    out = {}
    for i, a in enumerate(texts):
        for j in range(i + 1, len(texts)):
            sa, sb = set(a.split(" ")), set(texts[j].split(" "))
            jac = len(sa & sb) / len(sa | sb)
            if round(jac, 9) >= threshold:
                out[(i, j)] = round(jac, 9)
    return out


@given(texts=docs_strategy, threshold=st.sampled_from([0.3, 0.5, 0.9]))
@SLOW
def test_ngram_jaccard_matches_ground_truth(spark, texts, threshold):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", None, threshold
        ).collect()
    }
    assert got == _ground_truth_pairs(texts, threshold)


@given(texts=docs_strategy, threshold=st.sampled_from([0.3, 0.5, 0.9]))
@SLOW
def test_prefix_filter_pairs_match_ground_truth(spark, texts, threshold):
    # COMPLETENESS battery for the prefix-filter theorem: the candidate
    # stage keeps only each set's rarest n-ceil(t*n)+1 tokens, and the
    # result must still be EXACTLY the brute-force pair set — on random
    # corpora over a tiny shared vocabulary, the worst case for prefix
    # selectivity (every token frequent, heavy ties in the global order)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", None, threshold
        ).collect()
    }
    assert got == _ground_truth_pairs(texts, threshold)


def test_prefix_filter_wide_vocab_stays_on_prefix_path(spark):
    # The round-10 cost-based tier route sends degenerate (tiny-vocab)
    # corpora to the blocked all-pairs tier; this corpus pins the
    # OPPOSITE regime — every doc carries mostly-unique tokens, so
    # V >> 4*avg(n) and the route must keep the genuine prefix-filter
    # path, whose completeness this asserts against brute force.
    texts = [
        " ".join([f"u{i}_{j}" for j in range(6)] + ["shared_a", "shared_b"])
        for i in range(12)
    ]
    texts += [texts[0], texts[3]]  # exact dups -> guaranteed J=1.0 pairs
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    # route precondition for this corpus (documented decision rule):
    # vocabulary 74 > 4 * avg distinct tokens (8) -> prefix path
    assert 12 * 6 + 2 > 4 * 8
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.prefix_filter_jaccard_pairs(
            df, "doc_id", "text", None, 0.5
        ).collect()
    }
    assert got == _ground_truth_pairs(texts, 0.5)
    assert (0, 12) in got and got[(0, 12)] == 1.0


@given(texts=docs_strategy)
@SLOW
def test_identical_docs_always_lsh_candidates(spark, texts):
    # identical text => identical signature => collides in every band =>
    # must appear as a verified pair at any threshold
    doubled = list(texts) + list(texts)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doubled)], "doc_id LONG, text STRING"
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_dedup(
            df, "doc_id", "text", num_perm=8, bands=4, shingle_size=2,
            threshold=1.0,
        ).collect()
    }
    n = len(texts)
    for i in range(n):
        assert (i, i + n) in pairs


def test_iso_day_of_week_matches_python(spark):
    # the reference pins ISO weekday Mon=1..Sun=7 (SURVEY.md §2.2 R10);
    # python's date.isoweekday is the same contract. One Spark job over
    # a deterministic 111-year sweep (every 17 days, plus the leap/century
    # corners) instead of 30 hypothesis examples at one job each — the
    # old battery was 30 Spark round-trips (~20 s) for LESS coverage.
    import datetime as dt

    days = [
        dt.date(1990, 1, 1) + dt.timedelta(days=i)
        for i in range(0, (dt.date(2100, 12, 31) - dt.date(1990, 1, 1)).days, 17)
    ]
    days += [
        dt.date(2000, 2, 28), dt.date(2000, 2, 29), dt.date(2000, 3, 1),
        dt.date(2100, 2, 28), dt.date(2100, 3, 1),  # 2100 is NOT a leap year
        dt.date(1999, 12, 31), dt.date(2038, 1, 19),
    ]
    got = (
        spark.createDataFrame([(d,) for d in days], "d DATE")
        .select("d", iso_day_of_week(F.col("d")).alias("dow"))
        .collect()
    )
    assert len(got) == len(days)
    for r in got:
        assert r["dow"] == r["d"].isoweekday(), r["d"]


@given(
    batch1=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=6,
        unique_by=lambda r: r[0],
    ),
    batch2=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=6,
        unique_by=lambda r: r[0],
    ),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_upsert_idempotent_and_commutative_on_version(spark, tmp_path_factory, batch1, batch2):
    """Applying (b1, b2) must equal (b1, b2, b2) — redelivery is a no-op —
    and with a version column the final state is the per-key max version
    regardless of arrival order."""
    from pw_etl_scrumptious_squad_spark.sources.parquet import (
        read_table,
        upsert_table,
    )

    def run(batches):
        lake = str(tmp_path_factory.mktemp("ups"))
        for b in batches:
            df = spark.createDataFrame(
                [(k, f"v{k}-{ver}", ver) for k, ver in b],
                "id LONG, val STRING, ver INT",
            )
            upsert_table(spark, df, lake, "t", ["id"], order_col="ver")
        return {
            r["id"]: (r["val"], r["ver"])
            for r in read_table(spark, lake, "t").collect()
        }

    once = run([batch1, batch2])
    redelivered = run([batch1, batch2, batch2])
    assert once == redelivered
    # ground truth: per-key max version wins (ties keep either — the same
    # row, since val is derived from (k, ver))
    truth = {}
    for k, ver in batch1 + batch2:
        if k not in truth or ver >= truth[k]:
            truth[k] = ver
    assert {k: v[1] for k, v in once.items()} == truth


def test_approx_aggregates_within_tolerance(spark):
    """Sketch-backed approximate aggregates (the 100 TB substitutes for
    exact DISTINCT/percentile) must land within their documented error
    envelopes on real data: HLL++ count-distinct ~2% default rsd,
    approx_percentile exactly within the accuracy bound."""
    from pyspark.sql import functions as F
    from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

    o = read_table(spark, "/root/testdata/sf0.001", "orders")
    exact = o.select(
        F.countDistinct("o_custkey").alias("d"),
        F.expr("percentile(o_totalprice, 0.5D)").alias("p50"),
    ).first()
    approx = o.select(
        F.approx_count_distinct("o_custkey").alias("d"),
        F.expr("approx_percentile(o_totalprice, 0.5D, 10000)").alias("p50"),
    ).first()
    assert abs(approx["d"] - exact["d"]) / exact["d"] < 0.05
    assert abs(approx["p50"] - exact["p50"]) / exact["p50"] < 0.01


# ---------------------------------------------------------------------------
# snapshot_diff / apply_diff round trip
# ---------------------------------------------------------------------------

_snap_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=15),          # key
    st.tuples(
        st.sampled_from(["a", "b", "c"]),            # name
        st.one_of(st.none(), st.integers(0, 5)),     # nullable amt
    ),
    max_size=10,
)


@SLOW
@given(old_map=_snap_strategy, new_map=_snap_strategy)
def test_snapshot_diff_apply_round_trip(spark, old_map, new_map):
    """apply_diff(old, snapshot_diff(old, new)) == new, for ANY pair of
    snapshots — including NULL-valued cells, disjoint key sets, and
    identical tables (empty diff)."""
    from pw_etl_scrumptious_squad_spark.operators.cdc import (
        apply_diff,
        snapshot_diff,
    )

    schema = "k int, name string, amt int"
    old = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in old_map.items()], schema
    )
    new = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in new_map.items()], schema
    )
    diff = snapshot_diff(old, new, ["k"])
    # diff is minimal: unchanged keys never appear
    for r in diff.collect():
        assert old_map.get(r["k"]) != new_map.get(r["k"])
    rebuilt = {
        r["k"]: (r["name"], r["amt"])
        for r in apply_diff(old, diff, ["k"]).collect()
    }
    assert rebuilt == new_map


@given(texts=docs_strategy)
@SLOW
def test_drop_duplicate_spans_ground_truth(spark, texts):
    """Anchor-mode (default) span dedup vs a sequential Python scan: a
    full span survives iff the first occurrence of its content — as a
    k-window at ANY token offset, in (doc_id, offset) order — is its own
    position; partial tail spans dedup among themselves first-wins."""
    k = 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_dropped"])
        for r in dedup.drop_duplicate_spans(
            df, "doc_id", "text", span_tokens=k
        ).collect()
    }
    first_occ: dict[str, tuple[int, int]] = {}
    for i, text in enumerate(texts):
        toks = text.split(" ")
        for p in range(0, len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            first_occ.setdefault(g, (i, p))
    seen_partials: set[str] = set()
    for i, text in enumerate(texts):
        toks = text.split(" ")
        spans = [
            " ".join(toks[j : j + k]) for j in range(0, len(toks), k)
        ]
        kept = []
        for pos, s in enumerate(spans):
            if pos * k + k <= len(toks):  # full span: anchor semantics
                if first_occ[s] == (i, pos * k):
                    kept.append(s)
            else:  # partial tail: first-wins among partials
                if s not in seen_partials:
                    seen_partials.add(s)
                    kept.append(s)
        assert got[i] == (
            " ".join(kept),
            len(spans),
            len(spans) - len(kept),
        )


@given(texts=docs_strategy)
@SLOW
def test_drop_duplicate_spans_aligned_ground_truth(spark, texts):
    """Aligned-only mode vs the simple sequential first-wins scan over
    span-aligned content (the pre-anchor semantics, kept as the cheap
    tier)."""
    k = 3
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_dropped"])
        for r in dedup.drop_duplicate_spans(
            df, "doc_id", "text", span_tokens=k, anchor_unaligned=False
        ).collect()
    }
    seen: set[str] = set()
    for i, text in enumerate(texts):
        toks = text.split(" ")
        spans = [
            " ".join(toks[j : j + k]) for j in range(0, len(toks), k)
        ]
        kept = []
        for s in spans:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert got[i] == (
            " ".join(kept),
            len(spans),
            len(spans) - len(kept),
        )


def test_bigram_logprob_boilerplate_vs_rare(spark):
    """The dominant boilerplate document must out-score a unique-text
    document (its bigrams carry most of the corpus mass), and scores
    are <= 0 with exact n_bigrams counts; 1-token docs score NULL."""
    from pw_etl_scrumptious_squad_spark.operators import text as textops

    rows = [(i, "the quick brown fox jumps over dog") for i in range(20)]
    rows.append((100, "zebra quark nebula xylophone banjo"))
    rows.append((101, "solo"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in textops.bigram_logprob_scores(df).collect()
    }
    assert got[0][0] == 6 and got[100][0] == 4 and got[101] == (0, None)
    # boilerplate bigrams: every w1 appears 20x, always followed the
    # same way -> P=1 -> score 0; rare doc's bigrams are unique among
    # shared-prefix unigrams -> strictly negative... here all unigrams
    # are doc-local so P=1 too; make one overlap to force P<1
    rows2 = rows + [(102, "the slow brown cat naps")]
    df2 = spark.createDataFrame(rows2, "doc_id LONG, text STRING")
    got2 = {
        r["doc_id"]: r["avg_logprob"]
        for r in textops.bigram_logprob_scores(df2).collect()
    }
    assert got2[0] is not None and got2[102] is not None
    assert got2[0] > got2[102]  # boilerplate out-scores the deviant doc
    assert all(v is None or v <= 0 for v in got2.values())


def test_bm25_ranks_matching_docs_and_idf_weighting(spark):
    """Docs containing query terms beat docs without; a doc matching the
    RARE query term out-scores one matching the COMMON term the same
    number of times (idf weighting); scores are non-negative ppb ints."""
    from pw_etl_scrumptious_squad_spark.operators import text as textops

    rows = [(i, "common filler words here common") for i in range(10)]
    # 'widget' appears in many docs (low idf), 'rarity' in one (high idf)
    for i in range(5):
        rows.append((20 + i, "widget stuff and more widget stuff"))
    rows.append((30, "rarity stuff and more rarity stuff"))
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = textops.bm25_topk(df, ["widget", "rarity"], k=20).collect()
    scores = {r["doc_id"]: r["score_ppb"] for r in got}
    ranked = [r["doc_id"] for r in got]
    assert all(s >= 0 for s in scores.values())
    # the rare-term doc must rank first
    assert ranked[0] == 30
    # every matching doc out-scores every non-matching doc (score 0)
    for i in range(5):
        assert scores[20 + i] > 0
    assert all(scores.get(i, 0) == 0 for i in range(10) if i in scores)


def test_gopher_quality_flags_each_rule(spark):
    """One fixture doc per failing rule; drop_reason names the FIRST
    failing rule in battery order and a clean doc keeps."""
    from pw_etl_scrumptious_squad_spark.operators import text as textops

    clean = " ".join(
        ["the and valid words of normal length appear here often"] * 5
    )
    rows = [
        (0, clean),  # passes everything (50 words, stopwords present)
        (1, "too short"),  # word_count
        (2, " ".join(["a"] * 50)),  # mean_word_len < 2 (after word_count ok)
        (3, " ".join(["the and of to in"] * 8 + ["x9!"] * 15)),  # nonalpha>0.2
        (4, " ".join(f"w{chr(97 + i % 26)}q" for i in range(50))),  # no stopwords
        (5, "the and " + " ".join(["dup"] * 48)),  # repetition
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (bool(r["keep"]), r["drop_reason"])
        for r in textops.gopher_quality(df).collect()
    }
    assert got[0] == (True, "")
    assert got[1] == (False, "word_count")
    assert got[2] == (False, "mean_word_len")
    assert got[3] == (False, "nonalpha")
    assert got[4] == (False, "stopwords")
    assert got[5] == (False, "repetition")


def _shingle_set(text, k=5):
    toks = text.split(" ")
    if len(toks) >= k:
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)}


def _ground_truth_containment(texts, threshold, k=5):
    out = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            sa, sb = _shingle_set(texts[i], k), _shingle_set(texts[j], k)
            inter = len(sa & sb)
            lo = min(len(sa), len(sb))
            if inter / lo >= threshold:
                out[(i, j)] = (inter, round(inter / lo, 6), int(inter == lo))
    return out


@given(texts=docs_strategy, threshold=st.sampled_from([0.5, 0.8, 1.0]))
@SLOW
def test_containment_pairs_match_ground_truth(spark, texts, threshold):
    """containment_pairs == brute-force overlap coefficient over distinct
    shingle sets, including the short-doc whole-text fallback."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_shared"], r["overlap_coef"], r["contained"]
        )
        for r in dedup.containment_pairs(df, threshold=threshold).collect()
    }
    assert got == _ground_truth_containment(texts, threshold)


def test_bm25_hostile_terms_and_empty_query(spark):
    """Query terms are carried as literal Columns, so quotes and
    backslashes in the vocabulary match literally instead of breaking
    the expression; an empty term list scores every doc 0 without a
    parse error."""
    from pw_etl_scrumptious_squad_spark.operators import text as textops

    rows = [
        (0, r"path c:\temp\x and more words"),
        (1, "it's quoted don't worry here now"),
        (2, "plain words only in this doc here"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["score_ppb"]
        for r in textops.bm25_topk(df, [r"c:\temp\x", "it's"], k=10).collect()
    }
    assert got[0] > 0          # backslash term matched literally
    assert got[1] > 0          # apostrophe term matched literally
    assert got[2] == 0
    empty = textops.bm25_topk(df, [], k=10).collect()
    assert len(empty) == 3
    assert all(r["score_ppb"] == 0 for r in empty)


def test_gopher_top_token_ratio_single_pass_matches_naive(spark):
    """The run-length-over-sorted-array max-frequency equals the naive
    per-distinct count on every composition, including all-identical
    and all-distinct extremes."""
    from collections import Counter

    from pw_etl_scrumptious_squad_spark.operators import text as textops

    docs = [
        (0, " ".join(["same"] * 60)),
        (1, " ".join(f"w{i}" for i in range(60))),
        (2, " ".join(["the"] * 10 + ["and"] * 5 + ["word"] * 45)),
        (3, "interleaved a b a b a b a c c c c c c c c c c c c"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["top_token_ratio"], r["n_words"])
        for r in textops.gopher_quality(df).collect()
    }
    for doc_id, text in docs:
        toks = text.split()
        expected = round(Counter(toks).most_common(1)[0][1] / len(toks), 6)
        assert abs(got[doc_id][0] - expected) < 1e-9, doc_id


# ----- round-10 operators under hypothesis -----

@given(
    vals=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), min_size=1,
        max_size=60,
    ),
    p=st.sampled_from([1, 50, 90, 99, 100]),
)
@SLOW
def test_quantile_sketch_envelope_and_small_exactness(spark, vals, p):
    from pw_etl_scrumptious_squad_spark.operators.stats import (
        quantile_sketch,
        sketch_quantiles,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v BIGINT")
    got = sketch_quantiles(
        quantile_sketch(df, "v", sub_bits=7), (p,), sub_bits=7
    ).first()["value"]
    s = sorted(vals)
    exact = s[(len(s) - 1) * p // 100]
    # representative is toward zero with relative error < 2^-6
    assert abs(got) <= abs(exact) or exact == 0
    assert abs(got - exact) <= max(1, abs(exact)) * 2 ** (1 - 7)


@pytest.mark.extended  # ~19 s battery; default tier: test_unigram.py
# trainer/encoder parity + the w21 oracle twin
@given(texts=docs_strategy)
@SLOW
def test_unigram_viterbi_matches_python_dp(spark, texts):
    """Spark's JVM-aggregate Viterbi must equal a plain Python DP for
    every word under an arbitrary small trained vocab."""
    from pw_etl_scrumptious_squad_spark.operators.text import (
        unigram_encode,
        unigram_train,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    vocab = unigram_train(
        df, vocab_size=12, max_piece_len=3, seed_size=24, iters=1
    )
    costs = {r["piece"]: r["cost_q"] for r in vocab.collect()}
    if not costs:
        return
    K = max(len(x) for x in costs)
    got = {
        r["doc_id"]: (r["n_pieces"], r["total_cost_q"])
        for r in unigram_encode(df, vocab).collect()
    }
    BIG = 10**15
    for i, t in enumerate(texts):
        words = [w for w in t.lower().split(" ") if w]
        tot_c = tot_n = 0
        for w in words:
            dp = [(0, 0)]
            for j in range(1, len(w) + 1):
                best = (BIG, 0)
                for l in range(1, min(j, K) + 1):
                    c = costs.get(w[j - l : j])
                    if c is None:
                        continue
                    cand = (dp[j - l][0] + c, dp[j - l][1] + 1)
                    if cand < best:
                        best = cand
                dp.append(best)
            tot_c += dp[-1][0]
            tot_n += dp[-1][1]
        assert got[i] == (tot_n, tot_c), (t, got[i], (tot_n, tot_c))


@given(
    keys=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1, max_size=40, unique=True,
    ),
)
@pytest.mark.extended  # ~15 s battery; default tier: test_layout /
# test_join_opt bloom tests + the w23 oracle twin
@SLOW
def test_bloom_sidecar_never_misses_any_present_key(spark, tmp_path_factory, keys):
    from pw_etl_scrumptious_squad_spark.operators import layout as L

    tmp = tmp_path_factory.mktemp("bloomprop")
    df = spark.createDataFrame([(k, f"r{k}") for k in keys], "k BIGINT, s STRING")
    path = str(tmp / "lay")
    df.repartition(4).write.mode("overwrite").parquet(path)
    L.write_bloom_sidecar(spark, path, "k", m_bits=1 << 12, n_hashes=3)
    out, n_sel, n_tot = L.read_with_bloom(spark, path, "k", keys)
    # EVERY present key must survive the skip — no false negatives
    assert sorted(r["k"] for r in out.collect()) == sorted(keys)


# ---------------------------------------------------------------------------
# Round-10 continuation sketches / tokenizers
# ---------------------------------------------------------------------------

items_strategy = st.lists(
    st.sampled_from([f"k{i}" for i in range(12)]),
    min_size=1,
    max_size=40,
)


@given(items=items_strategy, width=st.sampled_from([4, 16, 64]))
@SLOW
def test_cms_one_sided_on_random_multisets(spark, items, width):
    from collections import Counter

    from pw_etl_scrumptious_squad_spark.operators import sketches as sk

    df = spark.createDataFrame([(t,) for t in items], "item STRING")
    sketch = sk.cms_sketch(df, depth=3, width=width)
    probes = spark.createDataFrame(
        [(t,) for t in sorted(set(items))] + [("absent-key",)],
        "item STRING",
    )
    est = {
        r["item"]: r["est_count"]
        for r in sk.cms_estimate(
            sketch, probes, depth=3, width=width
        ).collect()
    }
    truth = Counter(items)
    for t, n in truth.items():
        assert est[t] >= n  # NEVER an undercount, any width
    assert est["absent-key"] >= 0


@given(
    a=st.lists(st.integers(0, 400), min_size=1, max_size=60),
    b=st.lists(st.integers(200, 600), min_size=1, max_size=60),
    k=st.sampled_from([4, 16]),
)
@SLOW
def test_kmv_merge_head_property_on_random_sets(spark, a, b, k):
    """The k smallest distinct hashes of a union must be computable
    from the per-group heads alone — for ANY inputs and k."""
    from pw_etl_scrumptious_squad_spark.operators import sketches as sk

    rows = [("a", f"i{x}") for x in a] + [("b", f"i{x}") for x in b]
    df = spark.createDataFrame(rows, "grp STRING, item STRING")
    per = {
        r["grp"]: r["hs"] for r in sk.kmv_sketch(df, "grp", k=k).collect()
    }
    direct = [
        r["hs"]
        for r in sk.kmv_sketch(
            df.withColumn("grp", F.lit("u")), "grp", k=k
        ).collect()
    ][0]
    merged_head = sorted(
        set(per.get("a", [])) | set(per.get("b", []))
    )[:k]
    assert direct == merged_head


@given(
    texts=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    )
)
@pytest.mark.extended  # ~15 s battery; default tier: test_wordpiece
# trainer-vs-reference parity + the w27 oracle twin
@SLOW
def test_wordpiece_roundtrip_of_trained_vocab_has_no_unk(spark, texts):
    """Encoding the EXACT corpus a WordPiece vocab was trained on can
    never hit [UNK]: the alphabet alone covers every word."""
    from pw_etl_scrumptious_squad_spark.operators import text as T

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    merges = T.wordpiece_train(df, num_merges=4)
    pieces = T.wordpiece_alphabet(df) + [
        r["merged"] for r in merges.collect()
    ]
    out = T.wordpiece_encode(df, pieces).collect()
    assert sum(r["n_unk_words"] for r in out) == 0
    for r in out:
        assert r["n_pieces"] >= r["n_words"]  # >= one piece per word
