"""BPE tokenizer training + char-entropy: exact parity against
pure-Python references.

bpe_train has no SQL oracle (iterative argmax-per-round is not
SQL-expressible), so THIS file is its correctness gate: a scan-and-skip
greedy reference implementation must match the distributed fold
merge-for-merge, including the deterministic tie-break and the
min_pair_count early stop. char_entropy is oracle-backed (y52) but the
closed-form values here pin the quantization independent of DuckDB.
"""

from __future__ import annotations

import pytest

from collections import Counter

from pw_etl_scrumptious_squad_spark.operators import text


def _ref_bpe(texts, num_merges, min_pair_count=2):
    """Reference BPE (Sennrich et al. 2016): greedy scan-and-skip merge
    application, argmax by (count desc, left asc, right asc)."""
    words: Counter = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                words[w] += 1
    syms = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, f in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        (left, right), count = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if count < min_pair_count:
            break
        merges.append((rank, left, right, left + right, count))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "the lowest newest the the",
    "low new lower the widest wide wide",
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id LONG, text STRING"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in text.bpe_train(docs, num_merges=12, checkpoint_every=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == _ref_bpe(TEXTS, 12)


def test_bpe_train_early_stop_and_overlap(spark):
    # 'aaaa' stresses the overlap rule: greedy left-to-right yields
    # (aa)(aa), never the overlapping middle pair; min_pair_count=3
    # stops training before the singleton tail pairs
    texts = ["aaaa aaaa aaaa", "aa aa"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in text.bpe_train(docs, num_merges=50, min_pair_count=3)
        .orderBy("rank")
        .collect()
    ]
    ref = _ref_bpe(texts, 50, min_pair_count=3)
    assert got == ref
    assert len(got) < 50  # early stop actually triggered


def test_char_entropy_closed_form(spark):
    docs = spark.createDataFrame(
        [(1, "aabb"), (2, "abcd"), (3, "aaa"), (4, "")],
        "doc_id LONG, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in text.char_entropy(docs).collect()
    }
    assert set(rows) == {1, 2, 3}  # empty doc excluded
    assert rows[1]["n_chars"] == 4 and rows[1]["n_distinct"] == 2
    assert rows[1]["entropy_nats"] == 0.693147  # ln 2, ppb-quantized
    assert rows[2]["entropy_nats"] == 1.386294  # ln 4
    assert rows[3]["n_distinct"] == 1
    assert rows[3]["entropy_nats"] == 0.0  # integer negation: never -0.0


def test_bpe_train_batched_parity_and_round_trips(spark):
    """batch_merges must be TOKEN-FOR-TOKEN equal to sequential training
    on a disjoint-friendly corpus, while provably cutting driver
    round-trips: driver_rounds <= single_merge_rounds +
    ceil(num_merges / m)."""
    import math

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id LONG, text STRING"
    )
    stats: dict = {}
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in text.bpe_train(
            docs, num_merges=12, checkpoint_every=3, batch_merges=4,
            stats=stats,
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == _ref_bpe(TEXTS, 12)
    assert stats["driver_rounds"] <= stats["single_merge_rounds"] + math.ceil(
        12 / 4
    )
    assert stats["driver_rounds"] < 12  # actually batched somewhere


@pytest.mark.extended  # ~22 s; default tier: the deterministic trainer
# parity tests above cover the same batched-vs-sequential contract
def test_bpe_train_batched_forces_fallback(spark):
    """Interaction-heavy corpora must degrade to sequential semantics:
    chained pairs (every top pair shares a symbol with the previous one)
    and a symbol-collision corpus (a pre-existing 'ab' symbol colliding
    with the (a,b)->'ab' merge output) both force the single-merge
    fallback, and values still match the reference exactly."""
    cases = [
        # chained: (a,b) then (ab,c) then (abc,d)... every round interacts
        ["abcd abcd abcd abcd", "abc abc", "ab ab"],
        # overlap self-pair: aaaa... (a,a) -> (aa,aa) chains
        ["aaaaaaaa aaaa aaaa", "aaaa aa"],
        # merged-token/string collision plus ties
        ["xy xy x y x y", "zx zy xz yz", "x y z xy"],
        # SELF-OVERLAP + disjoint mid-count pair (the round-6 advice
        # repro): 'aaaaaa' freq 10 gives (a,a)=50 and, post-merge,
        # (aa,aa)=20; the disjoint (x,y)=15 sits strictly between the
        # strict-count stop (10, from (y,</w>)) and 20, so a batched
        # round that accepts (x,y) alongside (a,a) would order it
        # ahead of (aa,aa) — sequential picks (aa,aa) first. The
        # self-overlap batch-breaker must force (a,a) to merge alone.
        [
            " ".join(["aaaaaa"] * 10),
            " ".join(["xy"] * 10),
            " ".join(["xyw"] * 5),
        ],
    ]
    for texts in cases:
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
        )
        for m in (2, 4, 8):
            stats: dict = {}
            got = [
                (r["rank"], r["left"], r["right"], r["merged"],
                 r["pair_count"])
                for r in text.bpe_train(
                    docs, num_merges=10, batch_merges=m, stats=stats
                )
                .orderBy("rank")
                .collect()
            ]
            assert got == _ref_bpe(texts, 10), (texts, m)


@pytest.mark.extended  # ~26 s randomized battery; same contract as the
# deterministic parity tests in the default tier
def test_bpe_train_batched_randomized_parity(spark):
    """Randomized corpora (seeded): batched == sequential == reference
    for several batch sizes."""
    import random

    rng = random.Random(406)
    alphabet = "abcdef"
    for trial in range(4):
        texts = [
            " ".join(
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randint(1, 6))
                )
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(6)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
        )
        ref = _ref_bpe(texts, 15)
        for m in (3, 7):
            got = [
                (r["rank"], r["left"], r["right"], r["merged"],
                 r["pair_count"])
                for r in text.bpe_train(docs, num_merges=15, batch_merges=m)
                .orderBy("rank")
                .collect()
            ]
            assert got == ref, (trial, m, texts)
