"""Unigram-LM tokenizer (operators/text.py::unigram_train/encode):
bit-exact parity against an independently written pure-Python
sequential reference (the y51 BPE posture — the trainer is iterative
EM, not SQL-expressible, so the twin IS the oracle), plus coverage
sentinel, partition invariance, and the empty edge. Encode value
parity vs DuckDB additionally rides the catalog oracle
(y89_unigram_encode's recursive-CTE path enumeration)."""

import math

from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators.text import (
    unigram_encode,
    unigram_train,
)
from pw_etl_scrumptious_squad_spark.sources.parquet import read_table

SF = "/root/testdata/sf0.001"
BIG = 10**15


# ----- pure-Python reference (independent sequential implementation) -----

def _py_costs(counts):
    total = sum(counts.values())
    return {
        p: int(round(-math.log(c / total) * 1_000_000_000.0))
        for p, c in counts.items()
    }


def _py_viterbi(w, costs, K, with_tokens):
    dp = [(0, 0, ())]
    for j in range(1, len(w) + 1):
        best = (BIG, 0, ())
        for l in range(1, min(j, K) + 1):
            piece = w[j - l : j]
            c = costs.get(piece)
            if c is None:
                continue
            prev = dp[j - l]
            cand = (prev[0] + c, prev[1] + 1, prev[2] + (piece,))
            if with_tokens:
                if (cand[0], cand[1], " ".join(cand[2])) < (
                    best[0], best[1], " ".join(best[2])
                ):
                    best = cand
            else:
                if (cand[0], cand[1]) < (best[0], best[1]):
                    best = cand
        dp.append(best)
    return dp[len(w)]


def _py_train(word_freq, vocab_size, K, seed_size, iters):
    subs = {}
    for w, f in word_freq.items():
        for i in range(len(w)):
            for l in range(1, min(K, len(w) - i) + 1):
                p = w[i : i + l]
                subs[p] = subs.get(p, 0) + f
    singles = {p: c for p, c in subs.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in subs.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, seed_size - len(singles))]
    counts = {**singles, **dict(multis)}
    if not counts:
        return []
    costs = _py_costs(counts)

    def recount(cur):
        new = {}
        for w, f in word_freq.items():
            _, _, toks = _py_viterbi(w, cur, K, with_tokens=True)
            for p in toks:
                new[p] = new.get(p, 0) + f
        return new

    for _ in range(iters):
        new = recount(costs)
        counts = {
            p: max(new.get(p, 0), 1) if len(p) == 1 else new[p]
            for p in counts
            if len(p) == 1 or new.get(p, 0) > 0
        }
        costs = _py_costs(counts)
    keep_multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, vocab_size - len(singles))]
    counts = {
        **{p: c for p, c in counts.items() if len(p) == 1},
        **dict(keep_multi),
    }
    costs = _py_costs(counts)
    new = recount(costs)
    counts = {p: max(new.get(p, 0), 1) for p in counts}
    costs = _py_costs(counts)
    out = sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))
    return [(i + 1, p, c, costs[p]) for i, (p, c) in enumerate(out)]


def _word_freq(spark, docs, text_col="text"):
    rows = (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    return {r["w"]: int(r["count"]) for r in rows}


CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the hat"),
    (3, "a cat and a hat sat"),
    (4, "mats and hats and cats"),
    (5, "on and on and on"),
]


def test_train_parity_small_corpus(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")
    got = [
        (r["rank"], r["piece"], r["n_count"], r["cost_q"])
        for r in unigram_train(
            docs, vocab_size=16, max_piece_len=3, seed_size=32, iters=3
        ).orderBy("rank").collect()
    ]
    want = _py_train(_word_freq(spark, docs), 16, 3, 32, 3)
    assert got == want


def test_train_parity_real_documents(spark):
    docs = read_table(spark, SF, "documents")
    got = [
        (r["rank"], r["piece"], r["n_count"], r["cost_q"])
        for r in unigram_train(
            docs, vocab_size=48, max_piece_len=4, seed_size=128, iters=2
        ).orderBy("rank").collect()
    ]
    want = _py_train(_word_freq(spark, docs), 48, 4, 128, 2)
    assert got == want


def test_encode_parity_and_tie_robust_contract(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")
    vocab = unigram_train(
        docs, vocab_size=16, max_piece_len=3, seed_size=32, iters=2
    )
    costs = {r["piece"]: r["cost_q"] for r in vocab.collect()}
    K = max(len(p) for p in costs)
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_pieces"], r["total_cost_q"],
            r["pieces_per_word"],
        )
        for r in unigram_encode(docs, vocab).collect()
    }
    for doc_id, text in CORPUS:
        words = [w for w in text.lower().split(" ") if w]
        per = [_py_viterbi(w, costs, K, with_tokens=False) for w in words]
        n_pieces = sum(p[1] for p in per)
        total = sum(p[0] for p in per)
        assert got[doc_id] == (
            len(words), n_pieces, total,
            round(n_pieces / len(words), 9),
        )


def test_encode_uncovered_char_hits_sentinel_not_crash(spark):
    docs = spark.createDataFrame(
        [(1, "abc xyz")], "doc_id BIGINT, text STRING"
    )
    # vocab covers a/b/c only: 'xyz' is unsegmentable
    out = unigram_encode(
        docs, {"a": 10, "b": 10, "c": 10, "ab": 5}
    ).collect()
    assert len(out) == 1
    assert out[0]["total_cost_q"] >= 10**14


def test_train_is_partition_invariant(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")
    a = unigram_train(
        docs.repartition(1), vocab_size=12, max_piece_len=3,
        seed_size=24, iters=2,
    ).orderBy("rank").collect()
    b = unigram_train(
        docs.repartition(17), vocab_size=12, max_piece_len=3,
        seed_size=24, iters=2,
    ).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_empty_corpus_yields_empty_vocab(spark):
    docs = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    out = unigram_train(docs)
    assert out.count() == 0
    assert out.columns == ["rank", "piece", "n_count", "cost_q"]


def test_multichar_pieces_actually_win(spark):
    # a corpus dominated by one word must learn it as a piece and
    # encode it as ONE token (fertility 1.0 for that word)
    docs = spark.createDataFrame(
        [(i, "spark spark spark code") for i in range(10)],
        "doc_id BIGINT, text STRING",
    )
    vocab = unigram_train(
        docs, vocab_size=24, max_piece_len=5, seed_size=64, iters=3
    )
    pieces = {r["piece"] for r in vocab.collect()}
    assert "spark" in pieces
    enc = unigram_encode(docs, vocab).first()
    assert enc["n_pieces"] < enc["n_words"] * 2
