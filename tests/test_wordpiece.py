"""WordPiece battery (operators/text.py::wordpiece_train/encode):
token-for-token parity of the distributed trainer against a pure-Python
sequential twin (the y51/y88 rows-only posture — integer fixed-point
scoring makes the comparison exact, no epsilon), greedy-encoder parity,
and [UNK] semantics."""

from __future__ import annotations

from collections import Counter

from pw_etl_scrumptious_squad_spark.operators.text import (
    _WP_SCALE,
    wordpiece_alphabet,
    wordpiece_encode,
    wordpiece_train,
)


def py_wordpiece_train(texts, num_merges=30, min_pair_count=2):
    """Sequential reference trainer: identical scoring (BIGINT
    fixed-point likelihood), identical argmax tie-break (score desc,
    pair count desc, pair lexicographic), identical greedy merge
    application."""
    words = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if w:
                words[w] += 1
    table = [
        [[w[0]] + ["##" + c for c in w[1:]], f] for w, f in words.items()
    ]
    learned = []
    while len(learned) < num_merges:
        pc: Counter = Counter()
        fc: Counter = Counter()
        for s, f in table:
            for sym in s:
                fc[sym] += f
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), c = min(
            pc.items(),
            key=lambda kv: (
                -(kv[1] * _WP_SCALE // (fc[kv[0][0]] * fc[kv[0][1]])),
                -kv[1],
                kv[0][0],
                kv[0][1],
            ),
        )
        if c < min_pair_count:
            break
        score = c * _WP_SCALE // (fc[left] * fc[right])
        merged = left + right[2:]
        learned.append(
            (len(learned), left, right, merged, c, score)
        )
        for ent in table:
            s = ent[0]
            new: list[str] = []
            for x in s:
                if new and new[-1] == left and x == right:
                    new[-1] = merged
                else:
                    new.append(x)
            ent[0] = new
    return learned


def py_wordpiece_encode_word(word, piece_set, max_len):
    pos, n = 0, 0
    while pos < len(word):
        plen = None
        for length in range(min(max_len, len(word) - pos), 0, -1):
            key = (
                word[pos:pos + length]
                if pos == 0
                else "##" + word[pos:pos + length]
            )
            if key in piece_set:
                plen = length
                break
        if plen is None:
            return 1, True  # [UNK]
        pos += plen
        n += 1
    return n, False


SYNTH = [
    "running runner runs rerun unrun",
    "walking walker walks walked walked walking",
    "unhappy unkind unfit happy kind fit",
    "zzz zzz zzz aaa aaa aab abb",
    "the quick brown fox jumps over the lazy dog",
    "running walking running walking kind kind",
]


def test_trainer_matches_python_reference_on_synthetic(spark):
    df = spark.createDataFrame([(t,) for t in SYNTH], "text STRING")
    got = [
        tuple(r)
        for r in wordpiece_train(df, num_merges=12).orderBy("rank").collect()
    ]
    want = py_wordpiece_train(SYNTH, num_merges=12)
    assert got == want


def test_trainer_matches_python_reference_on_documents(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(80)
        .cache()
    )
    texts = [r["text"] for r in docs.select("text").collect()]
    got = [
        tuple(r)
        for r in wordpiece_train(docs, num_merges=8).orderBy("rank").collect()
    ]
    want = py_wordpiece_train(texts, num_merges=8)
    assert got == want


def test_trainer_stops_below_min_pair_count(spark):
    df = spark.createDataFrame(
        [("ab cd ef",)], "text STRING"
    )  # every pair occurs once
    got = wordpiece_train(df, num_merges=5, min_pair_count=2).collect()
    assert got == []


def test_encoder_matches_python_greedy_and_flags_unk(spark):
    df = spark.createDataFrame([(t,) for t in SYNTH], "text STRING")
    merges = wordpiece_train(df, num_merges=12).collect()
    pieces = wordpiece_alphabet(df) + [r["merged"] for r in merges]
    pset = set(pieces)
    max_len = max(
        len(p) - 2 if p.startswith("##") else len(p) for p in pieces
    )

    cases = SYNTH + ["running qqq unknownX walked", "@@@ ###"]
    cdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id LONG, text STRING"
    ).repartition(5)
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_pieces"],
            r["n_unk_words"],
        )
        for r in wordpiece_encode(cdf, pieces).collect()
    }
    for i, t in enumerate(cases):
        ws = [w for w in t.lower().split(" ") if w]
        enc = [py_wordpiece_encode_word(w, pset, max_len) for w in ws]
        want = (
            len(ws),
            sum(n for n, _ in enc),
            sum(1 for _, u in enc if u),
        )
        assert got[i] == want, (i, t)
    # the synthetic-unknown doc must actually exercise [UNK]
    assert got[len(SYNTH)][2] >= 1
    assert got[len(SYNTH) + 1][2] == 2


def test_encoder_word_start_vs_continuation_distinction(spark):
    # 'a' bare and '##a' are DIFFERENT pieces: a vocab with only the
    # bare form cannot continue a word with it
    df = spark.createDataFrame([(0, "aa a")], "doc_id LONG, text STRING")
    out = {
        r["doc_id"]: (r["n_pieces"], r["n_unk_words"])
        for r in wordpiece_encode(df, ["a"]).collect()
    }
    # 'aa' -> matches 'a' at start, then needs '##a' (absent) -> UNK;
    # 'a' -> one piece
    assert out[0] == (2, 1)
    out2 = {
        r["doc_id"]: (r["n_pieces"], r["n_unk_words"])
        for r in wordpiece_encode(df, ["a", "##a"]).collect()
    }
    assert out2[0] == (3, 0)
