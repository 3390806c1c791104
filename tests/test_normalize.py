"""normalize_text battery (operators/text.py): removal/collapse/NFC
semantics, NULL passthrough, idempotence, and parity with a pure-Python
reference over mixed messy inputs. All non-ASCII code points are
written as explicit escapes so the cases are unambiguous."""

from __future__ import annotations

import re
import unicodedata

from pw_etl_scrumptious_squad_spark.operators.text import normalize_text

ZWSP, ZWNJ, ZWJ, BOM = "​", "‌", "‍", "﻿"
NBSP = " "
E_ACUTE_DECOMPOSED = "é"  # NFC composes to U+00E9
E_ACUTE = "é"

CASES = [
    (0, "plain ascii text"),
    (1, "  leading and trailing   "),
    (2, "tabs\tand\nnewlines\r\nhere"),
    (3, f"zero{ZWSP}width{ZWNJ}join{ZWJ}er{BOM}bom"),
    (4, "ctrl\x01chars\x07gone\x7f!"),
    (5, f"nbsp{NBSP}separated{NBSP}words"),
    (6, f"caf{E_ACUTE_DECOMPOSED} composes"),
    (7, f"already caf{E_ACUTE} composed"),
    (8, None),
    (9, ""),
    (10, ZWSP + ZWSP),  # nothing left after stripping
    (11, f"mixed  \t caf{E_ACUTE_DECOMPOSED}{ZWSP} and more\x02junk  "),
]

_CTRL_ZW = (
    "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f" + ZWSP + ZWNJ + ZWJ + BOM + "]"
)
_WS = "[ \t\n\r" + NBSP + "]+"


def _ref(s):
    if s is None:
        return None
    s = re.sub(_CTRL_ZW, "", s)
    s = re.sub(_WS, " ", s).strip()
    return unicodedata.normalize("NFC", s)


def test_normalize_matches_python_reference(spark):
    df = spark.createDataFrame(CASES, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["text_norm"],
            r["changed"],
            r["n_chars_before"],
            r["n_chars_after"],
        )
        for r in normalize_text(df).collect()
    }
    assert len(got) == len(CASES)  # no row lost to the branch split
    for i, s in CASES:
        want = _ref(s)
        if s is None:
            assert got[i] == (None, None, None, None)
            continue
        assert got[i][0] == want, (i, s)
        assert got[i][1] == (want != s)
        assert got[i][2] == len(s)
        assert got[i][3] == len(want)


def test_normalize_specific_semantics(spark):
    df = spark.createDataFrame(CASES, "doc_id LONG, text STRING")
    norm = {
        r["doc_id"]: r["text_norm"] for r in normalize_text(df).collect()
    }
    assert norm[0] == "plain ascii text"
    assert norm[1] == "leading and trailing"
    assert norm[2] == "tabs and newlines here"
    assert norm[3] == "zerowidthjoinerbom"
    assert norm[4] == "ctrlcharsgone!"
    assert norm[5] == "nbsp separated words"
    assert norm[6] == f"caf{E_ACUTE} composes"  # NFC composed
    assert norm[7] == f"already caf{E_ACUTE} composed"  # untouched
    assert norm[9] == ""
    assert norm[10] == ""
    assert norm[11] == f"mixed caf{E_ACUTE} and morejunk"


def test_normalize_is_idempotent(spark):
    df = spark.createDataFrame(CASES, "doc_id LONG, text STRING")
    once = (
        normalize_text(df)
        .select("doc_id", "text_norm")
        .withColumnRenamed("text_norm", "text")
    )
    twice = {
        r["doc_id"]: r["text_norm"]
        for r in normalize_text(once).collect()
    }
    first = {r["doc_id"]: r["text"] for r in once.collect()}
    assert twice == first


def test_normalize_keep_cols_and_partitions(spark):
    rows = [(i, f"src{i % 3}", f"doc  {i} x") for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id LONG, source STRING, text STRING"
    ).repartition(7)
    out = normalize_text(df, keep_cols=("source",)).collect()
    assert len(out) == 40
    for r in out:
        assert r["source"] == f"src{r['doc_id'] % 3}"
        assert r["text_norm"] == f"doc {r['doc_id']} x"
