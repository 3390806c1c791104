"""Deduplication operators for training-data pipelines (north-star
extensions — no reference counterpart, SURVEY.md §2.4).

Scale design:
- **Exact dedup** is a hash aggregation on the content key (or its md5 for
  wide text) — one shuffle, map-side partial aggregation for free.
- **Near-dup (MinHash + LSH)** avoids the O(n^2) pair space: shingle ->
  K minhashes -> B bands; only documents sharing a band bucket are paired,
  then verified with exact Jaccard. Every step is built-in higher-order
  SQL functions (split/transform/aggregate/md5/conv) — JVM-side, no UDFs.
- **SimHash** uses explode + a generated per-bit aggregation (still
  built-ins); Hamming-near pairs come from banding the simhash bits.
- All hash functions derive from md5, so results are deterministic and
  engine-independent (reproducible in the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.operators.text import (
    _SQL_SHINGLES,
    with_shingles,
)


# Bitmask fast-path vocabulary cap: ceil(1024/64) = 16 mask words keeps the
# per-pair expression small while covering dictionary-sized vocabularies.
_BITMASK_VOCAB_CAP = 1024


def _bit_literal(bit: int) -> str:
    """Spark SQL long literal for 1<<bit; bit 63 must be written as the
    negative two's-complement value (9223372036854775808L overflows)."""
    v = 1 << bit
    if bit == 63:
        v -= 1 << 64
    return f"{v}L"


def dedup_exact(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct key, with the
    duplicate count. Equivalent to ``dropDuplicates`` but deterministic about
    WHICH row survives (dropDuplicates keeps an arbitrary first)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 16,
    shingle_size: int = 5,
) -> DataFrame:
    """MinHash signature per document: ``minhash`` array<bigint> of length
    ``num_perm``. Narrow projections only — no shuffle.

    Per permutation p: min over shingles of a 60-bit integer hash =
    first 15 hex digits of md5('<p>|<shingle md5>') via conv(hex, 16, 10).
    Deterministic and engine-independent. The shingle-md5 array is
    materialized once per row (``with_shingles``) and shared by all
    ``num_perm`` mins — 6x faster than recomputing shingles per
    permutation at num_perm=16."""
    sig = F.array(
        *[
            F.expr(
                f"array_min(transform({_SQL_SHINGLES}, s -> cast(conv("
                f"substring(md5(concat('{p}|', s)), 1, 15), 16, 10) as bigint)))"
            )
            for p in range(num_perm)
        ]
    )
    return with_shingles(df, text_col, shingle_size).select(
        F.col(id_col).alias("doc_id"), sig.alias("minhash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4
) -> DataFrame:
    """LSH banding: split each signature into ``bands`` equal bands, bucket
    on (band index, band content), self-join buckets -> distinct candidate
    pairs (a < b).

    The self-join shuffles on the bucket key only; bucket sizes are the skew
    risk — callers at extreme scale should salt giant buckets or cap them
    (a bucket with millions of identical signatures is itself the answer).
    """
    # rows per band derived from the signature length (tiny driver-side peek)
    sig_len = signatures.selectExpr("size(minhash) AS n").first()["n"]
    rows_per_band = sig_len // bands
    band_rows = []
    for b in range(bands):
        start = b * rows_per_band + 1
        band_rows.append(
            F.struct(
                F.lit(b).alias("band"),
                F.expr(
                    f"concat_ws(',', transform(slice(minhash, {start}, {rows_per_band}),"
                    f" x -> cast(x as string)))"
                ).alias("sig"),
            )
        )
    buckets = signatures.select(
        "doc_id", F.explode(F.array(*band_rows)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.sig").alias("sig"))
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs; keeps pairs at or
    above ``threshold``. The shingle arrays are recomputed per side — a
    projection, not a shuffle; the joins shuffle on doc ids only."""
    shingled = with_shingles(docs, text_col, shingle_size).select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(F.col(_SQL_SHINGLES)).alias("sh"),
    )
    a = shingled.alias("a")
    b = shingled.alias("b")
    return (
        pairs.join(a, pairs["doc_a"] == F.col("a.doc_id"))
        .join(b, pairs["doc_b"] == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh")),
                9,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    shingle_size: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """End-to-end fuzzy dedup: returns verified near-duplicate pairs
    (doc_a < doc_b, exact-Jaccard >= threshold) found via MinHash LSH.

    Signatures are materialized (localCheckpoint) before banding: the
    bucket self-join scans them twice and the band explode is a generator,
    so an unmaterialized plan re-runs the shingle/md5 pipeline ~2x bands
    times. At cluster scale this checkpoint is the signatures table you
    would persist anyway (8-16 longs per doc vs re-hashing the corpus)."""
    sigs = minhash_signatures(
        df, id_col, text_col, num_perm, shingle_size
    ).localCheckpoint()
    pairs = lsh_candidate_pairs(sigs, bands)
    return jaccard_verify(pairs, df, id_col, text_col, shingle_size, threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    block_col: str | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Token-set Jaccard over blocked pairs (exact, no LSH): pairs share the
    ``block_col`` value (cheap blocking key — language, length bucket). The
    O(block^2) pair space makes this the small/medium-scale or
    verification-path tool; MinHash-LSH is the 100 TB path.

    The block count is usually tiny (5 languages), which would starve a
    shuffle join down to that many tasks; broadcasting one side keeps
    parallelism at the left side's partition count. |union| is computed as
    |a|+|b|-|intersect| so only the intersection is materialized per pair.

    Adaptive small-vocabulary fast path: when the corpus has at most
    ``_BITMASK_VOCAB_CAP`` distinct tokens, each token SET is
    dictionary-encoded into ceil(V/64) 64-bit mask words and the per-pair
    Jaccard collapses to bitwise ANDs + popcounts
    (sum_w bit_count(a[w]&b[w]) / (|a|+|b|-inter)) — measured 5x faster
    than array_intersect on ~30-element arrays at V=31. The vocabulary
    probe is a single distinct-scan capped with LIMIT cap+1 (never
    collects more than cap+1 rows to the driver), a negligible pre-pass
    next to the O(block^2) pair stage; larger vocabularies fall back to
    the array path.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("tk"),
    ).withColumn("n", F.size("tk"))
    vocab = sorted(
        r[0]
        for r in toks.select(F.explode("tk").alias("t"))
        .distinct()
        .limit(_BITMASK_VOCAB_CAP + 1)
        .collect()
    )
    # tokens with quotes can't be embedded in the CASE literal — fall back
    if len(vocab) <= _BITMASK_VOCAB_CAP and all("'" not in w for w in vocab):
        n_words = (len(vocab) + 63) // 64
        masks = []
        for w in range(n_words):
            sub = [
                (i % 64, t)
                for i, t in enumerate(vocab)
                if i // 64 == w
            ]
            branches = " ".join(
                f"WHEN '{t}' THEN {_bit_literal(b)}" for b, t in sub
            )
            masks.append(
                F.expr(
                    f"aggregate(transform(tk, t -> CASE t {branches}"
                    " ELSE 0L END), 0L, (a, x) -> a | x)"
                ).alias(f"m{w}")
            )
        side = toks.select("doc_id", "blk", "n", *masks)
        inter = F.bit_count(
            F.col("a.m0").bitwiseAND(F.col("b.m0"))
        )
        for w in range(1, n_words):
            inter = inter + F.bit_count(
                F.col(f"a.m{w}").bitwiseAND(F.col(f"b.m{w}"))
            )
    else:
        side = toks
        inter = F.size(F.array_intersect("a.tk", "b.tk"))
    # A small corpus arrives as one parquet file = one partition, and AQE
    # would coalesce a keyless repartition of 5k rows right back — the
    # expensive part is the post-join pair blow-up, which AQE can't see.
    # An explicit partition count is respected and spreads the quadratic
    # work across every core.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    a = side.repartition(n_parts, "doc_id").alias("a")
    b = F.broadcast(side.alias("b"))
    jac = F.round(inter / (F.col("a.n") + F.col("b.n") - inter), 9)
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bits: int = 32,
    bands: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs: (a < b, hamming(simhash_a, simhash_b)
    <= max_hamming), found by banding the simhash bits.

    EXACT, not approximate: with ``bands`` bands, two hashes differing in
    fewer than ``bands`` bits must agree on at least one whole band
    (pigeonhole), so requiring ``max_hamming < bands`` guarantees every
    qualifying pair shares a bucket. The bucket self-join is the only
    shuffle; the verify step is two bitwise ops per candidate.
    """
    if max_hamming >= bands:
        raise ValueError(
            "exactness needs max_hamming < bands (pigeonhole guarantee)"
        )
    if bits % bands != 0:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    mask = (1 << width) - 1
    sh = simhash(df, id_col, text_col, bits).localCheckpoint()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(f"(simhash >> {b * width}) & {mask}L").alias("val"),
            )
            for b in range(bands)
        ]
    )
    buckets = sh.select(
        "doc_id", F.explode(band_structs).alias("bb")
    ).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.val").alias("val")
    )
    cands = (
        buckets.alias("l")
        .join(
            buckets.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a < b, round(cosine, 6) >=
    threshold), optionally blocked on ``block_col`` (cluster/label id).

    Each vector is L2-normalized ONCE per row before the pair join, so the
    per-pair work is a single dot product (no norms in the quadratic stage).
    The blocked pair join is the exact/verification path; at 100 TB the
    block key should come from LSH (random-hyperplane buckets) or IVF cell
    assignment (similarity.assign_ivf_cells) so block sizes stay bounded —
    the pair stage itself is identical either way.
    """
    # hoist the norm into its own column — computing it inside the
    # transform() lambda would redo the O(dim) sum for every element
    unit = (
        df.select(
            F.col(id_col).alias("doc_id"),
            (F.col(block_col) if block_col else F.lit(1)).alias("blk"),
            F.col(vec_col).cast("array<double>").alias("dv"),
        )
        .withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform("dv", lambda v: v * v),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
        )
        .select(
            "doc_id",
            "blk",
            F.transform("dv", lambda x: x / F.col("nrm")).alias("uv"),
        )
    )
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    a = unit.repartition(n_parts, "doc_id").alias("a")
    b = F.broadcast(unit.alias("b"))
    cos = F.round(
        F.aggregate(
            F.zip_with("a.uv", "b.uv", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            cos.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str = "text", bits: int = 32
) -> DataFrame:
    """SimHash over tokens: per-token 60-bit md5-derived hash, majority vote
    per bit position, packed into a ``bits``-wide bigint.

    explode + single hash-agg (sum of +-1 per bit) — one shuffle on the doc
    id; the bit loop is plan-time code generation of ``bits`` aggregate
    expressions, all JVM-side."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("t"),
    ).withColumn(
        "h",
        F.expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"),
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(h >> {i}) & 1") == 1, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    packed = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, i)
        packed = term if packed is None else packed + term
    return agg.select("doc_id", packed.alias("simhash"))
