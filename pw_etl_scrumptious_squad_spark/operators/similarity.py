"""Embedding similarity search (north-star extension — SURVEY.md §2.4).

Embeddings are ``array<float>`` columns. Dot products / norms are
``aggregate``/``zip_with`` higher-order functions — JVM-side, vectorized,
no Python in the hot path.

Scale design:
- **Brute-force top-k** is a broadcast of the (small) query set against the
  (huge) corpus: no shuffle of the corpus, one window per query for top-k.
  Exact; the baseline.
- **IVF (inverted-file) ANN** partitions the corpus by nearest centroid at
  write time; a query probes only its nearest cell(s) — the classic
  recall/throughput trade. Centroid assignment and probing are the same
  cosine expression; at 100 TB the corpus is *bucketed by cell id* on disk
  so a probe is a partition-pruned scan, not a full pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for every query vector.

    ``queries`` (small) is broadcast; the corpus is scanned once with a
    per-row expression — no corpus shuffle. Scores are rounded before the
    ranking tie-break (then by corpus id) so results are deterministic.
    Returns (query_id, match_id, cosine_sim, rank).

    The norms are hoisted to per-row columns BELOW the join — computed once
    per vector, not once per pair; value-identical to the per-pair
    ``dot/(norm*norm)`` form (same operations, same IEEE order) at a third
    of the quadratic-stage flops. The per-pair dot stays the ``aggregate``
    fold: measured at 64-dim, the fold over a primitive double array beats
    a 64-term unrolled ``a[0]*b[0] + ...`` projection by ~25% (the giant
    unrolled expression falls out of efficient codegen), so "unroll the
    lambda" is a recorded dead end here.
    """
    # float32 storage, double math: cast up front so Spark's fold matches the
    # double-precision oracle (float32 products drift by whole ulps at 6 dp).
    # NULL / zero-norm vectors have no defined direction: they participate
    # on NEITHER side (the d06 degenerate-input policy; without the filter
    # ANSI mode turns the norm division into a crash on real corpora,
    # which always contain a zero embedding somewhere)
    q = (
        queries.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .withColumn("qn", norm("qv"))
        .filter(F.col("qn") > 0)
    )
    c = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("match_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .withColumn("cn", norm("cv"))
        .filter(F.col("cn") > 0)
    )
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(
                dot("qv", "cv") / (F.col("qn") * F.col("cn")),
                round_digits,
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """Learn IVF centroids with Spark ML k-means (k-means|| init).

    Returns (centroid_id, embedding) in the same shape the probe/assign
    functions take, so ``assign_ivf_cells(corpus, train_ivf_centroids(...))``
    upgrades the IVF index from sampled-row centroids to learned ones.
    Deterministic for a fixed seed + input. At 100 TB you train on a
    sample (k-means cost is per-row x k) and assign the full corpus."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = corpus.select(
        F.col(id_col).alias("vec_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias(
            "features"
        ),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feats)
    centers = model.clusterCenters()
    sc = corpus.sparkSession
    cent = sc.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
        "centroid_id INT, embedding ARRAY<DOUBLE>",
    )
    # cast to float to match the corpus embedding column type
    return cent.select(
        "centroid_id", F.col("embedding").cast("array<float>").alias("embedding")
    )


def assign_ivf_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (max cosine).

    Centroids (small) broadcast; one pass over the corpus. At scale, write
    the result bucketed/partitioned by ``cell`` so probes prune partitions.
    """
    cent = centroids.select(
        F.col(centroid_id).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("centv"),
    )
    # narrow rows through the shuffle: the corpus x centroids product
    # projects (id, cell, cscore) ONLY — carrying the vector arrays into
    # a per-id window was measured at 12+ GB of shuffle at 200k vectors x
    # 100 cells. max_by over struct(qscore, -cell) is value-identical to
    # row_number over (qscore DESC, cell ASC) (higher score wins, ties to
    # the lower cell) and partial-aggregates map-side instead of sorting.
    #
    # DECISION QUANTIZATION (round-8 advice fix): the winning cell is
    # chosen on round(cscore * 1e9) — a nano-grid BIGINT — not the raw
    # double. The matmul scale tier computes the same cosines through
    # BLAS, whose IEEE summation ORDER differs from this expression
    # fold's, so raw-double argmax could flip at float-tie boundaries on
    # data the parity test never saw. On the shared nano-grid both tiers
    # apply one engine-independent rule (the PQ path's idiom): equal
    # quantized score -> lowest cell wins. Emitted values are unchanged
    # (the decision is internal), so DuckDB oracles are unaffected.
    scored = (
        corpus.select(id_col, vec_col)
        .crossJoin(broadcast(cent))
        .select(
            id_col,
            "cell",
            cosine(
                F.col(vec_col).cast("array<double>"), F.col("centv")
            ).alias("cscore"),
        )
    )
    assigned = scored.groupBy(id_col).agg(
        F.expr(
            "max_by(cell, struct(cast(round(cscore * 1e9) AS BIGINT) AS qs,"
            " -cell AS tie))"
        ).alias("cell")
    )
    return corpus.select(id_col, vec_col).join(assigned, id_col)


def assign_ivf_cells_matmul(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Scale-tier twin of :func:`assign_ivf_cells`: the expression form
    is O(n*k) interpreted cosine folds, and with the IVF sizing rule
    k ~ n/2000 that is O(n^2/2000) — measured alpha 1.71 on the round-7
    IVF-PQ x10->x100 curve (the same defect the round-4 curve caught in
    the embedding-near-dup route). The centroid matrix is driver-tiny,
    so assignment here is one broadcast numpy argmax over a normalized
    matmul per Arrow batch (BLAS, not folds).

    DECISION RULE (shared with the expression tier, round-8 advice
    fix): scores are quantized to the nano-grid
    ``round(cosine * 1e9)`` (SQL round-half-away semantics) BEFORE the
    argmax; ``np.argmax`` takes the FIRST max and centroid rows are
    ordered by ascending cell id, so quantized ties break to the
    lowest cell — exactly the expression form's
    ``max_by(cell, struct(round(cscore*1e9), -cell))``. BLAS and the
    SQL fold sum in different IEEE orders, so raw-double argmax could
    diverge at float-tie boundaries on unseen data; on the shared grid
    a divergence needs two cells' true cosines within ~1e-9 AND
    straddling a grid boundary — and equal grid values are
    tie-broken identically. Assignment parity is pinned in tests.
    Same output shape as :func:`assign_ivf_cells`."""
    import numpy as np
    from pyspark.sql import types as T

    cent_rows = centroids.select(
        F.col(centroid_id), F.col(vec_col).cast("array<double>")
    ).orderBy(centroid_id).collect()
    cmat = np.stack([np.asarray(r[1], dtype="f8") for r in cent_rows])
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cnorm[cnorm == 0.0] = 1.0
    cmat = cmat / cnorm[:, None]
    cell_ids = np.asarray([r[0] for r in cent_rows], dtype="i4")

    base = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )

    def _assign(parts):
        for pdf in parts:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["__v"].to_numpy())
            n = np.sqrt((m * m).sum(axis=1))
            n[n == 0.0] = 1.0
            scores = (m / n[:, None]) @ cmat.T
            # nano-grid quantization with SQL round-half-away-from-zero
            # (np.rint would round half-to-even) — the decision rule
            # shared with assign_ivf_cells
            g = scores * 1e9
            q = np.where(g >= 0, np.floor(g + 0.5), np.ceil(g - 0.5)).astype(
                "i8"
            )
            yield pdf.assign(cell=cell_ids[np.argmax(q, axis=1)])

    schema = T.StructType(
        list(base.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )
    assigned = base.mapInPandas(_assign, schema).select(id_col, "cell")
    return corpus.select(id_col, vec_col).join(assigned, id_col)


def ivf_topk(
    corpus_with_cells: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """ANN top-k: route each query to its ``n_probe`` nearest cells, search
    only those cells. Approximate (recall < 1 when the true neighbor lives
    in an unprobed cell); the brute-force path is the exactness oracle."""
    cent = centroids.select(
        F.col(centroid_id).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("centv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", norm("qv"))
    q_cells = q.crossJoin(broadcast(cent)).select(
        "query_id", "qv", "qn", "cell", cosine("qv", "centv").alias("cscore")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    probes = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "qn", "cell")
    )
    c = corpus_with_cells.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        "cell",
    ).withColumn("cn", norm("cv"))
    # norms hoisted below the join: value-identical to dot/(norm*norm)
    # per pair (same IEEE order), a third of the quadratic-stage flops
    scored = (
        c.join(broadcast(probes), on="cell")  # partition-pruned scan at scale
        .filter(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(
                dot("qv", "cv") / (F.col("qn") * F.col("cn")), 5
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("match_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_cell_profile(
    assigned: DataFrame,
    centroids: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """Per-cluster corpus profile over an IVF/k-means assignment: vector
    count, mean cosine-to-centroid (cluster tightness), and the dominant
    label — the semantic-clustering report a curation pipeline reads to
    decide per-cluster sampling rates (cf. SemDeDup's cluster-then-prune).

    ``assigned`` is ``assign_ivf_cells`` output joined with a label
    column. Shape: centroids broadcast, per-vector cosine map-side, ONE
    cell-keyed aggregation plus a (cell,label)-keyed mode reduction —
    nothing corpus-sized shuffles more than once. Determinism: each
    cosine is ppb-scaled to BIGINT (floor) before the mean, so partition
    order can't perturb the sum; the mean divides exact integers.
    """
    cent = centroids.select(
        F.col(centroid_id).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("centv"),
    )
    cp = F.floor(
        cosine(F.col(vec_col).cast("array<double>"), F.col("centv"))
        * F.lit(1_000_000_000.0)
        + F.lit(0.5)
    ).cast("bigint")
    scored = assigned.join(broadcast(cent), "cell").select(
        "cell", F.col(label_col).alias("__lbl"), cp.alias("__cp")
    )
    agg = scored.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(
            F.sum("__cp") / F.count(F.lit(1)) / F.lit(1_000_000_000.0), 6
        ).alias("mean_cos"),
    )
    lc = scored.groupBy("cell", "__lbl").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("cell").orderBy(
        F.col("c").desc(), F.col("__lbl").asc()
    )
    dom = (
        lc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", F.col("__lbl").alias("top_label"))
    )
    return agg.join(dom, "cell").select(
        "cell", "n_vecs", "mean_cos", "top_label"
    )


def srp_sign_matrix(bits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 (Rademacher) hyperplane matrix for signed random
    projections: sign[j][d] comes from the low bit of md5(f"{j}:{d}"), so
    any engine (or a DuckDB oracle) can reproduce the exact planes. ±1
    components give the same locality guarantee as Gaussian planes for
    SRP-LSH (angle-preserving in expectation) while keeping every dot
    product in exact integer arithmetic."""
    import hashlib

    return [
        [
            1 if hashlib.md5(f"{j}:{d}".encode()).digest()[0] & 1 else -1
            for d in range(dim)
        ]
        for j in range(bits)
    ]


def srp_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 32,
    scale: int = 1_000_000,
    dim: int | None = None,
) -> DataFrame:
    """Signed-random-projection bit signature per embedding — SimHash for
    vectors: bit j = 1 iff the embedding falls on the positive side of
    hyperplane j. Cosine-similar vectors agree on most bits, so the
    signature feeds the same banded hamming machinery as text SimHash
    (``dedup.hamming_near_pairs``) — the centroid-free scale path for
    embedding near-dup (no training step, unlike IVF).

    Floats are quantized to integers (``floor(x*scale + 0.5)``) BEFORE the
    ±1 dot products, so every projection is an exact 64-bit integer sum —
    order-independent and bit-identical across engines; float summation
    order would otherwise flip sign bits on near-zero projections. Pure
    column expressions, no shuffle, no Python per row.

    Scale note: band selectivity is 2^(bits/bands) buckets per band, so
    ``bits`` must grow with the corpus — 32 bits / 8 bands = 16 bucket
    values, fine for 10^4 vectors, hopeless for 10^9 (every bucket holds
    millions). At cluster scale use :func:`srp_signature_words` (>=128
    bits as an ``array<bigint>`` of 64-bit words, 16-32-bit band slices)
    with ``dedup.hamming_near_pairs_words`` — same quantize/dot/pack
    shape, selectivity that keeps growing with the corpus.
    """
    if dim is None:
        # fallback driver peek — callers that know the embedding width
        # pass it to skip this extra Spark job
        dim = df.selectExpr(f"size({vec_col}) AS n").first()["n"]
    signs = srp_sign_matrix(bits, dim)
    qv = F.expr(
        f"transform(cast({vec_col} as array<double>),"
        f" x -> cast(floor(x * {scale}D + 0.5D) as bigint))"
    )
    out = df.select(
        F.col(id_col).alias("vec_id"), qv.alias("__qv")
    )
    # the packed signature is ONE SQL text, not `bits` chained Column
    # ops: the old loop issued ~4 py4j round-trips per bit (expr, when,
    # lit-cast, +) and its construction alone measured 0.38 s of the
    # 1.8 s y15 entry at 32 bits (driver latency, guide §1.2). The SQL
    # parser builds the identical CASE WHEN/+ expression tree, so the
    # plan and values are unchanged.
    terms = []
    for j in range(bits):
        lits = ",".join(f"{s}L" for s in signs[j])
        terms.append(
            f"(CASE WHEN aggregate(zip_with(__qv, array({lits}),"
            " (x, y) -> x * y), 0L, (a, x) -> a + x) > 0"
            f" THEN {1 << j}L ELSE 0L END)"
        )
    return out.select(
        "vec_id", F.expr(" + ".join(terms)).alias("srp_sig")
    )


def srp_signature_words(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 128,
    scale: int = 1_000_000,
    impl: str = "auto",
    dim: int | None = None,
) -> DataFrame:
    """Wide SRP signature as an ``array<bigint>`` of 64-bit words — the
    cluster-scale variant of :func:`srp_signatures` (which packs at most
    64 bits into one scalar).

    ``impl``: ``'matmul'`` (default under ``'auto'``) computes all
    ``bits`` projections as ONE Arrow-batched int64 numpy matmul per
    partition — measured 9x faster than the expression path at 128 bits
    on sf0.1 (0.3 s vs 2.8 s steady-state; the 32-bit A/B in
    ENGINEERING_NOTES measured parity, but the interpreted lambda cost
    scales with ``bits`` while the matmul amortizes). ``'expr'`` keeps
    the pure-column-expression form — zero Python workers, and the
    direct structural twin of the DuckDB oracle. Both are exact integer
    arithmetic and VALUE-IDENTICAL (asserted in tests), so the choice is
    operational, not semantic.

    Band selectivity is what makes SRP-LSH scale: with B bucket values
    per band each bucket holds ~n/B rows, so 32-bit signatures cut into
    8 bands (16 values per band) degenerate to quadratic bucket joins at
    large n. 128+ bits sliced into 16-32-bit bands give 65k-4B values
    per band — bucket sizes keep shrinking as the corpus grows. Same
    integer-exact quantize/±1-dot/pack as the scalar tier (md5-seeded
    hyperplanes, so any engine reproduces the planes); bit j of the
    signature lives in word j//64 at position j%64. Bits are combined
    with bitwise OR (terms are disjoint powers of two), keeping word 63
    well-defined in signed-64 arithmetic on every engine. Pure column
    expressions: no shuffle, no Python per row.

    Pairs come from ``dedup.hamming_near_pairs_words`` — the same banded
    machinery, pigeonhole-exact for ``max_hamming < bands``.
    """
    if bits % 64 != 0:
        raise ValueError("wide SRP signatures need bits as a multiple of 64")
    if impl not in ("auto", "matmul", "expr"):
        raise ValueError(f"impl must be auto|matmul|expr, got {impl!r}")
    if dim is None:
        dim = df.selectExpr(f"size({vec_col}) AS n").first()["n"]
    signs = srp_sign_matrix(bits, dim)
    if impl in ("auto", "matmul"):
        return _srp_signature_words_matmul(
            df, id_col, vec_col, bits, scale, signs
        )
    qv = F.expr(
        f"transform(cast({vec_col} as array<double>),"
        f" x -> cast(floor(x * {scale}D + 0.5D) as bigint))"
    )
    out = df.select(F.col(id_col).alias("vec_id"), qv.alias("__qv"))
    words = []
    for w in range(bits // 64):
        word = None
        for j in range(w * 64, (w + 1) * 64):
            lits = ",".join(f"{s}L" for s in signs[j])
            dot_j = F.expr(
                f"aggregate(zip_with(__qv, array({lits}), (x, y) -> x * y),"
                f" 0L, (a, x) -> a + x)"
            )
            bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), {j - w * 64})")
            term = F.when(dot_j > 0, bit).otherwise(F.lit(0).cast("bigint"))
            word = term if word is None else word.bitwiseOR(term)
        words.append(word)
    return out.select("vec_id", F.array(*words).alias("srp_words"))


def _srp_signature_words_matmul(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bits: int,
    scale: int,
    signs: list[list[int]],
) -> DataFrame:
    """Arrow-batched implementation of :func:`srp_signature_words`: all
    projections as one int64 ``Q @ S`` per pandas batch. Exact integer
    arithmetic end-to-end (quantize -> int64 matmul -> sign -> pack), so
    it is bit-identical to the expression path on any input whose
    quantized dot products fit int64 — the same contract the expression
    form has."""
    import numpy as np

    smat = np.array(signs, dtype=np.int64).T  # dim x bits

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"vec_id": [], "srp_words": []})
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q = np.floor(V * scale + 0.5).astype(np.int64)
            B = (Q @ smat) > 0  # n x bits
            packed = []
            for w in range(bits // 64):
                chunk = B[:, w * 64 : (w + 1) * 64]
                word = np.zeros(len(B), dtype=np.uint64)
                for j in range(64):
                    word |= chunk[:, j].astype(np.uint64) << np.uint64(j)
                packed.append(word.astype(np.int64))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "srp_words": [list(t) for t in zip(*packed)],
                }
            )

    narrow = df.select(F.col(id_col), F.col(vec_col))
    # single-file inputs read as one partition; fan out so the matmul
    # batches use every core (no-op at real scale — see simhash_words)
    par = df.sparkSession.sparkContext.defaultParallelism
    if narrow.rdd.getNumPartitions() < par:
        narrow = narrow.repartition(par)
    return narrow.mapInPandas(
        gen, "vec_id bigint, srp_words array<bigint>"
    )


def write_ivf_index(
    corpus_with_cells: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist an IVF index: the assigned corpus laid out on disk
    PARTITIONED BY cell id (`.../cell=<k>/part-*.parquet`). This is the
    step that turns the module-docstring promise into a physical layout:
    at 100 TB a probe must be a partition-pruned scan of ``n_probe``
    directories, never a full pass — the pruning is asserted against the
    actual scan plan in tests."""
    corpus_with_cells.write.mode(mode).partitionBy("cell").parquet(path)


def probe_ivf_index(
    spark,
    path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """ANN top-k against a DISK-RESIDENT :func:`write_ivf_index` layout.

    Query routing runs first (queries x centroids — both tiny), the
    probed cell ids are collected to the driver (|queries| * n_probe
    ints), and the index is read with a LITERAL ``cell IN (...)``
    predicate — static partition pruning: Spark lists and scans ONLY the
    probed cell directories (``PartitionFilters`` in the scan node), so
    probe cost is proportional to the touched cells, not the corpus.
    Value-identical to :func:`ivf_topk` over the same assignment (same
    scoring expressions on the same rows)."""
    cent = centroids.select(
        F.col(centroid_id).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("centv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    q_cells = q.crossJoin(broadcast(cent)).select(
        "query_id", "cell", cosine("qv", "centv").alias("cscore")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    probed = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("cell")
        .distinct()
        .collect()
    )
    cells = sorted(int(r["cell"]) for r in probed)
    corpus = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return ivf_topk(
        corpus,
        centroids,
        queries,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        centroid_id=centroid_id,
    )


def _require_integral_cols(df: DataFrame, cols: list[str], route: str) -> None:
    """The matmul/IVF hard-negative routes pack ids and labels into int64
    numpy arrays; a silent ``cast('long')`` of e.g. string labels would
    yield NULLs (rows dropped, or a crash inside the Arrow stage) where
    the expression tier still works. Fail loudly at plan time instead."""
    from pyspark.sql import types as T

    ok = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, ok):
            raise TypeError(
                f"{route} requires integral id/label columns (the scale"
                f" routes pack them into int64 arrays); column {c!r} is"
                f" {dt.simpleString()} — use the expression tier"
                " (n_rows_hint=None) or cast/re-key to integers first"
            )


def hard_negative_mining(
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_rows_hint: int | None = None,
    max_exact_rows: int = 20_000,
) -> DataFrame:
    """Contrastive hard-negative mining: for every anchor vector, the
    top-k most cosine-similar vectors with a DIFFERENT label — the
    offline mining step of contrastive / triplet embedding training
    (the "hardest" negatives are the near-misses, not random draws).
    Returns (query_id, neg_id, cos_ppb, rank); deterministic order is
    cos_ppb desc then neg_id asc. Rows with a NULL label or a
    NULL/zero-norm embedding participate on NEITHER side (no label to
    contrast against / no defined direction — both routes agree, the
    d06 degenerate-input policy).

    Exactness: per-element ``floor(x*1e6+0.5)`` quantization makes every
    pair dot / squared norm an exact BIGINT (order-free, engine-free);
    each cosine is then ONE double expression ppb-floored
    (``floor(dot/(sqrt(na)*sqrt(nb))*1e9+0.5)``) — the y48 integer-pair
    idiom — so ranking compares exact integers cross-engine.

    TIERS (y48 contract): the expression path is the oracle-matched
    default; past ``max_exact_rows`` (opt-in via ``n_rows_hint`` — a
    wrong hint degrades performance, never values)
    :func:`_hard_negative_matmul` computes the SAME integers with one
    int64 numpy matmul per Arrow batch against the task-shipped
    candidate matrix (bounded: rows x dim x 8 B — ~100 MB at 200k x 64;
    beyond broadcast reach, mine within IVF probes via
    :func:`probe_ivf_index` instead, trading exactness for the ANN
    recall curve). The scale tiers pack ids/labels into int64 arrays,
    so they REQUIRE integral ``id_col``/``label_col`` (validated
    loudly); the expression tier compares labels of any type.
    """
    if n_rows_hint is not None and n_rows_hint > max_exact_rows:
        return _hard_negative_matmul(corpus, k, id_col, vec_col, label_col)
    quant_v = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double)"
        " * 1000000.0d + 0.5d) as bigint))"
    )
    sq = "aggregate({0}, 0L, (acc, v) -> acc + v * v)"
    base = (
        corpus.filter(F.col(label_col).isNotNull())
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(label_col).alias("lbl"),
            quant_v.alias("__qv"),
        )
        .withColumn("__nv", F.expr(sq.format("__qv")))
        .filter(F.col("__nv") > 0)
    )
    a = base.select(
        F.col("vec_id").alias("query_id"),
        F.col("lbl").alias("__la"),
        F.col("__qv").alias("__qa"),
        F.col("__nv").alias("__na"),
    )
    b = base.select(
        F.col("vec_id").alias("neg_id"),
        F.col("lbl").alias("__lb"),
        F.col("__qv").alias("__qb"),
        F.col("__nv").alias("__nb"),
    )
    pair_dot = F.expr(
        "aggregate(zip_with(__qa, __qb, (x, y) -> x * y),"
        " 0L, (acc, v) -> acc + v)"
    )
    pair_cos = F.col("__pd").cast("double") / (
        F.sqrt(F.col("__na").cast("double"))
        * F.sqrt(F.col("__nb").cast("double"))
    )
    scored = (
        a.crossJoin(broadcast(b))
        .filter(F.col("__la") != F.col("__lb"))
        .withColumn("__pd", pair_dot)
        .select(
            "query_id",
            "neg_id",
            F.floor(pair_cos * F.lit(1_000_000_000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("cos_ppb"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppb").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neg_id",
            "cos_ppb",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def _hard_negative_matmul(
    corpus: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Scale route for :func:`hard_negative_mining`: identical integers,
    BLAS float64 matmuls per Arrow batch against the full candidate
    matrix shipped with the task closure.

    Decision parity, stage by stage (the y48/_semdedup_prune_matmul
    argument): quantization is ``floor(float64(x)*1e6+0.5)`` per element
    (exact both ways); every quantized element is an integer-valued
    float64, so products (<= 1e12 at unit-scale embeddings) and 64-dim
    dot sums (<= 6.4e13 << 2**53) are EXACT integers in float64
    regardless of accumulation order — BLAS speed with int64 exactness
    (valid while max|x| * 1e6 < sqrt(2**53 / dim), i.e. |x| < ~11 at
    dim 64; unit-norm embeddings sit far inside). Each ppb is the same
    IEEE double expression in the same operand order as the expression
    tier; per-anchor ranking is (cos_ppb desc, neg_id asc) with
    boundary ties resolved by an exact lexsort over the tied set, so
    the emitted rows match the window bit-for-bit. NULL-label / NULL /
    zero-norm rows are excluded on both sides before any math.

    Memory: the candidate matrix is rows x dim float64 (~100 MB at
    200k x 64), shipped once per task like d06's broadcast-argmax
    assignment stage; anchors are chunked so the dense (chunk x rows)
    score block stays ~256 MB regardless of Arrow batch size. The
    route is still all-pairs (exact mining IS quadratic) — past
    broadcast reach or a quadratic-flop budget, mine within IVF probes
    (:func:`hard_negatives_ivf`) instead.
    """
    import numpy as np
    import pandas as pd

    _require_integral_cols(corpus, [id_col, label_col], "_hard_negative_matmul")
    cand_rows = (
        corpus.filter(
            F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
        )
        .select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(label_col).cast("long").alias("lbl"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("vec_id")
        .collect()
    )
    cand_ids = np.asarray([r["vec_id"] for r in cand_rows], dtype="i8")
    cand_lbl = np.asarray([r["lbl"] for r in cand_rows], dtype="i8")
    cq = np.floor(
        np.stack([np.asarray(r["v"], dtype="f8") for r in cand_rows])
        * 1e6
        + 0.5
    )
    cn = (cq * cq).sum(axis=1)
    keep = cn > 0
    cand_ids, cand_lbl, cq, cn = (
        cand_ids[keep],
        cand_lbl[keep],
        cq[keep],
        cn[keep],
    )
    cqt = np.ascontiguousarray(cq.T)
    csqrt = np.sqrt(cn)
    n_cand = len(cand_ids)
    # ~256 MB of float64 scores per chunk
    chunk = max(64, int(32_000_000 // max(1, n_cand)))

    def _topk_rows(ids, lbl, ppb):
        out_q, out_n, out_c, out_r = [], [], [], []
        for i in range(len(ids)):
            mask = cand_lbl != lbl[i]
            m = int(mask.sum())
            if m == 0:
                continue
            row = ppb[i][mask]
            nids = cand_ids[mask]
            if m > 4 * k:
                # top-k by value with EXACT boundary-tie handling:
                # argpartition to the k largest, widen to every
                # candidate tying the k-th value, lexsort the small set
                part = np.argpartition(-row, k - 1)[:k] if m > k else None
                kth = row[part].min() if part is not None else row.min()
                sel = np.flatnonzero(row >= kth)
                row, nids = row[sel], nids[sel]
            order = np.lexsort((nids, -row))[:k]
            out_q.extend([ids[i]] * len(order))
            out_n.extend(nids[order])
            out_c.extend(row[order])
            out_r.extend(range(1, len(order) + 1))
        return out_q, out_n, out_c, out_r

    def _mine(parts):
        for pdf in parts:
            if len(pdf) == 0:
                continue
            lbl_ok = pdf[label_col].notna().to_numpy()
            vecs = pdf[vec_col].to_numpy()
            vec_ok = np.asarray([v is not None for v in vecs])
            sel = lbl_ok & vec_ok
            if not sel.any():
                continue
            ids = pdf[id_col].to_numpy()[sel].astype("i8")
            lbl = pdf[label_col].to_numpy()[sel].astype("i8")
            q = np.floor(
                np.stack([np.asarray(v, dtype="f8") for v in vecs[sel]])
                * 1e6
                + 0.5
            )
            nv = (q * q).sum(axis=1)
            live = nv > 0
            if not live.any():
                continue
            ids, lbl, q, nv = ids[live], lbl[live], q[live], nv[live]
            qsqrt = np.sqrt(nv)
            for lo in range(0, len(ids), chunk):
                hi = min(lo + chunk, len(ids))
                ppb = np.floor(
                    (q[lo:hi] @ cqt)
                    / (qsqrt[lo:hi, None] * csqrt[None, :])
                    * 1e9
                    + 0.5
                )
                out_q, out_n, out_c, out_r = _topk_rows(
                    ids[lo:hi], lbl[lo:hi], ppb
                )
                if out_q:
                    yield pd.DataFrame(
                        {
                            "query_id": np.asarray(out_q, dtype="i8"),
                            "neg_id": np.asarray(out_n, dtype="i8"),
                            "cos_ppb": np.asarray(out_c, dtype="i8"),
                            "rank": np.asarray(out_r, dtype="i4"),
                        }
                    )

    return corpus.select(id_col, label_col, vec_col).mapInPandas(
        _mine, "query_id long, neg_id long, cos_ppb bigint, rank int"
    )


def hard_negatives_ivf(
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF-probed hard-negative mining — the sub-quadratic scale route
    for :func:`hard_negative_mining`. Every vector is a CANDIDATE in its
    nearest cell; every ANCHOR probes its ``n_probe`` nearest cells and
    mines top-k different-label neighbors within them, then a global
    per-anchor merge keeps the best k across probed cells.

    Semantics (the d05/s02 contract): recall < 1 — a hard negative
    hiding in an unprobed cell is missed, the standard IVF trade — but
    every EMITTED (query_id, neg_id, cos_ppb) is exact-verified with the
    SAME quantized-integer cosine as the exact tiers, so emitted values
    are bit-identical to what :func:`hard_negative_mining` would score
    for those pairs, and the whole pipeline is deterministic
    (assignment ties break to the lowest cell id, ranking to the lowest
    neg_id).

    Scale shape: centroid matrix is driver-tiny and rides the task
    closure (d06's broadcast-argmax pattern); assignment is one BLAS
    matmul per Arrow batch; the mining stage shuffles each vector
    ``1 + n_probe`` times on the CELL key and runs one
    (anchors x candidates) BLAS block per cell — with cells sized
    ~corpus/k_cells (the SemDeDup knob), per-cell cost is bounded, so
    total flops grow linearly in corpus size at fixed cell size. The
    global merge windows on query_id over k * n_probe rows per anchor.

    Zero-norm / NULL-label / NULL-embedding rows sit on neither side
    (the d06 degenerate policy).
    """
    import numpy as np
    import pandas as pd

    _require_integral_cols(corpus, [id_col, label_col], "hard_negatives_ivf")
    quant_v = F.expr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double)"
        " * 1000000.0d + 0.5d) as bigint))"
    )
    sq = "aggregate({0}, 0L, (acc, v) -> acc + v * v)"
    base = (
        corpus.filter(
            F.col(label_col).isNotNull() & F.col(vec_col).isNotNull()
        )
        .select(
            F.col(id_col).cast("long").alias("vid"),
            F.col(label_col).cast("long").alias("lbl"),
            quant_v.alias("qv"),
        )
        .withColumn("nv", F.expr(sq.format("qv")))
        .filter(F.col("nv") > 0)
    )

    cent_rows = centroids.orderBy(centroid_id).collect()
    cmat = np.stack(
        [np.asarray(r[vec_col], dtype="f8") for r in cent_rows]
    )
    cn = np.sqrt((cmat * cmat).sum(axis=1))
    cn[cn == 0.0] = 1.0
    cmat = cmat / cn[:, None]
    cell_ids = np.asarray([r[centroid_id] for r in cent_rows], dtype="i4")
    p = min(n_probe, len(cell_ids))

    def _route(parts):
        # one pass: each row emits 1 candidate row (role 0, top-1 cell)
        # + p anchor rows (role 1, top-p cells). Probe order ties break
        # to the lowest cell id (stable argsort on (-score, cell)).
        for pdf in parts:
            if len(pdf) == 0:
                continue
            q = np.stack(
                [np.asarray(v, dtype="f8") for v in pdf["qv"].to_numpy()]
            )
            s = q @ cmat.T  # norms of q don't affect per-row ranking
            order = np.argsort(-s, axis=1, kind="stable")[:, :p]
            out = []
            for role, cols in ((0, order[:, :1]), (1, order)):
                n_rep = cols.shape[1]
                out.append(
                    pd.DataFrame(
                        {
                            "vid": np.repeat(
                                pdf["vid"].to_numpy(), n_rep
                            ),
                            "lbl": np.repeat(
                                pdf["lbl"].to_numpy(), n_rep
                            ),
                            "qv": [
                                v
                                for v in pdf["qv"].to_numpy()
                                for _ in range(n_rep)
                            ],
                            "nv": np.repeat(pdf["nv"].to_numpy(), n_rep),
                            "cell": cell_ids[cols].ravel(),
                            "role": np.full(
                                len(pdf) * n_rep, role, dtype="i1"
                            ),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    routed = base.mapInPandas(
        _route,
        "vid long, lbl long, qv array<bigint>, nv bigint,"
        " cell int, role byte",
    )

    def _cell_mine(pdf):
        anch = pdf[pdf["role"] == 1]
        cand = pdf[pdf["role"] == 0]
        empty = pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="i8"),
                "neg_id": pd.Series([], dtype="i8"),
                "cos_ppb": pd.Series([], dtype="i8"),
            }
        )
        if len(anch) == 0 or len(cand) == 0:
            return empty
        a_ids = anch["vid"].to_numpy().astype("i8")
        a_lbl = anch["lbl"].to_numpy().astype("i8")
        aq = np.stack(
            [np.asarray(v, dtype="f8") for v in anch["qv"].to_numpy()]
        )
        an = np.sqrt(anch["nv"].to_numpy().astype("f8"))
        c_ids = cand["vid"].to_numpy().astype("i8")
        c_lbl = cand["lbl"].to_numpy().astype("i8")
        cq = np.stack(
            [np.asarray(v, dtype="f8") for v in cand["qv"].to_numpy()]
        )
        cnv = np.sqrt(cand["nv"].to_numpy().astype("f8"))
        # quantized elements are integer-valued f8: dots are exact
        # integers < 2**53 (see _hard_negative_matmul), ppb is the same
        # IEEE expression as the exact tiers
        ppb = np.floor(
            (aq @ cq.T) / (an[:, None] * cnv[None, :]) * 1e9 + 0.5
        )
        # vectorized top-k SET selection (the global merge re-ranks, so
        # only the SET must be exact): same-label candidates masked to
        # -inf; boundary ties at the k-th value resolve to the lowest
        # neg_id — per-row python only where ties actually spill over
        nA, nC = ppb.shape
        ppbm = np.where(a_lbl[:, None] == c_lbl[None, :], -np.inf, ppb)
        kk = min(k, nC)
        if kk == nC:
            sel = np.isfinite(ppbm)
        else:
            part = np.argpartition(-ppbm, kk - 1, axis=1)[:, :kk]
            kth = ppbm[np.arange(nA)[:, None], part].min(axis=1)
            finite_kth = np.isfinite(kth)
            sel = ppbm > kth[:, None]
            eq = ppbm == kth[:, None]
            n_gt = sel.sum(axis=1)
            n_eq = eq.sum(axis=1)
            # exact-fit ties (or all-finite fewer than k): take them all
            fit = n_eq <= (kk - n_gt)
            sel |= eq & fit[:, None]
            # kth == -inf: fewer than k valid candidates; sel (> -inf)
            # already holds exactly the finite ones
            for i in np.flatnonzero(finite_kth & ~fit):
                tie_ids = c_ids[eq[i]]
                need = kk - int(n_gt[i])
                keep = np.sort(np.argsort(tie_ids, kind="stable")[:need])
                cols = np.flatnonzero(eq[i])[keep]
                sel[i, cols] = True
        rows, cols = np.nonzero(sel)
        if len(rows) == 0:
            return empty
        return pd.DataFrame(
            {
                "query_id": a_ids[rows],
                "neg_id": c_ids[cols],
                "cos_ppb": ppb[rows, cols].astype("i8"),
            }
        )

    per_cell = routed.groupBy("cell").applyInPandas(
        _cell_mine, "query_id long, neg_id long, cos_ppb bigint"
    )
    # the same (query, neg) pair can surface from several probed cells
    # with the same exact score — dedup before the global merge
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppb").desc(), F.col("neg_id").asc()
    )
    return (
        per_cell.groupBy("query_id", "neg_id")
        .agg(F.max("cos_ppb").alias("cos_ppb"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neg_id",
            "cos_ppb",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 10,
) -> DataFrame:
    """Train product-quantization codebooks (Jegou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the vector into
    ``m`` contiguous subvectors and fit an independent ``ksub``-center
    k-means per subspace. Returns (sub, code, center array<float>) —
    m x ksub rows, driver-tiny.

    PQ is the memory side of 100 TB ANN: a 64-dim float32 vector
    (256 B) compresses to m small codes (8 B at m=8 — y59 trains
    8 subspaces x 64 centers, i.e. 6-bit codes stored as bytes), so the
    whole corpus's codes fit where raw vectors cannot, and scoring
    needs only code lookups (see :func:`pq_adc_topk`). Like IVF
    training, fit on a sample and encode the full corpus.

    Deterministic for a fixed seed + input partitioning (the s02
    training note). m must divide the dimension."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = corpus.select(vec_col).first()
    dim = len(first[vec_col])
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    d = dim // m
    spark = corpus.sparkSession
    rows = []
    for sub in range(m):
        feats = corpus.select(
            array_to_vector(
                F.expr(f"slice(cast({vec_col} as array<double>),"
                       f" {sub * d + 1}, {d})")
            ).alias("features")
        )
        model = KMeans(k=ksub, seed=seed + sub, maxIter=max_iter).fit(feats)
        for code, c in enumerate(model.clusterCenters()):
            rows.append((sub, code, [float(x) for x in c]))
    cb = spark.createDataFrame(
        rows, "sub INT, code INT, center ARRAY<DOUBLE>"
    )
    return cb.select(
        "sub", "code", F.col("center").cast("array<float>").alias("center")
    )


_PQ_QUANT = (
    "transform({0}, x -> cast(floor(cast(x as double)"
    " * 1000000.0d + 0.5d) as bigint))"
)


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "auto",
    codebook_rows: list | None = None,
) -> DataFrame:
    """Encode every vector as ``m`` subspace codes: per subvector, the
    L2-nearest codebook center. Returns (vec_id, sub, code) — the PQ
    index an ADC scan reads instead of raw vectors.

    ``codebook_rows``: optional pre-collected ``(sub, code, center)``
    tuples (the trained-literals list the catalog entries already hold
    driver-side). When given, the vectorized tier skips BOTH driver
    jobs it would otherwise run against the codebook DataFrame (the
    m/d metadata agg and the codebook collect) — at corpus scale those
    are noise, but they are fixed per-query scheduler round-trips the
    bench's small-SF points pay in full.

    Exactness (the y48 integer idiom): centers and subvectors are
    ``floor(x*1e6+0.5)``-quantized, and the L2 argmin compares
    ``sum(c_i^2 - 2*x_i*c_i)`` — an exact BIGINT (the ``x_i^2`` term is
    constant per subvector and cannot change the argmin) — with ties to
    the lowest code, so codes are value-exact cross-engine.

    ``impl``: ``'vectorized'`` (default under ``'auto'``) computes all
    ``m`` argmins per vector inside one Arrow-batched int64 numpy pass
    against the task-shipped quantized codebook (the
    :func:`assign_ivf_cells_matmul` / SRP-matmul route, guide §4.2) —
    NO explode, NO codebook join, NO shuffle: the expression tier's
    corpus x ksub row blow-up (n*m*ksub rows through a broadcast join
    and a hash-agg) never exists. All arithmetic is int64 on the SAME
    quantized grid, and ``np.argmin`` takes the FIRST minimum over
    code-ordered rows — exactly the expression tier's
    ``min_by(code, struct(dist, code))`` tie rule — so codes are
    bit-identical (asserted in tests). ``'expr'`` keeps the
    expression/broadcast-join form, the structural twin of the DuckDB
    oracle: one broadcast join against m x ksub codebook rows, one
    map-side min_by hash-agg per (vector, sub) — no window,
    combiner-friendly."""
    if impl not in ("auto", "vectorized", "expr"):
        raise ValueError(f"impl must be auto|vectorized|expr, got {impl!r}")
    corpus = corpus.filter(F.col(vec_col).isNotNull())
    if impl in ("auto", "vectorized"):
        # the vectorized tier collects the (driver-tiny) codebook anyway,
        # so m/d metadata comes from that one read — no separate agg job
        return _pq_encode_vectorized(
            corpus, codebooks, id_col, vec_col, codebook_rows
        )
    md = codebooks.groupBy().agg(
        F.count_distinct("sub").alias("m"), F.max(F.size("center")).alias("d")
    ).first()
    m, d = int(md["m"]), int(md["d"])
    cb = codebooks.select(
        "sub",
        "code",
        F.expr(_PQ_QUANT.format("center")).alias("__qc"),
    ).withColumn(
        "__cc",
        F.expr("aggregate(__qc, 0L, (acc, v) -> acc + v * v)"),
    )
    subs = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(sub).alias("sub"),
                        F.expr(
                            _PQ_QUANT.format(
                                f"slice({vec_col}, {sub * d + 1}, {d})"
                            )
                        ).alias("__qx"),
                    )
                    for sub in range(m)
                ]
            )
        ).alias("sv"),
    ).select("vec_id", F.col("sv.sub").alias("sub"), F.col("sv.__qx").alias("__qx"))
    dist = F.col("__cc") - 2 * F.expr(
        "aggregate(zip_with(__qx, __qc, (x, y) -> x * y),"
        " 0L, (acc, v) -> acc + v)"
    )
    return (
        subs.join(broadcast(cb), "sub")
        .withColumn("__dist", dist)
        .groupBy("vec_id", "sub")
        .agg(F.expr("min_by(code, struct(__dist, code))").alias("code"))
    )


def _pq_encode_vectorized(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    codebook_rows: list | None = None,
) -> DataFrame:
    """Arrow-batched implementation of :func:`pq_encode`: the quantized
    codebook (m x ksub x d int64 — driver-tiny, the trained-literals
    table) ships with the task; per batch the subvectors quantize to
    the identical ``floor(x*1e6+0.5)`` grid and each subspace's argmin
    of ``cc - 2 * (X_sub @ C_sub^T)`` runs as one integer matmul —
    int64 end to end, zero floating-point accumulation, so the chosen
    codes match the expression tier bit-for-bit (first-minimum argmin
    over code-ordered rows == ``min_by(code, struct(dist, code))``).
    Centers pass through float32 before quantizing — the codebook
    column is ARRAY<FLOAT>, and the expression tier quantizes the
    float32-rounded values; skipping that round-trip would put literal
    doubles on a different grid."""
    import numpy as np
    from pyspark.sql import types as T

    if codebook_rows is None:
        codebook_rows = codebooks.select(
            "sub", "code", F.col("center").cast("array<double>")
        ).collect()
    cb_rows = [(int(r[0]), int(r[1]), r[2]) for r in codebook_rows]
    m = len({s for s, _, _ in cb_rows})
    d = max(len(c) for _, _, c in cb_rows)
    ksub = max(code for _, code, _ in cb_rows) + 1
    cmat = np.zeros((m, ksub, d), dtype="i8")
    for sub, code, c in cb_rows:
        cq = np.asarray(c, dtype="f4").astype("f8")
        cmat[sub, code, : len(cq)] = np.floor(cq * 1e6 + 0.5).astype("i8")
    ccsq = (cmat * cmat).sum(axis=2)  # (m, ksub) int64

    base = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    subs = np.tile(np.arange(m, dtype="i4"), 1)

    def _encode(parts):
        import pandas as pd

        for pdf in parts:
            n = len(pdf)
            if n == 0:
                continue
            x = np.zeros((n, m * d), dtype="i8")
            for i, v in enumerate(pdf["__v"].to_numpy()):
                q = np.floor(np.asarray(v, dtype="f8") * 1e6 + 0.5).astype(
                    "i8"
                )
                x[i, : min(len(q), m * d)] = q[: m * d]
            xs = x.reshape(n, m, d)
            codes = np.empty((n, m), dtype="i4")
            for s in range(m):
                dist = ccsq[s][None, :] - 2 * (xs[:, s, :] @ cmat[s].T)
                codes[:, s] = np.argmin(dist, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), m),
                    "sub": np.tile(subs, n),
                    "code": codes.reshape(-1),
                }
            )

    id_field = base.schema["vec_id"]
    schema = T.StructType(
        [
            T.StructField("vec_id", id_field.dataType),
            T.StructField("sub", T.IntegerType()),
            T.StructField("code", T.IntegerType()),
        ]
    )
    # single-file inputs read as one partition; fan out so the matmul
    # runs on every core (no-op when the input already has parallelism)
    par = base.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    return base.mapInPandas(_encode, schema)


def write_ivfpq_index(
    corpus_with_cells: DataFrame,
    codebooks: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Persist a composed IVF-PQ index (the FAISS IVFPQ layout and the
    actual 100 TB retrieval geometry): PQ CODES — not raw vectors —
    partitioned on disk by coarse IVF cell
    (``.../cell=<k>/part-*.parquet``, rows ``(vec_id, sub, code)``).

    The two compressions compose: the cell partitioning makes a probe a
    partition-pruned scan of ``n_probe`` directories (IVF), and inside
    a cell only the m-byte code rows exist (PQ) — a 64-dim float32
    corpus stores at ~1/30 of raw size and a probe reads only the
    shortlisted fraction of that. ``corpus_with_cells`` is
    :func:`assign_ivf_cells` output; codes come from :func:`pq_encode`
    (value-exact BIGINT argmin, so the index is reproducible
    cross-engine)."""
    codes = pq_encode(
        corpus_with_cells, codebooks, id_col=id_col, vec_col=vec_col
    )
    cells = corpus_with_cells.select(F.col(id_col).alias("vec_id"), "cell")
    codes.join(cells, "vec_id").write.mode(mode).partitionBy(
        "cell"
    ).parquet(path)


def ivfpq_topk(
    codes_with_cells: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    codebook_rows: list | None = None,
) -> DataFrame:
    """ADC top-k over an IVF-PQ index: route each query to its
    ``n_probe`` nearest cells (max cosine vs the coarse centroids), then
    score ONLY the code rows of those cells by asymmetric distance
    (per-subspace lookup tables — the :func:`pq_adc_topk` math).
    ``codebook_rows``: optional pre-collected codebook tuples; provides
    the m/d metadata without the per-query agg job (the
    :func:`pq_encode` convention).

    ``codes_with_cells``: ``(vec_id, sub, code, cell)`` —
    :func:`write_ivfpq_index`'s layout read back, or built inline.

    Scale shape: the probe table (|queries| x n_probe) and the lookup
    table (|queries| x m x ksub) are both driver-tiny broadcasts; the
    corpus-side scan touches only probed cells' code rows and
    aggregates map-side to one row per (query, vector). Every score is
    an exact BIGINT (quantized-integer dots), so the composed pipeline
    is value-exact reproducible despite being doubly approximate
    (cell pruning + quantization error) — recall vs the exact
    brute-force baseline is a separate, measured property.
    Returns (query_id, match_id, score_q, rank)."""
    if codebook_rows is not None:
        m = len({int(r[0]) for r in codebook_rows})
        d = max(len(r[2]) for r in codebook_rows)
    else:
        md = codebooks.groupBy().agg(
            F.count_distinct("sub").alias("m"),
            F.max(F.size("center")).alias("d"),
        ).first()
        m, d = int(md["m"]), int(md["d"])
    cent = centroids.select(
        F.col(centroid_id).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("centv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    q_cells = q.crossJoin(broadcast(cent)).select(
        "query_id", "cell", cosine("qv", "centv").alias("cscore")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    probes = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )
    cb = codebooks.select(
        "sub", "code", F.expr(_PQ_QUANT.format("center")).alias("__qc")
    )
    qsubs = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(sub).alias("sub"),
                        F.expr(
                            _PQ_QUANT.format(
                                f"slice({vec_col}, {sub * d + 1}, {d})"
                            )
                        ).alias("__qx"),
                    )
                    for sub in range(m)
                ]
            )
        ).alias("sv"),
    ).select(
        "query_id", F.col("sv.sub").alias("sub"), F.col("sv.__qx").alias("__qx")
    )
    lut = qsubs.join(cb, "sub").select(
        "query_id",
        "sub",
        "code",
        F.expr(
            "aggregate(zip_with(__qx, __qc, (x, y) -> x * y),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("__l"),
    )
    scored = (
        codes_with_cells.join(broadcast(probes), "cell")
        .join(broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("__l").alias("score_q"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            "score_q",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def probe_ivfpq_index(
    spark,
    path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """ADC top-k against a DISK-RESIDENT :func:`write_ivfpq_index`
    layout: query routing runs first (queries x centroids, tiny), the
    probed cell ids are collected (|queries| * n_probe ints), and the
    code index is read with a literal ``cell IN (...)`` predicate —
    static partition pruning, the :func:`probe_ivf_index` contract.
    Value-identical to :func:`ivfpq_topk` over the same assignment."""
    cent = centroids.select(
        F.col(centroid_id).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("centv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    q_cells = q.crossJoin(broadcast(cent)).select(
        "query_id", "cell", cosine("qv", "centv").alias("cscore")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("cscore").desc(), F.col("cell").asc()
    )
    probed = (
        q_cells.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("cell")
        .distinct()
        .collect()
    )
    cells = sorted(int(r["cell"]) for r in probed)
    codes = spark.read.parquet(path).filter(F.col("cell").isin(cells))
    return ivfpq_topk(
        codes,
        centroids,
        codebooks,
        queries,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        centroid_id=centroid_id,
    )


def pq_adc_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook_rows: list | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ index: approx dot(q, x) =
    sum over subspaces of dot(q_sub, center[code_sub]) — the query stays
    EXACT (uncompressed), only the corpus side is quantized, which is
    what makes ADC beat symmetric code-to-code distances at the same
    memory. Returns (query_id, match_id, score_q, rank); ranking is
    (score desc, match_id asc); self-matches excluded.

    Scale shape: the lookup-table join is |queries| x m x ksub rows
    (driver-tiny, broadcast); the corpus-side scan touches only the
    (vec_id, sub, code) index — never raw vectors — and aggregates
    map-side to one row per (query, vector). Approximate by
    construction (quantization error), but DETERMINISTIC: every emitted
    score is an exact BIGINT (quantized-integer dots), so a SQL oracle
    replicates the whole pipeline value-exactly. ``codebook_rows``:
    optional pre-collected codebook tuples; provides the m/d metadata
    without the per-query agg job (the :func:`pq_encode` convention).
    """
    if codebook_rows is not None:
        m = len({int(r[0]) for r in codebook_rows})
        d = max(len(r[2]) for r in codebook_rows)
    else:
        md = codebooks.groupBy().agg(
            F.count_distinct("sub").alias("m"),
            F.max(F.size("center")).alias("d"),
        ).first()
        m, d = int(md["m"]), int(md["d"])
    cb = codebooks.select(
        "sub", "code", F.expr(_PQ_QUANT.format("center")).alias("__qc")
    )
    qsubs = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(sub).alias("sub"),
                        F.expr(
                            _PQ_QUANT.format(
                                f"slice({vec_col}, {sub * d + 1}, {d})"
                            )
                        ).alias("__qx"),
                    )
                    for sub in range(m)
                ]
            )
        ).alias("sv"),
    ).select(
        "query_id", F.col("sv.sub").alias("sub"), F.col("sv.__qx").alias("__qx")
    )
    lut = qsubs.join(cb, "sub").select(
        "query_id",
        "sub",
        "code",
        F.expr(
            "aggregate(zip_with(__qx, __qc, (x, y) -> x * y),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("__l"),
    )
    scored = (
        codes.join(broadcast(lut), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("__l").alias("score_q"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            "score_q",
            F.col("rank").cast("int").alias("rank"),
        )
    )
