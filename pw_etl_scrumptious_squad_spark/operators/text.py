"""Text-analysis operators for training-data pipelines (north-star
extensions, no reference counterpart — SURVEY.md §2.4).

Everything here is built-in/higher-order SQL functions (split, filter,
transform, aggregate, md5) — no Python UDFs — so the hot path stays in the
JVM and scales linearly with executors. Tokenization is a plain
single-space split to keep the semantics exactly reproducible in the DuckDB
oracle (``string_split(text, ' ')``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pw_etl_scrumptious_squad_spark.checkpoint import materialize

# Marker (function) words per language for the n-gram/stopword language-ID
# heuristic. Ties and zero scores resolve deterministically (priority order
# below, 'und' for no evidence).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "y", "es", "una"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": ["de", "shi", "zai", "le", "he"],
}
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]

ENGLISH_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for", "is", "it",
]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space split; empty tokens preserved to
    match ``string_split`` semantics in the oracle)."""
    return F.split(col, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


# Column name of the pre-computed token array that lang_id/quality_columns
# build their higher-order expressions over (computed once, pruned on output).
_SQL_TOKS = "__toks"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(_SQL_TOKS, tokens(text_col))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score = #tokens in each language's marker
    set; prediction = highest score, ties broken by LANG_PRIORITY order,
    'und' when every score is zero."""
    out = with_tokens(df, text_col)
    score_cols = {}
    for lang in LANG_PRIORITY:
        quoted = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_cols[lang] = F.expr(f"size(filter({_SQL_TOKS}, t -> t IN ({quoted})))")
        out = out.withColumn(f"score_{lang}", score_cols[lang])
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return out.withColumn("lang_pred", pred).drop(_SQL_TOKS)


def quality_columns(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: token counts, distinct-token ratio,
    alphabetic-character ratio, stopword ratio, and a combined score.

    All ratios are exact-integer divisions evaluated in IEEE double (both
    engines agree bit-for-bit) and rounded to 9 places for stable hashing.
    Empty / whitespace-only documents have zero tokens (or zero chars):
    ``try_divide`` makes their ratios NULL — DuckDB's x/0 semantics — so
    real crawl corpora (which always contain empty docs) flow through
    instead of crashing the ANSI-mode division.
    """
    out = with_tokens(df, text_col)
    n_chars = F.length(text_col)
    n_tokens = F.expr(f"size({_SQL_TOKS})")
    n_alpha = F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", ""))
    quoted = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    n_stop = F.expr(f"size(filter({_SQL_TOKS}, t -> t IN ({quoted})))")
    n_distinct = F.expr(f"size(array_distinct({_SQL_TOKS}))")
    distinct_ratio = F.round(F.try_divide(n_distinct, n_tokens), 9)
    alpha_ratio = F.round(F.try_divide(n_alpha, n_chars), 9)
    stop_ratio = F.round(F.try_divide(n_stop, n_tokens), 9)
    return (
        out.withColumn("n_tokens", n_tokens)
        .withColumn("n_alpha", n_alpha)
        .withColumn("n_stopwords", n_stop)
        .withColumn("distinct_ratio", distinct_ratio)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn(
            "quality_score",
            F.round(
                0.4 * alpha_ratio + 0.3 * stop_ratio + 0.3 * distinct_ratio, 9
            ),
        )
        .drop(_SQL_TOKS)
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """Top-k terms per document by TF-IDF.

    tf = term count / doc length; idf = ln(N / df). One explode + two
    hash aggregations; the document-frequency table and the corpus size
    are broadcast back (both tiny: |vocab| and 1 row), so the corpus
    itself is scanned once and shuffled once (on doc_id for the rank
    window). Ties break by term for determinism.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("d"))
    nd = df.agg(F.count(F.lit(1)).alias("nd"))
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(
                (F.col("c") / F.col("n").cast("double"))
                * F.log(F.col("nd").cast("double") / F.col("d")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


# Temp column holding the per-document shingle-md5 array. Hoisting the
# token split and the shingle hashing into a real column matters: an
# expression like slice(split(text), i, k) INSIDE a transform() lambda
# re-splits the text for every shingle index (no common-subexpression
# elimination across lambda iterations) — measured 3-6x slower than
# computing the array once per row.
_SQL_SHINGLES = "__shingles"


def with_shingles(
    df: DataFrame, text_col: str = "text", shingle_size: int = 5
) -> DataFrame:
    """Adds ``__shingles``: md5 of every ``shingle_size``-token shingle.

    The md5 hex string is the cross-engine-stable hash (identical in Spark
    and DuckDB), the basis for fingerprinting and MinHash. Both temp columns
    are narrow projections — no shuffle; callers drop them on output."""
    k = shingle_size
    # Docs shorter than one shingle get ONE whole-text shingle. Two reasons:
    # (a) sequence(1, 0) in Spark yields a DESCENDING [1, 0], not an empty
    # array, so the unguarded expression errors on short docs; (b) an empty
    # shingle set makes downstream Jaccard 0/0 — the whole-text fallback
    # keeps "identical docs hash identically, distinct docs differ" and
    # equals md5(text) exactly (rejoining all tokens with ' ' restores the
    # text), matching fingerprint()'s documented short-doc fallback.
    return df.withColumn(_SQL_TOKS, tokens(text_col)).withColumn(
        _SQL_SHINGLES,
        F.expr(
            f"CASE WHEN size({_SQL_TOKS}) >= {k} THEN"
            f" transform(sequence(1, size({_SQL_TOKS}) - {k - 1}),"
            f" i -> md5(concat_ws(' ', slice({_SQL_TOKS}, i, {k}))))"
            f" ELSE array(md5(concat_ws(' ', {_SQL_TOKS}))) END"
        ),
    )


def fingerprint(df: DataFrame, text_col: str = "text", shingle_size: int = 5) -> DataFrame:
    """Document fingerprint: full-text md5 plus the minimum shingle-md5
    (a 1-permutation MinHash — stable under small edits far from the
    minimizing shingle). Docs shorter than one shingle fall back to the
    full-text hash."""
    return (
        with_shingles(df, text_col, shingle_size)
        .withColumn("content_md5", F.md5(F.col(text_col)))
        .withColumn(
            "shingle_fingerprint",
            F.coalesce(F.array_min(_SQL_SHINGLES), F.md5(F.col(text_col))),
        )
        .drop(_SQL_TOKS, _SQL_SHINGLES)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    chunking step of a training/RAG ingestion pipeline.

    Pure column expressions: tokenize once, generate window starts with
    ``sequence`` (stride-spaced), explode, slice. One output row per
    chunk: (doc_id, chunk_idx, chunk_start, n_chunk_tokens, chunk_text).
    No shuffle — the explode is a generator over an already-partitioned
    scan, so a 100 TB corpus chunks in a single map stage."""
    toks = tokens(text_col)
    return (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("__tk"))
        .withColumn("__n", F.size("__tk"))
        .withColumn(
            "chunk_start",
            F.explode(F.expr(f"sequence(1, greatest(__n, 1), {stride})")),
        )
        .select(
            "doc_id",
            ((F.col("chunk_start") - 1) / stride).cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("int"),
            F.expr(f"slice(__tk, chunk_start, {chunk_tokens})").alias("__c"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_start",
            F.size("__c").alias("n_chunk_tokens"),
            F.array_join("__c", " ").alias("chunk_text"),
        )
    )


# PII patterns restricted to the RE2/Java common regex subset so Spark and
# any oracle engine agree: emails, international-ish phone numbers, and
# long digit runs (ids, SSNs, card fragments).
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ]?[0-9]{0,4}",
    "digit_run": "[0-9]{6,}",
}


def mask_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub PII-shaped substrings, emitting the masked text plus per-kind
    match counts (the audit trail a curation pipeline needs). Row-level
    regexp built-ins only — JVM-side, no UDFs; masking order is fixed
    (email, phone, digit_run) so counts are deterministic."""
    out = df
    masked = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(masked, F.lit(pat)).cast("int")
        )
        masked = F.regexp_replace(masked, pat, f"<{kind}>")
    return out.withColumn("masked_text", masked)


def ngram_counts(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Corpus-wide n-gram frequencies: tokenize, slide an n-window, explode,
    hash-aggregate. One shuffle (the count), map-side partial agg free."""
    toks = tokens(text_col)
    grams = F.expr(
        f"transform(sequence(1, greatest(size(__tk) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(__tk, i, {n})))"
    )
    return (
        df.select(toks.alias("__tk"))
        .filter(F.size("__tk") >= n)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int = 100,
) -> DataFrame:
    """Inverted index build (term -> sorted posting list), the retrieval
    side of the corpus: one row per distinct term with its document
    frequency and, for terms at or under ``df_cap`` documents, the full
    comma-joined posting list.

    The cap is the skew guard: on a web-scale corpus a stopword's
    posting list is the whole corpus — materializing it in one
    aggregation buffer is an executor OOM. Document frequencies are
    counted first (map-side-combinable), and only terms under the cap
    join back (left-semi) to collect postings; heavy terms keep an exact
    count with a NULL posting list (callers shard those separately or
    treat them as stop-terms). Two term-keyed shuffles total, both
    partial-aggregated.
    """
    pairs = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("term"),
    )
    dfc = pairs.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    light = dfc.filter(F.col("n_docs") <= df_cap).select("term")
    postings = (
        pairs.join(light, "term", "left_semi")
        .groupBy("term")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("doc_id")), ","
            ).alias("postings")
        )
    )
    return dfc.join(postings, "term", "left").select(
        "term", "n_docs", "postings"
    )


def encode_token_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = 0,
) -> DataFrame:
    """Encode each document's token stream into vocabulary ids — the
    text -> training-input step. Vocabulary = distinct corpus tokens
    ranked by (frequency desc, token), id starting at 1; unseen tokens
    (when encoding NEW text against this corpus's vocab) get ``oov_id``.

    The vocabulary ranking is one global window over the VOCAB (token
    types, not occurrences — bounded and small even at corpus scale);
    the vocab then collapses to a single-row token->id map that
    broadcasts to every executor, and encoding is a pure vectorized
    ``transform`` over the split tokens — the corpus is scanned once,
    never exploded, never shuffled.
    """
    toks = F.split(F.col(text_col), " ")
    vocab = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), "term")
    vmap = (
        vocab.select("term", F.row_number().over(w).cast("int").alias("id"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "id"))
            ).alias("__vmap")
        )
    )
    from pyspark.sql.functions import broadcast as _bc

    return (
        df.crossJoin(_bc(vmap))
        .select(
            F.col(id_col),
            F.size(toks).cast("int").alias("n_tokens"),
            F.array_join(
                F.transform(
                    toks,
                    lambda t: F.coalesce(
                        F.element_at(F.col("__vmap"), t), F.lit(oov_id)
                    ).cast("string"),
                ),
                ",",
            ).alias("token_ids"),
        )
    )


def shingle_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 8,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    k-token shingles that appear NOWHERE else in the corpus — the
    memorization/duplication diagnostic (docs near 0 are assembled from
    corpus boilerplate; docs near 1 contribute genuinely new text).
    Complements dedup: it scores every document instead of emitting
    pairs, so it feeds mixing/weighting decisions directly.

    Shape: per-doc distinct shingle-md5s (map-side dedup BEFORE the
    explode — the duplicate mass never shuffles; hashed in Arrow
    batches, the y92 route, instead of the interpreted per-shingle
    md5 lambda), one shingle-keyed document-frequency aggregation
    (partial-agg absorbed), one join back on the shingle, one
    doc-keyed count — the same two-shuffle skeleton as TF-IDF. Exact
    integers + one division rounded at 6 dp.
    """
    from pw_etl_scrumptious_squad_spark.operators.sketches import (
        shingle_occurrences,
    )

    ex = shingle_occurrences(
        df, text_col, shingle_size, keep_cols=(id_col,),
        distinct_within_row=True,
    ).select(
        F.col(id_col).alias("doc_id"), F.col("item").alias("h")
    ).transform(materialize)
    dfreq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        ex.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("bigint")).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        F.col("n_novel").cast("bigint").alias("n_novel"),
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
            "novelty_ratio"
        ),
    )


def shingle_df_store(
    df: DataFrame, text_col: str = "text", shingle_size: int = 8
) -> DataFrame:
    """The persisted state behind incremental novelty: corpus-wide
    ``(h, df)`` document frequencies of distinct k-token shingle md5s.
    Maintained like any incremental rollup (``curation.merge_aggregates``
    merges a batch's counts in); at scale write it bucketed by ``h`` so
    the per-batch join co-locates without shuffling the store."""
    from pw_etl_scrumptious_squad_spark.operators.sketches import (
        shingle_occurrences,
    )

    return (
        shingle_occurrences(
            df, text_col, shingle_size, distinct_within_row=True
        )
        .select(F.col("item").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )


def incremental_shingle_novelty(
    batch: DataFrame,
    store_counts: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_size: int = 8,
) -> DataFrame:
    """Incremental twin of :func:`shingle_novelty`: score an ARRIVING
    batch against the persisted corpus shingle-frequency store without
    touching the historical documents. A batch shingle's corpus df is
    ``df_batch + df_store``, so the result is IDENTICAL to running the
    full-corpus novelty restricted to the batch (the equality the
    catalog oracle checks) — at a per-ingest cost proportional to the
    batch, not the corpus.

    Shape: batch-side distinct+explode (map-side), one batch-keyed df
    agg, one join against the store keyed on the shingle hash (store
    bucketed by ``h`` ⇒ co-located), one doc-keyed count. The store
    itself is maintained incrementally (see :func:`shingle_df_store`).
    """
    from pw_etl_scrumptious_squad_spark.operators.sketches import (
        shingle_occurrences,
    )

    ex = shingle_occurrences(
        batch, text_col, shingle_size, keep_cols=(id_col,),
        distinct_within_row=True,
    ).select(
        F.col(id_col).alias("doc_id"), F.col("item").alias("h")
    ).transform(materialize)
    df_batch = ex.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("__dfb")
    )
    df_total = df_batch.join(
        store_counts.select("h", F.col("df").alias("__dfs")), "h", "left"
    ).select(
        "h",
        (F.col("__dfb") + F.coalesce("__dfs", F.lit(0))).alias("__df"),
    )
    per_doc = (
        ex.join(df_total, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("__df") == 1).cast("bigint")).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        F.col("n_novel").cast("bigint").alias("n_novel"),
        F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias(
            "novelty_ratio"
        ),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking of the corpus against a fixed query-term set — the
    retrieval scoring that pairs with ``inverted_index`` (Robertson &
    Zaragoza 2009; idf in the Lucene ``ln(1 + (N-df+0.5)/(df+0.5))``
    form, which is never negative).

    Scale shape: the per-document term frequencies are higher-order
    ``filter`` expressions over the token split — the corpus is scanned
    once, never exploded (the query has a handful of terms, so a tf
    column per term beats a token explode by orders of magnitude). The
    corpus-level statistics (N, Σdl, per-term document frequencies) are
    ONE tiny aggregate row broadcast back, scoring is map-side, and the
    top-k is a TakeOrderedAndProject — no global sort, no shuffle of the
    corpus anywhere.

    Determinism: each per-term score is one fixed expression tree over
    exact integers plus the single ``avgdl`` double, evaluated
    identically by both engines, then scaled to a BIGINT ppb value with
    ``floor(x*1e9 + 0.5)`` (round() would re-round a sum); the document
    score is the exact integer sum of its per-term ppb scores, so
    partition order cannot perturb ranks.
    """
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("__tk")
    ).withColumn("dl", F.size("__tk"))
    if not query_terms:
        # zero query terms => every document scores 0; an empty contrib
        # sum would otherwise be an unparseable empty expression
        return (
            base.select(
                "doc_id",
                F.col("dl").cast("int").alias("dl"),
                F.lit(0).cast("bigint").alias("score_ppb"),
            )
            .orderBy(F.col("score_ppb").desc(), "doc_id")
            .limit(k)
        )
    def _tf(term: str):
        # term carried as a literal Column, not spliced into SQL text —
        # immune to quotes/backslashes in the query vocabulary (the
        # lambda must stay unary: a second parameter would flip
        # F.filter into its (element, index) binary form)
        return F.size(F.filter(F.col("__tk"), lambda t: t == F.lit(term)))

    for i, term in enumerate(query_terms):
        base = base.withColumn(f"__tf{i}", _tf(term))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("bigint")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    contribs = []
    for i in range(len(query_terms)):
        tf = f"cast(__tf{i} as double)"
        dfreq = f"cast(__df{i} as double)"
        idf = f"ln(1.0d + (cast(n_docs as double) - {dfreq} + 0.5d) / ({dfreq} + 0.5d))"
        norm = (
            f"({tf} + {k1}d * (1.0d - {b}d + {b}d * cast(dl as double)"
            f" / (cast(sum_dl as double) / cast(n_docs as double))))"
        )
        contribs.append(
            f"cast(floor({idf} * ({tf} * {1.0 + k1}d) / {norm}"
            " * 1000000000.0d + 0.5d) as bigint)"
        )
    return (
        scored.select(
            "doc_id",
            F.col("dl").cast("int").alias("dl"),
            F.expr(" + ".join(contribs)).alias("score_ppb"),
        )
        .orderBy(F.col("score_ppb").desc(), "doc_id")
        .limit(k)
    )


# Gopher-style rule thresholds (Rae et al. 2021, table A1 subset) — the
# document-level heuristics that run before any model-based scoring.
GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_NONALPHA_RATIO = 0.2
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MAX_TOP_TOKEN_RATIO = 0.2


def gopher_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rule quality battery: per-document heuristic flags and a
    keep/drop decision with the first failing rule as the reason —
    the cheap screen a 100 TB corpus runs before model scoring.

    Rules (each an exact integer or exact-ratio test, so the oracle
    reproduces them bit-for-bit): word count in [40, 100k]; mean word
    length in [2, 10]; non-alphabetic token ratio ≤ 0.2; ≥ 2 stopword
    hits; most-frequent token ≤ 20% of the document. Entirely map-side
    — no shuffle, no UDFs; ratios are exact integer divisions in IEEE
    double rounded once at 6 dp.
    """
    out = with_tokens(df, text_col)
    n_words = F.expr(f"size({_SQL_TOKS})")
    sum_len = F.expr(f"aggregate({_SQL_TOKS}, 0, (a, t) -> a + length(t))")
    n_nonalpha = F.expr(
        f"size(filter({_SQL_TOKS}, t -> t rlike '[^a-zA-Z]'))"
    )
    quoted = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    n_stop = F.expr(f"size(filter({_SQL_TOKS}, t -> t IN ({quoted})))")
    # most-frequent token count without an explode OR a per-distinct
    # rescan: sort the tokens and fold a run-length max in one pass —
    # O(n log n) per document instead of O(n_words * n_distinct), which
    # at the 100k-word rule ceiling is the difference between a sort and
    # ~10^10 comparisons on an adversarial document
    top_tok = F.expr(
        f"aggregate(array_sort({_SQL_TOKS}),"
        " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
        " (s, t) -> named_struct("
        "   'prev', t,"
        "   'run', IF(t <=> s.prev, s.run + 1, 1),"
        "   'best', greatest(s.best, IF(t <=> s.prev, s.run + 1, 1))),"
        " s -> s.best)"
    )
    out = (
        out.withColumn("n_words", n_words.cast("int"))
        .withColumn("mean_word_len", F.round(sum_len / n_words, 6))
        .withColumn("nonalpha_ratio", F.round(n_nonalpha / n_words, 6))
        .withColumn("n_stopword_hits", n_stop.cast("int"))
        .withColumn("top_token_ratio", F.round(top_tok / n_words, 6))
    )
    checks = [
        (
            "word_count",
            (F.col("n_words") >= GOPHER_MIN_WORDS)
            & (F.col("n_words") <= GOPHER_MAX_WORDS),
        ),
        (
            "mean_word_len",
            (F.col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN)
            & (F.col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN),
        ),
        (
            "nonalpha",
            F.col("nonalpha_ratio") <= GOPHER_MAX_NONALPHA_RATIO,
        ),
        ("stopwords", F.col("n_stopword_hits") >= GOPHER_MIN_STOPWORD_HITS),
        (
            "repetition",
            F.col("top_token_ratio") <= GOPHER_MAX_TOP_TOKEN_RATIO,
        ),
    ]
    keep = F.lit(True)
    reason = F.lit("")
    # first failing rule wins: fold right-to-left so earlier rules override
    for name, ok in reversed(checks):
        reason = F.when(~ok, F.lit(name)).otherwise(reason)
    for _, ok in checks:
        keep = keep & ok
    return out.withColumn("keep", keep).withColumn("drop_reason", reason).drop(
        _SQL_TOKS
    )


def bigram_logprob_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Perplexity-proxy quality scoring (CCNet-style): train a bigram
    MLE language model on the corpus itself, then score every document
    by its mean bigram log-probability ``avg ln c(w1,w2)/c(w1)``.
    Documents full of boilerplate score near 0 (their bigrams dominate
    the corpus); rare-garbage documents score very negative — the
    screen perplexity filtering applies before expensive model scoring.

    Every document bigram exists in the corpus counts by construction
    (the model is trained on the same corpus), so MLE needs no
    smoothing. Determinism: a float ``avg(ln ...)`` would sum doubles
    in partition order — not reproducible across engines OR runs. Each
    log term is instead rounded at 9 dp and summed as a scaled BIGINT
    (exact, order-free), then divided and rounded once — the same
    one-rounded-float-per-value discipline t06's TF-IDF uses.
    Documents with fewer than 2 tokens get score NULL.

    Scale shape: two hash-aggs (bigram counts, unigram counts) and one
    shuffle join of the exploded bigram stream against the counts —
    all keys are high-cardinality, partial aggregation applies. At
    100 TB the counts table is itself huge; the production variant
    prunes it to the top-K frequencies with a floor probability for
    the tail (documented trade; the exact form here is the oracle
    tier)."""
    toks = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("__tk")
    ).transform(materialize)
    grams = F.expr(
        "transform(sequence(1, size(__tk) - 1),"
        " i -> struct(element_at(__tk, i) AS w1,"
        " element_at(__tk, i + 1) AS w2))"
    )
    # ONE explode, aggregated to per-doc bigram multiplicities first
    # (guide §2.3: aggregate before you shuffle / project early). The
    # corpus counts AND the unigram-left counts both derive from this
    # table — the unigram event space (every token except each doc's
    # last) is exactly the bigram lefts, so c1(w) == sum of c12(w, *)
    # — and the scoring join carries one row per (doc, w1, w2) with a
    # multiplicity instead of one row per token position. Identical
    # integers: sum(m * slog) over distinct bigrams == sum(slog) over
    # positions, and n_bigrams == sum(m).
    doc_bg = (
        base.filter(F.size("__tk") >= 2)
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("m"))
        .transform(materialize)
    )
    big_counts = doc_bg.groupBy("w1", "w2").agg(
        F.sum("m").cast("bigint").alias("c12")
    )
    uni_counts = doc_bg.groupBy("w1").agg(
        F.sum("m").cast("bigint").alias("c1")
    )
    scaled_log = F.expr(
        "cast(round(ln(c12 / c1) * 1000000000, 0) as bigint)"
    )
    scored = (
        doc_bg.join(big_counts, ["w1", "w2"])
        .join(uni_counts, "w1")
        .select("doc_id", "m", scaled_log.alias("__slog"))
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(F.col("m") * F.col("__slog"))
                / F.sum("m")
                / F.lit(1000000000.0),
                6,
            ).alias("avg_logprob"),
        )
    )
    return base.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        "avg_logprob",
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
    checkpoint_every: int = 4,
    batch_merges: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich et al. 2016,
    "Neural Machine Translation of Rare Words with Subword Units"):
    learn the ``num_merges`` highest-frequency adjacent-symbol merges
    over the corpus, the companion of :func:`encode_token_ids` /
    the t05 regex tokenizer which only APPLY a fixed scheme. Output:
    one row per learned merge, ``(rank, left, right, merged,
    pair_count)``, in learning order.

    100 TB shape — the corpus is touched exactly ONCE: the word-
    frequency table (lowercased whitespace words -> freq) is one
    map-side-combined hash-agg, after which every iteration runs on
    the VOCABULARY table (~1e6 rows for web text regardless of corpus
    bytes — the Sennrich word-freq trick; training on raw tokens would
    shuffle the corpus per merge). Per round: one bounded pair-count
    shuffle over the vocab, a 1-row argmax collect (count desc, then
    lexicographic — deterministic), and a map-side greedy merge fold
    (JVM higher-order ``aggregate``, no UDF). Lineage is truncated
    through the injectable checkpoint policy every
    ``checkpoint_every`` rounds so Catalyst analysis stays O(1) per
    round on a 50k-merge production run.

    The greedy left-to-right fold is exact: a merge output ``L+R``
    can never equal ``L`` (R is non-empty), so a symbol produced this
    round can never be the left side of an overlapping second merge —
    the fold's last-element check reproduces scan-and-skip greedy
    semantics without lookahead.

    Training stops early when no pair reaches ``min_pair_count``
    (emitting fewer than ``num_merges`` rows), matching the reference
    implementation's convergence rule.

    ``batch_merges=m`` learns up to ``m`` merges per driver round-trip
    (the standard distributed-BPE trick: a 32k-merge run must not be
    32k Spark jobs) while staying TOKEN-FOR-TOKEN equal to the
    sequential algorithm. Soundness: collect the top ``m+1`` pairs in
    argmax order; accept the maximal PREFIX that is mutually
    symbol-disjoint (also rejecting any pair whose side string-equals
    an earlier accepted pair's merged token — a pre-existing symbol
    can collide with a new merge output); then keep only accepted
    pairs whose count is STRICTLY greater than the first unaccepted
    pair's count. Disjoint merges cannot change each other's counts
    (a merge only destroys pairs touching its own symbols and creates
    pairs containing its merged token, each bounded by an interacting
    pair's old count — and every interacting pair ranks below the
    accepted prefix), so each accepted pair is exactly the argmax the
    sequential recount would produce, ties included (the strict-count
    guard removes any pair a new/lex-earlier rival could tie).
    Interaction-heavy corpora degrade gracefully to one merge per
    round (the fallback the parity tests force). ``stats``, when
    passed, records ``driver_rounds`` (argmax collects) and
    ``single_merge_rounds``.

    SELF-OVERLAP batch-breaker: the bound "every merge-created pair is
    bounded by an interacting pair's old count, and interacting pairs
    rank below the accepted prefix" fails when an accepted pair has
    ``left == right``. Merging ``(a,a)->aa`` over a symbol RUN creates
    ``(aa,aa)`` / ``(aa,a)`` pairs bounded by the accepted pair's OWN
    count — above ``stop_count`` — so a sequential recount could rank
    them ahead of any later same-batch acceptance (repro: words
    ``'aaaaaa'`` freq 10 give ``(a,a)=50`` and post-merge
    ``(aa,aa)=20``, overtaking a disjoint ``(x,y)=15``). A pair with
    ``left == right`` therefore BREAKS the batch: as ``top[0]`` it is
    accepted alone (the unconditional argmax — safe); mid-batch it is
    rejected like a conflicting pair (it becomes next round's
    ``top[0]``) and its count feeds the strict-count tie guard, since
    even accepting-then-stopping would let a merge-created rival tie
    its count and win the lexicographic tiebreak sequentially.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # chars via substring-by-index (split-on-'' emits a trailing empty
    # string in Spark); terminal '</w>' marks word ends so merges never
    # cross word boundaries
    syms = words.select(
        F.expr(
            "concat(transform(sequence(1, length(w)),"
            " i -> substring(w, i, 1)), array('</w>'))"
        ).alias("s"),
        "freq",
    ).transform(materialize)
    # zip_with over head/tail slices rather than sequence(1, size-1):
    # a fully-merged word is ONE symbol, and sequence(1, 0) is the
    # DESCENDING [1, 0] in Spark — slice(s, 1, 0) is just empty
    pair_expr = F.expr(
        "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),"
        " (a, b) -> struct(a as l, b as r))"
    )
    learned: list[tuple] = []
    driver_rounds = 0
    single_rounds = 0
    m = max(1, batch_merges)
    while len(learned) < num_merges:
        want = min(m, num_merges - len(learned))
        top = (
            syms.select(F.explode(pair_expr).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(want + 1)
            .collect()
        )
        driver_rounds += 1
        if not top or top[0]["c"] < min_pair_count:
            break
        # maximal rank-ordered prefix of mutually disjoint pairs (also
        # guarding against a side string-equal to an accepted merge)
        accepted = [top[0]]
        used = {top[0]["l"], top[0]["r"], top[0]["l"] + top[0]["r"]}
        stop_count = None
        if top[0]["l"] != top[0]["r"]:  # self-overlap ends the batch
            for row in top[1:]:
                if (
                    len(accepted) >= want
                    or row["c"] < min_pair_count
                    or row["l"] in used
                    or row["r"] in used
                    # a mid-batch self-overlapping pair is REJECTED, not
                    # accepted-then-stop: a rival created by an earlier
                    # accepted merge can TIE its count and win the lex
                    # tiebreak in a sequential recount, so it is only
                    # safe as next round's unconditional top[0]
                    or row["l"] == row["r"]
                ):
                    stop_count = int(row["c"])
                    break
                accepted.append(row)
                used |= {row["l"], row["r"], row["l"] + row["r"]}
        # strict-count guard: a pair tying the first unaccepted pair's
        # count could be overtaken (or lex-tied) by a merge-created pair
        if stop_count is not None:
            accepted = [accepted[0]] + [
                r for r in accepted[1:] if int(r["c"]) > stop_count
            ]
        if len(accepted) == 1:
            single_rounds += 1
        for row in accepted:
            left, right, count = row["l"], row["r"], int(row["c"])
            merged = left + right
            learned.append((len(learned), left, right, merged, count))
            lit_l, lit_r, lit_m = F.lit(left), F.lit(right), F.lit(merged)
            syms = syms.select(
                F.aggregate(
                    "s",
                    F.array().cast("array<string>"),
                    lambda acc, x: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == lit_l)
                        & (x == lit_r),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1), F.array(lit_m)
                        ),
                    ).otherwise(F.concat(acc, F.array(x))),
                ).alias("s"),
                "freq",
            )
            if len(learned) % checkpoint_every == 0:
                syms = syms.transform(materialize)
    if stats is not None:
        stats["driver_rounds"] = driver_rounds
        stats["single_merge_rounds"] = single_rounds
    return spark.createDataFrame(
        learned,
        "rank INT, left STRING, right STRING, merged STRING,"
        " pair_count BIGINT",
    )


def _spread_narrow_input(df: DataFrame) -> DataFrame:
    """Round-robin a NARROW input across the executor cores before a
    high-multiplier explode (per-character ops multiply rows ~1000x).

    Why: partition count is inherited from the SCAN, and a gate-scale
    documents file is one parquet split — so without this, one task
    does the whole corpus's explode + partial aggregation while 31
    cores idle (the x02 post-window fix's failure class). At cluster
    scale a 100 TB scan already has thousands of splits and this gate
    is a no-op; the guarded repartition only ever shuffles the NARROW
    pre-explode rows (text bytes, not the exploded multiple)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-level Shannon entropy per document (nats) — the
    classic cheap gibberish/boilerplate screen (low entropy = repeated
    filler, high entropy = encrypted/base64 blobs) run alongside the
    Gopher rules on raw crawl text. Output: ``(doc_id, n_chars,
    n_distinct, entropy_nats)`` for non-empty documents.

    Exactness: each character's ``p*ln(p)`` term is ONE double
    expression ppb-rounded to BIGINT (the x02/y49 quantization
    pattern), so the per-doc sum is integer-exact and engine-order-
    independent; negation happens on the BIGINT (never ``-0.0``) and
    the final 6-dp rounding is applied once.

    100 TB shape: a per-character explode (map-side, ~5x the token
    explode of t01) into a (doc_id, char) hash-agg with map-side
    combine — alphabet-bounded fan-in per doc — then one doc-keyed agg.
    No UDFs, no window, nothing collected. Input is spread across
    cores first (``_spread_narrow_input``): the ~1000x char explode
    must not inherit a single-split scan's parallelism.
    """
    docs = _spread_narrow_input(docs)
    chars = docs.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col})),"
                f" i -> substring({text_col}, i, 1))"
            )
        ).alias("ch"),
    )
    cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    terms = cnt.join(tot, "doc_id").select(
        "doc_id",
        "n",
        F.expr(
            "cast(round((cast(c as double) / cast(n as double))"
            " * ln(cast(c as double) / cast(n as double))"
            " * 1000000000.0, 0) as bigint)"
        ).alias("tq"),
    )
    return terms.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("n_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.round((-F.sum("tq")) / 1000000000.0, 6).alias("entropy_nats"),
    )


def zipf_slope(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf's-law fit per language: OLS slope/intercept of ln(freq) on
    ln(rank) over each language's ``top_n`` most frequent tokens — the
    classic corpus-health diagnostic (natural language sits near -1;
    boilerplate-heavy or templated corpora flatten, gibberish steepens).
    Returns (lang, n_points, top_mass, slope, intercept); ranking
    tie-break is (count desc, token asc) so the fit set is
    deterministic. Languages with fewer than 2 distinct top tokens are
    dropped (slope undefined).

    Scale shape: the corpus is touched ONCE by a combiner-friendly
    (lang, token) hash-agg — the per-language ranking window runs over
    the VOCABULARY-sized count table, not the corpus, so the few-keys
    lang partition skew is bounded by vocabulary, and the final
    per-language agg state is 5 integers.

    Exactness: each point's ln(rank), ln(count), and their products are
    ppb-quantized to BIGINT (the y49/y52 pattern), so the OLS sums are
    integer-exact cross-engine; slope and intercept are then ONE double
    expression each over those integers (same operand order in the
    oracle) rounded to 6 dp.
    """
    tk = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    cnt = tk.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("tok").asc()
    )
    top = cnt.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    q = "cast(round({0} * 1000000000.0, 0) as bigint)"
    lx = "ln(cast(rank as double))"
    ly = "ln(cast(c as double))"
    terms = top.select(
        "lang",
        "c",
        F.expr(q.format(lx)).alias("xq"),
        F.expr(q.format(ly)).alias("yq"),
        F.expr(q.format(f"({lx} * {ly})")).alias("xyq"),
        F.expr(q.format(f"({lx} * {lx})")).alias("xxq"),
    )
    agg = terms.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("c").cast("bigint").alias("top_mass"),
        F.sum("xq").alias("sx"),
        F.sum("yq").alias("sy"),
        F.sum("xyq").alias("sxy"),
        F.sum("xxq").alias("sxx"),
    )
    slope = (
        "((cast(n_points as double) * (cast(sxy as double)"
        " / 1000000000.0d))"
        " - ((cast(sx as double) / 1000000000.0d)"
        " * (cast(sy as double) / 1000000000.0d)))"
        " / ((cast(n_points as double) * (cast(sxx as double)"
        " / 1000000000.0d))"
        " - ((cast(sx as double) / 1000000000.0d)"
        " * (cast(sx as double) / 1000000000.0d)))"
    )
    intercept = (
        "((cast(sy as double) / 1000000000.0d)"
        f" / cast(n_points as double)) - (({slope})"
        " * ((cast(sx as double) / 1000000000.0d)"
        " / cast(n_points as double)))"
    )
    return agg.filter(F.col("n_points") >= 2).select(
        "lang",
        "n_points",
        "top_mass",
        F.expr(f"round({slope}, 6)").alias("slope"),
        F.expr(f"round({intercept}, 6)").alias("intercept"),
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 500,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary — the standard tokenizer-fit /
    domain-shift screen (a doc whose tokens mostly miss the vocabulary
    will fragment into subwords or <unk>s downstream). Returns
    (doc_id, n_tokens, n_oov, oov_rate) for docs with >= 1 token.

    Vocabulary rule: global token counts, top-``vocab_size`` by
    (count desc, token asc) — fully deterministic. The vocabulary is
    corpus-derived here for a self-contained oracle; a fixed external
    vocab plugs into the same join.

    Scale shape: ONE combiner-friendly token hash-agg builds the vocab
    (vocabulary-sized, then TakeOrdered to ``vocab_size`` — driver-tiny
    and broadcast); the per-doc pass is explode + broadcast LEFT join +
    one doc-keyed hash-agg. ``oov_rate`` is an exact-integer division
    rounded to 9 dp (the catalog ratio rule — no midpoint ambiguity).
    """
    tk = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = (
        tk.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("__iv"))
    )
    joined = tk.join(F.broadcast(vocab), "tok", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(
            F.when(F.col("__iv").isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("__iv").isNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("oov_rate"),
    )


def _greedy_merge_expr(sym_col, left: str, right: str, merged: str):
    """One BPE merge applied left-to-right over a symbol array — the
    same JVM ``aggregate`` fold as :func:`bpe_train`'s training loop
    (docstring there proves the fold == scan-and-skip greedy)."""
    lit_l, lit_r, lit_m = F.lit(left), F.lit(right), F.lit(merged)
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (x == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lit_m)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Apply a trained BPE merge list (:func:`bpe_train`'s output) to a
    corpus — the tokenizer-APPLY half of the BPE story. Returns one row
    per document: (doc_id, n_words, n_tokens, fertility, tokens_md5)
    where fertility = tokens per word (the tokenizer-fit metric) and
    tokens_md5 fingerprints the full token stream in word order (an
    order-exact witness that the encoding itself is right, not just the
    counts).

    100 TB shape (the Sennrich word-freq trick, applied to inference):
    a word's tokenization depends only on the word, so the merge loop
    runs over the DISTINCT-WORD table (vocabulary-sized — ~1e6 rows for
    web text regardless of corpus bytes), never the corpus. The corpus
    is touched twice: once to build the vocab hash-agg, once to
    broadcast-join the word->tokens map back (|vocab| x small strings —
    broadcastable at web-vocab scale) and aggregate per doc. All merge
    folds are JVM higher-order expressions; lineage is truncated through
    the checkpoint policy every ``checkpoint_every`` merges.

    ``merges`` is the bpe_train DataFrame (rank, left, right, merged,
    pair_count) or an equivalent list of (left, right) pairs in rank
    order. Like training, words are lowercased whitespace tokens and
    '</w>' terminates every word so merges never cross boundaries.
    """
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        merge_list = [(r["left"], r["right"]) for r in rows]
    else:
        merge_list = [(m[0], m[1]) for m in merges]
    wpos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "w"),
    ).filter(F.col("w") != "")
    vocab = wpos.select("w").distinct()
    syms = vocab.select(
        "w",
        F.expr(
            "concat(transform(sequence(1, length(w)),"
            " i -> substring(w, i, 1)), array('</w>'))"
        ).alias("s"),
    )
    for i, (left, right) in enumerate(merge_list):
        syms = syms.select(
            "w", _greedy_merge_expr("s", left, right, left + right).alias("s")
        )
        if (i + 1) % checkpoint_every == 0:
            syms = syms.transform(materialize)
    mapping = syms.select(
        "w",
        F.col("s").alias("toks"),
        F.size("s").cast("bigint").alias("n_toks"),
    )
    joined = wpos.join(F.broadcast(mapping), "w")
    ordered_toks = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "toks"))),
            lambda st: st["toks"],
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.sum("n_toks").cast("double")
            / F.count(F.lit(1)).cast("double"),
            9,
        ).alias("fertility"),
        F.md5(F.concat_ws(" ", ordered_toks)).alias("tokens_md5"),
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 25,
) -> DataFrame:
    """Collocation mining by pointwise mutual information: top-k
    adjacent token pairs by ``PMI = ln(c_xy * N / (c_x * c_y))`` among
    pairs seen at least ``min_count`` times — the classic multi-word-
    expression / boilerplate-phrase detector (high-PMI pairs are units;
    a corpus whose top PMI list is navigation chrome needs cleaning).

    Scale shape: one bigram explode + three combiner-friendly hash-aggs
    (pair, unigram, total — the last two vocabulary-sized and broadcast
    back); the final top-k is a TakeOrdered over the pair table. All
    counts exact integers; the PMI argument ``(c_xy * N) / (c_x * c_y)``
    is one exact-integer division in double, the PMI ppb-quantized for
    the deterministic ranking and reported at 6 dp."""
    bg = docs.select(
        F.split(F.col(text_col), " ").alias("t")
    ).select(
        F.explode(
            F.expr(
                # try_element_at: a 1-token doc generates i=1 with no
                # i+1 — ANSI element_at would THROW there, try_ yields
                # the NULL the filter was written to drop (DuckDB's
                # out-of-range list index semantics)
                "filter(transform(sequence(1, greatest(size(t) - 1, 1)),"
                " i -> struct(element_at(t, i) as x,"
                " try_element_at(t, i + 1) as y)),"
                " p -> p.x != '' and p.y is not null and p.y != '')"
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    pair = bg.groupBy("x", "y").agg(F.count(F.lit(1)).alias("cxy"))
    ux = bg.groupBy("x").agg(F.count(F.lit(1)).alias("cx"))
    uy = bg.groupBy("y").agg(F.count(F.lit(1)).alias("cy"))
    n = bg.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        pair.filter(F.col("cxy") >= min_count)
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "__pmiq",
            F.expr(
                "cast(round(ln(cast(cxy * n as double)"
                " / cast(cx * cy as double)) * 1000000000.0, 0)"
                " as bigint)"
            ),
        )
    )
    return (
        scored.orderBy(
            F.col("__pmiq").desc(), F.col("x").asc(), F.col("y").asc()
        )
        .limit(k)
        .select(
            "x",
            "y",
            F.col("cxy").cast("bigint").alias("pair_count"),
            F.round(F.col("__pmiq") / 1_000_000_000.0, 6).alias("pmi"),
        )
    )


_SCRIPT_RANGES = [
    # (script, lo, hi) — codepoint ranges, exact integer compares so the
    # classification is engine-independent (no regex script tables)
    ("latin", 0x41, 0x5A),
    ("latin", 0x61, 0x7A),
    ("latin", 0xC0, 0x24F),   # Latin-1 supplement + Extended-A/B
    ("greek", 0x370, 0x3FF),
    ("cyrillic", 0x400, 0x4FF),
    ("arabic", 0x600, 0x6FF),
    ("han", 0x4E00, 0x9FFF),
]


def script_classify_expr(cp: Column) -> Column:
    """Codepoint -> script bucket as a chained CASE over
    ``_SCRIPT_RANGES`` (anything unmatched — digits, punctuation,
    space, other blocks — is 'other')."""
    expr = F.lit("other")
    for name, lo, hi in reversed(_SCRIPT_RANGES):
        expr = F.when((cp >= lo) & (cp <= hi), F.lit(name)).otherwise(expr)
    return expr


def script_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Unicode SCRIPT profile — the writing-system half of
    language ID (t04 guesses the language of latin text; a crawl corpus
    first needs to know it is looking at Cyrillic/Han/Arabic at all,
    both for routing to per-script tokenizers and for mixed-script spam
    screens). Output: ``(doc_id, n_chars, n_latin, n_greek,
    n_cyrillic, n_arabic, n_han, n_other, dominant_script)`` for
    non-empty documents, where dominant is the argmax script bucket
    (ties broken to the alphabetically FIRST script — deterministic:
    min_by over struct(-count, script)).

    Classification is by CODEPOINT RANGE (exact integer compares), not
    regex script classes, so any engine reproduces it bit-for-bit —
    Java and RE2 ship different Unicode tables, codepoints don't lie.

    100 TB shape: the y52 skeleton — per-character explode into a
    (doc, script) hash-agg with map-side combine (fan-in bounded by the
    handful of script buckets), one pivot-free conditional aggregation,
    no UDFs, no window (dominant via max_by over the bounded bucket
    set). Input is spread across cores first (``_spread_narrow_input``):
    the per-char explode must not inherit a single-split scan's
    parallelism."""
    docs = _spread_narrow_input(docs)
    chars = docs.filter(F.length(text_col) > 0).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(
                f"transform(sequence(1, length({text_col})),"
                f" i -> ascii(substring({text_col}, i, 1)))"
            )
        ).alias("cp"),
    )
    tagged = chars.select(
        "doc_id", script_classify_expr(F.col("cp")).alias("script")
    )
    per = tagged.groupBy("doc_id", "script").agg(
        F.count(F.lit(1)).alias("c")
    )
    scripts = ["latin", "greek", "cyrillic", "arabic", "han", "other"]
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_chars"),
        *[
            F.sum(F.when(F.col("script") == s, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias(f"n_{s}")
            for s in scripts
        ],
        F.expr("min_by(script, struct(-c, script))").alias("dominant_script"),
    )


def heavy_hitters_exact(
    df: DataFrame,
    text_col: str = "text",
    denom: int = 2000,
    capacity: int = 4096,
) -> DataFrame:
    """EXACT corpus-wide heavy hitters (tokens with frequency >=
    ceil(total_tokens / ``denom``)) without ever shuffling the full
    term universe — the two-phase sketch-then-recount pattern that
    replaces a naive global ``groupBy(token)`` at 100 TB.

    Phase 1 streams each partition's tokens through a weighted
    Misra-Gries summary of ``capacity`` counters (one pass,
    O(capacity + batch-vocabulary) memory, Arrow-batched via
    mapInPandas — the iterator form keeps ONE summary per partition
    across all of its record batches; per batch the tokens
    pre-aggregate into a Counter and fold as weights, with the
    Agarwal et al. mergeable trim bounding the table). A token absent
    from a partition's summary has local frequency <= n_p/(capacity+1),
    so a token absent from EVERY summary has global frequency <=
    total/(capacity+1) < ceil(total/denom) whenever capacity + 1 >
    denom — the candidate union provably contains every true heavy
    hitter (the sketch can only over-admit, never miss). Phase 2
    recounts ONLY the candidates exactly: the candidate set is at most
    n_partitions * capacity rows, broadcast into a map-side semi-join,
    so the one real shuffle aggregates a pre-filtered token stream.
    Deterministic by construction: the sketch decides WHAT to recount,
    never a reported count, so partitioning cannot change the answer.

    Returns ``(token, n_occurrences BIGINT)`` for tokens meeting the
    threshold, plus the threshold embedded nowhere — callers needing it
    recompute ceil(total/denom) as the oracle does. Tokenization is the
    module's single-space split with empty tokens dropped (matching
    ``string_split(text, ' ') ... <> ''`` in DuckDB oracles)."""
    if capacity + 1 <= denom:
        raise ValueError(
            f"capacity {capacity} must exceed denom {denom} for exactness"
        )
    import pandas as pd

    spark = df.sparkSession
    narrow = _spread_narrow_input(df.select(F.col(text_col).alias("t")))

    def _mg(batches):
        # Weighted Misra-Gries fold, vectorized per Arrow batch
        # (round-10 verdict item 8): each batch pre-aggregates into a
        # collections.Counter (one C-level update over a token
        # generator — no per-token dict juggling in the inner loop),
        # then folds the batch's (token, weight) pairs into the
        # capacity-bounded summary. When the merged table exceeds
        # ``capacity``, subtract the (capacity+1)-th largest count from
        # EVERY counter and drop the non-positive rest — the mergeable-
        # summaries trim (Agarwal et al.; the same rule the streaming
        # twin uses). Each trim of v removes >= (capacity+1)*v mass, so
        # the cumulative decrement D <= n_p/(capacity+1): a token
        # absent from the final summary has local frequency <=
        # n_p/(capacity+1), exactly the admission guarantee the
        # per-token decrement loop gave — and phase 2 recounts
        # candidates exactly, so the operator's OUTPUT is unchanged by
        # construction whichever sketch produced the candidate set.
        from collections import Counter

        counters: dict[str, int] = {}
        for pdf in batches:
            bc: Counter = Counter()
            bc.update(
                tok
                for text in pdf["t"]
                if text is not None
                for tok in text.split(" ")
                if tok
            )
            if not bc:
                continue
            for tok, w in bc.items():
                counters[tok] = counters.get(tok, 0) + w
            if len(counters) > capacity:
                vals = sorted(counters.values(), reverse=True)
                v = vals[capacity]  # (capacity+1)-th largest
                counters = {
                    k: c - v for k, c in counters.items() if c > v
                }
        if counters:
            yield pd.DataFrame({"token": sorted(counters)})

    candidates = narrow.mapInPandas(_mg, "token STRING").distinct()

    toks = narrow.select(F.explode(F.split("t", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    total = toks.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    counted = (
        toks.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_occurrences")
            >= F.expr(f"(total + {denom - 1}) DIV {denom}")
        )
        .select("token", "n_occurrences")
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style; Kudo 2018) — the standard
# alternative tokenizer family next to BPE (bpe_train/bpe_encode above)
# ---------------------------------------------------------------------------

_UNIGRAM_BIG = 10**15  # unreachable-prefix sentinel; any real path < 1e14


def _sql_str(s: str) -> str:
    """Escape a piece string into a Spark SQL single-quoted literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _unigram_cost_map_sql(costs: dict[str, int]) -> str:
    items = ", ".join(
        f"{_sql_str(p)}, cast({int(c)} as bigint)"
        for p, c in sorted(costs.items())
    )
    return f"map({items})"


def _viterbi_expr(
    word_col: str,
    costs: dict[str, int],
    max_piece_len: int,
    with_tokens: bool,
) -> str:
    """Spark SQL Viterbi over one word: exact integer min-cost
    segmentation under quantized piece costs, as ONE JVM higher-order
    ``aggregate`` (no UDF). The accumulator is the dp array (1-indexed;
    element j+1 = best for the j-char prefix); per position the
    candidate set is the <= ``max_piece_len`` suffix pieces looked up
    in the broadcast cost-map literal (try_element_at: missing piece ->
    NULL -> filtered). Comparator is the ADDITIVE total order
    (cost, then piece count) — equivalent to a single additive cost
    ``c*M + n`` with M > any n, so optimal substructure holds and the
    result is the global lexicographic (cost, n_pieces) minimum, which
    is what the DuckDB path-enumeration oracle computes independently.
    ``with_tokens`` additionally carries the argmin token stream for
    the trainer's E-step (ties broken by the token-stream string — a
    deterministic total order both engines share).

    At 100 TB the map-literal lookup is the broadcast-vocab pattern:
    the word table this runs on is vocabulary-sized (the Sennrich
    word-freq trick — see bpe_encode), never the corpus, and per word
    the DP does O(len * max_piece_len) map probes."""
    w = word_col
    K = int(max_piece_len)
    mp = _unigram_cost_map_sql(costs)
    if with_tokens:
        stype = "struct<c: bigint, n: bigint, t: array<string>>"
        init = (
            "array(named_struct('c', cast(0 as bigint),"
            " 'n', cast(0 as bigint), 't', cast(array() as array<string>)))"
        )
        sentinel = (
            f"named_struct('c', cast({_UNIGRAM_BIG} as bigint),"
            " 'n', cast(0 as bigint), 't', cast(array() as array<string>))"
        )
        cand = (
            f"element_at(transform(array(try_element_at({mp},"
            f" substring({w}, j - l + 1, l))), pc ->"
            f" if(pc is null, cast(null as {stype}),"
            " named_struct("
            "'c', element_at(acc, j - l + 1).c + pc,"
            " 'n', element_at(acc, j - l + 1).n + cast(1 as bigint),"
            f" 't', array_append(element_at(acc, j - l + 1).t,"
            f" substring({w}, j - l + 1, l))))), 1)"
        )
        # space as the join separator: words are whitespace-split, so
        # no piece can contain one — the joined stream is injective
        better = (
            "x.c < b.c or (x.c = b.c and (x.n < b.n or (x.n = b.n"
            " and concat_ws(' ', x.t) < concat_ws(' ', b.t))))"
        )
    else:
        stype = "struct<c: bigint, n: bigint>"
        init = (
            "array(named_struct('c', cast(0 as bigint),"
            " 'n', cast(0 as bigint)))"
        )
        sentinel = (
            f"named_struct('c', cast({_UNIGRAM_BIG} as bigint),"
            " 'n', cast(0 as bigint))"
        )
        cand = (
            f"element_at(transform(array(try_element_at({mp},"
            f" substring({w}, j - l + 1, l))), pc ->"
            f" if(pc is null, cast(null as {stype}),"
            " named_struct("
            "'c', element_at(acc, j - l + 1).c + pc,"
            " 'n', element_at(acc, j - l + 1).n + cast(1 as bigint)))), 1)"
        )
        better = "x.c < b.c or (x.c = b.c and x.n < b.n)"
    return (
        f"aggregate(sequence(1, length({w})), {init},"
        " (acc, j) -> array_append(acc,"
        f" aggregate(filter(transform(sequence(1, least(j, {K})),"
        f" l -> {cand}), x -> x is not null),"
        f" {sentinel}, (b, x) -> if({better}, x, b))),"
        " acc -> element_at(acc, size(acc)))"
    )


def _unigram_costs(counts: dict[str, int]) -> dict[str, int]:
    """Quantized negative log-probs: cost = round(-ln(count/total)*1e9)
    as BIGINT 'nano-nats'. Computed in PYTHON on the driver over the
    vocabulary-sized count table — Spark never evaluates a logarithm,
    so the pure-Python parity twin shares the exact float path and the
    engine-side DP is integer-only (the y51/y80 bit-parity posture)."""
    import math

    total = sum(counts.values())
    return {
        p: int(round(-math.log(c / total) * 1_000_000_000.0))
        for p, c in counts.items()
    }


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = 4,
    seed_size: int = 256,
    iters: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Unigram-LM tokenizer TRAINING (Kudo 2018, SentencePiece's
    unigram model; hard-EM variant): learn a ``vocab_size`` piece
    vocabulary with quantized -ln(p) costs. Output: one row per piece,
    ``(rank, piece, n_count, cost_q)`` ordered by (count desc, piece) —
    the vocab :func:`unigram_encode` applies.

    Algorithm (every stage deterministic, corpus touched ONCE):

    1. Word-frequency table — lowercased whitespace words, one
       map-side-combined hash-agg (the same Sennrich trick bpe_train
       uses: all iterations below run on the VOCABULARY-sized table).
    2. Seed vocabulary: every substring of length 1..``max_piece_len``
       weighted by word freq (one explode over the word table); keep
       ALL single characters (coverage guarantee: any word stays
       segmentable forever) plus the top multi-char substrings by
       (count desc, piece asc) up to ``seed_size``.
    3. Hard-EM ``iters`` rounds: Viterbi-segment the word table under
       current costs (:func:`_viterbi_expr` — one JVM pass, ties
       broken (cost, n_pieces, token-stream) so the E-step is engine-
       independent), recount pieces weighted by word freq (hash-agg,
       vocabulary-sized collect), drop multi-char pieces with zero
       count, floor single-char counts at 1, re-quantize costs in
       Python.
    4. Final prune to ``vocab_size`` (all singles + top multis by
       (count desc, piece asc)), one recount pass under the pruned
       vocab, final costs from that recount — counts floored at 1 so
       the pruned vocabulary stays FIXED (encode applies exactly the
       returned piece set; a zero-count survivor just carries the max
       cost instead of vanishing).

    Driver traffic per round is the piece-count table (<= seed_size
    rows) — bounded metadata, never data. Not SQL-expressible
    (iterative EM); exact parity vs a pure-Python reference trainer is
    pinned in tests/test_unigram.py (the y51 rows-only pattern).
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .transform(materialize)
    )
    subs = (
        words.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, length(w)),"
                    f" i -> transform(sequence(1, least({int(max_piece_len)},"
                    " length(w) - i + 1)), l -> substring(w, i, l))))"
                )
            ).alias("p"),
            "freq",
        )
        .groupBy("p")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
        .transform(materialize)
    )
    singles = {
        r["p"]: int(r["cnt"])
        for r in subs.filter(F.length("p") == 1).collect()
    }
    n_multi = max(0, int(seed_size) - len(singles))
    multis = {
        r["p"]: int(r["cnt"])
        for r in subs.filter(F.length("p") > 1)
        .orderBy(F.col("cnt").desc(), F.col("p").asc())
        .limit(n_multi)
        .collect()
    }
    counts = {**singles, **multis}
    if not counts:  # empty corpus: empty vocab frame, stable schema
        return spark.createDataFrame(
            [], "rank INT, piece STRING, n_count BIGINT, cost_q BIGINT"
        )
    costs = _unigram_costs(counts)
    rounds = 0

    def _recount(cur_costs: dict[str, int]) -> dict[str, int]:
        expr = _viterbi_expr("w", cur_costs, max_piece_len, with_tokens=True)
        got = (
            words.select(F.expr(expr).alias("v"), "freq")
            .select(F.explode("v.t").alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
            .collect()
        )
        return {r["p"]: int(r["cnt"]) for r in got}

    for _ in range(int(iters)):
        new = _recount(costs)
        rounds += 1
        counts = {
            p: max(new.get(p, 0), 1) if len(p) == 1 else new[p]
            for p in counts
            if len(p) == 1 or new.get(p, 0) > 0
        }
        costs = _unigram_costs(counts)
    # final prune to vocab_size (singles always survive), then one
    # recount so reported counts/costs describe the PRUNED vocab
    keep_multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, int(vocab_size) - len(singles))]
    counts = {
        **{p: c for p, c in counts.items() if len(p) == 1},
        **dict(keep_multi),
    }
    costs = _unigram_costs(counts)
    new = _recount(costs)
    rounds += 1
    counts = {
        p: max(new.get(p, 0), 1) if len(p) == 1 else max(new.get(p, 0), 1)
        for p in counts
    }
    costs = _unigram_costs(counts)
    if stats is not None:
        stats["driver_rounds"] = rounds
    out = sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))
    return spark.createDataFrame(
        [
            (i + 1, p, c, costs[p])
            for i, (p, c) in enumerate(out)
        ],
        "rank INT, piece STRING, n_count BIGINT, cost_q BIGINT",
    )


def unigram_encode(
    docs: DataFrame,
    vocab,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unigram-LM tokenizer APPLY: Viterbi-segment every document under
    a trained vocabulary (:func:`unigram_train` output, or any
    ``(piece, cost_q)`` mapping). Returns one row per document with at
    least one word: ``(doc_id, n_words, n_pieces, total_cost_q,
    pieces_per_word)`` where ``n_pieces``/``total_cost_q`` are the
    lexicographic (cost, piece-count) minimum summed over words — a
    tie-robust contract (any two minimum-cost segmentations with the
    same piece count yield identical output), which is what makes the
    entry VALUE-oracle-able: the DuckDB twin enumerates segmentation
    paths by recursive CTE over the same piece literals and takes the
    same (min cost, then min count).

    100 TB shape: the Viterbi loop runs on the DISTINCT-WORD table
    (vocabulary-sized), the corpus is touched twice (word explode;
    broadcast word->(cost, n) map-back + per-doc agg), and the whole
    DP is one JVM higher-order expression — no Python in the data
    path. Coverage contract: the vocabulary must contain every single
    character of the corpus (unigram_train guarantees it for its own
    training corpus); words with uncovered characters surface with
    ``total_cost_q >= 1e14`` (the documented sentinel) rather than
    failing mid-job."""
    if isinstance(vocab, DataFrame):
        costs = {
            r["piece"]: int(r["cost_q"]) for r in vocab.collect()
        }
    elif isinstance(vocab, dict):
        costs = {p: int(c) for p, c in vocab.items()}
    else:
        costs = {p: int(c) for p, c in vocab}
    if not costs:
        raise ValueError("unigram_encode: empty vocabulary")
    K = max(len(p) for p in costs)
    wpos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
    ).filter(F.col("w") != "")
    expr = _viterbi_expr("w", costs, K, with_tokens=False)
    mapping = (
        wpos.select("w")
        .distinct()
        .select(
            "w",
            F.expr(expr).alias("v"),
        )
        .select(
            "w",
            F.col("v.c").alias("wc"),
            F.col("v.n").alias("wn"),
        )
    )
    return (
        wpos.join(F.broadcast(mapping), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("wn").cast("bigint").alias("n_pieces"),
            F.sum("wc").cast("bigint").alias("total_cost_q"),
            F.round(
                F.sum("wn").cast("double") / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("pieces_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# Unicode text normalization (round-10 continuation): the standard first
# stage of any web-scale text pipeline — strip controls / zero-widths,
# canonicalize whitespace, NFC-compose — with Python touching ONLY the
# rows that can possibly need it
# ---------------------------------------------------------------------------

# control chars (C0 minus \t\n\r, plus DEL) and the zero-width family —
# removed outright; Java regex escapes (Spark side)
_CTRL_ZW_JAVA = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\u200B\\u200C\\u200D\\uFEFF]"
)
# whitespace canonicalized to a single ASCII space (incl. NBSP — the
# NFKC mapping a pure-NFC pass would miss)
_WS_JAVA = "[ \\t\\n\\r\\u00A0]+"
_NONASCII_JAVA = "[^\\x00-\\x7F]"


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Unicode-normalize a text column: drop control and zero-width
    characters, collapse whitespace runs (incl. NBSP) to single spaces,
    trim, then NFC-compose combining sequences. Returns ``(id_col,
    keep_cols..., text_norm, changed BOOLEAN, n_chars_before BIGINT,
    n_chars_after BIGINT)`` — one row per input row, lengths in code
    points on both engines.

    100 TB shape: the strip/collapse/trim chain is pure JVM regexp
    (whole-stage codegen, no shuffle). NFC is the one step Spark has no
    built-in for — and it is EXACTLY an identity on pure-ASCII strings,
    so the corpus splits on one cheap ``rlike`` and only rows still
    containing a non-ASCII character after cleanup enter the
    Arrow-batched mapInPandas stage (unicodedata.normalize per batch);
    on web corpora that is a small fraction, and the split is the
    difference between "Python sees every row" and "Python sees the
    rows the JVM cannot handle". Both branches are narrow projections;
    the union restores nothing shuffled. NULL text passes through as
    NULL (changed = NULL), matching SQL three-valued semantics.

    Determinism: the regex classes are explicit character sets (no \\s
    dialect drift between Java regex and RE2), and NFC is the Unicode
    standard composition both unicodedata and DuckDB's nfc_normalize
    implement — the catalog entry carries a full value oracle."""
    cleaned = df.select(
        id_col, *keep_cols, F.col(text_col).alias("__orig")
    ).withColumn(
        "__c",
        F.trim(
            F.regexp_replace(
                F.regexp_replace("__orig", _CTRL_ZW_JAVA, ""),
                _WS_JAVA,
                " ",
            )
        ),
    )
    nonascii = F.coalesce(
        F.col("__c").rlike(_NONASCII_JAVA), F.lit(False)
    )
    ascii_rows = cleaned.filter(~nonascii)
    needs_nfc = cleaned.filter(nonascii)

    def _nfc(batches):
        import unicodedata

        for pdf in batches:
            pdf = pdf.copy()
            pdf["__c"] = [
                None if s is None else unicodedata.normalize("NFC", s)
                for s in pdf["__c"]
            ]
            yield pdf

    fixed = needs_nfc.mapInPandas(_nfc, needs_nfc.schema)
    return ascii_rows.unionByName(fixed).select(
        id_col,
        *keep_cols,
        F.col("__c").alias("text_norm"),
        (F.col("__c") != F.col("__orig")).alias("changed"),
        F.length("__orig").cast("bigint").alias("n_chars_before"),
        F.length("__c").cast("bigint").alias("n_chars_after"),
    )


# ---------------------------------------------------------------------------
# WordPiece tokenizer (Schuster & Nakajima 2012; the BERT tokenizer) —
# completes the tokenizer triple next to BPE (bpe_train/bpe_encode) and
# unigram-LM (unigram_train/unigram_encode)
# ---------------------------------------------------------------------------

#: fixed-point scale for the WordPiece likelihood score:
#: score_q = pair_count * _WP_SCALE DIV (freq(left) * freq(right)).
#: BIGINT-exact while pair_count < 2^33 and freq(l)*freq(r) < 2^63
#: (ANSI overflow is a LOUD error, never a silent wrap) — comfortably
#: past any single-trainer corpus; a 1e13-token run would shard the
#: word table per language/domain first, which is also what you want
#: linguistically.
_WP_SCALE = 1_000_000_000


def wordpiece_train(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 30,
    min_pair_count: int = 2,
    checkpoint_every: int = 4,
    stats: dict | None = None,
) -> DataFrame:
    """Distributed WordPiece tokenizer TRAINING (Schuster & Nakajima
    2012, as popularized by BERT): like BPE, iteratively merge the best
    adjacent symbol pair — but ranked by the LIKELIHOOD score
    ``count(l,r) / (freq(l) * freq(r))`` rather than raw pair count,
    so rare-but-coherent units win over frequent-but-uninformative
    ones. Output: one row per learned merge, ``(rank, left, right,
    merged, pair_count, score_q)``, in learning order; word-interior
    symbols carry the ``##`` continuation prefix and a merge
    concatenates ``left + strip_##(right)``.

    Scoring is EXACT integer fixed-point: ``score_q = pair_count *
    _WP_SCALE DIV (freq(left) * freq(right))`` — no float division
    anywhere, so the distributed argmax (score_q desc, pair_count
    desc, then lexicographic) is bit-identical to the pure-Python
    sequential twin the parity tests run (the y51/y80 posture).

    100 TB shape: the corpus is touched ONCE (the word-frequency
    hash-agg); every round then runs three vocabulary-sized jobs —
    pair counts, symbol frequencies (both map-side-combined aggs over
    the word-symbol table), a 1-row argmax collect — plus the same
    JVM greedy merge fold as bpe_train, with lineage truncated through
    the injectable checkpoint policy. Unlike BPE, merges COUPLE
    through the score's denominator (an applied merge changes
    freq(l)/freq(r) for every pair sharing a side, and the newly
    created symbol's LOW frequency often vaults its pairs to the top
    — the opposite of BPE's count-bounded interaction argument), so
    the bpe_train batch-acceptance proof does not transfer: training
    is one merge per driver round BY DESIGN, and rounds are cheap
    because nothing in them scales with the corpus."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # first char bare, every later char '##'-prefixed (no '</w>'
    # terminal: the continuation prefix already encodes boundaries)
    syms = words.select(
        F.expr(
            "transform(sequence(1, length(w)),"
            " i -> if(i = 1, substring(w, i, 1),"
            " concat('##', substring(w, i, 1))))"
        ).alias("s"),
        "freq",
    ).transform(materialize)
    pair_expr = F.expr(
        "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),"
        " (a, b) -> struct(a as l, b as r))"
    )
    learned: list[tuple] = []
    rounds = 0
    while len(learned) < num_merges:
        freqs = (
            syms.select(F.explode("s").alias("sym"), "freq")
            .groupBy("sym")
            .agg(F.sum("freq").alias("f"))
        )
        top = (
            syms.select(F.explode(pair_expr).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .join(
                F.broadcast(freqs.withColumnRenamed("sym", "l")), "l"
            )
            .withColumnRenamed("f", "fl")
            .join(
                F.broadcast(freqs.withColumnRenamed("sym", "r")), "r"
            )
            .withColumnRenamed("f", "fr")
            .withColumn(
                "score_q", F.expr(f"c * {_WP_SCALE}L DIV (fl * fr)")
            )
            .orderBy(
                F.col("score_q").desc(),
                F.col("c").desc(),
                F.col("l").asc(),
                F.col("r").asc(),
            )
            .limit(1)
            .collect()
        )
        rounds += 1
        if not top or int(top[0]["c"]) < min_pair_count:
            break
        row = top[0]
        if int(row["c"]) >= 1 << 33:
            raise ValueError(
                "pair_count exceeds the BIGINT fixed-point budget; "
                "shard the word table before training"
            )
        left, right = row["l"], row["r"]
        assert right.startswith("##"), right  # every right is interior
        merged = left + right[2:]
        learned.append(
            (
                len(learned),
                left,
                right,
                merged,
                int(row["c"]),
                int(row["score_q"]),
            )
        )
        lit_l, lit_r, lit_m = F.lit(left), F.lit(right), F.lit(merged)
        syms = syms.select(
            F.aggregate(
                "s",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == lit_l)
                    & (x == lit_r),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1), F.array(lit_m)
                    ),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("s"),
            "freq",
        )
        if len(learned) % checkpoint_every == 0:
            syms = syms.transform(materialize)
    if stats is not None:
        stats["driver_rounds"] = rounds
    return spark.createDataFrame(
        learned,
        "rank INT, left STRING, right STRING, merged STRING,"
        " pair_count BIGINT, score_q BIGINT",
    )


def wordpiece_alphabet(docs: DataFrame, text_col: str = "text") -> list[str]:
    """The trainer's initial symbol inventory: every word-initial char
    bare plus every interior char '##'-prefixed — one vocabulary-sized
    distinct agg (the piece set an encoder needs alongside the learned
    merges)."""
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    rows = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w)),"
                    " i -> if(i = 1, substring(w, i, 1),"
                    " concat('##', substring(w, i, 1))))"
                )
            ).alias("sym")
        )
        .distinct()
        .collect()
    )
    return sorted(r["sym"] for r in rows)


def _wp_piece_map_sql(pieces: list[str]) -> str:
    items = ", ".join(
        f"{_sql_str(p)}, 1" for p in sorted(set(pieces))
    )
    return f"map({items})"


def wordpiece_encode(
    docs: DataFrame,
    pieces: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """WordPiece tokenizer APPLY: greedy longest-match-first
    segmentation of every word under a piece vocabulary (bare pieces
    at word start, '##'-prefixed continuations after), the BERT
    tokenizer's algorithm: at each frontier take the LONGEST vocab
    piece matching; a word with a frontier no piece matches is [UNK]
    (one piece, flagged). Returns per-document ``(doc_id, n_words,
    n_pieces, n_unk_words, pieces_per_word)``.

    The greedy walk is ONE JVM higher-order ``aggregate`` per DISTINCT
    word (the Sennrich word-freq trick — the DP table is
    vocabulary-sized, never the corpus), with the piece set broadcast
    as a map literal probed via try_element_at; the longest match at a
    frontier is ``array_max`` over the <= max-piece-len candidate
    lengths, a single bounded lambda with ONE copy of the map in the
    expression tree. The corpus is touched twice: word explode, and
    the broadcast map-back + per-doc agg. Greedy is single-path
    deterministic, so the entry carries a FULL value oracle (the
    DuckDB twin walks a jump table by recursive CTE)."""
    if not pieces:
        raise ValueError("pieces must be non-empty")
    K = max(
        len(p) - 2 if p.startswith("##") else len(p) for p in pieces
    )
    mp = _wp_piece_map_sql(pieces)
    walk = (
        "aggregate(sequence(1, length(w)),"
        " named_struct('pos', 0, 'np', cast(0 as bigint), 'unk', false),"
        " (acc, j) -> if(acc.unk or acc.pos != j - 1, acc,"
        " element_at(transform(array("
        f" array_max(filter(transform(sequence(1, least({K},"
        " length(w) - j + 1)),"
        f" l -> if(try_element_at({mp}, if(j = 1, substring(w, j, l),"
        " concat('##', substring(w, j, l)))) is not null,"
        " l, cast(null as int))), x -> x is not null))), plen ->"
        " if(plen is null,"
        " named_struct('pos', acc.pos, 'np', acc.np, 'unk', true),"
        " named_struct('pos', acc.pos + plen,"
        " 'np', acc.np + cast(1 as bigint), 'unk', false))), 1)),"
        " acc -> acc)"
    )
    wpos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("w"),
    ).filter(F.col("w") != "")
    distinct_words = wpos.select("w").distinct()
    encoded = distinct_words.select(
        "w", F.expr(walk).alias("v")
    ).select(
        "w",
        F.when(F.col("v.unk"), F.lit(1))
        .otherwise(F.col("v.np"))
        .cast("bigint")
        .alias("wn"),
        F.col("v.unk").cast("bigint").alias("wu"),
    )
    return (
        wpos.join(F.broadcast(encoded), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("wn").cast("bigint").alias("n_pieces"),
            F.sum("wu").cast("bigint").alias("n_unk_words"),
            F.round(
                F.sum("wn").cast("double") / F.count(F.lit(1)).cast("double"),
                9,
            ).alias("pieces_per_word"),
        )
    )


def heavy_hitters_exact_grouped(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    denom: int = 500,
    capacity: int = 1024,
) -> DataFrame:
    """PER-GROUP exact heavy hitters: for every group, the tokens with
    in-group frequency >= ceil(group_total / ``denom``) — the groupwise
    form of :func:`heavy_hitters_exact`, keeping its central discipline:
    the full (group, token) universe is NEVER shuffled.

    Phase 1 streams each partition's (group, token) pairs through ONE
    Misra-Gries summary PER GROUP PRESENT IN THE PARTITION (bounded
    state: groups-per-partition x ``capacity``; per Arrow batch the
    pairs pre-aggregate into a Counter, then fold with the Agarwal
    et al. mergeable trim per group). The admission guarantee is
    per-group: a token absent from every summary of group g has
    frequency <= total_g/(capacity+1) < ceil(total_g/denom) whenever
    ``capacity + 1 > denom`` — the candidate union can only
    over-admit. Phase 2 recounts ONLY candidate (group, token) pairs
    exactly (the candidate table is bounded by partitions x groups x
    capacity — Catalyst/AQE picks broadcast vs shuffle join by its
    actual size) and filters against per-group totals. Deterministic
    by construction: the sketch decides WHAT to recount, never a
    reported count. Returns ``(group_col, token, n_occurrences
    BIGINT)``."""
    if capacity + 1 <= denom:
        raise ValueError(
            f"capacity {capacity} must exceed denom {denom} for exactness"
        )
    import pandas as pd

    narrow = _spread_narrow_input(
        df.select(
            F.col(group_col).cast("string").alias("g"),
            F.col(text_col).alias("t"),
        )
    )

    def _mg(batches):
        from collections import Counter

        summaries: dict[str, dict[str, int]] = {}
        for pdf in batches:
            bc: Counter = Counter()
            for g, text in zip(pdf["g"], pdf["t"]):
                if text is None or g is None:
                    continue
                for tok in text.split(" "):
                    if tok:
                        bc[(g, tok)] += 1
            for (g, tok), w in bc.items():
                counters = summaries.setdefault(g, {})
                counters[tok] = counters.get(tok, 0) + w
            for g, counters in summaries.items():
                if len(counters) > capacity:
                    vals = sorted(counters.values(), reverse=True)
                    v = vals[capacity]
                    summaries[g] = {
                        k: c - v for k, c in counters.items() if c > v
                    }
        rows = [
            (g, tok) for g, counters in summaries.items() for tok in counters
        ]
        if rows:
            yield pd.DataFrame(rows, columns=["g", "token"])

    candidates = narrow.mapInPandas(
        _mg, "g STRING, token STRING"
    ).distinct()

    toks = narrow.select(
        "g", F.explode(F.split("t", " ")).alias("token")
    ).filter(F.col("token") != "")
    totals = toks.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("total")
    )
    counted = (
        toks.join(candidates, ["g", "token"])
        .groupBy("g", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
    return (
        counted.join(totals, "g")
        .filter(
            F.col("n_occurrences")
            >= F.expr(f"(total + {denom - 1}) DIV {denom}")
        )
        .select(
            F.col("g").alias(group_col), "token", "n_occurrences"
        )
    )
