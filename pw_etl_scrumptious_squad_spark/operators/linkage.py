"""Entity resolution: blocked fuzzy record linkage + canonicalization.

The classic warehouse-ingest problem the reference's dimension builds
(src/transform.py:64-110) silently assume away: source systems spell
the same real-world entity differently ("small ring" / "smal ring"),
and a dim build keyed on the raw string splits one entity across
surrogate keys. The standard scalable shape is three stages, each with
a crisp cost bound:

1. **Canonical mention table** — dedupe the corpus to DISTINCT name
   strings with mention counts (one hash-agg; the corpus is never
   touched again — the same touch-the-corpus-map-side-only discipline
   as operators/dedup.py's incremental CC).
2. **Blocked candidate pairs** — self-join the (small) distinct-name
   table only WITHIN a blocking key (here: the name's last token), so
   candidate generation is sum-of-block-sizes-squared, never
   corpus-quadratic; verify candidates with a real edit-distance
   (Spark's JVM ``levenshtein`` — no Python in the loop).
3. **Transitive closure + canonical pick** — connected components over
   the match graph (operators/dedup.py::connected_components, the
   large-star/small-star fold), canonical = lexicographic-minimum name
   per component, then ONE broadcast join maps every mention to its
   canonical entity.

Blocking is recall-lossy by design (a typo in the last token escapes
the block); production systems run multiple blocking passes and union
the candidates — the seam here is ``block_expr``, so a second pass
with a different key is one more call. Determinism: levenshtein is
exact integer, components are exact, the canonical pick is a total
order — value-hash-stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from pw_etl_scrumptious_squad_spark.operators.dedup import (
    connected_components,
)


def last_token(col: str | Column) -> Column:
    return F.element_at(F.split(col, " "), -1)


def blocked_fuzzy_pairs(
    names: DataFrame,
    name_col: str = "name",
    max_dist: int = 2,
    block_expr: Column | None = None,
) -> DataFrame:
    """Candidate pairs over a DISTINCT-name table: self-join within the
    blocking key, keep pairs with edit distance <= ``max_dist``.
    Returns (name_a, name_b, dist) with name_a < name_b."""
    block = block_expr if block_expr is not None else last_token(name_col)
    a = names.select(
        F.col(name_col).alias("name_a"), block.alias("__blk")
    )
    b = names.select(
        F.col(name_col).alias("name_b"), block.alias("__blk")
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


def resolve_entities(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    block_expr: Column | None = None,
) -> DataFrame:
    """Full ER pipeline over ``df[name_col]``. Returns one row per
    resolved entity: (canonical_name, n_variants, n_mentions), where
    canonical_name is the lexicographic minimum of the component and
    n_mentions counts corpus rows, not distinct spellings."""
    mentions = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_mentions")
    )
    names = mentions.select("name")
    pairs = blocked_fuzzy_pairs(names, "name", max_dist, block_expr).select(
        F.col("name_a").alias("doc_a"), F.col("name_b").alias("doc_b")
    )
    labels = connected_components(pairs, names, id_col="name")
    return (
        mentions.join(
            broadcast(
                labels.select(
                    F.col("node").alias("name"),
                    F.col("cluster_id").alias("canonical_name"),
                )
            ),
            "name",
        )
        .groupBy("canonical_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.sum("n_mentions").cast("bigint").alias("n_mentions"),
        )
    )
