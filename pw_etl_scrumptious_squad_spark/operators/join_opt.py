"""Bloom-filter semi-join pruning — scan reduction for 100 TB facts.

The standard shapes both break down in one specific regime: a fact⋈dim
semi-join where the dim's KEY SET is too big to broadcast as a hash
relation (tens of GB), so Catalyst falls back to shuffling the entire
fact on the join key. At 100 TB the fact shuffle dominates the job even
when only a sliver of rows survive.

The Bloom-filter shape fixes that regime: a Bloom filter over the dim
keys is orders of magnitude smaller than the keys themselves (~10 bits
per key at 1% false positives — 1 GB of bits covers ~860 M keys), has NO
false negatives, and membership tests are a few hash+bit probes. So:

1. build the filter from the dim side (one narrow pass over dim keys,
   partial ``bit_or`` aggregation map-side — the shuffle moves only
   sparse (word, bits) pairs, bounded by the filter size, not the dim);
2. broadcast the packed filter (ONE row holding a map of bit-words) to
   every fact partition and drop non-members WITHOUT shuffling the fact;
3. run the exact semi-join on the survivors only — correctness never
   depends on the filter (false positives are removed here; false
   negatives cannot exist), the filter only shrinks the expensive
   shuffle from |fact| to ~|matches|.

Spark's own runtime row-level filtering (``spark.sql.optimizer.
runtime.bloomFilter.enabled``) injects the same construct automatically
for some plans, but its ``bloom_filter_agg``/``might_contain``
expressions are not registered for public SQL/DataFrame use (verified:
UNRESOLVED_ROUTINE in PySpark 4.1). This implementation is pure public
API — ``xxhash64`` probes + ``bit_or`` aggregation + a one-row map
broadcast — and composes with any downstream operator.

No reference counterpart (the reference's only joins are two pandas
merges, ``src/transform.py:113,131``); this is a scale extension in the
same family as ``operators/skew.py``.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Bloom geometry defaults: m/n = 16 bits per key, k = 7 hashes puts the
# false-positive rate near 2^-7 ≈ 0.8% at full load, and every probe is
# one xxhash64 + one map lookup + one bit test.
DEFAULT_BITS_PER_KEY = 16
DEFAULT_NUM_HASHES = 7

_WORD_BITS = 64


def _shifted_bit(pos: Column) -> Column:
    """``1L << (pos % 64)`` — ``F.shiftleft``'s Python signature only takes
    a literal shift amount, so invoke the SQL function with a Column."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % _WORD_BITS).cast("int")
    )


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    """k independent bit positions in [0, n_bits): xxhash64 of (key, i).

    Seeding by hashing the probe index alongside the key keeps everything
    in one JVM-side expression per probe (xxhash64's seed argument isn't
    exposed through the DataFrame API; an extra hashed column is the
    public-API equivalent).
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits)) for i in range(n_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    key: str,
    n_bits: int = 1 << 20,
    n_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """ONE-row DataFrame ``(bloom: array<long>)`` — the filter packed as
    DENSE 64-bit words, index == word number.

    Dense-array (not map) representation because the probe side pays for
    it on EVERY fact row: Spark's ``element_at`` on a MAP column is a
    linear scan of the entries (GetMapValue has no hash index), so a
    sparse ``map<long,long>`` filter costs O(n_bits/64) per probe —
    measured as the dominant cost of the z29 probe stage (7 hashes x
    2048-entry scans per lineitem row). Array ``element_at`` is O(1).

    Plan shape: project k positions per key → explode → union a zero
    row per word (so the agg yields exactly ``n_bits/64`` rows) →
    map-side partial ``bit_or`` per word → final ``bit_or`` (shuffle
    bounded by ``n_bits/64`` rows, NOT by |keys|) → one
    sort-into-array assembly. NULL keys are dropped (SQL semantics:
    NULL never matches a join).

    Sizing note: the dense layout costs ``n_bits/64`` words in the
    single assembled row and in the broadcast REGARDLESS of how many
    keys were inserted — size ``n_bits`` to the key count (~10 bits/key
    at 1% fpp), don't default a 1 GB filter (2^27 words) in front of a
    tiny dim key set where the old sparse map would have stayed small.
    """
    n_words = (n_bits + _WORD_BITS - 1) // _WORD_BITS
    pos = F.array(*_positions(F.col(key), n_bits, n_hashes))
    zero_words = (
        keys.sparkSession.range(n_words)
        .select(
            F.col("id").cast("long").alias("__word"),
            F.lit(0).cast("long").alias("__bit"),
        )
    )
    words = (
        keys.where(F.col(key).isNotNull())
        .select(F.explode(pos).alias("__pos"))
        .select(
            (F.col("__pos") / _WORD_BITS).cast("long").alias("__word"),
            _shifted_bit(F.col("__pos")).alias("__bit"),
        )
        .unionByName(zero_words)
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
    )
    return words.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(__word, __bits))),"
            " e -> e.__bits)"
        ).alias("bloom")
    )


def _might_contain(bloom: Column, key: Column, n_bits: int, n_hashes: int) -> Column:
    """Membership probe: every one of the k bits must be set. ``bloom``
    is the dense word array from :func:`build_bloom` (1-based
    ``element_at``, O(1) per lookup)."""
    checks = []
    for p in _positions(key, n_bits, n_hashes):
        word = (p / _WORD_BITS).cast("int") + F.lit(1)
        bit = _shifted_bit(p)
        checks.append(
            F.coalesce(F.element_at(bloom, word), F.lit(0).cast("long"))
            .bitwiseAND(bit)
            != F.lit(0)
        )
    return functools.reduce(lambda a, b: a & b, checks)


def bloom_prune_semi_join(
    fact: DataFrame,
    dim_keys: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_bits: int = 1 << 20,
    n_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Value-exact LEFT SEMI join of ``fact`` against ``dim_keys`` with a
    Bloom pre-filter: identical rows to ``fact.join(dim, key, "leftsemi")``
    for any filter geometry (the final exact semi-join removes Bloom false
    positives; Bloom filters have no false negatives).

    The pre-filter runs where the fact already lives — a broadcast
    nested-loop join against the ONE-row packed filter adds the map
    column to every partition without moving fact data — so the exact
    semi-join afterwards shuffles only surviving rows. Size ``n_bits``
    at ~16 bits per expected dim key.
    """
    if dim_key is None:
        dim_key = fact_key
    bloom_row = build_bloom(dim_keys, dim_key, n_bits, n_hashes)
    probed = fact.join(F.broadcast(bloom_row), how="cross")
    survivors = probed.where(
        _might_contain(F.col("bloom"), F.col(fact_key), n_bits, n_hashes)
    ).drop("bloom")
    right = dim_keys.select(F.col(dim_key).alias(fact_key)).where(
        F.col(fact_key).isNotNull()
    )
    return survivors.join(right, on=fact_key, how="leftsemi")
