"""Relational Bloom filter: cross-batch membership at corpus scale.

The "have we seen this URL/doc-id before" primitive of incremental
corpus ingestion.  The filter is not a driver-side object but a sparse
RELATION of (word_idx, word_bits) rows — the set bits of an m-bit
bitmap packed into 64-bit words:

- **build**: each key sets k = ``k_hashes`` bits at positions
  ``xxhash64(key, seed_i) mod m``; per-word ``bit_or`` aggregation
  (map-side combined) reduces the corpus to ≤ m/64 rows.  No driver
  state, no UDF — the whole build is explode + hash-aggregate.
- **probe**: a new batch computes its k positions, left-joins the word
  relation (broadcast when small — it usually is), and a key is
  *possibly seen* iff all k bits are set.  Keys with ANY missing bit
  are DEFINITELY new — the Bloom guarantee: zero false negatives,
  false-positive rate ≈ (1 - e^(-k·n/m))^k.

Sizing: m_bits ≈ 10 × |seen keys| with k=7 gives ~1% false positives;
the word relation is m/64 longs ≈ 2 bytes per seen key — a 10^9-key
history fits in a ~2 GB relation, still joinable (shuffle join on
word_idx) when past broadcast range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(k_hashes)
    ]


def build_bloom(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k_hashes: int = 7,
) -> DataFrame:
    """Aggregate ``df[key_col]`` into the sparse word relation
    (word_idx long, word_bits long)."""
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, k_hashes))).alias("_p")
    words = (
        df.select(pos)
        .select(
            (F.col("_p") / 64).cast("long").alias("word_idx"),
            # shiftleft's bit count must be a literal in the Python API;
            # the SQL form accepts a column
            F.expr("shiftleft(1L, CAST(pmod(_p, 64) AS INT))").alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word_bits"))
    )
    return words


def probe_bloom(
    df: DataFrame,
    bloom_words: DataFrame,
    key_col: str,
    m_bits: int,
    k_hashes: int = 7,
    out_col: str = "possibly_seen",
) -> DataFrame:
    """Mark each row: ``out_col`` = True iff ALL k bloom bits for its
    key are set (possibly seen before); False ⇒ definitely new.

    Plan shape: the probe explodes to k rows per key, joins the word
    relation on word_idx, and re-aggregates per key counting satisfied
    probes — two narrow hash joins/aggs, no driver state.  Rows carry
    only (key, position), never payload, until the final semi-join back
    onto the input.

    NULL keys: the final join back onto the input is NULL-SAFE — a
    plain equi-join would leave ``out_col`` NULL for NULL-key rows,
    breaking the True/False dichotomy (and contradicting the build
    side, which does hash NULL keys into the bitmap: ``xxhash64``
    treats NULL as a defined value).

    ``bloom_words`` is bit_or-folded per word BEFORE probing: a raw
    UNION of two build_bloom outputs (handed over without
    merge_bloom_words) carries duplicate word_idx rows, and the probe
    join's fan-out would then let ``sum(_hit)`` overshoot k_hashes —
    a FALSE NEGATIVE on a genuinely inserted key, the one verdict a
    Bloom filter must never emit.  The fold IS the correct Bloom union
    (bitmaps OR), costs one ≤ m/64-row aggregate, and is a no-op on an
    already-merged relation."""
    bloom_words = bloom_words.groupBy("word_idx").agg(
        F.bit_or("word_bits").alias("word_bits")
    )
    key = F.col(key_col)
    probes = df.select(key.alias("_k")).distinct().select(
        "_k",
        F.explode(F.array(*_positions(F.col("_k"), m_bits, k_hashes))).alias(
            "_p"
        ),
    ).select(
        "_k",
        (F.col("_p") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, CAST(pmod(_p, 64) AS INT))").alias("_mask"),
    )
    hit = (
        probes.join(bloom_words, "word_idx", "left")
        .select(
            "_k",
            (
                F.col("word_bits").isNotNull()
                & (F.col("word_bits").bitwiseAND(F.col("_mask")) == F.col("_mask"))
            ).cast("int").alias("_hit"),
        )
        .groupBy("_k")
        .agg((F.sum("_hit") == F.lit(k_hashes)).alias(out_col))
    )
    return df.join(
        hit, F.col(key_col).eqNullSafe(F.col("_k")), "left"
    ).drop("_k")


def merge_bloom_words(existing: DataFrame, new_words: DataFrame) -> DataFrame:
    """Merge two word relations: union + per-word ``bit_or``.  Bloom
    bitmaps are mergeable state (like HLL registers), so incremental
    maintenance needs no rebuild — a foreachBatch can fold each batch's
    words into the serving relation with one bounded aggregation."""
    return (
        existing.unionByName(new_words)
        .groupBy("word_idx")
        .agg(F.bit_or("word_bits").alias("word_bits"))
    )
