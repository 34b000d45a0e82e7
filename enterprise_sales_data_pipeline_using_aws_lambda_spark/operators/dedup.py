"""Deduplication operators.

The reference's only dedup is keyed keep-last over a concatenation
(``drop_duplicates(subset=['uuid'], keep='last')``, reference
``lambda.py:179-180``) where the *winner is positional* — last occurrence
in concat order.  Positional order does not exist under parallelism, so
:func:`dedup_keep_last` demands an explicit ordering (SURVEY §7.5.1).

Exact content dedup (hash group-by) is here too; fuzzy dedup (MinHash-LSH,
SimHash, n-gram Jaccard) lives in ``text_dedup.py`` since it composes the
shingling machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_last(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by`` DESC-style
    ordering supplied by the caller (pass e.g. ``[F.col('ts').desc(),
    F.col('id').desc()]`` for deterministic keep-latest).

    Spark mapping of reference A2 (``lambda.py:180``): a hash-partition on
    the keys + per-partition sort — one shuffle, no global sort.  With AQE
    the shuffle is skew-split automatically; for repeated use against the
    same key set, bucket the table on the key to eliminate the shuffle.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_exact(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """Exact-content dedup: one surviving row per distinct content.

    Content identity is an md5 over the canonical concatenation of
    ``content_cols`` (hash group-by — map-side partial aggregation means
    the shuffle carries one row per distinct hash per partition, not the
    full table).  The survivor is the min (or max) ``id_col`` — a
    deterministic choice, unlike ``dropDuplicates`` which keeps an
    arbitrary row.  Returns the surviving rows with original columns.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    fingerprint = F.md5(F.concat_ws("", *content_cols))
    survivors = (
        df.withColumn("_fp", fingerprint)
        .groupBy("_fp")
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    # Semi join back to recover full rows; broadcast when small.
    return df.join(survivors, on=id_col, how="left_semi")


def duplicate_groups(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Report exact-duplicate clusters: ``fingerprint, dup_count, keep_id``
    for every content value, ordered-insensitive.  The oracle-facing view
    of :func:`dedup_exact`."""
    fingerprint = F.md5(F.concat_ws("", *content_cols))
    return (
        df.withColumn("_fp", fingerprint)
        .groupBy(F.col("_fp").alias("fingerprint"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
    )
