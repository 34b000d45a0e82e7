"""Bucketed tables: pre-shuffled storage for co-located joins.

The reference re-reads and rewrites its whole upsert target per batch
(``lambda.py:176-181``) — at 100 TB the equivalent design decision is to
pay the shuffle ONCE at write time.  A table bucketed on its join/merge
key stores rows hash-partitioned into a fixed number of bucket files;
any subsequent equi-join or aggregation on that key reads the buckets
back co-located and Catalyst elides the exchange entirely.  For a fact
table joined or MERGEd on the same key every batch, this converts every
downstream job's largest shuffle into a one-time write cost.

Notes:
- Bucketed tables must live in the session catalog (``saveAsTable``) —
  plain ``.parquet(path)`` writes cannot carry bucket metadata.
- Both sides of a join must be bucketed into the SAME number of buckets
  (or a multiple, with ``spark.sql.bucketing.coalesceBucketsInJoin``)
  on the SAME key for the exchange to be elided.
- ``sortBy`` on the bucket key additionally removes the sort before a
  sort-merge join: the join degenerates to a linear zip of pre-sorted
  bucket files.
- Pick bucket counts so one bucket ≈ 100–500 MB at target scale: for a
  10 TB fact table, ~40k buckets, not 32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on
    ``bucket_cols`` as a catalog table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (bucket metadata rides along, so
    joins/aggs on the bucket key skip their exchange)."""
    return spark.table(table)
