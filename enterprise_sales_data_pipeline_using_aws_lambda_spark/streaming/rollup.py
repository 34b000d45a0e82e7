"""Incremental materialized-rollup maintenance: a streaming aggregate
serving table kept current per micro-batch, touching only the partitions
a batch affects.

The pattern a 100 TB pipeline needs for "keep the daily dashboard table
fresh": per batch, aggregate JUST the new rows to batch-partials, read
back ONLY the affected day partitions of the serving table, re-combine,
and dynamically overwrite those partitions.  Work per batch is
O(batch + affected partitions) — never a rescan of raw history, never a
rewrite of the whole serving table (the two failure modes the reference's
overwrite-everything summary has, ``lambda.py:184-190``).

Counts and sums are associative, so partial + existing re-aggregation is
exact; the same shape extends to any algebraic aggregate (avg via
sum/count pairs, variance via moment triples, distinct via HLL sketch
columns — see ``plans.queries.hll_sketch_rollup``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from ..operators.materialize import materialize


ROLLUP_TABLE = "events_daily_rollup"


def _batch_partials(batch_df: DataFrame) -> DataFrame:
    return batch_df.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def merge_rollup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    serving_dir: str,
    batch_id: int | None = None,
) -> None:
    """One incremental maintenance step (callable from ``foreachBatch``
    or a batch backfill loop): combine this batch's partials with the
    existing aggregates of the AFFECTED days only, then dynamically
    overwrite just those day partitions.

    The affected-day set is bounded by the batch's event-time span (a
    handful of partitions under any sane ingest), so the read-back is
    partition-pruned and the broadcast join trivially small.

    Replay safety (``batch_id``): foreachBatch is at-least-once — a
    batch can re-run after its partition write committed but before the
    streaming checkpoint recorded it.  Each partition therefore carries
    ``last_batch_id``, written ATOMICALLY with the data it describes:
    on replay, a day whose marker already reached ``batch_id`` is
    skipped entirely (neither re-merged nor rewritten), so re-running a
    batch cannot double-count.  A separate commit log could not give
    this guarantee — no write order makes log+data atomic, but marker
    and data living in the same files makes each PARTITION exactly-once.
    A mid-write crash of the (non-atomic) multi-partition dynamic
    overwrite leaves some days updated and some not; the per-day marker
    makes the replay finish exactly the unfinished days.  One window
    the marker CANNOT cover (named so the guarantee reads honestly):
    the dynamic overwrite's job commit deletes each matched day
    directory and then moves the staged one in — a crash BETWEEN the
    delete and the move leaves that day empty, and the replay, finding
    no prior rows or marker for it, re-merges batch-only partials:
    the day's PRIOR totals are lost.  That delete-to-move gap is
    inherent to non-transactional parquet (the same caveat as
    ``compact_lake_partition``'s two-rename swap); a table format with
    a transaction log (Delta/Iceberg) removes it.

    ``batch_id=None`` (a backfill merge outside any checkpoint) does
    NOT reset the affected days' replay markers: each day keeps the
    max ``last_batch_id`` it already carried, so a backfill run
    between a stream's write and its checkpoint commit cannot disarm
    the replay guard (stamping -1 would make the replayed batch
    re-merge and double-count).

    Marker scope: the guard assumes batch ids from ONE stable
    checkpoint (Spark's epoch ids are monotone within it).  Pointing a
    FRESH checkpoint at an existing serving table restarts ids at 0
    below the stored markers — replayed history would re-merge and new
    low-id batches would be skipped as "replays".  When resetting a
    checkpoint, reset the serving table (or back it up and rebuild);
    the ids are not comparable across checkpoints by construction.

    All day-keyed joins below are NULL-SAFE: events with a null
    timestamp aggregate under day=NULL (hive default partition), and a
    plain inner join would drop the existing null-day row — the
    dynamic overwrite would then replace that partition with
    batch-only partials, silently erasing prior totals."""
    # One evaluation of the batch aggregation: the partials feed THREE
    # plan branches below (the affected-day probe, the replay
    # anti-join, the union) and an unmaterialized subtree would
    # re-scan the micro-batch's files per branch.  The frame is
    # |days × types| — pinning it is one tiny job.
    inc = materialize(_batch_partials(batch_df))
    bid = -1 if batch_id is None else int(batch_id)
    path = os.path.join(serving_dir, ROLLUP_TABLE)
    try:
        existing = spark.read.parquet(path)
        has_existing = True
    except AnalysisException as e:
        # ONLY the genuinely-first-batch cases may fall through to the
        # no-merge path: missing table (PATH_NOT_FOUND) or an empty
        # directory (UNABLE_TO_INFER_SCHEMA).  Anything else — corrupt
        # footers, conflicting structures, a table mid-rename — must
        # propagate: treating it as "first batch" would dynamically
        # overwrite the affected day partitions with batch-only
        # partials, silently erasing prior totals (the same
        # narrow-or-lose-data contract as partitioned_upsert and
        # reprocess_quarantine).  One shared, error-class-based
        # narrowing (errors.is_missing_or_empty_table) — Spark 3.5/4.0
        # portable, never a message-substring match.
        from ..errors import is_missing_or_empty_table

        if not is_missing_or_empty_table(e):
            raise
        has_existing = False
    if has_existing:
        if "last_batch_id" not in existing.columns:
            existing = existing.withColumn("last_batch_id", F.lit(-1))
        affected = inc.select(F.col("day").alias("_aday")).distinct()
        relevant = existing.join(
            F.broadcast(affected),
            existing["day"].eqNullSafe(F.col("_aday")),
        ).drop("_aday")
        if batch_id is not None:
            done = (
                relevant.groupBy("day")
                .agg(F.max("last_batch_id").alias("_b"))
                .filter(F.col("_b") >= bid)
                .select(F.col("day").alias("_dday"))
            )
            inc = inc.join(
                F.broadcast(done),
                inc["day"].eqNullSafe(F.col("_dday")),
                "left_anti",
            )
            relevant = relevant.join(
                F.broadcast(done),
                relevant["day"].eqNullSafe(F.col("_dday")),
                "left_anti",
            )
        merged = (
            relevant.select("day", "event_type", "n_events", "total_value")
            .unionByName(inc)
            .groupBy("day", "event_type")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("total_value").alias("total_value"),
            )
        )
        if batch_id is None:
            # backfill: each affected day KEEPS its stored replay
            # marker (docstring — stamping -1 would disarm the
            # stream's at-least-once guard for an in-flight batch)
            keep = relevant.groupBy("day").agg(
                F.max("last_batch_id").alias("_keep")
            ).select(F.col("day").alias("_kday"), "_keep")
            inc = (
                merged.join(
                    F.broadcast(keep),
                    merged["day"].eqNullSafe(F.col("_kday")),
                    "left",
                )
                .withColumn(
                    "last_batch_id", F.coalesce(F.col("_keep"), F.lit(-1))
                )
                .drop("_kday", "_keep")
            )
        else:
            inc = merged.withColumn("last_batch_id", F.lit(bid))
    else:
        inc = inc.withColumn("last_batch_id", F.lit(bid))
    writer = inc.withColumn("day", F.col("day").cast("string"))
    # Materialize before writing: the merge plan READS the same files
    # the dynamic overwrite replaces.  Relying on the writer staging the
    # whole output before commit is version-sensitive; cutting the
    # lineage makes the read-before-truncate explicit and cheap (the
    # frame is |affected days × types| partials).
    writer = materialize(writer)
    (
        writer.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )


def stream_events_rollup(
    spark: SparkSession,
    events_dir: str,
    serving_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    glob_filter: str | None = None,
    schema=None,
):
    """Maintain the daily (day, event_type) rollup of an events stream.

    File-source ingest → ``foreachBatch(merge_rollup_batch)`` under a
    checkpoint: the checkpoint skips batches whose completion it
    recorded, and the per-partition ``last_batch_id`` marker (see
    merge_rollup_batch) makes the at-least-once replay window — a batch
    re-running after its write committed but before the checkpoint did —
    a per-partition no-op instead of a double-merge.

    Pass ``schema`` to start the stream BEFORE any events have landed
    (the watch-an-empty-directory pattern the sibling stream builders
    support); without it the schema is inferred from a batch read of
    ``events_dir``, which requires at least one committed file."""
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 4
    )
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    stream = reader.parquet(events_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        merge_rollup_batch(spark, batch_df, serving_dir, batch_id=batch_id)

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
