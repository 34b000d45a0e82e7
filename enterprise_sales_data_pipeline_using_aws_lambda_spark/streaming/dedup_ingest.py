"""Streaming near-dup-deduped document ingest — the production loop of
the LLM-curation stack: a file source watching an arrival directory,
each micro-batch deduplicated against the persisted LSH signature store
(and itself) before its survivors join the corpus.

This is the reference's event-driven model (one object-created event →
one processing run, reference ``lambda.py:207-209``) applied to corpus
curation instead of sales rows, and it composes three already-proven
pieces per micro-batch:

1. :func:`~..operators.text_dedup.ingest_dedup_batch` — store-backed
   incremental MinHash/LSH dedup with the id-level exactly-once
   pre-filter (batch-linear work; the corpus is never re-shingled).
2. :func:`~..sources.writers.append_log_idempotent` — the admitted docs
   land in a batch-id-keyed lake partition (staging + atomic rename;
   replays skip committed partitions).
3. :func:`~..operators.text_dedup.append_batch_signatures` — the
   admitted docs' signatures fold into the store, anti-joined against
   ids already present.

Exactly-once: ``foreachBatch`` is AT-LEAST-ONCE (a micro-batch can
re-run after its writes land but before the checkpoint commits), and
each of the three steps above is individually convergent under re-drive
— the batch-mode proof is
``tests/test_text_ops.py::test_ingest_dedup_batch_daily_loop_convergence``
— so a replayed micro-batch admits nothing twice at either sink.  The
streaming face adds only the checkpointed source (which files belong to
which batch id) on top of the batch contract.

The signature store must exist before the stream starts (bootstrap with
``write_lsh_signature_store`` — an EMPTY docs frame is a valid seed and
pins the sketch parameters); the lake may start absent.

Checkpoint, lake, and store are a unit: batch ids are checkpoint-scoped,
so discarding the checkpoint while keeping the lake makes fresh ids
collide with committed ``ingest_batch=`` partitions from the old era.
The batch processor detects that divergence by content (a true replay's
partition already holds every admitted id) and fails loudly instead of
silently marking docs ingested without landing them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text_dedup import (
    append_batch_signatures,
    compact_lsh_signature_store,
    ingest_dedup_batch,
)
from ..sources.writers import append_log_idempotent


def _lake_docs(
    spark: SparkSession, lake_dir: str, schema: str, text_col: str,
    id_col: str,
) -> DataFrame:
    """The accumulated corpus TEXT (verify-stage input) — empty with
    the right schema before the first admitted batch, so a fresh
    deployment needs no lake bootstrap.  UNABLE_TO_INFER_SCHEMA covers
    a lake holding only footerless partition debris (same narrowed
    except set as ``pipeline.reprocess_quarantine``)."""
    from pyspark.errors import AnalysisException

    from ..errors import is_missing_or_empty_table

    try:
        return spark.read.parquet(lake_dir).select(id_col, text_col)
    except AnalysisException as e:
        if is_missing_or_empty_table(e):
            return spark.createDataFrame([], schema)
        raise


def guarded_idempotent_append(
    spark: SparkSession, clean: DataFrame, lake_dir: str, batch_id: int,
    id_col: str, sort_files: int | None = None,
) -> None:
    """The docs-first half of a convergent streaming ingest step: write
    the admitted rows to their batch-id-keyed lake partition, skipping
    empty batches (a footerless partition per batch would pollute
    reads), and distinguish a true replay from checkpoint/lake
    divergence by CONTENT when the partition already exists.

    Batch ids are checkpoint-scoped: a caller who discarded the
    checkpoint while keeping the lake gets fresh ids that collide with
    committed partitions from the old era, and a bare skip would then
    silently swallow NEW rows while their dedup-state append still
    landed — rows marked ingested that are in no corpus.  On a true
    replay (crash between the doc write and the state append) the
    partition holds EXACTLY this batch's admitted ids — the partition
    was written FROM ``clean`` under this id — so the check is
    two-directional: ids the partition LACKS mean new rows would be
    swallowed, and EXTRA ids mean an old-era partition that happens to
    cover the batch (a one-directional subset test would skip the doc
    write while the state append still landed — the very failure the
    guard exists to stop).  An unreadable/footerless partition (never
    produced by the atomic-rename append — foreign debris) raises the
    same guided error instead of a raw schema exception.

    ``sort_files`` (int) gives the partition an id-clustered layout —
    ``append_log_idempotent(sort_col=id_col)`` — so the dedup verify
    stage's pushed id filter prunes row groups instead of scanning the
    lake's text column; None keeps the batch's own layout."""
    from pyspark.errors import AnalysisException

    from ..errors import is_missing_or_empty_table

    if clean.isEmpty():
        return
    if append_log_idempotent(
        spark, clean, lake_dir, str(batch_id),
        sort_col=id_col if sort_files else None,
        sort_files=sort_files,
    ):
        return
    diverged = None
    try:
        committed = spark.read.parquet(
            f"{lake_dir}/ingest_batch={batch_id}"
        ).select(id_col)
        ids = clean.select(id_col)
        if not ids.join(committed, id_col, "left_anti").isEmpty():
            diverged = "lacks ids this micro-batch admits"
        elif not committed.join(ids, id_col, "left_anti").isEmpty():
            diverged = (
                "holds ids this micro-batch never admitted (an "
                "old-era partition that happens to cover the batch)"
            )
    except AnalysisException as e:
        if not is_missing_or_empty_table(e):
            raise
        diverged = "exists but holds no readable parquet (debris)"
    if diverged is not None:
        raise RuntimeError(
            f"lake partition ingest_batch={batch_id} {diverged}: "
            f"batch ids are checkpoint-scoped, so this stream's "
            f"checkpoint does not match the lake at {lake_dir} "
            f"(checkpoint discarded while the lake was kept?).  "
            f"Refusing to mark these rows ingested without landing "
            f"them.  Recover by restoring the original checkpoint, or "
            f"by pointing the stream at fresh lake+state+checkpoint "
            f"and reprocessing from scratch."
        )


def stream_docs_dedup_ingest(
    spark: SparkSession,
    raw_dir: str,
    lake_dir: str,
    store_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
    fmt: str = "parquet",
    compact_store_every: int | None = None,
    compact_store_target: int = 8,
    lease_stale_after_s: float | None = None,
):
    """Start the deduplicating document ingest of ``raw_dir``.

    Returns the started ``StreamingQuery``; with ``available_now`` the
    caller should ``awaitTermination()`` — the query drains pending
    files then stops, and a later restart with the same
    ``checkpoint_dir`` resumes with only files that arrived since
    (their near-dups against everything ADMITTED so far are dropped:
    the store, not the stream, carries that state).

    ``compact_store_every`` (int) makes the loop self-maintaining:
    when the store's signatures table has accumulated that many data
    files (one set lands per admitted batch), it is compacted down to
    ``compact_store_target`` files before the batch is processed.
    The stream is the store's single writer, so running maintenance
    inside its own loop honors the single-writer contract; running it
    FIRST in the batch is the recovery-safe order — a crash inside a
    previous compaction's swap leaves the store mid-rename, and the
    compactor's debris recovery must run before anything reads it.

    ``lease_stale_after_s`` threads into the writer leases the loop
    takes (compaction and the per-batch append).  The lease heartbeats
    while held, so the knob sizes crash-RECOVERY latency — how long a
    hard-killed loop's lease blocks its own checkpoint-replayed batch
    — not the window a live batch must fit inside."""
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(raw_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if compact_store_every:
            compact_lsh_signature_store(
                spark, store_path,
                target_files=compact_store_target,
                min_files=compact_store_every,
                lease_stale_after_s=lease_stale_after_s,
            )
        clean, _pairs = ingest_dedup_batch(
            _lake_docs(spark, lake_dir, schema, text_col, id_col),
            batch_df.select(id_col, text_col),
            store_path,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
        )
        # docs first, store state last — the re-drive-convergent order
        # (see ingest_dedup_batch's docstring); the guarded append
        # skips empty batches and fails loudly on checkpoint/lake
        # divergence instead of silently swallowing new docs.
        # sort_files=4: each batch partition lands id-clustered so the
        # verify stage's pushed id filter prunes row groups (four
        # sorted files per micro-batch — fewer files than the batch's
        # own partitioning AND a layout scans can skip)
        guarded_idempotent_append(
            spark, clean, lake_dir, batch_id, id_col, sort_files=4
        )
        # per-batch lease token (round-10 ADVICE): micro-batches of
        # ONE query serialize, but a batch ingest racing this stream
        # on the same store — or a second query — must never share
        # the token, or each presumed-stale break would hit the
        # OTHER's live lease.  A checkpoint replay of this batch
        # reuses its batch_id, so the crashed attempt's stale lease
        # still self-breaks (after the age window).
        append_batch_signatures(
            clean, store_path, text_col=text_col, id_col=id_col,
            lease_token=f"append:{batch_id}",
            lease_stale_after_s=lease_stale_after_s,
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
