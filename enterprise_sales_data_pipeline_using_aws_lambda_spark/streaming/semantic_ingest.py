"""Streaming semantically-deduplicated embedding ingest — the vector
face of the deduplicating corpus loop (``dedup_ingest`` is the text
face): a file source watching an arrival directory, each micro-batch
semantically deduplicated against the persisted IVF index before its
survivors join the lake and the index.

Per micro-batch, three individually-convergent steps (same shape as the
text loop — the reference's one-event-one-run model,
``lambda.py:207-209``, applied to embeddings):

1. :func:`~..operators.similarity.ingest_semantic_batch` — SemDeDup
   in-cluster dedup against only the index lists the batch touches,
   with the id-level exactly-once pre-filter.
2. :func:`~..streaming.dedup_ingest.guarded_idempotent_append` — the
   admitted vectors land in a batch-id-keyed lake partition; a replay
   skips, checkpoint/lake divergence raises by content.
3. :func:`~..operators.similarity.append_to_ivf_index` — survivors fold
   into the index idempotently with the index's own codebook.

``foreachBatch`` is at-least-once; each step converges under re-drive,
so a replayed micro-batch admits nothing twice at either sink.  The
index must exist before the stream starts (``write_ivf_index`` — train
the codebook on a representative corpus or sample; the codebook stays
fixed across appends, healed by ``retrain_if_drifted`` — in-loop via
``retrain_on_skew=`` or offline).  The lake may start absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import (
    _recover_retrain_swap,
    append_to_ivf_index,
    compact_ivf_index,
    ingest_semantic_batch,
    ivf_occupancy_skew,
    retrain_ivf_index,
)
from .dedup_ingest import guarded_idempotent_append


def stream_vectors_semantic_ingest(
    spark: SparkSession,
    raw_dir: str,
    lake_dir: str,
    index_path: str,
    checkpoint_dir: str,
    schema: str = "vec_id long, embedding array<float>",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_files_per_trigger: int = 16,
    available_now: bool = True,
    fmt: str = "parquet",
    compact_index_every: int | None = None,
    compact_index_target: int = 1,
    retrain_on_skew: float | None = None,
    lease_stale_after_s: float | None = None,
):
    """Start the semantically-deduplicating vector ingest of
    ``raw_dir``.  Returns the started ``StreamingQuery``; with
    ``available_now`` the caller should ``awaitTermination()`` — a
    later restart with the same ``checkpoint_dir`` resumes with only
    files that arrived since (near-dups of everything ADMITTED so far
    drop: the index, not the stream, carries that state).

    ``compact_index_every`` (int) makes the loop self-maintaining —
    the vector face of ``stream_docs_dedup_ingest``'s
    ``compact_store_every``: assignment partitions that accumulated
    that many data files (each appended batch lands one file per
    touched list) are compacted to ``compact_index_target`` files
    before the batch is processed.  Recovery-first ordering: a crash
    inside a previous compaction's swap leaves ``list_id=N__old``
    debris that breaks partition discovery, and ``compact_ivf_index``
    always revisits crashed partitions before the trigger applies.

    ``retrain_on_skew`` (float) owns the OTHER staleness axis —
    codebook drift: before each batch, the ≤ n_lists-row occupancy
    probe runs, and when max-list skew passes the threshold the
    codebook is retrained and every vector re-assigned
    (``retrain_ivf_index`` — staged rebuild + atomic swap, meta
    version bumped; the crashed-swap recovery runs first, so a stream
    killed mid-swap self-heals on restart instead of failing every
    replay).  This loop is the index's single writer, so retraining
    inside it is exactly the maintenance window the swap requires.
    Cost when healthy: one small aggregate job per micro-batch; leave
    None to keep retraining a scheduled offline concern.  A
    corpus-growth cooldown rate-limits the heal: after an in-loop
    retrain, the trigger stays quiet until the index has grown ≥10%
    past the retrained size — drift accrues with appends, so
    re-training before meaningful growth cannot improve the codebook,
    and a degenerate corpus (90% of vectors identical) would otherwise
    re-trip the skew trigger and pay a full corpus retrain on EVERY
    micro-batch.

    ``lease_stale_after_s`` threads into every writer lease the loop
    takes (the in-loop recover+probe+retrain block, compaction, and
    the per-batch append) — round-11 ADVICE: the block used to
    hard-code the 60 s default while a 1.1 M-vector retrain already
    measures 31.6–59.2 s.  The lease now HEARTBEATS while held, so a
    live retrain of any length is safe at the default; the knob sizes
    crash-RECOVERY latency (how long a hard-killed loop's lease blocks
    its own restart) and the claim-age fallback on filesystems
    without ``setTimes``."""
    stream = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(raw_dir)
    )

    # in-loop retrain cooldown (closure state, perf-only: lost on
    # restart, re-learned from the first post-restart retrain)
    _last_retrain_nv: dict = {"nv": None}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if retrain_on_skew is not None:
            # FIRST (before compaction's own meta read, and before the
            # batch assigns): roll back any crashed retrain swap —
            # without this, a stream killed mid-swap fails every
            # replay on the probe's meta read — then probe, then heal
            # unless cooled down (the index must grow ≥10% past the
            # last in-loop retrain before another can help).  The
            # whole recover+probe+retrain block holds the writer
            # lease (round-10 ADVICE): the recovery MUTATES (deletes
            # staging, restores backups), and a bare in-loop recovery
            # racing a live offline retrain would delete the
            # retrain's active staging directory — the same
            # must-not-race rationale retrain_if_drifted documents.
            from ..sources.writers import writer_lease

            with writer_lease(
                spark, index_path, "retrain",
                stale_after_s=lease_stale_after_s,
            ):
                _recover_retrain_swap(spark, index_path)
                probe = ivf_occupancy_skew(spark, index_path)
                cooled = (
                    _last_retrain_nv["nv"] is not None
                    and probe["n_vectors"]
                    < 1.1 * _last_retrain_nv["nv"]
                )
                if not cooled and probe["skew"] > retrain_on_skew:
                    out = retrain_ivf_index(
                        spark, index_path, _lease=False
                    )
                    _last_retrain_nv["nv"] = out["n_vectors"]
        if compact_index_every:
            compact_ivf_index(
                spark, index_path,
                target_files=compact_index_target,
                min_files=compact_index_every,
                lease_stale_after_s=lease_stale_after_s,
            )
        clean, _dropped = ingest_semantic_batch(
            batch_df.select(id_col, vec_col),
            index_path,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
        )
        # vectors first, index state last — the re-drive-convergent
        # order; the guarded append skips empty batches and fails
        # loudly on checkpoint/lake divergence
        guarded_idempotent_append(spark, clean, lake_dir, batch_id, id_col)
        # per-batch lease token (round-10 ADVICE): see dedup_ingest —
        # distinct batches must never share a token; a checkpoint
        # replay reuses its batch_id, so crash self-heal is kept.
        append_to_ivf_index(
            clean, index_path, id_col=id_col, vec_col=vec_col,
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
