"""Streaming ingest — the reference's event-driven model, Spark-native.

The reference's "streaming" is one S3 ``ObjectCreated`` event per file
under ``raw/`` triggering one Lambda invocation (reference
``lambda.py:207-209``, ``README.md:79-89``).  Spark equivalent: a file
source watching ``raw/`` + ``foreachBatch`` running the same
validate → lake → upsert → summary dataflow per micro-batch — fixing
the reference's at-least-once double-append risk (SURVEY §2.8).

Sink-level replay safety: foreachBatch is AT-LEAST-ONCE (a batch can
re-run after its writes land but before the checkpoint commits), so
checkpointing alone does not make appends exactly-once.  Every append
sink here is therefore batch-id-keyed through
``writers.append_log_idempotent`` (staging + atomic rename into an
``ingest_batch=<epoch>`` partition; replays skip committed partitions),
and the keyed-overwrite sinks (``sales_tgt`` upsert, summary) are
idempotent by construction.  The JDBC path keeps plain appends —
cross-system atomicity needs transactional staging tables out of scope
here — and is documented at-least-once.

Divergence (documented, SURVEY §7.5.4): a micro-batch may contain many
files; the reference silently drops all but the first event record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import format_date
from ..operators.materialize import materialize
from ..operators.agg import sales_summary
from ..operators.dedup import dedup_keep_last
from ..operators.upsert import upsert_keep_last
from ..operators.validate import (
    row_rules_sales,
    validate_rows,
)
from ..pipeline import PipelineConfig
from ..schema import SALES_DATE_COLUMNS, SALES_DATE_FORMAT, SALES_KEY_COLUMN
from ..sources.writers import (
    append_log_idempotent,
    read_serving_table,
    write_serving_table,
)


def stream_sales_ingest(
    spark: SparkSession,
    raw_dir: str,
    cfg: PipelineConfig,
    checkpoint_dir: str,
    available_now: bool = True,
    fmt: str = "csv",
):
    """Start the streaming ingest of ``raw_dir``.

    Row-level mode: invalid rows go to the quarantine path with
    ``_error_reason`` while valid rows proceed — finer-grained than the
    reference's whole-file quarantine, which ``pipeline.run_batch``
    preserves for batch parity.

    Returns the started ``StreamingQuery``; with ``available_now`` the
    caller should ``awaitTermination()`` — the query drains all pending
    files then stops (the batch-replay-safe analog of the reference's
    one-event-one-run loop)."""
    from ..schema import sales_ingest_schema

    reader = (
        spark.readStream.format(fmt)
        .schema(sales_ingest_schema())
        .option("maxFilesPerTrigger", 16)
    )
    if fmt == "csv":
        reader = reader.option("header", True)
    # _source_mtime rides along for the intra-batch keep-last: "the
    # later file's row wins" must mean ARRIVAL order (the reference's
    # sequential one-event-one-run loop), and the file's modification
    # time is the arrival record — path strings only sort that way
    # when feed filenames happen to be time-ordered (ADVICE r7).
    stream = (
        reader.load(raw_dir)
        .withColumn("_source_file", F.input_file_name())
        .withColumn(
            "_source_mtime", F.col("_metadata.file_modification_time")
        )
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # One scan of the micro-batch's files feeds five sinks: persist
        # the batch so validation + casts are not recomputed per action
        # (the same rework rollup.py's materialize avoids).
        batch_df.persist()
        try:
            valid, quarantined = validate_rows(
                batch_df, row_rules_sales()
            )
            # batch-id-keyed idempotent appends (module docstring):
            # replays of a committed micro-batch skip the sink entirely.
            # Clean batches skip the quarantine write altogether — an
            # empty partition per batch would pollute the store with
            # footerless directories.
            # _ingest_batch matches the batch face's quarantine schema
            # so reprocess_quarantine's batch-id filter and meta-column
            # strip work on rows from either face; both faces land rows
            # under the same ingest_batch= directory layout, so one
            # quarantine dir serves batch, streaming, and re-drives.
            if not quarantined.isEmpty():
                append_log_idempotent(
                    spark,
                    quarantined.drop("_source_mtime").withColumn(
                        "_ingest_batch", F.lit(str(batch_id))
                    ),
                    cfg.quarantine_dir,
                    str(batch_id),
                )

            casted = valid
            for c in SALES_DATE_COLUMNS:
                casted = casted.withColumn(
                    c, F.to_date(F.col(c).cast("string"), SALES_DATE_FORMAT)
                )
            append_log_idempotent(
                spark, casted.drop("_source_file", "_source_mtime"),
                cfg.lake_dir, str(batch_id),
            )

            serving = casted
            if cfg.dates_as_strings:
                for c in SALES_DATE_COLUMNS:
                    serving = serving.withColumn(c, format_date(c))
            if cfg.jdbc_url:
                # JDBC append: at-least-once (module docstring)
                write_serving_table(
                    serving.drop("_source_file", "_source_mtime"),
                    cfg.warehouse_dir,
                    "sales", "append", cfg.jdbc_url, cfg.jdbc_properties,
                )
            else:
                append_log_idempotent(
                    spark, serving.drop("_source_file", "_source_mtime"),
                    f"{cfg.warehouse_dir}/sales", str(batch_id),
                )
            # Intra-batch keyed keep-last BEFORE the upsert: a
            # micro-batch drains up to 16 files, and the same key
            # arriving in two of them must resolve the way the
            # reference's sequential one-event-one-run loop would —
            # the later-ARRIVING file's row wins.  Arrival order is the
            # file's modification time (``_source_mtime`` DESC, from
            # the scan's _metadata column — no extra I/O); the path
            # string, the previous proxy, only matches arrival order
            # when feed filenames happen to sort chronologically, so it
            # is demoted to the same-mtime tiebreak, and a content hash
            # breaks same-file ties deterministically.
            # The batch path gets this for free from validate_batch's
            # whole-file V4 uniqueness check; the row-level rules here
            # have no duplicate-key rule, so without this dedup BOTH
            # copies survive upsert_keep_last's anti-join+union and
            # the keyed sales_tgt table double-counts the key.  The
            # lake and append-only ``sales`` log above keep every row
            # (the audit record, exactly what sequential reference
            # runs would have appended).
            data_cols = [
                c for c in serving.columns
                if c not in ("_source_file", "_source_mtime")
            ]
            incoming = dedup_keep_last(
                serving, [SALES_KEY_COLUMN],
                [
                    F.col("_source_mtime").desc(),
                    F.col("_source_file").desc(),
                    F.xxhash64(
                        *[F.col(c).cast("string") for c in data_cols]
                    ).desc(),
                ],
            ).drop("_source_file", "_source_mtime")
            existing = read_serving_table(
                spark, cfg.warehouse_dir, "sales_tgt",
                cfg.jdbc_url, cfg.jdbc_properties,
            )
            merged = upsert_keep_last(
                existing, incoming, [SALES_KEY_COLUMN],
                broadcast_keys=True,
            )
            merged = materialize(merged)
            write_serving_table(
                merged, cfg.warehouse_dir, "sales_tgt", "overwrite",
                cfg.jdbc_url, cfg.jdbc_properties,
            )
            summary_src = (
                incoming if cfg.summary_scope == "batch" else merged
            )
            write_serving_table(
                sales_summary(summary_src), cfg.warehouse_dir,
                "sales_summary", "overwrite",
                cfg.jdbc_url, cfg.jdbc_properties,
            )
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
