"""Lake maintenance: compaction, retention, schema evolution.

The reference's lake is append-only timestamp folders
(``lambda.py:141-158``) — nothing ever compacts, expires, or evolves.
A lake that ingests every few minutes for months accumulates the three
classic pathologies these operators fix:

- **small files** — every micro-batch writes its own handful of files;
  scans eventually spend more time opening files than reading bytes.
  :func:`compact_partition` rewrites one partition to ``target_files``
  with an atomic swap (write aside → rename), so concurrent readers
  see the old files or the new ones, never a mix.
- **unbounded history** — quarantine/batch partitions pile up forever.
  :func:`expire_batches` drops ``ingest_batch`` partitions older than
  a cutoff by FOLDER NAME (no data scan — the batch id embeds its
  wall-clock, so retention is a metadata-only listing).
- **schema drift** — new ingest columns appear over time; old
  partitions lack them.  :func:`read_lake` reads with ``mergeSchema``
  so late columns surface as NULL in old batches, the standard
  additive-evolution contract (renames/retypes remain migrations).

All paths go through Hadoop FS (works on file://, s3a://, hdfs://);
the atomic-swap rename is per-partition-directory — the same unit the
write side produces — so maintenance never blocks ingestion of OTHER
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, hpath.getFileSystem(sc._jsc.hadoopConfiguration()), hpath


def list_partitions(spark: SparkSession, table_dir: str) -> list[str]:
    """Partition directory names (``ingest_batch=...``) under a lake
    table — a pure listing, no data scan.  Compaction crash debris
    (``*__old`` backups, ``*__compacting`` staging) is EXCLUDED: those
    names contain ``=`` too, and reporting one as a partition would
    send a maintenance sweep compacting the backup in place under its
    debris name — legitimizing exactly the state
    ``compact_lake_partition``'s closed recovery machine needs to
    recognize."""
    from .writers import COMPACT_BACKUP_SUFFIX, COMPACT_STAGING_SUFFIX

    jvm, fs, hpath = _fs(spark, table_dir)
    if not fs.exists(hpath):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(hpath)
        if st.isDirectory()
        and "=" in st.getPath().getName()
        and not st.getPath().getName().endswith(
            (COMPACT_BACKUP_SUFFIX, COMPACT_STAGING_SUFFIX)
        )
    )


def compact_partition(
    spark: SparkSession,
    table_dir: str,
    partition: str,
    target_files: int = 1,
) -> int:
    """Rewrite one partition directory to ``target_files`` parquet
    files with an atomic swap; returns the file count afterwards.

    Delegates to :func:`writers.compact_lake_partition` — the
    rename-out/rename-in swap WITH rollback (swap-in failure restores
    the original directory) — after resolving and validating the
    partition path; this module adds the table-level addressing
    (partition by name, post-compaction file count).  A reader that
    PLANS after the swap sees only the new row-identical files; a
    frame planned BEFORE it holds the old file list and must re-plan
    (``spark.catalog.refreshByPath`` — the standard non-ACID parquet
    lake contract; table formats with a transaction log remove this
    caveat and are the right tool once concurrent maintenance matters).
    Partition-column values are NOT re-read from data (the folder name
    carries them), so compaction preserves the layout contract
    exactly.

    A MISSING partition directory still delegates when its
    crash-debris siblings (``__old`` backup or staging) exist: a
    compaction that died between swap-out and swap-in leaves the data
    only in the backup, and ``compact_lake_partition``'s entry
    recovery restores it — raising here would block the documented
    "recovery is re-running it" path at the table-level entry point.
    Only a partition with NO trace at all is an error."""
    from .writers import (
        COMPACT_BACKUP_SUFFIX,
        COMPACT_STAGING_SUFFIX,
        compact_lake_partition,
        count_data_files,
    )

    jvm, fs, _ = _fs(spark, table_dir)
    base = f"{table_dir}/{partition}"
    src = jvm.org.apache.hadoop.fs.Path(base)
    debris = any(
        fs.exists(jvm.org.apache.hadoop.fs.Path(base + sfx))
        for sfx in (COMPACT_BACKUP_SUFFIX, COMPACT_STAGING_SUFFIX)
    )
    if not fs.exists(src) and not debris:
        raise FileNotFoundError(f"no partition {partition} in {table_dir}")
    compact_lake_partition(spark, base, target_files)
    # same metric as the compaction trigger (count_data_files), so
    # before/after numbers a maintenance job logs are comparable
    return count_data_files(spark, base)


def expire_batches(
    spark: SparkSession,
    table_dir: str,
    keep_from_batch_id: str,
    partition_col: str = "ingest_batch",
) -> list[str]:
    """Drop ``ingest_batch`` partitions strictly OLDER than
    ``keep_from_batch_id`` — metadata-only retention.

    Batch ids are wall-clock-ordered strings (``%Y%m%d_%H%M%S``,
    ``writers.batch_id_now``), so lexicographic comparison on folder
    names is time comparison; no file is opened.  Partitions whose id
    does NOT match that shape are SKIPPED, never deleted: lakes fed by
    ``streaming.stream_sales_ingest`` carry integer micro-batch ids in
    the same partition column, and comparing those lexicographically
    against a timestamp would delete fresh data (``'0' < '2026…'``) —
    retention for integer-id lakes needs its own policy, not this
    wall-clock one.  Returns the dropped partition names."""
    import re

    from .writers import delete_path

    wallclock = re.compile(r"\d{8}_\d{6}(_\w+)?$")  # incl. _rq suffixes
    dropped = []
    prefix = f"{partition_col}="
    for name in list_partitions(spark, table_dir):
        if not name.startswith(prefix):
            continue
        bid = name[len(prefix):]
        if not wallclock.match(bid):
            continue  # foreign id scheme: refuse to reason about age
        if bid < keep_from_batch_id:
            delete_path(spark, f"{table_dir}/{name}")
            dropped.append(name)
    return dropped


def read_lake(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the lake table with additive schema evolution: columns
    added by later batches surface as NULL in earlier partitions
    (``mergeSchema`` unions the per-file footers — a metadata merge,
    not a data rewrite).

    Fails LOUDLY if compaction crash debris (``*__old`` backup /
    ``*__compacting`` staging directories) sits under the table:
    partition discovery would parse those names as partition VALUES
    and every row in them would surface a second time — a silently
    double-counted read.  The check is one directory listing; recovery
    is re-running the partition's compaction (its entry recovery rolls
    the debris back)."""
    from .writers import COMPACT_BACKUP_SUFFIX, COMPACT_STAGING_SUFFIX

    jvm, fs, hpath = _fs(spark, table_dir)
    if fs.exists(hpath):
        debris = sorted(
            st.getPath().getName()
            for st in fs.listStatus(hpath)
            if st.isDirectory()
            and st.getPath().getName().endswith(
                (COMPACT_BACKUP_SUFFIX, COMPACT_STAGING_SUFFIX)
            )
        )
        if debris:
            raise IOError(
                f"lake table {table_dir} carries compaction crash "
                f"debris {debris[:5]}: reading it would double-count "
                f"those partitions' rows.  Re-run compact_partition "
                f"for them (its entry recovery rolls the state back) "
                f"before reading"
            )
    return (
        spark.read.option("mergeSchema", "true")
        .option("basePath", table_dir)
        .parquet(table_dir)
    )
