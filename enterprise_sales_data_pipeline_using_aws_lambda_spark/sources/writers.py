"""Sinks (reference operators S5–S11).

The reference writes one Parquet file per input under a wall-clock
timestamp *folder* (``processed/{ts}/{stem}.parquet``, reference
``lambda.py:141-158``) and moves failed files to ``quarantine/{ts}/``
while silently dropping the failure reason (``lambda.py:123-139`` accepts
``reason`` but never persists it).

Scale-first redesign:
- the timestamp becomes a real **partition column** (``ingest_date`` /
  ``batch_id``) so the lake gets partition pruning instead of opaque
  folders;
- quarantine keeps the reason (``_error_reason``) plus provenance columns
  — fixing the reference's data loss;
- JDBC-style serving sinks (S6/S7/S9) are modeled as mode='append' /
  'overwrite' writes behind one function so tests can swap in a local
  parquet "warehouse" — no MySQL in this environment.
"""

from __future__ import annotations

from contextlib import contextmanager
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_id_now() -> str:
    """Wall-clock batch id — the reference's folder timestamp
    (``%Y%m%d_%H%M%S``, ``lambda.py:52-56``) extended with
    microseconds.  The reference's second-granularity id silently
    MERGES two batches that arrive within one second; here the id keys
    the idempotent append, so a same-second collision would make the
    second batch look like a replay and silently drop it from the lake
    and the sales log (surfaced by back-to-back run_batch calls on a
    warm JVM).  Microseconds keep the id chronologically sortable
    (equal-length strings, lexicographic == arrival) while making
    same-process collisions practically impossible; the single-writer
    contract covers the rest."""
    return datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S_%f")


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    batch_id: str | None = None,
    mode: str = "append",
    partition_cols: list[str] | None = None,
) -> str:
    """Parquet lake sink (reference S5, ``lambda.py:141-158``).

    Adds ``ingest_batch`` as a partition column (instead of the
    reference's timestamp folder) so downstream reads prune by batch.
    """
    bid = batch_id or batch_id_now()
    out = df.withColumn("ingest_batch", F.lit(bid))
    cols = ["ingest_batch"] + (partition_cols or [])
    out.write.mode(mode).partitionBy(*cols).parquet(path)
    return bid


def write_quarantine(
    df: DataFrame,
    path: str,
    reason: str,
    source_file: str | None = None,
    batch_id: str | None = None,
) -> str:
    """Quarantine sink (reference S10, ``lambda.py:123-139``).

    Unlike the reference, the failure ``reason`` is persisted as a column
    alongside provenance (``_source_file``, ``_ingest_batch``).

    Rows land under ``ingest_batch=<bid>/`` — the same directory
    layout the streaming face's idempotent quarantine appends produce
    — so one quarantine directory can hold rows from both faces and
    from re-drive re-quarantines without mixing flat and partitioned
    parquet structures (partition discovery rejects a mix).
    """
    bid = batch_id or batch_id_now()
    out = (
        df.withColumn("_error_reason", F.lit(reason))
        .withColumn("_source_file", F.lit(source_file or ""))
        .withColumn("_ingest_batch", F.lit(bid))
    )
    out.write.mode("append").parquet(f"{path}/ingest_batch={bid}")
    return bid


def write_serving_table(
    df: DataFrame,
    warehouse_dir: str,
    table: str,
    mode: str,
    jdbc_url: str | None = None,
    jdbc_properties: dict | None = None,
) -> None:
    """Serving-table sink for the reference's MySQL writes
    (S6 append → ``sales``, S9 replace → ``sales_tgt``/``sales_summary``,
    reference ``lambda.py:172,181,190``).

    With ``jdbc_url`` set this is the real relational path —
    ``df.write.jdbc(url, table, mode)`` — usable against MySQL exactly
    like the reference (tests exercise it against Spark's bundled
    embedded Derby).  Without it, a parquet directory per table stands
    in so e2e tests stay hermetic.  ``mode='overwrite'`` reproduces the
    reference's ``if_exists='replace'`` drop-and-recreate semantics.
    """
    if jdbc_url:
        df.write.jdbc(
            jdbc_url, table, mode=mode, properties=jdbc_properties or {}
        )
    else:
        df.write.mode(mode).parquet(f"{warehouse_dir}/{table}")


def read_serving_table(
    spark: SparkSession,
    warehouse_dir: str,
    table: str,
    jdbc_url: str | None = None,
    jdbc_properties: dict | None = None,
) -> DataFrame | None:
    """Serving-table scan with the reference's missing-table fallback
    (S7+S8, ``lambda.py:176-178``): returns None when the table does not
    exist yet — caller substitutes an empty relation.  With ``jdbc_url``
    set, reads through ``spark.read.jdbc`` (real S7).

    Only a genuinely MISSING table maps to None: any other failure
    (connection refused, auth, timeout) re-raises.  Swallowing those
    would be catastrophic downstream — the upsert would treat the
    serving table as empty and the subsequent overwrite would destroy
    it while reporting success."""
    try:
        if jdbc_url:
            return spark.read.jdbc(
                jdbc_url, table, properties=jdbc_properties or {}
            )
        return spark.read.parquet(f"{warehouse_dir}/{table}")
    except Exception as ex:
        # only the message head — the Java stack trace below it contains
        # class names (JdbcRelationProvider, FilePath...) that would
        # false-match the object words
        msg = "\n".join(str(ex).splitlines()[:4]).lower()
        missing_phrase = any(
            m in msg
            for m in (
                "does not exist",  # Derby: Table/View 'X' does not exist
                "doesn't exist",   # MySQL: Table 'x' doesn't exist
                "not found",       # Postgres/generic: relation not found
                "path_not_found",  # Spark parquet error class
            )
        )
        # a missing DATABASE/connection is infra failure, not S8 — only
        # a missing table/view/relation/path is the reference fallback
        missing_object = any(
            w in msg for w in ("table", "view", "relation", "path")
        )
        if missing_phrase and missing_object:
            return None
        raise


def delete_path(spark: SparkSession, path: str) -> bool:
    """File delete (reference S11, ``lambda.py:196-202``) via Hadoop FS —
    works on any supported scheme (file://, s3a://, hdfs://)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return bool(fs.delete(hpath, True))


EXPORT_FORMATS = ("parquet", "csv", "json", "orc")


def export_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    coalesce: int | None = None,
) -> None:
    """Format-dispatch export sink — the write-side mirror of
    ``readers.read_any`` (the reference only ever writes Parquet; CSV and
    JSON exports are how downstream non-Spark consumers pull serving
    data).  ``coalesce`` caps output file count for small exports; leave
    None for large tables so write parallelism is preserved."""
    if fmt not in EXPORT_FORMATS:
        raise ValueError(
            f"Unsupported export format: {fmt} (use {EXPORT_FORMATS})"
        )
    out = df.coalesce(coalesce) if coalesce else df
    w = out.write.mode(mode)
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)


#: Compaction swap suffixes — the ONE place the crash-debris naming
#: contract lives.  ``__compacting`` holds the staged rewrite,
#: ``__old`` holds the swapped-out original; either existing next to
#: a lake directory means a maintenance run is mid-swap or crashed,
#: and detectors (``has_crash_debris``, the IVF partition walk) must
#: recognize exactly these names.
COMPACT_STAGING_SUFFIX = "__compacting"
COMPACT_BACKUP_SUFFIX = "__old"


def has_crash_debris(
    spark: SparkSession,
    path: str,
    staging_suffix: str = COMPACT_STAGING_SUFFIX,
) -> bool:
    """True if a :func:`compact_lake_partition` run on ``path`` left
    mid-swap debris (``<path>__old`` or the staging directory) — the
    signal that the directory must be revisited by maintenance
    regardless of its file-count trigger, because the table itself may
    be mid-rename and list zero files."""
    sc = spark.sparkContext
    conf = sc._jsc.hadoopConfiguration()
    for suffix in (COMPACT_BACKUP_SUFFIX, staging_suffix):
        hp = sc._jvm.org.apache.hadoop.fs.Path(path + suffix)
        if hp.getFileSystem(conf).exists(hp):
            return True
    return False


def count_data_files(spark: SparkSession, path: str) -> int:
    """Number of data files directly under ``path`` (underscore/dot
    prefixed bookkeeping excluded) — the trigger metric for
    small-file compaction.  One FS listing, no data read."""
    sc = spark.sparkContext
    p = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return 0
    return len([
        f for f in fs.listStatus(p)
        if f.isFile()
        and not f.getPath().getName().startswith(("_", "."))
    ])


def compact_lake_partition(
    spark: SparkSession,
    path: str,
    target_files: int,
    staging_suffix: str = COMPACT_STAGING_SUFFIX,
    transform=None,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction for a lake directory (one partition's worth).

    Per-batch streaming ingest accretes many small parquet files; at
    scale the file-listing and task-scheduling overhead eventually
    dominates scans (the classic small-file problem).  This rewrites the
    directory into ``target_files`` files via a staging directory and a
    two-rename swap.  Each rename is atomic, but the PAIR is not: for
    the instant between swap-out and swap-in the path does not exist,
    so a concurrent scan planned in that window fails with
    path-not-found (and retries fine) — run compaction from a
    maintenance window, not under live readers.  A crash inside the
    window strands the data in ``<path>__old``; this function detects
    and ROLLS BACK that state on the next invocation before
    compacting, so recovery is re-running it.  Returns the number of
    files before compaction.

    Run per partition directory (e.g. per ingest_batch) from a
    maintenance job; on object stores swap rename-atomicity caveats with
    a table format (Delta/Iceberg OPTIMIZE) — this operator is the
    Hadoop-FS form.

    ``transform`` (DataFrame → DataFrame, optional) is applied to the
    directory's rows before the rewrite — for row-identity-preserving
    maintenance only (dropping exact-duplicate rows a crash-healed
    append left behind, re-sorting for layout).  Anything that changes
    the logical contents belongs in an operator, not a compaction.

    ``sort_col`` rewrites with the :func:`write_sorted_lake` layout
    (range-partitioned across ``target_files``, sorted within each)
    instead of round-robin, so compaction doubles as re-clustering:
    row-group min/max stats on the column stay tight and pushed
    point/IN predicates keep pruning after the rewrite.
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(path)
    fs = src.getFileSystem(conf)
    old = jvm.org.apache.hadoop.fs.Path(path + COMPACT_BACKUP_SUFFIX)
    staging = jvm.org.apache.hadoop.fs.Path(path + staging_suffix)
    # crash recovery from a previous run (class of states is closed:
    # __old only exists between swap-out and the post-swap delete)
    if fs.exists(old):
        if fs.exists(src):
            # crashed after swap-in, before deleting the backup
            fs.delete(old, True)
        else:
            # crashed between swap-out and swap-in: restore the backup
            if not fs.rename(old, src):
                raise IOError(f"compaction recovery failed for {path}")
    if fs.exists(staging):  # stale staging from any crashed attempt
        fs.delete(staging, True)
    # same metric as the min_files trigger (count_data_files), so the
    # returned files_before is consistent with what tripped it
    before = count_data_files(spark, path)

    df = spark.read.parquet(path)
    if transform is not None:
        df = transform(df)
    if sort_col is not None:
        df = df.repartitionByRange(
            target_files, F.col(sort_col)
        ).sortWithinPartitions(sort_col)
    else:
        df = df.repartition(target_files)
    df.write.mode("overwrite").parquet(path + staging_suffix)
    if not fs.rename(src, old):
        raise IOError(f"compaction swap failed for {path}")
    if not fs.rename(staging, src):
        fs.rename(old, src)  # roll back
        raise IOError(f"compaction swap-in failed for {path}")
    fs.delete(old, True)
    return before


def write_sorted_lake(
    df: DataFrame,
    path: str,
    range_col: str,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, within-file-sorted parquet layout: rows are
    range-shuffled on ``range_col`` (each output file owns a disjoint
    value range) and sorted inside each file, so every parquet row
    group's min/max stats span a narrow slice of the column.

    Why at 100 TB: a selective predicate on ``range_col`` then prunes at
    THREE levels — files (disjoint ranges), row groups (tight min/max),
    and pages — instead of scanning everything.  This is the plain-
    parquet form of clustering/Z-ordering on one dimension; the write
    pays one range shuffle + local sort."""
    (
        df.repartitionByRange(n_files, F.col(range_col))
        .sortWithinPartitions(range_col)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Z-order (Morton) interleave key over pre-bucketed integer columns:
    bit i of column j lands at position ``i * n_cols + j``, so sorting by
    the key clusters rows that are close in EVERY dimension at once.

    Inputs must already be non-negative ints < 2**bits (bucketize with
    width_bucket / min-max scaling first — rank-based bucketing keeps
    skewed dimensions balanced).  Pure bit arithmetic folded with a JVM
    higher-order ``aggregate`` over the bit positions: no UDF, fuses
    into the projection before the range shuffle."""
    n = len(cols)
    if n * bits > 63:
        # JVM shiftleft masks the distance mod 64: positions ≥ 64 wrap
        # onto low bits and position 63 flips the sign — the interleave
        # silently degrades to near-random.  Fail loudly instead.
        raise ValueError(
            f"zorder_key needs n_cols*bits <= 63 to fit one signed "
            f"BIGINT (got {n}*{bits}={n * bits}); lower bits= or "
            f"cluster fewer columns"
        )
    parts = []
    for j, c in enumerate(cols):
        v = F.col(c).cast("long")
        for i in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zorder_lake(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustered parquet layout: bucketize each
    clustering column to its min–max range, compute the Z-order
    interleave key, range-shuffle + sort on it, write.

    Why at 100 TB: :func:`write_sorted_lake` clusters ONE dimension —
    a predicate on any other column still scans every row group.
    Z-ordering spreads locality across dimensions, so selective
    predicates on ANY clustered column hit a small fraction of row
    groups (the same layout trick Delta/Iceberg ``OPTIMIZE ZORDER BY``
    applies).  Cost is identical: one range shuffle + local sort; the
    min/max scan to scale the buckets is a single cheap aggregate
    joined back as a broadcast scalar row — no driver-side collect in
    the write plan."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    stats = df.agg(*aggs)
    scaled = df.crossJoin(F.broadcast(stats))
    bcols = []
    for c in cols:
        span = F.col(f"_mx_{c}") - F.col(f"_mn_{c}")
        b = F.when(span <= 0, F.lit(0)).otherwise(
            F.least(
                ((F.col(c) - F.col(f"_mn_{c}"))
                 * F.lit((1 << bits) - 1) / span).cast("long"),
                F.lit((1 << bits) - 1),
            )
        )
        bcols.append(b.alias(f"_zb_{c}"))
    keyed = scaled.select(df.columns + bcols).withColumn(
        "_z", zorder_key([f"_zb_{c}" for c in cols], bits)
    )
    (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z", *[f"_zb_{c}" for c in cols])
        .write.mode(mode)
        .parquet(path)
    )


def append_log_idempotent(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    batch_id: str,
    sort_col: str | None = None,
    sort_files: int | None = None,
) -> bool:
    """Batch-id-keyed idempotent append (SURVEY §7.5.3): the reference's
    append log double-writes on Lambda retries (at-least-once, no
    dedup key).  Each batch is written to an underscore-prefixed
    staging directory (invisible to parquet reads) and then RENAMED
    into its ``ingest_batch=`` partition — one atomic directory move —
    so the partition either exists complete or not at all.  A replay
    that finds the partition present skips; a crash mid-write leaves
    only staging debris that the next attempt clears and rewrites.
    Without the staging step, an existence check alone would mistake a
    partially-committed partition (crash during job commit) for a
    complete one and permanently drop the missing rows.  Combined with
    upstream retry: exactly once.  Streaming gets this from
    checkpoints; this is the batch-mode equivalent.  Returns True if
    the batch was written, False if it was already present (replay).

    ``sort_col`` gives the partition an id-clustered layout: rows are
    range-shuffled on the column across ``sort_files`` output files
    (default: Spark's shuffle partitioning) and sorted within each, so
    every parquet row group's min/max stats span a narrow slice — the
    :func:`write_sorted_lake` property, per batch partition.  Point
    and IN() predicates on the column then prune row groups instead of
    scanning the batch; the store-backed dedup verify
    (``text_dedup._minhash_against_stored``) pushes exactly such a
    filter, so an ingest lake written with ``sort_col=id_col`` pays a
    few row groups per dirty batch instead of a full-lake text read.
    Cost: one batch-bounded range shuffle + local sort per append."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    part = jvm.org.apache.hadoop.fs.Path(f"{path}/ingest_batch={batch_id}")
    fs = part.getFileSystem(conf)
    if fs.exists(part):
        return False
    staging = jvm.org.apache.hadoop.fs.Path(
        f"{path}/_staging_ingest_batch_{batch_id}"
    )
    if fs.exists(staging):  # crashed earlier attempt: clear and redo
        fs.delete(staging, True)
    if sort_col is not None:
        df = (
            df.repartitionByRange(sort_files, F.col(sort_col))
            if sort_files
            else df.repartitionByRange(F.col(sort_col))
        ).sortWithinPartitions(sort_col)
    df.write.mode("overwrite").parquet(staging.toString())
    fs.mkdirs(root)
    if not fs.rename(staging, part):
        # a concurrent writer committed the same batch id first
        fs.delete(staging, True)
        return False
    return True


#: Sibling-file suffix for the store writer lease — a FILE next to the
#: store/index root (never inside it: the IVF retrain swaps the whole
#: root directory, and a lease inside would be swapped out with it).
WRITER_LEASE_SUFFIX = "__lease"

#: Default staleness window for the lease's presumed-crash breaks
#: (same-token self-break and the empty-payload claim-crash break).
#: A lease file YOUNGER than this is presumed LIVE — a same-token
#: claim raises instead of breaking it, because two live attempts of
#: one logical operation is a contract breach the old unconditional
#: self-break would silently compound (each breaks the other's live
#: lease and both enter the critical section).  Older than this, the
#: holder is PRESUMED crashed.  The payload is written once at claim
#: time and never touched again, so a live holder's lease ages while
#: its job runs — callers whose critical section can exceed this
#: window must pass a larger ``stale_after_s`` (and the presumption
#: also needs FS-vs-driver clock skew to be small next to it).
WRITER_LEASE_STALE_AFTER_S = 60.0


class WriterLeaseHeld(RuntimeError):
    """Another writer holds (or a crashed writer of a DIFFERENT kind
    left behind) the store's lease — see :func:`writer_lease`."""


def _read_lease_payload(jvm, fs, lease) -> str:
    """Best-effort payload read.  An unreadable or empty lease (the
    holder crashed between the atomic claim and the payload write, or
    the payload write is in flight) reads as '' — which never equals a
    real token, so the caller fails LOUDLY instead of breaking a lease
    whose owner it cannot identify (the safe direction)."""
    try:
        stream = fs.open(lease)
        try:
            return str(
                jvm.org.apache.commons.io.IOUtils.toString(
                    stream, "UTF-8"
                )
            )
        finally:
            stream.close()
    except Exception:  # noqa: BLE001 - missing/unreadable == unknown
        return ""


def _lease_age_s(fs, lease) -> float | None:
    """Seconds since the lease file's last modification (the claim's
    payload write — never touched again), or None if the file is gone
    (the holder released between the caller's claim attempt and now).
    Uses the FILESYSTEM's modification time against the driver clock,
    so the staleness presumption built on it needs clock skew to be
    small next to the window — true for local/HDFS deployments; on
    skewed clocks the gate degrades toward always-young (the safe,
    loud direction) or always-stale (the old unconditional-break
    behavior), never a new failure mode."""
    import time

    try:
        mtime_ms = fs.getFileStatus(lease).getModificationTime()
    except Exception:  # noqa: BLE001 - FileNotFound via Py4J
        return None
    return max(0.0, time.time() - mtime_ms / 1000.0)


def _write_lease_payload(fs, lease, payload: str) -> None:
    """Write the claimed lease's token+nonce payload (module-level so
    tests can inject a failure into the claim-crash window)."""
    out = fs.create(lease, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


@contextmanager
def writer_lease(
    spark: SparkSession,
    root: str,
    token: str,
    stale_after_s: float | None = None,
):
    """Mutual exclusion for store writers (round-9 VERDICT item 5):
    the append/retrain/compaction fences (``has_crash_debris``-based)
    make single-writer violations LOUD but leave a TOCTOU window — a
    maintenance staging directory that appears between an append's
    re-check and its parquet commit still loses the append silently.
    This closes it: every writer entry point holds
    ``{root}__lease`` for its whole critical section, claimed with an
    atomic create-if-absent (``FileSystem.createNewFile``), so on
    HDFS-semantics filesystems (HDFS, local, ABFS) at most one writer
    is ever inside.  On S3-like object stores without atomic
    create-if-absent the lease degrades to best-effort advisory — the
    same guarantee the fences give — and the documented single-writer
    contract remains the rule.

    ``token`` identifies the LOGICAL operation, not the process: a
    lease left behind by a hard crash whose payload equals ``token``
    is broken and re-claimed, so a re-driven ingest step or a re-run
    maintenance window self-heals without operator action (the repo's
    crash-recovery direction).  The self-break is AGE-GATED
    (round-10 ADVICE): a same-token lease younger than
    ``stale_after_s`` (default :data:`WRITER_LEASE_STALE_AFTER_S`) is
    presumed LIVE and raises :class:`WriterLeaseHeld` instead — the
    unconditional break let a re-drive racing a slow live attempt of
    the same operation break ITS lease (and vice versa), putting both
    inside the critical section, exactly the silent-loss race the
    lease exists to close.  Pass a larger window when the critical
    section can outlive the default (the payload is written once at
    claim, so a live lease ages while its job runs).  An EMPTY or
    unreadable payload older than the window is broken the same way —
    that is the claim-crash debris (a writer that died between the
    atomic create and the payload write), which previously wedged
    every writer until a manual :func:`break_writer_lease`; younger,
    it is presumed to be a payload write in flight and raises.
    Callers' existing contracts still carry the rest: at most one
    live attempt per batch id (the exactly-once cursor — and the
    ingest loops pass per-batch tokens so distinct batches NEVER
    share a token) and one maintenance window at a time.  A young
    lease with a DIFFERENT token raises :class:`WriterLeaseHeld` with
    the holder named: re-drive/re-run that operation (its entry point
    self-breaks its own stale lease and releases cleanly), wait out
    the staleness window, or :func:`break_writer_lease` after
    confirming no writer is live.

    Cost: two FS metadata RPCs to claim + a nonce-guarded
    read-then-delete to release (release deletes only a lease whose
    full payload is its own, so a breached holder never deletes its
    breaker's live lease); a CONTENDED claim adds one payload read and
    one getFileStatus (the age probe).  All noise next to the job the
    lease protects."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    lease = jvm.org.apache.hadoop.fs.Path(
        root.rstrip("/") + WRITER_LEASE_SUFFIX
    )
    fs = lease.getFileSystem(conf)

    # payload = token + a per-acquisition nonce: the TOKEN drives the
    # same-logical-operation self-break rule; the NONCE makes release
    # safe when that rule is (wrongly) exercised against a LIVE holder
    # — if a same-token re-drive broke our lease and re-claimed it,
    # our exit must NOT delete THEIR lease file (which would re-open
    # the store to a third writer), so release deletes only a lease
    # whose full payload is ours.
    import os as _os

    payload = token + "\n" + _os.urandom(8).hex()

    def _claim() -> bool:
        # the CLAIM is the atomic create; the payload write after it
        # is single-writer by construction (only the claimant got
        # True), so its non-atomicity can only yield an empty payload
        # to a concurrent reader — handled as unknown-holder above.
        # An in-process FAILURE of the payload write must not leave
        # the just-claimed empty lease behind (it would wedge every
        # writer for the whole staleness window), so it is dropped
        # before the failure propagates — round-10 ADVICE.
        if not fs.createNewFile(lease):
            return False
        try:
            _write_lease_payload(fs, lease, payload)
        except BaseException:
            try:
                fs.delete(lease, False)
            except Exception:  # noqa: BLE001 - best-effort cleanup
                pass
            raise
        return True

    stale = (
        WRITER_LEASE_STALE_AFTER_S
        if stale_after_s is None
        else stale_after_s
    )
    if not _claim():
        held = _read_lease_payload(jvm, fs, lease)
        holder = held.split("\n", 1)[0]
        age = _lease_age_s(fs, lease)
        if age is None:
            # holder released between our claim attempt and now
            if not _claim():
                held = _read_lease_payload(jvm, fs, lease)
                raise WriterLeaseHeld(
                    f"{root} writer lease was re-claimed by "
                    f"{held.split(chr(10), 1)[0]!r} while we retried "
                    f"a released lease — a concurrent writer is "
                    f"live; retry"
                )
        elif (holder == token or held == "") and age >= stale:
            # presumed crashed: our own logical operation's stale
            # lease (a re-drive), or claim-crash debris (empty
            # payload, no live payload write would be this old)
            import logging

            logging.getLogger(__name__).warning(
                "breaking presumed-crashed writer lease on %s "
                "(holder=%r, age=%.1fs >= stale_after_s=%.1fs)",
                root, holder or "<unknown>", age, stale,
            )
            fs.delete(lease, False)
            if not _claim():
                held = _read_lease_payload(jvm, fs, lease)
                holder = held.split("\n", 1)[0]
                raise WriterLeaseHeld(
                    f"{root} writer lease was re-claimed by "
                    f"{holder!r} while breaking a presumed-crashed "
                    f"lease — a concurrent writer is live; retry"
                )
        elif holder == token:
            raise WriterLeaseHeld(
                f"{root} writer lease is held by our own token "
                f"{holder!r} but is only {age:.1f}s old (< "
                f"stale_after_s={stale:.1f}s) — presumed LIVE: a "
                f"concurrent attempt of the same logical operation "
                f"(a contract breach: at most one live attempt per "
                f"batch/window), or a crash within the last "
                f"{stale:.0f}s.  Retry after the window, or "
                f"break_writer_lease() after confirming no writer "
                f"is active"
            )
        else:
            raise WriterLeaseHeld(
                f"{root} is locked by writer {holder or '<unknown>'!r} "
                f"(lease file {root}{WRITER_LEASE_SUFFIX}, age "
                f"{age:.1f}s).  If that operation is live, wait for "
                f"it; if it crashed, re-drive/re-run it (its entry "
                f"point breaks its own stale lease and recovers); an "
                f"unreadable/empty payload self-clears once it is "
                f"{stale:.0f}s old; or break_writer_lease() after "
                f"confirming no writer is active"
            )
    try:
        yield
    finally:
        # nonce-guarded release: delete only OUR lease.  A lease file
        # carrying someone else's payload means ours was broken by a
        # same-token re-drive mid-flight (already a contract breach);
        # leaving theirs in place keeps the store single-writer
        # instead of compounding the breach.
        if _read_lease_payload(jvm, fs, lease) == payload:
            fs.delete(lease, False)


def break_writer_lease(spark: SparkSession, root: str) -> bool:
    """Operator escape hatch: drop ``{root}__lease`` unconditionally.
    Only after confirming no writer is live — breaking a LIVE writer's
    lease re-opens the silent-loss race the lease exists to close.
    Returns True if a lease file was removed."""
    sc = spark.sparkContext
    lease = sc._jvm.org.apache.hadoop.fs.Path(
        root.rstrip("/") + WRITER_LEASE_SUFFIX
    )
    fs = lease.getFileSystem(sc._jsc.hadoopConfiguration())
    return bool(fs.delete(lease, False))
