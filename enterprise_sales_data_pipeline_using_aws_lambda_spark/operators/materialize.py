"""Lineage-cut materialization with a cluster-durability mode switch.

Several operators pin an intermediate frame (consistent partition ids,
iteration lineage cuts, pre-truncate reads).  On local[N],
``localCheckpoint`` is the right call — in-memory, no configured
checkpoint directory needed.  But localCheckpoint blocks survive only as
long as their executor: on a real cluster a lost executor FAILS the job
(the data cannot be recomputed — the lineage was cut) instead of
recovering.  For long-running cluster jobs, switch to reliable
checkpointing:

    spark.sparkContext.setCheckpointDir("hdfs://.../checkpoints")
    spark.conf.set("spark.graft.checkpoint.mode", "reliable")

Every operator lineage-cut in this package routes through
:func:`materialize`, so one session-level switch covers them all.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

#: Session conf key selecting the materialization strategy.
CHECKPOINT_MODE_KEY = "spark.graft.checkpoint.mode"


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage and pin its result, per the session's
    ``spark.graft.checkpoint.mode``:

    - ``local`` (default): ``localCheckpoint`` — executor-memory blocks,
      reclaimed by the ContextCleaner when the frame is unreachable.
      Fast; not durable to executor loss.
    - ``reliable``: ``DataFrame.checkpoint`` — writes to the
      SparkContext checkpoint directory (HDFS/S3), survives executor
      loss and is what a 1000-executor run should use for multi-hour
      lineages.  Requires ``setCheckpointDir`` first (Spark raises a
      clear error otherwise).
    """
    spark = df.sparkSession
    mode = spark.conf.get(CHECKPOINT_MODE_KEY, "local")
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    if mode != "local":
        raise ValueError(
            f"{CHECKPOINT_MODE_KEY} must be 'local' or 'reliable', "
            f"got {mode!r}"
        )
    return df.localCheckpoint(eager=eager)


#: DataFrame objects already known to satisfy the parallelism floor —
#: either checked once or produced by the repartition below.  Weak
#: identity set: entries vanish with the frame, and DataFrame does not
#: overload __eq__/__hash__, so membership is object identity.
_KNOWN_PARALLEL: "weakref.WeakSet" = weakref.WeakSet()

#: Probe verdicts keyed by (session id, semanticHash, target): a FRESH
#: DataFrame object over a plan probed before (a bench re-run, an
#: oracle sweep, a composed pipeline rebuilding the same subtree) skips
#: the RDD-conversion probe entirely.  Bounded; cleared when full.
_PARALLEL_BY_PLAN: dict = {}
_MAX_PLAN_CACHE = 4096


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's core count if
    its current plan yields fewer partitions — a no-op otherwise.

    CPU-bound per-row operators (character shingling → 64-hash MinHash,
    rolling-hash fingerprints) fuse into their input's scan stage under
    whole-stage codegen, so a single-split input (one parquet row group,
    a small coalesced upstream) runs the WHOLE compute on one core while
    the rest of the cluster idles — measured 5.4 s → 3.4 s on the
    MinHash near-dup lane at sf0.1/local[32].  The partition-count guard
    makes this free at scale: any real corpus scans with ≥ cores splits,
    so the exchange never appears there.  Callers are the row-expensive
    operators only — rebalancing every scan would tax cheap queries with
    a pointless shuffle (measured +0.5-1.5 s on embedding/doc lanes
    whose first shuffle arrives before any heavy compute).

    The partition-count probe (``df.rdd.getNumPartitions()``) forces a
    full analysis + physical-plan-to-RDD conversion — pure driver
    overhead, measured (local[8], sf0.1 frames) at ~35-50 ms on a bare
    parquet scan and ~0.4 s on a 3-table join+agg plan, per fresh
    DataFrame object.  Two memo layers keep that off the steady-state
    path: frames already checked (or produced by the repartition
    itself) hit a weak identity set (~3 µs), and fresh objects over a
    PLAN probed before hit a semanticHash-keyed verdict cache
    (~0.4 ms — the analyzed-plan hash, 100-1000× cheaper than the RDD
    conversion), which is what bench re-runs, oracle sweeps, and
    composed pipelines rebuilding the same subtree actually pay.  The
    plan cache is a perf-only heuristic: a stale verdict (the same
    path rewritten with different file splits mid-session) or a hash
    collision can only mis-tune the partitioning decision, never
    change results.  The session component of the key is the
    context's ``applicationId`` — stable for the context's lifetime,
    never recycled the way ``id(session)`` can be after a session is
    garbage-collected (a reused id would let a dead session's verdict
    leak into a new one's probe)."""
    if df in _KNOWN_PARALLEL:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    key = (
        df.sparkSession.sparkContext.applicationId,
        df.semanticHash(),
        target,
    )
    verdict = _PARALLEL_BY_PLAN.get(key)
    if verdict is None:
        verdict = df.rdd.getNumPartitions() >= target
        if len(_PARALLEL_BY_PLAN) >= _MAX_PLAN_CACHE:
            _PARALLEL_BY_PLAN.clear()
        _PARALLEL_BY_PLAN[key] = verdict
    if verdict:
        _KNOWN_PARALLEL.add(df)
        return df
    out = df.repartition(target)
    _KNOWN_PARALLEL.add(out)
    return out


def release_checkpoints(spark) -> int:
    """Unpersist the session's *checkpointed* RDD blocks — harness-only.

    ``localCheckpoint`` blocks are freed by the ContextCleaner only
    when the JVM garbage-collects the frame — in a long-lived session
    running many checkpoint-using queries back-to-back (the bench, the
    oracle sweep, a notebook) the blocks accumulate and the resulting
    heap/GC pressure taxes LATER queries.  Harness code calls this
    between queries; never call it while a frame derived from a live
    checkpoint is still needed — a released localCheckpoint cannot be
    recomputed (its lineage was truncated), so later reuse fails
    outright.  Unrelated user ``.cache()``/``.persist()`` blocks are
    left alone: only RDDs that report ``isCheckpointed`` /
    ``isLocallyCheckpointed`` are released.  Returns the number
    released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for jrdd in jmap.values():
        scala_rdd = jrdd.rdd()
        if (
            scala_rdd.isCheckpointed()
            or scala_rdd.isLocallyCheckpointed()
        ):
            jrdd.unpersist()
            n += 1
    return n
