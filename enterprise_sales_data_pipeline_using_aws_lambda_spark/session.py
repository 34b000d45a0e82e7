"""SparkSession factory with scale-appropriate defaults.

Local tests run on ``local[N]`` but every setting here is chosen for a
multi-executor cluster: AQE for runtime re-planning (skew joins, partition
coalescing), explicit shuffle partitioning, Arrow for any pandas-UDF
exchange, and UTC session time so results are byte-stable across machines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "enterprise-sales-engine", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Notes on scale: ``spark.sql.shuffle.partitions`` is a floor — AQE
    coalesces small shuffles and splits skewed ones at runtime, so on a
    1000-executor cluster the same code simply runs with a larger setting
    (or ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``).
    """
    n = cpus or default_parallelism()
    # One BLAS thread per Python worker: Spark already runs `n` workers
    # in parallel, so a multithreaded OpenBLAS inside each oversubscribes
    # n× and thrashes (measured 30×+ slowdown on the 1M-vector IVF
    # assignment).  Workers inherit the JVM's environment, so this must
    # be set before the session starts; setdefault keeps any explicit
    # operator override.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet timestamps written without a timezone annotation
        # (isAdjustedToUTC=false) would otherwise read back as
        # TIMESTAMP_NTZ, which event-time watermarks reject.  With the
        # session pinned to UTC the LTZ reading is value-identical, so
        # keep the classic behavior: every timestamp column is TIMESTAMP.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Literal IN-lists push into parquet as exact per-value filters
        # up to this size; beyond it Spark degrades the pushed filter
        # to a [min,max] range (row-group pruning then only helps when
        # the ids are clustered).  The default of 10 is far below the
        # id sets the store-backed dedup verify pushes for a typical
        # dirty batch (tens to hundreds of pair-named docs).  Do NOT
        # raise this toward MAX_VERIFY_ID_PUSHDOWN: the exact-In form
        # recurses per value in the parquet filter path, and a
        # 1000-value In StackOverflowErrors an executor on default
        # thread stacks (measured on this box: 999 ok, 1000 crashes;
        # pinned by tests/test_plans.py's in-filter boundary test).
        # 500 keeps 2x headroom under the measured ceiling; id lists
        # past it are still CORRECT — the guarded fast paths keep the
        # broadcast-hit-set anti-join, only the parquet-side pruning
        # degrades to the range form.
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "500")
        # Session invariant, not a per-read toggle: readers.read_events
        # must read parquet TIMESTAMP(NANOS) as long, and because
        # frames are lazy the conf has to hold whenever such a scan
        # executes — pinning it at build time makes every read's schema
        # deterministic instead of dependent on whether read_events ran
        # first (read_events still sets it for vanilla sessions).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate synthesizes `size(arr) > 0` from every
        # non-outer explode.  For this engine's explodes the array is
        # almost always a COMPUTED expression (char n-gram shingles,
        # banded signature slices, gram windows), so PushDownPredicates
        # substitutes the full expression into the inferred filter and
        # pushes it below ensure_min_parallelism's round-robin exchange —
        # the whole shingling CPU then runs inside the 1-split parquet
        # scan stage on ONE core, and is recomputed above the exchange
        # anyway.  Measured on dedup_minhash_lsh at sf0.1/local[32]:
        # 7.7-9.3 s -> 5.2-5.8 s steady-state with the rule excluded,
        # identical output (the plan's Filter(size(array_distinct(
        # transform(...))) > 0) under the Exchange disappears).  The
        # inference is semantically redundant — explode already drops
        # empty arrays — and any operator that WANTS early pruning on a
        # stored array column can write the cheap attribute filter
        # explicitly, which still pushes to the scan.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
    )
    return builder.getOrCreate()
