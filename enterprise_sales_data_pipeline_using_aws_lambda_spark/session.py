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
    )
    return builder.getOrCreate()
