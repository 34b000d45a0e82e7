"""Plan-shape guards: anti-patterns that are invisible at test scale but
fatal at 100 TB must not creep into the query inventory.

Today's guard: an UNPARTITIONED window (Exchange SinglePartition feeding
a Window node) serializes the whole frame through one task.  It is only
acceptable over provably aggregate-sized frames; every such case must be
allowlisted here WITH its justification, so a new one fails review by
failing this test.
"""

import pytest

from enterprise_sales_data_pipeline_using_aws_lambda_spark.plans.queries import (
    QUERIES,
)

#: name → why a single-partition window is safe THERE.
ALLOWED_GLOBAL_WINDOWS = {
    # frame = one row per calendar day (|days| ≈ hundreds, not fact-sized)
    "window_moving_avg_range": "window over per-day aggregate",
    # frame = one row per month
    "monthly_revenue_growth": "lag over per-month rollup",
    # global_cumsum's offset frame = one row per shuffle PARTITION
    # (≤ spark.sql.shuffle.partitions rows); the data-sized cumsum is
    # range-partitioned
    "pareto_abc_customers": "partition-count offset frame (global_cumsum)",
}

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.slow
def test_no_unlisted_single_partition_windows(spark):
    flagged = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Exchange SinglePartition" not in ln:
                continue
            ctx = "\n".join(lines[max(0, i - 4) : i])
            if "Window" in ctx:
                flagged[name] = True
                break
    unlisted = sorted(set(flagged) - set(ALLOWED_GLOBAL_WINDOWS))
    assert not unlisted, (
        "single-partition window in plans not allowlisted (would "
        f"serialize a fact-sized frame through one task at scale): {unlisted}"
    )
    stale = sorted(set(ALLOWED_GLOBAL_WINDOWS) - set(flagged))
    assert not stale, (
        f"allowlist entries no longer needed (tighten the list): {stale}"
    )
