"""Aggregation operators (reference A1, ``lambda.py:184-189``).

The reference's single aggregate: group the batch by ``Country`` and emit
``max(UnitsSold)``, ``mean(TotalRevenue)``, ``mean(TotalCost)``,
``mean(TotalProfit)`` under fixed output names.  Catalyst plans this as a
partial (map-side) + final hash aggregate automatically, so the shuffle
carries one row per (partition, country) — at 100 TB the network moves
megabytes, not the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Output column names of the reference's summary (``lambda.py:185-188``).
SUMMARY_COLUMNS = [
    "max_units_sold",
    "average_total_revenue",
    "average_total_cost",
    "average_total_profit",
]


def sales_summary(
    df: DataFrame,
    country_col: str = "Country",
    units_col: str = "UnitsSold",
    revenue_col: str = "TotalRevenue",
    cost_col: str = "TotalCost",
    profit_col: str = "TotalProfit",
) -> DataFrame:
    """Per-country summary, reference-exact output names
    (``lambda.py:184-189``): one max + three means."""
    return df.groupBy(country_col).agg(
        F.max(units_col).alias("max_units_sold"),
        F.avg(revenue_col).alias("average_total_revenue"),
        F.avg(cost_col).alias("average_total_cost"),
        F.avg(profit_col).alias("average_total_profit"),
    )


def group_aggregate(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """Generic named multi-aggregate: ``aggs`` maps output name → agg
    expression; every output is explicitly aliased (names are part of the
    operator contract — the driver's oracle hashes by column name)."""
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    aliases: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact interpolated percentiles (``percentile_cont`` semantics)
    per group — the scale-safe formulation.

    ``F.percentile``/``F.median`` buffer every group value in the agg
    state, and a ``Window.partitionBy(group)`` sort puts each group on
    ONE task — both die when a few groups hold a fact table's rows.
    This operator instead computes a distributed selection:

    1. range-partition by (group, value) → every partition sort is
       local, parallel, and spillable;
    2. per-(partition, group) row counts → a P×G frame whose running
       sum (a trivially small window) yields each partition's global
       rank offset — no driver collect, offsets are broadcast-joined;
    3. global rank = offset + local row_number (window keyed by
       (partition, group): P×G-way parallelism);
    4. each requested percentile p needs only ranks
       ``lo = floor((n-1)p)+1`` and ``lo+1``; all other rows are
       filtered before the final |groups|-row interpolation agg.

    Exactly matches ``percentile_cont``: v_lo*(1-frac) + v_hi*frac with
    h = (n-1)p.  Ties are safe — equal ranks carry equal values."""
    aliases = aliases or [f"p{int(p * 100)}" for p in ps]
    spark = df.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    g = [F.col(c) for c in group_cols]
    v = F.col(value_col)

    part = (
        df.select(*group_cols, value_col)
        # percentile_cont semantics: NULL values are not ranked
        .filter(v.isNotNull())
        .repartitionByRange(num_partitions, *g, v)
        .withColumn("_pid", F.spark_partition_id())
    )
    # Two plan branches (counts and ranks) consume `part`, and rank
    # math requires BOTH to see identical range boundaries / _pid
    # assignments.  The range exchange samples its boundaries at run
    # time, so pin the materialized result rather than relying on
    # exchange-reuse staying enabled.  Eager localCheckpoint (not
    # DataFrame.persist): partition ids are frozen even across calls
    # composed into one plan, and the backing RDD cache is reclaimed by
    # the ContextCleaner once the frame is unreachable — CacheManager
    # entries from .persist() leak until an explicit unpersist, which a
    # lazy operator has no safe point to issue.
    part = part.localCheckpoint(eager=True)
    cnt = part.groupBy("_pid", *group_cols).agg(F.count("*").alias("_pc"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = cnt.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_off"),
    )
    n = cnt.groupBy(*group_cols).agg(F.sum("_pc").alias("_n"))

    w_local = Window.partitionBy("_pid", *group_cols).orderBy(v)
    ranked = (
        part.withColumn("_lrn", F.row_number().over(w_local))
        .join(F.broadcast(off), ["_pid", *group_cols])
        .join(F.broadcast(n), group_cols)
        .withColumn("_rn", F.col("_off") + F.col("_lrn"))
    )

    needed = F.lit(False)
    contribs = []
    for p, name in zip(ps, aliases):
        h = (F.col("_n") - 1) * F.lit(float(p))
        lo = F.floor(h) + 1
        frac = h - F.floor(h)
        needed = needed | (F.col("_rn") == lo) | (F.col("_rn") == lo + 1)
        contrib = v.cast("double") * (
            F.when(F.col("_rn") == lo, F.lit(1.0) - frac)
            .when(F.col("_rn") == lo + 1, frac)
            .otherwise(F.lit(0.0))
        )
        contribs.append(F.sum(contrib).alias(name))
    return ranked.filter(needed).groupBy(*group_cols).agg(*contribs)


def global_cumsum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "cum_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Globally-ordered running sum WITHOUT a single-partition window.

    ``Window.orderBy(...)`` with no partitionBy collapses the whole
    frame onto one task; this operator keeps the sort distributed:
    range-partition on the ordering (parallel local sorts), running-sum
    within each partition, then add each partition's offset — the
    running total of per-partition sums, a P-row frame — via a
    broadcast join.  Output: input columns + ``out_col``.

    Range partition ids are ordered consistently with the sort, so
    offset(pid) = Σ partition sums with smaller pid."""
    spark = df.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    # same branch-consistency requirement as exact_percentiles: the
    # offset branch and the cumsum branch must agree on _pid (eager
    # checkpoint, not persist — see exact_percentiles)
    part = part.localCheckpoint(eager=True)
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    off = (
        part.groupBy("_pid")
        .agg(F.sum(value_col).alias("_ps"))
        .select(
            "_pid",
            F.coalesce(F.sum("_ps").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        part.withColumn("_lcum", F.sum(value_col).over(w_local))
        .join(F.broadcast(off), "_pid")
        .withColumn(out_col, F.col("_off") + F.col("_lcum"))
        .drop("_pid", "_lcum", "_off")
    )
