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

from .materialize import materialize

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
    if aliases is None:
        # g-format, dot→underscore: 0.29→p29 (int() would truncate the
        # float error to p28), 0.995→p99_5 (int() would collide with
        # 0.99's p99 and emit a duplicate column name)
        aliases = [f"p{p * 100:g}".replace(".", "_") for p in ps]
    if len(set(aliases)) != len(aliases):
        raise ValueError(f"duplicate percentile aliases: {aliases}")
    part = _ranked_partitions(df, group_cols, value_col, num_partitions)
    return _selection_percentiles(part, group_cols, value_col, ps, aliases)


def _ranked_partitions(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    num_partitions: int | None,
) -> DataFrame:
    """Range-partition (group, value) and stamp partition ids.

    Two plan branches (counts and ranks) consume the result, and rank
    math requires BOTH to see identical range boundaries / _pid
    assignments.  The range exchange samples its boundaries at run
    time, so consistency needs the exchange to execute ONCE and be
    shared:

    - default (``spark.sql.exchange.reuse`` enabled — Spark's default,
      and AQE's stage-level reuse behaves the same): leave the frame
      LAZY.  Every consumer branch canonicalizes to the same exchange
      subplan, Spark materializes that shuffle stage once per job, and
      all branches read the same output — one job, no extra
      materialization, boundaries sampled exactly once.  (Round-2 used
      an eager localCheckpoint here instead; that is safe but splits
      the query into several jobs that cannot share exchanges, which
      benchmarked strictly slower.)
    - fallback (reuse explicitly disabled): eager localCheckpoint pins
      the materialized result, trading extra jobs for correctness.

    Partition count: ``spark.sql.shuffle.partitions`` unless the caller
    pins one — the session-level knob a cluster deployment already
    sizes to its executor memory.  (Leaving the count unspecified for
    AQE to size benchmarked slower here: the extra adaptive
    re-planning stages outweigh any coalescing win for a selection
    whose post-shuffle work is already rank-pruned.)"""
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
    if spark.conf.get("spark.sql.exchange.reuse", "true") == "false":
        part = materialize(part)
    return part


def _ns_broadcast_join(
    left: DataFrame, right: DataFrame, cols: list[str]
) -> DataFrame:
    """Inner broadcast join on ``cols`` with NULL-SAFE key equality,
    keeping one copy of the join columns (the left's).

    The selection operators group by caller columns that may be
    nullable, and every internal rejoin below rides this helper: a
    plain name-based equi-join never matches NULL keys, so a NULL
    group's rows silently VANISHED from the output — where the
    documented ``percentile_cont``-via-groupBy semantics return a row
    for the NULL group.  The right side's keys are renamed before the
    join (no self-join ambiguity: every right frame here derives from
    the left's plan), and null-safe equality is a valid hash-join key,
    so the plan stays a broadcast hash join."""
    from functools import reduce

    tags = {c: f"_ns_{c}" for c in cols}
    r = right.select(
        *[F.col(c).alias(tags[c]) for c in cols],
        *[c for c in right.columns if c not in cols],
    )
    cond = reduce(
        Column.__and__,
        [F.col(c).eqNullSafe(F.col(tags[c])) for c in cols],
    )
    return left.join(F.broadcast(r), cond).drop(*tags.values())


def _selection_percentiles(
    part: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    aliases: list[str],
) -> DataFrame:
    """Distributed-selection percentile core over a `_ranked_partitions`
    frame (steps 2-4 of the exact_percentiles docstring).

    Partition pruning before ranking: the per-(partition, group) count
    frame locates WHICH partitions hold each target rank, and only those
    slices are ranked — the rank window (whose required hash exchange
    Catalyst cannot elide, because a checkpointed frame's range
    distribution is opaque to it) therefore shuffles ~|targets| × n/P
    rows instead of n.  At 100 TB that is the difference between a
    metadata-sized exchange and re-shuffling the fact table."""
    v = F.col(value_col)
    cnt = part.groupBy("_pid", *group_cols).agg(F.count("*").alias("_pc"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # P×G rows: per-partition exclusive rank offset + per-group total
    off = cnt.select(
        "_pid",
        *group_cols,
        F.col("_pc"),
        F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_off"),
    )
    n = cnt.groupBy(*group_cols).agg(F.sum("_pc").alias("_n"))

    # Target ranks per (group, percentile): lo = floor((n-1)p)+1 and
    # lo+1.  A (pid, group) slice is needed iff some target rank lies
    # in (_off, _off + _pc] — evaluated inline on the P×G offset frame
    # (one filter, no explode/distinct round-trips), with _n folded in
    # so ONE broadcast serves the slice filter, the rank offsets, and
    # the interpolation math.
    offn = _ns_broadcast_join(off, n, group_cols)
    hit = F.lit(False)
    for p in ps:
        h = (F.col("_n") - 1) * F.lit(float(p))
        lo = F.floor(h) + 1
        for r in (lo, lo + 1):
            hit = hit | (
                (r > F.col("_off")) & (r <= F.col("_off") + F.col("_pc"))
            )
    sel = offn.filter(hit).select("_pid", *group_cols, "_off", "_n")

    w_local = Window.partitionBy("_pid", *group_cols).orderBy(v)
    ranked = (
        _ns_broadcast_join(part, sel, ["_pid", *group_cols])
        .withColumn("_lrn", F.row_number().over(w_local))
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


def mad_spread(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    med_alias: str = "med",
    mad_alias: str = "mad",
    num_partitions: int | None = None,
) -> DataFrame:
    """Fused median + median-absolute-deviation per group.

    MAD is inherently two selection passes (deviations need the median
    first), but the whole thing stays ONE lazy plan: pass 1's range
    exchange is shared (exchange reuse) by its own count/rank branches,
    by the broadcast-median branch, and by pass 2's input — the fact is
    scanned and range-shuffled once per pass with no intermediate jobs.
    (Round-2 eagerly checkpointed between passes; that split the query
    into jobs that re-executed the pass-1 exchange and benchmarked
    ~35% slower.)  Output: one row per group with
    ``med_alias``/``mad_alias``."""
    part1 = _ranked_partitions(df, group_cols, value_col, num_partitions)
    med = _selection_percentiles(
        part1, group_cols, value_col, [0.5], [med_alias]
    )
    dev = (
        _ns_broadcast_join(part1, med, group_cols)
        .select(
            *group_cols,
            F.abs(F.col(value_col) - F.col(med_alias)).alias("_dev"),
        )
    )
    part2 = _ranked_partitions(dev, group_cols, "_dev", num_partitions)
    mad = _selection_percentiles(part2, group_cols, "_dev", [0.5], [mad_alias])
    return _ns_broadcast_join(med, mad, group_cols)


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
    # checkpoint, not persist — see exact_percentiles).  Round-13
    # counterfactual: replacing this with the lazy shared-exchange
    # trick _ranked_partitions uses measured STRICTLY SLOWER on every
    # caller (peak_concurrent_sessions 1.8 s -> 2.1 s steady-state,
    # same-session A/B) — unlike the percentile operator, whose input
    # is a bare projected scan, global_cumsum's callers feed it
    # already-windowed/sessionized frames, and the range exchange's
    # boundary-sampling pass re-executes that whole upstream a second
    # time when the frame is left lazy.  The checkpoint pays one
    # write; the sampling pass then reads pinned blocks.
    part = materialize(part)
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


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    bucket_width: float,
    med_alias: str = "wmedian",
) -> DataFrame:
    """Exact lower weighted median per group — the smallest value whose
    cumulative weight reaches half the group's total — without putting
    any group's rows on a single task.

    The naive formulation (cumulative-weight window per group ordered
    by value) sorts each group on ONE task, the same failure mode
    ``exact_percentiles`` exists to avoid.  This operator prunes with a
    histogram instead:

    1. bucket values by ``floor(value / bucket_width)`` and hash-agg
       per-(group, bucket) weight — map-side combined, the shuffle
       carries |groups| x |buckets| rows, not the fact;
    2. a running-sum window over that SMALL frame finds, per group, the
       single bucket where cumulative weight crosses half the total
       (entry offset ``_prev`` and total ``_tot`` ride along);
    3. only rows in that bucket are re-scanned (broadcast semi-join
       prunes the fact), and a per-group window over this
       1/|buckets|-sized slice finds the crossing value exactly.

    Weights are cast to long, so every comparison is integer-exact
    (identical across engines — no float cumulative-sum ulps).  That
    makes INTEGER weights the contract: a fractional-capable weight
    column (double/float, or decimal with scale > 0) is rejected
    loudly — casting 0.25 to long would silently zero the weight and
    EXCLUDE the row (the `_w > 0` filter), turning normalized-weight
    inputs into empty or wrong medians.  Scale-0 decimals (money-typed
    integral counts) cast to long exactly, so they pass — but only up
    to precision 18: decimal(19..38, 0) values can exceed the long
    range, where the cast overflows to NULL under non-ANSI semantics
    and the ``_w > 0`` filter silently drops the row — the same silent
    exclusion this guard exists to reject.  Pre-scale fractional
    weights to integers (e.g. basis points) upstream.  NULL values and
    non-positive weights are excluded, matching ``percentile_cont``'s
    null handling."""
    from pyspark.sql.types import DecimalType

    wdt = df.schema[weight_col].dataType
    wt = wdt.simpleString()
    if not (bucket_width > 0):
        # 0 divides every value to a NULL bucket (silently EMPTY
        # output: the bucket rejoin never matches), and a negative
        # width makes the cumulative-weight ordering DECREASING in
        # value (silently wrong median) — reject both as loudly as the
        # weight-type contract below.
        raise ValueError(
            f"weighted_median needs bucket_width > 0, got {bucket_width}"
        )
    bad_decimal = isinstance(wdt, DecimalType) and (
        wdt.scale > 0 or wdt.precision > 18
    )
    if wt.startswith(("double", "float")) or bad_decimal:
        raise ValueError(
            f"weighted_median needs an integer weight column that "
            f"fits a long; {weight_col!r} is {wt}.  Casting "
            f"fractional weights to long silently zeroes sub-1 "
            f"weights, and decimals past precision 18 can overflow "
            f"the cast to NULL — both silently DROP rows.  Pre-scale "
            f"to integers (e.g. round(w * 10000)) or cast to "
            f"decimal(18,0) upstream"
        )
    g = [F.col(c) for c in group_cols]
    v = F.col(value_col)
    w = df.select(
        *group_cols,
        v.alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
    ).filter(v.isNotNull() & (F.col("_w") > 0))
    b = w.groupBy(
        *group_cols, F.floor(F.col("_v") / F.lit(bucket_width)).alias("_b")
    ).agg(F.sum("_w").alias("_bw"))
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*group_cols)
    cum = b.select(
        *group_cols,
        "_b",
        (F.sum("_bw").over(w_cum) - F.col("_bw")).alias("_prev"),
        F.sum("_bw").over(w_cum).alias("_cum"),
        F.sum("_bw").over(w_tot).alias("_tot"),
    )
    # exactly one bucket per group: cumulative weight crosses _tot/2
    # inside it (2*_cum >= _tot first holds here)
    sel = cum.filter(
        (2 * F.col("_cum") >= F.col("_tot"))
        & (2 * F.col("_prev") < F.col("_tot"))
    ).select(*group_cols, "_b", "_prev", "_tot")
    w_in = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit = (
        _ns_broadcast_join(
            w.withColumn("_b", F.floor(F.col("_v") / F.lit(bucket_width))),
            sel,
            [*group_cols, "_b"],
        )
        .withColumn("_c", F.col("_prev") + F.sum("_w").over(w_in))
        .filter(2 * F.col("_c") >= F.col("_tot"))
    )
    return hit.groupBy(*group_cols).agg(F.min("_v").alias(med_alias))
