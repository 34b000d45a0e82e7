"""Join strategy helpers for scale (SURVEY §7.2.6).

AQE already handles moderate skew (``skewJoin.enabled``) and broadcast
selection from runtime stats; these helpers cover the two cases where
explicit control still wins at 100 TB:

- :func:`broadcast_join` — force-broadcast a dimension known to be small
  regardless of stale stats (e.g. freshly-written dims with no
  statistics).
- :func:`salted_join` — explicit key salting for *pathological* skew
  (one key holding >10% of a fact table), which AQE's split-by-size can
  mitigate but not when the straggler is a single unsplittable hash
  bucket on the build side.  Salting fans the hot key across
  ``salt_buckets`` partitions by appending a random salt to the fact
  side and exploding the dim side ``salt_buckets`` ways.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _interval_seconds(spec: str) -> int:
    """Parse '30 minutes' / '1 hour' into seconds (driver-side)."""
    num, unit = spec.strip().split()
    return int(num) * _UNIT_SECONDS[unit.lower()]


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi-join with the dim side force-broadcast: zero shuffle on the
    fact table — the plan every star-schema probe should have."""
    return fact.join(F.broadcast(dim), on, how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact rows get a uniform random salt in
    [0, salt_buckets); the dim side is replicated once per salt value, so
    the join key becomes (key, salt) and a hot key spreads over
    ``salt_buckets`` reducers.

    Cost: dim side × salt_buckets (use only when dim ≪ fact — the same
    precondition as broadcasting; salting matters when the dim is too
    big to broadcast but the fact key distribution is pathological).
    The salt is generated with a fixed per-row hash (not rand()) so
    retried tasks produce identical output — determinism under retry is
    non-negotiable for exactly-once sinks.  Consequence of that choice:
    fact rows that are IDENTICAL in every column share one salt, so a
    hot key whose rows are exact duplicates still lands on one reducer
    — add a stable per-row discriminator column (an id) upstream if
    your duplicates are genuine, or dedup first.

    ``how`` must not preserve unmatched DIM rows (right/full outer):
    the dim side is replicated once per salt, so every dim row whose
    replicas find no fact partner would surface up to ``salt_buckets``
    times — silent row inflation.  Fact-preserving flavors (inner,
    left, left_semi, left_anti) are safe: the fact side is never
    replicated, and a dim key's replica exists at EVERY salt by
    construction, so semi/anti verdicts match the unsalted join."""
    allowed = {
        "inner", "left", "leftouter", "left_outer",
        "semi", "left_semi", "leftsemi",
        "anti", "left_anti", "leftanti",
    }
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join(how={how!r}): joins that preserve unmatched "
            f"dim rows would emit one row per salt replica "
            f"(salt_buckets={salt_buckets} duplicates).  Use "
            f"{sorted(allowed)}, or salt with fact/dim swapped"
        )
    # Deterministic "salt": hash the whole fact row's key + a uniformifier
    # column if present; monotonically_increasing_id is NOT retry-stable,
    # so derive from data: xxhash64 over all columns.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    salted_fact = fact.withColumn("_salt", salt)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("_salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, [key, "_salt"], how)
    return out.drop("_salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for every left row, attach ``right_cols`` from the
    single right row with the greatest ``right_ts <= left_ts`` (backward;
    ``forward`` = smallest ``right_ts >= left_ts``) within the same
    ``on`` key group.  Unmatched left rows keep nulls (left-join
    semantics).  ``tolerance`` (e.g. ``"30 minutes"``) nulls out matches
    staler than the given interval.

    Not expressible as a Spark equi-join without an N×M inequality pair
    blowup.  Implemented as union + single window pass instead: tag both
    sides, union them, sort each key group once by (ts, side), and carry
    the last non-null right value forward with
    ``last(..., ignorenulls=True)``.  Cost: ONE shuffle+sort of |L|+|R|
    rows on the key — the same price as one sort-merge join, independent
    of match fan-out, which is what survives at 100 TB.  Skewed keys
    (one user with millions of rows) sort within a single partition;
    sub-bucket by coarse time range first if that bites.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    lcols = left.columns
    # name-collision guard: the output carries every left column plus
    # right_cols plus matched_ts — an overlap would emit duplicate
    # column names and every downstream reference would fail with
    # AMBIGUOUS_REFERENCE far from the cause
    clash = sorted(set(right_cols) & set(lcols))
    if clash:
        raise ValueError(
            f"asof_join right_cols {clash} collide with left columns; "
            f"rename one side before joining"
        )
    if "matched_ts" in lcols:
        raise ValueError(
            "asof_join emits a 'matched_ts' column; rename the left "
            "side's existing one first"
        )
    # NULL join keys never match (SQL join semantics): drop null-keyed
    # RIGHT rows up front — the window's partitionBy would otherwise
    # group null keys together and a null-keyed left row would inherit
    # attributes from an unrelated null-keyed right row
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    marked = [f"_r_{c}" for c in right_cols]
    l2 = left.select(
        *lcols,
        F.col(left_ts).alias("_evt_ts"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(m)
          for c, m in zip(right_cols, marked)],
    )
    r2 = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in on],
        *on,
        F.col(right_ts).alias("_evt_ts"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(m) for c, m in zip(right_cols, marked)],
    ).select(l2.columns)
    both = l2.unionByName(r2)

    # Backward: ascending ts, right rows (0) sort before left rows (1) at
    # equal ts, so an equal-timestamp right row IS visible to the left
    # row (inclusive match).  Forward: mirror by descending ts.  The
    # payload-hash tiebreak makes TIED right rows (same key, same ts)
    # resolve deterministically — last() over an underspecified order
    # would otherwise pick whichever tied row the shuffle happened to
    # place later, and a task retry could emit a different answer (the
    # winner among ties is arbitrary-but-stable: max payload hash).
    tie = F.asc(F.xxhash64(*[F.col(m) for m in marked]))
    if direction == "backward":
        w = Window.partitionBy(*on).orderBy(
            F.asc("_evt_ts"), F.asc("_is_left"), tie
        )
    else:
        w = Window.partitionBy(*on).orderBy(
            F.desc("_evt_ts"), F.asc("_is_left"), tie
        )
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    # Carry the matched right row as ONE struct, not per-column lasts:
    # independent last(col, ignorenulls) would skip a NULL field in the
    # true as-of row and stitch values from DIFFERENT right rows (with
    # matched_ts from yet another) — and a stale value could then pass
    # the tolerance gate checked against the fresher matched_ts.  The
    # struct is non-null exactly for right rows, so every output field
    # comes from the same (latest) right row, NULL fields included.
    carried = both.select(
        *lcols,
        "_evt_ts",
        "_is_left",
        F.last(
            F.when(
                F.col("_is_left") == 0,
                F.struct(
                    F.col("_evt_ts").alias("_rts"),
                    *[F.col(m) for m in marked],
                ),
            ),
            ignorenulls=True,
        ).over(w).alias("_rrow"),
    )
    carried = carried.select(
        *lcols,
        "_evt_ts",
        "_is_left",
        *[F.col(f"_rrow.{m}").alias(m) for m in marked],
        F.col("_rrow._rts").alias("_matched_ts"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col("_matched_ts") >= F.col("_evt_ts") - F.expr(
                f"INTERVAL {tolerance}"
            )
        else:
            fresh = F.col("_matched_ts") <= F.col("_evt_ts") + F.expr(
                f"INTERVAL {tolerance}"
            )
        out = out.select(
            *lcols,
            *[F.when(fresh, F.col(m)).alias(m) for m in marked],
            F.when(fresh, F.col("_matched_ts")).alias("_matched_ts"),
        )
    renames = dict(zip(marked, right_cols))
    return out.select(
        *lcols,
        *[F.col(m).alias(renames[m]) for m in marked],
        F.col("_matched_ts").alias("matched_ts"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Range (interval-overlap) join with NO equi-key: pair every point
    with every interval where ``start <= point_ts < end``.

    A naive inequality join is a cartesian product that Catalyst can only
    plan as BroadcastNestedLoopJoin — O(|P|·|I|) comparisons.  This
    implementation manufactures an equi-key from time: timestamps are
    floored to fixed ``bucket`` widths; each interval is exploded to
    every bucket it overlaps, each point maps to exactly one bucket, and
    the join becomes a hash equi-join on the bucket id with the exact
    range predicate as a residual filter.  Cost scales with
    |P| + |I|·(avg interval span / bucket) + true matches.  Pick
    ``bucket`` ≈ the typical interval length: too small multiplies the
    interval side, too large degrades bucket selectivity.
    """
    width = F.lit(_interval_seconds(bucket))
    p = points.withColumn(
        "_bucket",
        F.floor(F.unix_timestamp(F.col(point_ts)) / width).cast("long"),
    )
    sb = F.floor(F.unix_timestamp(F.col(start_col)) / width).cast("long")
    eb = F.floor(F.unix_timestamp(F.col(end_col)) / width).cast("long")
    # INVERTED intervals (start > end — a corrupt row) explode to zero
    # buckets: Spark's sequence would otherwise step -1 and emit the
    # FULL descending bucket range (one swapped 1970 bound ≈ 473k rows
    # per bad row through the shuffle, all discarded by the residual
    # filter) — the "cost scales with interval span" contract must
    # hold for malformed spans too.
    i = intervals.withColumn(
        "_bucket",
        F.explode(
            F.when(sb <= eb, F.sequence(sb, eb)).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    joined = p.join(i, "_bucket").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_bucket")
