"""SCD2 (slowly-changing-dimension, type 2) merge.

The reference's upsert (``lambda.py:176-181``) is SCD type 1: the new
row silently overwrites the old and history is lost.  Warehouses built
on the same ingest almost always need the type-2 form — keep every
historical version with a validity interval and an ``is_current`` flag.
This operator is the history-preserving sibling of
``operators.upsert.upsert_keep_last``.

Semantics per batch row (one row per key; pre-dedup a multi-version
batch with ``dedup_keep_last`` on the effective timestamp):

- key exists, tracked attributes changed, effective timestamp at or
  after the open row's ``valid_from`` → close the open row
  (``valid_to = effective``, ``is_current = false``) and insert a new
  open row;
- key exists, attributes changed, but effective timestamp BEFORE the
  open row's ``valid_from`` → ignored (a late/replayed delivery;
  applying it would invert the interval and resurrect older
  attributes as current — late corrections need an interval rebuild);
- key exists, attributes identical (null-safe) → no-op;
- new key → insert an open row;
- closed history rows pass through untouched.

Scale: one hash shuffle of the OPEN slice + the batch on the key
(history rows are filter-pruned, never shuffled); change detection is a
null-safe struct comparison codegen'd JVM-side.  On a real lake the
open/closed split should be a partition column so the merge reads only
open files — same pruning argument as the upsert (SURVEY §7.5.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Merge ``batch`` (keys + attrs + ``effective`` timestamp/date
    column) into an SCD2 ``current`` table (keys + attrs + validity
    columns).  ``current=None`` bootstraps: every batch row opens.

    Output columns: ``keys + attrs + [valid_from, valid_to, is_current]``.
    """
    out_cols = keys + attrs + [valid_from, valid_to, is_current]

    b = batch.select(
        *keys,
        *[F.col(a).alias(f"_new_{a}") for a in attrs],
        F.col(effective).alias("_eff"),
    )
    if current is None:
        return b.select(
            *keys,
            *[F.col(f"_new_{a}").alias(a) for a in attrs],
            F.col("_eff").alias(valid_from),
            F.lit(None).cast(b.schema["_eff"].dataType).alias(valid_to),
            F.lit(True).alias(is_current),
        )

    # NULL flags route to HISTORY (pass-through), never to the void: a
    # row whose is_current was never stamped (schema-evolved or
    # hand-backfilled table) fails BOTH a `flag` filter and a `~flag`
    # filter — it would silently vanish from the merged table, against
    # the "closed history rows pass through untouched" contract.
    hist = current.filter(~F.coalesce(F.col(is_current), F.lit(False)))
    open_rows = current.filter(F.coalesce(F.col(is_current), F.lit(False)))

    # Explicit presence markers: using valid_from/_eff IS NOT NULL as
    # the sentinel would silently DROP an open row whose valid_from is
    # NULL (bootstrap from a batch with a NULL effective timestamp) —
    # the full-outer join can't distinguish "no row" from "row with
    # NULL sentinel column".  The key join is NULL-SAFE: a plain
    # equi-join never matches NULL keys, so a NULL-keyed open row and
    # every NULL-keyed batch row would land UNMATCHED — each batch
    # inserting one more simultaneously-open row for the key and never
    # closing the old one.
    left = open_rows.withColumn("_has_old", F.lit(True))
    right = b.withColumn("_has_new", F.lit(True)).select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[c for c in b.columns if c not in keys],
        "_has_new",
    )
    from functools import reduce

    cond = reduce(
        Column.__and__,
        [F.col(k).eqNullSafe(F.col(f"_bk_{k}")) for k in keys],
    )
    j = left.join(right, cond, "full_outer").select(
        # coalesce the two key copies: an unmatched batch row carries
        # its key only in the _bk_ columns
        *[
            F.coalesce(F.col(k), F.col(f"_bk_{k}")).alias(k)
            for k in keys
        ],
        *[c for c in left.columns if c not in keys],
        *[c for c in right.columns if not c.startswith("_bk_")],
    )
    old_struct = F.struct(*[F.col(a) for a in attrs])
    new_struct = F.struct(*[F.col(f"_new_{a}").alias(a) for a in attrs])
    has_old = F.coalesce(F.col("_has_old"), F.lit(False))
    has_new = F.coalesce(F.col("_has_new"), F.lit(False))
    # Event-time last-writer-wins: a matched batch row whose _eff
    # PRECEDES the open row's valid_from is a late or replayed
    # delivery — applying it would close the open row with
    # valid_to < valid_from (an inverted interval) and resurrect the
    # OLDER attributes as current.  It is ignored instead (the open
    # row already supersedes it); late corrections need an interval
    # rebuild, not this merge.  NULL on either side (bootstrap rows,
    # null effective timestamps) keeps the old accept-the-batch
    # behavior.
    newer = F.coalesce(
        F.col("_eff") >= F.col(valid_from), F.lit(True)
    )
    changed = (
        has_old & has_new & ~old_struct.eqNullSafe(new_struct) & newer
    )

    # Surviving old rows: unmatched keys keep their open row; matched-but-
    # unchanged keys keep theirs; changed keys get theirs closed.
    kept_old = j.filter(has_old).select(
        *keys,
        *attrs,
        F.col(valid_from),
        F.when(changed, F.col("_eff")).otherwise(F.col(valid_to)).alias(valid_to),
        F.when(changed, F.lit(False)).otherwise(F.col(is_current)).alias(is_current),
    )
    # New open rows: changed keys + brand-new keys.
    opened = j.filter(has_new & (changed | ~has_old)).select(
        *keys,
        *[F.col(f"_new_{a}").alias(a) for a in attrs],
        F.col("_eff").alias(valid_from),
        F.lit(None).cast(b.schema["_eff"].dataType).alias(valid_to),
        F.lit(True).alias(is_current),
    )
    return (
        hist.select(*out_cols)
        .unionByName(kept_old.select(*out_cols))
        .unionByName(opened.select(*out_cols))
    )
