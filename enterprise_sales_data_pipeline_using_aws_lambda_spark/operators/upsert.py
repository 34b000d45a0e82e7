"""Keyed upsert (merge) — the reference's idempotent reprocessing core.

Reference semantics (``lambda.py:176-181``, ``README.md:141-145``): read
the whole target table, concatenate the incoming batch after it, and
``drop_duplicates(subset=['uuid'], keep='last')`` — i.e. incoming rows
beat existing rows, and re-running the same batch is a no-op.

That is a MERGE: ``target LEFT ANTI JOIN batch ON key ∪ batch``.  The
anti-join formulation only shuffles on the key and, when the batch is
small relative to the target (the normal case), Spark broadcasts the
batch's key set — the target is **never rewritten through a sort** and,
with a partitioned/bucketed target or Delta ``MERGE``, only affected
files are touched at 100 TB (SURVEY §7.5.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_keep_last


def upsert_keep_last(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    order_by: list[Column] | None = None,
    broadcast_keys: bool = False,
) -> DataFrame:
    """Merge ``incoming`` into ``existing``; incoming wins per key.

    If ``incoming`` may carry several rows per key, ``order_by`` picks the
    survivor *within* the batch (e.g. latest timestamp) — the positional
    tie-break the reference gets implicitly from concat order
    (``lambda.py:179-180``) made explicit and deterministic.

    ``broadcast_keys=True`` force-broadcasts the incoming key set for the
    anti-join — set it when the batch is known-small (the per-file ingest
    case); otherwise AQE picks broadcast vs shuffled join from runtime
    stats, which is the safe default for arbitrary batch sizes.
    """
    if order_by is not None:
        incoming = dedup_keep_last(incoming, keys, order_by)
    if existing is None:
        return incoming
    key_set = incoming.select(*keys).distinct()
    if broadcast_keys:
        key_set = F.broadcast(key_set)
    keep_old = existing.join(key_set, on=keys, how="left_anti")
    return keep_old.unionByName(incoming)
