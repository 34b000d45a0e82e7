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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    non-negotiable for exactly-once sinks."""
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
