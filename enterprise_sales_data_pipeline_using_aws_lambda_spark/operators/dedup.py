"""Deduplication operators.

The reference's only dedup is keyed keep-last over a concatenation
(``drop_duplicates(subset=['uuid'], keep='last')``, reference
``lambda.py:179-180``) where the *winner is positional* — last occurrence
in concat order.  Positional order does not exist under parallelism, so
:func:`dedup_keep_last` demands an explicit ordering (SURVEY §7.5.1).

Exact content dedup (hash group-by) is here too; fuzzy dedup (MinHash-LSH,
SimHash, n-gram Jaccard) lives in ``text_dedup.py`` since it composes the
shingling machinery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .materialize import materialize


def dedup_keep_last(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by`` DESC-style
    ordering supplied by the caller (pass e.g. ``[F.col('ts').desc(),
    F.col('id').desc()]`` for deterministic keep-latest).

    Spark mapping of reference A2 (``lambda.py:180``): a hash-partition on
    the keys + per-partition sort — one shuffle, no global sort.  With AQE
    the shuffle is skew-split automatically; for repeated use against the
    same key set, bucket the table on the key to eliminate the shuffle.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def content_fingerprint(content_cols: list[str]):
    """Canonical content encoding for exact dedup.

    Single column (the oracle-facing form): plain ``md5(col)`` with a
    NULL sentinel — exactly what the DuckDB oracles recompute (the
    ``dedup_exact_docs`` gate hash-matches on it).  Residual there: a
    value literally equal to the sentinel collides with NULL —
    irrelevant for text corpora, and the multi-column form below does
    not have it.

    Multiple columns: md5 over \\x01-joined per-column TAGGED DIGESTS
    (``N`` for NULL, ``V`` + md5(value) otherwise).  Joining raw
    values would leave column boundaries ambiguous — ('a\\x01b','c')
    and ('a','b\\x01c') would encode identically and dedup_exact would
    silently DELETE a non-duplicate row — and ``concat_ws`` alone
    additionally skips nulls, conflating (NULL,'x')/('x',NULL)/('x','').
    Fixed-width digests over a \\x01-free alphabet make every boundary
    unambiguous, and the N/V tag separates NULL from any real value
    with no sentinel to collide with.

    BREAKING (round 8) for multi-column callers: the encoding changed
    from \\x01-joined coalesced raw values to the tagged per-column
    digests above, so multi-column fingerprints computed under the old
    scheme no longer match ones computed now.  Verified at the change:
    nothing in this repo persists multi-column fingerprints (the
    single-column form, which the ``dedup_exact_docs`` oracle
    recomputes as plain ``md5(col)``, is unchanged) and no oracle SQL
    replays the old concat_ws form.  External callers comparing
    against STORED multi-column fingerprints must recompute them once
    with this version."""
    if len(content_cols) == 1:
        return F.md5(
            F.coalesce(
                F.col(content_cols[0]).cast("string"), F.lit("\x00N")
            )
        )
    enc = [
        F.when(F.col(c).isNull(), F.lit("N")).otherwise(
            F.concat(F.lit("V"), F.md5(F.col(c).cast("string")))
        )
        for c in content_cols
    ]
    return F.md5(F.concat_ws("\x01", *enc))


def dedup_exact(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    keep: str = "min",
) -> DataFrame:
    """Exact-content dedup: one surviving row per distinct content.

    Content identity is :func:`content_fingerprint` (hash group-by — map-side partial aggregation means
    the shuffle carries one row per distinct hash per partition, not the
    full table).  The survivor is the min (or max) ``id_col`` — a
    deterministic choice, unlike ``dropDuplicates`` which keeps an
    arbitrary row.  Returns the surviving rows with original columns.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    fingerprint = content_fingerprint(content_cols)
    survivors = (
        df.withColumn("_fp", fingerprint)
        .groupBy("_fp")
        .agg(agg.alias(id_col))
        .select(id_col)
    )
    # Semi join back to recover full rows; broadcast when small.
    return df.join(survivors, on=id_col, how="left_semi")


def duplicate_groups(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Report exact-duplicate clusters: ``fingerprint, dup_count, keep_id``
    for every content value, ordered-insensitive.  The oracle-facing view
    of :func:`dedup_exact` (same :func:`content_fingerprint`)."""
    fingerprint = content_fingerprint(content_cols)
    return (
        df.withColumn("_fp", fingerprint)
        .groupBy(F.col("_fp").alias("fingerprint"))
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
    )


def shuffle_export(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data export.

    Training runs need corpus order decorrelated from ingest order (SGD
    convergence) yet reproducible across re-exports.  Both come from
    ordering by a seeded hash instead of rand(): ``xxhash64(key, seed)``
    gives a uniform pseudo-random permutation that is stable under
    retries, re-runs, and repartitioning — rand() is none of those.

    Output adds ``shard_id`` (hash-assigned, balanced in expectation)
    and ``shard_pos`` (position within the shard in hash order).  Write
    with ``.repartition("shard_id").sortWithinPartitions("shard_pos")``
    + ``partitionBy("shard_id")`` and each shard file IS the shuffled
    stream — one shuffle total, no global sort (the permutation only
    needs to be consistent per shard, and shard assignment is already
    random).

    ``key_col`` itself tie-breaks the within-shard order, so two
    DISTINCT keys that collide in xxhash64 still order deterministically
    across re-exports.  Rows sharing the same ``key_col`` value have no
    stable identity to order by — pass a unique key (doc id), not a
    content column with duplicates."""
    h = F.xxhash64(F.col(key_col), F.lit(seed))
    w = Window.partitionBy("shard_id").orderBy("_shuffle_key", key_col)
    return (
        df.withColumn("_shuffle_key", h)
        .withColumn(
            "shard_id", F.pmod(F.col("_shuffle_key"), F.lit(n_shards)).cast("int")
        )
        .withColumn("shard_pos", F.row_number().over(w) - 1)
        .drop("_shuffle_key")
    )


def global_row_numbers(
    df: DataFrame, order_col: str, out_col: str = "row_id"
) -> DataFrame:
    """Contiguous global row ids 0..N-1 in ``order_col`` order — WITHOUT
    the single-partition trap.

    The naive ``row_number().over(Window.orderBy(order_col))`` drags the
    entire dataset through ONE task (Spark even warns).  Scalable form:

    1. range-repartition on ``order_col`` (partition p holds a disjoint,
       ordered slice);
    2. count rows per partition (a |partitions|-sized aggregate);
    3. prefix-sum the counts driver-side into per-partition offsets;
    4. broadcast offsets back; id = offset[p] + local row_number within
       the partition.

    Every step is partition-parallel; the only global object is the
    |partitions|-length offset array.  Requires ``order_col`` values
    unique (ties would make ids nondeterministic across runs)."""
    # Materialize the partitioned snapshot: the counts pass and the
    # numbering pass MUST see identical partition boundaries (range
    # sampling is deterministic in Spark, but pinning the snapshot makes
    # the invariant independent of that implementation detail and saves
    # a recompute).
    part_df = (
        df.repartitionByRange(F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    part_df = materialize(part_df)
    counts = (
        part_df.groupBy("_pid").count().orderBy("_pid").collect()
    )
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        part_df.join(F.broadcast(off_df), "_pid")
        .withColumn(out_col, F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_pid", "_offset")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Weighted random sample WITHOUT replacement of k rows, one pass,
    no global sort — Efraimidis-Spirakis A-ES with deterministic
    pseudo-randomness.

    Each row gets priority ``u^(1/w)`` where u is a uniform(0,1] derived
    from ``xxhash64(key, seed)`` and w its weight; the k highest
    priorities ARE a weighted sample without replacement.  Selection
    runs as TakeOrderedAndProject (per-partition k-heaps, no shuffle of
    the full data), and the hash-derived u makes the sample reproducible
    across runs/retries/repartitioning — the property rand() cannot give
    an exactly-once export pipeline.

    Quality-weighted corpus subsampling is the canonical use: w = a
    quality score, and high-quality docs are proportionally favored
    while every doc keeps nonzero probability."""
    # uniform in (0, 1]: map hash to [0, 2^63) then shift to (0,1]
    u = (
        F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(2**62)).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**62))
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1e-12))
    priority = F.pow(u, 1.0 / w)
    return (
        df.withColumn("_priority", priority)
        .orderBy(F.desc("_priority"), F.asc(key_col))
        .limit(k)
        .drop("_priority")
    )


def md5_bucket(key, seed: int = 0, buckets: int = 1000):
    """Engine-portable uniform bucket in [0, buckets): the first six hex
    digits of ``md5(seed:key)`` as an integer, mod ``buckets``.  md5 is
    bit-identical everywhere (unlike murmur/xxhash availability), so any
    stack reproduces the bucket from the spec alone — the primitive
    behind :func:`deterministic_split` and :func:`mixture_resample`.

    NULL keys hash the sentinel ``\\x00NULL`` instead of propagating
    NULL through concat→md5→bucket — a NULL bucket would silently drop
    null-key rows from :func:`mixture_resample` (NULL arithmetic) and
    dump them all into :func:`deterministic_split`'s last split (every
    ``when`` false).  Non-null keys are hashed exactly as before (the
    engine-portable spec oracles recompute)."""
    hexd = F.md5(
        F.concat(
            F.lit(f"s{seed}:"),
            F.coalesce(key.cast("string"), F.lit("\x00NULL")),
        )
    )
    val = F.lit(0).cast("long")
    for i in range(1, 7):
        digit = F.instr(F.lit("0123456789abcdef"), F.substring(hexd, i, 1)) - 1
        val = val * 16 + digit
    return F.pmod(val, F.lit(buckets))


def deterministic_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    seed: int = 0,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed key — the split
    rule a training-data pipeline needs: stable across runs, retries,
    repartitioning, AND engines (the same row lands in the same split
    when the pipeline is re-run on a different stack), with zero
    coordination — no global sort, no shuffle, no state; assignment is a
    pure projection fused into the scan.

    The bucket is derived from the hex digits of ``md5(seed:key)`` —
    md5 is bit-identical in every engine (unlike murmur/xxhash
    availability), so an external system can reproduce the split from
    the spec alone.  Six hex digits give 16^6 = 16.7M values, uniform
    mod ``buckets``; cumulative weight thresholds map buckets to split
    names.  Stratification is the hash-proportional kind used in
    practice: a uniform hash splits every stratum to the target
    fractions in expectation with no per-stratum bookkeeping (exact
    per-stratum quotas would require a per-stratum rank — a corpus-wide
    ordered shuffle this operator exists to avoid)."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = md5_bucket(F.col(key_col), seed, buckets)
    total = sum(weights.values())
    expr, acc = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    split = (expr.otherwise(F.lit(names[-1]))
             if expr is not None else F.lit(names[-1]))
    return df.withColumn("bucket", bucket.cast("long")).withColumn("split", split)


def mixture_resample(
    df: DataFrame,
    rate,
    key_col: str,
    seed: int = 1,
    buckets: int = 1000,
) -> DataFrame:
    """Domain-mixture resampling: each row gets a deterministic copy
    count realizing a fractional repeat ``rate`` (the data-mixing step
    that applies per-domain weights — downsample boilerplate-heavy web
    text, upsample rare high-quality sources; DoReMi et al. tune the
    rates, THIS op applies them).

    ``n_copies = floor(rate) + 1{md5_bucket(key) < frac(rate)·buckets}``
    — so a rate of 2.25 yields 2 copies always plus a third for a
    deterministic 25% of keys: exactly-reproducible expected-rate
    resampling with zero coordination, no RNG state, and stability
    across runs/retries/engines (the md5 spec).  ``rate`` is a Column
    (derive it from the source/domain column); output adds ``n_copies``
    — expand with ``explode(array_repeat(lit(1), n_copies))`` when
    materializing shards (NOT ``sequence(1, n_copies)``: Spark's
    sequence steps -1 when start > stop, so n_copies=0 — the
    downsample case — would yield [1, 0] and DUPLICATE the very rows
    the rate meant to drop; array_repeat with 0 explodes to nothing),
    or keep it as a weight for weighted training."""
    r = rate.cast("double")
    whole = F.floor(r).cast("long")
    frac_th = F.round((r - F.floor(r)) * buckets).cast("long")
    extra = (
        md5_bucket(F.col(key_col), seed, buckets) < frac_th
    ).cast("long")
    return df.withColumn("n_copies", whole + extra)
