"""Keyed dedup / upsert semantics (reference lambda.py:176-181):
keep-last winner, idempotency, incoming-beats-existing."""

from pyspark.sql import functions as F

from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
    dedup_exact,
    dedup_keep_last,
    duplicate_groups,
)
from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.upsert import (
    upsert_keep_last,
)


def test_dedup_keep_last_picks_ordered_winner(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")],
        "key long, ver long, val string",
    )
    out = dedup_keep_last(df, ["key"], [F.col("ver").desc()])
    got = {r["key"]: r["val"] for r in out.collect()}
    assert got == {1: "new", 2: "only"}


def test_upsert_incoming_wins_and_is_idempotent(spark):
    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "uuid long, val string"
    )
    batch = spark.createDataFrame(
        [(2, "B"), (4, "D")], "uuid long, val string"
    )
    merged = upsert_keep_last(existing, batch, ["uuid"])
    got = {r["uuid"]: r["val"] for r in merged.collect()}
    # Overlapping key takes the batch value (keep-last, README.md:141-145)
    assert got == {1: "a", 2: "B", 3: "c", 4: "D"}
    # Replay: merging the same batch again changes nothing.
    again = upsert_keep_last(merged, batch, ["uuid"])
    assert {r["uuid"]: r["val"] for r in again.collect()} == got


def test_upsert_none_existing(spark):
    batch = spark.createDataFrame([(1, "x")], "uuid long, val string")
    out = upsert_keep_last(None, batch, ["uuid"])
    assert out.collect()[0]["val"] == "x"


def test_upsert_multirow_batch_orders_within_batch(spark):
    existing = spark.createDataFrame([(1, 0, "old")], "k long, ts long, v string")
    batch = spark.createDataFrame(
        [(1, 5, "mid"), (1, 9, "latest")], "k long, ts long, v string"
    )
    out = upsert_keep_last(existing, batch, ["k"], [F.col("ts").desc()])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["v"] == "latest"


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(10, "same"), (20, "same"), (30, "other")], "id long, text string"
    )
    out = dedup_exact(df, ["text"], "id")
    assert sorted(r["id"] for r in out.collect()) == [10, 30]
    groups = {r["keep_id"]: r["dup_count"] for r in
              duplicate_groups(df, ["text"], "id").collect()}
    assert groups == {10: 2, 30: 1}


def test_scd2_merge_lifecycle(spark):
    """Bootstrap → change → idempotent replay → second change: history
    accumulates, exactly one open row per key at every step."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.scd2 import (
        scd2_merge,
    )
    from pyspark.sql import functions as F

    def batch(rows, eff):
        return spark.createDataFrame(
            [(k, v, eff) for k, v in rows], "k long, seg string, eff string"
        ).withColumn("eff", F.col("eff").cast("date"))

    t0 = scd2_merge(None, batch([(1, "A"), (2, "B")], "2020-01-01"),
                    ["k"], ["seg"], "eff")
    assert {(r["k"], r["seg"], r["is_current"]) for r in t0.collect()} == {
        (1, "A", True), (2, "B", True)
    }

    # k=1 changes to C; k=2 unchanged; k=3 new.
    t1 = scd2_merge(t0, batch([(1, "C"), (2, "B"), (3, "D")], "2021-06-15"),
                    ["k"], ["seg"], "eff")
    rows1 = {(r["k"], r["seg"], str(r["valid_to"]), r["is_current"])
             for r in t1.collect()}
    assert rows1 == {
        (1, "A", "2021-06-15", False),
        (1, "C", "None", True),
        (2, "B", "None", True),
        (3, "D", "None", True),
    }

    # Replaying the same batch is a no-op (change detection).
    t2 = scd2_merge(t1, batch([(1, "C"), (2, "B"), (3, "D")], "2021-06-15"),
                    ["k"], ["seg"], "eff")
    assert sorted(map(tuple, t2.collect())) == sorted(map(tuple, t1.collect()))

    # Second change on k=1: two closed rows of history remain.
    t3 = scd2_merge(t2, batch([(1, "E")], "2022-01-01"), ["k"], ["seg"], "eff")
    k1 = sorted(
        (str(r["valid_from"]), str(r["valid_to"]), r["seg"], r["is_current"])
        for r in t3.filter(F.col("k") == 1).collect()
    )
    assert k1 == [
        ("2020-01-01", "2021-06-15", "A", False),
        ("2021-06-15", "2022-01-01", "C", False),
        ("2022-01-01", "None", "E", True),
    ]
    per_key_open = (
        t3.filter("is_current").groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in per_key_open)

    # Late/replayed delivery: a batch whose effective date PRECEDES the
    # open row's valid_from is ignored — applying it would close the
    # open row with valid_to < valid_from (an inverted interval) and
    # resurrect the older attributes as current.
    t4 = scd2_merge(t3, batch([(1, "Z")], "2020-06-01"),
                    ["k"], ["seg"], "eff")
    assert sorted(map(tuple, t4.collect())) == sorted(map(tuple, t3.collect()))


def test_shuffle_export_deterministic_balanced_permutation(spark, sf_dir):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
        shuffle_export,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.readers import (
        read_table,
    )
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    out = shuffle_export(docs, "doc_id", n_shards=8, seed=42)
    rows = out.collect()
    n = docs.count()
    assert len(rows) == n  # permutation: every row exactly once
    assert len({r["doc_id"] for r in rows}) == n

    # Deterministic across recomputation and repartitioning.
    again = shuffle_export(docs.repartition(13), "doc_id", 8, seed=42).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    # Different seed → different permutation.
    other = shuffle_export(docs, "doc_id", 8, seed=7).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))

    # Shards balanced in expectation (no shard > 3x the fair share).
    sizes = [r["count"] for r in out.groupBy("shard_id").count().collect()]
    assert len(sizes) == 8
    assert max(sizes) < 3 * (n / 8)

    # shard_pos is a dense 0..k-1 sequence per shard.
    pos_ok = out.groupBy("shard_id").agg(
        F.min("shard_pos").alias("lo"),
        F.max("shard_pos").alias("hi"),
        F.count("*").alias("c"),
    )
    for r in pos_ok.collect():
        assert r["lo"] == 0 and r["hi"] == r["c"] - 1

    # Decorrelated from ingest order: the permutation breaks doc_id
    # adjacency (few consecutive ids remain adjacent within a shard).
    w_rows = sorted(rows, key=lambda r: (r["shard_id"], r["shard_pos"]))
    adjacent = sum(
        1
        for a, b in zip(w_rows, w_rows[1:])
        if a["shard_id"] == b["shard_id"] and b["doc_id"] == a["doc_id"] + 1
    )
    assert adjacent < n * 0.05


def test_partitioned_upsert_touches_only_affected_partitions(spark, tmp_path):
    """Partition-pruned upsert: a batch confined to bucket 1 must leave
    bucket 0's files byte-identical on disk (never read or rewritten)
    while applying updates and inserts inside bucket 1."""
    import glob
    import os

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.upsert import (
        partitioned_upsert,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(20)], "k long, bucket int, val string"
    )
    partitioned_upsert(spark, path, base, ["k"], "bucket")

    def files_with_mtimes(bucket):
        return {
            f: os.path.getmtime(f)
            for f in glob.glob(f"{path}/bucket={bucket}/*.parquet")
        }

    before_b0 = files_with_mtimes(0)
    assert before_b0  # bucket 0 exists

    # Batch touches ONLY bucket 1: update k=1, insert k=101.
    batch = spark.createDataFrame(
        [(1, 1, "UPDATED"), (101, 1, "NEW")], "k long, bucket int, val string"
    )
    touched = partitioned_upsert(spark, path, batch, ["k"], "bucket")
    assert touched == [1]

    after_b0 = files_with_mtimes(0)
    assert after_b0 == before_b0  # bucket 0 untouched on disk

    out = spark.read.parquet(path)
    assert out.count() == 21
    got = {r["k"]: r["val"] for r in out.collect()}
    assert got[1] == "UPDATED" and got[101] == "NEW" and got[0] == "v0"
    # keys unique after merge
    assert out.select("k").distinct().count() == 21


def test_global_row_numbers_contiguous_and_ordered(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
        global_row_numbers,
    )
    from pyspark.sql import functions as F

    # Unsorted, multi-partition input with gaps in the key space.
    df = (
        spark.range(0, 5000)
        .select((F.col("id") * 7 % 9973).alias("k"))
        .distinct()
        .repartition(16)
    )
    n = df.count()
    out = global_row_numbers(df, "k").collect()
    assert len(out) == n
    ids = sorted(r["row_id"] for r in out)
    assert ids == list(range(n))  # contiguous 0..N-1
    by_k = sorted(out, key=lambda r: r["k"])
    assert [r["row_id"] for r in by_k] == list(range(n))  # follows key order
    # No single-partition window in the plan (the trap this avoids).
    plan = global_row_numbers(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan and "singlepartitioning" not in plan.lower()


def test_weighted_sample_properties(spark, sf_dir):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
        weighted_sample,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.readers import (
        read_table,
    )
    from pyspark.sql import functions as F

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s1 = {r["doc_id"] for r in weighted_sample(docs, "n_chars", 50, "doc_id").collect()}
    assert len(s1) == 50
    # Deterministic across runs and repartitioning.
    s2 = {
        r["doc_id"]
        for r in weighted_sample(
            docs.repartition(11), "n_chars", 50, "doc_id"
        ).collect()
    }
    assert s1 == s2
    # Seed changes the sample.
    s3 = {
        r["doc_id"]
        for r in weighted_sample(docs, "n_chars", 50, "doc_id", seed=9).collect()
    }
    assert s1 != s3
    # Weight bias: sampled docs should skew longer than the corpus
    # average (n_chars is the weight).
    corpus_avg = docs.agg(F.avg("n_chars")).first()[0]
    sample_avg = (
        docs.filter(F.col("doc_id").isin(list(s1))).agg(F.avg("n_chars")).first()[0]
    )
    assert sample_avg > corpus_avg
    # Plan: heap top-k, not a global sort.
    plan = (
        weighted_sample(docs, "n_chars", 50, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_mixture_resample_rates_and_determinism(spark):
    """Fractional repeat factors: floor(rate) copies always, plus one
    more for a deterministic frac(rate) share of keys; totals converge
    to rate * n and reruns are identical."""
    from pyspark.sql import functions as F

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
        mixture_resample,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = mixture_resample(df, F.lit(2.25), "k").collect()
    copies = {r["k"]: r["n_copies"] for r in out}
    assert set(copies.values()) <= {2, 3}
    total = sum(copies.values())
    # expectation 2000 * 2.25 = 4500; md5 buckets are uniform, allow 5%
    assert abs(total - 4500) < 225
    # pure downsample: rate 0.5 keeps ~half with 0/1 copies
    down = mixture_resample(df, F.lit(0.5), "k").collect()
    dcopies = [r["n_copies"] for r in down]
    assert set(dcopies) <= {0, 1}
    assert abs(sum(dcopies) - 1000) < 100
    # determinism
    again = {r["k"]: r["n_copies"] for r in mixture_resample(
        df, F.lit(2.25), "k"
    ).collect()}
    assert again == copies


def test_bloom_filter_contract(spark):
    """Bloom membership: ZERO false negatives (every seen key probes
    possibly_seen), definitely-new keys are genuinely absent, and on a
    generously-sized filter (m = 16n, k = 7) unseen keys are mostly
    not flagged."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.bloom import (
        build_bloom,
        probe_bloom,
    )

    seen = spark.range(0, 2000).select(F.col("id").alias("k"))
    batch = spark.range(1000, 4000).select(F.col("id").alias("k"))
    m = 16 * 2000
    words = build_bloom(seen, "k", m, 7)
    out = probe_bloom(batch, words, "k", m, 7)
    rows = {r["k"]: r["possibly_seen"] for r in out.collect()}
    assert len(rows) == 3000
    # no false negatives: 1000..1999 were seen
    assert all(rows[k] for k in range(1000, 2000))
    # unseen keys flagged at ~fp rate: far fewer than 10%
    fps = sum(1 for k in range(2000, 4000) if rows[k])
    assert fps < 200, f"false positives way over bound: {fps}"


def test_bloom_incremental_merge_across_batches(spark):
    """Folding batch 2's words into batch 1's filter (bit_or merge) is
    equivalent to building over the union — and the merged filter keeps
    the zero-false-negative guarantee across both batches."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.bloom import (
        build_bloom,
        merge_bloom_words,
        probe_bloom,
    )

    m = 16 * 3000
    b1 = spark.range(0, 1500).select(F.col("id").alias("k"))
    b2 = spark.range(1500, 3000).select(F.col("id").alias("k"))
    merged = merge_bloom_words(
        build_bloom(b1, "k", m, 7), build_bloom(b2, "k", m, 7)
    )
    direct = build_bloom(b1.unionByName(b2), "k", m, 7)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0

    probe = spark.range(0, 3000).select(F.col("id").alias("k"))
    out = probe_bloom(probe, merged, "k", m, 7)
    assert out.filter(~F.col("possibly_seen")).count() == 0  # FN = 0


def test_content_fingerprint_distinguishes_null_empty_and_order(spark):
    """The fingerprint must NOT collapse (NULL,'x') / ('x',NULL) /
    ('x','') / ('','x') — concat_ws's null-skipping would have deduped
    genuinely different rows."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
        dedup_exact,
        duplicate_groups,
    )

    rows = [
        (1, None, "x"), (2, "x", None), (3, "x", ""), (4, "", "x"),
        (5, None, "x"),  # true duplicate of row 1
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    out = dedup_exact(df, ["a", "b"], "id")
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]
    groups = duplicate_groups(df, ["a", "b"], "id").collect()
    assert len(groups) == 4
    assert {g["dup_count"] for g in groups} == {1, 1, 1, 2}


def test_content_fingerprint_separator_and_sentinel_unambiguous(spark):
    """Multi-column fingerprints must not collapse rows whose VALUES
    contain the \\x01 separator at different boundaries, nor a literal
    sentinel string with NULL (review r8: joining raw values left both
    ambiguities, and dedup_exact would silently delete a non-duplicate
    row)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
        dedup_exact,
    )

    rows = [
        (1, "a\x01b", "c"),   # boundary shifted left
        (2, "a", "b\x01c"),   # boundary shifted right
        (3, "\x00N", "x"),    # literal sentinel value
        (4, None, "x"),       # genuine NULL
        (5, "a\x01b", "c"),   # true duplicate of row 1
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    out = dedup_exact(df, ["a", "b"], "id")
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]


def test_null_key_rows_bucket_deterministically(spark):
    """NULL split keys land in a real split (hash of the sentinel), not
    silently in the last split / dropped from resampling."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.dedup import (
        deterministic_split,
        mixture_resample,
    )

    df = spark.createDataFrame(
        [(None, "s")] * 10 + [(i, "s") for i in range(90)],
        "doc_id long, source string",
    )
    split = deterministic_split(df, "doc_id")
    null_splits = {
        r["split"] for r in split.filter(F.col("doc_id").isNull()).collect()
    }
    assert len(null_splits) == 1  # all NULLs in ONE deterministic split
    # resample keeps/multiplies null-key rows per the rate (n_copies
    # non-null), instead of NULL-arithmetic dropping them all
    res = mixture_resample(df, F.lit(1.0), "doc_id")
    nulls = res.filter(F.col("doc_id").isNull()).collect()
    assert len(nulls) == 10
    assert all(r["n_copies"] == 1 for r in nulls)


def test_partitioned_upsert_raises_on_broken_table(spark, tmp_path):
    """A corrupt existing table must FAIL the upsert, not be mistaken
    for a first write and dynamic-overwritten with the batch alone."""
    import os

    import pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.upsert import (
        partitioned_upsert,
    )

    path = str(tmp_path / "t")
    os.makedirs(path)
    with open(f"{path}/part-0.parquet", "wb") as fh:
        fh.write(b"corrupt footer")
    inc = spark.createDataFrame([(1, "a", 10)], "k long, p string, v long")
    with pytest.raises(Exception):
        partitioned_upsert(spark, path, inc, ["k"], "p")


def test_partitioned_upsert_merges_null_partition(spark, tmp_path):
    """A batch carrying NULL partition values must MERGE with the
    existing null partition, not replace it."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.upsert import (
        partitioned_upsert,
    )

    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 30)],
        "k long, p string, v long",
    )
    base.write.partitionBy("p").parquet(path)
    inc = spark.createDataFrame([(2, None, 99)], "k long, p string, v long")
    partitioned_upsert(spark, path, inc, ["k"], "p")
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    # k=1 survived the null-partition rewrite; k=2 updated; k=3 untouched
    assert got == {1: 10, 2: 99, 3: 30}


def test_scd2_preserves_open_row_with_null_valid_from(spark):
    """An open dimension row whose valid_from is NULL (bootstrap from a
    NULL effective timestamp) must survive the next merge — the
    IS NOT NULL presence sentinel would silently drop it."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.scd2 import (
        scd2_merge,
    )

    b1 = spark.createDataFrame(
        [("k1", "v1", None)], "k string, attr string, eff string"
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    dim = scd2_merge(None, b1, ["k"], ["attr"], "eff")
    assert dim.count() == 1 and dim.first()["valid_from"] is None
    b2 = spark.createDataFrame(
        [("k2", "v2", "2024-01-01 00:00:00")],
        "k string, attr string, eff string",
    ).withColumn("eff", F.col("eff").cast("timestamp"))
    merged = scd2_merge(dim, b2, ["k"], ["attr"], "eff")
    got = {r["k"]: r for r in merged.collect()}
    assert set(got) == {"k1", "k2"}       # k1 NOT dropped
    assert got["k1"]["is_current"] is True


def test_probe_bloom_tolerates_unmerged_union(spark):
    """probe_bloom against a raw UNION of two build_bloom outputs
    (duplicate word_idx rows) must still report zero false negatives:
    the probe folds the words bit_or-first, so the join fan-out cannot
    make sum(_hit) overshoot k_hashes (review r8)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.bloom import (
        build_bloom,
        probe_bloom,
    )

    m, k = 4096, 7
    b1 = spark.range(0, 500).select(F.col("id").alias("k"))
    b2 = spark.range(500, 1000).select(F.col("id").alias("k"))
    raw_union = build_bloom(b1, "k", m, k).unionByName(
        build_bloom(b2, "k", m, k)
    )
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    out = probe_bloom(probe, raw_union, "k", m, k)
    # every probed key WAS inserted in one of the two blooms: zero
    # false negatives allowed
    assert out.filter(~F.col("possibly_seen")).count() == 0


def test_scd2_null_keys_and_null_flags(spark):
    """SCD2 must treat a NULL key as ONE key (null-safe join — a plain
    equi-join left the old open row unclosed and inserted a new open
    row per batch), and a row whose is_current flag is NULL must pass
    through as history instead of vanishing (review r8)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.scd2 import (
        scd2_merge,
    )

    def batch(rows, eff):
        return spark.createDataFrame(
            [(k, v, eff) for k, v in rows], "k string, seg string, eff string"
        ).withColumn("eff", F.col("eff").cast("date"))

    t0 = scd2_merge(None, batch([(None, "A")], "2020-01-01"),
                    ["k"], ["seg"], "eff")
    t1 = scd2_merge(t0, batch([(None, "B")], "2021-01-01"),
                    ["k"], ["seg"], "eff")
    rows = sorted(
        (r["seg"], str(r["valid_to"]), r["is_current"])
        for r in t1.collect()
    )
    # exactly one open row; the old NULL-key row was CLOSED
    assert rows == [("A", "2021-01-01", False), ("B", "None", True)]

    # a NULL is_current row passes through as history, never vanishes
    broken = t1.unionByName(
        spark.createDataFrame(
            [("x", "Z", "2019-01-01", "2019-06-01", None)],
            "k string, seg string, valid_from string, valid_to string, "
            "is_current boolean",
        ).withColumn("valid_from", F.col("valid_from").cast("date"))
        .withColumn("valid_to", F.col("valid_to").cast("date"))
    )
    t2 = scd2_merge(broken, batch([("y", "C")], "2022-01-01"),
                    ["k"], ["seg"], "eff")
    assert t2.filter("seg = 'Z'").count() == 1
