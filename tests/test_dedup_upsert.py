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
