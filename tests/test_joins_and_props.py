"""Join-strategy helpers + hypothesis property tests for the upsert and
validation invariants (SURVEY §5.2 property-based checks)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.joins import (
    broadcast_join,
    salted_join,
)
from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.upsert import (
    upsert_keep_last,
)


def test_broadcast_join_plan_has_no_fact_shuffle(spark):
    fact = spark.range(0, 10000).withColumn("k", F.col("id") % 10)
    dim = spark.range(0, 10).withColumnRenamed("id", "k").withColumn(
        "name", F.concat(F.lit("d"), F.col("k"))
    )
    out = broadcast_join(fact, dim, ["k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 10000


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows share one hot key — the salted join must produce
    # exactly the same multiset of rows as a plain join.
    fact = spark.range(0, 5000).withColumn(
        "k", F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100)
    )
    dim = spark.range(0, 100).withColumnRenamed("id", "k").withColumn(
        "v", F.col("k") * 10
    )
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, "k", salt_buckets=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


@st.composite
def keyed_rows(draw):
    n = draw(st.integers(min_value=0, max_value=12))
    return [
        (
            draw(st.integers(min_value=0, max_value=5)),
            draw(st.integers(min_value=0, max_value=100)),
        )
        for _ in range(n)
    ]


@settings(max_examples=12, deadline=None)
@given(existing=keyed_rows(), batch=keyed_rows())
def test_upsert_properties(spark, existing, batch):
    """For any existing table and batch: (1) result is unique per key,
    (2) every batch key carries the batch's winning value, (3) non-batch
    keys keep the existing winner, (4) replay is a no-op."""
    sch = "k long, v long"
    e = spark.createDataFrame(existing, sch) if existing else None
    if e is not None:
        # normalize existing to unique-per-key (table invariant)
        e = upsert_keep_last(None, e, ["k"], [F.col("v").desc()])
    b = spark.createDataFrame(batch, sch) if batch else None
    if b is None:
        return
    merged = upsert_keep_last(e, b, ["k"], [F.col("v").desc()])
    rows = merged.collect()
    keys = [r["k"] for r in rows]
    assert len(keys) == len(set(keys))
    batch_best = {}
    for k, v in batch:
        batch_best[k] = max(v, batch_best.get(k, -1))
    exist_best = {}
    for k, v in existing:
        exist_best[k] = max(v, exist_best.get(k, -1))
    for r in rows:
        if r["k"] in batch_best:
            assert r["v"] == batch_best[r["k"]]
        else:
            assert r["v"] == exist_best[r["k"]]
    replay = upsert_keep_last(merged, b, ["k"], [F.col("v").desc()])
    assert sorted(map(tuple, replay.collect())) == sorted(map(tuple, rows))
