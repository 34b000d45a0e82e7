"""Validation operator tests — reference V1–V4 semantics
(reference lambda.py:81-121), one passing and one failing fixture per
rule (SURVEY §5.2)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.validate import (
    row_rules_sales,
    rule_violation_counts,
    validate_batch,
    validate_rows,
)


def test_valid_batch_passes_and_casts_dates(sales_df):
    res = validate_batch(sales_df)
    assert res.ok
    dtypes = dict(res.df.dtypes)
    # Successful validation casts date columns (lambda.py:107 behavior).
    assert dtypes["OrderDate"] == "date"
    assert dtypes["ShipDate"] == "date"
    d = res.df.filter(F.col("uuid") == 3).first()
    assert str(d["OrderDate"]) == "2016-12-31"


def test_missing_column_detected(sales_df):
    res = validate_batch(sales_df.drop("TotalProfit"))
    assert not res.ok
    assert any("Missing columns" in e and "TotalProfit" in e for e in res.errors)


def test_non_numeric_dtype_detected(sales_df):
    broken = sales_df.withColumn("UnitsSold", F.col("UnitsSold").cast("string"))
    res = validate_batch(broken)
    assert any("UnitsSold" in e and "numeric" in e for e in res.errors)


def test_bad_date_detected(sales_df):
    broken = sales_df.withColumn(
        "OrderDate",
        F.when(F.col("uuid") == 1, F.lit("2016-03-24")).otherwise(
            F.col("OrderDate")
        ),
    )
    res = validate_batch(broken)
    assert any("Invalid date format" in e and "OrderDate" in e for e in res.errors)


def test_duplicate_uuid_detected(sales_df):
    dup = sales_df.unionByName(sales_df.limit(1))
    res = validate_batch(dup)
    assert any("Duplicate uuid" in e for e in res.errors)


def test_all_errors_reported_together(sales_df):
    broken = (
        sales_df.drop("Region")
        .withColumn("UnitPrice", F.col("UnitPrice").cast("string"))
    )
    res = validate_batch(broken)
    assert len(res.errors) >= 2


def test_row_level_split_and_reason(spark, sales_df):
    broken = sales_df.withColumn(
        "ShipDate",
        F.when(F.col("uuid") == 2, F.lit("not-a-date")).otherwise(
            F.col("ShipDate")
        ),
    )
    valid, quarantined = validate_rows(broken, row_rules_sales())
    assert valid.count() == 4
    bad = quarantined.collect()
    assert len(bad) == 1
    assert bad[0]["uuid"] == 2
    assert "bad_date_ShipDate" in bad[0]["_error_reason"]


def test_rule_violation_counts_single_scan(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 200.0)], "id long, v double"
    )
    out = rule_violation_counts(
        df, {"negative": F.col("v") < 0, "too_big": F.col("v") > 100}
    )
    got = {r["rule"]: r["violations"] for r in out.collect()}
    assert got == {"negative": 1, "too_big": 1}


def test_duplicate_null_keys_fail_validation(spark):
    """count/count_distinct skip NULLs; two NULL uuids must still fail
    V4 (pandas Series.is_unique counts repeated NaN as duplicates)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.validate import (
        validate_batch,
    )

    base = {c: "1" for c in
            ("Country", "ItemType", "SalesChannel", "OrderPriority",
             "Region")}
    rows = [
        {"uuid": None, "OrderDate": "1/2/2024", "ShipDate": "1/5/2024",
         "UnitsSold": 1, "UnitPrice": 1.0, "UnitCost": 1.0,
         "TotalRevenue": 1.0, "TotalCost": 1.0, "TotalProfit": 0.0,
         **base},
    ] * 2 + [
        {"uuid": "u3", "OrderDate": "1/2/2024", "ShipDate": "1/5/2024",
         "UnitsSold": 1, "UnitPrice": 1.0, "UnitCost": 1.0,
         "TotalRevenue": 1.0, "TotalCost": 1.0, "TotalProfit": 0.0,
         **base},
    ]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(rows))
    res = validate_batch(df)
    assert not res.ok
    assert any("Duplicate uuid" in e for e in res.errors)


def test_row_rules_accept_null_dates(spark):
    """Streaming row rules must match batch V3: a NULL date passes (only
    a non-null unparseable value violates)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.validate import (
        row_rules_sales,
        validate_rows,
    )

    import pandas as pd

    base = {c: "1" for c in
            ("Country", "ItemType", "SalesChannel", "OrderPriority",
             "Region")}
    rows = [
        {"uuid": "a", "OrderDate": None, "ShipDate": "1/5/2024",
         "UnitsSold": 1, "UnitPrice": 1.0, "UnitCost": 1.0,
         "TotalRevenue": 1.0, "TotalCost": 1.0, "TotalProfit": 0.0,
         **base},
        {"uuid": "b", "OrderDate": "13/45/99", "ShipDate": "1/5/2024",
         "UnitsSold": 1, "UnitPrice": 1.0, "UnitCost": 1.0,
         "TotalRevenue": 1.0, "TotalCost": 1.0, "TotalProfit": 0.0,
         **base},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    valid, quarantined = validate_rows(df, row_rules_sales())
    assert {r["uuid"] for r in valid.collect()} == {"a"}
    bad = quarantined.collect()
    assert len(bad) == 1 and bad[0]["uuid"] == "b"


def test_validate_batch_is_idempotent_on_typed_dates(spark, sales_rows):
    """Re-validating validate_batch's own output (dates already
    DateType) must PASS — the pandas reference's to_datetime succeeds
    on datetime64 regardless of format, and before the type branch the
    ISO string form failed the M/d/yyyy parse and quarantined a fully
    valid batch (review r8)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.validate import (  # noqa: E501
        validate_batch,
    )

    df = spark.createDataFrame(sales_rows)
    first = validate_batch(df)
    assert first.errors == []
    assert dict(first.df.dtypes)["OrderDate"] == "date"
    second = validate_batch(first.df)
    assert second.errors == []
    assert dict(second.df.dtypes)["OrderDate"] == "date"
    assert second.df.count() == df.count()


def test_rule_violation_counts_empty_and_quoted_names(spark):
    """An EMPTY batch reports 0 violations per rule (sum over zero rows
    is NULL without the coalesce), and caller-supplied rule names with
    quote characters cannot break the generated stack() SQL."""
    from pyspark.sql import functions as F

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.validate import (  # noqa: E501
        rule_violation_counts,
    )

    empty = spark.createDataFrame([], "v double")
    rules = {"bad 'price'": F.col("v") < 0, "tick`rule": F.col("v") > 9}
    out = {
        r["rule"]: r["violations"]
        for r in rule_violation_counts(empty, rules).collect()
    }
    assert out == {"bad 'price'": 0, "tick`rule": 0}
    some = spark.createDataFrame([(-1.0,), (10.0,), (5.0,)], "v double")
    out2 = {
        r["rule"]: r["violations"]
        for r in rule_violation_counts(some, rules).collect()
    }
    assert out2 == {"bad 'price'": 1, "tick`rule": 1}
