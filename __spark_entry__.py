"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in
``enterprise_sales_data_pipeline_using_aws_lambda_spark.plans.queries`` —
one (Spark builder, oracle SQL) pair per operator from SURVEY.md §2.
``COVERAGE.md`` maps every SURVEY §2 operator (and the extension
surface) to its implementation, gate query, and tests.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from enterprise_sales_data_pipeline_using_aws_lambda_spark.plans.queries import (
    ORACLES,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for ops with no
    SQL-expressible oracle → driver runs a rows-only check)."""
    return dict(ORACLES)
