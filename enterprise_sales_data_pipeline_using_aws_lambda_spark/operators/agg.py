"""Aggregation operators (reference A1, ``lambda.py:184-189``).

The reference's single aggregate: group the batch by ``Country`` and emit
``max(UnitsSold)``, ``mean(TotalRevenue)``, ``mean(TotalCost)``,
``mean(TotalProfit)`` under fixed output names.  Catalyst plans this as a
partial (map-side) + final hash aggregate automatically, so the shuffle
carries one row per (partition, country) — at 100 TB the network moves
megabytes, not the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Output column names of the reference's summary (``lambda.py:185-188``).
SUMMARY_COLUMNS = [
    "max_units_sold",
    "average_total_revenue",
    "average_total_cost",
    "average_total_profit",
]


def sales_summary(
    df: DataFrame,
    country_col: str = "Country",
    units_col: str = "UnitsSold",
    revenue_col: str = "TotalRevenue",
    cost_col: str = "TotalCost",
    profit_col: str = "TotalProfit",
) -> DataFrame:
    """Per-country summary, reference-exact output names
    (``lambda.py:184-189``): one max + three means."""
    return df.groupBy(country_col).agg(
        F.max(units_col).alias("max_units_sold"),
        F.avg(revenue_col).alias("average_total_revenue"),
        F.avg(cost_col).alias("average_total_cost"),
        F.avg(profit_col).alias("average_total_profit"),
    )


def group_aggregate(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """Generic named multi-aggregate: ``aggs`` maps output name → agg
    expression; every output is explicitly aliased (names are part of the
    operator contract — the driver's oracle hashes by column name)."""
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
