"""Query inventory: every operator from SURVEY.md §2 (plus the analytics
and LLM-pipeline extensions) expressed as a (Spark builder, oracle SQL)
pair over the star-schema test tables.

Conventions (driver contract, ``__spark_entry__.py``):
- each builder takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL;
- float aggregates are ``round(x, 2)``-ed on BOTH sides so the driver's
  order-insensitive value hash is stable against summation-order ulps
  (SURVEY §7.5.5);
- raw columns pass through unrounded (identical parquet bits on both
  sides).

Registration happens via the ``@query`` decorator into ``QUERIES`` /
``ORACLES``; queries with no SQL-expressible oracle (fuzzy dedup etc.)
register with ``oracle=None`` and get the driver's rows-only check.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.agg import sales_summary
from ..operators.dedup import dedup_keep_last, duplicate_groups
from ..operators.upsert import upsert_keep_last
from ..operators.validate import rule_violation_counts
from ..sources.readers import read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Reference surface (SURVEY §2) on the star schema: lineitem/orders play the
# sales fact, nation/region the Country/Region dimensions.
# ---------------------------------------------------------------------------

@query(
    "ref_sales_summary",
    """
    SELECT l_returnflag AS flag,
           max(l_quantity) AS max_units_sold,
           round(avg(l_extendedprice), 2) AS average_total_revenue,
           round(avg(l_extendedprice * (1 - l_discount)), 2) AS average_total_cost,
           round(avg(l_extendedprice * l_discount), 2) AS average_total_profit
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def ref_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A1 (``lambda.py:184-189``): group-by with one max + three
    named means, mapped onto the lineitem fact (revenue/cost/profit kept
    arithmetically consistent: profit = revenue - cost).

    Plan shape: partial hash-agg → single shuffle on the group key →
    final hash-agg; rounding applied after the final agg.
    """
    li = _t(spark, sf_dir, "lineitem")
    fact = li.select(
        F.col("l_returnflag").alias("Country"),
        F.col("l_quantity").alias("UnitsSold"),
        F.col("l_extendedprice").alias("TotalRevenue"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "TotalCost"
        ),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("TotalProfit"),
    )
    out = sales_summary(fact)
    return out.select(
        F.col("Country").alias("flag"),
        "max_units_sold",
        F.round("average_total_revenue", 2).alias("average_total_revenue"),
        F.round("average_total_cost", 2).alias("average_total_cost"),
        F.round("average_total_profit", 2).alias("average_total_profit"),
    )


@query(
    "ref_dedup_keep_last",
    """
    WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type, value
        FROM events
    )
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM ev
    ) t
    WHERE rn = 1
    """,
)
def ref_dedup_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference A2 (``lambda.py:180``): keyed keep-last dedup with the
    positional winner replaced by an explicit deterministic ordering
    (latest ``ts``, tie-broken by ``event_id`` — SURVEY §7.5.1).

    One hash shuffle on the key; no global sort."""
    ev = _t(spark, sf_dir, "events")
    out = dedup_keep_last(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    )
    return out.select("user_id", "event_id", "ts", "event_type", "value")


@query(
    "ref_upsert",
    """
    WITH ev AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type, value
        FROM events
    ),
    existing AS (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM ev WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
    ),
    tgt AS (SELECT user_id, event_id, ts, event_type, value
            FROM existing WHERE rn = 1),
    batch AS (
        SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM ev WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
    ),
    b1 AS (SELECT user_id, event_id, ts, event_type, value
           FROM batch WHERE rn = 1)
    SELECT * FROM tgt
    WHERE user_id NOT IN (SELECT user_id FROM b1)
    UNION ALL
    SELECT * FROM b1
    """,
)
def ref_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference upsert (``lambda.py:176-181``): incoming batch beats the
    existing target per key; idempotent on replay (``README.md:141-145``).
    Formulated as target LEFT ANTI JOIN batch-keys ∪ batch — the target
    is never sorted or rewritten wholesale (SURVEY §2.3, §7.5.2)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    cutoff = F.lit("2024-01-25 00:00:00").cast("timestamp")
    order = [F.col("ts").desc(), F.col("event_id").desc()]
    tgt = dedup_keep_last(ev.filter(F.col("ts") < cutoff), ["user_id"], order)
    batch = dedup_keep_last(
        ev.filter(F.col("ts") >= cutoff), ["user_id"], order
    )
    return upsert_keep_last(tgt, batch, ["user_id"])


@query(
    "ref_validate_counts",
    """
    SELECT 'qty_out_of_range' AS rule,
           count(*) FILTER (WHERE NOT (l_quantity BETWEEN 1 AND 45)) AS violations
    FROM lineitem
    UNION ALL
    SELECT 'discount_too_high',
           count(*) FILTER (WHERE l_discount > 0.08) FROM lineitem
    UNION ALL
    SELECT 'nonpositive_price',
           count(*) FILTER (WHERE l_extendedprice <= 0) FROM lineitem
    UNION ALL
    SELECT 'null_shipdate',
           count(*) FILTER (WHERE l_shipdate IS NULL) FROM lineitem
    """,
)
def ref_validate_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference V1-V4 (``lambda.py:81-121``) in row-level mode: per-rule
    violation counts computed in ONE aggregate scan (the reference runs
    one pass per rule; at 100 TB that is 4 scans vs 1)."""
    li = _t(spark, sf_dir, "lineitem")
    rules = {
        "qty_out_of_range": ~F.col("l_quantity").between(1, 45),
        "discount_too_high": F.col("l_discount") > 0.08,
        "nonpositive_price": F.col("l_extendedprice") <= 0,
        "null_shipdate": F.col("l_shipdate").isNull(),
    }
    return rule_violation_counts(li, rules)


@query(
    "ref_date_format",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
           strftime(o_orderdate, '%Y%m') AS order_month
    FROM orders
    """,
)
def ref_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference F2 (``lambda.py:168-169``): restringify dates
    ``yyyy-MM-dd`` for serving tables. JVM built-in ``date_format`` —
    stays in whole-stage codegen."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
        F.date_format("o_orderdate", "yyyyMM").alias("order_month"),
    )


@query(
    "ref_union",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderstatus = 'F'
    """,
)
def ref_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference U1 (``lambda.py:179``): column-aligned vertical concat →
    ``unionByName`` (no shuffle; partitions are appended)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return o.filter(F.col("o_orderstatus") == "O").unionByName(
        o.filter(F.col("o_orderstatus") == "F")
    )


# ---------------------------------------------------------------------------
# Analytics extensions (SURVEY §7.2.6): joins, windows, top-k — the query
# surface the star-schema data exists for.
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate. The filter and the
    6-column projection both push into the parquet scan (check
    ``PushedFilters``/``ReadSchema`` in explain)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(
                F.sum(disc_price * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
