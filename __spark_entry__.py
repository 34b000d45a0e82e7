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

# The driver checks exactly 50 entries per round, in dict order
# (CORRECTNESS_r01/r02/r03 evidence).  Round-4 rotation (VERDICT r03
# items 1-3): (1) the 15 queries never driver-checked — queued at 51+
# in round 3 — including the two whose oracles carried the latent
# HUGEINT dtype bug, now fixed; (2) the 10 round-3 red rows, all one
# root cause (oracle sum(CASE)/count_if → DuckDB HUGEINT → pandas
# float64 vs Spark int64), fixed by CAST(... AS BIGINT) and re-proven
# by the now-driver-faithful tools/check_oracle.py (pandas-dtype
# comparison; the old fetchall() path erased exactly this failure
# mode); (3) queries added this round; (4) the oldest-verified
# (r1-only) queries as regression guards in the remaining slots.


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Never driver-checked: round-3's 51+ queue.  Includes the two
# latent HUGEINT-oracle carriers (record_linkage_scores,
# gap_fill_forward — CAST AS BIGINT applied this round) and the two
# ADVICE-hardened plans (triangle_count_parts nullif wedge guard,
# conversion_latency_percentiles empty-case left join).
NEVER_CHECKED = [
    "pagerank_part_graph", "record_linkage_scores",
    "score_quantile_normalize", "incremental_agg_maintenance",
    "triangle_count_parts", "dq_expectation_suite",
    "snapshot_diff", "daily_value_percentiles",
    "pattern_three_rising", "higher_order_array_ops",
    "winsorized_stats", "gap_fill_forward", "udtf_keyvalue_explode",
    "conversion_latency_percentiles", "vwap_monthly",
]

# Round-3 red rows — all a single root cause (oracle HUGEINT →
# pandas float64 vs Spark int64 under the driver's value hash; values
# were verified numerically identical).  Oracles now CAST to BIGINT;
# the pandas-dtype-faithful tools/check_oracle.py reproduces the old
# failure and passes the fix.  A red row is a red row until the
# driver re-verifies.
R03_RED = [
    "boolean_aggregates", "zscore_outlier_events", "document_pipeline",
    "boilerplate_ngram_stats", "passage_dedup_stats",
    "training_split_summary", "sequence_packing",
    "quality_percentile_filter", "oov_rate_by_source", "debounce_events",
]

# Queries ADDED this round (locally strict-oracle-green under the
# driver-faithful pandas comparison).  Appended as they land.
NEW_THIS_ROUND: list[str] = [
    "sessionized_funnel_rates",
    "near_dup_cluster_canonical",
    "rolling_7d_user_value",
    "cross_split_contamination",
    "contingency_expected_cells",
    "rolling_distinct_users_7d",
    "user_retention_cohorts",
    "top_event_paths",
    "exact_jaccard_prefix_join",
    "embedding_gram_matrix",
    "recursive_reachability_bfs",
    "zorder_layout_profile",
    "bag_semantics_set_ops",
    "countmin_heavy_hitters",
    "recency_decayed_user_value",
    "cusum_changepoint_daily",
    "peak_concurrent_sessions",
    "image_ahash_fingerprints",
]

# Remaining budget: regression guards, oldest-first — queries whose
# only driver check was round 1 (44 such; the first 50-|above| fill
# this round's slots, the rest rotate forward next round).
OLDEST_R1 = [
    "ref_sales_summary", "ref_dedup_keep_last", "ref_upsert",
    "ref_validate_counts", "ref_date_format", "ref_union",
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_revenue_forecast",
    "join_region_rollup", "semi_join_active_customers",
    "anti_join_inactive_customers", "window_top_orders_per_cust",
    "window_running_total", "agg_rollup_returns", "event_daily_agg",
    "text_quality", "text_tokens", "text_lang_id", "text_fingerprint",
    "dedup_exact_docs", "ngram_jaccard_adjacent",
    "similarity_topk_bruteforce", "dedup_embedding_cosine",
    "event_sessionize", "scalar_function_suite", "exists_late_orders",
    "intersect_repeat_customers", "except_single_status_customers",
    "agg_cube_status_priority", "pivot_priority_by_status",
    "global_topk_orders", "window_rank_suite",
    "full_outer_nation_balance", "distinct_users_daily",
    "asof_click_purchase", "range_join_error_burst",
    "scalar_subquery_small_qty", "in_subquery_big_orders",
    "json_props_stats", "embedding_vector_stats",
    "window_moving_avg_range", "top_terms",
]


# ROUND-5 ROTATION PLAN (for the next context): this round's 50 slots
# are NEVER_CHECKED(15) + R03_RED(10) + NEW_THIS_ROUND(18) + the first
# 7 OLDEST_R1 fillers.  If CORRECTNESS_r04 comes back green,
# cumulative driver coverage is 169/169 registered.  Next round: move
# the REMAINING 37 OLDEST_R1 entries (positions 8+ of the list below)
# to the front — they will then be the only queries whose last driver
# check is round 1 — plus any round-4 red rows first and round-5
# additions.  Keep must-check <= 50 (tests/test_plans.py asserts it).


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) the 15
    never-driver-checked queries, (2) the 10 round-3 dtype-red rows,
    now fixed, (3) queries added this round, (4) oldest-verified
    regression guards.  1+2+3 < 50, so every unverified, red, or new
    gate is inside this round's budget (asserted by
    tests/test_plans.py's rotation guard).
    """
    explicit = NEVER_CHECKED + R03_RED + NEW_THIS_ROUND + OLDEST_R1

    def bucket(name: str) -> tuple:
        if name in explicit:
            return (0, explicit.index(name))
        return (1, 0)

    names = sorted(QUERIES, key=bucket)  # stable: insertion order within
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for ops with no
    SQL-expressible oracle → driver runs a rows-only check)."""
    return dict(ORACLES)
