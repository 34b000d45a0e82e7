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
# (CORRECTNESS_r01-r07 evidence).  Round-8 rotation (VERDICT r07 item
# 2): CORRECTNESS_r07 was 50/50 green with zero reds, so this round's
# budget goes to (1) the nine queries whose gate code or PLAN changed
# this round (weighted_median_price's weight-type check; the
# tokenize-once term_postings rewrite under both retrieval gates; the
# inverted-interval guard under range_join_error_burst; the
# empty-input coalesce under ref_validate_counts; the null-safe
# selection rejoins under percentile_summary / mad_robust_spread /
# conversion_latency_percentiles; the null-safe scd2 merge), (2) ALL
# 33 queries whose latest driver check is round 4 — fronted by the
# three fillers the round-7 re-proofs displaced (sequence_packing,
# embedding_gram_matrix, snapshot_diff) — then (3) 8 round-5-checked
# fillers, fronted by the two whose plans ALSO changed this round
# (dedup_exact_docs — single-column fingerprint branch;
# asof_click_purchase — as-of tie/null-key hardening).  9+33+8 = 50,
# so after this round no registered query's latest driver check is
# older than round 5 except the r5 fillers the plan-changed re-proofs
# displaced (q6_revenue_forecast, event_sessionize,
# peak_concurrent_sessions, text_fingerprint, text_lang_id,
# q3_shipping_priority, q5_local_supplier_volume — plans untouched
# for rounds — front them in round 9).  No new queries this round — registered stays at 174
# (VERDICT item 6: the round-8 work — IVF retrain, recovery caps,
# reliable-mode e2e, the compaction bench lane — is test-covered
# maintenance, not new gate surface).


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-7 red rows: NONE (CORRECTNESS_r07 was 50/50 green).
R07_RED: list[str] = []

# Queries whose gate code CHANGED this round — green before, but the
# code they exercised no longer exists, so they must be re-proven.
CHANGED_THIS_ROUND = [
    # round-8 ADVICE fix: weighted_median's weight-type check now
    # admits scale-0 decimals (exact long cast, precision <= 18),
    # rejects only fractional-capable types, and guards bucket_width;
    # its rejoins are null-safe now too
    "weighted_median_price",
    # round-8 review fixes that changed these gates' PLANS:
    # term_postings now projects the token array once (tokenize-once
    # rewrite feeds both retrieval gates)
    "bm25_retrieval",
    "inverted_index_topk",
    # interval_join guards inverted intervals (when/otherwise around
    # the bucket sequence)
    "range_join_error_burst",
    # rule_violation_counts coalesces empty-input sums to 0
    "ref_validate_counts",
    # the selection operators' internal rejoins are NULL-SAFE (a NULL
    # group no longer vanishes) — every gate over
    # exact_percentiles/mad_spread re-proves
    "percentile_summary",
    "mad_robust_spread",
    "conversion_latency_percentiles",
    # scd2_merge's key join is null-safe and NULL is_current rows pass
    # through as history
    "scd2_customer_segments",
]

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r07 item 6).
NEW_THIS_ROUND: list[str] = []

# The 33 queries whose latest driver check is round 4 (recomputed from
# CORRECTNESS_r01-r07), fronted by the three fillers the round-7
# changed-gate re-proofs displaced.  All inside this round's budget.
OLDEST_R4 = [
    "sequence_packing", "embedding_gram_matrix", "snapshot_diff",
    "bag_semantics_set_ops", "boilerplate_ngram_stats",
    "boolean_aggregates", "contingency_expected_cells",
    "countmin_heavy_hitters", "cusum_changepoint_daily",
    "daily_value_percentiles", "debounce_events",
    "dq_expectation_suite", "gap_fill_forward",
    "higher_order_array_ops", "incremental_agg_maintenance",
    "oov_rate_by_source", "passage_dedup_stats",
    "pattern_three_rising", "quality_percentile_filter",
    "recency_decayed_user_value", "record_linkage_scores",
    "recursive_reachability_bfs", "rolling_7d_user_value",
    "rolling_distinct_users_7d", "score_quantile_normalize",
    "sessionized_funnel_rates", "top_event_paths",
    "training_split_summary", "user_retention_cohorts",
    "vwap_monthly", "winsorized_stats", "zorder_layout_profile",
    "zscore_outlier_events",
]

# Remaining budget: 8 round-5-checked fillers — dedup_exact_docs and
# asof_click_purchase first (their gate plans changed this round:
# the single-column fingerprint branch and the as-of tie/null-key
# hardening), then similarity_topk_ivf (similarity.py gained the
# retrain/version machinery; its inline gate path is untouched but
# adjacent), then representatives.
OLDEST_R5_FILLERS = [
    "dedup_exact_docs", "asof_click_purchase",
    "similarity_topk_ivf", "similarity_topk_bruteforce",
    "dedup_embedding_cosine", "dedup_repeated_spans",
    "text_quality", "text_tokens",
]


# ROUND-9 ROTATION PLAN (for the next context): this round's 50 slots
# are R07_RED(0) + CHANGED(9) + OLDEST_R4(33) + 8 r5 fillers.  If
# CORRECTNESS_r08 comes back green, no query's latest check is older
# than round 5 except the seven displaced r5 fillers
# (q6_revenue_forecast, event_sessionize, peak_concurrent_sessions,
# text_fingerprint, text_lang_id, q3_shipping_priority,
# q5_local_supplier_volume — front them in round 9).  Next round:
# front any r8 reds, then r9 plan-changed queries, then those seven,
# then the REMAINING round-5-checked queries (recompute from
# CORRECTNESS_r01-r08), then round-6-checked queries as they age.  Keep must-check <= 50
# (tests/test_plans.py asserts it).


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) round-7 red
    rows (none), (2) the nine queries whose gate code or plan changed
    this round, (3) the 33 queries last driver-checked in round 4,
    (4) round-5 fillers.  0+9+33+8 = 50 exactly, so every red,
    changed, or stale-since-r4 gate is inside this round's budget
    (asserted by tests/test_plans.py's rotation guard).
    """
    explicit = (
        R07_RED + CHANGED_THIS_ROUND + NEW_THIS_ROUND + OLDEST_R4
        + OLDEST_R5_FILLERS
    )

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
