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
# (CORRECTNESS_r01-r09 evidence).  Round-10 rotation (VERDICT r09
# item 1): CORRECTNESS_r09 was 50/50 green with zero reds, so this
# round's budget retires the WHOLE remaining round-6 staleness
# cohort — ALL 32 queries whose latest driver check is round 6
# (recomputed this session from CORRECTNESS_r01-r09; matches the
# VERDICT's precomputed list exactly) — then 18 round-7-checked
# fillers, heaviest/most-composite first (the decontamination /
# document / incremental-LSH / semantic-dedup pipeline stack, the
# graph lanes, then the text-analysis rollups).  32+18 = 50, so
# after this round no registered query's latest driver check is
# older than round 7.  The round-10 code changes (the LSH-store and
# IVF per-partition append fences, the writer lease, bench min-of-5
# lanes) touch maintenance/measurement paths only — no gate query's
# PLAN changed, verified mechanically: `tools/explain_audit.py
# --all` re-run this round diffs clean against the committed
# PLANS_DIGEST.txt.  No new queries this round — registered stays at
# 174 (VERDICT item 6).


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-9 red rows: NONE (CORRECTNESS_r09 was 50/50 green).
R09_RED: list[str] = []

# Queries whose gate PLAN changed this round: NONE — verified
# mechanically by `python tools/explain_audit.py --all` diffed
# against the committed PLANS_DIGEST.txt (the round-10 changes are
# writer fences, the writer lease, and bench/tooling, none on a gate
# query's plan path).
CHANGED_THIS_ROUND: list[str] = []

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r09 item 6).
NEW_THIS_ROUND: list[str] = []

# ALL 32 queries whose latest driver check is round 6 (recomputed
# from CORRECTNESS_r01-r09 this session; matches VERDICT r09's
# precomputed list exactly) — the whole remaining staleness cohort
# fits this round's budget (VERDICT r09 item 1).
OLDEST_R6 = [
    "approx_distinct_users_daily", "approx_percentile_summary",
    "bounded_rows_moving_avg", "cohort_retention",
    "daily_revenue_dense", "disjunctive_promo_revenue",
    "event_seasonality_profile", "funnel_stages",
    "global_row_numbering", "higher_moments_profile",
    "histogram_order_values", "key_skew_profile",
    "monthly_revenue_growth", "nth_order_values",
    "nullsafe_join_segments", "order_history_features",
    "order_interarrival_stats", "order_reconciliation",
    "pareto_abc_customers", "pmi_bigrams", "price_quartile_stats",
    "profile_lineitem_stats", "ratio_to_report_lang_share",
    "referential_integrity_audit", "regression_per_flag",
    "rfm_segmentation", "shipping_delay_stats",
    "shuffle_export_shards", "try_functions_safety",
    "unpivot_status_totals", "variant_props_banded",
    "weighted_sample_docs",
]

# Remaining budget: 18 round-7-checked fillers, heaviest/most-
# composite first — the decontamination/document/incremental-LSH/
# semantic-dedup pipeline stack (each composes many operators, so
# one green re-proof covers the most code), the sketch-dedup lanes,
# the graph lanes, then the text-analysis rollups.
OLDEST_R7_FILLERS = [
    "benchmark_decontamination", "document_pipeline",
    "dedup_lsh_incremental", "semantic_dedup_embeddings",
    "similarity_topk_lsh", "dedup_simhash",
    "dedup_edit_distance_blocked", "dedup_token_sort_fingerprint",
    "pagerank_part_graph", "triangle_count_parts",
    "lm_perplexity_scores", "pii_scrub_contacts",
    "mixture_resample_docs", "stateful_user_totals",
    "hll_sketch_rollup", "topk_sketch_rollup", "bpe_pair_top",
    "tfidf_top_terms",
]


# ROUND-11 ROTATION PLAN (for the next context): this round's 50
# slots are the full 32-query round-6 cohort + 18 round-7 fillers.
# If CORRECTNESS_r10 comes back green, no query's latest check is
# older than round 7 (24 remaining r7-checked + 50 r8 + 50 r9 + 50
# r10 = 174).  Next round: front any r10 reds, then r11 plan-changed
# queries, then the REMAINING 24 round-7-checked queries (recompute
# mechanically from CORRECTNESS_r01-r10: queries whose latest check
# is round 7, i.e. the 42-query r7 cohort minus this round's 18
# OLDEST_R7_FILLERS), then round-8-checked fillers up to the 50-slot
# budget (room for 26 with zero reds and zero plan changes —
# heaviest/most-composite first, same rule as this round).  Keep
# must-check <= 50 (tests/test_plans.py asserts it).  To compute
# CHANGED_THIS_ROUND mechanically: `python tools/explain_audit.py
# --all` and diff against the committed PLANS_DIGEST.txt baseline —
# any moved digest line is a plan change that must be fronted;
# update the baseline in the same commit as the plan change.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) round-9 red
    rows (none), (2) plan-changed queries (none — digest-diff clean),
    (3) the full 32-query round-6-checked staleness cohort, (4) 18
    round-7-checked fillers.  0+0+32+18 = 50 exactly, so every red,
    plan-changed, or stale-since-r6 gate is inside this round's
    budget (asserted by tests/test_plans.py's rotation guard).
    """
    explicit = (
        R09_RED + CHANGED_THIS_ROUND + NEW_THIS_ROUND + OLDEST_R6
        + OLDEST_R7_FILLERS
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
