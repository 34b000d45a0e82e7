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
# (CORRECTNESS_r01-r10 evidence).  Round-11 rotation (VERDICT r10
# item 1): CORRECTNESS_r10 was 50/50 green with zero reds, so this
# round's budget retires the WHOLE remaining round-7 staleness
# cohort — ALL 24 queries whose latest driver check is round 7
# (recomputed this session from CORRECTNESS_r01-r10; matches the
# VERDICT's precomputed list exactly) — then 26 round-8-checked
# fillers, heaviest/most-composite first (the retrieval /
# similarity / dedup pipeline stack, the sequence/linkage/graph
# lanes, then the text-analysis and layout rollups).  24+26 = 50,
# so after this round no registered query's latest driver check is
# older than round 8.  The round-11 code changes (age-gated lease
# self-break, per-batch lease tokens at the ingest call sites,
# lease-guarded in-loop retrain recovery, bench auto-promotion)
# touch maintenance/measurement paths only — no gate query's PLAN
# changed, verified mechanically: `tools/explain_audit.py --all`
# re-run this round diffs clean against the committed
# PLANS_DIGEST.txt.  No new queries this round — registered stays at
# 174 (VERDICT item 5).


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-10 red rows: NONE (CORRECTNESS_r10 was 50/50 green).
R10_RED: list[str] = []

# Queries whose gate PLAN changed this round: NONE — verified
# mechanically by `python tools/explain_audit.py --all` diffed
# against the committed PLANS_DIGEST.txt (the round-11 changes are
# lease hardening, per-batch lease tokens, and bench/tooling, none
# on a gate query's plan path).
CHANGED_THIS_ROUND: list[str] = []

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r10 item 5).
NEW_THIS_ROUND: list[str] = []

# ALL 24 queries whose latest driver check is round 7 (recomputed
# from CORRECTNESS_r01-r10 this session; matches VERDICT r10's
# precomputed list exactly) — the whole remaining staleness cohort
# fits this round's budget (VERDICT r10 item 1).
OLDEST_R7 = [
    "basket_part_pairs_lift", "chunk_documents_boundary",
    "collect_order_arrays", "crosstab_status_priority",
    "cube_with_grouping_id", "decimal_money_totals",
    "deterministic_split_docs", "doc_repetition_stats",
    "dup_cluster_size_profile", "embedding_preprocess",
    "event_transition_matrix", "ewma_monthly_revenue",
    "feature_hash_vectors", "map_status_counts",
    "q1_pricing_summary", "ref_date_format", "ref_dedup_keep_last",
    "ref_sales_summary", "ref_union", "ref_upsert",
    "skyline_price_quantity", "stratified_split_quotas",
    "token_entropy_quality", "udtf_keyvalue_explode",
]

# Remaining budget: 26 round-8-checked fillers, heaviest/most-
# composite first — the retrieval/similarity/dedup pipeline stack
# (each composes many operators, so one green re-proof covers the
# most code), the sequence/linkage/recursive lanes, the heavy join
# and sessionization lanes, then the text-analysis and layout
# rollups.
OLDEST_R8_FILLERS = [
    "bm25_retrieval", "inverted_index_topk",
    "similarity_topk_bruteforce", "similarity_topk_ivf",
    "dedup_embedding_cosine", "dedup_exact_docs",
    "dedup_repeated_spans", "passage_dedup_stats",
    "sequence_packing", "record_linkage_scores",
    "recursive_reachability_bfs", "scd2_customer_segments",
    "asof_click_purchase", "range_join_error_burst",
    "sessionized_funnel_rates", "conversion_latency_percentiles",
    "top_event_paths", "incremental_agg_maintenance",
    "text_quality", "text_tokens", "boilerplate_ngram_stats",
    "oov_rate_by_source", "quality_percentile_filter",
    "zorder_layout_profile", "snapshot_diff", "dq_expectation_suite",
]


# ROUND-12 ROTATION PLAN (for the next context): this round's 50
# slots are the full 24-query round-7 cohort + 26 round-8 fillers.
# If CORRECTNESS_r11 comes back green, no query's latest check is
# older than round 8 (24 remaining r8-checked + 50 r9 + 50 r10 + 50
# r11 = 174).  Next round: front any r11 reds, then r12 plan-changed
# queries, then the REMAINING 24 round-8-checked queries (recompute
# mechanically from CORRECTNESS_r01-r11: queries whose latest check
# is round 8, i.e. the 50-query r8 cohort minus this round's 26
# OLDEST_R8_FILLERS), then round-9-checked fillers up to the 50-slot
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
    verification spends its budget where it matters: (1) round-10 red
    rows (none), (2) plan-changed queries (none — digest-diff clean),
    (3) the full 24-query round-7-checked staleness cohort, (4) 26
    round-8-checked fillers.  0+0+24+26 = 50 exactly, so every red,
    plan-changed, or stale-since-r7 gate is inside this round's
    budget (asserted by tests/test_plans.py's rotation guard).
    """
    explicit = (
        R10_RED + CHANGED_THIS_ROUND + NEW_THIS_ROUND + OLDEST_R7
        + OLDEST_R8_FILLERS
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
