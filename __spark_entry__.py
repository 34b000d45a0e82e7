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
# (CORRECTNESS_r01-r11 evidence).  Round-12 rotation (VERDICT r11
# item 2): CORRECTNESS_r11 was 50/50 green with zero reds, so this
# round's budget retires the WHOLE remaining round-8 staleness
# cohort — ALL 24 queries whose latest driver check is round 8
# (recomputed this session from CORRECTNESS_r01-r11; matches the
# VERDICT's precomputed list exactly) — then 26 round-9-checked
# fillers, heaviest/most-composite first (the LLM/fuzzy-dedup
# pipeline composites, the MinHash/bloom/connected-components dedup
# stack, the multimodal fingerprint lanes, the streaming/session
# lanes, then the heavy joins and text rollups).  24+26 = 50, so
# after this round no registered query's latest driver check is
# older than round 9.  The round-12 code changes (lease heartbeat +
# atomic rename break + unreadable-payload distinction, the
# lease_stale_after_s threading, bench provenance stamps) touch
# maintenance/measurement paths only — no gate query's PLAN
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


# Round-11 red rows: NONE (CORRECTNESS_r11 was 50/50 green).
R11_RED: list[str] = []

# Queries whose gate PLAN changed this round: NONE — verified
# mechanically by `python tools/explain_audit.py --all` diffed
# against the committed PLANS_DIGEST.txt (the round-12 changes are
# lease heartbeat/atomic-break hardening, lease_stale_after_s
# threading, and bench provenance, none on a gate query's plan
# path).
CHANGED_THIS_ROUND: list[str] = []

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r11 item 5).
NEW_THIS_ROUND: list[str] = []

# ALL 24 queries whose latest driver check is round 8 (recomputed
# from CORRECTNESS_r01-r11 this session; matches VERDICT r11's
# precomputed list exactly, and the judge independently re-proved
# all 24 against the DuckDB oracle last round) — the whole
# remaining staleness cohort fits this round's budget (VERDICT r11
# item 2).
OLDEST_R8 = [
    "bag_semantics_set_ops", "boolean_aggregates",
    "contingency_expected_cells", "countmin_heavy_hitters",
    "cusum_changepoint_daily", "daily_value_percentiles",
    "debounce_events", "embedding_gram_matrix", "gap_fill_forward",
    "higher_order_array_ops", "mad_robust_spread",
    "pattern_three_rising", "percentile_summary",
    "recency_decayed_user_value", "ref_validate_counts",
    "rolling_7d_user_value", "rolling_distinct_users_7d",
    "score_quantile_normalize", "training_split_summary",
    "user_retention_cohorts", "vwap_monthly",
    "weighted_median_price", "winsorized_stats",
    "zscore_outlier_events",
]

# Remaining budget: 26 round-9-checked fillers, heaviest/most-
# composite first — the end-to-end LLM/fuzzy-dedup pipeline
# composites (each re-proof covers the most code), the
# MinHash/connected-components/bloom dedup stack and split
# contamination, the multimodal fingerprint lanes, the streaming /
# sessionization lanes, the prefix-join similarity lanes, the text
# analysis lanes, then the heavy TPC-H-shaped joins.
OLDEST_R9_FILLERS = [
    "llm_data_pipeline", "fuzzy_dedup_pipeline",
    "dedup_minhash_lsh", "dedup_connected_components",
    "near_dup_cluster_canonical", "bloom_incremental_dedup",
    "cross_split_contamination", "multimodal_features",
    "image_ahash_fingerprints", "audio_energy_fingerprints",
    "video_frame_ahash", "stream_stream_attribution",
    "event_sessionize", "peak_concurrent_sessions",
    "sliding_window_event_rate", "exact_jaccard_prefix_join",
    "containment_prefix_join", "ngram_jaccard_adjacent",
    "text_lang_id", "text_fingerprint", "top_terms",
    "q5_local_supplier_volume", "q3_shipping_priority",
    "q6_revenue_forecast", "global_topk_orders",
    "salted_join_parity",
]


# ROUND-13 ROTATION PLAN (for the next context): this round's 50
# slots are the full 24-query round-8 cohort + 26 round-9 fillers.
# If CORRECTNESS_r12 comes back green, no query's latest check is
# older than round 9 (24 remaining r9-checked + 50 r10 + 50 r11 +
# 50 r12 = 174).  Next round: front any r12 reds, then r13
# plan-changed queries, then the REMAINING 24 round-9-checked
# queries (recompute mechanically from CORRECTNESS_r01-r12: queries
# whose latest check is round 9, i.e. the 50-query r9 cohort minus
# this round's 26 OLDEST_R9_FILLERS), then round-10-checked fillers
# up to the 50-slot budget (room for 26 with zero reds and zero
# plan changes — heaviest/most-composite first, same rule as this
# round).  Keep must-check <= 50 (tests/test_plans.py asserts it).
# To compute CHANGED_THIS_ROUND mechanically: `python
# tools/explain_audit.py --all` and diff against the committed
# PLANS_DIGEST.txt baseline — any moved digest line is a plan
# change that must be fronted; update the baseline in the same
# commit as the plan change.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) round-11 red
    rows (none), (2) plan-changed queries (none — digest-diff clean),
    (3) the full 24-query round-8-checked staleness cohort, (4) 26
    round-9-checked fillers.  0+0+24+26 = 50 exactly, so every red,
    plan-changed, or stale-since-r8 gate is inside this round's
    budget (asserted by tests/test_plans.py's rotation guard).
    """
    explicit = (
        R11_RED + CHANGED_THIS_ROUND + NEW_THIS_ROUND + OLDEST_R8
        + OLDEST_R9_FILLERS
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
