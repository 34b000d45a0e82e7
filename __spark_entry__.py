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
# (CORRECTNESS_r01-r05 evidence).  Round-6 rotation (VERDICT r05 item
# 3): CORRECTNESS_r05 was 50/50 green with zero reds, so this round's
# budget goes to (1) the 12 queries whose PLAN changed this round
# (the jaccard family's unrounded-threshold filters + two oracle
# WHERE alignments, the dedup_lsh_incremental persisted-signature
# fast path, containment's auto positional filter, and the four
# media gates' numpy decode path), (2) ALL 35 queries whose latest
# driver check is round 2 (the OLDEST_R2 tail past round 5's filler
# cut), then (3) round-3-checked fillers, oldest cohort first.
# 12+35+3 = 50, so after this round no registered query's latest
# driver check is older than round 3.  No new queries this round —
# registered stays at 174 (VERDICT item 7: spend slots on rotation).


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-5 red rows: NONE (CORRECTNESS_r05 was 50/50 green).
R05_RED: list[str] = []

# Queries whose Spark plan CHANGED this round — green before, but the
# code they exercised no longer exists, so they must be re-proven.
CHANGED_THIS_ROUND = [
    # persisted-signature fast path: the gate now routes through
    # corpus_signatures=/corpus_buckets= (store state computed inline;
    # signatures deterministic, oracle unchanged)
    "dedup_lsh_incremental",
    # jaccard family: verify filters moved to the UNROUNDED ratio
    # (round(.,6) is presentation-only now); exact_jaccard and
    # containment oracles' WHERE clauses aligned the same round
    "dedup_minhash_lsh",
    "exact_jaccard_prefix_join",
    "containment_prefix_join",
    # compose minhash_near_duplicates → inherit the filter change
    "near_dup_cluster_canonical",
    "cross_split_contamination",
    # jaccard_on_pairs internal reshape (raw column then round)
    "ngram_jaccard_adjacent",
    "dedup_connected_components",
    # numpy-vectorized decode/fingerprint path (same exact integers:
    # frombuffer + reduceat energies, fancy-index 8×8 grids, vector
    # byte sums, PNG None/Up unfilter rows)
    "image_ahash_fingerprints",
    "audio_energy_fingerprints",
    "video_frame_ahash",
    "multimodal_features",
]

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r05 item 7).
NEW_THIS_ROUND: list[str] = []

# The 35 queries whose latest driver check is round 2 (recomputed from
# CORRECTNESS_r01-r05) — the OLDEST_R2 tail past round 5's filler cut.
# All inside this round's budget: after r6 no registered query's
# coverage is older than round 3.
OLDEST_R2 = [
    "unpivot_status_totals", "profile_lineitem_stats",
    "histogram_order_values", "pmi_bigrams", "nullsafe_join_segments",
    "daily_revenue_dense", "try_functions_safety",
    "shuffle_export_shards", "disjunctive_promo_revenue",
    "funnel_stages", "regression_per_flag", "chunk_documents_fixed",
    "llm_data_pipeline", "global_row_numbering",
    "weighted_sample_docs", "shipping_delay_stats",
    "ratio_to_report_lang_share", "order_history_features",
    "key_skew_profile", "fuzzy_dedup_pipeline", "nth_order_values",
    "monthly_revenue_growth", "order_interarrival_stats",
    "price_quartile_stats", "cohort_retention", "rfm_segmentation",
    "referential_integrity_audit", "order_reconciliation",
    "bounded_rows_moving_avg", "higher_moments_profile",
    "event_seasonality_profile", "pareto_abc_customers",
    "scd2_customer_segments", "stream_stream_attribution",
    "variant_props_banded",
]

# Remaining budget: round-3-checked fillers (oldest cohort), front-
# loading the one whose operator grew a guard this round
# (similarity_topk_lsh → lsh_topk's MAX_QUERY_VECTORS check).
OLDEST_R3_FILLERS = [
    "similarity_topk_lsh", "approx_distinct_users_daily",
    "approx_percentile_summary",
]


# ROUND-7 ROTATION PLAN (for the next context): this round's 50 slots
# are R05_RED(0) + CHANGED(12) + OLDEST_R2(35) + 3 r3 fillers.  If
# CORRECTNESS_r06 comes back green, no query's latest check is older
# than round 3.  Next round: front any r6 reds, then r7 plan-changed
# queries, then the REMAINING 37 round-3-checked queries
# (40 minus this round's 3 fillers), then round-4-checked queries as
# they age.  Keep must-check <= 50 (tests/test_plans.py asserts it).


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) round-5 red
    rows (none), (2) the 12 queries whose plan changed this round,
    (3) the 35 queries last driver-checked in round 2, (4) round-3
    fillers.  1+2+3+4 = 50 exactly, so every red, changed, or
    stale-since-r2 gate is inside this round's budget (asserted by
    tests/test_plans.py's rotation guard).
    """
    explicit = (
        R05_RED + CHANGED_THIS_ROUND + NEW_THIS_ROUND + OLDEST_R2
        + OLDEST_R3_FILLERS
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
