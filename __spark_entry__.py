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
# (CORRECTNESS_r01-r08 evidence).  Round-9 rotation (VERDICT r08 item
# 1): CORRECTNESS_r08 was 50/50 green with zero reds, so this round's
# budget retires the WHOLE round-5 staleness cohort: (1)
# bloom_incremental_dedup — its gate plan changed in round 8
# (probe_bloom's groupBy/bit_or fold) but was missed by the round-8
# front list (round-8 ADVICE, bloom.py:92) — then (2) ALL 34 queries
# whose latest driver check is round 5 (recomputed from
# CORRECTNESS_r01-r08; includes the seven fillers the round-8
# plan-changed re-proofs displaced), then (3) 15 round-6-checked
# fillers, heaviest/most-composite first (the LSH/fuzzy/LLM pipeline
# stack, prefix joins, multimodal fingerprints).  1+34+15 = 50, so
# after this round no registered query's latest driver check is older
# than round 6.  The round-9 code changes (IVF version durability,
# the append writer fence, O(1)-job quarantine discovery) touch
# maintenance paths only — no gate query's PLAN changed, verified by
# re-running check_oracle on the similarity gates this session.  No
# new queries this round — registered stays at 174 (VERDICT item 6).


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-8 red rows: NONE (CORRECTNESS_r08 was 50/50 green).
R07_RED: list[str] = []

# Queries whose gate PLAN changed without a re-proof — the one
# round-8 rotation miss (ADVICE r08, bloom.py:92): probe_bloom gained
# the groupBy/bit_or fold of bloom_words in round 8 but
# bloom_incremental_dedup was not fronted.  The round-9 code changes
# themselves (IVF version durability, append fence, quarantine
# discovery) are maintenance-path only and change no gate plan.
CHANGED_THIS_ROUND = [
    "bloom_incremental_dedup",
]

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r08 item 6).
NEW_THIS_ROUND: list[str] = []

# ALL 34 queries whose latest driver check is round 5 (recomputed
# from CORRECTNESS_r01-r08) — the whole staleness cohort fits this
# round's budget (VERDICT r08 item 1), fronted by the seven fillers
# the round-8 plan-changed re-proofs displaced.
OLDEST_R4 = [
    "q6_revenue_forecast", "event_sessionize",
    "peak_concurrent_sessions", "text_fingerprint", "text_lang_id",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "agg_cube_status_priority", "agg_rollup_returns",
    "anti_join_inactive_customers", "argmin_supplier_per_nation",
    "distinct_users_daily", "embedding_vector_stats",
    "event_daily_agg", "except_single_status_customers",
    "exists_late_orders", "full_outer_nation_balance",
    "global_topk_orders", "grouping_sets_region_channel",
    "in_subquery_big_orders", "intersect_repeat_customers",
    "join_region_rollup", "json_props_stats",
    "pivot_priority_by_status", "salted_join_parity",
    "scalar_function_suite", "scalar_subquery_small_qty",
    "semi_join_active_customers", "sliding_window_event_rate",
    "top_terms", "window_moving_avg_range", "window_rank_suite",
    "window_running_total", "window_top_orders_per_cust",
]

# Remaining budget: 15 round-6-checked fillers, heaviest/most-
# composite first — the near-dup/LLM pipeline stack (each composes
# many operators, so one green re-proof covers the most code), the
# prefix joins, then the multimodal fingerprint lanes.
OLDEST_R5_FILLERS = [
    "dedup_minhash_lsh", "fuzzy_dedup_pipeline", "llm_data_pipeline",
    "dedup_connected_components", "near_dup_cluster_canonical",
    "exact_jaccard_prefix_join", "containment_prefix_join",
    "ngram_jaccard_adjacent", "cross_split_contamination",
    "multimodal_features", "image_ahash_fingerprints",
    "audio_energy_fingerprints", "video_frame_ahash",
    "stream_stream_attribution", "chunk_documents_fixed",
]


# ROUND-10 ROTATION PLAN (for the next context): this round's 50
# slots are CHANGED(1: the displaced bloom re-proof) + the full
# 34-query round-5 cohort + 15 round-6 fillers.  If CORRECTNESS_r09
# comes back green, no query's latest check is older than round 6
# (32 remaining r6-checked + 42 r7 + 50 r8 + 50 r9 = 174).  Next
# round: front any r9 reds, then r10 plan-changed queries, then the
# REMAINING 32 round-6-checked queries (precomputed from
# CORRECTNESS_r01-r08 + this round's front list; re-verify against
# CORRECTNESS_r09 when it lands):
#   approx_distinct_users_daily, approx_percentile_summary,
#   bounded_rows_moving_avg, cohort_retention, daily_revenue_dense,
#   disjunctive_promo_revenue, event_seasonality_profile,
#   funnel_stages, global_row_numbering, higher_moments_profile,
#   histogram_order_values, key_skew_profile, monthly_revenue_growth,
#   nth_order_values, nullsafe_join_segments, order_history_features,
#   order_interarrival_stats, order_reconciliation,
#   pareto_abc_customers, pmi_bigrams, price_quartile_stats,
#   profile_lineitem_stats, ratio_to_report_lang_share,
#   referential_integrity_audit, regression_per_flag,
#   rfm_segmentation, shipping_delay_stats, shuffle_export_shards,
#   try_functions_safety, unpivot_status_totals, variant_props_banded,
#   weighted_sample_docs
# then round-7-checked fillers up to the 50-slot budget (42 r7
# candidates; with zero reds and zero plan changes there is room for
# 18 — suggested order, heaviest/most-composite first:
#   benchmark_decontamination, document_pipeline,
#   dedup_lsh_incremental, semantic_dedup_embeddings,
#   similarity_topk_lsh, dedup_simhash, dedup_edit_distance_blocked,
#   dedup_token_sort_fingerprint, pagerank_part_graph,
#   triangle_count_parts, lm_perplexity_scores, pii_scrub_contacts,
#   mixture_resample_docs, stateful_user_totals, hll_sketch_rollup,
#   topk_sketch_rollup, bpe_pair_top, tfidf_top_terms).
# Keep must-check <= 50
# (tests/test_plans.py asserts it).  To compute CHANGED_THIS_ROUND
# mechanically: `python tools/explain_audit.py --all` and diff
# against the committed PLANS_DIGEST.txt baseline (round-9 tree) —
# any moved digest line is a plan change that must be fronted;
# update the baseline in the same commit as the plan change.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) round-8 red
    rows (none), (2) the bloom gate whose round-8 plan change was
    missed by that round's front list, (3) the full 34-query
    round-5-checked staleness cohort, (4) 15 round-6-checked fillers.
    0+1+34+15 = 50 exactly, so every red, plan-changed, or
    stale-since-r5 gate is inside this round's budget (asserted by
    tests/test_plans.py's rotation guard).
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
