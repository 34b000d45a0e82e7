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
# (CORRECTNESS_r01-r12 evidence).  Round 13 became the FIRST
# OPTIMIZATION round, so the budget now fronts the four queries whose
# gate plans the optimization work changed (CHANGED_THIS_ROUND below
# — digest-diff against the pre-round PLANS_DIGEST.txt, plus the one
# expression-only change the digest is too coarse to see), then the
# WHOLE remaining round-9 staleness cohort — ALL 24 queries whose
# latest driver check is round 9 (recomputed from CORRECTNESS_r01-r12;
# matches VERDICT r12's precomputed list exactly) — then 22
# round-10-checked fillers, heaviest/most-composite first.
# 4+24+22 = 50, so after this round no registered query's latest
# driver check is older than round 10 except the two fillers the
# plan-changed block displaced (stateful_user_totals,
# key_skew_profile — they front round 14).  The build-phase round-13
# changes (lease heartbeat fault-tolerance, bench runner stamp,
# failed-lane promotion guards) touched no gate plan; the
# OPTIMIZATION changes are enumerated in CHANGED_THIS_ROUND and
# OPTIMIZATION_r13.md, each re-proved against the DuckDB oracle this
# session.  No new queries this round — registered stays at 174.


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-12 red rows: NONE (CORRECTNESS_r12 was 50/50 green).
R12_RED: list[str] = []

# Queries whose gate PLAN changed this round — round 13 became the
# first OPTIMIZATION round, and three digests moved (verified
# mechanically: `python tools/explain_audit.py --all` diffed against
# the pre-round PLANS_DIGEST.txt, regenerated in the same commits):
# pagerank_part_graph (broadcast-loop rework: per-iteration SMJ+BNLJ
# -> BHJ, 9 exchanges -> 2), dedup_minhash_lsh and
# cross_split_contamination (verify-stage SortMergeJoin LeftSemi ->
# pushed literal-In corpus scan).  dedup_edit_distance_blocked's
# digest line did NOT move (same joins/exchanges) but its scoring
# expression changed (levenshtein -> thresholded levenshtein), so it
# is fronted too.  All four re-proved against the DuckDB oracle this
# round (PASS at sf0.01; pagerank additionally at sf0.001 and sf0.1).
CHANGED_THIS_ROUND: list[str] = [
    "pagerank_part_graph",
    "dedup_minhash_lsh",
    "cross_split_contamination",
    "dedup_edit_distance_blocked",
]

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r12 item 5).
NEW_THIS_ROUND: list[str] = []

# ALL 24 queries whose latest driver check is round 9 (recomputed
# from CORRECTNESS_r01-r12 this session; matches VERDICT r12's
# precomputed list exactly, and the judge independently re-proved
# all 24 against the DuckDB oracle last round) — the whole
# remaining staleness cohort fits this round's budget (VERDICT r12
# item 1).
OLDEST_R9 = [
    "agg_cube_status_priority", "agg_rollup_returns",
    "anti_join_inactive_customers", "argmin_supplier_per_nation",
    "chunk_documents_fixed", "distinct_users_daily",
    "embedding_vector_stats", "event_daily_agg",
    "except_single_status_customers", "exists_late_orders",
    "full_outer_nation_balance", "grouping_sets_region_channel",
    "in_subquery_big_orders", "intersect_repeat_customers",
    "join_region_rollup", "json_props_stats",
    "pivot_priority_by_status", "scalar_function_suite",
    "scalar_subquery_small_qty", "semi_join_active_customers",
    "window_moving_avg_range", "window_rank_suite",
    "window_running_total", "window_top_orders_per_cust",
]

# Remaining budget: 26 round-10-checked fillers, heaviest/most-
# composite first — the end-to-end document / decontamination
# pipeline composites (each re-proof covers the most code), the
# incremental-LSH / simhash / edit-distance / token-sort dedup
# stack, semantic embedding dedup and LSH top-k retrieval, the
# LM-scoring / mixture-resampling / PII-scrub curation lanes, the
# n-gram statistics and sketch rollups, the iterative graph lanes,
# export sharding and weighted sampling, then the heavy behavioral
# rollups (funnel/cohort/RFM/reconciliation/skew/stateful totals).
# (Round-13 optimization adjustment: dedup_edit_distance_blocked and
# pagerank_part_graph moved UP into CHANGED_THIS_ROUND, and
# dedup_minhash_lsh + cross_split_contamination joined it from
# outside this list, so the filler block shrinks to 22 —
# stateful_user_totals and key_skew_profile, the two lightest
# entries under the heaviest-first rule, rotate out to keep the
# explicit block at exactly 50.  Both stay r10-checked and front
# round 14's filler list.)
OLDEST_R10_FILLERS = [
    "document_pipeline", "benchmark_decontamination",
    "dedup_lsh_incremental", "semantic_dedup_embeddings",
    "dedup_simhash",
    "dedup_token_sort_fingerprint", "similarity_topk_lsh",
    "mixture_resample_docs", "lm_perplexity_scores",
    "pii_scrub_contacts", "pmi_bigrams", "bpe_pair_top",
    "tfidf_top_terms", "hll_sketch_rollup", "topk_sketch_rollup",
    "triangle_count_parts",
    "shuffle_export_shards", "weighted_sample_docs",
    "funnel_stages", "cohort_retention", "rfm_segmentation",
    "order_reconciliation",
]


# ROUND-14 ROTATION PLAN (for the next context): this round's 50
# slots are 4 plan-changed + the full 24-query round-9 cohort + 22
# round-10 fillers.  If CORRECTNESS_r13 comes back green, no query's
# latest check is older than round 10.  Next round: front any r13
# reds, then r14 plan-changed queries (round 14 is the second
# optimization round — regenerate PLANS_DIGEST.txt and diff), then
# the REMAINING round-10-checked queries (recompute mechanically
# from CORRECTNESS_r01-r13: the 50-query r10 cohort minus this
# round's 22 OLDEST_R10_FILLERS, starting with the two displaced
# entries stateful_user_totals and key_skew_profile), then
# round-11-checked fillers up to the 50-slot budget (heaviest/most-
# composite first, same rule as this round).  Keep must-check <= 50
# (tests/test_plans.py asserts it).
# To compute CHANGED_THIS_ROUND mechanically: `python
# tools/explain_audit.py --all` and diff against the committed
# PLANS_DIGEST.txt baseline — any moved digest line is a plan
# change that must be fronted; update the baseline in the same
# commit as the plan change.


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) round-12 red
    rows (none), (2) the four queries this optimization round's plan
    changes touched (digest-diff + the one expression-only change),
    (3) the full 24-query round-9-checked staleness cohort, (4) 22
    round-10-checked fillers.  0+4+24+22 = 50 exactly, so every red,
    plan-changed, or stale-since-r9 gate is inside this round's
    budget (asserted by tests/test_plans.py's rotation guard).
    """
    explicit = (
        R12_RED + CHANGED_THIS_ROUND + NEW_THIS_ROUND + OLDEST_R9
        + OLDEST_R10_FILLERS
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
