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
# (CORRECTNESS_r01-r06 evidence).  Round-7 rotation (VERDICT r06 item
# 3): CORRECTNESS_r06 was 50/50 green with zero reds, so this round's
# budget goes to (1) the four queries whose PLAN or gate code changed
# this round (the store-backed incremental dedup path, the zero-norm
# guard in the LSH top-k re-rank, the timeout guards in the two
# availableNow stream gates), (2) ALL 35 queries whose latest driver
# check is round 3 — which happens to include the other two round-7
# plan changes (doc_repetition_stats, weighted_median_price) — then
# (3) round-4-checked fillers (reference surface first).
# 4+35+11 = 50, so after this round no registered query's latest
# driver check is older than round 4 except the three fillers the
# changed-gate re-proofs displaced (sequence_packing,
# embedding_gram_matrix, snapshot_diff — plans untouched for rounds,
# r4-green, front them in round 8).  No new queries this round —
# registered stays at 174 (VERDICT item 7: the round-7 work re-proves
# existing gates; the new store-maintenance/hygiene/recovery
# contracts are test-covered, not gate queries).


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-6 red rows: NONE (CORRECTNESS_r06 was 50/50 green).
R06_RED: list[str] = []

# Queries whose Spark plan CHANGED this round — green before, but the
# code they exercised no longer exists, so they must be re-proven.
# (doc_repetition_stats and weighted_median_price also changed — the
# zero-token dup_word_frac fix and the integer-weight cast — but both
# already sit in OLDEST_R3 below, so they are inside the budget.)
CHANGED_THIS_ROUND = [
    # store-backed incremental path, round-7 changes: the bucket probe
    # anti-joins batch ids and counts DISTINCT ids per bucket (crash-
    # heal duplicates benign), and the exact-verify corpus read pushes
    # the collected CORPUS-SIDE pair ids as a literal In filter
    # (MAX_VERIFY_ID_PUSHDOWN-guarded) instead of a semi-join
    "dedup_lsh_incremental",
    # round-7 self-review fixes: the exact re-rank gained the
    # zero-norm cosine guard (greatest(norm-product, 1e-12))
    "similarity_topk_lsh",
    # both availableNow stream gates now raise on awaitTermination
    # timeout instead of reading a partial memory sink — gate code
    # changed, so re-prove the success path
    "stateful_user_totals",
    "conversion_latency_percentiles",
]

# No additions this round — registered stays at 174 and the 50-slot
# budget goes to rotation (VERDICT r06 item 7).
NEW_THIS_ROUND: list[str] = []

# The 35 queries whose latest driver check is round 3 (recomputed from
# CORRECTNESS_r01-r06).  All inside this round's budget: after r7 no
# registered query's coverage is older than round 4.
OLDEST_R3 = [
    "basket_part_pairs_lift", "benchmark_decontamination",
    "bloom_incremental_dedup", "bm25_retrieval", "bpe_pair_top",
    "chunk_documents_boundary", "collect_order_arrays",
    "crosstab_status_priority", "cube_with_grouping_id",
    "decimal_money_totals", "dedup_edit_distance_blocked",
    "dedup_simhash", "dedup_token_sort_fingerprint",
    "deterministic_split_docs", "doc_repetition_stats",
    "dup_cluster_size_profile", "embedding_preprocess",
    "event_transition_matrix", "ewma_monthly_revenue",
    "feature_hash_vectors", "hll_sketch_rollup",
    "inverted_index_topk", "lm_perplexity_scores",
    "mad_robust_spread", "map_status_counts", "mixture_resample_docs",
    "percentile_summary", "pii_scrub_contacts",
    "semantic_dedup_embeddings", "skyline_price_quantity",
    "stratified_split_quotas", "tfidf_top_terms",
    "token_entropy_quality", "topk_sketch_rollup",
    "weighted_median_price",
]

# Remaining budget: round-4-checked fillers — the reference-surface
# family first (the core contract), then representative heavy lanes.
OLDEST_R4_FILLERS = [
    "ref_sales_summary", "ref_dedup_keep_last", "ref_upsert",
    "ref_union", "ref_validate_counts", "ref_date_format",
    "q1_pricing_summary", "udtf_keyvalue_explode",
    "pagerank_part_graph", "triangle_count_parts",
    "document_pipeline",
]


# ROUND-8 ROTATION PLAN (for the next context): this round's 50 slots
# are R06_RED(0) + CHANGED(4) + OLDEST_R3(35) + 11 r4 fillers.  If
# CORRECTNESS_r07 comes back green, no query's latest check is older
# than round 4.  Next round: front any r7 reds, then r8 plan-changed
# queries, then the REMAINING round-4-checked queries (45 minus this
# round's 11 fillers = 34, starting with the three displaced this
# round: sequence_packing, embedding_gram_matrix, snapshot_diff),
# then round-5-checked queries as they age.  Keep must-check <= 50
# (tests/test_plans.py asserts it).


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted (50-entry, dict-ordered)
    verification spends its budget where it matters: (1) round-6 red
    rows (none), (2) the four queries whose plan or gate code changed
    this round, (3) the 35 queries last driver-checked in round 3,
    (4) round-4 fillers.  0+4+35+11 = 50 exactly, so every red,
    changed, or stale-since-r3 gate is inside this round's budget
    (asserted by tests/test_plans.py's rotation guard).
    """
    explicit = (
        R06_RED + CHANGED_THIS_ROUND + NEW_THIS_ROUND + OLDEST_R3
        + OLDEST_R4_FILLERS
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
