"""Sparse text retrieval over the corpus: inverted-index construction
and BM25 ranking, as distributed aggregates.

Training-data pipelines use lexical retrieval for curation (rank corpus
documents against quality seed queries), retrieval-based
decontamination, and hard-negative mining.  Both operators are pure
DataFrame aggregation/window plans over exploded tokens — no UDFs, no
driver state; the inverted index IS the relational (term, doc, tf)
aggregate, so "building the index" and "scoring a query" are the same
shuffle shapes as any keyed analytics.

BM25 background: Robertson & Zaragoza '09 (public); the idf variant is
Lucene's ``ln(1 + (N - df + 0.5)/(df + 0.5))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_tokens


def term_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) posting rows plus each document's word length
    ``dl`` — the relational inverted index.  One explode + one hash
    aggregate with map-side combine: the shuffle carries one row per
    distinct (term, doc) pair.  The token array is projected ONCE and
    reused for both dl and the explode — inlining word_tokens twice
    would tokenize every document two times in the index-build scan
    (the corpus-scale hot path)."""
    toks = df.select(
        F.col(id_col), word_tokens(text_col).alias("_t")
    ).select(
        id_col,
        F.size("_t").alias("dl"),
        F.explode("_t").alias("term"),
    )
    return toks.groupBy("term", id_col).agg(
        F.count("*").cast("long").alias("tf"),
        F.first("dl").alias("dl"),
    )


def inverted_index_topk(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k posting list per term, ranked by (tf desc, doc_id asc),
    with the term's document frequency — the truncated index a
    retrieval serving layer materializes.

    Per-term top-k runs as a rank window partitioned by term: the only
    shuffle is term-keyed, each term's postings sort locally, and the
    rank filter bounds output to k rows per term.  Skewed stopword terms
    are the known hazard at corpus scale — AQE skew handling plus the
    rank cutoff keep any one term's sort local and its output bounded."""
    posts = term_postings(df, text_col, id_col)
    dfreq = posts.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    w = Window.partitionBy("term").orderBy(
        F.desc("tf"), F.asc(id_col)
    )
    topk = (
        posts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("term", "rank", id_col, "tf")
    )
    return topk.join(dfreq, "term").select(
        "term", "df", "rank", id_col, "tf"
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 ranking of every document against a bag of query terms;
    returns the ``top`` docs by (rounded score desc, doc_id asc).

    Plan shape: postings are filtered to the query's terms BEFORE any
    shuffle (the filter prunes at the explode, so the aggregate only
    sees candidate rows); corpus constants (N, avgdl) and per-term df
    arrive via broadcast joins of one-row/tiny aggregates — the whole
    query costs one term-pruned aggregate plus a doc-keyed score sum,
    independent of vocabulary size."""
    posts = term_postings(df, text_col, id_col).filter(
        F.col("term").isin(query_terms)
    )
    dfreq = posts.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )
    stats = df.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(word_tokens(text_col))).alias("avgdl"),
    )
    scored = (
        posts.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_s"),
        )
    )
    # bm25_e3 (floor-scaled integer millis) is the ranking/gate column:
    # float sums accumulate in engine-specific order, so ordering or
    # hash-comparing the raw double makes the top-k cutoff
    # cross-engine nondeterministic.  The double stays for callers.
    return (
        scored.groupBy(id_col)
        .agg(F.sum("_s").alias("_sum"))
        .select(
            F.col(id_col),
            F.round("_sum", 4).alias("bm25"),
            F.floor(F.col("_sum") * 1000.0).cast("long").alias("bm25_e3"),
        )
        .orderBy(F.desc("bm25_e3"), F.asc(id_col))
        .limit(top)
    )
