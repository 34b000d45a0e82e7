"""PySpark-native analytics engine with the capability surface of the
reference pipeline (rehaq007/Enterprise-Sales-Data-Pipeline-using-AWS-Lambda).

The reference is a single-file pandas ETL running in AWS Lambda
(``lambda.py:1-266`` in the reference repo): ingest CSV/JSON, validate,
quarantine-or-write-Parquet, append log, keyed keep-last upsert, and a
per-country aggregate.  This package re-expresses each capability as
composable, lazily-planned PySpark DataFrame operators designed for a
multi-executor cluster at 100 TB scale, plus the analytics / streaming /
LLM-data-pipeline extensions described in SURVEY.md §7.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, shuffle partitions, Arrow)
- ``schema``     : explicit StructTypes (sales fact + star-schema test tables)
- ``sources``    : format-dispatch readers (CSV/JSON/Parquet) and partitioned
                   / quarantine / jdbc-style writers
- ``operators``  : validation, dedup (exact/keyed/minhash/simhash), upsert,
                   aggregation, text analysis, similarity search, multimodal
- ``functions``  : scalar helpers (date parse/format, hashing, tokenization)
- ``plans``      : full analytical queries (TPC-H-shaped) used by the bench
- ``streaming``  : Structured Streaming ingest + windowed aggregates
- ``pipeline``   : batch runner reproducing the reference's end-to-end flow
"""

__version__ = "0.1.0"
