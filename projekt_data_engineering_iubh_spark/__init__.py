"""PySpark-native analytics engine with the query and data-processing
capabilities of ``tim-e-0110/projekt-data_engineering_iubh``.

The reference (read-only snapshot at /root/reference) is a daily-batch
PySpark 3.5 + Postgres pipeline over semiconductor die-bonder event logs.
This package re-expresses its full operator surface (SURVEY.md §2)
Spark-first — DataFrame/SQL plans optimized by Catalyst — and extends it
with the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) and a Structured Streaming variant.

Layout:
    session       SparkSession factory (UTC, AQE, tuned shuffle partitions)
    catalog       loaders for the driver's parquet tables
    operators/    sessionization, threshold rules, rollups, dedup, similarity
    functions/    portable scalar/array helpers (hashing, text, vectors)
    sources/      csv / parquet / jdbc readers & writers
    plans/        the query catalog: (Spark plan, DuckDB oracle SQL) pairs
    pipeline/     reference-parity daily aggregator + deterministic generator
    streaming/    Structured Streaming variants of the batch semantics
    multimodal/   binary-column (image/audio/video) plumbing, decode stubbed
"""

__version__ = "0.1.0"
