"""Sources & sinks (SURVEY.md §2.1).

csv: schema'd CSV scans (S1). parquet: partitioned parquet storage with
idempotent per-partition overwrite (the native analog of S3's documented
staging+merge). jdbc: JDBC scan/append plus the staging + ON CONFLICT
upsert the reference README promises (D1) — gated on a JDBC driver being
present on the classpath.
"""
