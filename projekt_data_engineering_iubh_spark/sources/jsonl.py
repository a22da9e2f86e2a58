"""JSON-lines source/sink — the raw-corpus format LLM pipelines ingest.

Scale rules baked in:

* REQUIRED explicit schema — schema inference reads the whole dataset
  once before the real job (a 2× scan at 100 TB) and silently widens
  types on dirty data;
* ``PERMISSIVE`` parse mode with a ``_corrupt_record`` column: a single
  malformed line in a TB-scale crawl must quarantine, not kill the job.
  ``bad_records()`` splits them out so the pipeline can count/inspect;
* JSONL is splittable (newline-delimited, uncompressed or with a
  splittable codec), so scans parallelize per block — unlike multi-line
  JSON arrays which force one task per file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Read JSONL with an explicit schema; malformed lines land in
    ``_corrupt_record`` (all data columns null) instead of failing."""
    # fresh StructType: .add() mutates the caller's schema in place
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def good_records(df: DataFrame) -> DataFrame:
    """All schema-conforming rows, corrupt column dropped.

    Caveat: ``good_records(df).count()`` fails — Catalyst prunes every
    column but the filter's ``_corrupt_record``, tripping the same
    QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction documented on
    :func:`bad_records`. Count via an aggregate over a data column
    (e.g. ``select(count('some_col'))`` with ``isNotNull`` semantics in
    mind) or count after a materializing write."""
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def bad_records(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """The quarantine lane: raw text of every malformed line.

    Deliberately a SEPARATE text-scan + ``from_json`` probe rather than a
    filter on the main read's ``_corrupt_record``: Spark disallows plans
    that reference only the corrupt column
    ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN]) and the
    documented workaround — caching the parsed frame — is exactly what a
    100 TB ingest cannot do.

    A line is quarantined when ``get_json_object(value, '$')`` is NULL
    (syntactically unparseable) OR the line is a top-level JSON SCALAR
    (``42``, ``"x"``, ``true`` parse fine under get_json_object but are
    corrupt in the struct read — they don't start with ``{`` or ``[``).
    Blank lines are excluded: the main read skips them entirely, so
    they belong to neither lane. With those rules ``good_records +
    bad_records`` partitions the non-blank input, with two documented
    exceptions visible only to the schema-aware main read: (1) a valid
    object whose field TYPES mismatch the schema (a string where a
    long is declared), and (2) a top-level ARRAY whose elements aren't
    schema-conforming objects — Spark unwraps arrays of objects into
    one row per element, so arrays can't be classified schemalessly.
    Count both lanes when reconciling. (``from_json`` can't close the
    gap: PERMISSIVE mode yields an all-null struct for malformed
    input, indistinguishable from ``{}``.)"""
    del schema  # signature kept symmetric with read(); probe is schemaless
    txt = spark.read.text(path)
    return (
        txt.filter(F.trim(F.col("value")) != "")
        .filter(
            F.get_json_object("value", "$").isNull()
            | ~F.col("value").rlike(r"^\s*[\[{]")
        )
        .select(F.col("value").alias(CORRUPT_COL))
    )


def write(df: DataFrame, path: str, *, partitions: int | None = None) -> None:
    """Write JSONL (one object per line); optional coalesce for few
    large output files vs many small ones."""
    out = df.coalesce(partitions) if partitions else df
    out.write.mode("overwrite").json(path)
