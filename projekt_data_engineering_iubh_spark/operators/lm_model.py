"""Bigram language-model quality scoring (the CCNet-style perplexity
signal) — fit + score as composable DataFrame/SQL builders.

Laplace-smoothed bigram LM fit on a corpus; each document scored by its
average negative log-likelihood (low = fluent/common phrasing, high =
noise). Per-BIGRAM-TYPE negative log-probs are floor-quantized to
integer micro-units at fit time (ln is not correctly-rounded
cross-engine), so per-doc sums are exact bigints and the final average
is one exact-over-exact division — deterministic on both engines.

Lives in operators/ (not plans/) so BOTH query modules can compose it
without a circular import — the same layering as
operators/quality_model.py, its naive-Bayes sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from projekt_data_engineering_iubh_spark.functions import text as tx

_LM_SCALE = 1_000_000  # micro-units per log-unit (same policy as the NB model)


def lm_sql_ctes(base_rel: str, prefix: str = "lm") -> tuple[str, str]:
    """CTE chain fitting the Laplace-smoothed bigram LM on ``base_rel``
    and scoring its docs; returns (fragment, final scores CTE name).
    Namespaced by ``prefix`` so it composes into larger statements (the
    corpus-lane oracle)."""
    P = prefix
    frag = f"""{P}toks AS (
  SELECT doc_id, {tx.tokens_sql('text')} AS toks FROM {base_rel}
), {P}bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bigram,
         unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1
  FROM {P}toks WHERE len(toks) >= 2
), {P}cb AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c FROM {P}bi GROUP BY 1
), {P}cu AS (
  SELECT w1, CAST(COUNT(*) AS BIGINT) AS c FROM {P}bi GROUP BY 1
), {P}v AS (
  SELECT COUNT(DISTINCT w1) AS v FROM {P}bi
), {P}w AS (
  SELECT {P}cb.bigram,
         CAST(floor(-ln(CAST({P}cb.c + 1 AS DOUBLE) / CAST({P}cu.c + {P}v.v AS DOUBLE))
                    * {float(_LM_SCALE)}) AS BIGINT) AS nll
  FROM {P}cb JOIN {P}cu ON {P}cu.w1 = split_part({P}cb.bigram, ' ', 1)
  CROSS JOIN {P}v
), {P}sc AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(w.nll) AS BIGINT) AS nll_micro_sum,
         CAST(SUM(w.nll) AS DOUBLE) / COUNT(*) AS avg_nll_micro
  FROM {P}bi b JOIN {P}w w ON w.bigram = b.bigram
  GROUP BY 1
)"""
    return frag, f"{P}sc"


# Corpus-lane threshold: keep docs at or below ~the p75 of the measured
# avg-NLL distribution on the driver tables (3.35-3.42e6 micro across
# SFs) — the CCNet posture of dropping the high-perplexity tail. Docs
# with <2 tokens have no LM score and are dropped by the lane (fluency
# is unassessable).
LM_MAX_NLL_MICRO = 3_400_000


def lm_scores_from(d: DataFrame) -> DataFrame:
    """Per-doc bigram-LM scores for any (doc_id, text, ...) frame — the
    fit+score body shared by the registered query and the corpus lane
    (pipeline/corpus.py scorer="lm"); mirrors :func:`lm_sql_ctes`."""
    t = d.select("doc_id", tx.tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    n = F.size("toks")
    bi = t.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, n - 1),
                F.slice(F.col("toks"), 2, n - 1),
                lambda a, b: F.struct(
                    a.alias("w1"), F.concat_ws(" ", a, b).alias("bigram")
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.bigram")

    cb = bi.groupBy("bigram").agg(F.count(F.lit(1)).alias("cb"))
    cu = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    v = bi.agg(F.count_distinct("w1").alias("v"))
    w = (
        cb.withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(cu, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "bigram",
            F.floor(
                -F.ln(
                    (F.col("cb") + F.lit(1)).cast("double")
                    / (F.col("cu") + F.col("v")).cast("double")
                )
                * F.lit(float(_LM_SCALE))
            )
            .cast("long")
            .alias("nll"),
        )
    )
    return (
        bi.join(w, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll").alias("nll_micro_sum"),
            (F.sum("nll").cast("double") / F.count(F.lit(1))).alias(
                "avg_nll_micro"
            ),
        )
    )

