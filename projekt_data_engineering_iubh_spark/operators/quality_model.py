"""Trained document-quality classifier: DataFrame-native naive Bayes.

Upgrades the 3-term hand-weighted heuristic (plans/text_queries.py
``quality_score_expr``) to a TRAINED token model, the fastText/CCNet
pattern reduced to its Spark-native kernel: CCNet scores documents by a
model trained on a reference "good" corpus; here the reference slices
are bootstrapped from the existing heuristic (score ≥ GOOD_T → good,
≤ BAD_T → bad, the ambiguous middle left unlabeled), so the model
generalizes the heuristic's signal to token level — docs the heuristic
can't separate get classified by which tokens they share with clearly
good/bad text.

Shapes (everything UDF-free, same discipline as the emb_* operators):

* FIT = two groupBy aggregates: per-token class counts (explode →
  groupBy(token) with conditional sums — map-side partial combine, one
  shuffle of (token, cg, cb)) and the 6 corpus scalars (token totals,
  vocab size, doc priors — ONE row, broadcast back, never a driver
  collect in the plan);
* PREDICT = explode → broadcast/equi JOIN on token → per-doc sum — the
  sparse dot-product w·x, the same join-then-aggregate shape as the
  dense ``emb_*`` scorers.

Cross-engine determinism: ``ln`` is the one operation NOT guaranteed
correctly-rounded across engines (NEXT.md trap list), so raw log-prob
sums would hash-mismatch the DuckDB oracle. Each per-token log-weight is
therefore floor-quantized ONCE (at fit time, per vocab entry — not per
occurrence) to integer micro-units:

    w(t)  = floor(1e6 · [ln((cg+1)/(Ng+V)) − ln((cb+1)/(Nb+V))])

after which every downstream sum is exact bigint arithmetic. A 1-ULP
``ln`` divergence flips a weight only if the true value lies within
~1e-16 of a 1e-6 grid edge — per vocab token, not per document.

Laplace-smoothed multinomial NB (all public-textbook):
unseen tokens take the cg=cb=0 weight; the prior is the quantized
log-ratio of labeled doc counts; pred = sign of the micro-unit sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from projekt_data_engineering_iubh_spark.functions import text as tx
from projekt_data_engineering_iubh_spark.functions.text import (
    PUNCT_RE as _PUNCT_RE,
    STOPWORDS_SQL as _STOPWORDS_SQL,
    quality_score_expr,
    quality_score_sql,
    stopword_count_expr,
)

GOOD_T = 0.75  # heuristic score ≥ → bootstrap label "good"
BAD_T = 0.45  # heuristic score ≤ → bootstrap label "bad"
SCALE = 1_000_000  # micro-units per log-unit


def _labeled(d: DataFrame) -> DataFrame:
    """(doc_id, toks, label) for the unambiguous slices; docs between the
    thresholds carry label NULL (excluded from fit, scored at predict)."""
    toks = tx.tokens(F.col("text"))
    st = d.select(
        "doc_id",
        toks.alias("toks"),
        F.size(toks).alias("_nt"),
        F.length("text").alias("_nc"),
        F.regexp_count("text", F.lit(_PUNCT_RE)).alias("_punct"),
        stopword_count_expr(toks).alias("_stop"),
    ).filter(F.col("_nt") > 0)
    score = quality_score_expr(
        F.col("_nt"), F.col("_nc"), F.col("_punct"), F.col("_stop")
    )
    return st.select(
        "doc_id",
        "toks",
        F.when(score >= GOOD_T, "good")
        .when(score <= BAD_T, "bad")
        .alias("label"),
    )


def _quantized_weight(cg: F.Column, cb: F.Column, ng, nb, v) -> F.Column:
    """floor(1e6·[ln((cg+1)/(Ng+V)) − ln((cb+1)/(Nb+V))]) as bigint."""
    lg = F.ln((cg + F.lit(1)).cast("double") / (ng + v).cast("double"))
    lb = F.ln((cb + F.lit(1)).cast("double") / (nb + v).cast("double"))
    return F.floor((lg - lb) * F.lit(float(SCALE))).cast("long")


def fit_predict(d: DataFrame) -> DataFrame:
    """Self-bootstrap fit + full-corpus predict →
    (doc_id, score_micro, pred).

    The labeled/tokenized frame is materialized ONCE (r14, guide §2.2):
    three consumers read it — the per-token class counts, the corpus
    scalars, and the predict scoring — and as lazy subtrees each re-ran
    the tokenizer + heuristic labeling over the corpus (the tokenize
    passes, not the aggregates, dominated the fit: measured 2.43 →
    1.35 s for the model quality lane at sf0.1). One corpus-sized
    checkpoint write buys back two full tokenization scans; at cluster
    scale configure a checkpoint dir (same note as
    operators/connected_components.py)."""
    lab = _labeled(d).localCheckpoint(eager=True)
    occur = lab.select("doc_id", "label", F.explode("toks").alias("token"))
    fit_occur = occur.filter(F.col("label").isNotNull())

    counts = fit_occur.groupBy("token").agg(
        F.count(F.when(F.col("label") == "good", 1)).alias("cg"),
        F.count(F.when(F.col("label") == "bad", 1)).alias("cb"),
    )
    # the 6 corpus scalars, one row — crossJoin(broadcast(·)) keeps the
    # plan lazy and cluster-side (never a driver round-trip)
    scalars = fit_occur.agg(
        F.count(F.when(F.col("label") == "good", 1)).alias("ng"),
        F.count(F.when(F.col("label") == "bad", 1)).alias("nb"),
        F.count_distinct("token").alias("v"),
        F.count_distinct(
            F.when(F.col("label") == "good", F.col("doc_id"))
        ).alias("dg"),
        F.count_distinct(
            F.when(F.col("label") == "bad", F.col("doc_id"))
        ).alias("db"),
    )

    weights = counts.crossJoin(F.broadcast(scalars)).select(
        "token",
        _quantized_weight(
            F.col("cg"), F.col("cb"), F.col("ng"), F.col("nb"), F.col("v")
        ).alias("w"),
    )

    scored = (
        occur.select("doc_id", "token")
        .join(weights, "token", "left")
        .crossJoin(F.broadcast(scalars))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.coalesce(
                    F.col("w"),
                    # unseen token: the cg=cb=0 smoothed weight
                    _quantized_weight(
                        F.lit(0), F.lit(0), F.col("ng"), F.col("nb"), F.col("v")
                    ),
                )
            ).alias("tok_sum"),
            F.min(
                # degenerate bootstrap (no doc beyond one threshold) would
                # make ln(dg/db) ±Infinity → CAST_OVERFLOW under ANSI or a
                # silent all-'bad' corpus under non-ANSI; fail loudly with
                # the actionable cause instead
                F.when(
                    (F.col("dg") > 0) & (F.col("db") > 0),
                    F.floor(
                        F.ln(
                            F.col("dg").cast("double")
                            / F.col("db").cast("double")
                        )
                        * F.lit(float(SCALE))
                    ).cast("long"),
                ).otherwise(
                    F.raise_error(
                        F.format_string(
                            "quality model: bootstrap slices empty "
                            "(good docs=%s, bad docs=%s) — the heuristic "
                            "thresholds found no unambiguous training "
                            "slice; adjust GOOD_T/BAD_T or use the "
                            "heuristic scorer",
                            F.col("dg"),
                            F.col("db"),
                        )
                    ).cast("long")
                )
            ).alias("prior"),
        )
    )
    return scored.select(
        "doc_id",
        (F.col("tok_sum") + F.col("prior")).alias("score_micro"),
        F.when(F.col("tok_sum") + F.col("prior") > 0, "good")
        .otherwise("bad")
        .alias("pred"),
    )


def model_quality_filter(d: DataFrame) -> DataFrame:
    """``d`` restricted to docs the trained model classifies good — the
    drop-in alternative quality lane for pipeline/corpus.py."""
    keep = fit_predict(d).filter(F.col("pred") == "good").select("doc_id")
    return d.join(keep, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# DuckDB oracle: same fit, same quantization, same predict
# ---------------------------------------------------------------------------

def quality_model_ctes(src: str = "documents") -> str:
    """The fit+predict CTE chain over ``src`` (ending in ``scored``) —
    parameterized so composed oracles (the model-scored corpus pipeline)
    can fit the model on a filtered slice, exactly as
    :func:`model_quality_filter` does on the Spark side."""
    return f"""st AS (
  SELECT doc_id, {tx.tokens_sql('text')} AS toks,
         CAST(len({tx.tokens_sql('text')}) AS INTEGER) AS nt,
         CAST(length(text) AS INTEGER) AS nc,
         CAST(len(regexp_extract_all(text, '{_PUNCT_RE}')) AS INTEGER) AS punct,
         CAST(len(list_filter({tx.tokens_sql('text')},
              t -> list_contains({_STOPWORDS_SQL}, t))) AS INTEGER) AS stop
  FROM {src}
), lab AS (
  SELECT doc_id, toks,
         CASE WHEN ({quality_score_sql('nt', 'nc', 'punct', 'stop')}) >= {GOOD_T}
              THEN 'good'
              WHEN ({quality_score_sql('nt', 'nc', 'punct', 'stop')}) <= {BAD_T}
              THEN 'bad' END AS label
  FROM st WHERE nt > 0
), occur AS (
  SELECT doc_id, label, unnest(toks) AS token FROM lab
), counts AS (
  SELECT token,
         COUNT(*) FILTER (WHERE label = 'good') AS cg,
         COUNT(*) FILTER (WHERE label = 'bad') AS cb
  FROM occur WHERE label IS NOT NULL GROUP BY token
), scalars AS (
  SELECT COUNT(*) FILTER (WHERE label = 'good') AS ng,
         COUNT(*) FILTER (WHERE label = 'bad') AS nb,
         COUNT(DISTINCT token) AS v,
         COUNT(DISTINCT doc_id) FILTER (WHERE label = 'good') AS dg,
         COUNT(DISTINCT doc_id) FILTER (WHERE label = 'bad') AS db
  FROM occur WHERE label IS NOT NULL
), weights AS (
  SELECT token,
         CAST(floor((ln(CAST(cg + 1 AS DOUBLE) / CAST(ng + v AS DOUBLE))
                   - ln(CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE)))
                    * {float(SCALE)}) AS BIGINT) AS w
  FROM counts CROSS JOIN scalars
), scored AS (
  SELECT o.doc_id,
         SUM(coalesce(w.w,
             CAST(floor((ln(1.0 / CAST(s.ng + s.v AS DOUBLE))
                       - ln(1.0 / CAST(s.nb + s.v AS DOUBLE)))
                        * {float(SCALE)}) AS BIGINT))) AS tok_sum,
         CAST(floor(ln(CAST(MIN(s.dg) AS DOUBLE) / CAST(MIN(s.db) AS DOUBLE))
                    * {float(SCALE)}) AS BIGINT) AS prior
  FROM occur o
  LEFT JOIN weights w ON w.token = o.token
  CROSS JOIN scalars s
  GROUP BY o.doc_id
)"""


QUALITY_MODEL_SQL = (
    "WITH "
    + quality_model_ctes("documents")
    + f"""
SELECT doc_id,
       -- DuckDB SUM(BIGINT) promotes to HUGEINT, which the compare layer
       -- stringifies as a float — pin the engine-portable width
       CAST(tok_sum + prior AS BIGINT) AS score_micro,
       CASE WHEN tok_sum + prior > 0 THEN 'good' ELSE 'bad' END AS pred
FROM scored
"""
)
