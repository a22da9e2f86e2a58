"""Stream-stream watermarked interval join — conversion attribution.

The one Structured Streaming join shape the engine did not yet cover
(hourly_stream: windowed agg; sessionize_stream: applyInPandasWithState;
neardup/corpus: foreachBatch vs static state): joining TWO live streams.
The example is the classic attribution query over the `events` schema —
each purchase matched to the same user's preceding views within an
attribution horizon.

State-bounding contract (Spark's stream-stream join requirements, both
satisfied here so state is provably bounded):

* both sides carry an event-time WATERMARK, and
* the join condition bounds the two event times against each other
  (``view.ts ∈ [purchase.ts - horizon, purchase.ts]``), so each side's
  buffered rows are dropped once the other side's watermark passes the
  interval — state is O(horizon × arrival rate), never unbounded.

Inner joins emit as soon as both sides arrive. The LEFT OUTER variant
(views that never converted, the funnel-loss feed) additionally emits
null-matched rows only AFTER the watermark passes the view's interval
end — the same emission-on-watermark semantics as append-mode window
aggregates, and the reason the tests nudge event time forward to flush.

Batch parity: :func:`attribute` is the pure plan builder shared by both
modes — the streaming tests pin the multi-drop live result to the same
function applied to static frames (the repo-wide stream/batch parity
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_HORIZON = "30 minutes"


def attribute(
    views: DataFrame,
    purchases: DataFrame,
    *,
    horizon: str = DEFAULT_HORIZON,
    how: str = "inner",
    watermark: str | None = None,
) -> DataFrame:
    """Join purchases to the same user's preceding views within
    ``horizon``. Expects (user_id, ts, value) on both sides — use
    :func:`split_events` to derive them from the events schema.

    ``watermark``: set for STREAMING inputs (required by Spark for
    stream-stream joins; also the outer-variant's emission clock). Leave
    None for batch frames — the plan is identical otherwise, which is
    what the parity tests rely on.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if watermark is not None:
        v = v.withWatermark("view_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")
        )
    )
    joined = v.join(p, cond, how)
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_ts",
        "view_value",
        "purchase_ts",
        "purchase_value",
    )


def split_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(views, purchases) slices of the events schema
    (user_id, ts, event_type, value)."""
    base = events.select("user_id", "ts", "value", "event_type")
    return (
        base.filter(F.col("event_type") == "view").drop("event_type"),
        base.filter(F.col("event_type") == "purchase").drop("event_type"),
    )


def start_attribution_stream(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    *,
    horizon: str = DEFAULT_HORIZON,
    watermark: str = DEFAULT_HORIZON,
    how: str = "inner",
):
    """Wire the live attribution join over a streaming events frame and
    return the StreamingQuery (append sink: every attributed pair exactly
    once per arrival; outer nulls on watermark passage)."""
    views, purchases = split_events(events)
    out = attribute(
        views, purchases, horizon=horizon, how=how, watermark=watermark
    )
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .start()
    )
