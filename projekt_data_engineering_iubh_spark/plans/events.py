"""Reference-semantics queries transplanted onto the driver's `events` table.

Mapping (FIXTURES.md §2): ``ts → event_timestamp``, ``user_id → machine_id``,
``event_type → event_name``, ``'signup' → Cycle_Start`` marker. These queries
reproduce, one-to-one, the operator core of the reference job
(``/root/reference/src/daily_aggregator.py``): running-count sessionization
(W1, :33-43), session boundary aggregation (A1/P11, :51-62), hourly
conditional rollup (A2/A3, :193-232), threshold-rule error flags
(P12, :70-116), and the full-outer join + zero-fill (J3/P15, :234-243).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table
from projekt_data_engineering_iubh_spark.functions import numeric
from projekt_data_engineering_iubh_spark.operators.asof import asof_join
from projekt_data_engineering_iubh_spark.operators.rules import (
    rules_to_sql_predicate,
    with_error_flag,
)
from projekt_data_engineering_iubh_spark.operators.sessionize import (
    session_bounds,
    with_session_seq,
)
from projekt_data_engineering_iubh_spark.plans.registry import register

SESSION_MARKER = "signup"

# Threshold rules over events.value, scoped by event_type — the analog of
# config/schwellwerte.json + PARAMETER_EVENT_MAPPING (daily_aggregator.py:21-28).
EVENT_RULES = {
    "_comment": "underscore keys are skipped, like the reference",
    "purchase_value_high": {"error_if_above": 300.0},
    "error_value_range": {"error_if_outside_range": [50.0, 250.0]},
    "click_value_low": {"error_if_below": 1.0},
}
EVENT_RULE_MAPPING = {
    "purchase_value_high": {"event_type": "purchase"},
    "error_value_range": {"event_type": "error"},
    "click_value_low": {"event_type": "click"},
}

_SESSIONIZE_SQL = f"""
SELECT event_id, user_id, ts, event_type,
       CAST(SUM(CASE WHEN event_type = '{SESSION_MARKER}' THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
FROM events
"""

_BOUNDS_SQL = f"""
WITH sess AS ({_SESSIONIZE_SQL})
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
       (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0 AS duration_sec
FROM sess WHERE session_seq > 0
GROUP BY user_id, session_seq
"""


def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return with_session_seq(
        ev,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        is_marker=F.col("event_type") == SESSION_MARKER,
    )


_SESSIONIZE_BOTH_SQL = f"""
WITH g AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(SUM(CASE WHEN event_type = '{SESSION_MARKER}' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS session_seq,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
)
SELECT event_id, user_id, ts, event_type, session_seq,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS gap_session
FROM g
"""


@register("events_sessionize", oracle=_SESSIONIZE_BOTH_SQL, driver=False)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: running-count marker sessionization with a stable tiebreaker,
    plus the idle-timeout (gap > 30 min) variant in the same plan — both
    cumulative-sum windows share one shuffle+sort over (user_id; ts,
    event_id), so merging them adds no exchange (registry curation,
    VERDICT r1 next-round #3; streaming analog is ``session_window``)."""
    sess = _sessionized(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev = F.lag(us).over(w)
    flagged = sess.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "session_seq",
        F.when(prev.isNull() | ((us - prev) > 1_800_000_000), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "session_seq",
        F.sum("is_new").over(w).alias("gap_session"),
    )


@register("events_session_stats", oracle=_BOUNDS_SQL, driver=False)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 + P11: per-session boundaries, counts, exact integer-µs duration."""
    return session_bounds(
        _sessionized(spark, sf_dir), keys=["user_id"], ts_col="ts"
    ).select(
        "user_id",
        "session_seq",
        "session_start",
        "session_end",
        "n_events",
        "duration_us",
        "duration_sec",
    )


_HOURLY_SQL = """
SELECT CAST(ts AS DATE) AS event_date,
       CAST(hour(ts) AS INTEGER) AS event_hour,
       COUNT(*) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value,
       CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN value END) > 0
            THEN {avg_purchase}
       END AS avg_purchase_value,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
       ROUND(MAX(CASE WHEN event_type = 'view' THEN value END), 4) AS max_view_value,
       ROUND(MIN(CASE WHEN event_type = 'view' THEN value END), 4) AS min_view_value
FROM events
GROUP BY 1, 2
""".format(
    avg_purchase=numeric.half_up_4dp_sql(
        "CAST(SUM(CASE WHEN event_type = 'purchase' "
        "THEN CAST(value AS DECIMAL(12,2)) END) * 100 AS BIGINT)",
        "COUNT(CASE WHEN event_type = 'purchase' THEN value END)",
    )
)


def _hourly_rollup(ev: DataFrame) -> DataFrame:
    is_purchase = F.col("event_type") == "purchase"
    is_view = F.col("event_type") == "view"
    out = ev.groupBy(
        F.to_date("ts").alias("event_date"),
        F.hour("ts").alias("event_hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.when(is_purchase, 1).otherwise(0)).alias("n_purchases"),
        F.sum(F.when(is_purchase, F.col("value").cast("decimal(12,2)")))
        .cast("double")
        .alias("purchase_value"),
        # exact sum-of-cents + non-null count feed the half-up average below
        (
            F.sum(F.when(is_purchase, F.col("value").cast("decimal(12,2)"))) * 100
        )
        .cast("long")
        .alias("_pcents"),
        F.count(F.when(is_purchase, F.col("value"))).alias("_pn"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
        F.round(F.max(F.when(is_view, F.col("value"))), 4).alias("max_view_value"),
        F.round(F.min(F.when(is_view, F.col("value"))), 4).alias("min_view_value"),
    )
    # Exact-arithmetic half-up rounding: the average of the exact
    # sum-of-cents over the exact non-null count, rounded to 4 dp ENTIRELY
    # in integer arithmetic (functions/numeric.py::half_up_4dp, sign-robust
    # since r7 — purchase `value` is not schema-constrained non-negative).
    # The previous formulation (ROUND(double_sum / n, 4)) is cross-engine
    # divergent at rounding boundaries: at sf1 one group's exact average
    # is 56.64625, the double quotient is 56.6462499999…, Spark's
    # BigDecimal-exact HALF_UP rounds it DOWN while DuckDB's
    # multiply-by-1e4 product lands exactly on the double 566462.5 and
    # rounds UP. Integer DIV is deterministic and identical on both
    # engines and equals the true HALF_UP of the exact rational
    # (r6 sf1-scale audit; oracle mirrors with DuckDB's //).
    return out.withColumn(
        "avg_purchase_value",
        F.when(F.col("_pn") > 0, numeric.half_up_4dp("_pcents", "_pn")),
    ).select(
        "event_date",
        "event_hour",
        "n_events",
        "n_users",
        "n_purchases",
        "purchase_value",
        "avg_purchase_value",
        "n_errors",
        "max_view_value",
        "min_view_value",
    )


@register("events_hourly_rollup", oracle=_HOURLY_SQL, driver=False)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: hourly conditional (long→wide) aggregation, the reference's
    13-aggregate pivot (daily_aggregator.py:216-232) on events columns."""
    return _hourly_rollup(load_table(spark, sf_dir, "events"))


_ERRORS_SQL = f"""
SELECT event_id, event_type, value,
       CASE WHEN {rules_to_sql_predicate(EVENT_RULES, EVENT_RULE_MAPPING)}
            THEN 1 ELSE 0 END AS is_error
FROM events
"""


@register("events_threshold_errors", oracle=_ERRORS_SQL, driver=False)
def events_threshold_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: config-compiled threshold predicates → is_error flag."""
    ev = load_table(spark, sf_dir, "events")
    return with_error_flag(ev, EVENT_RULES, EVENT_RULE_MAPPING).select(
        "event_id", "event_type", "value", "is_error"
    )


_FLAGSHIP_SQL = f"""
WITH bounds AS ({_BOUNDS_SQL}),
sess_hourly AS (
  SELECT CAST(session_start AS DATE) AS event_date,
         CAST(hour(session_start) AS INTEGER) AS event_hour,
         COUNT(*) AS n_sessions,
         CAST(CAST(SUM(duration_us) AS BIGINT) AS DOUBLE)
           / (1000000.0 * COUNT(*)) AS avg_session_sec,
         CAST(MIN(duration_us) AS DOUBLE) / 1000000.0 AS min_session_sec,
         CAST(MAX(duration_us) AS DOUBLE) / 1000000.0 AS max_session_sec
  FROM bounds GROUP BY 1, 2
),
ev_hourly AS ({_HOURLY_SQL})
SELECT coalesce(e.event_date, s.event_date) AS event_date,
       coalesce(e.event_hour, s.event_hour) AS event_hour,
       coalesce(e.n_events, 0) AS n_events,
       coalesce(e.n_users, 0) AS n_users,
       coalesce(e.n_purchases, 0) AS n_purchases,
       coalesce(e.purchase_value, 0.0) AS purchase_value,
       coalesce(e.avg_purchase_value, 0.0) AS avg_purchase_value,
       coalesce(e.n_errors, 0) AS n_errors,
       coalesce(e.max_view_value, 0.0) AS max_view_value,
       coalesce(e.min_view_value, 0.0) AS min_view_value,
       coalesce(s.n_sessions, 0) AS n_sessions,
       coalesce(s.avg_session_sec, 0.0) AS avg_session_sec,
       coalesce(s.min_session_sec, 0.0) AS min_session_sec,
       coalesce(s.max_session_sec, 0.0) AS max_session_sec
FROM ev_hourly e
FULL OUTER JOIN sess_hourly s
  ON e.event_date = s.event_date AND e.event_hour = s.event_hour
"""

_FLAGSHIP_COUNT_COLS = ["n_events", "n_users", "n_purchases", "n_errors", "n_sessions"]
_FLAGSHIP_DOUBLE_COLS = [
    "purchase_value",
    "avg_purchase_value",
    "max_view_value",
    "min_view_value",
    "avg_session_sec",
    "min_session_sec",
    "max_session_sec",
]


@register("events_flagship_session_rollup", oracle=_FLAGSHIP_SQL, headline=True)
def events_flagship_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7 phase A): sessionize → session boundary agg →
    hourly conditional rollup → full-outer join + zero-fill. Exercises the
    reference's entire operator core in one plan."""
    ev = load_table(spark, sf_dir, "events")
    sess = with_session_seq(
        ev,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        is_marker=F.col("event_type") == SESSION_MARKER,
    )
    bounds = session_bounds(sess, keys=["user_id"], ts_col="ts")
    sess_hourly = bounds.groupBy(
        F.to_date("session_start").alias("event_date"),
        F.hour("session_start").alias("event_hour"),
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        (
            F.sum("duration_us").cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1)))
        ).alias("avg_session_sec"),
        (F.min("duration_us") / F.lit(1000000.0)).alias("min_session_sec"),
        (F.max("duration_us") / F.lit(1000000.0)).alias("max_session_sec"),
    )
    ev_hourly = _hourly_rollup(ev)
    out = ev_hourly.join(sess_hourly, on=["event_date", "event_hour"], how="outer")
    return out.na.fill(0, subset=_FLAGSHIP_COUNT_COLS).na.fill(
        0.0, subset=_FLAGSHIP_DOUBLE_COLS
    )


_DATES_SQL = "SELECT DISTINCT CAST(ts AS DATE) AS event_date FROM events"


@register("events_distinct_dates", oracle=_DATES_SQL)
def events_distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: DISTINCT projection (dashboard available-dates query)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(F.to_date("ts").alias("event_date")).distinct()


_DAY_SLICE_SQL = """
SELECT event_id, ts, user_id, event_type, value
FROM events
WHERE CAST(ts AS DATE) = DATE '2024-01-15'
"""


@register("events_day_slice", oracle=_DAY_SLICE_SQL)
def events_day_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: parameterized day-slice scan (dashboard), partition-prunable when
    the summary is stored partitioned by date."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.to_date("ts") == F.lit("2024-01-15").cast("date")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


_HAVING_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
"""


@register("agg_having", oracle=_HAVING_SQL)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): heavy-hitter customers."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


_MAP_FUNCS_SQL = """
SELECT event_id,
       array_to_string(json_keys(props), ',') AS prop_keys,
       CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
FROM events
"""


@register("events_map_funcs", oracle=_MAP_FUNCS_SQL)
def events_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: from_json → map, map_keys, element access
    (keys stringified for cross-engine comparison), plus path-based JSON
    extraction (``get_json_object``) on the raw string — both JSON access
    styles in one driver entry (registry curation)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        m.getItem("k").alias("k_value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


_SALTED_AGG_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum,
       MIN(value) AS value_min,
       MAX(value) AS value_max
FROM events GROUP BY event_type
"""


@register("events_salted_agg", oracle=_SALTED_AGG_SQL, driver=False)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage salted aggregation (operators/skew.py): 16
    random sub-keys per group aggregated in parallel, partials combined —
    result identical to a plain groupBy (the oracle), which is the point."""
    from projekt_data_engineering_iubh_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(12,2)")
    )
    out = salted_aggregate(
        ev,
        ["event_type"],
        [
            ("n", "event_type", "count"),
            ("value_sum_dec", "value_dec", "sum"),
            ("value_min", "value", "min"),
            ("value_max", "value", "max"),
        ],
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n",
        F.col("value_sum_dec").cast("double").alias("value_sum"),
        "value_min",
        "value_max",
    )


_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS asof_ts, r.event_id AS asof_event_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (
  SELECT user_id, ts, MAX(event_id) AS event_id
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
) r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


@register("events_asof_join", oracle=_ASOF_SQL, driver=False)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each purchase gets the most recent
    signup at-or-before it per user — union-and-carry composition, one
    shuffle; DuckDB's native ASOF JOIN is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
    )
    return asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload=["ts", "event_id"],
    ).select("event_id", "user_id", "ts", "asof_ts", "asof_event_id")


_RANGE_FRAME_SQL = """
SELECT event_id, user_id, ts,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
         AS n_last_5min
FROM events
"""


@register("events_window_range_frame", oracle=_RANGE_FRAME_SQL, driver=False)
def events_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: events per user in the trailing
    5 minutes, ordered by integer-µs event time."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-300_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts", F.count(F.lit(1)).over(w).alias("n_last_5min")
    )


_RANGE_JOIN_SQL = """
SELECT a.event_id AS id_a, b.event_id AS id_b,
       (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS diff_sec
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
"""


@register("events_range_join", oracle=_RANGE_JOIN_SQL, driver=False)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (|Δts| ≤ 60s per user) via minute-bucketization: explode
    one side into its bucket ±1, equi-join on (user, bucket), then filter
    exactly — the linear-time pattern for interval joins (a theta-join
    would be quadratic per user at scale)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    bucketed = ev.withColumn("bucket", F.expr("us div 60000000"))
    exploded = bucketed.select(
        "event_id",
        "user_id",
        "us",
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("bucket"),
    )
    a = exploded.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.event_id") < F.col("b.event_id")),
        )
        .filter(F.abs(F.col("a.us") - F.col("b.us")) <= 60_000_000)
        .select(
            F.col("a.event_id").alias("id_a"),
            F.col("b.event_id").alias("id_b"),
            ((F.col("b.us") - F.col("a.us")) / F.lit(1000000.0)).alias("diff_sec"),
        )
        # no dedup needed: each pair matches on exactly one bucket value
        # (the right side's own bucket), so the join emits it once
    )




# ---------------------------------------------------------------------------
# Ordered funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e
  JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1
), n AS (
  SELECT (SELECT COUNT(*) FROM s1) AS n1,
         (SELECT COUNT(*) FROM s2) AS n2,
         (SELECT COUNT(*) FROM s3) AS n3
)
SELECT 1 AS stage, 'view' AS step, CAST(n1 AS BIGINT) AS n_users,
       1.0 AS conv_from_prev, 1.0 AS conv_overall FROM n
UNION ALL
SELECT 2, 'click', CAST(n2 AS BIGINT),
       CAST(n2 AS DOUBLE) / n1, CAST(n2 AS DOUBLE) / n1 FROM n
UNION ALL
SELECT 3, 'purchase', CAST(n3 AS BIGINT),
       CAST(n3 AS DOUBLE) / n2, CAST(n3 AS DOUBLE) / n1 FROM n
"""


@register("events_funnel", oracle=_FUNNEL_SQL, driver=False)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel — the classic product-analytics shape
    (engine breadth; the reference's closest analog is its ordered
    marker pairs): per user, the first 'view', the first 'click' AT OR
    AFTER it, the first 'purchase' at or after THAT; output per-stage
    user counts and conversion rates.

    Shapes: three sequential per-user min-aggregations, each a groupBy
    on user_id joined to the previous stage's (user, t) frame — all
    shuffles key on user_id and reuse one partitioning; stage counts are
    scalar aggregates crossed into three constant rows (no collect).
    Conversion ratios are exact-int divisions, identical on both
    engines."""
    e = load_table(spark, sf_dir, "events")

    def stage(prev: DataFrame | None, etype: str) -> DataFrame:
        src = e.filter(F.col("event_type") == etype)
        if prev is not None:
            src = src.join(
                prev.withColumnRenamed("t", "pt"), "user_id"
            ).filter(F.col("ts") >= F.col("pt"))
        return src.groupBy("user_id").agg(F.min("ts").alias("t"))

    s1 = stage(None, "view")
    s2 = stage(s1, "click")
    s3 = stage(s2, "purchase")
    c = (
        s1.agg(F.count(F.lit(1)).alias("n1"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n2")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n3")))
    )
    rows = F.array(
        F.struct(
            F.lit(1).alias("stage"),
            F.lit("view").alias("step"),
            F.col("n1").alias("n_users"),
            F.lit(1.0).alias("conv_from_prev"),
            F.lit(1.0).alias("conv_overall"),
        ),
        F.struct(
            F.lit(2).alias("stage"),
            F.lit("click").alias("step"),
            F.col("n2").alias("n_users"),
            (F.col("n2").cast("double") / F.col("n1")).alias("conv_from_prev"),
            (F.col("n2").cast("double") / F.col("n1")).alias("conv_overall"),
        ),
        F.struct(
            F.lit(3).alias("stage"),
            F.lit("purchase").alias("step"),
            F.col("n3").alias("n_users"),
            (F.col("n3").cast("double") / F.col("n2")).alias("conv_from_prev"),
            (F.col("n3").cast("double") / F.col("n1")).alias("conv_overall"),
        ),
    )
    return c.select(F.explode(rows).alias("r")).select(
        "r.stage", "r.step", "r.n_users", "r.conv_from_prev", "r.conv_overall"
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention
# ---------------------------------------------------------------------------

_COHORT_SQL = """
WITH firstseen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY 1
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(date_trunc('week', e.ts) AS DATE) AS active_week
  FROM events e JOIN firstseen f ON f.user_id = e.user_id
), sized AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM firstseen GROUP BY 1
)
SELECT a.cohort_week,
       CAST(date_diff('day', a.cohort_week, a.active_week) // 7 AS INTEGER)
         AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users,
       s.cohort_size,
       CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) / s.cohort_size AS retention
FROM activity a JOIN sized s ON s.cohort_week = a.cohort_week
GROUP BY 1, 2, 4
"""


@register("events_cohort_retention", oracle=_COHORT_SQL, driver=False)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the second classic product-analytics
    shape next to the funnel: users grouped by first-seen week, then for
    each later week the fraction of the cohort still active. Both
    engines truncate to ISO (Monday-start) weeks and the offset is an
    exact day-difference division, so the matrix hash-matches.

    Shapes: first-seen is one per-user min-agg; the activity set is a
    distinct projection joined back on user_id (same partitioning);
    cohort sizes are a tiny per-week agg broadcast into the final
    rollup. All shuffles key on user_id or cohort_week."""
    e = load_table(spark, sf_dir, "events")
    firstseen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        e.join(firstseen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.date_trunc("week", F.col("ts")).cast("date").alias("active_week"),
        )
        .distinct()
    )
    sized = firstseen.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        activity.join(F.broadcast(sized), "cohort_week")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
            "cohort_size",
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            "cohort_week",
            "week_offset",
            "n_users",
            "cohort_size",
            (
                F.col("n_users").cast("double") / F.col("cohort_size")
            ).alias("retention"),
        )
    )


_ATTRIBUTION_SQL = """
WITH v AS (
  SELECT user_id, ts AS view_ts, value AS view_value
  FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts AS purchase_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, v.view_ts, v.view_value, p.purchase_ts, p.purchase_value
FROM v JOIN p ON v.user_id = p.user_id
  AND v.view_ts <= p.purchase_ts
  AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
"""


@register("events_attribution_join", oracle=_ATTRIBUTION_SQL, driver=False)
def events_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution as a batch interval join: every purchase
    matched to the same user's views within the preceding 30 minutes —
    the BATCH anchor of the stream-stream watermarked join
    (streaming/attribution_stream.py; registry #106). Shares the exact
    plan builder `attribute()` with the live variant, so the streaming
    tests' batch-parity pin and this oracle verify the same code. The
    join is a user_id equi-join with a range residual — one shuffle on
    user_id, never a cartesian (plan-pinned in
    tests/test_attribution_stream.py); at 100 TB both event slices
    partition by user and the range predicate evaluates within the
    sort-merge join."""
    from projekt_data_engineering_iubh_spark.streaming.attribution_stream import (
        attribute,
        split_events,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    )
    views, purchases = split_events(ev)
    return attribute(views, purchases)


# ---------------------------------------------------------------------------
# SCD Type-2 state history (registry query #119)
# ---------------------------------------------------------------------------

_SCD2_SQL = """
WITH ch AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
), tr AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id
  FROM ch WHERE prev IS NULL OR prev != event_type
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER w AS valid_to,
       lead(valid_from) OVER w IS NULL AS is_current,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
FROM tr
WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
"""


@register("events_scd2_state", oracle=_SCD2_SQL, driver=False)
def events_scd2_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 derivation from the event
    stream — the warehouse-modeling idiom the reference's daily summary
    implies but never materializes: per user, collapse consecutive
    repeats of the same state (event_type) into one versioned validity
    interval [valid_from, valid_to), open-ended current row flagged.
    This is the standard "current state + full history" table a
    dashboard joins instead of re-scanning raw events.

    Plan shape: change-detection lag() and the interval lead()/
    row_number() share the SAME (user_id; ts, event_id) window
    partitioning, so Catalyst plans ONE exchange and two Window nodes
    over it — the filter between them is narrow. The (ts, event_id)
    tiebreak is the P7 stable-order rule; all outputs are raw column
    values (timestamps pass through untouched), no arithmetic to
    diverge cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    tr = ch.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "event_id",
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return tr.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


# ---------------------------------------------------------------------------
# Key-skew profiler (registry query #120)
# ---------------------------------------------------------------------------

_SKEW_PROFILE_SQL = """
WITH per AS (
  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(SUM(cnt) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(MAX(cnt) AS BIGINT) AS max_user_events
  FROM per GROUP BY 1
), top AS (
  SELECT event_type, user_id AS top_user_id
  FROM (SELECT event_type, user_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, user_id) AS rn
        FROM per)
  WHERE rn = 1
)
SELECT agg.event_type, agg.n_events, agg.n_users, agg.max_user_events,
       top.top_user_id,
       CAST(agg.max_user_events * agg.n_users AS DOUBLE) / agg.n_events
         AS skew_ratio
FROM agg JOIN top USING (event_type)
"""


@register("events_key_skew_profile", oracle=_SKEW_PROFILE_SQL, driver=False)
def events_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution skew profiler — the diagnostic that DECIDES the
    salting question events_salted_agg answers: per grouping key
    (event_type), how concentrated is the secondary key (user_id)?
    skew_ratio = max_user_events / mean_user_events; ~1 means uniform
    (hash partitioning is fine), >>1 means a hot key (salt it, or let
    AQE's skew-join handle the join case). At 100 TB this query runs on
    a sample or the previous day's partition before choosing a plan —
    the profile is two small groupBys, never a data-sized collect.

    Determinism: all aggregates are exact bigints; the hot key is picked
    by a total-order window (cnt DESC, user_id) not an unordered
    arg_max; skew_ratio is ONE exact-bigint-over-exact-bigint double
    division (the r6 rounding policy). Plan: groupBy(type, user) with
    map-side combine, then a ~|types|-row rollup + the same-partitioning
    top-1 window — the second groupBy and the window reuse the first
    aggregation's output, which is tiny."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    agg = per.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.max("cnt").cast("long").alias("max_user_events"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cnt"), F.asc("user_id")
    )
    top = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("user_id").alias("top_user_id"))
    )
    return agg.join(top, "event_type").select(
        "event_type",
        "n_events",
        "n_users",
        "max_user_events",
        "top_user_id",
        (
            (F.col("max_user_events") * F.col("n_users")).cast("double")
            / F.col("n_events")
        ).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch (registry query #121)
# ---------------------------------------------------------------------------

_HIST_W = 10  # bin width
_HIST_BINS = 64  # fixed domain [0, 640); overflow clamps into the last bin

_HIST_QUANT_SQL = f"""
WITH b AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(floor(value / {float(_HIST_W)}) AS BIGINT), 0),
               {_HIST_BINS - 1}) AS bin
  FROM events WHERE value IS NOT NULL
), h AS (
  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
), cum AS (
  SELECT event_type, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cum > n // 2 THEN (bin + 1) * {_HIST_W} END)
            AS BIGINT) AS p50_ub,
       CAST(MIN(CASE WHEN cum > (n * 9) // 10 THEN (bin + 1) * {_HIST_W} END)
            AS BIGINT) AS p90_ub,
       CAST(MIN(CASE WHEN cum > (n * 99) // 100 THEN (bin + 1) * {_HIST_W} END)
            AS BIGINT) AS p99_ub
FROM cum GROUP BY event_type
"""


@register(
    "events_value_hist_quantiles", oracle=_HIST_QUANT_SQL, driver=False
)
def events_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram quantile sketch — the quantile member of the
    sketch family (membership: Bloom #~, frequency: Count-Min, distinct:
    HLL #114/#118): per event_type, a FIXED 64-bin width-10 histogram of
    `value` (domain [0,640), clamped at both ends) and the p50/p90/p99
    upper bin edges read off the cumulative counts. Fixed-size SUM-able
    bins are what production metric pipelines actually merge across
    shards/days (the t-digest/KLL alternative trades the fixed error
    width ±bin for adaptivity but needs randomized compaction that can't
    be verified cross-engine value-exactly); exact percentiles live in
    agg_stats_percentiles — this is the scale path with a declared ±10
    error bar.

    Determinism: the only floating op is ONE floor(value/10) per row
    (correctly-rounded division + floor); everything after is exact
    bigint arithmetic — cumulative sums over unique bins, rank
    thresholds as integer floor-divisions (n DIV 2, 9n DIV 10,
    99n DIV 100 — non-negative, so Spark DIV == DuckDB //), quantile
    estimates as integer bin edges. Plan: one groupBy(type, bin) with
    map-side combine (≤ types·64 rows out), then windows over that tiny
    table."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    b = ev.select(
        "event_type",
        F.least(
            F.greatest(
                F.floor(F.col("value") / F.lit(float(_HIST_W))).cast("long"),
                F.lit(0),
            ),
            F.lit(_HIST_BINS - 1),
        ).alias("bin"),
    )
    h = b.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "bin",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    edge = (F.col("bin") + 1) * _HIST_W

    def q_ub(num: int, den: int):
        k = F.expr(f"(n * {num}) DIV {den}")
        return F.min(F.when(F.col("cum") > k, edge)).cast("long")

    return cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        q_ub(1, 2).alias("p50_ub"),
        q_ub(9, 10).alias("p90_ub"),
        q_ub(99, 100).alias("p99_ub"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: contiguous activity runs (registry query #122+)
# ---------------------------------------------------------------------------

_ISLANDS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM ud
), g AS (
  SELECT user_id, day, day - CAST(rn AS INTEGER) AS grp FROM r
), isl AS (
  SELECT user_id,
         MIN(day) AS island_start,
         MAX(day) AS island_end,
         CAST(COUNT(*) AS INTEGER) AS island_days
  FROM g GROUP BY user_id, grp
)
SELECT user_id, island_start, island_end, island_days,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS island_no,
       island_start
         - lag(island_end) OVER w - 1 AS gap_days_before
FROM isl
WINDOW w AS (PARTITION BY user_id ORDER BY island_start)
"""


@register("events_gaps_islands", oracle=_ISLANDS_SQL, driver=False)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, collapse the set of active DAYS into
    maximal runs of consecutive dates (islands) with the gap length
    before each run — the classic warehouse idiom behind streak
    features ("active 7 days in a row"), churn detection (gap > N), and
    engagement cohorting; the interval-building complement of
    events_scd2_state (which versions STATE changes, not presence).

    Technique: the row_number difference trick — within a user, day
    minus its per-user day-rank is constant exactly on a run of
    consecutive dates, so the constant is the island key and islands
    fall out of one groupBy. No self-join, no recursive expansion.

    Determinism: days are distinct per user so the (day) ordering is
    total; island metrics are date min/max and exact counts; gap
    arithmetic is integer date subtraction (datediff semantics match
    cross-engine; NULL for a user's first island on both sides).

    Plan shape: distinct (one (user_id, day) shuffle), then the rank
    window, island groupBy, and island-sequence window all partition by
    user_id — after the first user_id-keyed exchange the engine reuses
    the partitioning (the day-rank window's sort covers the groupBy's
    partial agg input and the final window's order). Scales linearly:
    state per user is its distinct-day list, never raw events — the
    distinct collapses 100 TB of events to |users|·|days| rows first."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    wr = Window.partitionBy("user_id").orderBy("day")
    g = ud.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(wr)).alias("grp"),
    )
    isl = g.groupBy("user_id", "grp").agg(
        F.min("day").alias("island_start"),
        F.max("day").alias("island_end"),
        F.count(F.lit(1)).cast("int").alias("island_days"),
    )
    wi = Window.partitionBy("user_id").orderBy("island_start")
    return isl.select(
        "user_id",
        "island_start",
        "island_end",
        "island_days",
        F.row_number().over(wi).cast("int").alias("island_no"),
        (
            F.datediff(
                F.col("island_start"), F.lag("island_end").over(wi)
            )
            - F.lit(1)
        ).alias("gap_days_before"),
    )


# ---------------------------------------------------------------------------
# Session path mining (registry query #126)
# ---------------------------------------------------------------------------

_PATH_LEN = 5
_PATH_TOPK = 20

_TOP_PATHS_SQL = f"""
WITH sess AS ({_SESSIONIZE_SQL}),
sp AS (
  SELECT user_id, session_seq,
         array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id),
                      1, {_PATH_LEN}), '->') AS path
  FROM sess
  WHERE session_seq > 0 AND event_type != '{SESSION_MARKER}'
  GROUP BY 1, 2
),
pc AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM sp GROUP BY 1)
SELECT path, n_sessions,
       CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path)
            AS INTEGER) AS rank
FROM pc
ORDER BY n_sessions DESC, path
LIMIT {_PATH_TOPK}
"""


@register("events_top_paths", oracle=_TOP_PATHS_SQL, driver=False)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the top-20 most frequent event-type
    sequences (first 5 non-marker events per marker session,
    '->'-joined) — the product-analytics complement of events_funnel:
    the funnel scores ONE predeclared step sequence, this DISCOVERS
    which sequences users actually take.

    Determinism: per-session ordering is the sessionize total order
    (ts, event_id); the in-session sequence is built by sorting the
    collected (ts, event_id, event_type) structs — array_sort on
    structs is lexicographic, so the tie order is exact, not
    collect_list's arrival order. Top-k ties break on the path string.

    Scale shape: one groupBy per (user, session) — same key domain as
    every session aggregate, map-side combinable, no window over raw
    events; then a groupBy on the path whose DOMAIN is bounded by the
    event-type vocabulary (|types|^5), so the final rank
    window's single-partition input is small at any corpus size. The
    per-session agg state is capped too: sessions are marker-bounded
    (~tens of events), and only the first 5 survive the slice."""
    sess = _sessionized(spark, sf_dir).filter(
        (F.col("session_seq") > 0)
        & (F.col("event_type") != SESSION_MARKER)
    )
    sp = sess.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s.event_type,
                ),
                1,
                _PATH_LEN,
            ),
            "->",
        ).alias("path")
    )
    pc = sp.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    w = Window.orderBy(F.desc("n_sessions"), "path")
    return (
        pc.select(
            "path",
            "n_sessions",
            F.row_number().over(w).cast("int").alias("rank"),
        )
        .orderBy("rank")
        .limit(_PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# Per-user feature vector (registry query #127)
# ---------------------------------------------------------------------------

_UF_SQL = f"""
WITH base AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = '{SESSION_MARKER}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_sessions,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
         MAX(CAST(ts AS DATE)) AS last_day,
         CAST(SUM(CASE WHEN value IS NOT NULL
                  THEN CAST(FLOOR(value * 100) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS monetary_cents,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
corpus AS (SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events),
tt AS (
  SELECT user_id, event_type AS top_type
  FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY COUNT(*) DESC, event_type) AS rn
    FROM events GROUP BY user_id, event_type
  ) WHERE rn = 1
)
SELECT base.user_id, n_events, n_sessions, n_active_days,
       CAST(date_diff('day', last_day, max_day) AS INTEGER) AS recency_days,
       monetary_cents, n_purchases, n_errors,
       CAST((CAST(1000000 AS BIGINT) * n_errors) // n_events AS BIGINT)
         AS error_rate_micro,
       tt.top_type
FROM base CROSS JOIN corpus
JOIN tt ON tt.user_id = base.user_id
"""


@register("events_user_features", oracle=_UF_SQL, driver=False)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature-engineering rollup — the RFM-style vector a
    training pipeline materializes as model input: recency (days since
    the user's last event, anchored to the CORPUS max day so the
    feature is reproducible from the data alone), frequency (events,
    marker sessions, distinct active days), monetary (exact bigint
    cents: per-row FLOOR(value*100) before summing, so the total is
    shuffle-order independent — a raw SUM(double) is not), error rate
    in integer micro-units, and the modal event type with a
    deterministic (count DESC, type ASC) tiebreak.

    Scale shape: one user-keyed groupBy for the numeric features; the
    modal type is a (user, type) groupBy + a user-partitioned top-1
    window on the 5-types-per-user aggregate (bounded input, shares the
    user partitioning); the corpus anchor is a single-row aggregate
    broadcast-crossed on (the events_funnel pattern) — no data-sized
    driver action anywhere."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == SESSION_MARKER, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_sessions"),
        F.countDistinct(day).cast("long").alias("n_active_days"),
        F.max(day).alias("last_day"),
        F.sum(
            F.when(
                F.col("value").isNotNull(),
                F.floor(F.col("value") * 100).cast("long"),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("monetary_cents"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    # materialize the per-user aggregate once: it feeds BOTH the corpus
    # anchor (max of per-user maxes — no separate events scan) and the
    # final join, and the two branches' prunings differ enough that
    # exchange reuse never fires (measured: 3 events scans -> 2 without)
    base = base.localCheckpoint(eager=True)
    corpus = base.agg(F.max("last_day").alias("max_day"))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("type_cnt"), "event_type"
    )
    tt = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("type_cnt"))
        .select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    return (
        base.crossJoin(F.broadcast(corpus))
        .join(tt, "user_id")
        .select(
            "user_id",
            "n_events",
            "n_sessions",
            "n_active_days",
            F.datediff("max_day", "last_day").cast("int").alias(
                "recency_days"
            ),
            "monetary_cents",
            "n_purchases",
            "n_errors",
            F.expr(
                "CAST((CAST(1000000 AS BIGINT) * n_errors) DIV n_events"
                " AS BIGINT)"
            ).alias("error_rate_micro"),
            "top_type",
        )
    )


# ---------------------------------------------------------------------------
# Robust (median/MAD) outlier detection (registry query #128)
# ---------------------------------------------------------------------------

# Contract: lower median — the value at ascending position (n+1) DIV 2
# (ties ordered by event_id for a total order; the value AT a position is
# tie-order independent). MAD is the lower median of |x - median|.
# Outlier: |x - median| > 3 * MAD, all in exact integer cents.

_MAD_SQL = """
WITH v AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
med AS (
  SELECT event_type, MAX(cents) AS median_cents
  FROM r WHERE rn <= (n + 1) // 2 GROUP BY 1
),
d AS (
  SELECT v.event_type, v.event_id, v.cents,
         ABS(v.cents - med.median_cents) AS dev
  FROM v JOIN med USING (event_type)
),
dr AS (
  SELECT event_type, dev,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY dev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM d
),
mad AS (
  SELECT event_type, MAX(dev) AS mad_cents
  FROM dr WHERE rn <= (n + 1) // 2 GROUP BY 1
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(med.median_cents) AS median_cents,
       MAX(mad.mad_cents) AS mad_cents,
       CAST(SUM(CASE WHEN d.dev > 3 * mad.mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST((CAST(1000000 AS BIGINT)
             * SUM(CASE WHEN d.dev > 3 * mad.mad_cents THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS outlier_rate_micro
FROM d
JOIN med USING (event_type)
JOIN mad USING (event_type)
GROUP BY 1
"""


@register("events_anomaly_mad", oracle=_MAD_SQL, driver=False)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier detection: median + MAD (median absolute
    deviation) in EXACT integer cents, flagging |x - median| > 3*MAD —
    the data-quality screen that, unlike mean/stddev z-scores, is not
    itself dragged by the outliers it hunts, and unlike the fixed
    threshold rules (P12, events_threshold_errors) needs no configured
    bounds. Medians are exact order statistics (lower median, the value
    at ascending position (n+1) DIV 2 — tie-order independent), NOT the
    approximate percentile sketch, so the result is bit-identical on
    any engine and any partitioning.

    Scale shape: two rank windows partitioned by event_type (the
    selection shuffle), each followed by a tiny per-type aggregate that
    broadcast-joins back onto the rows. The window partition is the
    type domain — bounded, but a single hot type serializes its sort
    exactly like sessionize's hot-user caveat; the two-level prefix
    strategy (operators/sessionize.py) or a sampled-boundary
    repartitionByRange would be the 100 TB swap if the type domain were
    small AND hot. Exact medians at scale are genuinely
    sort-expensive; the cheap alternative is the fixed-bin histogram
    sketch (events_value_hist_quantiles) whose declared error bar this
    operator does not have."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )

    def lower_median(df: DataFrame, col: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(col, "event_id")
        wc = Window.partitionBy("event_type")
        ranked = df.select(
            "event_type",
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        return (
            ranked.filter(F.col("rn") <= F.expr("(n + 1) DIV 2"))
            .groupBy("event_type")
            .agg(F.max(col).alias(f"med_{col}"))
        )

    # the two median tables are |types| rows; materializing them keeps
    # the deviation/final branches from replaying the rank-window pass
    # over all value rows once per reference
    med = (
        lower_median(v, "cents")
        .withColumnRenamed("med_cents", "median_cents")
        .localCheckpoint(eager=True)
    )
    d = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.col("cents") - F.col("median_cents")).alias("dev"),
    )
    mad = (
        lower_median(d, "dev")
        .withColumnRenamed("med_dev", "mad_cents")
        .localCheckpoint(eager=True)
    )
    return (
        d.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("median_cents").alias("median_cents"),
            F.max("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "median_cents",
            "mad_cents",
            "n_outliers",
            F.expr(
                "CAST((CAST(1000000 AS BIGINT) * n_outliers) DIV n AS BIGINT)"
            ).alias("outlier_rate_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Rolling 7-day actives (registry query #130)
# ---------------------------------------------------------------------------

_WAU_WINDOW = 7  # trailing days, inclusive

_WAU_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
days AS (SELECT DISTINCT d AS day FROM ud)
SELECT days.day,
       CAST(COUNT(DISTINCT CASE WHEN ud.d = days.day THEN ud.user_id END)
            AS BIGINT) AS dau,
       CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau,
       CAST((CAST(1000000 AS BIGINT)
             * COUNT(DISTINCT CASE WHEN ud.d = days.day
                              THEN ud.user_id END))
            // COUNT(DISTINCT ud.user_id) AS BIGINT) AS stickiness_micro
FROM ud JOIN days
  ON ud.d <= days.day AND ud.d >= days.day - {_WAU_WINDOW - 1}
GROUP BY 1
"""


@register("events_rolling_wau", oracle=_WAU_SQL, driver=False)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: per day, the exact trailing-7-day distinct
    actives (WAU), same-day actives (DAU), and the DAU/WAU stickiness
    ratio in integer micro-units — the BATCH sliding event-time window
    the streaming tier expresses with F.window(slide); exact sliding
    COUNT DISTINCT has no window-frame form (distinct aggregates are
    not frame-computable), so the idiomatic plan is a range join
    against the day spine.

    Scale shape: events collapse to DISTINCT (user, day) first — the
    one big shuffle, and the 7x row expansion that follows happens on
    user-DAYS, not raw events. The day spine is broadcast (bounded:
    3,650 rows per decade — a fixed-cardinality dimension like q5's
    nation/region), making the range join a linear broadcast pass; the
    per-day distinct count is the final day-keyed aggregate. The
    deliberate BroadcastNestedLoopJoin is bounded by the spine, same
    contract as events_funnel's single-row crossJoins; at extreme day
    counts the swap is bucketing days into months and an equi-join on
    month +- 1 prefilter."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    # day spine straight from events, NOT from ud: deriving it from ud
    # replays the big (user, day) distinct shuffle for a ~days-row
    # result, while a day-only distinct partial-aggregates map-side and
    # ships only the day domain
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    j = ud.join(
        F.broadcast(days),
        (F.col("d") <= F.col("day"))
        & (F.col("d") >= F.date_sub("day", _WAU_WINDOW - 1)),
    )
    return (
        j.groupBy("day")
        .agg(
            F.countDistinct(
                F.when(F.col("d") == F.col("day"), F.col("user_id"))
            )
            .cast("long")
            .alias("dau"),
            F.countDistinct("user_id").cast("long").alias("wau"),
        )
        .select(
            "day",
            "dau",
            "wau",
            F.expr(
                "CAST((CAST(1000000 AS BIGINT) * dau) DIV wau AS BIGINT)"
            ).alias("stickiness_micro"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (registry query #131)
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, day, c,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS total,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
  FROM daily
),
cu AS (
  SELECT event_type, day, n_days, total,
         n_days * run
           - total * CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                             ORDER BY day) AS BIGINT)
           AS cusum
  FROM s
),
r AS (
  SELECT event_type, day, n_days, total, cusum,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(cusum) DESC, day) AS rn
  FROM cu
)
SELECT event_type, n_days, total,
       day AS shift_day,
       CAST(ABS(cusum) AS BIGINT) AS cusum_abs_max,
       CAST((CAST(1000000 AS BIGINT) * ABS(cusum)) // (n_days * total)
            AS BIGINT) AS magnitude_micro
FROM r WHERE rn = 1
"""


@register("events_cusum_shift", oracle=_CUSUM_SQL, driver=False)
def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection over each type's daily count series:
    the day where the cumulative deviation from the series mean peaks —
    the classic level-shift detector for pipeline monitoring (did a
    source break / a bot arrive mid-corpus?). The mean never appears as
    a division: S_k = n*run_k - total*k is the n-scaled cusum
    (identically zero at k = n), so the whole statistic is exact bigint
    and the argmax (tie -> earliest day) is engine-independent; the
    reported magnitude normalizes by n*total in integer micro-units.

    Scale shape: one (type, day) groupBy over raw events is the only
    data-sized shuffle; every window after it runs on the tiny
    types-x-days series (same posture as the histogram sketch: heavy
    reduce first, analytics on the reduced series)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wp = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("day")
    cu = daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(wp).cast("long").alias("n_days"),
        F.sum("c").over(wp).cast("long").alias("total"),
        F.sum("c")
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("run"),
        F.row_number().over(wo).cast("long").alias("k"),
    ).select(
        "event_type",
        "day",
        "n_days",
        "total",
        (F.col("n_days") * F.col("run") - F.col("total") * F.col("k")).alias(
            "cusum"
        ),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "day"
    )
    return (
        cu.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "n_days",
            "total",
            F.col("day").alias("shift_day"),
            F.abs(F.col("cusum")).cast("long").alias("cusum_abs_max"),
            F.expr(
                "CAST((CAST(1000000 AS BIGINT) * ABS(cusum))"
                " DIV (n_days * total) AS BIGINT)"
            ).alias("magnitude_micro"),
        )
    )


# ---------------------------------------------------------------------------
# In-session Markov transition matrix (registry query #132)
# ---------------------------------------------------------------------------

_MARKOV_SQL = f"""
WITH sess AS ({_SESSIONIZE_SQL}),
tr AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id, session_seq
                                ORDER BY ts, event_id) AS nxt
  FROM sess WHERE session_seq > 0 AND event_type != '{SESSION_MARKER}'
),
pc AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n
  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2
)
SELECT cur, nxt, n,
       CAST(SUM(n) OVER (PARTITION BY cur) AS BIGINT) AS n_cur,
       CAST((CAST(1000000 AS BIGINT) * n)
            // SUM(n) OVER (PARTITION BY cur) AS BIGINT) AS p_micro
FROM pc
"""


@register("events_markov_transitions", oracle=_MARKOV_SQL, driver=False)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over in-session event types:
    P(next | current) in integer micro-units — the MODEL complement of
    events_top_paths' frequency mining (paths enumerate what happened;
    the transition matrix is the generative summary a simulator or
    next-event predictor consumes). Transitions never cross a session
    boundary (lead() is partitioned by (user, session)), and the final
    event of each session emits nothing.

    Scale shape: ONE window pass over sessionized events (same
    (user_id; ts, event_id) partitioning as sessionize itself — at
    cluster scale the two windows share the exchange), then aggregates
    whose domain is the squared type vocabulary — bounded at any corpus
    size. Probabilities are exact integer micro-units of the exact
    count ratio (n, n_cur both in the verified output, so rows sum to
    n_cur per cur up to the documented floor truncation)."""
    sess = _sessionized(spark, sf_dir).filter(
        (F.col("session_seq") > 0)
        & (F.col("event_type") != SESSION_MARKER)
    )
    w = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    tr = sess.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pc = tr.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # totals as a window over the types^2-row count table: a second
    # groupBy + join would REPLAY the sessionize/lead window pass over
    # raw events for the totals branch (measured 2 scans / 4 windows ->
    # 1 / 3)
    wcur = Window.partitionBy("cur")
    return pc.select(
        "cur",
        "nxt",
        "n",
        F.sum("n").over(wcur).cast("long").alias("n_cur"),
        F.expr(
            "CAST((CAST(1000000 AS BIGINT) * n)"
            " DIV (SUM(n) OVER (PARTITION BY cur)) AS BIGINT)"
        ).alias("p_micro"),
    )


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval (registry query #133)
# ---------------------------------------------------------------------------

from projekt_data_engineering_iubh_spark.functions import (  # noqa: E402
    hashing as _hashing,
)

_BOOT_B = 40  # replicates; ranks 1 / B-1 ~ the 2.5% / 97.5% percentile CI
_BOOT_RES = 1 << 20
# Poisson(1) CDF quantized at 2^20 (int(round(cdf * 2^20)) in Python),
# P(X <= k) for k = 0..6; weights above 7 are capped (P ~ 5e-5 tail).
_BOOT_CDF = [385750, 771499, 964374, 1028665, 1044738, 1047953, 1048489]


def _boot_w_case(u: str) -> str:
    """Inverse-CDF weight as a CASE chain (same text both engines)."""
    return (
        "CASE "
        + " ".join(
            f"WHEN ({u}) < {c} THEN CAST({k} AS BIGINT)"
            for k, c in enumerate(_BOOT_CDF)
        )
        + " ELSE CAST(7 AS BIGINT) END"
    )


_BOOT_U_SQL = (
    _hashing.md5_hash60_sql(
        "concat(CAST(event_id AS VARCHAR), '_', CAST(r.rep AS VARCHAR))"
    )
    + f" % {_BOOT_RES}"
)

_BOOT_SQL = f"""
WITH p AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
wt AS (
  SELECT event_type, cents, r.rep,
         {_boot_w_case(_BOOT_U_SQL)} AS w
  FROM p, unnest(range(0, {_BOOT_B})) AS r(rep)
),
reps AS (
  SELECT event_type, rep,
         CAST((CAST(1000000 AS BIGINT) * SUM(w * cents)) // SUM(w)
              AS BIGINT) AS mean_micro
  FROM wt GROUP BY 1, 2 HAVING SUM(w) > 0
),
ranked AS (
  SELECT event_type, rep, mean_micro,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mean_micro, rep) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS nb
  FROM reps
),
pt AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST((CAST(1000000 AS BIGINT) * SUM(cents)) // COUNT(*)
              AS BIGINT) AS point_micro
  FROM p GROUP BY 1
)
SELECT pt.event_type, pt.n, pt.point_micro,
       MAX(CASE WHEN rn = 1 THEN mean_micro END) AS boot_lo_micro,
       MAX(CASE WHEN rn = nb - 1 THEN mean_micro END) AS boot_hi_micro
FROM pt JOIN ranked ON ranked.event_type = pt.event_type
GROUP BY 1, 2, 3
"""


@register("events_bootstrap_ci", oracle=_BOOT_SQL, driver=False)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty at scale: a 95% percentile CI for each type's mean
    value via the POISSON BOOTSTRAP (Chamandy et al., "Estimating
    Uncertainty for Massive Data Streams", 2012 — the single-pass
    reformulation of resampling): each of B=40 replicates weights every
    row Poisson(1), with the weight drawn DETERMINISTICALLY by pushing a
    60-bit md5 of (event_id, replicate) through the quantized inverse
    CDF — no data shuffle per replicate, no RNG state, bit-identical on
    both engines and any partitioning.

    The replicate fan-out (rows x B) never shuffles raw data: weights
    are computed map-side and partial-aggregated into (type, replicate)
    cells before the exchange, so the shuffle carries B rows per type
    regardless of corpus size. Replicate means are exact integer
    micro-cents (values non-negative — the enforced contract of the
    cents quantization); the CI endpoints are order statistics of the
    B-row-per-type series (ranks 1 and B-1 ~ 2.5%/97.5%), tie-broken by
    replicate id."""
    p = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    w = (
        p.select(
            "event_type",
            "cents",
            "event_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOOT_B - 1))
            ).alias("rep"),
        )
        .withColumn(
            "u",
            _hashing.md5_hash60(
                F.concat(
                    F.col("event_id").cast("string"),
                    F.lit("_"),
                    F.col("rep").cast("string"),
                )
            )
            % _BOOT_RES,
        )
        .withColumn("w", F.expr(_boot_w_case("u")))
    )
    reps = (
        w.groupBy("event_type", "rep")
        .agg(
            F.sum(F.col("w") * F.col("cents")).alias("swc"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            "rep",
            F.expr(
                "CAST((CAST(1000000 AS BIGINT) * swc) DIV sw AS BIGINT)"
            ).alias("mean_micro"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("mean_micro", "rep")
    wn = Window.partitionBy("event_type")
    ranked = reps.select(
        "event_type",
        "mean_micro",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("nb"),
    )
    pt = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CAST((CAST(1000000 AS BIGINT) * SUM(cents)) DIV COUNT(*)"
            " AS BIGINT)"
        ).alias("point_micro"),
    )
    return (
        pt.join(ranked, "event_type")
        .groupBy("event_type", "n", "point_micro")
        .agg(
            F.max(
                F.when(F.col("rn") == 1, F.col("mean_micro"))
            ).alias("boot_lo_micro"),
            F.max(
                F.when(F.col("rn") == F.col("nb") - 1, F.col("mean_micro"))
            ).alias("boot_hi_micro"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-touch linear attribution (registry query #139)
# ---------------------------------------------------------------------------

_ATTR_TOUCH_TYPES = ("view", "click")

_LINEAR_ATTR_SQL = f"""
WITH sess AS ({_SESSIONIZE_SQL}),
s2 AS (SELECT event_id, user_id, ts, event_type, session_seq
       FROM sess WHERE session_seq > 0),
p AS (
  SELECT s2.*, CAST(FLOOR(e.value * 100) AS BIGINT) AS cents
  FROM s2 JOIN events e USING (event_id)
  WHERE s2.event_type = 'purchase' AND e.value IS NOT NULL
),
t AS (
  SELECT * FROM s2
  WHERE event_type IN {_ATTR_TOUCH_TYPES!r}
),
pairs AS (
  SELECT p.event_id AS purchase_id, p.cents,
         t.event_id AS touch_id, t.event_type AS touch_type,
         CAST(COUNT(*) OVER (PARTITION BY p.event_id) AS BIGINT)
           AS n_touches
  FROM p JOIN t
    ON t.user_id = p.user_id AND t.session_seq = p.session_seq
   AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_credits,
       CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases_touched,
       CAST(SUM((CAST(1000000 AS BIGINT) * cents) // n_touches)
            AS BIGINT) AS attributed_micro_cents
FROM pairs
GROUP BY 1
"""


@register("events_linear_attribution", oracle=_LINEAR_ATTR_SQL, driver=False)
def events_linear_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-touch LINEAR attribution: every purchase's value is split
    equally across the view/click touches that preceded it INSIDE its
    marker session, and credit rolls up per touch type — the
    position-independent complement of events_attribution_join's
    last-touch time-window model. Shares are exact integer
    micro-cents ((1e6 * cents) DIV n_touches per touch), so the
    conservation law is checkable: a purchase's credited total differs
    from 1e6*cents by strictly less than its touch count (floor
    remainder) — the property test pins exactly that.

    Precedence is the session total order (ts, event_id) — strict, so
    a touch at the purchase's own timestamp with a later id gets no
    credit, deterministically.

    Scale shape: the purchase-touch join is an equi-join on (user,
    session) with pair cardinality bounded by session size squared
    (marker sessions are small by construction); n_touches is a window
    over the pairs, same partitioning as the join output. No
    corpus-sized window anywhere."""
    sess = _sessionized(spark, sf_dir).filter(F.col("session_seq") > 0)
    p = (
        sess.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
        )
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "session_seq",
            F.col("ts").alias("p_ts"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    t = sess.filter(F.col("event_type").isin(*_ATTR_TOUCH_TYPES)).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        "session_seq",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    pairs = p.join(t, ["user_id", "session_seq"]).filter(
        (F.col("t_ts") < F.col("p_ts"))
        | (
            (F.col("t_ts") == F.col("p_ts"))
            & (F.col("touch_id") < F.col("purchase_id"))
        )
    )
    w = Window.partitionBy("purchase_id")
    pairs = pairs.withColumn(
        "n_touches", F.count(F.lit(1)).over(w).cast("long")
    )
    return pairs.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.countDistinct("purchase_id")
        .cast("long")
        .alias("n_purchases_touched"),
        F.sum(
            F.expr("(CAST(1000000 AS BIGINT) * cents) DIV n_touches")
        )
        .cast("long")
        .alias("attributed_micro_cents"),
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast baseline evaluation (registry query #140)
# ---------------------------------------------------------------------------

_SN_LAG = 7

_SEASONAL_NAIVE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
l AS (
  SELECT event_type, day, c,
         LAG(c, {_SN_LAG}) OVER (PARTITION BY event_type ORDER BY day)
           AS f7,
         LAG(c, 1) OVER (PARTITION BY event_type ORDER BY day) AS f1
  FROM daily
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COUNT(f7) AS BIGINT) AS n_eval,
       CAST(SUM(CASE WHEN f7 IS NOT NULL THEN ABS(c - f7) END) AS BIGINT)
         AS sum_abs_err7,
       CAST(SUM(CASE WHEN f1 IS NOT NULL THEN ABS(c - f1) END) AS BIGINT)
         AS sum_abs_err1,
       CAST(CASE WHEN COUNT(f7) > 0 THEN
              (CAST(1000 AS BIGINT)
               * SUM(CASE WHEN f7 IS NOT NULL THEN ABS(c - f7) END))
              // COUNT(f7) END AS BIGINT) AS mae7_milli,
       CAST(CASE WHEN COUNT(f7) > 0
                  AND COALESCE(SUM(CASE WHEN f1 IS NOT NULL
                                        THEN ABS(c - f1) END), 0) > 0 THEN
              (CAST(1000 AS BIGINT)
               * SUM(CASE WHEN f7 IS NOT NULL THEN ABS(c - f7) END)
               * (COUNT(*) - 1))
              // (COUNT(f7)
                  * SUM(CASE WHEN f1 IS NOT NULL THEN ABS(c - f1) END))
            END AS BIGINT) AS mase_milli
FROM l
GROUP BY 1
"""


@register(
    "events_seasonal_naive_eval", oracle=_SEASONAL_NAIVE_SQL, driver=False
)
def events_seasonal_naive_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forecast-baseline evaluation over each type's daily count series:
    the seasonal-naive predictor (value 7 observed days earlier) scored
    by MAE and by MASE — MAE scaled by the naive-1 in-sample MAE, the
    standard scale-free skill score (Hyndman & Koehler 2006; MASE < 1000
    milli means weekly seasonality beats plain persistence). Every
    statistic is exact bigint: integer counts, integer absolute errors,
    and milli-unit ratios via DIV — the evaluation harness any forecast
    model plugged into this pipeline would be graded by, with no FP
    accumulation to diverge cross-engine. Lags are over the OBSERVED
    day series per type (calendar gaps compress), the standard
    contiguous-series convention.

    NULL contract (guarded on BOTH engines, r8): a type with fewer than
    8 observed days has n_eval = 0 → mae7_milli and mase_milli are NULL
    (never a division error); a constant daily series has
    sum_abs_err1 = 0 → mase_milli is NULL (the skill score is undefined
    when the naive-1 baseline is perfect).

    Scale shape: same as the CUSUM detector — one (type, day) groupBy
    over raw events, then lag windows and aggregates over the tiny
    types-x-days series."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ld = daily.select(
        "event_type",
        "c",
        F.lag("c", _SN_LAG).over(w).alias("f7"),
        F.lag("c", 1).over(w).alias("f1"),
    )
    e7 = F.when(F.col("f7").isNotNull(), F.abs(F.col("c") - F.col("f7")))
    e1 = F.when(F.col("f1").isNotNull(), F.abs(F.col("c") - F.col("f1")))
    return (
        ld.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.count("f7").cast("long").alias("n_eval"),
            F.sum(e7).cast("long").alias("sum_abs_err7"),
            F.sum(e1).cast("long").alias("sum_abs_err1"),
        )
        .select(
            "event_type",
            "n_days",
            "n_eval",
            "sum_abs_err7",
            "sum_abs_err1",
            F.expr(
                "CAST(CASE WHEN n_eval > 0 THEN"
                " (CAST(1000 AS BIGINT) * sum_abs_err7) DIV n_eval"
                " END AS BIGINT)"
            ).alias("mae7_milli"),
            F.expr(
                "CAST(CASE WHEN n_eval > 0"
                " AND COALESCE(sum_abs_err1, 0) > 0 THEN"
                " (CAST(1000 AS BIGINT) * sum_abs_err7 * (n_days - 1))"
                " DIV (n_eval * sum_abs_err1) END AS BIGINT)"
            ).alias("mase_milli"),
        )
    )
