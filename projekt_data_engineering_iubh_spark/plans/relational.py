"""Operator-breadth queries over the star schema (SURVEY.md §7 phase B).

The reference exercises scans, filters, conditional aggregation, windows,
and equi-joins; a complete engine surface additionally needs the join/agg/
set-op/window families below. Everything is DataFrame-API (Catalyst plans
them identically to SQL) with broadcast hints on dimension tables — the
physical choice that matters at 100 TB, where `lineitem` shuffles dominate.

Numeric-determinism policy (so DuckDB oracles hash-match exactly):

* money sums go through DECIMAL(12,2) casts → exact, order-independent —
  then cast back to DOUBLE for a stable comparable type;
* decimal→double is only correctly-rounded in both engines while the
  decimal's scaled integer stays below 2^53 (DuckDB converts int128 and
  10^-scale separately, double-rounding above that); conversions that can
  exceed it (scale-4/6 products, sums of squares) go through a VARCHAR
  cast, which both engines round correctly at any magnitude;
* averages of raw doubles are rounded to 4 decimals;
* transcendentals (sqrt/ln/pow) are rounded to 6 decimals;
* integer-valued results stay BIGINT/INT on both sides (DuckDB's HUGEINT
  sums and BIGINT hour()/length() get explicit casts in the oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from projekt_data_engineering_iubh_spark.catalog import load_table
from projekt_data_engineering_iubh_spark.functions import numeric
from projekt_data_engineering_iubh_spark.plans.registry import register

DEC = "decimal(12,2)"


def _avg4_sql(col: str) -> str:
    """Sign-robust integer HALF_UP average of a money column at 4 dp
    (functions/numeric.py — r6 ADVICE closed the negative-sum gap)."""
    return numeric.half_up_4dp_sql(
        f"CAST(SUM(CAST({col} AS DECIMAL(12,2))) * 100 AS BIGINT)",
        f"COUNT({col})",
    )


def _dec(col: str) -> F.Column:
    return F.col(col).cast(DEC)


# --------------------------------------------------------------------------
# Headline analytical queries (TPC-H Q1/Q3/Q5 analogs)
# --------------------------------------------------------------------------

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
         AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))
                * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
         AS sum_charge,
       {avg_qty} AS avg_qty,
       {avg_price} AS avg_price,
       {avg_disc} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".format(
    avg_qty=_avg4_sql("l_quantity"),
    avg_price=_avg4_sql("l_extendedprice"),
    avg_disc=_avg4_sql("l_discount"),
)


@register("q1_pricing_summary", oracle=_Q1_SQL, headline=True)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: wide hash aggregation with derived measures.
    Partial aggregation (map-side combine) makes this a single shuffle of
    4 groups regardless of input size."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))

    # Exact decimal sums; the rounded averages are computed ENTIRELY in
    # integer arithmetic (functions/numeric.py::half_up_4dp — the true
    # HALF_UP of the exact rational, valid for either sign of the sum).
    # ROUND(double_sum/n, 4) is not just summation-order sensitive
    # (VERDICT r1 #2) but cross-engine divergent at rounding boundaries
    # even with identical operands (the r6 sf1 flagship lesson,
    # plans/events.py::_hourly_rollup).
    def avg4(col: str) -> F.Column:
        cents = (F.sum(_dec(col)) * 100).cast("long")
        return cents.alias(f"_c_{col}")

    out = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("string").cast("double").alias("sum_disc_price"),
            F.sum(disc_price * (F.lit(1) + _dec("l_tax")))
            .cast("string")
            .cast("double")
            .alias("sum_charge"),
            avg4("l_quantity"),
            F.count("l_quantity").alias("_n_l_quantity"),
            avg4("l_extendedprice"),
            F.count("l_extendedprice").alias("_n_l_extendedprice"),
            avg4("l_discount"),
            F.count("l_discount").alias("_n_l_discount"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    for col, alias in (
        ("l_quantity", "avg_qty"),
        ("l_extendedprice", "avg_price"),
        ("l_discount", "avg_disc"),
    ):
        out = out.withColumn(
            alias, numeric.half_up_4dp(f"_c_{col}", f"_n_{col}")
        )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    )


_Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_SQL, headline=True)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: selective filters → join → aggregation →
    deterministic top-10 (revenue is decimal-exact, so the DESC order
    ties out bit-identically across engines).

    Broadcast policy (r2 VERDICT fix): every table here is
    sf-proportional — the o_orderdate < 1998 filter retains ~97% of
    orders, and even customer×BUILDING is 1/5 of an sf-scaled table —
    so NO side carries a broadcast hint (a hint is unconditional and
    becomes a multi-GB broadcast at 100×). Catalyst's size-based
    planning and AQE's runtime SMJ→BHJ conversion broadcast whichever
    side actually fits the threshold at the running scale, and shuffle
    when none does; tests/test_physical_plans.py pins both regimes."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q5_SQL = """
SELECT n_name,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
         AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_regional_revenue", oracle=_Q5_SQL, headline=True)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join.

    Broadcast policy (r2 VERDICT fix): hints only on the FIXED-cardinality
    dimensions — nation (25 rows) and region (5 rows) are constant at any
    scale factor, so their broadcast is always safe. customer, supplier,
    orders, lineitem all grow with sf; hinting any of them (r2 broadcast
    unfiltered customer) is a guaranteed multi-GB broadcast at 100×.
    Unhinted, Catalyst/AQE still broadcast them at small scale (size-based)
    and fall back to shuffle joins when they outgrow the threshold."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("string").cast("double").alias("revenue"))
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure scan-filter-aggregate — every predicate is
    pushable, the ideal pushdown/codegen showcase."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=_Q4_SQL, driver=False)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog: correlated EXISTS with a non-equi condition —
    planned as a left-semi join on the key plus the date predicate."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    slow = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q14_SQL = """
SELECT CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(12,2))) END) AS VARCHAR)
            AS DOUBLE) AS promo_revenue,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
         AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog: conditional aggregation across a dimension join
    (promo revenue vs total for one quarter)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        # no broadcast hint: part is sf-proportional (same policy as q3/q5);
        # AQE broadcasts it while it fits, shuffles when it doesn't
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", disc_price))
            .cast("string")
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc_price).cast("string").cast("double").alias("total_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Join family (J1-J3 breadth: inner / left / full outer / semi / anti / cross)
# --------------------------------------------------------------------------

_JOIN_LEFT_SQL = """
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       CAST(coalesce(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
"""


@register("join_left_customer_orders", oracle=_JOIN_LEFT_SQL, driver=False)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join (J1/J2 semantics): unmatched left rows survive with zeroed
    aggregates — COUNT(col) skips the NULLs the join introduces."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_spent"),
        )
    )


_JOIN_OUTER_SQL = """
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
), sd AS (
  SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ships
  FROM lineitem GROUP BY 1
)
SELECT coalesce(od.d, sd.d) AS activity_date,
       coalesce(n_orders, 0) AS n_orders,
       coalesce(n_ships, 0) AS n_ships
FROM od FULL OUTER JOIN sd ON od.d = sd.d
"""


@register("join_outer_daily_activity", oracle=_JOIN_OUTER_SQL, driver=False)
def join_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join + zero-fill — the reference's J3+P15 pattern
    (daily_aggregator.py:234-243) on order/ship date activity."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    od = o.groupBy(F.to_date("o_orderdate").alias("activity_date")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    sd = l.groupBy(F.to_date("l_shipdate").alias("activity_date")).agg(
        F.count(F.lit(1)).alias("n_ships")
    )
    return od.join(sd, on="activity_date", how="outer").na.fill(
        0, subset=["n_orders", "n_ships"]
    )


_JOIN_SEMI_ANTI_SQL = """
SELECT 'semi' AS side, c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION ALL
SELECT 'anti' AS side, c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("join_semi_anti", oracle=_JOIN_SEMI_ANTI_SQL)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) + left-anti (NOT EXISTS) joins, tag-unioned into
    one driver entry (registry curation): the semi branch probes 'F'
    orders with no row multiplication; the anti branch keeps customers
    without any order. Both join modes stay visible in the plan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = (
        c.join(
            o.filter(F.col("o_orderstatus") == "F"),
            c.c_custkey == o.o_custkey,
            "left_semi",
        )
        .select(F.lit("semi").alias("side"), "c_custkey", "c_name")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("anti").alias("side"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


_JOIN_CROSS_SQL = "SELECT n_name, r_name FROM nation CROSS JOIN region"


@register("join_cross_nation_region", oracle=_JOIN_CROSS_SQL)
def join_cross_nation_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (tiny × tiny only — never on facts)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(r).select("n_name", "r_name")


# --------------------------------------------------------------------------
# Window family (W1 + ranking / analytic / explicit frames)
# --------------------------------------------------------------------------

_WINDOW_SUITE_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
       CAST(ROW_NUMBER() OVER wp AS INTEGER) AS rn,
       CAST(RANK() OVER wp AS INTEGER) AS rnk,
       CAST(DENSE_RANK() OVER wp AS INTEGER) AS drnk,
       CAST(NTILE(4) OVER wp AS INTEGER) AS quartile,
       lag(o_totalprice) OVER wd AS prev_price,
       lead(o_totalprice) OVER wd AS next_price,
       first_value(o_orderdate) OVER wf AS first_order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wf AS DOUBLE)
         AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER wm AS DOUBLE)
         / COUNT(*) OVER wm AS moving_avg_price
FROM orders
WINDOW wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wm AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@register("window_suite_orders", oracle=_WINDOW_SUITE_SQL, driver=False)
def window_suite_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function suite in one driver entry (registry curation):
    ranking (row_number/rank/dense_rank/ntile, price-desc order), analytic
    (lag/lead/first_value), cumulative ROWS frame (running decimal sum —
    the W1 pattern generalized) and bounded ROWS frame (3-row moving
    average, exact decimal numerator). All four specs share the o_custkey
    hash partitioning, so Spark plans ONE exchange and per-spec sorts."""
    o = load_table(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    wd = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wm = wd.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(wp).alias("rn"),
        F.rank().over(wp).alias("rnk"),
        F.dense_rank().over(wp).alias("drnk"),
        F.ntile(4).over(wp).alias("quartile"),
        F.lag("o_totalprice").over(wd).alias("prev_price"),
        F.lead("o_totalprice").over(wd).alias("next_price"),
        F.first("o_orderdate").over(wf).alias("first_order_date"),
        F.sum(_dec("o_totalprice")).over(wf).cast("double").alias("running_spend"),
        (
            F.sum(_dec("o_totalprice")).over(wm).cast("double")
            / F.count(F.lit(1)).over(wm)
        ).alias("moving_avg_price"),
    )


_WINDOW_DIST_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


@register("window_distribution_funcs", oracle=_WINDOW_DIST_SQL)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist — exact rational formulas, identical across engines."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_TOPK_GROUP_SQL = """
WITH ranked AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
              ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
  FROM customer
)
SELECT c_custkey, c_nationkey, c_acctbal, rn FROM ranked WHERE rn <= 3
"""


@register("topk_per_group", oracle=_TOPK_GROUP_SQL, driver=False)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number ≤ K — the scalable top-k idiom (no
    global sort; per-partition heaps then one shuffle of K×groups rows)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_nationkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


_TOP20_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
"""


@register("top20_lineitems", oracle=_TOP20_SQL)
def top20_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global deterministic top-k (Spark plans TakeOrderedAndProject —
    no full sort materialization). Locally verified only: the driver entry
    for this idiom is q3_shipping_priority's ORDER BY+LIMIT tail."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Aggregation family (A1-A4 breadth: cube / rollup / grouping sets / stats)
# --------------------------------------------------------------------------

_MULTILEVEL_SQL = """
SELECT 'cube' AS op, l_returnflag AS key1, l_linestatus AS key2,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS agg_val
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
UNION ALL
SELECT 'rollup', o_orderstatus, o_orderpriority, COUNT(*),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets', c_mktsegment, CAST(c_nationkey AS VARCHAR), COUNT(*),
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""

_GROUPING_SETS_SQL = """
SELECT c_mktsegment AS key1, CAST(c_nationkey AS STRING) AS key2,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS agg_val
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


@register("agg_multilevel", oracle=_MULTILEVEL_SQL, driver=False)
def agg_multilevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (2^k combinations), ROLLUP (hierarchical subtotals) and
    explicit GROUPING SETS (via the SQL surface — same Catalyst Expand
    node), tag-unioned to one driver entry (registry curation). Each
    branch keeps its own one-pass Expand+HashAggregate plan."""
    l = load_table(spark, sf_dir, "lineitem")
    cube = l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_dec("l_quantity")).cast("double").alias("agg_val"),
    ).select(
        F.lit("cube").alias("op"),
        F.col("l_returnflag").alias("key1"),
        F.col("l_linestatus").alias("key2"),
        "n_rows",
        "agg_val",
    )
    o = load_table(spark, sf_dir, "orders")
    rollup = o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_dec("o_totalprice")).cast("double").alias("agg_val"),
    ).select(
        F.lit("rollup").alias("op"),
        F.col("o_orderstatus").alias("key1"),
        F.col("o_orderpriority").alias("key2"),
        "n_rows",
        "agg_val",
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    gsets = spark.sql(_GROUPING_SETS_SQL).select(
        F.lit("gsets").alias("op"), "key1", "key2", "n_rows", "agg_val"
    )
    return cube.unionByName(rollup).unionByName(gsets)


_STATS_SQL = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         MIN(l_extendedprice) AS min_price,
         MAX(l_extendedprice) AS max_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
           AS sum_sq,
         median(l_extendedprice) AS median_price,
         quantile_cont(l_extendedprice, 0.25) AS p25_price,
         quantile_cont(l_extendedprice, 0.95) AS p95_price
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n, min_price, max_price, sum_price,
       sqrt((sum_sq - (sum_price * sum_price) / n) / (n - 1)) AS stddev_price,
       median_price, p25_price, p95_price
FROM s
"""


@register("agg_stats_percentiles", oracle=_STATS_SQL)
def agg_stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Descriptive statistics + exact interpolated percentiles in one
    groupBy (registry curation). The stddev is order-exact: both moments
    are decimal-exact sums, so the double formula evaluates identically in
    any engine (native stddev_samp is summation-order dependent). Spark
    `percentile` and DuckDB `quantile_cont` share the linear-interpolation
    definition, so they tie out bit-identically on identical doubles.
    (The 100 TB percentile variant is `percentile_approx`.)

    The three quantiles come from ONE array-percentile aggregate
    (r13): `median` / three scalar `percentile` calls each keep their
    own sorted-values buffer per group — three sorts of the same column
    — where `percentile(col, array(...))` sorts once and interpolates
    all three positions from it, element-wise identical by definition
    (measured 3.6 -> 1.85 s at sf0.1, values bit-equal)."""
    l = load_table(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        F.sum(_dec("l_extendedprice") * _dec("l_extendedprice"))
        .cast("string")
        .cast("double")
        .alias("sum_sq"),
        F.percentile("l_extendedprice", F.lit([0.25, 0.5, 0.95])).alias(
            "_pcts"
        ),
    ).withColumns(
        {
            "median_price": F.element_at("_pcts", 2),
            "p25_price": F.element_at("_pcts", 1),
            "p95_price": F.element_at("_pcts", 3),
        }
    )
    n = F.col("n")
    return g.select(
        "l_returnflag",
        "n",
        "min_price",
        "max_price",
        "sum_price",
        F.sqrt(
            (F.col("sum_sq") - (F.col("sum_price") * F.col("sum_price")) / n)
            / (n - F.lit(1))
        ).alias("stddev_price"),
        "median_price",
        "p25_price",
        "p95_price",
    )


_APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_5pct
FROM lineitem GROUP BY l_returnflag
"""


@register("agg_approx_distinct", oracle=_APPROX_DISTINCT_SQL, driver=False)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB substitute for exact
    countDistinct. Driver-checkable contract (VERDICT r1 #6): the sketch
    estimate itself is engine-specific, so the output carries the exact
    count plus a boolean asserting the estimate lands within 5% of it.
    HLL is an order-independent max-merge sketch, so for a fixed input the
    boolean is deterministic; the oracle pins exact_parts and TRUE."""
    l = load_table(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts")
    return g.select("l_returnflag", "exact_parts", (err < 0.05).alias("within_5pct"))


_Q17_SQL = """
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem
JOIN pa USING (l_partkey)
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#11' AND l_quantity < 0.2 * avg_qty
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + re-join — how Catalyst executes it
    anyway; the per-part average is an exact decimal sum over count."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    pa = l.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        l.join(pa, "l_partkey")
        # no hint on the brand-filtered part (sf-proportional; q3/q5 policy)
        .join(p, l.l_partkey == p.p_partkey)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


_Q6_Q14_Q17_SQL = f"""
SELECT q6.*, q14.*, q17.*
FROM ({_Q6_SQL}) q6 CROSS JOIN ({_Q14_SQL}) q14 CROSS JOIN ({_Q17_SQL}) q17
"""


@register("q6_q14_q17_metrics", oracle=_Q6_Q14_Q17_SQL, driver=False)
def q6_q14_q17_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 + Q14 + Q17 analogs as one single-row driver entry
    (registry curation: three 1-row results cross-joined — each branch's
    plan is unchanged: Q6 pure pushdown filter-agg, Q14 conditional agg
    over a broadcast dimension join, Q17 decorrelated scalar subquery)."""
    return (
        q6_forecast_revenue(spark, sf_dir)
        .crossJoin(q14_promo_effect(spark, sf_dir))
        .crossJoin(q17_small_quantity(spark, sf_dir))
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

_SET_OPS_SQL = """
SELECT 'union_all' AS op, custkey, n FROM (
  SELECT custkey, COUNT(*) AS n FROM (
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  ) GROUP BY custkey
)
UNION ALL
SELECT 'union_distinct', custkey, NULL FROM (
  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
  UNION
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
)
UNION ALL
SELECT 'intersect', custkey, NULL FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT o_custkey FROM orders
)
UNION ALL
SELECT 'except', custkey, NULL FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
  EXCEPT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
)
"""


@register("set_ops", oracle=_SET_OPS_SQL)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full set-operation surface tag-unioned into one driver entry
    (registry curation): UNION ALL (bag union + agg), UNION (distinct),
    INTERSECT (distinct), EXCEPT (distinct — ``subtract`` IS Spark's
    EXCEPT DISTINCT; ``exceptAll().distinct()`` would differ when a left
    row occurs more times than on the right). Each branch keeps its own
    plan node (Union, HashAggregate, LeftSemi/LeftAnti for
    intersect/except)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    p_orders = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    union_all = (
        f_orders.unionByName(urgent)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("union_all").alias("op"), "custkey", "n")
    )
    null_n = F.lit(None).cast("long").alias("n")
    union_distinct = (
        f_orders.unionByName(p_orders)
        .distinct()
        .select(F.lit("union_distinct").alias("op"), "custkey", null_n)
    )
    intersect = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
        .intersect(o.select(F.col("o_custkey").alias("custkey")))
        .select(F.lit("intersect").alias("op"), "custkey", null_n)
    )
    except_ = (
        c.filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"))
        .subtract(p_orders)
        .select(F.lit("except").alias("op"), "custkey", null_n)
    )
    return (
        union_all.unionByName(union_distinct)
        .unionByName(intersect)
        .unionByName(except_)
    )


# --------------------------------------------------------------------------
# Scalar function surface (string / date / math)
# --------------------------------------------------------------------------

_STRING_SQL = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       CAST(length(p_name) AS INTEGER) AS name_len,
       substr(p_type, 1, 5) AS type_prefix,
       concat(p_brand, ':', p_type) AS brand_type,
       replace(p_name, 'a', '@') AS name_replaced,
       (p_type LIKE '%STANDARD%') AS is_standard,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       regexp_extract(p_name, '([aeiou]+)', 1) AS first_vowels,
       regexp_matches(p_name, '[0-9]') AS has_digit,
       array_to_string(string_split(p_type, 'A'), '|') AS type_parts,
       trim(concat('  ', p_name, '  ')) AS trimmed,
       reverse(p_brand) AS brand_rev,
       coalesce(nullif(p_brand, 'Brand#11'), 'OTHER') AS brand_or_other,
       greatest(p_size, 25) AS size_floor,
       least(p_size, 25) AS size_cap,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'mid'
            ELSE 'large' END AS size_band,
       (p_size IS NULL) AS size_missing
FROM part
"""


@register("scalar_string_funcs", oracle=_STRING_SQL)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface over part, one driver entry (registry
    curation): string (case/length/substring/concat/replace/LIKE/padding),
    regex (extract/rlike/split) + trim/reverse, and conditionals
    (coalesce/nullif/greatest/least/CASE/IS NULL)."""
    p = load_table(spark, sf_dir, "part")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_name", "a", "@").alias("name_replaced"),
        F.col("p_type").like("%STANDARD%").alias("is_standard"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_name", "([aeiou]+)", 1).alias("first_vowels"),
        F.col("p_name").rlike("[0-9]").alias("has_digit"),
        # arrays stringify differently across fetch paths (list vs ndarray);
        # oracle-checked outputs stay scalar
        F.array_join(F.split("p_type", "A"), "|").alias("type_parts"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.reverse("p_brand").alias("brand_rev"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#11")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.greatest(size, F.lit(25)).alias("size_floor"),
        F.least(size, F.lit(25)).alias("size_cap"),
        F.when(size < 10, "small")
        .when(size < 30, "mid")
        .otherwise("large")
        .alias("size_band"),
        size.isNull().alias("size_missing"),
    )


_DATE_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(day(o_orderdate) AS INTEGER) AS order_day,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
       date_trunc('month', o_orderdate) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
         AS days_since_start
FROM orders
"""


@register("scalar_date_funcs", oracle=_DATE_SQL)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface. DuckDB's dayofweek is 0=Sunday vs
    Spark's 1=Sunday; the oracle shifts by one."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_start"
        ),
    )


_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice + 1), 6) AS price_ln,
       round(pow(1 + l_discount, 2), 6) AS disc_pow
FROM lineitem
"""


@register("scalar_math_funcs", oracle=_MATH_SQL)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface; transcendentals rounded to 6dp (libm vs JVM
    StrictMath can differ in the last ulp)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_pow"),
    )


_PIVOT_SQL = """
SELECT c_mktsegment,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("pivot_status_by_segment", oracle=_PIVOT_SQL)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot with an explicit value list (one pass, no second
    scan for value discovery — required at scale), over an inner fact→dim
    join (unhinted: customer is sf-proportional, q3/q5 broadcast policy);
    total count + decimal spend per segment ride the same aggregation
    (absorbs the former join_inner_mktsegment entry)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    piv = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_dec("o_totalprice")).alias("spend"),
        )
    )

    def _cnt(s: str) -> F.Column:
        return F.coalesce(F.col(f"{s}_cnt"), F.lit(0))

    def _spend(s: str) -> F.Column:
        return F.coalesce(F.col(f"{s}_spend"), F.lit(0).cast(DEC))

    return piv.select(
        "c_mktsegment",
        _cnt("O").alias("O"),
        _cnt("F").alias("F"),
        _cnt("P").alias("P"),
        (_cnt("O") + _cnt("F") + _cnt("P")).alias("n_orders"),
        # decimal additions of the pivoted partial sums — order-exact
        (_spend("O") + _spend("F") + _spend("P")).cast("double").alias("total_price"),
    )


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, val FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
)
"""


@register("unpivot_lineitem", oracle=_UNPIVOT_SQL)
def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of three measures."""
    l = load_table(spark, sf_dir, "lineitem")
    out = l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )
    return out.withColumn("measure", F.regexp_replace("measure", "^l_", ""))


# --------------------------------------------------------------------------
# Dashboard-shaped scans (S5/S6 analogs; driver entries are the events
# variants — these stay locally verified for the pushdown plan asserts)
# --------------------------------------------------------------------------

_MONTH_SLICE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
"""


@register("orders_month_slice", oracle=_MONTH_SLICE_SQL, driver=False)
def orders_month_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: time-slice scan — prunes to one partition when the table is
    stored partitioned by month. Locally verified only: the driver entry
    for S6 is events_day_slice."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


# --------------------------------------------------------------------------
# Round-3 breadth: four more classic TPC-H shapes (Q13/Q18/Q19/Q22
# analogs, adapted to the trimmed test schema — no comment/phone/container
# columns). All local-only: the driver budget is full at 50; these are
# oracle-verified every run by tests/test_oracle_differential.py.
# --------------------------------------------------------------------------

_Q13_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
"""


@register("q13_customer_distribution", oracle=_Q13_SQL, driver=False)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-side predicate (the
    filter must live in the JOIN condition, not a post-filter — a
    post-filter would silently turn the outer join inner), then a
    two-level aggregation into the orders-per-customer histogram.
    The priority filter stands in for the spec's o_comment NOT LIKE
    (column absent in the trimmed schema). Scale: both aggregations
    shuffle on narrow keys; customers with zero qualifying orders
    survive via the outer join — the classic mistake this query shape
    exists to catch."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, big.sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("q18_large_volume_customers", oracle=_Q18_SQL, driver=False)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact-table aggregation feeding a
    join chain (the grouped-subquery-as-semi-filter idiom). The
    aggregation reduces lineitem to qualifying orderkeys BEFORE any
    join touches orders/customer — at 100 TB the having-filtered agg
    output is tiny, so AQE broadcasts it into both probe joins; the
    expensive table is scanned exactly once."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey", F.col("q").cast("double").alias("sum_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


_Q19_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 20 AND 50
       AND l.l_quantity BETWEEN 20 AND 40)
"""


@register("q19_disjunctive_revenue", oracle=_Q19_SQL, driver=False)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive mixed-table predicate over an
    equi-join. Catalyst extracts the common p_partkey equi-condition so
    the join stays hash-based, pushes the single-table parts of each OR
    branch below the join (p_brand/p_size to the part scan, l_quantity
    to lineitem), and evaluates only the residual OR above it — the
    optimizer behavior this query exists to exercise. Exact decimal
    accumulation, same policy as q1."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & qty.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(20, 50)
            & qty.between(20, 40)
        )
    )
    return j.filter(branch).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("string")
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS a
  FROM customer WHERE c_acctbal > 0
),
dormant AS (
  SELECT c.c_nationkey, c.c_acctbal
  FROM customer c, avg_bal
  WHERE c.c_acctbal > avg_bal.a
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    )
)
SELECT c_nationkey, COUNT(*) AS n_custs,
       CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
         AS total_acctbal
FROM dormant GROUP BY c_nationkey
"""


@register("q22_dormant_customers", oracle=_Q22_SQL, driver=False)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (above-average account
    balance, computed with exact decimal sums so the boundary comparison
    is bit-deterministic cross-engine) + anti-join against recent orders
    (nationkey stands in for the spec's phone country code). The scalar
    is one row — broadcast into the filter; the anti-join shuffles on
    custkey only. Recency filter sits on the orders side BEFORE the
    anti-join, pruning most of the fact table at the scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
            ).alias("a")
        )
    )
    recent = o.filter(F.col("o_orderdate") >= "2000-01-01").select("o_custkey")
    dormant = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(_dec("c_acctbal")).cast("string").cast("double").alias(
            "total_acctbal"
        ),
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rd
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(CAST(rev.rd AS VARCHAR) AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
WHERE rev.rd = (SELECT MAX(rd) FROM rev)
"""


@register("q15_top_supplier", oracle=_Q15_SQL, driver=False)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-of-aggregate — a revenue "view" per
    supplier over one quarter, filtered to the row(s) equal to the
    view's own MAX. The max comparison happens on the EXACT decimal
    (double conversion only at output), so the boundary equality is
    bit-deterministic cross-engine. Plan: the revenue agg computes once
    and feeds both the max (one row, broadcast back) and the probe —
    AQE reuses the shuffle stage rather than recomputing the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
            ).alias("rd")
        )
    )
    mx = rev.agg(F.max("rd").alias("m"))
    return (
        s.join(rev, s.s_suppkey == rev.l_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("rd") == F.col("m"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("rd").cast("string").cast("double").alias("total_revenue"),
        )
    )


_Q21_SQL = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
sole_late AS (
  SELECT DISTINCT a.l_orderkey, a.l_suppkey FROM late a
  WHERE a.is_late = 1
    AND EXISTS (SELECT 1 FROM late b
                WHERE b.l_orderkey = a.l_orderkey
                  AND b.l_suppkey <> a.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late c
                    WHERE c.l_orderkey = a.l_orderkey
                      AND c.l_suppkey <> a.l_suppkey AND c.is_late = 1)
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM sole_late j JOIN supplier s ON s.s_suppkey = j.l_suppkey
GROUP BY s.s_suppkey, s.s_name
"""


@register("q21_waiting_suppliers", oracle=_Q21_SQL, driver=False)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-late-supplier-in-a-multi-supplier-order
    pattern (correlated EXISTS + NOT EXISTS over the same derived
    relation — the oracle keeps that formulation). The Spark plan is the
    DECORRELATED equivalent: per-(order, supplier) late flags, one
    per-order aggregation (supplier count, late-supplier count), then
    the filter late=1 AND n_supp>1 AND n_late=1 — two hash aggregations
    and one join instead of two correlated subquery scans, which is how
    this query survives a fact table 100x bigger. Lateness is
    l_shipdate > o_orderdate + 90 days (the trimmed schema has no
    commit/receipt dates)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_late"),
    )
    per = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late_flag")
    )
    ordstats = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late_flag").alias("n_late")
    )
    sole = (
        per.join(ordstats, "l_orderkey")
        .filter(
            (F.col("late_flag") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    return (
        sole.join(s, sole.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q10_SQL = """
WITH agg AS (
  SELECT o.o_custkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS rev
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY o.o_custkey
)
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
       CAST(CAST(agg.rev AS VARCHAR) AS DOUBLE) AS revenue
FROM agg
JOIN customer c ON c.c_custkey = agg.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=_Q10_SQL, driver=False)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer over a
    quarter, top 20. The fact-fact join aggregates FIRST (orders x
    returned lineitems → per-customer revenue), and only the surviving
    per-customer rows join the customer/nation dimensions — dimension
    columns never ride through the big shuffle. Deterministic top-20:
    revenue ties broken by custkey; executes as TakeOrderedAndProject
    (no global sort)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
            ).alias("rev")
        )
    )
    return (
        agg.join(c, agg.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("rev").cast("string").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q7_SQL = """
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS VARCHAR) AS DOUBLE)
         AS volume
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
    OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
GROUP BY cn.n_name, sn.n_name, l_year
"""


@register("q7_nation_volume", oracle=_Q7_SQL, driver=False)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    year — a five-join chain where the SAME dimension (nation) joins
    twice under different roles (customer's vs supplier's), plus a
    disjunctive cross-role predicate that only becomes checkable after
    both joins. Both nation joins broadcast (25 rows); the fact chain
    shuffles on orderkey/custkey/suppkey; year extraction grouped
    post-join."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nt = load_table(spark, sf_dir, "nation")
    cn = nt.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nt.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | (
        (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(
                _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
            )
            .cast("string")
            .cast("double")
            .alias("volume")
        )
    )


_Q8_SQL = """
WITH trade AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l.l_discount AS DECIMAL(12,2))) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
)
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS VARCHAR)
            AS DOUBLE) AS nation_volume,
       CAST(CAST(SUM(volume) AS VARCHAR) AS DOUBLE) AS total_volume
FROM trade GROUP BY o_year
"""


@register("q8_market_share", oracle=_Q8_SQL, driver=False)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part trade
    by order year — an eight-relation join where region and part type
    filter INSIDE their joins (each prunes the fact stream in the same
    stage as its broadcast join) and the share splits as a conditional
    sum over the same rows. Share emitted as exact-decimal numerator
    and denominator (both to double at output) rather than their
    quotient: cross-engine division of two decimal-exact values is the
    one safe way to compare ratios bit-exactly."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nt = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cn = nt.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nt.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    trade = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(p, l.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(DEC)
    return trade.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                zero
            )
        )
        .cast("string")
        .cast("double")
        .alias("nation_volume"),
        F.sum("volume").cast("string").cast("double").alias("total_volume"),
    )


_Q9_SQL = """
SELECT sn.n_name AS supp_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS o_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                 - CAST(p.p_retailprice AS DECIMAL(12,2))
                   * CAST(l.l_quantity AS DECIMAL(12,2))) AS VARCHAR)
            AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%a%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY sn.n_name, o_year
"""


@register("q9_product_profit", oracle=_Q9_SQL, driver=False)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and ship year over a
    part-name pattern — revenue minus cost where cost uses
    p_retailprice*quantity (the trimmed schema has no partsupp
    supplycost; the idiom — LIKE-filtered part join, signed decimal
    arithmetic, nation/year rollup — is unchanged). The LIKE filter
    lives in the part join; profit accumulates as a single exact
    decimal expression including the subtraction, so negative values
    round-trip exactly."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    s = load_table(spark, sf_dir, "supplier")
    nt = load_table(spark, sf_dir, "nation")
    sn = nt.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .groupBy(
            "supp_nation", F.year("l_shipdate").cast("int").alias("o_year")
        )
        .agg(F.sum(profit).cast("string").cast("double").alias("profit"))
    )


_EXPECTATIONS_SQL = """
WITH a AS (
  SELECT
    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
    CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v_uniq,
    CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
              AND (o_totalprice < 0 OR o_totalprice > 600000)
             THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
    CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('O', 'F', 'P')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_acc,
    CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
              AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_re
  FROM orders
), ref AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v_ref
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
)
SELECT 'not_null:o_custkey' AS rule, v_null AS violations, v_null = 0 AS passed FROM a
UNION ALL
SELECT 'unique:o_orderkey', v_uniq, v_uniq = 0 FROM a
UNION ALL
SELECT 'in_range:o_totalprice', v_range, v_range = 0 FROM a
UNION ALL
SELECT 'accepted_values:o_orderstatus', v_acc, v_acc = 0 FROM a
UNION ALL
SELECT 'matches:o_orderpriority', v_re, v_re = 0 FROM a
UNION ALL
SELECT 'referential:o_custkey->c_custkey', v_ref, v_ref = 0 FROM ref
"""


@register("orders_expectations", oracle=_EXPECTATIONS_SQL, driver=False)
def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over `orders`
    (operators/expectations.py; registry #107): five row-level /
    uniqueness rules compiled to ONE single-scan aggregate (map-side
    combined, 1-row shuffle — rule count does not change the pass
    count) plus a referential-integrity anti-join against `customer`.
    The report is (rule, violations, passed) — the publishable artifact
    a pipeline alerts on. On the driver data every rule passes; the
    operator's failure paths are unit-tested with planted violations
    (tests/test_expectations.py)."""
    from projekt_data_engineering_iubh_spark.operators import expectations as ex

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    report = ex.check(
        o,
        [
            ex.not_null("o_custkey"),
            ex.unique("o_orderkey"),
            ex.in_range("o_totalprice", 0, 600000),
            ex.accepted_values("o_orderstatus", ["O", "F", "P"]),
            ex.matches("o_orderpriority", "^[1-5]-"),
        ],
    )
    return report.unionByName(
        ex.referential(o, c, "o_custkey", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Z-order layout blocks (registry query #116)
# ---------------------------------------------------------------------------

from projekt_data_engineering_iubh_spark.operators import zorder  # noqa: E402

_Z_BITS = 8  # 8-bit buckets per dimension -> z in [0, 65536)
_Z_DEN = 1 << _Z_BITS
_Z_BLOCK_SHIFT = 8  # 256 blocks of 256 z-values = 16x16 tiles

_ZORDER_SQL = f"""
WITH b AS (
  SELECT l_partkey % {_Z_DEN} AS xb, l_suppkey % {_Z_DEN} AS yb
  FROM lineitem
), z AS (
  SELECT xb, yb,
         {zorder.zvalue_sql('xb', 'yb', _Z_BITS)} AS zval
  FROM b
)
SELECT zval >> {_Z_BLOCK_SHIFT} AS block,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(xb) AS BIGINT) AS part_min,
       CAST(MAX(xb) AS BIGINT) AS part_max,
       CAST(MAX(xb) - MIN(xb) + 1 AS BIGINT) AS part_span,
       CAST(MIN(yb) AS BIGINT) AS supp_min,
       CAST(MAX(yb) AS BIGINT) AS supp_max,
       CAST(MAX(yb) - MIN(yb) + 1 AS BIGINT) AS supp_span
FROM z GROUP BY 1
"""


@register("lineitem_zorder_blocks", oracle=_ZORDER_SQL, driver=False)
def lineitem_zorder_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout blocks over lineitem's two query
    dimensions — the multi-dimensional data-layout lever behind Delta's
    OPTIMIZE ZORDER BY, as an oracle-checkable kernel (no reference
    analog; operators/zorder.py documents the 100 TB write path:
    repartitionByRange(zval) + in-partition sort so file- and
    row-group-level min/max pruning compose).

    Each row's (l_partkey, l_suppkey) is bucketed into an 8-bit x 8-bit
    grid and bit-interleaved; consecutive 256-value z-ranges (the blocks
    a writer would pack into one row group) are then PROVEN tight in
    BOTH dimensions by the verified output itself: every block's
    part_span and supp_span is at most 16 of 256 bucket values — a
    single-key sort would show span 256 in the other dimension.
    tools/zorder_layout_audit.py measures the resulting row-group
    pruning on real parquet metadata.

    All arithmetic is shift/mask/add on non-negative bigints — exact on
    both engines; one groupBy(block) shuffle (256 groups, map-side
    combined)."""
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        (F.col("l_partkey") % _Z_DEN).alias("xb"),
        (F.col("l_suppkey") % _Z_DEN).alias("yb"),
    )
    z = b.select(
        "xb", "yb", zorder.zvalue(F.col("xb"), F.col("yb"), _Z_BITS).alias("zval")
    )
    return (
        z.select(F.shiftright(F.col("zval"), _Z_BLOCK_SHIFT).alias("block"), "xb", "yb")
        .groupBy("block")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("xb").cast("long").alias("part_min"),
            F.max("xb").cast("long").alias("part_max"),
            (F.max("xb") - F.min("xb") + 1).cast("long").alias("part_span"),
            F.min("yb").cast("long").alias("supp_min"),
            F.max("yb").cast("long").alias("supp_max"),
            (F.max("yb") - F.min("yb") + 1).cast("long").alias("supp_span"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit conformance test (registry query #135)
# ---------------------------------------------------------------------------

# P(first digit = d) = log10(1 + 1/d), quantized to exact per-mille
# literals (they sum to exactly 1000); computed once in Python so both
# engines compare against identical integers.
_BENFORD_MILLI = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58,
                  8: 51, 9: 46}

_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_MILLI.items())
    + " END"
)

_BENFORD_SQL = f"""
WITH d AS (
  SELECT CAST(SUBSTRING(CAST(ABS(CAST(FLOOR(o_totalprice) AS BIGINT))
                             AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders
  WHERE ABS(CAST(FLOOR(o_totalprice) AS BIGINT)) >= 1
),
c AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_d,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n
  FROM d GROUP BY 1
)
SELECT digit, n_d, n,
       CAST({_BENFORD_CASE} AS BIGINT) AS expected_milli,
       CAST(1000 * n_d - n * ({_BENFORD_CASE}) AS BIGINT) AS diff_milli,
       CAST(((1000 * n_d - n * ({_BENFORD_CASE}))
             * (1000 * n_d - n * ({_BENFORD_CASE})))
            // (n * ({_BENFORD_CASE})) AS BIGINT) AS chi2_contrib_milli
FROM c
"""


@register("orders_benford", oracle=_BENFORD_SQL, driver=False)
def orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit conformance over order totals — the
    forensic data-quality test for fabricated or truncated monetary
    data (naturally-grown amounts follow P(d) = log10(1 + 1/d); uniform
    synthetic generators, like this fixture's, do NOT — the test's
    per-digit chi-square contributions make that legible). Expected
    probabilities are exact per-mille integer literals summing to 1000,
    so the deviation diff_d = 1000*n_d - n*p_milli(d) and its
    chi-square-style contribution diff^2 DIV (n * p_milli) are pure
    bigint on both engines (magnitude budget: |diff| <= 1000n, so
    diff^2 <= 1e6 n^2 — safe to ~3e6 rows per digit cell; normalize
    the scale up at larger corpora). Sign/magnitude contract (r8): the
    digit is taken from ABS(FLOOR(value)) so negative amounts screen by
    magnitude (standard forensic practice), and |value| < 1 rows are
    excluded on BOTH engines — they have no first significant integer
    digit and previously produced a NULL digit bucket (and a
    cross-engine CAST divergence for negatives).

    Scale shape: a map-side digit projection and one 9-group aggregate;
    the corpus total comes from an unpartitioned window over the 9-row
    aggregate, not a second scan."""
    d = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.abs(F.floor(F.col("o_totalprice")).cast("long")).alias("mag")
        )
        .filter(F.col("mag") >= 1)
        .select(
            F.substring(F.col("mag").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_d"))
    w = Window.partitionBy()
    c = c.withColumn("n", F.sum("n_d").over(w).cast("long"))
    return c.select(
        "digit",
        "n_d",
        "n",
        F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("expected_milli"),
        F.expr(
            f"CAST(1000 * n_d - n * ({_BENFORD_CASE}) AS BIGINT)"
        ).alias("diff_milli"),
        F.expr(
            f"CAST(((1000 * n_d - n * ({_BENFORD_CASE}))"
            f" * (1000 * n_d - n * ({_BENFORD_CASE})))"
            f" DIV (n * ({_BENFORD_CASE})) AS BIGINT)"
        ).alias("chi2_contrib_milli"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (registry query #136)
# ---------------------------------------------------------------------------

# (child table, fk column, parent table, pk column) — the fixture's full
# foreign-key graph; reference analog: init_db.sql's implicit FK contract
# between machine_data and daily_summary.
_RI_EDGES = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

_RI_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{child}.{fk} -> {parent}.{pk}' AS relationship,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_fk,
       CAST(SUM(CASE WHEN {fk} IS NOT NULL AND pk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM (SELECT c.{fk}, p.{pk} AS pk
      FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk})"""
    for child, fk, parent, pk in _RI_EDGES
)


@register("referential_integrity_audit", oracle=_RI_SQL, driver=False)
def referential_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Whole-schema referential-integrity audit: for every foreign-key
    edge in the fixture's TPC-H graph, the row count, NULL-FK count,
    and orphan count (non-null FK with no parent) — the cross-TABLE
    data-quality layer above orders_expectations' single-table rules,
    and the check a 100 TB ingest runs before trusting joins (an orphan
    rate > 0 silently deflates every inner join downstream).

    Scale shape: each edge is one left join probing the parent — the
    fixed-cardinality parents (nation, region) broadcast; the big ones
    (orders, part, supplier as parents) shuffle on the key exactly like
    the production joins this audit protects. Counting NULL-vs-orphan
    separately matters: a NULL FK is a modeling choice, an orphan is
    corruption — conflating them (a bare anti-join count) hides the
    distinction."""
    out: DataFrame | None = None
    for child, fk, parent, pk in _RI_EDGES:
        c = load_table(spark, sf_dir, child).select(fk)
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("__pk")
        )
        j = c.join(p, F.col(fk) == F.col("__pk"), "left").agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_fk"),
            F.sum(
                F.when(
                    F.col(fk).isNotNull() & F.col("__pk").isNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_orphans"),
        ).select(
            F.lit(f"{child}.{fk} -> {parent}.{pk}").alias("relationship"),
            "n_rows",
            "n_null_fk",
            "n_orphans",
        )
        out = j if out is None else out.unionByName(j)
    assert out is not None
    return out
