"""Advanced relational coverage: as-of join, cube, ranking windows,
date/string scalar functions, min-per-group, scalar-subquery filters.

These extend the operator inventory beyond the reference's surface
(SURVEY.md §2.8 notes the reference has no window/as-of machinery) —
they are table stakes for an analytics engine and all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.sources.tables import load_table

# unaliased: call sites attach their own alias
_EV = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"


def _dec(col, prec: int = 18, scale: int = 4):
    return col.cast(f"decimal({prec},{scale})")


# --- as-of join: latest order at or before each event -------------------


def q_asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the most recent order of the matching customer
    placed at or before the event time (keyed join + top-1 window —
    the distributed as-of pattern; at scale both sides pre-partition
    on the key so the join is co-located)."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (orders.o_orderdate <= ev.ts),
        "inner",
    )
    # Top-1-per-event as a MAX aggregate instead of a sort window
    # (r13, guide §2.3 "aggregate before you shuffle"): the window
    # form shuffled EVERY joined (event, order) row to sort it, while
    # the struct-max hash aggregate collapses each event to one row
    # map-side before the exchange — at scale each event matches many
    # orders, so the shuffle shrinks by that multiplicity and the
    # per-partition sort disappears. Equivalence: row_number()=1 over
    # (o_orderdate DESC, o_orderkey DESC) picks exactly the
    # lexicographic max of (o_orderdate, o_orderkey) — both non-NULL —
    # and (user_id, ts) are functionally dependent on event_id;
    # oracle-verified on the unchanged window-form SQL.
    top = joined.groupBy("event_id", "user_id", "ts").agg(
        F.max(F.struct("o_orderdate", "o_orderkey")).alias("_m")
    )
    return top.select(
        "event_id", "user_id", "ts",
        F.col("_m.o_orderkey").alias("o_orderkey"),
        F.col("_m.o_orderdate").alias("o_orderdate"),
    )


_ASOF_ORACLE = f"""
SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
    row_number() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM {_EV} e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


# --- cube ---------------------------------------------------------------


def q_cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("o_totalprice"), 15)).cast("double").alias("total"),
    )


_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
  CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- ranking windows ------------------------------------------------------


def q_supplier_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    order = Window.partitionBy("s_nationkey").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.rank().over(order).cast("long").alias("rnk"),
        F.dense_rank().over(order).cast("long").alias("drnk"),
        F.ntile(4).over(order).cast("long").alias("quartile"),
        F.lead("s_suppkey").over(order).alias("next_supp"),
    )


_RANKS_ORACLE = """
SELECT s_nationkey, s_suppkey, s_acctbal,
  rank()       OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  ntile(4)     OVER w AS quartile,
  lead(s_suppkey) OVER w AS next_supp
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
"""


# --- date functions ---------------------------------------------------------


def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("y"),
            F.quarter("o_orderdate").cast("long").alias("q"),
            F.month("o_orderdate").cast("long").alias("m"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias("days_since"),
            "o_totalprice",
        )
        .groupBy("y", "q", "m")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("days_since").alias("min_days_since"),
            F.sum(_dec(F.col("o_totalprice"), 15)).cast("double").alias("total"),
        )
    )


_MONTHS_ORACLE = """
SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q, month(o_orderdate) AS m,
  count(*) AS n,
  CAST(min(datediff('day', TIMESTAMP '1995-01-01', o_orderdate)) AS INT) AS min_days_since,
  CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total
FROM orders GROUP BY 1, 2, 3
"""


# --- string functions --------------------------------------------------------


def q_customer_string_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_extract("c_name", r"(\d+)", 1).try_cast("long").alias("digits"),
        F.split("c_name", "#").getItem(1).alias("after_hash"),
        F.reverse(F.col("c_mktsegment")).alias("rev_segment"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


_STRINGS_ORACLE = """
SELECT c_custkey,
  upper(c_name) AS upper_name,
  substring(c_name, 1, 8) AS prefix8,
  CAST(length(c_name) AS INT) AS name_len,
  lpad(CAST(c_custkey AS STRING), 10, '0') AS padded_key,
  TRY_CAST(regexp_extract(c_name, '(\\d+)', 1) AS BIGINT) AS digits,
  string_split(c_name, '#')[2] AS after_hash,
  reverse(c_mktsegment) AS rev_segment,
  concat_ws('-', c_mktsegment, CAST(c_nationkey AS STRING)) AS seg_nation
FROM customer
"""


# --- min-per-group (TPC-H Q2 pattern) -----------------------------------------


def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey").orderBy(F.asc("l_extendedprice"), F.asc("l_suppkey"))
    return (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
    )


_CHEAPEST_ORACLE = """
SELECT l_partkey, l_suppkey, l_extendedprice FROM (
  SELECT l_partkey, l_suppkey, l_extendedprice,
    row_number() OVER (PARTITION BY l_partkey
                       ORDER BY l_extendedprice ASC, l_suppkey ASC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


# --- scalar-subquery filter: orders above the customer's average ---------------


def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    avg = (
        orders.groupBy("o_custkey")
        .agg((F.sum(_dec(F.col("o_totalprice"), 15)).cast("double") / F.count(F.lit(1))).alias("avg_total"))
    )
    return (
        orders.join(avg, "o_custkey")
        .where(F.col("o_totalprice") > F.col("avg_total"))
        .select("o_custkey", "o_orderkey", "o_totalprice", F.round("avg_total", 6).alias("avg_total"))
    )


_ABOVE_AVG_ORACLE = """
WITH avg_t AS (
  SELECT o_custkey,
    CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) / count(*) AS avg_total
  FROM orders GROUP BY o_custkey
)
SELECT o.o_custkey, o.o_orderkey, o.o_totalprice, round(a.avg_total, 6) AS avg_total
FROM orders o JOIN avg_t a USING (o_custkey)
WHERE o.o_totalprice > a.avg_total
"""




# --- distribution-rank window functions ----------------------------------


def q_supplier_revenue_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each supplier's position in the revenue distribution:
    percent_rank, cume_dist, and decile (ntile) over one global
    ordering. The ordered relation is the supplier AGGREGATE (one row
    per supplier), so the single-partition window ranks a dimension-
    sized input — never the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,4)")
                * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("revenue", "l_suppkey")
    return rev.select(
        "l_suppkey",
        F.round("revenue", 6).alias("revenue"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        F.ntile(10).over(w).alias("decile"),
    )


_REV_DIST_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))
             * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, round(revenue, 6) AS revenue,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume_dist,
  CAST(ntile(10) OVER w AS INT) AS decile
FROM rev
WINDOW w AS (ORDER BY revenue, l_suppkey)
"""


QUERIES = {
    "supplier_revenue_distribution": q_supplier_revenue_distribution,
    "asof_event_order": q_asof_event_order,
    "cube_order_status_priority": q_cube_order_status_priority,
    "supplier_ranks": q_supplier_ranks,
    "orders_by_month": q_orders_by_month,
    "customer_string_features": q_customer_string_features,
    "cheapest_supplier_per_part": q_cheapest_supplier_per_part,
    "orders_above_customer_avg": q_orders_above_customer_avg,
}

ORACLES = {
    "supplier_revenue_distribution": _REV_DIST_ORACLE,
    "asof_event_order": _ASOF_ORACLE,
    "cube_order_status_priority": _CUBE_ORACLE,
    "supplier_ranks": _RANKS_ORACLE,
    "orders_by_month": _MONTHS_ORACLE,
    "customer_string_features": _STRINGS_ORACLE,
    "cheapest_supplier_per_part": _CHEAPEST_ORACLE,
    "orders_above_customer_avg": _ABOVE_AVG_ORACLE,
}


# --- interarrival gaps between a customer's orders -----------------------


def q_orders_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of day-gaps between consecutive orders per
    customer: lag over the (customer, date, key) ordering, then exact
    integer gap statistics per customer segment."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .where(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            F.datediff("o_orderdate", "prev_date").cast("long").alias("gap_days"),
        )
    )
    return (
        gaps.join(F.broadcast(cust.select("c_custkey", "c_mktsegment")), gaps.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_days").alias("total_gap_days"),
            F.min("gap_days").alias("min_gap"),
            F.max("gap_days").alias("max_gap"),
        )
    )


_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT o_custkey,
         datediff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
  FROM orders
)
SELECT c_mktsegment, count(*) AS n_gaps,
       CAST(sum(gap_days) AS BIGINT) AS total_gap_days,
       CAST(min(gap_days) AS BIGINT) AS min_gap,
       CAST(max(gap_days) AS BIGINT) AS max_gap
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
"""

QUERIES["orders_interarrival"] = q_orders_interarrival
ORACLES["orders_interarrival"] = _INTERARRIVAL_ORACLE


# --- cohort lifetime value -----------------------------------------------


def q_customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTV curves: customers cohorted by first-order month, revenue
    accumulated by months-since-first-order. Two keyed aggregations +
    a running window over the (small) cohort x age matrix; decimal
    sums for engine parity."""
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    aged = orders.join(first, "o_custkey").withColumn(
        "age_months",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        ).cast("long"),
    )
    cell = aged.groupBy("cohort_month", "age_months").agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,4)")).alias("rev"),
        F.count_distinct("o_custkey").alias("n_active"),
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort_month",
        "age_months",
        F.round(F.col("rev").cast("double"), 6).alias("month_revenue"),
        F.round(F.sum("rev").over(w).cast("double"), 6).alias("cumulative_revenue"),
        "n_active",
    )


_COHORT_LTV_ORACLE = """
WITH first AS (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
),
cell AS (
  SELECT cohort_month,
         CAST((year(o_orderdate) - year(cohort_month)) * 12
              + (month(o_orderdate) - month(cohort_month)) AS BIGINT) AS age_months,
         sum(CAST(o_totalprice AS DECIMAL(15,4))) AS rev,
         count(DISTINCT o_custkey) AS n_active
  FROM orders JOIN first USING (o_custkey)
  GROUP BY 1, 2
)
SELECT cohort_month, age_months,
       round(CAST(rev AS DOUBLE), 6) AS month_revenue,
       round(CAST(sum(rev) OVER (PARTITION BY cohort_month ORDER BY age_months
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS cumulative_revenue,
       n_active
FROM cell
"""

QUERIES["customer_cohort_ltv"] = q_customer_cohort_ltv
ORACLES["customer_cohort_ltv"] = _COHORT_LTV_ORACLE
