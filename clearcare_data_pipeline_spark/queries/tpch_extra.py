"""TPC-H-style breadth queries adapted to the synthetic star schema.

Exercises the remaining relational machinery: EXISTS semi-join
aggregation (Q4), two-sided nation volume (Q7), conditional
aggregation buckets (Q12), ratio-of-filtered-revenue (Q14), HAVING
over grouped sums (Q18), disjunctive multi-predicate scans (Q19), and
NOT EXISTS + scalar-subquery filters (Q22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.sources.tables import load_table


def _dec(col, prec: int = 15, scale: int = 4):
    return col.cast(f"decimal({prec},{scale})")


_ONE = "CAST(1 AS DECIMAL(8,4))"
_REV = f"CAST(l_extendedprice AS DECIMAL(15,4)) * ({_ONE} - CAST(l_discount AS DECIMAL(8,4)))"


def _rev_col():
    return _dec(F.col("l_extendedprice")) * (F.lit(1).cast("decimal(8,4)") - _dec(F.col("l_discount"), 8))


# --- Q4: orders with at least one late line, counted by priority --------


def q4_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # "late" proxy: shipped after a fixed anchor date
    late = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1999-01-01')
GROUP BY o_orderpriority
"""


# --- Q7: volume between two nations -------------------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("s_nk"))
        .where(F.col("cust_nation") < F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.sum(_rev_col()).cast("double").alias("volume"), F.count(F.lit(1)).alias("n"))
    )


_Q7_ORACLE = f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       year(l_shipdate) AS l_year,
       CAST(sum({_REV}) AS DOUBLE) AS volume, count(*) AS n
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3
"""


# --- Q12: conditional-aggregation buckets --------------------------------


def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1998-12-31").cast("timestamp")))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


_Q12_ORACLE = """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
GROUP BY l_returnflag
"""


# --- Q14: promo revenue ratio ---------------------------------------------


def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = _rev_col()
    promo = F.col("p_type") == "PROMO"
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(15,4)"))).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


_Q14_ORACLE = f"""
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
       / CAST(sum({_REV}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- Q18: large-volume orders (HAVING over grouped sum) --------------------


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
    )


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(15,4))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(15,4))) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- Q19: disjunctive multi-predicate join ---------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity") < 20))
        | ((F.col("p_brand") == "Brand#20") & (F.col("p_size").between(10, 30)) & (F.col("l_quantity") >= 20))
        | ((F.col("p_type") == "STANDARD") & (F.col("l_quantity").between(10, 40)))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(F.sum(_rev_col()).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


_Q19_ORACLE = f"""
SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue, count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity < 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_type = 'STANDARD' AND l_quantity BETWEEN 10 AND 40)
"""


# --- Q22: customers with no orders, above-average balance -------------------


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pos = cust.where(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(
        (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders.select("o_custkey").distinct(), cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
  CAST(sum(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


QUERIES = {
    "q4_priority_with_late_lines": q4_priority_with_late_lines,
    "q7_nation_volume": q7_nation_volume,
    "q12_priority_buckets": q12_priority_buckets,
    "q14_promo_revenue_ratio": q14_promo_revenue_ratio,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES = {
    "q4_priority_with_late_lines": _Q4_ORACLE,
    "q7_nation_volume": _Q7_ORACLE,
    "q12_priority_buckets": _Q12_ORACLE,
    "q14_promo_revenue_ratio": _Q14_ORACLE,
    "q18_large_orders": _Q18_ORACLE,
    "q19_disjunctive_revenue": _Q19_ORACLE,
    "q22_idle_rich_customers": _Q22_ORACLE,
}
