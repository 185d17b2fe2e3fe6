"""Second TPC-H breadth batch adapted to the synthetic star schema.

Covers the remaining classic relational shapes the schema supports:
nation market share with conditional-share division (Q8), profit
decomposition without a partsupp table (Q9, retailprice-based cost
proxy), top-N returned-item customers (Q10), left-join count
distribution (Q13), argmax-by-scalar-subquery (Q15), and a correlated
per-group average filter (Q17).

Decimal discipline (see tpch_extra.py): every float aggregate runs as
a DECIMAL sum internally and is cast to DOUBLE at the edge, so
Spark-vs-DuckDB results are bit-identical regardless of partial-agg
order. Ratios/differences are computed between already-doubled sums —
never inside decimal typing rules, which differ subtly across engines.
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


# --- Q8: market share of one supplier nation in a region -----------------

_Q8_NATION = "NATION_7"
_Q8_REGION = "ASIA"
_Q8_TYPE = "STANDARD"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_cust = nation.select(F.col("n_nationkey").alias("cn_nk"), F.col("n_regionkey").alias("cn_rk"))
    n_supp = nation.select(F.col("n_nationkey").alias("sn_nk"), F.col("n_name").alias("supp_nation"))
    rev = _rev_col()
    zero = F.lit(0).cast("decimal(24,8)")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part.where(F.col("p_type") == _Q8_TYPE), li.l_partkey == F.col("p_partkey"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_nk"))
        .join(
            F.broadcast(region.where(F.col("r_name") == _Q8_REGION)),
            F.col("cn_rk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_nk"))
    )
    agg = joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == _Q8_NATION, rev).otherwise(zero))
        .cast("double")
        .alias("nation_volume"),
        F.sum(rev).cast("double").alias("total_volume"),
    )
    return agg.select(
        "o_year",
        F.round("nation_volume", 6).alias("nation_volume"),
        F.round("total_volume", 6).alias("total_volume"),
        F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias("mkt_share"),
    )


_Q8_ORACLE = f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation, {_REV} AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN part     ON l_partkey = p_partkey AND p_type = '{_Q8_TYPE}'
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey AND r_name = '{_Q8_REGION}'
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
),
agg AS (
  SELECT o_year,
    CAST(sum(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev ELSE CAST(0 AS DECIMAL(24,8)) END) AS DOUBLE) AS nation_volume,
    CAST(sum(rev) AS DOUBLE) AS total_volume
  FROM j GROUP BY o_year
)
SELECT o_year, round(nation_volume, 6) AS nation_volume,
       round(total_volume, 6) AS total_volume,
       round(nation_volume / total_volume, 6) AS mkt_share
FROM agg
"""


# --- Q9: profit by supplier nation and year (cost proxy) -----------------

_COST = "CAST(p_retailprice AS DECIMAL(15,4)) * CAST(l_quantity AS DECIMAL(15,4))"


def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 without partsupp: cost proxy = p_retailprice * l_quantity.
    Revenue and cost are summed as separate decimals, doubled, then
    differenced — dodging cross-engine decimal-subtraction typing."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    cost = _dec(F.col("p_retailprice")) * _dec(F.col("l_quantity"))
    agg = (
        li.join(part.where(F.col("p_name").contains("red")), li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(_rev_col()).cast("double").alias("revenue"),
            F.sum(cost).cast("double").alias("cost"),
        )
    )
    return agg.select(
        "nation",
        "o_year",
        F.round(F.col("revenue") - F.col("cost"), 6).alias("profit"),
    )


_Q9_ORACLE = f"""
WITH agg AS (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
    CAST(sum({_REV}) AS DOUBLE) AS revenue,
    CAST(sum({_COST}) AS DOUBLE) AS cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%red%'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT nation, o_year, round(revenue - cost, 6) AS profit FROM agg
"""


# --- Q10: top returned-item customers ------------------------------------

_Q10_LIMIT = 20


def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev_col()).cast("double"), 6).alias("revenue"))
    )
    return agg.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(_Q10_LIMIT)


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(CAST(sum({_REV}) AS DOUBLE), 6) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT {_Q10_LIMIT}
"""


# --- Q13: customer order-count distribution ------------------------------


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
"""


# --- Q15: top supplier(s) by windowed revenue ----------------------------

_Q15_FROM = "1998-01-01"
_Q15_TO = "1998-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers achieving the maximum quarter revenue. The argmax
    filter compares EXACT decimal sums (never doubles), so ties and
    the winner set are engine-independent; the doubled value is only
    an output column."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q15_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_TO).cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(F.sum(_rev_col()).alias("total_rev"))
    maxv = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.join(F.broadcast(maxv), revenue.total_rev == maxv.max_rev)
        .join(supp, revenue.l_suppkey == supp.s_suppkey)
        .select(
            F.col("s_suppkey"),
            F.col("s_name"),
            F.round(F.col("total_rev").cast("double"), 6).alias("total_revenue"),
        )
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey, sum({_REV}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM}' AND l_shipdate < TIMESTAMP '{_Q15_TO}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(CAST(total_rev AS DOUBLE), 6) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
"""


# --- Q17: small-quantity-order revenue (correlated avg filter) -----------

_Q17_BRAND = "Brand#7"


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == _Q17_BRAND)
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))
        .alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 6)
            .alias("avg_yearly")
        )
    )


_Q17_ORACLE = f"""
WITH pa AS (
  SELECT l_partkey AS ap_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_brand = '{_Q17_BRAND}'
JOIN pa   ON l_partkey = ap_partkey
WHERE l_quantity < 0.2 * avg_qty
"""


# --- MERGE-style upsert (operators/merge.py) ------------------------------


def q_merge_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert: a stale target (orders minus every 3rd key) merged
    with an update batch (every even key, repriced, status 'U') —
    update rows win wholesale, unmatched rows pass through/insert."""
    from clearcare_data_pipeline_spark.operators.merge import merge_upsert

    orders = load_table(spark, sf_dir, "orders")
    target = orders.where(F.col("o_orderkey") % 3 != 0)
    updates = (
        orders.where(F.col("o_orderkey") % 2 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * F.lit(1.1).cast("double"))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    return merge_upsert(target, updates, ["o_orderkey"])


_MERGE_ORACLE = """
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 3 <> 0),
updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT coalesce(u.o_orderkey, t.o_orderkey) AS o_orderkey,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey ELSE t.o_custkey END AS o_custkey,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
  CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
FROM target t FULL OUTER JOIN updates u ON t.o_orderkey = u.o_orderkey
"""


# --- skew-safe exact distinct count (operators/skew.py) ------------------


def q_salted_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT supplier) per returnflag via the two-phase
    salted plan — returnflag has 3 values, i.e. every group is a hub;
    the plain plan funnels each group through one task."""
    from clearcare_data_pipeline_spark.operators.skew import salted_distinct_count

    li = load_table(spark, sf_dir, "lineitem")
    return salted_distinct_count(li, ["l_returnflag"], "l_suppkey", num_salts=32)


_SALTED_DISTINCT_ORACLE = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS distinct_l_suppkey
FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY l_returnflag
"""


QUERIES = {
    "q8_market_share": q8_market_share,
    "q9_nation_profit": q9_nation_profit,
    "q10_returned_item_customers": q10_returned_item_customers,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "salted_distinct_suppliers": q_salted_distinct_suppliers,
    "merge_orders_upsert": q_merge_orders_upsert,
}

ORACLES = {
    "salted_distinct_suppliers": _SALTED_DISTINCT_ORACLE,
    "merge_orders_upsert": _MERGE_ORACLE,
    "q8_market_share": _Q8_ORACLE,
    "q9_nation_profit": _Q9_ORACLE,
    "q10_returned_item_customers": _Q10_ORACLE,
    "q13_order_count_distribution": _Q13_ORACLE,
    "q15_top_supplier": _Q15_ORACLE,
    "q17_small_quantity_revenue": _Q17_ORACLE,
}


# --- change-data-feed generation (operators/merge.py snapshot_diff) ------


def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changeset between the orders table and a deterministically
    perturbed next-day snapshot (every 10th order deleted, every 7th
    repriced, a shifted-key copy of every 13th inserted). Output:
    minimal per-row changes with change_type — feeding it through
    merge_upsert + tombstones reproduces the new snapshot."""
    from clearcare_data_pipeline_spark.operators.merge import snapshot_diff

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    surviving = orders.where(F.col("o_orderkey") % 10 != 0)
    repriced = surviving.withColumn(
        "o_totalprice",
        # floor(x*100 + 0.5)/100, not round(x, 2): Spark rounds the
        # decimal STRING of the double (HALF_UP on shortest repr) while
        # DuckDB rounds the binary double — they disagree on .5-repr
        # boundaries. floor is unambiguous on the identical double.
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.floor(F.col("o_totalprice") * 1.1 * 100 + 0.5) / 100.0,
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = orders.where(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_totalprice",
        "o_orderstatus",
    )
    new = repriced.unionByName(inserted)
    diff = snapshot_diff(orders, new, ["o_orderkey"])
    return diff.select(
        "o_orderkey",
        F.round("o_totalprice", 6).alias("o_totalprice"),
        "o_orderstatus",
        "change_type",
    )


_SNAPSHOT_DIFF_ORACLE = """
WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
surviving AS (SELECT * FROM old WHERE o_orderkey % 10 != 0),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN floor(o_totalprice * 1.1 * 100 + 0.5) / 100.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM surviving
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM old WHERE o_orderkey % 13 = 0
)
SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
       round(coalesce(n.o_totalprice, o.o_totalprice), 6) AS o_totalprice,
       coalesce(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN n.o_totalprice IS DISTINCT FROM o.o_totalprice
              OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus THEN 'update'
       END AS change_type
FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE (CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            WHEN n.o_totalprice IS DISTINCT FROM o.o_totalprice
              OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus THEN 'update'
       END) IS NOT NULL
"""

QUERIES["orders_snapshot_diff"] = q_orders_snapshot_diff
ORACLES["orders_snapshot_diff"] = _SNAPSHOT_DIFF_ORACLE
