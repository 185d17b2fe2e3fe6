"""Core relational operator coverage on the TPC-H-ish tables.

Scan/filter/project, hash & broadcast joins, semi/anti joins, set ops,
group-by aggregation, window functions, top-k, dedup, explode/unpivot/
pivot restructuring, fuzzy join, slug/zip scalar functions — the Spark
re-expression of the reference's operator inventory (SURVEY.md §2)
exercised on tables large enough to benchmark.

Float-parity note: SUM over DOUBLE is order-dependent, so any summed
money metric is computed in exact DECIMAL internally and cast to DOUBLE
for output — bit-identical across engines regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.queries._textsql import WS_PLUS
from clearcare_data_pipeline_spark.functions.text import slugify, zip_from_address
from clearcare_data_pipeline_spark.operators.dedup import MINHASH_MOD, minhash_consts
from clearcare_data_pipeline_spark.schema import SLUG_STOPWORDS
from clearcare_data_pipeline_spark.sources.tables import load_table


def _dec(col, prec: int = 18, scale: int = 4):
    return col.cast(f"decimal({prec},{scale})")


# --- Q1: pricing summary (scan + filter + wide aggregate) ---------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    extp = _dec(F.col("l_extendedprice"), 15)
    disc = _dec(F.col("l_discount"), 8)
    tax = _dec(F.col("l_tax"), 8)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec(F.col("l_quantity"), 15)).cast("double").alias("sum_qty"),
            F.sum(extp).cast("double").alias("sum_base_price"),
            F.sum(extp * (F.lit(1).cast("decimal(8,4)") - disc)).cast("double").alias("sum_disc_price"),
            F.sum(extp * (F.lit(1).cast("decimal(8,4)") - disc) * (F.lit(1).cast("decimal(8,4)") + tax))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(_dec(F.col("l_quantity"), 15)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(extp).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3: shipping-priority style 3-way join + top-k ---------------------


def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec(F.col("l_extendedprice"), 15) * (F.lit(1).cast("decimal(8,4)") - _dec(F.col("l_discount"), 8))
    ).cast("double")
    # Join order (r13, guide §3): semi-reduce orders by the BUILDING
    # customer broadcast BEFORE the lineitem join — the mktsegment
    # filter keeps ~1/5 of customers, so the orders side of the big
    # shuffle join carries ~1/5 of its rows. Catalyst does not reorder
    # joins without CBO stats; written this way the reduction is
    # guaranteed at every scale. Result-identical (inner joins
    # commute; oracle-verified).
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


_Q3_ORACLE = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- Q5: regional revenue (6-way join, broadcast dims) -------------------


def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = F.sum(
        _dec(F.col("l_extendedprice"), 15) * (F.lit(1).cast("decimal(8,4)") - _dec(F.col("l_discount"), 8))
    ).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(revenue.alias("revenue"), F.count(F.lit(1)).alias("n_lineitems"))
    )


_Q5_ORACLE = """
SELECT r_name, n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS revenue,
  count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- Q6: forecast revenue (pure scan-filter-agg; pushdown showcase) ------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice"), 15) * _dec(F.col("l_discount"), 8))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q6_ORACLE = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- window functions ----------------------------------------------------


def q_topk_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", F.col("rn").cast("long").alias("rn"), "c_custkey", "c_name", "c_acctbal")
    )


_TOPK_ORACLE = """
SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal
FROM (
  SELECT *, row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
)
WHERE rn <= 3
"""


def q_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec(F.col("o_totalprice"), 15)).over(w).cast("double").alias("running_total"),
        F.lag("o_totalprice").over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")).alias("prev_total"),
    )


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_total
FROM orders
"""


# --- semi / anti joins ----------------------------------------------------


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_suppliers_with_heavy_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    return supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi").select("s_suppkey", "s_name")


_SEMI_ORACLE = """
SELECT s_suppkey, s_name FROM supplier
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 48)
"""


# --- set operations --------------------------------------------------------


def q_active_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


_UNION_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


def q_customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.exceptAll(supp).distinct()


_EXCEPT_ORACLE = """
SELECT DISTINCT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT ALL
  SELECT s_nationkey FROM supplier
)
"""


# --- dedup -----------------------------------------------------------------


def q_dedup_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select((F.col("l_orderkey") % 100).alias("bucket"), "l_returnflag", "l_linestatus")
        .dropDuplicates()
    )


_DEDUP_ORACLE = """
SELECT DISTINCT l_orderkey % 100 AS bucket, l_returnflag, l_linestatus FROM lineitem
"""


# --- restructuring: explode / unpivot / pivot -------------------------------


def q_explode_part_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 analog: token array explode -> per-token counts."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split(F.col("p_name"), r"\s+")).alias("token"))
        .where(F.length("token") > 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_EXPLODE_ORACLE = f"""
SELECT token, count(*) AS n FROM (
  SELECT unnest(string_split_regex(p_name, '{WS_PLUS}')) AS token FROM part
)
WHERE length(token) > 0
GROUP BY token
"""


def q_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 melt analog: wide numeric columns -> tall (key, metric, value)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


_UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
"""


def q_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 regroup analog: pivot a small key domain into columns."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
        .na.fill(0, ["n_f", "n_o", "n_p"])
    )


_PIVOT_ORACLE = """
SELECT o_orderpriority,
  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders GROUP BY o_orderpriority
"""


# --- fuzzy top-1 join (J3) ---------------------------------------------------


def q_fuzzy_match_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity left join: misspelled nation names -> best exact-table
    match by edit distance (top-1 per left row, deterministic ties)."""
    nation = load_table(spark, sf_dir, "nation")
    noisy = nation.select(
        F.col("n_nationkey").alias("qkey"),
        F.when(F.col("n_nationkey") % 2 == 0, F.expr("substring(n_name, 1, length(n_name) - 1)"))
        .otherwise(F.concat(F.col("n_name"), F.lit("X")))
        .alias("qname"),
    )
    w = Window.partitionBy("qkey").orderBy(F.asc("dist"), F.asc("n_name"))
    return (
        noisy.crossJoin(F.broadcast(nation.select("n_name")))
        .withColumn("dist", F.levenshtein("qname", "n_name"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("qkey", "qname", F.col("n_name").alias("matched"), F.col("dist").cast("long").alias("dist"))
    )


_FUZZY_ORACLE = """
WITH noisy AS (
  SELECT n_nationkey AS qkey,
    CASE WHEN n_nationkey % 2 = 0 THEN substring(n_name, 1, length(n_name) - 1)
         ELSE n_name || 'X' END AS qname
  FROM nation
),
scored AS (
  SELECT qkey, qname, n_name, levenshtein(qname, n_name) AS dist,
    row_number() OVER (PARTITION BY qkey ORDER BY levenshtein(qname, n_name) ASC, n_name ASC) AS rn
  FROM noisy CROSS JOIN (SELECT n_name FROM nation)
)
SELECT qkey, qname, n_name AS matched, dist FROM scored WHERE rn = 1
"""


# --- scalar identity functions (F8/F9) ----------------------------------------


def q_slugify_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    pretty = F.concat(F.lit("St. Mary's "), F.col("n_name"), F.lit(" Medical Center & Clinic"))
    return nation.select(
        F.col("n_nationkey").alias("key"), pretty.alias("name"), slugify(pretty).alias("campus_id")
    )


_STOP_LIST = ", ".join(f"'{s}'" for s in SLUG_STOPWORDS)
_SLUG_ORACLE = f"""
WITH src AS (
  SELECT n_nationkey AS key, 'St. Mary''s ' || n_name || ' Medical Center & Clinic' AS name
  FROM nation
)
SELECT key, name,
  array_to_string(
    list_filter(
      list_filter(string_split_regex(trim(lower(regexp_replace(name, '[.,''\\-&]', '', 'g')), ' '), '{WS_PLUS}'),
                  t -> length(t) > 0),
      t -> NOT list_contains([{_STOP_LIST}], t)),
    '_') AS campus_id
FROM src
"""


def q_zip_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    addr = F.concat(
        F.lit("42 Main St, Springfield, ST "),
        (F.lit(10000) + F.col("c_custkey") % 89999).cast("string"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("-1234")).otherwise(F.lit("")),
    )
    return cust.select(
        F.col("c_custkey").alias("key"),
        addr.alias("address"),
        zip_from_address(addr).alias("zip5"),
    )


_ZIP_ORACLE = """
SELECT c_custkey AS key,
  '42 Main St, Springfield, ST ' || CAST(10000 + c_custkey % 89999 AS STRING)
    || CASE WHEN c_custkey % 2 = 0 THEN '-1234' ELSE '' END AS address,
  coalesce(regexp_extract('42 Main St, Springfield, ST ' || CAST(10000 + c_custkey % 89999 AS STRING)
    || CASE WHEN c_custkey % 2 = 0 THEN '-1234' ELSE '' END, '(\\d{5})(?:-\\d{4})?$', 1), '') AS zip5
FROM customer
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue_orders": q3_top_revenue_orders,
    "q5_regional_revenue": q5_regional_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "topk_customers_per_segment": q_topk_customers_per_segment,
    "running_order_total": q_running_order_total,
    "customers_without_orders": q_customers_without_orders,
    "suppliers_with_heavy_lineitems": q_suppliers_with_heavy_lineitems,
    "active_nation_keys": q_active_nation_keys,
    "customer_only_nations": q_customer_only_nations,
    "dedup_order_lines": q_dedup_order_lines,
    "explode_part_tokens": q_explode_part_tokens,
    "unpivot_part_metrics": q_unpivot_part_metrics,
    "pivot_order_status": q_pivot_order_status,
    "fuzzy_match_nations": q_fuzzy_match_nations,
    "slugify_names": q_slugify_names,
    "zip_extraction": q_zip_extraction,
}

ORACLES = {
    "q1_pricing_summary": _Q1_ORACLE,
    "q3_top_revenue_orders": _Q3_ORACLE,
    "q5_regional_revenue": _Q5_ORACLE,
    "q6_forecast_revenue": _Q6_ORACLE,
    "topk_customers_per_segment": _TOPK_ORACLE,
    "running_order_total": _RUNNING_ORACLE,
    "customers_without_orders": _ANTI_ORACLE,
    "suppliers_with_heavy_lineitems": _SEMI_ORACLE,
    "active_nation_keys": _UNION_ORACLE,
    "customer_only_nations": _EXCEPT_ORACLE,
    "dedup_order_lines": _DEDUP_ORACLE,
    "explode_part_tokens": _EXPLODE_ORACLE,
    "unpivot_part_metrics": _UNPIVOT_ORACLE,
    "pivot_order_status": _PIVOT_ORACLE,
    "fuzzy_match_nations": _FUZZY_ORACLE,
    "slugify_names": _SLUG_ORACLE,
    "zip_extraction": _ZIP_ORACLE,
}


# --- blocked record linkage over part names ------------------------------

_LINK_MIN_SIM = 0.7


def q_part_name_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidates among parts: block on (brand,
    first name word), score by normalized edit distance
    (operators/joins.py blocked_similarity_join) — quadratic work only
    inside each block, keyed joins everywhere."""
    from clearcare_data_pipeline_spark.operators.joins import blocked_similarity_join

    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("id"),
        F.col("p_name"),
        F.col("p_brand"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
    )
    return blocked_similarity_join(
        part, part, ["p_brand", "first_word"], "p_name", min_sim=_LINK_MIN_SIM
    )


_LINKAGE_ORACLE = f"""
WITH p AS (
  SELECT p_partkey AS id, p_name, p_brand, split_part(p_name, ' ', 1) AS fw
  FROM part
)
SELECT a.id AS left_id, b.id AS right_id,
       a.p_name AS left_text, b.p_name AS right_text,
       round(1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
             / greatest(length(a.p_name), length(b.p_name)), 6) AS similarity
FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.fw = b.fw AND a.id < b.id
WHERE round(1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
      / greatest(length(a.p_name), length(b.p_name)), 6) >= {_LINK_MIN_SIM}
"""

QUERIES["part_name_linkage"] = q_part_name_linkage
ORACLES["part_name_linkage"] = _LINKAGE_ORACLE


def q_part_name_linkage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block linkage PAIR COUNTS — the scale-safe form of
    ``part_name_linkage`` (VERDICT r10 #3).

    The candidate LISTING is quadratic per block (14.1M rows already
    at sf1: 64 distinct part names means huge same-name cliques), so
    it cannot be materialized at sf10+. This keeps the SAME operator —
    operators/joins.py blocked_similarity_join, salt probe and all —
    but feeds it the DISTINCT (brand, name) relation with clique
    populations: cross-name qualifying pairs weigh n_a*n_b,
    within-name pairs (similarity 1.0 >= threshold by definition)
    weigh n*(n-1)/2, aggregated per (p_brand, first_word) block
    (<= 200 rows out). Collapse-before-join is the 100 TB design for
    low-cardinality text: the quadratic join runs over <= 1,600
    collapsed rows regardless of part count."""
    from clearcare_data_pipeline_spark.operators.joins import blocked_similarity_join

    names = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            "p_brand",
            F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
            "p_name",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # id must be unique ACROSS blocks (the operator's output drops the
    # block columns): brand|name is, and within a block the brand
    # prefix is constant so id ordering degenerates to name ordering —
    # the same a < b the per-part oracle uses.
    collapsed = names.withColumn("id", F.concat_ws("|", "p_brand", "p_name"))
    pairs = blocked_similarity_join(
        collapsed, collapsed, ["p_brand", "first_word"], "p_name",
        min_sim=_LINK_MIN_SIM,
    )
    cross = (
        pairs
        .join(
            collapsed.select(
                F.col("id").alias("left_id"), F.col("n").alias("n_l"),
                "p_brand", "first_word",
            ),
            "left_id",
        )
        .join(collapsed.select(F.col("id").alias("right_id"), F.col("n").alias("n_r")), "right_id")
        .select(
            "p_brand", "first_word",
            (F.col("n_l").cast("long") * F.col("n_r")).alias("w"),
        )
    )
    # exact bigint arithmetic: n*(n-1) is always even, so DIV 2 is
    # exact on longs up to 2^63, matching the oracle's HUGEINT // 2 —
    # the double-division form was silently lossy past n*(n-1) >= 2^53
    # (ADVICE r11 #2)
    same = names.where(F.col("n") > 1).select(
        "p_brand", "first_word",
        F.expr("(CAST(n AS BIGINT) * (CAST(n AS BIGINT) - 1)) DIV 2").alias("w"),
    )
    return (
        cross.unionByName(same)
        .groupBy("p_brand", "first_word")
        .agg(F.sum("w").alias("n_pairs"))
    )


_LINKAGE_COUNTS_ORACLE = f"""
WITH names AS (
  SELECT p_brand, split_part(p_name, ' ', 1) AS first_word, p_name,
         count(*) AS n
  FROM part GROUP BY 1, 2, 3
),
cross_w AS (
  SELECT a.p_brand, a.first_word, CAST(a.n AS HUGEINT) * b.n AS w
  FROM names a
  JOIN names b ON a.p_brand = b.p_brand AND a.first_word = b.first_word
              AND a.p_name < b.p_name
  WHERE round(1.0 - CAST(levenshtein(a.p_name, b.p_name) AS DOUBLE)
        / greatest(length(a.p_name), length(b.p_name)), 6) >= {_LINK_MIN_SIM}
),
same_w AS (
  SELECT p_brand, first_word, CAST(n AS HUGEINT) * (n - 1) // 2 AS w
  FROM names WHERE n > 1
)
SELECT p_brand, first_word, CAST(sum(w) AS BIGINT) AS n_pairs
FROM (SELECT * FROM cross_w UNION ALL SELECT * FROM same_w)
GROUP BY p_brand, first_word
"""

QUERIES["part_name_linkage_counts"] = q_part_name_linkage_counts
ORACLES["part_name_linkage_counts"] = _LINKAGE_COUNTS_ORACLE


# --- LSH-banded fuzzy top-1 join (J3's 100 TB path) ----------------------


def q_fuzzy_linkage_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3's fuzzy top-1 semantics over LSH-banded candidates instead of
    a cross join (operators/joins.py banded_fuzzy_top1): noisy part
    names match their best part-name candidate among rows sharing a
    character-trigram MinHash band — keyed joins only, linear in both
    sides. The oracle replays the identical banding, so recall misses
    (NULL matches) are exact too."""
    from clearcare_data_pipeline_spark.operators.joins import banded_fuzzy_top1

    part = load_table(spark, sf_dir, "part")
    noisy = part.select(
        F.col("p_partkey").alias("qkey"),
        F.when(
            F.col("p_partkey") % 2 == 0,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.concat(F.col("p_name"), F.lit("x")))
        .alias("qname"),
    )
    names = part.select("p_name").distinct()
    return banded_fuzzy_top1(noisy, names, "qkey", "qname", "p_name")


def _banded_mh(s: int, t: str) -> str:
    # Replays operators/joins.py minhash_band_keys_expr: one md5 per
    # character trigram, affine permutation of its two 28-bit hex
    # chunks mod 2^31-1 with the shared minhash_consts coefficients.
    a1, a2, c = minhash_consts(6)[s]
    grams = f"list_transform(range(1, greatest(length({t}) - 1, 1)), i -> substring({t}, i, 3))"
    hashed = f"list_transform({grams}, g -> md5(g))"
    perm = (
        f"({a1} * CAST(('0x' || substr(h, 1, 7)) AS BIGINT)"
        f" + {a2} * CAST(('0x' || substr(h, 8, 7)) AS BIGINT)"
        f" + {c}) % {MINHASH_MOD}"
    )
    return f"CAST(list_min(list_transform({hashed}, h -> {perm})) AS STRING)"


def _banded_side(src: str, keys: str, t: str) -> str:
    mhs = ", ".join(f"{_banded_mh(s, t)} AS mh{s}" for s in range(6))
    return (
        f"SELECT {keys} b.b AS band, CASE b.b "
        f"WHEN 0 THEN md5(concat_ws('|', mh0, mh1)) "
        f"WHEN 1 THEN md5(concat_ws('|', mh2, mh3)) "
        f"ELSE md5(concat_ws('|', mh4, mh5)) END AS band_key "
        f"FROM (SELECT {keys} {mhs} FROM {src}) CROSS JOIN (VALUES (0), (1), (2)) b(b)"
    )


_BANDED_FUZZY_ORACLE = f"""
WITH noisy AS (
  SELECT p_partkey AS qkey,
    CASE WHEN p_partkey % 2 = 0 THEN substring(p_name, 1, length(p_name) - 1)
         ELSE p_name || 'x' END AS qname
  FROM part
),
names AS (SELECT DISTINCT p_name FROM part),
lb AS ({_banded_side('noisy', 'qkey, qname,', 'qname')}),
rb AS ({_banded_side('names', 'p_name,', 'p_name')}),
cand AS (
  SELECT DISTINCT lb.qkey, lb.qname, rb.p_name
  FROM lb JOIN rb ON lb.band = rb.band AND lb.band_key = rb.band_key
),
best AS (
  SELECT qkey, p_name, dist FROM (
    SELECT qkey, p_name, levenshtein(qname, p_name) AS dist,
      row_number() OVER (PARTITION BY qkey
                         ORDER BY levenshtein(qname, p_name) ASC, p_name ASC) AS rn
    FROM cand
  ) WHERE rn = 1
)
SELECT n.qkey, n.qname, b.p_name AS matched, b.dist
FROM noisy n LEFT JOIN best b ON n.qkey = b.qkey
"""

QUERIES["fuzzy_linkage_banded"] = q_fuzzy_linkage_banded
ORACLES["fuzzy_linkage_banded"] = _BANDED_FUZZY_ORACLE


# --- multiset set operations (EXCEPT ALL / INTERSECT ALL) ----------------


def q_order_lines_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset algebra over order keys: the bag of keys from returned
    lines vs the bag from late-shipped lines, compared with
    exceptAll / intersectAll (multiplicity-aware, unlike DISTINCT set
    ops). Output is the size of each result bag plus the input bags."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    returned = li.where(F.col("l_returnflag") == "R").select(F.col("l_orderkey").alias("k"))
    late = (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select(F.col("l_orderkey").alias("k"))
    )
    counts = [
        returned.count(),
        late.count(),
        returned.exceptAll(late).count(),
        returned.intersectAll(late).count(),
    ]
    return spark.createDataFrame(
        [tuple(counts)], "n_returned bigint, n_late bigint, n_except_all bigint, n_intersect_all bigint"
    )


_SET_OPS_ORACLE = """
WITH returned AS (SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'),
late AS (
  SELECT l_orderkey AS k FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
)
SELECT (SELECT count(*) FROM returned) AS n_returned,
       (SELECT count(*) FROM late) AS n_late,
       (SELECT count(*) FROM (SELECT * FROM returned EXCEPT ALL SELECT * FROM late)) AS n_except_all,
       (SELECT count(*) FROM (SELECT * FROM returned INTERSECT ALL SELECT * FROM late)) AS n_intersect_all
"""

QUERIES["order_lines_set_ops"] = q_order_lines_set_ops
ORACLES["order_lines_set_ops"] = _SET_OPS_ORACLE


# --- share-of-total window (ratio_to_report analog) ----------------------


def q_nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each nation's share of its region's revenue: a window sum over
    the nation-level aggregate (dimension-sized input) divides exactly
    doubled decimal sums, so the ratio is engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,4)")
                * (F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)"))
            )
            .cast("decimal(25,4)")
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        F.round("revenue", 6).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("region_share"),
    )


_REV_SHARE_ORACLE = """
WITH rev AS (
  SELECT r_name AS region, n_name AS nation,
    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(15,4))
        * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(25,4)) AS DOUBLE)
      AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT region, nation, round(revenue, 6) AS revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY region), 6) AS region_share
FROM rev
"""

QUERIES["nation_revenue_share"] = q_nation_revenue_share
ORACLES["nation_revenue_share"] = _REV_SHARE_ORACLE
