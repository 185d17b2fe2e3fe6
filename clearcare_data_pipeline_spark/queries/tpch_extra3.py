"""Third TPC-H breadth batch: the remaining classic shapes.

The synthetic schema has no ``partsupp`` table, so Q11/Q16/Q20 use the
distinct (supplier, part) pairs observed in ``lineitem`` as the supply
relation — same relational shapes (HAVING vs scalar subquery, distinct
count with an anti-joined exclusion set, nested semi-join), adapted
columns. Q21 uses shipdate-vs-orderdate lateness in place of
receipt-vs-commit. Q2's argmin-per-part shape already ships as
``cheapest_supplier_per_part`` (queries/advanced.py).

With this batch every TPC-H query shape the schema can express is
covered (Q1,3-10,11-22).

Decimal discipline as in tpch_extra.py: float aggregates sum as
DECIMAL and cast to DOUBLE at the edge so partial-agg order can't
produce cross-engine drift.

Scale notes (100 TB):
- Q11: two keyed aggs + one broadcast of a 1-row total — no all-pairs.
- Q16: distinct pairs is one keyed shuffle; the exclusion set is tiny
  and broadcast anti-joined.
- Q20: per-(supplier,part) agg then semi-join; both shuffles are keyed
  on join columns, AQE-coalesced.
- Q21: per-order supplier stats via one groupBy, then a keyed join —
  no EXISTS-per-row re-scan; at 1000 executors this is two shuffles
  of lineitem, the minimum for the semantics.
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


# --- Q11 analog: important parts by supply value for one nation ----------

_Q11_NATION = "NATION_3"
_Q11_FRACTION = 0.0005


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose supply value from NATION_3 suppliers exceeds a
    fraction of that nation's total supply value (TPC-H Q11 shape:
    group-HAVING against a scalar aggregate subquery).

    The scalar total is computed once and crossJoin-broadcast (1 row),
    not recomputed per group."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nat_supp = supp.join(
        F.broadcast(nation.where(F.col("n_name") == _Q11_NATION)),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    value = F.sum(_rev_col()).cast("double")
    per_part = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(value.alias("part_value"))
    )
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_value") > F.lit(_Q11_FRACTION) * F.col("total_value"))
        .select("l_partkey", F.round("part_value", 6).alias("part_value"))
    )


_Q11_ORACLE = f"""
WITH nat_supp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = '{_Q11_NATION}'
),
per_part AS (
  SELECT l_partkey, CAST(sum({_REV}) AS DOUBLE) AS part_value
  FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey, round(part_value, 6) AS part_value
FROM per_part
WHERE part_value > {_Q11_FRACTION} * (SELECT sum(part_value) FROM per_part)
"""


# --- Q16 analog: supplier counts by part attribute -----------------------

_Q16_BRAND = "BRAND_1"
_Q16_TYPE_PREFIX = "STANDARD"
_Q16_SIZES = (1, 5, 9, 14, 19, 23, 30, 36, 45, 49)


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) over the
    observed supply pairs, excluding one brand, one type prefix, and
    suppliers in the negative-balance exclusion set (TPC-H Q16 shape:
    NOT IN subquery -> broadcast anti-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad_supp = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    filtered_parts = part.where(
        (F.col("p_brand") != _Q16_BRAND)
        & (~F.col("p_type").startswith(_Q16_TYPE_PREFIX))
        & (F.col("p_size").isin(*_Q16_SIZES))
    )
    return (
        pairs.join(F.broadcast(bad_supp), pairs.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(filtered_parts, pairs.l_partkey == filtered_parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_ORACLE = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{_Q16_BRAND}'
  AND p_type NOT LIKE '{_Q16_TYPE_PREFIX}%'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q20 analog: suppliers with excess stock of a part family ------------

_Q20_PREFIX = "red"
_Q20_QTY = 50.0


def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than _Q20_QTY total units of any
    'red*' part (TPC-H Q20 shape: IN over a grouped-HAVING subquery ->
    semi-join), with nation name attached."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    red_parts = part.where(F.col("p_name").startswith(_Q20_PREFIX)).select("p_partkey")
    heavy = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("qty"))
        .where(F.col("qty") > _Q20_QTY)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


_Q20_ORACLE = f"""
SELECT s_suppkey, s_name, n_name AS nation
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{_Q20_PREFIX}%'
  GROUP BY l_suppkey, l_partkey
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) > {_Q20_QTY}
)
"""


# --- Q21 analog: suppliers who alone delayed multi-supplier orders -------

_Q21_LATE_DAYS = 60
_Q21_NATION = "NATION_5"
_Q21_LIMIT = 50


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For finished ('F') multi-supplier orders, count per supplier the
    orders where that supplier was the ONLY late shipper (shipdate >
    orderdate + 60 days) — TPC-H Q21's EXISTS / NOT-EXISTS pair,
    restated as per-order supplier statistics: exists(other supplier)
    == distinct suppliers > 1; not exists(other late supplier) ==
    distinct late suppliers == 1.

    Shape: ONE (l_orderkey, l_suppkey) aggregate is the shared subtree
    both consumers read — order-level stats become plain count/sum over
    it (no countDistinct expand), and the blamed set is a filter on it.
    Identical subtree -> Spark reuses the exchange instead of
    recomputing the lineitem-orders join per branch."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    f_orders = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    lines = li.join(f_orders, li.l_orderkey == F.col("o_orderkey")).withColumn(
        "is_late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q21_LATE_DAYS} DAYS")).cast("int"),
    )
    # One explicit shuffle on l_orderkey up front: HashPartitioning(ok)
    # satisfies the clustering of BOTH downstream aggregates (ok, sk)
    # and (ok) and co-locates the semi join — 1 big shuffle instead of 3.
    per_supp = (
        lines.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("late"))
    )
    order_stats = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late_supp"),
    )
    blamed = per_supp.where(F.col("late") == 1).join(
        order_stats.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
        "l_orderkey",
        "left_semi",
    )
    nat = nation.where(F.col("n_name") == _Q21_NATION)
    agg = (
        blamed.join(supp, blamed.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
    )
    return agg.orderBy(F.desc("numwait"), F.asc("s_suppkey")).limit(_Q21_LIMIT)


_Q21_ORACLE = f"""
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
order_stats AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
  FROM lines GROUP BY l_orderkey
),
blamed AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lines l JOIN order_stats s ON l.l_orderkey = s.l_orderkey
  WHERE l.is_late = 1 AND s.n_supp > 1 AND s.n_late_supp = 1
)
SELECT s_suppkey, s_name, count(*) AS numwait
FROM blamed
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name = '{_Q21_NATION}'
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT {_Q21_LIMIT}
"""


# --- ROLLUP: hierarchical revenue totals ---------------------------------


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(returnflag, linestatus) with grouping_id — subtotal and
    grand-total rows in one pass (map-side partial agg covers all
    grouping sets; one shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            # Reduce the exact decimal sum to scale 4 before doubling:
            # at scale 8 the grand total's scaled integer exceeds 2^53
            # and DuckDB's int128->double conversion can double-round
            # one ULP away from Spark's BigDecimal conversion.
            F.sum(_rev_col()).cast("decimal(25,4)").cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
            F.grouping_id("l_returnflag", "l_linestatus").cast("long").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            F.round("revenue", 6).alias("revenue"),
            "n_rows",
        )
    )


_ROLLUP_ORACLE = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       round(CAST(CAST(sum({_REV}) AS DECIMAL(25,4)) AS DOUBLE), 6) AS revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


QUERIES = {
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "rollup_revenue": rollup_revenue,
}

ORACLES = {
    "q11_important_parts": _Q11_ORACLE,
    "q16_supplier_part_counts": _Q16_ORACLE,
    "q20_excess_stock_suppliers": _Q20_ORACLE,
    "q21_waiting_suppliers": _Q21_ORACLE,
    "rollup_revenue": _ROLLUP_ORACLE,
}


# --- explicit GROUPING SETS over the time hierarchy ----------------------


def grouping_sets_time_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue at three explicit granularities — (year), (year, month),
    and grand total — via DataFrame groupingSets (Spark 4 API). Unlike
    ROLLUP this is a hand-picked lattice: one Expand pass produces all
    three, one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    year = F.year("o_orderdate").cast("long").alias("o_year")
    month = F.month("o_orderdate").cast("long").alias("o_month")
    base = orders.select(year, month, F.col("o_totalprice"))
    agg = base.groupingSets(
        [["o_year"], ["o_year", "o_month"], []], "o_year", "o_month"
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(15,4)"))
        .cast("decimal(25,4)")
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
        F.grouping_id("o_year", "o_month").cast("long").alias("gid"),
    )
    return agg.select(
        F.coalesce("o_year", F.lit(-1)).alias("o_year"),
        F.coalesce("o_month", F.lit(-1)).alias("o_month"),
        "gid",
        F.round("revenue", 6).alias("revenue"),
        "n_orders",
    )


_GROUPING_SETS_ORACLE = """
SELECT coalesce(o_year, -1) AS o_year, coalesce(o_month, -1) AS o_month,
       GROUPING(o_year, o_month) AS gid,
       round(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) AS DECIMAL(25,4)) AS DOUBLE), 6) AS revenue,
       count(*) AS n_orders
FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(month(o_orderdate) AS BIGINT) AS o_month, o_totalprice
      FROM orders)
GROUP BY GROUPING SETS ((o_year), (o_year, o_month), ())
"""

QUERIES["grouping_sets_time_revenue"] = grouping_sets_time_revenue
ORACLES["grouping_sets_time_revenue"] = _GROUPING_SETS_ORACLE


# --- PageRank over the co-purchase part graph ----------------------------

_PR_MIN_CO = 2
_PR_ITERS = 3
_PR_DAMPING = 0.85
_PR_LIMIT = 50


def q_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, d=0.85) over parts linked by
    co-occurrence in >= 2 orders (operators/graph.py). Edge derivation
    is a distinct-pair self-join keyed on the order, bounded by the
    co-count threshold; the oracle replays the identical iterations as
    chained CTEs. Top 50 by (rounded rank, node)."""
    from clearcare_data_pipeline_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "o")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= _PR_MIN_CO)
    )
    edges = pairs.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionByName(
        pairs.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )
    pr = pagerank(edges, iters=_PR_ITERS, damping=_PR_DAMPING)
    return (
        pr.select("node", F.round("pr", 6).alias("pr"))
        .orderBy(F.desc("pr"), F.asc("node"))
        .limit(_PR_LIMIT)
    )


def _pagerank_oracle() -> str:
    d = _PR_DAMPING
    parts = [
        # AS MATERIALIZED: every multiply-referenced CTE is computed
        # exactly once. Without the hint DuckDB may inline them, and at
        # sf1 the edge derivation then re-runs inside every consumer
        # concurrently — observed to exhaust ~79 GB of spill space
        # under the harness's 24 GB memory cap.
        """op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)""",
        f"""pairs AS MATERIALIZED (
  SELECT a.p AS p1, b.p AS p2 FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {_PR_MIN_CO})""",
        """edges AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM pairs
  UNION ALL SELECT p2 AS src, p1 AS dst FROM pairs)""",
        """nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
  SELECT src AS node FROM edges UNION ALL SELECT dst AS node FROM edges))""",
        """outdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)""",
        """pr0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS pr FROM nodes)""",
    ]
    prev = "pr0"
    for it in range(1, _PR_ITERS + 1):
        parts.append(
            f"""pr{it} AS MATERIALIZED (
  SELECT n.node,
         (1.0 - {d}) / (SELECT count(*) FROM nodes)
         + {d} * coalesce(s.s, 0.0) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr / o.outdeg) AS s
    FROM edges e JOIN {prev} p ON e.src = p.node JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst) s ON n.node = s.node)"""
        )
        prev = f"pr{it}"
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, round(pr, 6) AS pr FROM {prev} "
        + f"ORDER BY round(pr, 6) DESC, node LIMIT {_PR_LIMIT}"
    )


QUERIES["part_pagerank"] = q_part_pagerank
ORACLES["part_pagerank"] = _pagerank_oracle()
