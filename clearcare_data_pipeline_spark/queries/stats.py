"""Statistical aggregates, RANGE window frames, distinct counting.

Variance/stddev/correlation are computed from exact DECIMAL moment
sums (sum x, sum x², sum xy) cast to DOUBLE, so the results are
deterministic across engines — the builtin streaming variance would be
partition-order-dependent. ``approx_distinct_parts`` is the one
intentionally oracle-less query (HyperLogLog sketches are
engine-specific); the driver records it as rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.sources.tables import load_table


def _dec(col, prec: int = 15, scale: int = 4):
    return col.cast(f"decimal({prec},{scale})")


# --- moment-based stats ---------------------------------------------------


def q_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # width 19 forces 128-bit physical decimals in both engines, so the
    # squared-moment products cannot overflow
    qd = _dec(F.col("l_quantity"), 19)
    pd_ = _dec(F.col("l_extendedprice"), 19)
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qd).cast("double").alias("sq"),
        F.sum(qd * qd).cast("double").alias("sqq"),
        F.sum(pd_).cast("double").alias("sp"),
        F.sum(pd_ * pd_).cast("double").alias("spp"),
        F.sum(qd * pd_).cast("double").alias("sqp"),
    )
    n = F.col("n")
    var_q = (F.col("sqq") - F.col("sq") * F.col("sq") / n) / (n - 1)
    var_p = (F.col("spp") - F.col("sp") * F.col("sp") / n) / (n - 1)
    cov = (F.col("sqp") - F.col("sq") * F.col("sp") / n) / (n - 1)
    return agg.select(
        "l_returnflag",
        "n",
        F.round(F.col("sq") / n, 6).alias("mean_qty"),
        F.round(F.sqrt(var_q), 6).alias("std_qty"),
        F.round(F.sqrt(var_p), 6).alias("std_price"),
        F.round(cov / (F.sqrt(var_q) * F.sqrt(var_p)), 6).alias("corr_qty_price"),
    )


_STATS_ORACLE = """
WITH m AS (
  SELECT l_returnflag, count(*) AS n,
    CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sq,
    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sqq,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sp,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS spp,
    CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sqp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  round(sq / n, 6) AS mean_qty,
  round(sqrt((sqq - sq * sq / n) / (n - 1)), 6) AS std_qty,
  round(sqrt((spp - sp * sp / n) / (n - 1)), 6) AS std_price,
  round(((sqp - sq * sp / n) / (n - 1))
        / (sqrt((sqq - sq * sq / n) / (n - 1)) * sqrt((spp - sp * sp / n) / (n - 1))), 6) AS corr_qty_price
FROM m
"""


# --- RANGE window frame: trailing 30-day customer spend --------------------


def q_trailing_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1990-01-01").cast("timestamp"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("day"))
        .rangeBetween(-30, Window.currentRow)
    )
    return (
        orders.withColumn("day", day)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(_dec(F.col("o_totalprice"))).over(w).cast("double").alias("spend_30d"),
            F.count(F.lit(1)).over(w).alias("orders_30d"),
        )
    )


_TRAILING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(sum(CAST(o_totalprice AS DECIMAL(15,4))) OVER w AS DOUBLE) AS spend_30d,
  count(*) OVER w AS orders_30d
FROM (SELECT *, datediff('day', TIMESTAMP '1990-01-01', o_orderdate) AS day FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY day
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
"""


# --- exact distinct counts --------------------------------------------------


def q_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count_distinct("l_partkey", "l_suppkey").alias("n_part_supp"),
    )


_DISTINCT_ORACLE = """
SELECT l_returnflag,
  count(DISTINCT l_partkey) AS n_parts,
  count(DISTINCT l_suppkey) AS n_supps,
  count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
FROM lineitem GROUP BY l_returnflag
"""


# --- approximate distinct (engine-specific sketch; rows-only check) ---------


def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate under an error-bound gate.

    The sketch value itself is engine-specific (not comparable across
    engines), so it never leaves the plan; instead the output carries
    the exact count plus a boolean asserting the estimate landed
    within ±5 % of it. The oracle emits constant TRUE — if the sketch
    ever drifts past the bound, the value hash mismatches and the gate
    fails, so this entry is no longer a free rows-only pass."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.count_distinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.lit(0.05) * F.col("exact_parts")
        ).alias("within_tolerance"),
    )


def q_approx_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest quantile sketch (percentile_approx) under the same
    error-bound gate pattern as the HLL entry: the sketch value stays
    in-plan; the output asserts it landed within ±2 % of the exact
    percentile, which the oracle pins to constant TRUE."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("exact_p50"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_p50"),
        F.percentile("l_extendedprice", 0.95).alias("exact_p95"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("approx_p95"),
    )
    ok = (
        F.abs(F.col("approx_p50") - F.col("exact_p50")) <= F.lit(0.02) * F.col("exact_p50")
    ) & (
        F.abs(F.col("approx_p95") - F.col("exact_p95")) <= F.lit(0.02) * F.col("exact_p95")
    )
    return agg.select(
        "l_returnflag",
        F.round("exact_p50", 6).alias("exact_p50"),
        F.round("exact_p95", 6).alias("exact_p95"),
        ok.alias("within_tolerance"),
    )


_PROFILE_NUM = ["l_quantity", "l_extendedprice", "l_discount"]
_PROFILE_STR = ["l_returnflag", "l_linestatus"]


def q_lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of lineitem (operators/profiling.py)."""
    from clearcare_data_pipeline_spark.operators.profiling import profile_table

    li = load_table(spark, sf_dir, "lineitem")
    return profile_table(li, _PROFILE_NUM, _PROFILE_STR)


def _profile_oracle() -> str:
    from clearcare_data_pipeline_spark.operators.profiling import profile_sql

    return profile_sql("lineitem", _PROFILE_NUM, _PROFILE_STR)


def q_dq_lineitem_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite over lineitem (operators/quality.py):
    five row checks in one aggregation pass plus a key-uniqueness
    check. The (l_orderkey, l_linenumber) key is intentionally one the
    synthetic data violates, so the report exercises a failing row."""
    from clearcare_data_pipeline_spark.operators.quality import quality_report

    li = load_table(spark, sf_dir, "lineitem")
    checks = {
        "quantity_in_range": F.col("l_quantity").between(1, 50),
        "discount_in_range": F.col("l_discount").between(0.0, 0.1),
        "price_positive": F.col("l_extendedprice") > 0,
        "returnflag_in_set": F.col("l_returnflag").isin("A", "N", "R"),
        "shipdate_present": F.col("l_shipdate").isNotNull(),
    }
    return quality_report(li, checks, unique_keys=[["l_orderkey", "l_linenumber"]])


def _dq_check_sql(name: str, pred: str) -> str:
    return (
        f"SELECT '{name}' AS check_name, count(*) AS n_rows, "
        f"count(*) FILTER (WHERE NOT coalesce({pred}, FALSE)) AS n_violations, "
        f"count(*) FILTER (WHERE NOT coalesce({pred}, FALSE)) = 0 AS passed FROM lineitem"
    )


_DQ_ORACLE = " UNION ALL ".join(
    [
        _dq_check_sql("quantity_in_range", "l_quantity BETWEEN 1 AND 50"),
        _dq_check_sql("discount_in_range", "l_discount BETWEEN 0.0 AND 0.1"),
        _dq_check_sql("price_positive", "l_extendedprice > 0"),
        _dq_check_sql("returnflag_in_set", "l_returnflag IN ('A','N','R')"),
        _dq_check_sql("shipdate_present", "l_shipdate IS NOT NULL"),
        (
            "SELECT 'unique_l_orderkey_l_linenumber' AS check_name, "
            "CAST(sum(_n) AS BIGINT) AS n_rows, "
            "CAST(sum(_n) - count(*) AS BIGINT) AS n_violations, "
            "sum(_n) = count(*) AS passed FROM "
            "(SELECT count(*) AS _n FROM lineitem GROUP BY l_orderkey, l_linenumber)"
        ),
    ]
)




# --- fixed-width histogram ----------------------------------------------

_HIST_LO, _HIST_HI, _HIST_BUCKETS = 0.0, 120000.0, 24


def q_lineitem_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extendedprice: bucket index computed
    with an explicit floor expression (identical text in the oracle —
    width_bucket() exists in Spark but not DuckDB), out-of-range rows
    clamped into the edge buckets. One scan, one tiny keyed agg."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (_HIST_HI - _HIST_LO) / _HIST_BUCKETS
    raw = F.floor((F.col("l_extendedprice") - F.lit(_HIST_LO)) / F.lit(w)).cast("long")
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(_HIST_BUCKETS - 1))
    return (
        li.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("lo", F.round(F.col("bucket") * w + _HIST_LO, 6))
        .withColumn("hi", F.round((F.col("bucket") + 1) * w + _HIST_LO, 6))
    )


_HIST_ORACLE = f"""
WITH b AS (
  SELECT least(greatest(CAST(floor((l_extendedprice - {_HIST_LO}) / {(_HIST_HI - _HIST_LO) / _HIST_BUCKETS}) AS BIGINT), 0), {_HIST_BUCKETS - 1}) AS bucket
  FROM lineitem
)
SELECT bucket, count(*) AS n,
       round(bucket * {(_HIST_HI - _HIST_LO) / _HIST_BUCKETS} + {_HIST_LO}, 6) AS lo,
       round((bucket + 1) * {(_HIST_HI - _HIST_LO) / _HIST_BUCKETS} + {_HIST_LO}, 6) AS hi
FROM b GROUP BY bucket
"""


QUERIES = {
    "lineitem_price_histogram": q_lineitem_price_histogram,
    "dq_lineitem_report": q_dq_lineitem_report,
    "lineitem_profile": q_lineitem_profile,
    "lineitem_stats": q_lineitem_stats,
    "trailing_30d_spend": q_trailing_30d_spend,
    "distinct_parts_per_flag": q_distinct_parts_per_flag,
    "approx_distinct_parts": q_approx_distinct_parts,
    "approx_price_quantiles": q_approx_price_quantiles,
}

ORACLES = {
    "lineitem_price_histogram": _HIST_ORACLE,
    "dq_lineitem_report": _DQ_ORACLE,
    "lineitem_profile": _profile_oracle(),
    "lineitem_stats": _STATS_ORACLE,
    "trailing_30d_spend": _TRAILING_ORACLE,
    "distinct_parts_per_flag": _DISTINCT_ORACLE,
    # The estimate itself is engine-specific; the oracle checks the
    # exact counts and asserts the in-plan ±5% tolerance held.
    "approx_distinct_parts": (
        "SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts, "
        "TRUE AS within_tolerance FROM lineitem GROUP BY l_returnflag"
    ),
    "approx_price_quantiles": (
        "SELECT l_returnflag, "
        "round(quantile_cont(l_extendedprice, 0.5), 6) AS exact_p50, "
        "round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95, "
        "TRUE AS within_tolerance FROM lineitem GROUP BY l_returnflag"
    ),
}


# --- robust statistics: median / MAD / IQR outlier fences ----------------


def q_lineitem_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-resistant dispersion per returnflag: exact median, MAD
    (median absolute deviation), quartiles, and Tukey-fence outlier
    counts. Two aggregation passes (the second computes |x - median|
    against the broadcast per-group medians) — the exact-semantics
    floor; both engines interpolate percentiles identically
    (proved by quantity_percentiles)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    q = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("q1"),
        F.percentile("l_extendedprice", 0.5).alias("med"),
        F.percentile("l_extendedprice", 0.75).alias("q3"),
    )
    joined = li.join(F.broadcast(q), "l_returnflag")
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.round(F.first("med"), 6).alias("median"),
            F.round(
                F.percentile(F.abs(F.col("l_extendedprice") - F.col("med")), 0.5), 6
            ).alias("mad"),
            F.round(F.first("q1"), 6).alias("q1"),
            F.round(F.first("q3"), 6).alias("q3"),
            F.sum(
                ((F.col("l_extendedprice") < lo) | (F.col("l_extendedprice") > hi)).cast("long")
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_ROBUST_ORACLE = """
WITH q AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.5) AS med,
         quantile_cont(l_extendedprice, 0.75) AS q3
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
  round(any_value(med), 6) AS median,
  round(quantile_cont(abs(l_extendedprice - med), 0.5), 6) AS mad,
  round(any_value(q1), 6) AS q1,
  round(any_value(q3), 6) AS q3,
  CAST(sum(CASE WHEN l_extendedprice < q1 - 1.5 * (q3 - q1)
                  OR l_extendedprice > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT)
    AS n_outliers,
  count(*) AS n
FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag
GROUP BY l.l_returnflag
"""

QUERIES["lineitem_robust_stats"] = q_lineitem_robust_stats
ORACLES["lineitem_robust_stats"] = _ROBUST_ORACLE
