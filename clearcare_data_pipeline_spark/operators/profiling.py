"""Single-pass column profiling (data-quality reconnaissance).

One aggregation job produces a long-format profile — per column:
row count, non-null count, exact distinct count, numeric min/max and
string min/max. Everything is computed in ONE wide `agg` (Spark plans
multi-distinct via its expand operator — still a single scan + one
shuffle), then pivoted to rows with a constant-array explode, so
profiling a 100 TB table costs one pass regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    numeric_cols: list[str],
    string_cols: list[str],
) -> DataFrame:
    """Long-format profile: one output row per profiled column."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in numeric_cols + string_cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"_nd_{c}"))
    for c in numeric_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_max_{c}"))
    for c in string_cols:
        aggs.append(F.min(c).alias(f"_smin_{c}"))
        aggs.append(F.max(c).alias(f"_smax_{c}"))
    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    entries = []
    for c in numeric_cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_total").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_non_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_num"),
                F.col(f"_max_{c}").alias("max_num"),
                null_s.alias("min_str"),
                null_s.alias("max_str"),
            )
        )
    for c in string_cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_total").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_non_null"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                null_d.alias("min_num"),
                null_d.alias("max_num"),
                F.col(f"_smin_{c}").alias("min_str"),
                F.col(f"_smax_{c}").alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def profile_sql(
    relation: str, numeric_cols: list[str], string_cols: list[str]
) -> str:
    """DuckDB mirror of profile_table (one SELECT per column, unioned)."""
    parts = []
    for c in numeric_cols:
        parts.append(
            f"SELECT '{c}' AS \"column\", count(*) AS n_rows, count({c}) AS n_non_null, "
            f"count(DISTINCT {c}) AS n_distinct, CAST(min({c}) AS DOUBLE) AS min_num, "
            f"CAST(max({c}) AS DOUBLE) AS max_num, CAST(NULL AS VARCHAR) AS min_str, "
            f"CAST(NULL AS VARCHAR) AS max_str FROM {relation}"
        )
    for c in string_cols:
        parts.append(
            f"SELECT '{c}', count(*), count({c}), count(DISTINCT {c}), "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min({c}), max({c}) "
            f"FROM {relation}"
        )
    return "\nUNION ALL\n".join(parts)
