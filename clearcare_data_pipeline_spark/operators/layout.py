"""Data-layout operators: range-clustered writes and compaction.

At 100 TB the difference between a fast and an unusable table is
usually LAYOUT, not compute: parquet footers carry per-column min/max,
so files clustered on the query key let scans skip whole files, and
oceans of tiny files drown the scheduler before the first byte is
read. Both knobs are plain Spark operations — these helpers just make
the intent explicit and testable.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_range_layout(
    df: DataFrame, path: str, sort_cols: list[str], num_files: int,
    file_format: str = "parquet",
) -> None:
    """Write a dataset clustered by ``sort_cols``: repartitionByRange
    gives each output file a disjoint key range (range-sampled
    boundaries), sortWithinPartitions orders rows inside each file so
    row-group stats are tight too. Scans filtering on the sort key
    then skip entire files on footer min/max. ``file_format`` may be
    any columnar format with footer stats (parquet, orc)."""
    (
        df.repartitionByRange(num_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .format(file_format)
        .save(path)
    )


def dataset_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith((".parquet", ".orc")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession, src: str, dst: str, *, target_file_mb: int = 128,
    file_format: str = "parquet",
) -> int:
    """Rewrite a (typically many-tiny-file) dataset into ~target-sized
    files; returns the output file count. Compaction is the standing
    maintenance job of any streaming/append pipeline — file count
    drops from O(batches) to O(bytes/target)."""
    n_files = max(1, math.ceil(dataset_bytes(src) / (target_file_mb * 1024 * 1024)))
    (
        spark.read.format(file_format).load(src)
        .repartition(n_files)
        .write.mode("overwrite").format(file_format).save(dst)
    )
    return n_files


def normalize_to_bits(col, lo: float, hi: float, bits: int = 16):
    """Scale a numeric column into [0, 2^bits) for Z-order interleaving."""
    from pyspark.sql import functions as F

    span = hi - lo
    scaled = F.floor((col - F.lit(lo)) / F.lit(span) * F.lit((1 << bits) - 1)).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1))


def zorder_key_expr(a, b, bits: int = 16):
    """Morton (Z-order) key of two normalized integer columns: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1. A static unroll
    of 2*bits bitwise terms — constant-size expression, whole-stage
    codegen friendly.

    Range-partitioning + sorting by this key clusters files in a 2-D
    space-filling curve, so scans filtering on EITHER dimension skip
    files on parquet min/max footers — the multi-column generalization
    of write_range_layout's 1-D clustering."""
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def write_zorder_layout(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    ranges: dict[str, tuple[float, float]],
    num_files: int,
    bits: int = 16,
    file_format: str = "parquet",
) -> None:
    """Write the dataset clustered on the Z-order curve of two columns
    (``ranges`` maps each column to its (lo, hi) normalization span)."""
    from pyspark.sql import functions as F

    a = normalize_to_bits(F.col(col_a), *ranges[col_a], bits=bits)
    b = normalize_to_bits(F.col(col_b), *ranges[col_b], bits=bits)
    keyed = df.withColumn("_zkey", zorder_key_expr(a, b, bits=bits))
    (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .format(file_format)
        .save(path)
    )


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    *,
    file_format: str = "parquet",
) -> None:
    """Hive-style date partitioning: one directory per day of
    ``ts_col``. The scan-side payoff is partition PRUNING — a filter
    on the partition column skips whole directories before any file
    is opened, which at 100 TB is the difference between scanning a
    day and scanning a year. Time-ordered facts (events, logs) should
    land this way by default."""
    from pyspark.sql import functions as F

    (
        df.withColumn("_date", F.to_date(F.col(ts_col)))
        .write.mode("overwrite")
        .partitionBy("_date")
        .format(file_format)
        .save(path)
    )
