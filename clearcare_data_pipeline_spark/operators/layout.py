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
