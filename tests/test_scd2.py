"""SCD2 interval invariants (operators/scd2.py)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.operators.scd2 import scd2_intervals  # noqa: E402


def _cdc(spark):
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-03 00:00:00", "b"),
        (1, "2024-01-02 00:00:00", "c"),
        (2, "2024-01-05 00:00:00", "x"),
    ]
    return spark.createDataFrame(rows, "k long, ts string, v string").withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_scd2_intervals_partition_timeline(spark):
    out = scd2_intervals(_cdc(spark), ["k"], "ts").orderBy("k", "version").collect()
    k1 = [r for r in out if r.k == 1]
    # versions ordered by ts regardless of input order
    assert [r.v for r in k1] == ["a", "c", "b"]
    # each version's valid_to is the next version's valid_from
    for prev, nxt in zip(k1, k1[1:]):
        assert prev.valid_to == nxt.valid_from
    # exactly one current row per key, and it is the last version
    currents = [r for r in out if r.is_current]
    assert sorted(r.k for r in currents) == [1, 2]
    assert all(r.valid_to is None for r in currents)


def test_scd2_single_row_key_is_current(spark):
    out = scd2_intervals(_cdc(spark), ["k"], "ts").where(F.col("k") == 2).collect()
    assert len(out) == 1 and out[0].is_current and out[0].version == 1


def test_hash_split_stable_under_repartition(spark):
    from clearcare_data_pipeline_spark.operators.sampling import hash_split

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(7), "doc_id").collect()
    }
    assert a == b
    # both classes non-empty at the 90/10 default
    assert set(a.values()) == {"train", "eval"}
