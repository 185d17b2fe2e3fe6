"""snapshot_diff <-> merge_upsert round trip (operators/merge.py)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.operators.merge import merge_upsert, snapshot_diff  # noqa: E402


def test_diff_classifies_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c")], "k long, v double, s string"
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 25.0, "b"), (4, 40.0, "d"), (3, 30.0, "c")],
        "k long, v double, s string",
    )
    diff = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    # k=1 unchanged (absent), k=2 repriced, k=3 NULL->value (eqNullSafe), k=4 new
    assert diff == {2: "update", 3: "update", 4: "insert"}

    # deletion
    diff2 = snapshot_diff(new, old, ["k"]).where(F.col("change_type") == "delete").collect()
    assert [r.k for r in diff2] == [4]


def test_diff_then_merge_reproduces_new_snapshot(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (4, 40.0)], "k long, v double"
    )
    cdf = snapshot_diff(old, new, ["k"])
    upserts = cdf.where(F.col("change_type") != "delete").drop("change_type")
    deletes = cdf.where(F.col("change_type") == "delete").select("k")
    replayed = merge_upsert(old, upserts, ["k"]).join(deletes, ["k"], "left_anti")
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, new.collect()))


def test_merge_schema_evolution_read(spark, tmp_path):
    """Schema-on-read evolution: mergeSchema unions parquet footers so
    old files surface the new column as NULL."""
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.createDataFrame([(1, 10.0)], "k long, v double").write.parquet(p1)
    spark.createDataFrame([(2, 20.0, "fresh")], "k long, v double, note string").write.parquet(p2)
    merged = spark.read.option("mergeSchema", "true").parquet(p1, p2)
    rows = {r.k: (r.v, r.note) for r in merged.collect()}
    assert rows == {1: (10.0, None), 2: (20.0, "fresh")}
