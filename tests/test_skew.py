"""Skew operators: salted results must equal their plain equivalents."""

import pytest
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


def _skewed_df(spark):
    # 10_000 rows on one hub key + a tail of 100 normal keys.
    hub = spark.range(10_000).select(F.lit("hub").alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hub.unionByName(tail)


def _dim(spark):
    rows = [("hub", "HUB DIM")] + [(f"k{i}", f"dim {i}") for i in range(0, 100, 2)]
    return spark.createDataFrame(rows, "k string, label string")


def test_salted_join_matches_plain_inner(spark):
    left, dim = _skewed_df(spark), _dim(spark)
    plain = left.join(dim, ["k"]).groupBy("k", "label").agg(F.sum("v").alias("s"))
    salted = (
        salted_join(left, dim, ["k"], num_salts=8)
        .groupBy("k", "label")
        .agg(F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left, dim = _skewed_df(spark), _dim(spark)
    plain = left.join(dim, ["k"], "left").groupBy("k").agg(
        F.count("label").alias("matched"), F.count(F.lit(1)).alias("n")
    )
    salted = salted_join(left, dim, ["k"], num_salts=4, how="left").groupBy("k").agg(
        F.count("label").alias("matched"), F.count(F.lit(1)).alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_salt_collision(spark):
    left = _skewed_df(spark).withColumn("_salt", F.lit(1))
    with pytest.raises(ValueError, match="_salt"):
        salted_join(left, _dim(spark), ["k"])


def test_salted_distinct_count(spark):
    df = _skewed_df(spark).withColumn("v", F.col("v") % 777)  # planted dup values
    plain = df.groupBy("k").agg(F.count_distinct("v").alias("distinct_v"))
    salted = salted_distinct_count(df, ["k"], "v", num_salts=16)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_outer_modes(spark):
    left, dim = _skewed_df(spark), _dim(spark)
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="inner"):
            salted_join(left, dim, ["k"], how=how)


def test_salted_distinct_count_keeps_all_null_groups(spark):
    # Group "nulls" has only NULL values; plain count_distinct reports it
    # with count 0 — the salted version must not drop it.
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", None), ("nulls", None), ("nulls", None)],
        "k string, v string",
    )
    plain = df.groupBy("k").agg(F.count_distinct("v").alias("distinct_v"))
    salted = salted_distinct_count(df, ["k"], "v", num_salts=8)
    expected = sorted(map(tuple, plain.collect()))
    assert ("nulls", 0) in expected
    assert sorted(map(tuple, salted.collect())) == expected
