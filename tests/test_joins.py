"""asof_join / range_join operator semantics."""

from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.joins import asof_join, range_join


def _trades(spark):
    return spark.createDataFrame(
        [("A", 10, "t1"), ("A", 25, "t2"), ("B", 12, "t3"), ("A", 3, "t0")],
        "sym string, t long, trade string",
    ).withColumn("t", F.timestamp_seconds("t"))


def _quotes(spark):
    return spark.createDataFrame(
        [("A", 5, 100.0), ("A", 20, 101.0), ("A", 30, 102.0), ("C", 1, 9.0)],
        "sym string, qt long, px double",
    ).withColumn("qt", F.timestamp_seconds("qt"))


def test_asof_backward(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on=[("sym", "sym")], left_ts="t", right_ts="qt"
    )
    got = {r["trade"]: r["px"] for r in out.collect()}
    # t0 (t=3) has no quote at/before it; t1 (10) -> qt5; t2 (25) -> qt20
    assert got == {"t1": 100.0, "t2": 101.0}


def test_asof_forward_with_left(spark):
    out = asof_join(
        _trades(spark),
        _quotes(spark),
        on=[("sym", "sym")],
        left_ts="t",
        right_ts="qt",
        direction="forward",
        how="left",
    )
    got = {r["trade"]: r["px"] for r in out.collect()}
    # forward: t0 (3) -> qt5; t1 (10) -> qt20; t2 (25) -> qt30; B has no quotes -> NULL
    assert got == {"t0": 100.0, "t1": 101.0, "t2": 102.0, "t3": None}


def test_asof_tolerance(spark):
    out = asof_join(
        _trades(spark),
        _quotes(spark),
        on=[("sym", "sym")],
        left_ts="t",
        right_ts="qt",
        tolerance=F.expr("INTERVAL 5 SECONDS"),
    )
    got = {r["trade"]: r["px"] for r in out.collect()}
    # t1 (10): qt5 is exactly 5s back -> kept; t2 (25): qt20 is 5s back -> kept
    assert got == {"t1": 100.0, "t2": 101.0}
    tight = asof_join(
        _trades(spark), _quotes(spark), on=[("sym", "sym")],
        left_ts="t", right_ts="qt", tolerance=F.expr("INTERVAL 3 SECONDS"),
    )
    assert tight.count() == 0


def test_range_join_half_open(spark):
    points = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u2", 10, "p3")],
        "uid string, x long, pid string",
    )
    intervals = spark.createDataFrame(
        [("u1", 5, 15, "i1"), ("u1", 15, 20, "i2"), ("u2", 0, 100, "i3")],
        "uid2 string, lo long, hi long, iid string",
    )
    out = range_join(
        points, intervals, on=[("uid", "uid2")], point="x", lower="lo", upper="hi"
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # p2 at x=20 is NOT in [15, 20) — upper bound is exclusive
    assert got == [("p1", "i1"), ("p3", "i3")]


def test_asof_same_named_ts_columns(spark):
    """Both sides call their timestamp 'ts' — the common case. The right
    timestamp must come back suffixed '_right', and the match semantics
    are unchanged (no ambiguous-reference analysis error)."""
    trades = _trades(spark).withColumnRenamed("t", "ts")
    quotes = _quotes(spark).withColumnRenamed("qt", "ts")
    out = asof_join(
        trades, quotes, on=[("sym", "sym")], left_ts="ts", right_ts="ts"
    )
    assert "ts_right" in out.columns
    got = {r["trade"]: r["px"] for r in out.collect()}
    assert got == {"t1": 100.0, "t2": 101.0}
    # left + tolerance through the same path
    out2 = asof_join(
        trades,
        quotes,
        on=[("sym", "sym")],
        left_ts="ts",
        right_ts="ts",
        direction="forward",
        how="left",
        tolerance=F.expr("INTERVAL 100 SECONDS"),
    )
    got2 = {r["trade"]: r["px"] for r in out2.collect()}
    assert got2 == {"t0": 100.0, "t1": 101.0, "t2": 102.0, "t3": None}


def test_banded_fuzzy_top1_matches_and_plan(spark):
    """The LSH-banded fuzzy join (J3 scale path) finds near-identical
    names through shared trigram bands, leaves dissimilar rows NULL,
    and never plans a cross product."""
    from clearcare_data_pipeline_spark.operators.joins import banded_fuzzy_top1

    left = spark.createDataFrame(
        [(1, "saint mary medical center"), (2, "zzzzqqqqxxxx")],
        ["qkey", "qname"],
    )
    right = spark.createDataFrame(
        [("saint mary medical centre",), ("general hospital north",)], ["name"]
    )
    out = banded_fuzzy_top1(left, right, "qkey", "qname", "name")
    rows = {r.qkey: r for r in out.collect()}
    assert rows[1].matched == "saint mary medical centre"
    assert rows[1].dist == 2
    assert rows[2].matched is None and rows[2].dist is None
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_banded_fuzzy_band_keys_use_distinct_seeds(spark):
    """Regression: pyspark transform treats arity-2 lambdas as
    (element, index); the minhash salt must come from a closure, so the
    per-seed minhashes (and with them the band keys) actually differ."""
    from clearcare_data_pipeline_spark.operators.joins import minhash_band_keys_expr

    df = spark.createDataFrame([("blue anvil",)], ["t"])
    bands = df.select(minhash_band_keys_expr(F.col("t")).alias("b")).collect()[0].b
    keys = [x.band_key for x in bands]
    assert len(set(keys)) == len(keys)
