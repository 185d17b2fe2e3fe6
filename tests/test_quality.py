"""Constraint-suite operator (operators/quality.py)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.operators.quality import (  # noqa: E402
    quality_report,
    row_check_report,
    uniqueness_report,
)


def test_row_checks_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "B"), (3, None, "A")],
        ["id", "amount", "grade"],
    )
    rep = row_check_report(
        df,
        {
            "amount_positive": F.col("amount") > 0,
            "grade_known": F.col("grade").isin("A", "B"),
        },
    ).collect()
    by_name = {r.check_name: r for r in rep}
    # -5.0 fails, NULL counts as a violation too
    assert by_name["amount_positive"].n_violations == 2
    assert not by_name["amount_positive"].passed
    assert by_name["grade_known"].n_violations == 0
    assert by_name["grade_known"].passed
    assert all(r.n_rows == 3 for r in rep)


def test_uniqueness_counts_extra_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (None, "a"), (None, "b")],
        ["k", "v"],
    )
    row = uniqueness_report(df, ["k"]).collect()[0]
    # key 1 has one extra row; the two NULL keys group together (one extra)
    assert row.n_violations == 2
    assert not row.passed
    assert row.check_name == "unique_k"


def test_quality_report_single_pass_plan(spark):
    """All row checks must share ONE aggregate (one scan), not one job
    per check."""
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], ["id", "v"])
    rep = row_check_report(
        df, {f"c{i}": F.col("v") >= i for i in range(8)}
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_quality_report_union(spark):
    df = spark.createDataFrame([(1, 1.0), (1, 2.0)], ["k", "v"])
    rep = quality_report(df, {"v_pos": F.col("v") > 0}, unique_keys=[["k"]])
    rows = {r.check_name: r for r in rep.collect()}
    assert set(rows) == {"v_pos", "unique_k"}
    assert rows["v_pos"].passed and not rows["unique_k"].passed
