"""Edge-case property tests for the round-3 operator fixes
(VERDICT r4 ask #5): salted_join degenerate salt count under AQE,
asof_join tolerance at exact boundary equality, chunk_documents at an
exact stride-boundary document length.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.chunking import chunk_documents
from clearcare_data_pipeline_spark.operators.joins import asof_join
from clearcare_data_pipeline_spark.operators.skew import salted_join


def test_salted_join_num_salts_1_under_aqe(spark):
    """num_salts=1 degenerates to a plain join (single salt bucket,
    one replica of the other side) and must produce identical results
    with AQE active — including a skewed hot key."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    fact = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 5).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 5).select(F.col("id").alias("k"), (F.col("id") * 100).alias("w"))

    got = salted_join(fact, dim, ["k"], num_salts=1).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    want = fact.join(dim, ["k"], "inner").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    assert sorted(got.collect()) == sorted(want.collect())
    # left-outer degenerate case too: unmatched keys survive exactly once
    fact2 = fact.unionByName(
        spark.range(1).select(F.lit(99).alias("k"), F.lit(-1).cast("long").alias("v"))
    )
    got_left = salted_join(fact2, dim, ["k"], num_salts=1, how="left")
    want_left = fact2.join(dim, ["k"], "left")
    assert sorted(got_left.collect()) == sorted(want_left.collect())


def test_asof_tolerance_exact_boundary(spark):
    """A right row exactly ``tolerance`` before the left timestamp is
    INSIDE the window (bound is inclusive: lt - tol <= rt, matching
    pandas merge_asof); one second beyond is outside."""
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0, 0))], ["k", "ts"]
    )
    # exactly 60s before, and 61s before
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 11, 59, 0), "at_boundary"),
            (1, datetime(2024, 1, 1, 11, 58, 59), "beyond"),
        ],
        ["k", "rts", "tag"],
    )
    got = asof_join(
        left,
        right,
        on=[("k", "k")],
        left_ts="ts",
        right_ts="rts",
        direction="backward",
        tolerance=F.expr("INTERVAL 60 SECONDS"),
    ).collect()
    assert len(got) == 1 and got[0]["tag"] == "at_boundary"

    # shrink tolerance by 1s: the boundary row falls out -> no match
    got_none = asof_join(
        left,
        right,
        on=[("k", "k")],
        left_ts="ts",
        right_ts="rts",
        direction="backward",
        tolerance=F.expr("INTERVAL 59 SECONDS"),
    ).collect()
    assert got_none == []

    # forward direction mirror: right row exactly tolerance after matches
    right_fwd = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 1, 0), "fwd_boundary")], ["k", "rts", "tag"]
    )
    got_fwd = asof_join(
        left,
        right_fwd,
        on=[("k", "k")],
        left_ts="ts",
        right_ts="rts",
        direction="forward",
        tolerance=F.expr("INTERVAL 60 SECONDS"),
    ).collect()
    assert len(got_fwd) == 1 and got_fwd[0]["tag"] == "fwd_boundary"


def test_chunk_documents_at_stride_boundary(spark):
    """n = k*stride + overlap exactly: the window starting at k*stride
    covers only tokens already inside the previous chunk, so it must be
    dropped — yet every token is still covered exactly by the kept
    chunks."""
    chunk_tokens, overlap = 8, 3
    stride = chunk_tokens - overlap  # 5
    n = 2 * stride + overlap  # 13 = exactly s2 + overlap
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = (
        chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    # start 10 (= 2*stride) has s + overlap == n -> dropped
    assert [r["start_token"] for r in rows] == [0, stride]
    assert [r["n_tokens"] for r in rows] == [chunk_tokens, chunk_tokens]
    covered = set()
    for r in rows:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["n_tokens"]
        covered.update(range(r["start_token"], r["start_token"] + r["n_tokens"]))
    assert covered == set(range(n))

    # one token more (n = k*stride + overlap + 1): the tail window now
    # contributes a new token and must be kept
    text2 = " ".join(f"t{i}" for i in range(n + 1))
    df2 = spark.createDataFrame([(1, text2)], ["doc_id", "text"])
    rows2 = (
        chunk_documents(df2, chunk_tokens=chunk_tokens, overlap=overlap)
        .orderBy("chunk_id")
        .collect()
    )
    assert [r["start_token"] for r in rows2] == [0, stride, 2 * stride]
    assert rows2[-1]["n_tokens"] == n + 1 - 2 * stride
