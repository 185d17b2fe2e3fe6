"""Feature-hashed TF vectors (operators/textstats.py hashed_tf_expr)."""

from __future__ import annotations

import hashlib
import math
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.operators.textstats import (  # noqa: E402
    hashed_tf_expr,
    l2_norm_expr,
    words_expr,
)

_DIM = 64


def _py_bucket(token: str) -> int:
    # Mirror of hash_bucket_expr: first 4 md5 hex digits as an int.
    return int(hashlib.md5(token.encode()).hexdigest()[:4], 16) % _DIM


def test_hashed_tf_matches_reference_buckets(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: list(r.tf)
        for r in df.select(
            "doc_id", hashed_tf_expr(words_expr(F.col("text")), _DIM).alias("tf")
        ).collect()
    }
    expect1 = [0] * _DIM
    expect1[_py_bucket("alpha")] += 2
    expect1[_py_bucket("beta")] += 1
    assert out[1] == expect1
    assert out[2] == [0] * _DIM
    assert sum(out[3]) == 1 and out[3][_py_bucket("gamma")] == 1


def test_l2_norm_of_hashed_tf(spark):
    df = spark.createDataFrame([(1, "alpha beta alpha")], ["doc_id", "text"])
    tf = hashed_tf_expr(words_expr(F.col("text")), _DIM)
    row = df.select(l2_norm_expr(tf).alias("n")).collect()[0]
    # counts are [2, 1] in some buckets -> norm = sqrt(4 + 1)
    assert abs(row.n - math.sqrt(5.0)) < 1e-12


def test_hash_topk_sample_exact_size_and_determinism(spark):
    from clearcare_data_pipeline_spark.operators.sampling import hash_topk_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 50 else "small") for i in range(55)],
        ["doc_id", "source"],
    )
    a = hash_topk_sample(df, "source", 10).collect()
    by_src: dict[str, set] = {}
    for r in a:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    assert len(by_src["big"]) == 10  # capped
    assert len(by_src["small"]) == 5  # group smaller than k -> kept whole
    # reproducible under a different partitioning of the same rows
    b = hash_topk_sample(df.repartition(7), "source", 10).collect()
    assert {(r.doc_id, r.source) for r in a} == {(r.doc_id, r.source) for r in b}
