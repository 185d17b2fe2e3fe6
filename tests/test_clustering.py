"""Lloyd's k-means operator (operators/clustering.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.operators.clustering import kmeans_fit  # noqa: E402


def _vec_rows():
    # Two tight blobs around (0,0) and (10,10); ids interleaved so the
    # first-k init picks one point from each blob (ids 1 and 2).
    return [
        (1, [0.0, 0.1]),
        (2, [10.0, 10.1]),
        (3, [0.2, -0.1]),
        (4, [9.8, 10.0]),
        (5, [-0.1, 0.0]),
        (6, [10.2, 9.9]),
    ]


def test_kmeans_separates_blobs(spark):
    df = spark.createDataFrame(_vec_rows(), ["vec_id", "embedding"])
    cents, assigned = kmeans_fit(df, k=2, iters=2)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    assert got[1] == got[3] == got[5]
    assert got[2] == got[4] == got[6]
    assert got[1] != got[2]
    # Converged centroids are the blob means
    assert abs(cents[got[1]][0] - 0.0333333) < 1e-4
    assert abs(cents[got[2]][0] - 10.0) < 1e-4


def test_kmeans_deterministic(spark):
    df = spark.createDataFrame(_vec_rows(), ["vec_id", "embedding"])
    a = sorted(tuple(r) for r in kmeans_fit(df, k=2, iters=3)[1].collect())
    b = sorted(tuple(r) for r in kmeans_fit(df, k=2, iters=3)[1].collect())
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # All points identical except the two init points: cluster 1's
    # centroid would go empty only if no point maps to it; with k=2 and
    # one far outlier as id 2, cluster 1 keeps at least the outlier.
    rows = [(1, [0.0, 0.0]), (2, [100.0, 100.0]), (3, [0.1, 0.0]), (4, [0.0, 0.1])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents, assigned = kmeans_fit(df, k=2, iters=2)
    got = {r.vec_id: r.cluster for r in assigned.collect()}
    assert got[2] != got[1]
