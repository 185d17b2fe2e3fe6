"""Lloyd's k-means operator (operators/clustering.py)."""

from __future__ import annotations

import os
import sys

import pytest

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


def test_kmeans_early_stop_is_exact(spark):
    """VERDICT r5 #3: once an update leaves every centroid exactly
    unchanged the loop stops, and the result is bit-identical to the
    fixed-iteration run the oracle replays."""
    df = spark.createDataFrame(_vec_rows(), ["vec_id", "embedding"])
    stats = {}
    cents10, assigned10 = kmeans_fit(df, k=2, iters=10, stats=stats)
    assert stats["iterations"] < 10  # two tight blobs converge immediately
    cents2, assigned2 = kmeans_fit(df, k=2, iters=2)
    assert cents10 == cents2
    assert sorted(map(tuple, assigned10.collect())) == sorted(
        map(tuple, assigned2.collect())
    )


def test_assign_udf_bit_identical_to_literal_path(spark):
    """The Arrow-batched large-k assignment must agree with the
    interpreted fold path everywhere, including exact ties (duplicate
    centroids -> lowest index wins in both)."""
    import random

    from pyspark.sql import functions as F

    from clearcare_data_pipeline_spark.operators.clustering import (
        _assign_pandas,
        assign_expr,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    cents = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(9)]
    cents[7] = list(cents[2])  # exact tie: both paths must pick index 2
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    both = df.select(
        "vec_id",
        assign_expr(F.col("embedding"), cents).alias("lit"),
        _assign_pandas(cents)(F.col("embedding")).alias("udf"),
    )
    assert both.where(F.col("lit") != F.col("udf")).count() == 0
    assert both.where(F.col("lit") == 7).count() == 0  # tie went to 2


def test_semantic_dedup_derive_k():
    from clearcare_data_pipeline_spark.operators.clustering import derive_k

    assert derive_k(510) == 16  # the sf0.01 corpus keeps its round-5 k
    assert derive_k(1) == 1
    assert derive_k(2040) == 64
    assert derive_k(0) == 1


def test_semantic_dedup_releases_cache(spark):
    """ADVICE r5: semantic_dedup must not leak its persisted join input
    for the session lifetime; at most the narrow eager checkpoint of the
    (id, cluster, is_dup) result may remain."""
    from clearcare_data_pipeline_spark.operators.clustering import semantic_dedup

    df = spark.createDataFrame(_vec_rows(), ["vec_id", "embedding"])
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = semantic_dedup(df, k=2, iters=1)
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after - before <= 1
    assert out.count() == len(_vec_rows())


@pytest.mark.slow
def test_semantic_dedup_flags_planted_copies(spark):
    """Exact copies (cos = 1.0) land in the same cluster and must be
    the flagged duplicates; the lower-id originals are kept."""
    from pyspark.sql import functions as F

    from clearcare_data_pipeline_spark.operators.clustering import semantic_dedup
    from clearcare_data_pipeline_spark.sources.tables import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    copies = vecs.where(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 500000
    )
    out = semantic_dedup(vecs.unionByName(copies), k=4, iters=2, threshold=0.99)
    rows = {r["vec_id"]: r for r in out.collect()}
    n_originals = vecs.count()
    assert len(rows) == n_originals + copies.count()
    for r in rows.values():
        if r["vec_id"] >= 500000:
            assert r["is_dup"], f"planted copy {r['vec_id']} not flagged"
            # copy shares its original's cluster
            assert r["cluster"] == rows[r["vec_id"] - 500000]["cluster"]
        else:
            assert not r["is_dup"], f"original {r['vec_id']} wrongly flagged"


@pytest.mark.slow
def test_hierarchical_join_exchange_bit_identical(spark):
    """VERDICT r7 #6: the keyed-join centroid exchange (the 100 TB
    path, forced via exchange='join') must emit exactly the driver
    exchange's assignments — same Lloyd fold, same early stop, same
    path-encoded ids."""
    from clearcare_data_pipeline_spark.operators.clustering import (
        hierarchical_assign,
    )
    from clearcare_data_pipeline_spark.sources.tables import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    stats_d, stats_j = {}, {}
    drv = hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3,
        stats=stats_d, exchange="driver",
    )
    jn = hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3,
        stats=stats_j, exchange="join",
    )
    assert stats_d["join_levels"] == 0
    assert stats_j["join_levels"] == stats_j["levels"] > 0
    d = {r.vec_id: r.cluster for r in drv.collect()}
    j = {r.vec_id: r.cluster for r in jn.collect()}
    assert d == j


def test_hierarchical_exchange_rejects_bad_mode(spark):
    import pytest

    from clearcare_data_pipeline_spark.operators.clustering import (
        hierarchical_assign,
    )

    df = spark.createDataFrame(_vec_rows(), ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="exchange"):
        hierarchical_assign(df, exchange="banana")


@pytest.mark.slow
def test_semantic_dedup_crossover_paths_flag_planted_copies(spark):
    """VERDICT r7 #3: auto partitioning is count-keyed — small corpora
    take flat auto-k Lloyd's, large ones the hierarchy (forced here
    via flat_max_n=0). Exact planted copies must be flagged on BOTH
    sides of the crossover, and the output schema must not change
    across it (cluster stays BIGINT)."""
    from pyspark.sql import functions as F

    from clearcare_data_pipeline_spark.operators.clustering import semantic_dedup
    from clearcare_data_pipeline_spark.sources.tables import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    copies = vecs.where(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + 500000
    )
    corpus = vecs.unionByName(copies)
    for forced_max in (None, 0):  # None -> flat (n < 65536); 0 -> hierarchical
        kw = {} if forced_max is None else {"flat_max_n": forced_max}
        out = semantic_dedup(corpus, k=None, iters=2, threshold=0.99, **kw)
        assert dict(out.dtypes)["cluster"] == "bigint"
        rows = {r["vec_id"]: r for r in out.collect()}
        for vid, r in rows.items():
            if vid >= 500000:
                assert r["is_dup"], f"copy {vid} not flagged (flat_max_n={forced_max})"
                assert r["cluster"] == rows[vid - 500000]["cluster"]


@pytest.mark.slow
def test_hierarchical_auto_trigger_without_collect(spark, monkeypatch):
    """VERDICT r8 #7: the auto exchange trigger derives from the
    DataFrame-side splitting-cluster count — forcing the cap to 0 must
    route every splitting level through the join exchange with output
    identical to the driver exchange."""
    from clearcare_data_pipeline_spark.operators import clustering
    from clearcare_data_pipeline_spark.sources.tables import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    ref = clustering.hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3, exchange="driver"
    )
    monkeypatch.setattr(clustering, "HIER_DRIVER_CENTROID_CAP", 0)
    stats = {}
    out = clustering.hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3,
        stats=stats, exchange="auto",
    )
    assert stats["join_levels"] == stats["levels"] > 0
    assert {(r.vec_id, r.cluster) for r in out.collect()} == {
        (r.vec_id, r.cluster) for r in ref.collect()
    }


@pytest.mark.slow
def test_hierarchical_shuffle_join_split_set_bit_identical(spark, monkeypatch):
    """VERDICT r8 #2: above HIER_SPLIT_BROADCAST_CAP the split set
    joins by shuffle instead of broadcast — forced via cap 0, the
    assignments must not change."""
    from clearcare_data_pipeline_spark.operators import clustering
    from clearcare_data_pipeline_spark.sources.tables import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    ref = clustering.hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3
    )
    monkeypatch.setattr(clustering, "HIER_SPLIT_BROADCAST_CAP", 0)
    out = clustering.hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3
    )
    assert {(r.vec_id, r.cluster) for r in out.collect()} == {
        (r.vec_id, r.cluster) for r in ref.collect()
    }


@pytest.mark.slow
def test_hierarchical_forced_driver_over_cap_recollects(spark, monkeypatch):
    """ADVICE r13: forced exchange='driver' with a split set overflowing
    HIER_DRIVER_CENTROID_CAP must not act on the truncated capped head —
    the driver branch re-collects the full split set, so assignments
    match the uncapped driver run exactly."""
    from clearcare_data_pipeline_spark.operators import clustering
    from clearcare_data_pipeline_spark.sources.tables import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    ref = clustering.hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3, exchange="driver"
    )
    monkeypatch.setattr(clustering, "HIER_DRIVER_CENTROID_CAP", 0)
    stats = {}
    out = clustering.hierarchical_assign(
        vecs, target_width=8, branch=4, iters=2, max_levels=3,
        stats=stats, exchange="driver",
    )
    assert stats["join_levels"] == 0 and stats["levels"] > 0
    assert {(r.vec_id, r.cluster) for r in out.collect()} == {
        (r.vec_id, r.cluster) for r in ref.collect()
    }
