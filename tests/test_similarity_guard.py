"""cosine_topk broadcast guardrail (VERDICT r5 #7)."""

import pytest

from clearcare_data_pipeline_spark.operators import similarity


def _vecs(spark, n, prefix=0):
    rows = [(prefix + i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(n)]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_routes_to_ivf_above_cap(spark, monkeypatch):
    called = {}
    real = similarity.ivf_topk_nprobe

    def spy(vectors, queries, **kw):
        called["hit"] = True
        return real(vectors, queries, **kw)

    monkeypatch.setattr(similarity, "ivf_topk_nprobe", spy)
    out = similarity.cosine_topk(
        _vecs(spark, 20), _vecs(spark, 5, prefix=100), k=2, max_broadcast_queries=3
    )
    with pytest.warns(UserWarning, match="routing to ivf_topk_nprobe"):
        similarity.cosine_topk(
            _vecs(spark, 20), _vecs(spark, 5, prefix=100), k=2, max_broadcast_queries=3
        )
    assert called.get("hit")
    assert out.columns == ["query_id", "neighbor_id", "cos_sim", "rn"]


def test_cosine_topk_stays_exact_under_cap(spark, monkeypatch):
    def boom(*a, **kw):
        raise AssertionError("brute-force path must not route below the cap")

    monkeypatch.setattr(similarity, "ivf_topk_nprobe", boom)
    out = similarity.cosine_topk(_vecs(spark, 20), _vecs(spark, 5, prefix=100), k=2)
    assert out.groupBy("query_id").count().count() == 5


def test_derive_num_planes_scaling():
    """Auto plane count keeps expected bucket width <= target: smallest
    p in [8, 24] with (1 << p) * 64 >= n (integer-exact, same rule the
    DuckDB oracle replays from count(*))."""
    assert similarity.derive_num_planes(0) == 8
    assert similarity.derive_num_planes(16_384) == 8  # 2^8 * 64 boundary
    assert similarity.derive_num_planes(16_385) == 9
    assert similarity.derive_num_planes(208_000) == 12
    assert similarity.derive_num_planes(10**12) == 24  # capped


def test_near_dup_pairs_auto_planes_matches_explicit(spark):
    vecs = _vecs(spark, 30)
    auto = similarity.lsh_near_dup_pairs(vecs, min_cosine=0.9)
    explicit = similarity.lsh_near_dup_pairs(
        vecs, min_cosine=0.9, num_planes=similarity.derive_num_planes(30)
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, explicit.collect()))
