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


def test_plane_family_distinct_beyond_cycle():
    """The base plane formula cycles with period 19 in j; the extended
    family must not duplicate planes (a duplicated plane adds a
    signature bit that can never split a bucket), while leaving every
    j < 19 plane bit-identical to the original formula."""
    planes = [tuple(similarity._plane(j)) for j in range(32)]
    assert len(set(planes)) == 32
    for j in range(19):
        base = tuple(float(((i * 37 + j * 101) % 19) - 9) for i in range(64))
        assert planes[j] == base


def test_refined_buckets_partition_and_leaf_cap(spark):
    """Adaptive refinement: buckets partition the corpus, identical
    vectors always share a leaf, and every leaf below the ladder's
    maximum depth respects LSH_LEAF_CAP."""
    import collections

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(10)] + [
        (100 + i, [float(i % 7) - 3.0, float((i * 5) % 11), 1.0]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = similarity.refined_lsh_buckets(df).select("vec_id", "bucket").collect()
    assert len(got) == 50 and len({r.vec_id for r in got}) == 50
    by_bucket = collections.defaultdict(list)
    for r in got:
        by_bucket[r.bucket].append(r.vec_id)
    # the 10 identical vectors share one leaf
    clones = {r.bucket for r in got if r.vec_id < 10}
    assert len(clones) == 1
    levels = len(similarity.LSH_REFINE_LADDER)
    for b, members in by_bucket.items():
        if b % levels < levels - 1:
            assert len(members) <= similarity.LSH_LEAF_CAP


def test_near_dup_pairs_finds_planted_copies(spark):
    rows = [(i, [float(i % 7) + 1.0, float((i * 3) % 5), 1.0]) for i in range(35)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    copies = df.withColumn("vec_id", df.vec_id + 1000)
    out = similarity.lsh_near_dup_pairs(df.unionByName(copies), min_cosine=0.999999)
    pairs = {(r.a, r.b) for r in out.collect()}
    for i in range(35):
        assert (i, i + 1000) in pairs


@pytest.mark.slow
def test_near_dup_crossover_flat_equals_fixed_width(spark):
    """r8 count-keyed crossover: below LSH_FLAT_MAX_N the default path
    IS the fixed LSH_FLAT_PLANES-plane bucketing — identical pair set
    to an explicit num_planes run, by construction."""
    rows = [(i, [float(i % 9) - 4.0, float((i * 7) % 13), 2.0]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    copies = df.withColumn("vec_id", df.vec_id + 5000)
    corpus = df.unionByName(copies)
    auto = {(r.a, r.b, r.cos_sim)
            for r in similarity.lsh_near_dup_pairs(corpus, min_cosine=0.99).collect()}
    fixed = {(r.a, r.b, r.cos_sim)
             for r in similarity.lsh_near_dup_pairs(
                 corpus, min_cosine=0.99,
                 num_planes=similarity.LSH_FLAT_PLANES).collect()}
    assert auto == fixed and auto


def test_near_dup_crossover_ladder_branch_still_finds_copies(spark):
    """Forcing the ladder branch (flat_max_n=0) on the same corpus
    must still surface every planted identical pair — identical
    vectors share the full signature, hence one leaf, at any depth."""
    rows = [(i, [float(i % 9) - 4.0, float((i * 7) % 13), 2.0]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    copies = df.withColumn("vec_id", df.vec_id + 5000)
    out = similarity.lsh_near_dup_pairs(
        df.unionByName(copies), min_cosine=0.999999, flat_max_n=0)
    pairs = {(r.a, r.b) for r in out.collect()}
    for i in range(60):
        assert (i, i + 5000) in pairs


def test_expr_and_pandas_signatures_agree_off_dimension(spark):
    """ADVICE r7 #1/#4: for vectors whose length differs from PLANE_DIM
    the expression path used to NULL out every dot (zip_with padding)
    and collapse all vectors into bucket 0; the pandas path used to
    np.stack-crash on ragged batches. Both must now produce the same
    plane-PREFIX signature for short, exact, long, and mixed lengths."""
    from pyspark.sql import functions as F

    rows = [
        (1, [1.0, -2.0, 3.0]),                       # short
        (2, [float((i * 7) % 11) - 5.0 for i in range(64)]),   # exact
        (3, [float((i * 5) % 13) - 6.0 for i in range(80)]),   # long
        (4, [-1.0] * 10),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    d = similarity.with_norm(df, "embedding")
    expr8 = d.select(
        "vec_id", similarity.lsh_bucket_expr(F.col("dvec"), 8).alias("b")
    )
    pandas8 = d.select(
        "vec_id", similarity._lsh_signature_pandas(8)(F.col("dvec")).alias("b")
    )
    got_e = {r.vec_id: r.b for r in expr8.collect()}
    got_p = {r.vec_id: r.b for r in pandas8.collect()}
    assert got_e == got_p
    # not everything collapsed into bucket 0
    assert set(got_e.values()) != {0}


def test_pandas_signature_truncates_to_plane_dim(spark):
    """A >PLANE_DIM vector must hash identically to its 64-dim prefix
    (the pm[:, :64] semantics), in both uniform and ragged batches."""
    from pyspark.sql import functions as F

    long_vec = [float((i * 7) % 11) - 5.0 for i in range(100)]
    rows = [(1, long_vec), (2, long_vec[:64]), (3, [1.0, 2.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(1)
    d = similarity.with_norm(df, "embedding")
    out = {
        r.vec_id: r.b
        for r in d.select(
            "vec_id", similarity._lsh_signature_pandas(32)(F.col("dvec")).alias("b")
        ).collect()
    }
    assert out[1] == out[2]


def test_bucket_oracle_agrees_beyond_plane_dim(spark):
    """ADVICE r8 #2: for vectors LONGER than PLANE_DIM the DuckDB twin
    used to NULL every plane dot (plane[i] is NULL past 64) and bucket
    everything to 0 while Spark computed real prefix bits. The clamped
    _dot_prefix must agree with lsh_bucket_expr for short, exact, and
    long vectors alike."""
    import duckdb
    from pyspark.sql import functions as F

    from clearcare_data_pipeline_spark.operators.similarity import (
        PLANE_DIM,
        lsh_bucket_expr,
    )
    from clearcare_data_pipeline_spark.queries.similarity import _bucket_sql

    vecs = [
        [float((i * 7) % 5 - 2) for i in range(3)],          # short
        [float((i * 11) % 9 - 4) for i in range(PLANE_DIM)],  # exact
        [float((i * 13) % 7 - 3) for i in range(PLANE_DIM + 8)],  # long
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)], ["i", "dvec"])
    got_spark = {
        r["i"]: r["b"]
        for r in df.select("i", lsh_bucket_expr(F.col("dvec")).alias("b")).collect()
    }
    con = duckdb.connect()
    got_duck = {}
    for i, v in enumerate(vecs):
        lit = "[" + ", ".join(repr(x) for x in v) + "]"
        sql = f"SELECT {_bucket_sql('dv')} AS b FROM (SELECT {lit} AS dv)"
        got_duck[i] = con.execute(sql).fetchone()[0]
    assert got_spark == got_duck
    assert got_duck[2] != 0  # long vectors no longer collapse to bucket 0



@pytest.mark.slow
def test_banded_one_band_equals_flat_pairs(spark):
    """band 0 is exactly the flat plane family, so n_bands=1 must
    reproduce lsh_near_dup_pairs' flat-branch pair set."""
    from pyspark.sql import functions as F

    from clearcare_data_pipeline_spark.operators.similarity import (
        lsh_banded_pairs,
        lsh_near_dup_pairs,
    )
    from clearcare_data_pipeline_spark.sources.tables import load_table

    vecs = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    copies = vecs.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 500000
    )
    corpus = vecs.unionByName(copies)
    flat = {(r.a, r.b, r.cos_sim) for r in lsh_near_dup_pairs(corpus).collect()}
    banded = {(r.a, r.b, r.cos_sim) for r in lsh_banded_pairs(corpus, n_bands=1).collect()}
    assert flat == banded and len(flat) > 0
    # the n_bands argument on the main operator routes to the banded path
    routed = {(r.a, r.b, r.cos_sim)
              for r in lsh_near_dup_pairs(corpus, n_bands=2).collect()}
    assert routed >= flat  # OR construction can only add pairs


@pytest.mark.slow
def test_lsh_recall_gate_reaches_target(spark):
    """VERDICT r8 #6 'done' criterion: a recall >= 0.9 configuration
    demonstrated on planted near-dups (noisy copies at cos ~ 0.996 —
    exact copies always collide and would measure nothing). The
    6-band OR construction must beat the single flat band."""
    from clearcare_data_pipeline_spark.queries.similarity import (
        _MIN_COS,
        _recall_corpus,
        q_emb_lsh_recall,
    )
    from clearcare_data_pipeline_spark.operators.similarity import lsh_banded_pairs

    row = q_emb_lsh_recall(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["n_true"] >= 10
    assert row["recall"] >= 0.9
    corpus = _recall_corpus(spark, "/root/testdata/sf0.01")
    one = lsh_banded_pairs(corpus, min_cosine=_MIN_COS, n_bands=1).count()
    assert row["n_found"] > 0 and one <= row["n_found"]


def test_banded_forwards_num_planes(spark, monkeypatch):
    """ADVICE r9 #4: an explicit num_planes must reach the banded path
    as planes_per_band, and a non-default flat_max_n (meaningless with
    n_bands > 1) must raise instead of being silently dropped."""
    import pytest

    seen = {}
    real = similarity.lsh_banded_pairs

    def spy(df, **kw):
        seen.update(kw)
        return real(df, **kw)

    monkeypatch.setattr(similarity, "lsh_banded_pairs", spy)
    rows = [(i, [float(i % 5), 1.0, 2.0]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    similarity.lsh_near_dup_pairs(df, n_bands=2, num_planes=7).collect()
    assert seen["planes_per_band"] == 7 and seen["n_bands"] == 2
    with pytest.raises(ValueError, match="flat_max_n"):
        similarity.lsh_near_dup_pairs(df, n_bands=2, flat_max_n=5)


@pytest.mark.slow
def test_flat_broadcast_gated_on_bytes(spark, monkeypatch):
    """ADVICE r9 #3: the flat branch's self-join broadcast is gated on
    estimated bytes (rows x dim x 8), not row count — wide embeddings
    skip the broadcast but keep the identical pair set."""
    rows = [(i, [float(i % 7) + 1.0, float((i * 3) % 5), 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    copies = df.withColumn("vec_id", df.vec_id + 1000)
    corpus = df.unionByName(copies)
    est = similarity._estimated_vec_bytes(corpus, similarity.LSH_FLAT_MAX_N)
    assert est == similarity.LSH_FLAT_MAX_N * (3 * 8 + 32)
    with_bcast = {(r.a, r.b) for r in similarity.lsh_near_dup_pairs(
        corpus, min_cosine=0.999999).collect()}
    monkeypatch.setattr(similarity, "LSH_BROADCAST_BYTES_CAP", 0)
    without = {(r.a, r.b) for r in similarity.lsh_near_dup_pairs(
        corpus, min_cosine=0.999999).collect()}
    assert with_bcast == without
    for i in range(30):
        assert (i, i + 1000) in without


def test_banded_pairs_precomputed_normed_identical(spark):
    """r14: lsh_banded_pairs(normed=...) must emit exactly the rows of
    the self-computed with_norm path — the hook only relocates where
    the (dvec, norm) pass runs."""
    from clearcare_data_pipeline_spark.operators.similarity import (
        lsh_banded_pairs,
        with_norm,
    )
    from clearcare_data_pipeline_spark.sources.tables import load_table

    corpus = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    base = {
        (r.a, r.b, r.cos_sim)
        for r in lsh_banded_pairs(corpus, min_cosine=0.9, n_bands=3).collect()
    }
    n = with_norm(corpus, "embedding").select("vec_id", "dvec", "norm").localCheckpoint()
    hooked = {
        (r.a, r.b, r.cos_sim)
        for r in lsh_banded_pairs(corpus, min_cosine=0.9, n_bands=3, normed=n).collect()
    }
    assert hooked == base
