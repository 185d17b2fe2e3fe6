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

# Hierarchical splitting parameters (the SemDeDup scale path). Flat
# Lloyd's with k = n/width pays O(n x k) per assignment pass — that is
# O(n^2 / width), measured as 75x wall time for 10x data at sf10.
# Recursive B-way splitting of oversized clusters pays O(n x B) per
# level for ceil(log_B(n / width)) levels: O(n log n) total, every pass
# against at most B centroids per point.
HIER_BRANCH = 32
HIER_MAX_LEVELS = 4


def hierarchical_assign(
    df: DataFrame,
    target_width: int = SEMDEDUP_TARGET_WIDTH,
    branch: int = HIER_BRANCH,
    iters: int = 2,
    max_levels: int = HIER_MAX_LEVELS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: dict | None = None,
) -> DataFrame:
    """Recursive B-way k-means partitioning (bisecting-k-means
    generalized — the same family as Spark MLlib's BisectingKMeans and
    the coarse levels of a faiss IMI index): every cluster wider than
    ``target_width`` is split into ``branch`` sub-clusters by a
    deterministic per-cluster Lloyd's run (init = the ``branch``
    lowest-id members, ``iters`` iterations, DECIMAL-summed means,
    empty sub-clusters keep their init centroid, argmin ties break on
    the lowest sub index), until every cluster fits or ``max_levels``
    is reached. Returns (id_col, cluster BIGINT); ids are path-encoded
    (parent * (branch+1) + sub + 1 for split rows, parent * (branch+1)
    for pass-through rows), so ids are unique across mixed depths.

    Scale shape: each level is one keyed join + ``iters + 1``
    whole-corpus passes that score each point against at most
    ``branch`` centroids (Arrow-batched, dimension-major fold — bit-
    identical to the flat path and the DuckDB twin), plus one
    per-(cluster, sub, dim) DECIMAL aggregation. Level count grows as
    log_branch(n / target_width), so total work is O(n log n) — no
    stage is ever O(n x total_clusters). Driver round-trips hold the
    centroids of clusters being split (<= branch x dim doubles each);
    beyond ~10M simultaneous centroids those dicts outgrow the driver
    and the assignment/means exchange should move to a keyed join —
    same semantics, not needed at benched scales.

    Early stop per level (same argument as kmeans_fit): the Lloyd loop
    breaks when an update leaves every centroid of every splitting
    cluster EXACTLY unchanged, which cannot change the result vs the
    fixed-iteration replay the oracle runs.

    The fixed-depth cap bounds the generated oracle SQL; a pathological
    cluster that is still oversized at ``max_levels`` (e.g. > branch x
    target_width identical vectors) stays one cluster — the downstream
    pairwise stage then pays that cluster's true quadratic cost, which
    is output-bound anyway for identical vectors.
    """
    import numpy as np

    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("_hid"), as_double_vec(F.col(vec_col)).alias("dvec")
    ).persist()
    enc = branch + 1
    try:
        cur = base.select("_hid", F.lit(0).cast("bigint").alias("cluster"))
        cur = cur.localCheckpoint(eager=True)
        levels_run = 0
        for _level in range(max_levels):
            widths = cur.groupBy("cluster").count().collect()
            split_ids = sorted(r["cluster"] for r in widths if r["count"] > target_width)
            if not split_ids:
                # The fixed-depth oracle replay re-encodes ids by `enc`
                # at EVERY level, including no-op ones — apply the
                # remaining re-encodings here so both engines emit the
                # same path-encoded ids, then stop early (the scans the
                # oracle still runs on empty split sets are no-ops).
                remaining = max_levels - _level
                cur = cur.select(
                    "_hid",
                    (F.col("cluster") * (enc**remaining)).cast("bigint").alias("cluster"),
                )
                break
            levels_run += 1
            spark = df.sparkSession
            split_df = F.broadcast(
                spark.createDataFrame([(c,) for c in split_ids], "cluster: bigint")
            )
            work = (
                base.join(cur, "_hid")
                .join(split_df, "cluster")
                .select("_hid", "cluster", "dvec")
                .persist()
            )
            try:
                # init: the `branch` lowest ids of each splitting cluster
                # (narrow (id, cluster) window, dvec joined back after —
                # the window shuffle carries 16-byte rows, not vectors)
                rn = F.row_number().over(
                    Window.partitionBy("cluster").orderBy("_hid")
                )
                init_ids = (
                    work.select("_hid", "cluster")
                    .withColumn("rn", rn)
                    .where(F.col("rn") <= branch)
                )
                init_rows = (
                    work.select("_hid", "dvec")
                    .join(F.broadcast(init_ids), "_hid")
                    .select("cluster", (F.col("rn") - 1).alias("sub"), "dvec")
                    .collect()
                )
                cents: dict[int, np.ndarray] = {}
                subs_of: dict[int, int] = {}
                for r in init_rows:
                    subs_of[r.cluster] = max(subs_of.get(r.cluster, 0), r.sub + 1)
                for c in split_ids:
                    cents[c] = np.zeros((subs_of[c], len(init_rows[0].dvec)))
                for r in init_rows:
                    cents[r.cluster][r.sub] = r.dvec
                executed = 0
                for _ in range(iters):
                    assigned = work.withColumn(
                        "sub", _assign_grouped_pandas(cents)(F.col("dvec"), F.col("cluster"))
                    )
                    rows = (
                        assigned.select("cluster", "sub", F.posexplode("dvec").alias("pos", "v"))
                        .groupBy("cluster", "sub", "pos")
                        .agg(
                            (
                                F.sum(F.col("v").cast(_SUM_DEC)).cast("double")
                                / F.count(F.lit(1))
                            ).alias("m")
                        )
                        .groupBy("cluster", "sub")
                        .agg(
                            F.transform(
                                F.sort_array(F.collect_list(F.struct("pos", "m"))),
                                lambda s: s.m,
                            ).alias("cvec")
                        )
                        .collect()
                    )
                    new_cents = {c: m.copy() for c, m in cents.items()}
                    for r in rows:
                        new_cents[r.cluster][r.sub] = r.cvec
                    executed += 1
                    if all(np.array_equal(new_cents[c], cents[c]) for c in cents):
                        break
                    cents = new_cents
                final_sub = work.select(
                    "_hid",
                    _assign_grouped_pandas(cents)(F.col("dvec"), F.col("cluster")).alias("sub"),
                )
                cur = (
                    cur.join(final_sub, "_hid", "left")
                    .select(
                        "_hid",
                        (
                            F.col("cluster") * enc
                            + F.when(F.col("sub").isNotNull(), F.col("sub") + 1).otherwise(F.lit(0))
                        ).cast("bigint").alias("cluster"),
                    )
                    .localCheckpoint(eager=True)
                )
            finally:
                work.unpersist()
        if stats is not None:
            stats["levels"] = levels_run
        return cur.select(F.col("_hid").alias(id_col), "cluster")
    finally:
        base.unpersist()


def _assign_grouped_pandas(cents):
    """Arrow-batched per-cluster nearest-sub-centroid assignment:
    ``cents`` maps cluster id -> (subs, dim) centroid matrix. Batches
    are grouped by cluster in pandas, each group scored against its own
    matrix with the identical dimension-major float64 fold as
    ``_assign_pandas`` (bit-identical to the literal expression and the
    DuckDB replay); argmin breaks exact ties on the lowest sub."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def assign(v: pd.Series, cluster: pd.Series) -> pd.Series:
        out = np.zeros(len(v), dtype="int32")
        if len(v) == 0:
            return pd.Series(out)
        frame = pd.DataFrame({"i": np.arange(len(v)), "c": cluster.to_numpy()})
        for c, grp in frame.groupby("c"):
            cmat = cents[c]
            idx = grp["i"].to_numpy()
            x = np.stack(v.iloc[idx].to_numpy())
            acc = np.zeros((x.shape[0], cmat.shape[0]))
            for d in range(cmat.shape[1]):
                diff = x[:, d, None] - cmat[None, :, d]
                acc = acc + diff * diff
            out[idx] = np.argmin(acc, axis=1).astype("int32")
        return pd.Series(out)

    return assign


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
    (the default) the partitioning is ``hierarchical_assign`` —
    recursive ``HIER_BRANCH``-way splitting until every cluster is at
    most ``target_width`` wide — so cluster width (and the per-cluster
    quadratic) stays constant as the corpus grows while every
    assignment pass scores at most ``HIER_BRANCH`` centroids per point:
    O(n log n) end to end. (Flat Lloyd's with k = ceil(n/width), the
    round-5 design, keeps the pairwise linear but pays O(n x k) =
    O(n^2/width) per assignment pass — measured 75x wall time for 10x
    data at sf10.) The recursion is deterministic, so the DuckDB oracle
    twin replays the identical levels from the same corpus. An explicit
    ``k`` keeps the flat single-level Lloyd's run.
    """
    from clearcare_data_pipeline_spark.operators.similarity import (
        cosine_expr,
        with_norm,
    )

    if k is None:
        assigned = hierarchical_assign(
            df,
            target_width=target_width,
            iters=iters,
            vec_col=vec_col,
            id_col=id_col,
        )
    else:
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


def hierarchical_kmeans_oracle_sql(
    table: str,
    vec_col: str,
    id_col: str,
    target: int = SEMDEDUP_TARGET_WIDTH,
    branch: int = HIER_BRANCH,
    iters: int = 2,
    levels: int = HIER_MAX_LEVELS,
) -> str:
    """DuckDB twin of ``hierarchical_assign``: the fixed-depth unroll
    of the recursive splitting as chained CTEs. Every level computes
    the oversized-cluster set from the previous assignment, replays the
    deterministic per-cluster Lloyd's run (windowed init, narrow
    (vid, cluster, sub, d) assignment rows — the sf1 lesson from
    ``kmeans_oracle_sql`` — DECIMAL-summed means, empty subs keeping
    their previous centroid), and re-encodes ids by ``branch + 1``.
    Levels whose split set is empty degenerate to empty scans plus the
    same id re-encode the Spark side applies on early exit.

    Unlike the flat twin (whose e x k cross join is O(n x n/width) at
    auto-k), every level here is O(n x branch) rows — the oracle
    itself stays feasible at sf10."""
    enc = branch + 1
    dist = (
        "list_reduce(list_transform(range(1, len(p.dvec) + 1), "
        "i -> (p.dvec[i] - c.cvec[i]) * (p.dvec[i] - c.cvec[i])), (a, b) -> a + b)"
    )
    parts = [
        f"e AS MATERIALIZED (SELECT {id_col} AS vid, "
        f"list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS dvec FROM {table})",
        "a0 AS MATERIALIZED (SELECT vid, CAST(0 AS BIGINT) AS cluster FROM e)",
    ]

    def _assign(lvl: int, cent: str, out: str) -> str:
        return (
            f"{out} AS MATERIALIZED (SELECT vid, cluster, sub FROM ("
            f"SELECT vid, cluster, sub, row_number() OVER "
            f"(PARTITION BY vid ORDER BY d, sub) AS rn FROM ("
            f"SELECT p.vid, p.cluster, c.sub, {dist} AS d "
            f"FROM p{lvl} p JOIN {cent} c ON p.cluster = c.cluster)) WHERE rn = 1)"
        )

    for lvl in range(1, levels + 1):
        prev = f"a{lvl - 1}"
        parts.append(
            f"sl{lvl} AS MATERIALIZED (SELECT cluster FROM {prev} "
            f"GROUP BY cluster HAVING count(*) > {target})"
        )
        parts.append(
            f"p{lvl} AS MATERIALIZED (SELECT a.vid, a.cluster, e.dvec "
            f"FROM {prev} a JOIN sl{lvl} USING (cluster) JOIN e ON a.vid = e.vid)"
        )
        parts.append(
            f"c{lvl}_0 AS MATERIALIZED (SELECT cluster, CAST(rn - 1 AS INT) AS sub, "
            f"dvec AS cvec FROM (SELECT cluster, dvec, row_number() OVER "
            f"(PARTITION BY cluster ORDER BY vid) AS rn FROM p{lvl}) "
            f"WHERE rn <= {branch})"
        )
        for t in range(1, iters + 1):
            parts.append(_assign(lvl, f"c{lvl}_{t - 1}", f"x{lvl}_{t}"))
            parts.append(
                f"m{lvl}_{t} AS MATERIALIZED (SELECT cluster, sub, dim, "
                f"CAST(sum(CAST(v AS DECIMAL(27,10))) AS DOUBLE) / count(*) AS m "
                f"FROM (SELECT x.cluster, x.sub, generate_subscripts(p.dvec, 1) AS dim, "
                f"unnest(p.dvec) AS v FROM x{lvl}_{t} x JOIN p{lvl} p ON x.vid = p.vid) "
                f"GROUP BY cluster, sub, dim)"
            )
            parts.append(
                f"c{lvl}_{t} AS MATERIALIZED (SELECT p.cluster, p.sub, "
                f"coalesce(n.cvec, p.cvec) AS cvec FROM c{lvl}_{t - 1} p "
                f"LEFT JOIN (SELECT cluster, sub, list(m ORDER BY dim) AS cvec "
                f"FROM m{lvl}_{t} GROUP BY cluster, sub) n "
                f"ON p.cluster = n.cluster AND p.sub = n.sub)"
            )
        parts.append(_assign(lvl, f"c{lvl}_{iters}", f"f{lvl}"))
        parts.append(
            f"a{lvl} AS MATERIALIZED (SELECT a.vid, "
            f"CAST(a.cluster * {enc} + coalesce(f.sub + 1, 0) AS BIGINT) AS cluster "
            f"FROM {prev} a LEFT JOIN f{lvl} f ON a.vid = f.vid)"
        )
    final = f"SELECT vid AS {id_col}, cluster FROM a{levels}"
    return "WITH " + ",\n".join(parts) + "\n" + final
