"""Skew-mitigation operators for hub keys.

AQE's skew-join handling (enabled in session.py) splits oversized
sort-merge partitions automatically, but only where runtime statistics
see them. These helpers are the explicit fallback for *known* hub keys
— the "NULL key", "default tenant", top-domain cases every large corpus
has — and for shapes AQE does not rewrite:

* ``salted_join``   — replicate the modest side ``num_salts`` times and
  scatter the skewed side across salt buckets, turning one giant join
  task into ``num_salts`` even ones. The salt never affects which rows
  match, only where they are processed, so results are identical to a
  plain join. (If the other side fits in memory, prefer
  ``F.broadcast`` — salting is for the middle regime where it doesn't.)
* ``salted_distinct_count`` — two-phase exact COUNT(DISTINCT v) GROUP
  BY k: phase one dedups (k, salt-of-v) locally, phase two sums. A hub
  group's distinct-set never lands on a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    *,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` to ``other`` on ``on``, spreading each join key
    over ``num_salts`` buckets.

    The skewed side gets a uniform random salt per row (seeded — but
    ANY assignment is correct: matching is still governed solely by the
    join keys); the other side is replicated once per salt value so
    every (key, salt) bucket can match locally.

    ``how`` is restricted to 'inner' and 'left': under right/full
    outer, an unmatched ``other`` row exists once per replica and would
    surface ``num_salts`` duplicate null-padded rows — there is no
    per-row identity to dedup them on. Salt the other direction (swap
    the arguments) for a right-outer need.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join supports how in ('inner', 'left'): the replicated "
            "side's unmatched rows would be duplicated num_salts times under "
            f"right/full outer (got {how!r})"
        )
    if "_salt" in skewed.columns or "_salt" in other.columns:
        raise ValueError("column '_salt' already present")
    left = skewed.withColumn(
        "_salt", F.floor(F.rand(seed=42) * num_salts).cast("int")
    )
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>"))
    )
    return left.join(right, on + ["_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, group_cols: list[str], value_col: str, *, num_salts: int = 64
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per group, skew-safe.

    Plain ``countDistinct`` shuffles every row of a hub group to one
    task. Here phase one dedups on (group, salt(value), value) — the
    salt is a pure function of the value, so duplicates collapse
    within their bucket — and phase two counts bucket sizes and sums,
    keeping per-task fan-in bounded by ~|distinct| / num_salts.

    NULL values are kept through phase one (they salt into a bucket
    like any other value; ``count_distinct`` then ignores them), so a
    group whose values are ALL NULL still appears with count 0 —
    exactly matching ``groupBy().agg(count_distinct(value))``.
    """
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_salts))
    bucket_counts = (
        df.select(*group_cols, F.col(value_col), salt.alias("_salt"))
        .groupBy(*group_cols, "_salt")
        .agg(F.count_distinct(value_col).alias("_n"))
    )
    return bucket_counts.groupBy(*group_cols).agg(
        F.sum("_n").alias(f"distinct_{value_col}")
    )
