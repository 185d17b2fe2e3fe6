"""MERGE-style upsert as a plain DataFrame operation.

The CDC/upsert pattern (Delta MERGE's whenMatchedUpdate +
whenNotMatchedInsert) without a table format: one full-outer join on
the business key; matched rows take the update row wholesale, the
rest pass through. On a real deployment the same logic backs a
partition-overwrite rewrite (only partitions containing touched keys
are rewritten); the join itself is the scale-relevant part — keyed,
co-locatable, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Row-granularity upsert: for each key, the update row wins
    entirely (including its NULLs); unmatched target rows survive,
    unmatched update rows insert. Schemas must match."""
    if set(target.columns) != set(updates.columns):
        raise ValueError("target and updates must share a schema")
    # String-qualified alias references: target and updates often share
    # lineage (CDC batches derived from the same table), where direct
    # df[col] attribute references trip Spark's ambiguous-self-join
    # detection.
    t, u = target.alias("_mt"), updates.alias("_mu")
    joined = t.join(u, keys, "full_outer")
    from_update = F.col(f"_mu.{keys[0]}").isNotNull()
    cols = [F.col(k) for k in keys] + [
        F.when(from_update, F.col(f"_mu.{c}")).otherwise(F.col(f"_mt.{c}")).alias(c)
        for c in target.columns
        if c not in keys
    ]
    return joined.select(*cols).select(*target.columns)


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str] | None = None
) -> DataFrame:
    """Change-data-feed generation — the inverse of ``merge_upsert``:
    diff two table snapshots into a changeset of (key, change_type)
    rows with change_type in {insert, update, delete}. One keyed
    full-outer join; update detection compares ``compare_cols``
    null-safely (eqNullSafe, so NULL -> value transitions register).
    Unchanged rows drop out, so the changeset is minimal — feeding it
    back through merge_upsert (+ tombstone deletes) reproduces ``new``
    from ``old`` exactly."""
    cols = compare_cols or [c for c in old.columns if c not in keys]
    # presence markers survive NULL-valued rows (value columns cannot
    # signal existence; a lit(1) marker can)
    o2 = old.withColumn("_present_old", F.lit(1)).alias("_do")
    n2 = new.withColumn("_present_new", F.lit(1)).alias("_dn")
    joined = o2.join(n2, keys, "full_outer")
    changed = ~sum(
        [F.col(f"_do.{c}").eqNullSafe(F.col(f"_dn.{c}")).cast("int") for c in cols],
        F.lit(0),
    ).eqNullSafe(F.lit(len(cols)))
    change_type = (
        F.when(F.col("_present_old").isNull(), F.lit("insert"))
        .when(F.col("_present_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out_cols = [F.col(k) for k in keys] + [
        F.coalesce(F.col(f"_dn.{c}"), F.col(f"_do.{c}")).alias(c) for c in cols
    ]
    return joined.withColumn("change_type", change_type).where(
        F.col("change_type").isNotNull()
    ).select(*out_cols, "change_type")
