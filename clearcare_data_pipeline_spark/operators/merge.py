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
