"""Streaming upsert sink: foreachBatch + MERGE + snapshot commits.

Structured Streaming has no built-in keyed-upsert file sink, so this
implements the standard pattern: each micro-batch MERGEs (operators/
merge.py) into the current table snapshot and commits a NEW snapshot
directory, then atomically swings a pointer file — a minimal version
of the Delta/Iceberg commit protocol (write-new, atomic pointer swap,
never mutate a live file). Readers resolve the pointer and only ever
see a fully-written snapshot.

Scale notes: the per-batch cost is one keyed full-outer join
(co-locatable, broadcastable when the batch is small relative to the
table) plus a full snapshot rewrite. Snapshot rewrite is the honest
cost of upsert-on-parquet without a table format; a production
deployment bounds it by partitioning the snapshot on a key prefix and
rewriting only partitions containing touched keys. foreachBatch gives
exactly-once table state under retries because replays are detected
and skipped: the pointer file is the commit log, and a batch whose
snapshot the pointer already names (crash after pointer swap, before
Spark's checkpoint commit) is a no-op on replay — see
``_batch_already_applied``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from clearcare_data_pipeline_spark.operators.merge import merge_upsert

_POINTER = "_CURRENT"


def read_merge_target(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """Resolve the pointer file to the live snapshot; None before the
    first commit."""
    pointer = os.path.join(target_dir, _POINTER)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as fh:
        snap = fh.read().strip()
    return spark.read.parquet(os.path.join(target_dir, snap))


def _commit_snapshot(target_dir: str, snap_name: str) -> None:
    pointer = os.path.join(target_dir, _POINTER)
    tmp = pointer + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(snap_name)
    os.replace(tmp, pointer)  # atomic on POSIX


def _batch_already_applied(target_dir: str, snap_name: str) -> bool:
    """True when the pointer already names this batch's snapshot (or a
    later one — zero-padded names compare in commit order).

    This is the replay guard that makes foreachBatch exactly-once: a
    crash between the pointer swap and Spark's checkpoint commit makes
    Spark re-run the batch, and without the guard the replay would
    resolve ``read_merge_target`` to ``snap_{batch_id}`` and then
    ``overwrite`` the very directory it is lazily reading (Spark
    refuses: "Cannot overwrite a path that is also being read from" —
    wedging the query) or, for the incremental agg, double-add the
    batch. The pointer IS the table's commit log, so pointer >= batch
    means the batch's effects are fully visible and replay must be a
    no-op."""
    pointer = os.path.join(target_dir, _POINTER)
    if not os.path.exists(pointer):
        return False
    with open(pointer) as fh:
        current = fh.read().strip()
    return current >= snap_name


def stream_merge_sink(
    stream_df: DataFrame,
    target_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    order_col: str | None = None,
    delete_col: str | None = None,
) -> StreamingQuery:
    """Start an availableNow streaming query that upserts each
    micro-batch into the snapshot table at ``target_dir``.

    ``order_col``: within-batch last-wins ordering (e.g. an event
    timestamp); without it the batch must already be unique per key.
    ``delete_col``: boolean tombstone column — a key whose winning row
    has it TRUE is REMOVED from the table (full CRUD CDC: insert /
    update / delete), and the column itself never lands in the table.
    """

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snap_name = f"snap_{batch_id:012d}"
        if _batch_already_applied(target_dir, snap_name):
            return  # replay of a committed batch — effects already live
        updates = batch_df
        if order_col is not None:
            others = [c for c in updates.columns if c not in keys]
            updates = (
                updates.groupBy(*keys)
                .agg(*[F.max_by(c, order_col).alias(c) for c in others])
                .select(*batch_df.columns)
            )
        tombstones = None
        if delete_col is not None:
            tombstones = updates.where(F.col(delete_col)).select(*keys)
            updates = updates.where(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        target = read_merge_target(spark, target_dir)
        merged = updates if target is None else merge_upsert(target, updates, keys)
        if tombstones is not None:
            merged = merged.join(tombstones, keys, "left_anti")
        merged.write.mode("overwrite").parquet(os.path.join(target_dir, snap_name))
        _commit_snapshot(target_dir, snap_name)

    os.makedirs(target_dir, exist_ok=True)
    return (
        stream_df.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def list_snapshots(target_dir: str) -> list[str]:
    """Committed snapshot names, oldest first (commit order == name
    order by construction)."""
    if not os.path.isdir(target_dir):
        return []
    return sorted(d for d in os.listdir(target_dir) if d.startswith("snap_"))


def read_snapshot(spark: SparkSession, target_dir: str, snapshot: str) -> DataFrame:
    """Time travel: read a specific committed snapshot by name."""
    return spark.read.parquet(os.path.join(target_dir, snapshot))


def vacuum_snapshots(target_dir: str, keep_last: int = 2) -> list[str]:
    """Drop all but the newest ``keep_last`` snapshots (never the one
    the pointer references). Returns the names removed. The pointer is
    read AFTER computing the candidate list so a concurrent commit can
    only rescue a snapshot, not lose one."""
    import shutil

    snaps = list_snapshots(target_dir)
    candidates = snaps[:-keep_last] if keep_last > 0 else snaps
    pointer = os.path.join(target_dir, _POINTER)
    current = None
    if os.path.exists(pointer):
        with open(pointer) as fh:
            current = fh.read().strip()
    removed = []
    for name in candidates:
        if name == current:
            continue
        shutil.rmtree(os.path.join(target_dir, name))
        removed.append(name)
    return removed


def stream_incremental_agg(
    stream_df: DataFrame,
    target_dir: str,
    keys: list[str],
    checkpoint_dir: str,
    value_col: str = "value",
) -> StreamingQuery:
    """Incrementally-maintained aggregate table (count + sum per key):
    each micro-batch computes its partial aggregate and ADDS it into
    the snapshot via a keyed full-outer join — the materialized-view
    maintenance pattern, on the same snapshot/pointer commit protocol
    as stream_merge_sink. Unlike outputMode('complete') windowed
    state, table size is unbounded by watermark because the state IS
    the table; per-batch cost is the partial agg + a join against the
    current snapshot."""

    def _add_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snap_name = f"snap_{batch_id:012d}"
        if _batch_already_applied(target_dir, snap_name):
            return  # replay of a committed batch — already added
        part = batch_df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(25,4)")).alias("total"),
        )
        cur = read_merge_target(spark, target_dir)
        if cur is None:
            merged = part
        else:
            c = cur.select(
                *keys, F.col("n").alias("_n0"), F.col("total").cast("decimal(25,4)").alias("_t0")
            )
            merged = (
                c.join(part, keys, "full_outer")
                .select(
                    *keys,
                    (F.coalesce("_n0", F.lit(0)) + F.coalesce("n", F.lit(0))).alias("n"),
                    (
                        F.coalesce(F.col("_t0"), F.lit(0).cast("decimal(25,4)"))
                        + F.coalesce(F.col("total"), F.lit(0).cast("decimal(25,4)"))
                    ).alias("total"),
                )
            )
        merged.write.mode("overwrite").parquet(os.path.join(target_dir, snap_name))
        _commit_snapshot(target_dir, snap_name)

    os.makedirs(target_dir, exist_ok=True)
    return (
        stream_df.writeStream.foreachBatch(_add_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
