"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings
are the ones we would ship as cluster defaults (AQE on, skew-join
handling on, Arrow on, UTC session time zone so results are
timezone-stable and comparable against UTC-naive engines like DuckDB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_heap_gib() -> int:
    """Driver -Xmx in GiB: 1 per local core, floor 8, clamped to half
    of physical RAM (ADVICE r7 #3: on a high-core/low-RAM host, e.g.
    96 cores / 64 GB, the unclamped max(8, cpu_count) let the heap
    grow past physical memory and the OS OOM-killer took the JVM where
    the old 8g cap would merely have spilled). SPARK_DRIVER_MEMORY
    still overrides everything."""
    cores = max(8, os.cpu_count() or 8)
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    mem_gib = int(line.split()[1]) // (1024 * 1024)
                    break
            else:
                return cores
    except OSError:
        return cores
    return max(2, min(cores, mem_gib // 2))


def get_spark(app_name: str = "clearcare-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    ``shuffle_partitions`` defaults to the local core count: at local
    test scale one partition per core avoids over-parallelizing tiny
    shuffles; on a real cluster this is overridden (or left to AQE
    coalescing, which is enabled).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = os.cpu_count() or 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Local mode runs driver AND all executor threads in ONE JVM,
        # so the heap scales with the thread count: 1 GiB per local
        # core, floor 8g, clamped to half of physical RAM (see
        # _default_heap_gib). -Xmx is a cap, not a reservation, so small
        # runs pay nothing; sf10-sized runs (60M-row shuffles + pinned
        # broadcast codebooks across 32 threads) get headroom instead
        # of spilling. (An earlier note here blamed GC churn for 4-6x
        # sf1 bench outliers; -Xlog:gc* later exonerated GC — the
        # outliers were a leftover JVM from a killed run competing for
        # cores, now guarded against in bench.py. A/B at sf1 measured
        # 8g vs 32g as a wash on a quiet machine.) On a real cluster
        # the driver carries no executor threads and deployments
        # override this knob (SPARK_DRIVER_MEMORY).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", f"{_default_heap_gib()}g"),
        )
        # The verify harness collects multi-million-row results via
        # toPandas; the 1g default aborts a >1 GiB collect at sf1 (and
        # the severed Arrow stream then surfaces as confusing
        # ArrowMemoryErrors on later queries).
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_DRIVER_MAX_RESULT_SIZE", "8g"),
        )
        .config("spark.ui.enabled", "false")
        # Parquet scans: 128 MiB split targets keep partitions
        # executor-memory-safe at large SF while remaining the right
        # granularity for local[32] over small files.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    return builder.getOrCreate()
