#!/bin/sh
# Segmented sf1 oracle gate (round-6 lessons baked in).
#
# Why segments + a fresh process per segment:
#   * one monolithic run accumulates JVM heap across 136 sf1 queries
#     and eventually slows/die silently;
#   * a DuckDB OutOfMemoryException corrupts the in-process allocator
#     — every later oracle in the same process can fail or segfault —
#     so failures must be retried in a NEW process;
#   * --out per segment means a crash loses at most one segment.
#
# Usage: sh tools/verify_sf1_segmented.sh <sf_dir> [out_prefix]
# Then stitch the partials (later files win) with a small merge, or
# re-run failed queries in a fresh process and merge those on top.
set -e
SF_DIR="${1:?usage: sh tools/verify_sf1_segmented.sh <sf_dir> [out_prefix]}"
PREFIX="${2:-/tmp/sf1_part}"
SEG_SIZE=20

NAMES=$(python -c "
import sys; sys.path.insert(0, '.')
import __spark_entry__ as e
print(' '.join(e.queries()))")
set -- $NAMES
i=0
while [ "$#" -gt 0 ]; do
    BATCH=""
    n=0
    while [ "$#" -gt 0 ] && [ "$n" -lt "$SEG_SIZE" ]; do
        BATCH="$BATCH $1"; shift; n=$((n + 1))
    done
    echo "=== segment $i: $n queries ==="
    # 48GB/6 threads: the sf1 charges + k-means oracles OOM at the
    # 24GB/8-thread defaults even after CTE materialization headroom.
    VERIFY_DUCKDB_MEM="${VERIFY_DUCKDB_MEM:-48GB}" \
    VERIFY_DUCKDB_THREADS="${VERIFY_DUCKDB_THREADS:-6}" \
    python -u tools/verify_local.py --out "${PREFIX}_${i}.json" "$SF_DIR" $BATCH \
        || echo "segment $i exited nonzero — rerun its queries in a fresh process"
    i=$((i + 1))
done
echo "segments done: ${PREFIX}_*.json"
