#!/bin/sh
# End-of-round artifact refresh checklist. Run from the repo root with
# the round number:
#
#   sh tools/round_close.sh 5
#
# Produces/refreshes, in order:
#   1. green pytest suite                 (correctness of non-relational adapters)
#   2. CORRECTNESS_LOCAL_r{N}.json        (all queries vs DuckDB oracles, sf0.01)
#   3. PLAN_AUDIT.md                      (physical-plan audit, exits nonzero on violations)
#   4. BENCH_local_r{N}.json              (informal local bench; the driver records
#                                          the official BENCH_r{N}.json itself)
#
# Each step fails the script so a red artifact never silently ships.
set -e
N="${1:?usage: sh tools/round_close.sh <round-number>}"
R=$(printf 'r%02d' "$N")

python -m pytest tests/ -q
python tools/verify_local.py --out "CORRECTNESS_LOCAL_${R}.json" /root/testdata/sf0.01
python tools/plan_audit.py /root/testdata/sf0.01
python bench.py > "BENCH_local_${R}.json"
echo "round ${N} artifacts refreshed: CORRECTNESS_LOCAL_${R}.json PLAN_AUDIT.md BENCH_local_${R}.json"
