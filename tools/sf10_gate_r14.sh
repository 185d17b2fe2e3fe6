#!/bin/sh
# sf10 gate, round 14. The r14 tree's closure hashes are ALL stale vs
# CORRECTNESS_SF10_r13.json (that artifact belongs to pre-optimization
# commit bd13c16, and r13-opt + r14 touched modules in every query's
# closure, tables.py included), so this gate is a FRESH run ordered
# cost-ascending from the r13 per-query seconds. The quadratic-output
# listings are excluded via the scale-class registry as always. The
# O(n^2)-oracle emb family runs LAST in solo segments so a wall-budget
# cutoff loses only the most expensive tail, never the bulk; whatever
# does not complete is merged per tools/merge_correctness.py rules
# (waiver only where the executed plan provably didn't change since
# the entry's tree — see OPTIMIZATION_r14.md).
set -e
OUT=.r14state
mkdir -p $OUT
export VERIFY_ORACLE_STAGE_DIR=.localdata/oracle_cache/sf10

python - <<'PY'
import json, sys
sys.path.insert(0, ".")
from clearcare_data_pipeline_spark.queries import runnable_queries
doc = json.load(open("CORRECTNESS_SF10_r13.json"))
qs = doc["queries"] if "queries" in doc else doc
runnable = runnable_queries({"quadratic_listing"})
sec = {n: qs.get(n, {}).get("sec", 30.0) for n in runnable}
expensive = {"emb_lsh_buckets", "emb_lsh_recall", "emb_near_dup_pairs",
             "emb_ivf_topk", "emb_ivf_topk_nprobe2", "emb_ann_recall"}
bulk = sorted((n for n in runnable if n not in expensive), key=lambda n: sec[n])
solo = sorted((n for n in runnable if n in expensive), key=lambda n: sec[n])
json.dump({"bulk": bulk, "solo": solo}, open(".r14state/sf10_sets.json", "w"))
print(f"bulk {len(bulk)} (est {sum(sec[n] for n in bulk):.0f}s on the r13 box), solo: {solo}")
PY

BULK=$(python -c "import json; print(' '.join(json.load(open('.r14state/sf10_sets.json'))['bulk']))")

python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_bulk_r14.json \
  --queries $BULK --mem 24GB --threads 6 --seg-size 12

echo SF10_BULK_DONE
