#!/bin/sh
# sf10 gate, round 13. The r13 _textsql refactor + trim() oracle fix
# touched the closure of most query modules, so this round is mostly
# FRESH: every hash-stale entry re-runs (84), plus the two new r13
# queries, plus 5 cheap emb entries whose r12 preservation rested on
# waivers (burned per VERDICT r13 ask #2), plus emb_ann_recall run
# solo in a separate process (the single biggest r12 waiver, ~88 min
# oracle). The 4 remaining expensive emb entries (ivf pair, lsh
# buckets, near_dup_pairs; ~4.2 h of O(n^2) oracle compute) are NOT
# waived this round: their closures are hash-IDENTICAL on the r13
# tree, so the merge classifies them as matched — the r12 waiver text
# remains in the entries as history. Exclusions still derive from the
# scale-class registry; no hand list.
set -e
OUT=.r13state
mkdir -p $OUT
export VERIFY_ORACLE_STAGE_DIR=.localdata/oracle_cache/sf10

python - <<'PY'
import json, sys
sys.path.insert(0, ".")
from clearcare_data_pipeline_spark.provenance import query_code_hashes
from clearcare_data_pipeline_spark.queries import runnable_queries
doc = json.load(open("CORRECTNESS_SF10_r12.json"))
runnable = runnable_queries({"quadratic_listing"})
current = query_code_hashes(runnable)
burn = {"emb_cosine_topk", "emb_label_centroids", "emb_label_separation",
        "emb_norm_stats", "emb_quantization_stats"}
fresh = [n for n in runnable
         if n != "emb_ann_recall"
         and (n not in doc["queries"]
              or doc["queries"][n].get("code_hash") != current[n]
              or n in burn)]
sec = {n: doc["queries"].get(n, {}).get("sec", 30.0) for n in runnable}
fresh.sort(key=lambda n: sec.get(n, 30.0))          # cost-ascending
solo = [n for n in fresh if sec.get(n, 0) > 300] + \
       [n for n in ("doc_dup_span_trimmed",) if n in fresh]
solo = list(dict.fromkeys(solo))
bulk = [n for n in fresh if n not in solo]
json.dump({"bulk": bulk, "solo": solo}, open(".r13state/sf10_fresh.json", "w"))
print(f"bulk {len(bulk)}, solo {len(solo)}: {solo}")
PY

BULK=$(python -c "import json; print(' '.join(json.load(open('.r13state/sf10_fresh.json'))['bulk']))")
SOLO=$(python -c "import json; print(' '.join(json.load(open('.r13state/sf10_fresh.json'))['solo']))")

python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_bulk_r13.json \
  --queries $BULK --mem 24GB --threads 6 --seg-size 12

python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_solo_r13.json \
  --queries $SOLO --mem 80GB --threads 6 --seg-size 1

echo SF10_FRESH_RUNS_DONE
