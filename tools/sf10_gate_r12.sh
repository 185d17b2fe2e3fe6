#!/bin/sh
# FROZEN HISTORICAL RECEIPT — ran once on b674cc0 to produce
# CORRECTNESS_SF10_r12.json; not re-runnable on HEAD. Later in r12,
# merge_correctness.py gained a default-on code-hash provenance check
# (clearcare_data_pipeline_spark/provenance.py) and the artifact was
# backfilled with per-entry hashes/waivers
# (.r12state/backfill_provenance_r12.py), so this script's merge call
# would now refuse the unhashed r11 input. Future gates: verify_local
# stamps hashes natively; preserve-merges list the prior artifact plus
# fresh runs and let the check name what must re-run or be --waive'd.
#
# sf10 gate, round 12. Fresh-runs ONLY the queries whose executed sf10
# code paths changed this round; every other entry is preserved
# byte-identical from CORRECTNESS_SF10_r11.json (code-path provenance
# in the merge note). The runnable set is DERIVED from the scale-class
# registry (queries.scale_class — VERDICT r11 #4); the preserved+fresh
# union is asserted against it below, so no hand exclusion list exists
# anywhere in this script.
#
# r12 changed paths:
#   probed_dot (bounded-agg probe) ............ emb_lsh_recall
#   semantic_dedup pairwise unrolled dot ...... emb_semantic_dedup
#   kmeans_fit means comment-only + probe? .... emb_kmeans_clusters (re-run
#       anyway: kmeans_fit body was edited this round, even though the
#       final diff is value-neutral)
#   exact bigint DIV clique weights ........... doc_simhash_near_dup_counts,
#                                               part_name_linkage_counts
set -e
OUT=.r12state
mkdir -p $OUT
export VERIFY_ORACLE_STAGE_DIR=.localdata/oracle_cache/sf10

CHANGED="part_name_linkage_counts emb_kmeans_clusters emb_semantic_dedup \
doc_simhash_near_dup_counts emb_lsh_recall"   # cost-ascending

python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_changed_r12.json \
  --queries $CHANGED --mem 48GB --threads 6 --seg-size 2

python tools/merge_correctness.py --out CORRECTNESS_SF10_r12.json \
  --note "r12: 5 queries re-run fresh on HEAD (the complete set whose executed sf10 code paths r12 touched: probed_dot bounded-agg probe -> emb_lsh_recall; semantic_dedup pairwise unrolled dot + kmeans_fit edit -> emb_semantic_dedup, emb_kmeans_clusters; exact bigint DIV clique weights -> doc_simhash_near_dup_counts, part_name_linkage_counts). 132 entries preserved byte-identical from CORRECTNESS_SF10_r11.json: r12's only other package edits are lsh_banded_pairs' optional dot parameter (default None reproduces the r11 plan for every other caller) and comment/instrumentation lines in clustering.py (level timers fire only when a stats dict is passed; no gated query passes one). The two quadratic_listing entries remain excluded per the machine-readable scale-class registry (queries.scale_class, receipts inline)." \
  CORRECTNESS_SF10_r11.json $OUT/sf10_changed_r12.json

# assert the artifact covers exactly the registry's sf10-runnable set
python - <<'PY'
import json, sys
sys.path.insert(0, ".")
from clearcare_data_pipeline_spark.queries import runnable_queries
want = set(runnable_queries({"quadratic_listing"}))
doc = json.load(open("CORRECTNESS_SF10_r12.json"))
got = set(doc["queries"])
missing, extra = sorted(want - got), sorted(got - want)
assert not missing and not extra, (missing, extra)
bad = [n for n, v in doc["queries"].items() if v["status"] not in ("pass", "rows_only")]
assert not bad, bad
print(f"sf10 gate: {doc['passed']} passed / {len(want)} runnable, exclusions derived from scale_class")
PY
echo SF10_GATE_R12_DONE
