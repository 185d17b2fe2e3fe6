#!/bin/sh
# HISTORICAL RECEIPT (frozen as-run for rounds 9/10): superseded by
# tools/sf10_gate_r12.sh, which derives the runnable set from the
# machine-readable scale-class registry (queries.scale_class) instead
# of the hand-written lists below. Do not reuse this script.
# Round-9 sf10 gate. Preserved from r8 (code + oracle byte-identical,
# checked against the ab779fc tree): charges_rule_counts,
# charges_score, emb_ann_recall, doc_near_dup_clusters. Re-run:
# everything changed this round (emb family) + the two NEW gate
# entries the hash compare unlocks (charges pair) + emb_lsh_recall,
# plus the cheap subset. Spill-heavy oracles run SOLO with a large
# DuckDB cap (r8 lesson); emb_near_dup_pairs (no spill) runs
# concurrently with the cheap segment.
set -x
cd /root/repo
OUT=.r9state
mkdir -p $OUT

nohup env VERIFY_DUCKDB_MEM=40GB VERIFY_DUCKDB_THREADS=6 \
  python tools/verify_local.py --out $OUT/sf10_neardup.json .localdata/sf10 \
  emb_near_dup_pairs > $OUT/sf10_neardup.log 2>&1 &
NDPID=$!

CHEAP="q1_pricing_summary q3_top_revenue_orders q5_regional_revenue q6_forecast_revenue \
running_order_total dedup_order_lines asof_event_order events_sessionization \
doc_minhash_lsh doc_ngram_jaccard emb_cosine_topk \
q21_waiting_suppliers rollup_revenue dq_lineitem_report doc_decontamination \
doc_repetition_stats events_rate_anomaly emb_kmeans_clusters emb_ivf_topk \
fuzzy_linkage_banded doc_lm_perplexity doc_hashed_tf \
doc_tf_cosine_topk part_pagerank"

python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_cheap.json \
  --queries $CHEAP --mem 40GB --threads 6

wait $NDPID

for q in emb_semantic_dedup emb_lsh_recall; do
  VERIFY_DUCKDB_MEM=80GB VERIFY_DUCKDB_THREADS=8 \
    python tools/verify_local.py --out $OUT/sf10_$q.json .localdata/sf10 $q
done

# The charges pair were launched by hand (solo, staggered around the
# semantic-dedup run to respect the one-spill-heavy-oracle-at-a-time
# disk budget), hence the _manual suffix on their committed artifacts;
# the loop below reproduces those runs under the same names (ADVICE r9
# #5: the script previously merged sf10_charges_*.json, names no run
# ever wrote).
for q in charges_cleaned charges_quarantine; do
  VERIFY_DUCKDB_MEM=80GB VERIFY_DUCKDB_THREADS=8 \
    python tools/verify_local.py --out $OUT/sf10_${q}_manual.json .localdata/sf10 $q
done

python tools/merge_correctness.py --out CORRECTNESS_SF10_r09.json \
  --note "r9: 24 cheap re-run + emb family re-run (code changed) + charges pair NEWLY GATED via in-engine hash compare + emb_lsh_recall (new query); 4 entries preserved from CORRECTNESS_SF10_r08 where code and oracle are byte-identical to ab779fc (charges_rule_counts, charges_score, emb_ann_recall, doc_near_dup_clusters)" \
  CORRECTNESS_SF10_r08.json $OUT/sf10_cheap.json $OUT/sf10_neardup.json \
  $OUT/sf10_emb_semantic_dedup.json $OUT/sf10_emb_lsh_recall.json \
  $OUT/sf10_charges_cleaned_manual.json $OUT/sf10_charges_quarantine_manual.json
echo SF10_GATE_DONE
