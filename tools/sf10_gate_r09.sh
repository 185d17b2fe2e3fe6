#!/bin/sh
# Round-9 sf10 gate: the 30-query bench subset + the charges pair
# (newly gated via the in-engine hash compare) + emb_lsh_recall.
# Spill-heavy oracles run SOLO with a large DuckDB cap (r8 lesson:
# concurrent spillers filled the disk); emb_ann_recall (no spill, low
# mem) runs with the cheap segment. Results merge into one artifact.
set -x
cd /root/repo
OUT=.r9state
mkdir -p $OUT

CHEAP="q1_pricing_summary q3_top_revenue_orders q5_regional_revenue q6_forecast_revenue \
running_order_total dedup_order_lines asof_event_order events_sessionization \
doc_minhash_lsh doc_ngram_jaccard emb_cosine_topk emb_near_dup_pairs \
q21_waiting_suppliers rollup_revenue dq_lineitem_report doc_decontamination \
doc_repetition_stats events_rate_anomaly emb_kmeans_clusters emb_ivf_topk \
emb_semantic_dedup fuzzy_linkage_banded doc_lm_perplexity doc_hashed_tf \
doc_tf_cosine_topk part_pagerank emb_lsh_recall"

python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_cheap.json \
  --queries $CHEAP --mem 40GB --threads 8

for q in emb_ann_recall doc_near_dup_clusters charges_rule_counts charges_score \
         charges_cleaned charges_quarantine; do
  VERIFY_DUCKDB_MEM=80GB VERIFY_DUCKDB_THREADS=8 \
    python tools/verify_local.py --out $OUT/sf10_$q.json .localdata/sf10 $q
done

python tools/merge_correctness.py --out CORRECTNESS_SF10_r09.json \
  --note "r9: 30-query subset + charges pair (hash compare) + emb_lsh_recall" \
  $OUT/sf10_cheap.json $OUT/sf10_emb_ann_recall.json $OUT/sf10_doc_near_dup_clusters.json \
  $OUT/sf10_charges_rule_counts.json $OUT/sf10_charges_score.json \
  $OUT/sf10_charges_cleaned.json $OUT/sf10_charges_quarantine.json
