#!/bin/sh
# Remaining sf10 gate queries, one fresh process each (the segmented
# discipline), cheap-first so a long tail can't starve the rest.
# Runs from the isolated code snapshot; artifacts land in .r8state/.
cd /tmp/r8verify || exit 1
export VERIFY_DUCKDB_MEM=75GB
export VERIFY_DUCKDB_THREADS=16
for q in asof_event_order fuzzy_linkage_banded doc_lm_perplexity \
         part_pagerank doc_hashed_tf doc_tf_cosine_topk \
         doc_near_dup_clusters emb_semantic_dedup; do
  echo "=== $q ==="
  python -u tools/verify_local.py --out "/root/repo/.r8state/r8q_${q}.json" \
      /root/repo/.localdata/sf10 "$q" || echo "(exit $? for $q)"
done
echo ALL-REMAINING-DONE
