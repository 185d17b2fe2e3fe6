#!/bin/sh
# HISTORICAL RECEIPT (frozen as-run for rounds 9/10): superseded by
# tools/sf10_gate_r12.sh, which derives the runnable set from the
# machine-readable scale-class registry (queries.scale_class) instead
# of the hand-written lists below. Do not reuse this script.
# Round-10 sf10 gate (VERDICT r9 #1: broaden past the r9 33-query
# subset). Strategy:
#   0. build the oracle-side stage cache (VERDICT r9 #2) — the
#      flagged/cleaned/tagged charges chain materializes ONCE;
#   1. CHEAP segment: every ungated query whose sf1 verify cost was
#      <= ~30 s (oracle shapes that are single-pass at 60M rows),
#      via verify_segmented (fresh process per segment, auto-retry);
#   2. CHARGES segment: the full 12-query charges family through the
#      stage cache — including the 4 already gated in r9, re-run as
#      the cache's speedup receipt;
#   3. MEDIUM queries one-per-process (bigger oracles, still no
#      multi-GB spill expected);
#   4. SOLO spill-heavy/long: emb_ivf_topk_nprobe2 (sf1 543 s),
#      part_name_linkage (sf1 148 s) with the big DuckDB cap;
#   5. merge with the r9 entries preserved where re-running buys no
#      new evidence (expensive emb/doc oracles whose query+oracle
#      code is unchanged on the executed sf10 paths).
# Run steps individually; this script documents the exact commands.
set -ex
cd /root/repo
OUT=.r10state
mkdir -p $OUT

# --- 0: oracle stage cache (solo; ~40 GB headroom for the chain) ----
VERIFY_DUCKDB_MEM=80GB VERIFY_DUCKDB_THREADS=8 \
  python tools/materialize_oracle_stages.py .localdata/sf10 \
  | tee $OUT/stage_cache_build.log
export VERIFY_ORACLE_STAGE_DIR=.localdata/oracle_cache/sf10

# --- 1: cheap segment (concurrent-safe; no spill at 24GB) -----------
# AS RUN: the first launch (cost-DESCENDING order, .r10state/
# sf10_cheap_r10.log) was killed ~100 min in, stuck inside
# doc_simhash_near_dups — whose OUTPUT is quadratic in corpus size
# (1,077 pairs at sf0.01 -> 12,170,121 at sf1, measured; projected
# ~1.2e9 pairs at sf10 from the hamming<=3 near-dup cliques a 30-word
# vocabulary plants). That is an output-cardinality exclusion, not a
# plan defect: the pigeonhole bucket join is keyed, but a pair-LISTING
# query over quadratic cliques has no sub-quadratic answer; the
# scale-correct operator for this corpus is doc_near_dup_clusters
# (cluster assignments, sf10-gated green). The relaunch
# (.r10state/sf10_cheap2_r10.log, cost-ASCENDING, 92 queries = the
# list below minus doc_simhash_near_dups, re-running the 7 that had
# passed in the killed process) is the committed artifact:
# 92/92 passed.
CHEAP="doc_simhash_near_dups extract_wide_canonical doc_stats lineitem_robust_stats \
extract_json_canonical doc_lang_confusion extract_tall_canonical approx_price_quantiles \
charges_synth lineitem_profile order_lines_set_ops trailing_30d_spend nation_revenue_share \
events_value_wma doc_simhash quantity_percentiles orders_above_customer_avg events_in_sessions \
doc_tfidf_top_terms q18_large_orders merge_orders_upsert orders_snapshot_diff \
distinct_parts_per_flag extract_tall_unknown_types q7_nation_volume events_gap_filled \
q10_returned_item_customers events_scd2_versions q9_nation_profit doc_word_cooccurrence \
q16_supplier_part_counts customer_cohort_ltv q8_market_share doc_exact_dedup \
doc_incremental_dedup events_funnel doc_heavy_hitter_words customers_without_orders \
q4_priority_with_late_lines q12_priority_buckets events_first_last_purchase orders_interarrival \
lineitem_stats doc_chunks events_retention q13_order_count_distribution cheapest_supplier_per_part \
events_json_props q14_promo_revenue_ratio q22_idle_rich_customers events_sliding_windows \
events_type_transitions events_new_vs_returning customer_string_features events_user_sample \
q17_small_quantity_revenue events_type_minute_rate grouping_sets_time_revenue doc_dup_groups \
doc_rolling_hash_groups events_tumbling_hourly supplier_revenue_distribution cube_order_status_priority \
events_hourly_top_types pivot_order_status emb_quantization_stats orders_by_month \
doc_sequence_packing slugify_names q20_excess_stock_suppliers payer_name_id_split \
q11_important_parts suppliers_with_heavy_lineitems unpivot_part_metrics q19_disjunctive_revenue \
salted_distinct_suppliers q15_top_supplier doc_source_capped_sample emb_label_centroids \
emb_label_separation explode_part_tokens fuzzy_match_nations zip_extraction \
topk_customers_per_segment customer_only_nations doc_pii_masked doc_lang_source_rollup \
active_nation_keys doc_train_eval_split doc_source_mix emb_norm_stats \
lineitem_price_histogram supplier_ranks"
echo "$CHEAP" | tr ' ' '\n' | grep -v '^$' | grep -v doc_simhash_near_dups | tac > /tmp/cheap_list2.txt
python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_cheap2_r10.json \
  --queries $(tr '\n' ' ' < /tmp/cheap_list2.txt) --mem 24GB --threads 6 --seg-size 12

# --- 2: charges family through the stage cache ----------------------
CHARGES="charges_cleaned charges_quarantine charges_rules_tagged charges_rule_counts \
charges_score charges_field_presence charges_code_type_histogram charges_unknown_code_types \
charges_modifier_counts charges_code_type_mappings"
python tools/verify_segmented.py .localdata/sf10 --out $OUT/sf10_charges_r10.json \
  --queries $CHARGES --mem 60GB --threads 8 --seg-size 10

# --- 3: medium one-per-process --------------------------------------
# running_order_total is already r9-gated (pandas path, 523 s of
# driver materialization) — re-run for the VERDICT r9 #4 receipt:
# 15M rows through the in-engine hash path, zero materialization.
for q in doc_training_selection approx_distinct_parts emb_lsh_buckets running_order_total; do
  VERIFY_DUCKDB_MEM=60GB VERIFY_DUCKDB_THREADS=8 \
    python tools/verify_local.py --out $OUT/sf10_$q.json .localdata/sf10 $q
done

# --- 4: solo long runs ----------------------------------------------
# AS RUN: part_name_linkage was launched, then killed ~75 min in and
# EXCLUDED with the same output-cardinality receipt as
# doc_simhash_near_dups: its pair-listing output grows 1,398 rows
# (sf0.01) -> 14,061,705 rows (sf1, measured in CORRECTNESS_SF1_r09)
# -> ~1.4e9 projected at sf10 — the 64 distinct p_name values form
# linkage cliques, so listing pairs is inherently quadratic. The
# scale-correct top-1 form (fuzzy_linkage_banded) is sf10-gated green.
for q in emb_ivf_topk_nprobe2; do
  VERIFY_DUCKDB_MEM=60GB VERIFY_DUCKDB_THREADS=8 \
    python tools/verify_local.py --out $OUT/sf10_$q.json .localdata/sf10 $q
done

# --- 5: merge --------------------------------------------------------
python tools/merge_correctness.py --out CORRECTNESS_SF10_r10.json \
  --note "r10: 92 cheap + 10 charges (through the oracle stage cache, incl. the r9-gated 4 re-run as the cache speedup receipt) + running_order_total re-run via the hash path (VERDICT r9 #4 receipt) + 5 medium/solo run fresh on HEAD; 29 entries preserved from CORRECTNESS_SF10_r09 where the executed sf10 code paths and oracles are unchanged on HEAD (the r10 similarity.py edits touch only the flat branch, corpus<=65,536 — sf10 takes the prefix ladder — and the n_bands>1 delegation no sf10-gated query calls; emb_lsh_recall calls lsh_banded_pairs directly). EXCLUDED with receipts, both for quadratic OUTPUT cardinality (pair listings over planted cliques), not plan defects: doc_simhash_near_dups (1,077 rows sf0.01 -> 12,170,121 sf1, ~1.2e9 projected sf10; cluster-assignment form doc_near_dup_clusters gated green) and part_name_linkage (1,398 rows sf0.01 -> 14,061,705 sf1, ~1.4e9 projected sf10; top-1 form fuzzy_linkage_banded gated green)" \
  CORRECTNESS_SF10_r09.json $OUT/sf10_cheap2_r10.json $OUT/sf10_charges_r10.json \
  $OUT/sf10_doc_training_selection.json $OUT/sf10_approx_distinct_parts.json \
  $OUT/sf10_emb_lsh_buckets.json $OUT/sf10_running_order_total.json \
  $OUT/sf10_emb_ivf_topk_nprobe2.json
echo SF10_GATE_R10_DONE
