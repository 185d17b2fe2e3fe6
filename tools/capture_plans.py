"""Capture .explain("formatted") for benched queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [name ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default
round: r14) for every headline + extended bench query (or just the
named ones). Only the final materialize is skipped — BUILDING a query
can itself run real jobs (bounded probes, and eager localCheckpoints
such as doc_incremental_minhash's corpus-sized band materialization,
ADVICE r13 #3), so runs of this tool do execute work and should not
share the machine with timing runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from clearcare_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or (bench.HEADLINE + bench.EXTENDED)
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-capture")
    queries = entrymod.queries()
    for name in names:
        if name not in queries:
            print(f"skip {name}: not registered")
            continue
        df = queries[name](spark, sf_dir)
        mode_obj = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode_obj)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
