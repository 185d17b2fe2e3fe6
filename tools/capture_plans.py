"""Capture .explain("formatted") for benched queries into plans/r13/.

Usage: python tools/capture_plans.py <suffix> [sf_dir] [name ...]

Writes plans/r13/<query>_<suffix>.txt for every headline + extended
bench query (or just the named ones). Plans are built, never executed,
so this is safe to run alongside other work.
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
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
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
