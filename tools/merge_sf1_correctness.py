"""Merge partial sf1 verify artifacts into CORRECTNESS_SF1_r06.json.

The sf1 verification ran in segments (the harness's per-query DuckDB
connection fix and driver maxResultSize fix landed mid-run); this
stitches the per-segment results — later runs win — and writes the
summary artifact.

Usage: python tools/merge_sf1_correctness.py partial.json redo.json out.json
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    partial, redo, out = sys.argv[1], sys.argv[2], sys.argv[3]
    results = json.load(open(partial))
    if isinstance(results, dict) and "queries" in results:
        results = results["queries"]
    redo_doc = json.load(open(redo))
    results.update(redo_doc.get("queries", redo_doc))
    statuses = [v["status"] for v in results.values()]
    doc = {
        "sf_dir": ".localdata/sf1",
        "passed": statuses.count("pass"),
        "failed": statuses.count("fail"),
        "rows_only": statuses.count("rows_only"),
        "queries": results,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{doc['passed']} passed, {doc['failed']} failed, "
          f"{doc['rows_only']} rows-only -> {out}")
    for name, v in results.items():
        if v["status"] == "fail":
            print(f"  FAIL {name}: {v.get('err', '')[:120]}")
    return 1 if doc["failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
