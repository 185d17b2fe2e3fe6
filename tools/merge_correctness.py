"""Merge per-segment / per-run correctness artifacts into one.

verify_segmented.py stitches within a single invocation, but a gate
that spans invocations (e.g. the sf10 run that survived a round
boundary: 7 preserved segment files from the first launch plus a
fresh-process re-run of the queries that were killed mid-flight)
needs an explicit merge. Later inputs win on overlapping query names,
so pass the authoritative re-run LAST. Counts are recomputed from the
merged map — never trusted from the inputs.

Usage:
  python tools/merge_correctness.py --out CORRECTNESS_SF10_r08.json \
      --note "..." .r8state/seg_*.json .r8state/sf10_remaining.json
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--out", required=True)
    ap.add_argument("--note", default=None)
    args = ap.parse_args()

    queries: dict[str, dict] = {}
    sf_dir = None
    for path in args.inputs:
        with open(path) as f:
            doc = json.load(f)
        sf_dir = doc.get("sf_dir") or sf_dir
        queries.update(doc.get("queries", {}))

    statuses = [v.get("status") for v in queries.values()]
    out = {
        "sf_dir": sf_dir,
        "passed": sum(s == "pass" for s in statuses),
        "failed": sum(s not in ("pass", "rows_only") for s in statuses),
        "rows_only": sum(s == "rows_only" for s in statuses),
        "merged_from": args.inputs,
        "queries": queries,
    }
    if args.note:
        out["note"] = args.note
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{out['passed']} passed, {out['failed']} failed, "
          f"{out['rows_only']} rows-only ({len(queries)} queries) -> {args.out}")
    return 1 if out["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
