"""Scale-step analysis: per-query wall-time scaling between two bench runs.

VERDICT r5 ask #1: prove the 100 TB design claims empirically — run the
full bench at sf1 (10x the per-round sf0.1) and check every query's
wall-time grows ≤ ~linearly (10x data → ≲15x time; sub-second sf0.1
queries get an absolute floor since their sf1 time is dominated by
fixed scheduling overhead, not data volume).

Usage:
  python tools/scaling_report.py BENCH_small.json BENCH_big.json \
      [--data-ratio 10] [--budget 15] [--floor 2.0] [--out SCALING.md]

Exit 1 if any query above the floor exceeds the scaling budget.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    # bench.py emits TWO JSON lines since r12 (the full record, then a
    # compact tail-truncation-proof one) — take the FIRST, which
    # carries spreads + extended timings; json.load would choke on the
    # concatenation
    with open(path) as f:
        doc = json.loads(f.readline())
    merged = dict(doc.get("queries", {}))
    merged.update(doc.get("extended", {}))
    merged["_derivation_cold"] = doc.get("derivation_cold_sec", 0.0)
    return {"sf": doc.get("sf"), "q": merged, "doc": doc}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument("--budget", type=float, default=15.0,
                    help="max allowed time ratio for a data-ratio step")
    ap.add_argument("--floor", type=float, default=2.0,
                    help="big-run seconds below which a query is overhead-"
                         "dominated and exempt from the ratio test")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    small, big = load(args.small), load(args.big)
    rows = []
    violations = []
    for name, t_big in sorted(big["q"].items()):
        t_small = small["q"].get(name)
        if t_small is None:
            rows.append((name, None, t_big, None, "new"))
            continue
        ratio = t_big / t_small if t_small > 0 else float("inf")
        status = "ok"
        if t_big >= args.floor and ratio > args.budget:
            status = "SUPERLINEAR"
            violations.append(name)
        elif t_big < args.floor:
            status = "overhead-bound"
        rows.append((name, t_small, t_big, ratio, status))

    lines = [
        "# SCALING — sf{} → sf{} ({}x data)".format(
            small["sf"], big["sf"], args.data_ratio),
        "",
        "Budget: a query is flagged when its big-run median exceeds "
        f"{args.floor:.1f}s AND grows more than {args.budget:.0f}x over the "
        f"small run for a {args.data_ratio:.0f}x data step.",
        "",
        "| query | sf{} s | sf{} s | ratio | status |".format(small["sf"], big["sf"]),
        "|---|---|---|---|---|",
    ]
    for name, ts, tb, r, status in rows:
        lines.append("| {} | {} | {:.3f} | {} | {} |".format(
            name,
            "-" if ts is None else f"{ts:.3f}",
            tb,
            "-" if r is None else f"{r:.1f}x",
            status,
        ))
    lines.append("")
    h_small = small["doc"].get("value")
    h_big = big["doc"].get("value")
    if h_small and h_big:
        lines.append(
            f"Headline total: {h_small:.2f}s → {h_big:.2f}s "
            f"({h_big / h_small:.1f}x for {args.data_ratio:.0f}x data)."
        )
    lines.append(
        f"Violations: {len(violations)}"
        + (f" — {', '.join(violations)}" if violations else "")
    )
    text = "\n".join(lines) + "\n"
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
