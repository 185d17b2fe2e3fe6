"""One-time provenance backfill for the round-12 gate artifacts.

From r12 on, verify_local stamps every correctness entry with
``code_hash`` (clearcare_data_pipeline_spark/provenance.py) and
tools/merge_correctness.py refuses to preserve hash-stale entries.
The three r12 gate artifacts predate the stamping, so this script
backfills them — with the same honesty rules the merge tool enforces:

* CORRECTNESS_LOCAL_r12.json / CORRECTNESS_SF1_r12.json: FULL fresh
  runs at 454a095, whose package tree is byte-identical to HEAD
  (asserted below per closure file) -> clean current-hash stamps.
* CORRECTNESS_SF10_r12.json: 5 entries ran fresh on b674cc0
  (package-identical to HEAD, asserted) -> clean stamps. The other
  132 were preserved from CORRECTNESS_SF10_r11.json, i.e. they ran on
  24fb1e7 (r11 final HEAD, judge-verified green). For each of those,
  this script diffs the entry's CURRENT closure modules across
  24fb1e7..HEAD: unchanged closure -> clean stamp; changed closure ->
  stamp plus a per-entry ``provenance_waiver`` derived from the
  module-level argument the r12 gate note made in prose (each
  argument names the diff a reviewer can hold it against). A changed
  module with no argument in the map below is a hard error — no
  silent waivers.

Run once from the repo root; edits the artifacts in place.
"""

from __future__ import annotations

import json
import subprocess
import sys

sys.path.insert(0, ".")

from clearcare_data_pipeline_spark import provenance as P  # noqa: E402
from clearcare_data_pipeline_spark.queries import all_queries  # noqa: E402

R11_HEAD = "24fb1e7"          # ran-on commit for the sf10 preserved entries
FRESH_SF10 = {                # re-run fresh on b674cc0 (sf10_gate_r12.sh)
    "part_name_linkage_counts", "emb_kmeans_clusters", "emb_semantic_dedup",
    "doc_simhash_near_dup_counts", "emb_lsh_recall",
}

# Why each module that changed 24fb1e7..HEAD leaves the preserved
# entries' executed sf10 plans untouched (the r12 gate note, held
# per-module so it can be attached per-entry). Verify each against
# `git diff 24fb1e7..HEAD -- <module>`.
WAIVER_ARGS = {
    "clearcare_data_pipeline_spark.operators.similarity": (
        "probed_dot's probe became a deterministic bounded agg (perf-only "
        "path pick; per-row guard keeps results identical) and "
        "lsh_banded_pairs gained an optional dot= param whose default None "
        "reproduces the r11 plan; the two sf10 consumers whose executed "
        "plans DID change (emb_lsh_recall, emb_semantic_dedup) were re-run "
        "fresh on HEAD"
    ),
    "clearcare_data_pipeline_spark.operators.clustering": (
        "module-top measurement comment, kmeans_fit comment reword, "
        "stats-gated level timers (no gated query passes stats), and "
        "semantic_dedup's within-cluster scorer swap; emb_semantic_dedup "
        "and emb_kmeans_clusters were re-run fresh on HEAD, and no other "
        "gated query executes the changed lines"
    ),
    "clearcare_data_pipeline_spark.queries.relational": (
        "edit confined to q_part_name_linkage_counts' body (exact bigint "
        "DIV clique weight), which was re-run fresh on HEAD"
    ),
    "clearcare_data_pipeline_spark.queries.similarity": (
        "edit confined to q_emb_lsh_recall's body (thread the probed dot "
        "into lsh_banded_pairs), which was re-run fresh on HEAD"
    ),
    "clearcare_data_pipeline_spark.queries.textops": (
        "edit confined to q_doc_simhash_near_dup_counts' body (exact "
        "bigint DIV clique weight), which was re-run fresh on HEAD"
    ),
}


def sh(*args: str) -> str:
    return subprocess.run(args, capture_output=True, text=True, check=True).stdout


def changed_since(commit: str, path: str) -> bool:
    committed = subprocess.run(
        ["git", "diff", "--quiet", commit, "HEAD", "--", path]
    ).returncode != 0
    dirty = bool(sh("git", "status", "--porcelain", "--", path).strip())
    return committed or dirty


def main() -> int:
    registry = all_queries()
    hashes = P.query_code_hashes()
    head = sh("git", "rev-parse", "HEAD").strip()

    # tracked closure files must be byte-identical to HEAD (untracked
    # additions like provenance.py itself don't enter any closure)
    closure_files = {
        P.module_path(m)
        for n in registry
        for m in P.import_closure(registry[n].__module__)
    }
    for f in sorted(closure_files):
        assert not bool(sh("git", "status", "--porcelain", "--", f).strip()), (
            f"dirty closure file {f}: backfill hashes would not be "
            "reproducible from HEAD"
        )
    # the fresh runs' package trees must equal HEAD's (LOCAL+SF1 ran on
    # 454a095, the sf10 fresh five on b674cc0)
    for gate_commit in ("454a095", "b674cc0"):
        assert subprocess.run(
            ["git", "diff", "--quiet", gate_commit, "HEAD", "--",
             "clearcare_data_pipeline_spark", "__spark_entry__.py"]
        ).returncode == 0, f"package tree changed since {gate_commit}"

    fresh_note = {
        "CORRECTNESS_LOCAL_r12.json": "full fresh run, package tree identical to HEAD",
        "CORRECTNESS_SF1_r12.json": "full fresh run, package tree identical to HEAD",
    }
    for path, why in fresh_note.items():
        doc = json.load(open(path))
        for name, entry in doc["queries"].items():
            entry["code_hash"] = hashes[name]
        doc["provenance"] = {"backfilled_at": head, "note": why}
        json.dump(doc, open(path, "w"), indent=1)
        print(f"{path}: {len(doc['queries'])} clean stamps")

    path = "CORRECTNESS_SF10_r12.json"
    doc = json.load(open(path))
    clean = waived = 0
    for name, entry in doc["queries"].items():
        entry["code_hash"] = hashes[name]
        if name in FRESH_SF10:
            clean += 1
            continue
        changed = [
            m for m in P.import_closure(registry[name].__module__)
            if changed_since(R11_HEAD, P.module_path(m))
        ]
        if not changed:
            clean += 1
            continue
        missing = [m for m in changed if m not in WAIVER_ARGS]
        assert not missing, f"{name}: changed modules with no argument: {missing}"
        entry["provenance_waiver"] = (
            f"backfilled r12: preserved from CORRECTNESS_SF10_r11.json "
            f"(ran on {R11_HEAD}); closure changed {R11_HEAD}..HEAD in "
            + "; ".join(f"{m.rsplit('.', 1)[-1]}: {WAIVER_ARGS[m]}" for m in changed)
        )
        waived += 1
    doc["provenance"] = {
        "backfilled_at": head,
        "note": (
            "5 fresh entries ran on b674cc0 (package-identical to HEAD); "
            "132 preserved from r11 with per-entry closure diffs vs "
            f"{R11_HEAD} — unchanged closures stamped clean, changed ones "
            "carry the r12 gate note's argument as provenance_waiver"
        ),
    }
    json.dump(doc, open(path, "w"), indent=1)
    print(f"{path}: {clean} clean stamps, {waived} waived (closure changed, "
          "argument attached)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
