"""Build the oracle-side stage cache (VERDICT r9 #2).

Runs each shared oracle stage's CANONICAL self-contained SQL once over
the given sf_dir's parquet tables and writes
``<dir>/<name>-<key12>.parquet`` (key12 = md5 of the SQL text). With
``VERIFY_ORACLE_STAGE_DIR`` pointed at that directory, the oracle CTE
builders in queries/_oracle_expr.py splice in a read_parquet of the
keyed path, so every charges consumer in a gate run reuses ONE
derivation instead of re-running the ~1,800 s (sf10) chain each.

The tagged stage is built FROM the cleaned stage's parquet (exactly
the composition the cached consumers use), so the cache itself costs
one full chain plus one cheap predicate pass.

Usage:
  python tools/materialize_oracle_stages.py .localdata/sf10 \
      [--dir .localdata/oracle_cache/sf10] [--mem 80GB] [--threads 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, ".")

from clearcare_data_pipeline_spark.queries import _oracle_expr as oe  # noqa: E402
from clearcare_data_pipeline_spark.schema import TESTDATA_TABLES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--dir", default=None,
                    help="cache dir (default <sf_dir>/../oracle_cache/<sf name>)")
    ap.add_argument("--mem", default=os.environ.get("VERIFY_DUCKDB_MEM", "48GB"))
    ap.add_argument("--threads", default=os.environ.get("VERIFY_DUCKDB_THREADS", "8"))
    ap.add_argument("--adopt-existing", action="store_true",
                    help="write SOURCE.json for an existing cache whose "
                    "provenance you can vouch for (stage files present, "
                    "built from this sf_dir); no stages are rebuilt. "
                    "OVERWRITES a mismatching marker with a loud warning "
                    "— you are asserting the stage files themselves match "
                    "the current sf_dir, not just re-binding stale stages")
    args = ap.parse_args()

    if os.environ.get(oe.ORACLE_STAGE_ENV):
        # the builder must compose CANONICAL SQL, never cache-backed SQL
        print(f"refusing to run with {oe.ORACLE_STAGE_ENV} set")
        return 2

    sf_dir = args.sf_dir.rstrip("/")
    cache = args.dir or os.path.join(
        os.path.dirname(sf_dir), "oracle_cache", os.path.basename(sf_dir)
    )
    os.makedirs(cache, exist_ok=True)

    # ADVICE r10 #1: bind the cache to its source data. A marker that
    # disagrees with the current sf_dir means the parquet was
    # regenerated since the stages were built — the SQL keys would
    # still "hit", silently serving stale rows, so refuse instead.
    marker = os.path.join(cache, oe.STAGE_MARKER)
    have_stages = any(f.endswith(".parquet") for f in os.listdir(cache))
    if os.path.exists(marker) and not args.adopt_existing:
        oe.check_stage_marker(cache, sf_dir)
    elif os.path.exists(marker) and args.adopt_existing:
        # ADVICE r11 #4: --adopt-existing previously hard-errored on a
        # mismatching marker, so a cache could never be re-bound after
        # intentional data regeneration without hand-deleting the
        # marker. The flag is an operator attestation, so honor it —
        # but LOUDLY, because re-binding stale stage files to fresh
        # data is exactly the silent-wrong-rows hazard the marker
        # exists to stop.
        try:
            oe.check_stage_marker(cache, sf_dir)
        except ValueError:
            print(
                "WARNING: existing SOURCE.json does NOT match the "
                f"current {sf_dir}; --adopt-existing will overwrite it. "
                "You are attesting the stage parquet files were built "
                "from the CURRENT data — if the data was regenerated "
                "but the stages were not, delete the cache and rebuild "
                "instead."
            )
    elif have_stages and not args.adopt_existing:
        print(
            f"{cache} has stage parquet but no {oe.STAGE_MARKER}; "
            "delete the cache and rebuild, or re-run with "
            "--adopt-existing if you can vouch these stages were "
            f"built from {sf_dir}"
        )
        return 2
    if args.adopt_existing:
        oe.write_stage_marker(cache, sf_dir)
        print(f"adopted existing cache: wrote {marker}")

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{args.mem}'")
    con.execute(f"SET threads={args.threads}")
    con.execute("SET preserve_insertion_order=false")
    tmpdir = f"{tempfile.gettempdir()}/duckdb_spill_{os.getpid()}"
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def build(name: str, path: str, select_sql: str) -> None:
        """Crash-safe stage build: COPY to a pid-suffixed temp path,
        then rename into place. COPY writes the keyed path directly
        otherwise, so a build killed mid-write would leave a TRUNCATED
        parquet that later runs skip as 'up to date' and consumers
        splice in (r11 review finding); rename on the same filesystem
        is atomic, so the keyed path either doesn't exist or is a
        complete file."""
        if os.path.exists(path):
            print(f"{name}: up to date ({path})")
            return
        t0 = time.time()
        tmp = f"{path}.building-{os.getpid()}"
        try:
            con.execute(f"COPY ({select_sql}) TO '{tmp}' (FORMAT PARQUET)")
            os.rename(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        print(f"{name}: built in {time.time()-t0:.0f}s -> {path}")

    # Each stage is keyed by its CANONICAL self-contained SQL but BUILT
    # from the previous stage's parquet (the chain runs once total):
    # flagged = full derivation; cleaned = validate+dedup over flagged;
    # tagged = rule predicates over cleaned.
    flagged_path = oe.stage_path(cache, "flagged_charges", oe.flagged_stage_sql())
    build("flagged_charges", flagged_path,
          oe.materialize_ctes(oe.flagged_stage_sql()))

    cleaned_path = oe.stage_path(cache, "cleaned_charges", oe.cleaned_stage_sql())
    build("cleaned_charges", cleaned_path,
          f"WITH flagged AS (SELECT * FROM read_parquet('{flagged_path}')),\n"
          f"{oe._cleaned_suffix()} SELECT * FROM cleaned")

    from clearcare_data_pipeline_spark.queries import extractors as ex

    for rel in ("raw_tall", "raw_wide", "raw_json"):
        sql = ex.extract_stage_sql(rel)
        build(rel, oe.stage_path(cache, rel, sql), oe.materialize_ctes(sql))

    tagged_path = oe.stage_path(cache, "tagged_charges", oe.tagged_stage_sql())
    build("tagged_charges", tagged_path,
          f"WITH cleaned AS (SELECT * FROM read_parquet('{cleaned_path}')),\n"
          f"{oe._tagged_suffix()} SELECT * FROM tagged")

    oe.write_stage_marker(cache, sf_dir)
    print(f"export {oe.ORACLE_STAGE_ENV}={cache}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
