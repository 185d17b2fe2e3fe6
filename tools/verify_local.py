"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values
(doubles rounded to 6 decimals before comparison).

Usage: python tools/verify_local.py [--out FILE.json] [sf_dir] [query ...]

``--out`` additionally writes a per-query JSON artifact (the committed
CORRECTNESS_LOCAL_r{N}.json evidence trail for the queries the driver's
50-query sample does not cover — VERDICT r4 ask #2).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from clearcare_data_pipeline_spark.schema import TESTDATA_TABLES  # noqa: E402
from clearcare_data_pipeline_spark.session import get_spark  # noqa: E402


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: round(v, 6)
                if isinstance(v, float) and not math.isnan(v)
                else (tuple(v) if isinstance(v, (list, tuple)) else v)
            )
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        df = df.iloc[df.astype(str).apply(tuple, axis=1).argsort()].reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # Combined absolute + relative tolerance: at sf1 a SUM over 6M
            # rows reaches ~1e10 where one float64 ULP is ~4e-6, so a pure
            # round-to-6-decimals equality flags last-bit associativity
            # differences between engines as failures.
            av = pd.to_numeric(av, errors="coerce").round(6)
            bv = pd.to_numeric(bv, errors="coerce").round(6)
            both_nan = av.isna() & bv.isna()
            close = np.isclose(
                av.fillna(-1.23456e300), bv.fillna(-1.23456e300),
                rtol=1e-9, atol=2e-6,
            )
            mism = pd.Series(~close & ~both_nan, index=av.index)
            eq = not mism.any()
        else:
            mism = av.astype(str) != bv.astype(str)
            eq = not mism.any()
        if not eq:
            idx = mism[mism].index[:3]
            examples = [(c, av.loc[i], bv.loc[i]) for i in idx]
            problems.append(f"values differ in col {c}: {examples}")
    return problems


def main() -> int:
    argv = list(sys.argv[1:])
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    def fresh_con():
        # One connection PER QUERY: DuckDB 1.0 pins buffer-manager blocks
        # across statements on a long-lived connection (especially after
        # an OOM exception), so at sf1 a shared connection eventually
        # fails 16 KB allocations that a fresh one satisfies instantly.
        # The memory cap leaves headroom for the co-resident Spark JVM.
        c = duckdb.connect()
        c.execute(f"SET memory_limit='{os.environ.get('VERIFY_DUCKDB_MEM', '24GB')}'")
        # DuckDB 1.0 RESERVES aggregate memory per thread: at 32 threads
        # the sf1 charges oracles abort on reservation accounting with
        # <4 GB actually resident; 8 threads completes them in ~1 min.
        c.execute(f"SET threads={os.environ.get('VERIFY_DUCKDB_THREADS', '8')}")
        c.execute("SET preserve_insertion_order=false")
        # Per-PROCESS spill directory: the default is .tmp under the
        # CWD, so two verify processes launched from the same checkout
        # delete each other's temp_storage files mid-query (observed
        # as IO "Could not remove file .tmp/duckdb_temp_storage-2.tmp"
        # aborts when the sf10 gate ran queries in parallel). A
        # pid-keyed path makes concurrent gates safe by construction.
        tmpdir = f"{tempfile.gettempdir()}/duckdb_spill_{os.getpid()}"
        os.makedirs(tmpdir, exist_ok=True)
        c.execute(f"SET temp_directory='{tmpdir}'")
        for t in TESTDATA_TABLES:
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    spark = get_spark("verify-local")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failed, passed, rows_only = [], [], []
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            results[name] = {"status": "fail", "err": f"spark {type(e).__name__}: {e}"[:400]}
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            rows_only.append(name)
            results[name] = {"status": "rows_only", "rows": len(sdf), "sec": round(time.time() - t0, 1)}
            print(f"ROWS-ONLY {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            con = fresh_con()
            try:
                ddf = con.execute(oracles[name]).df()
            finally:
                con.close()
        except Exception as e:
            failed.append(name)
            results[name] = {"status": "fail", "err": f"duckdb {type(e).__name__}: {e}"[:400]}
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            continue
        problems = compare(sdf, ddf)
        if problems:
            failed.append(name)
            results[name] = {"status": "fail", "err": "; ".join(p[:400] for p in problems)}
            print(f"FAIL {name}: " + "; ".join(p[:400] for p in problems))
        else:
            passed.append(name)
            results[name] = {"status": "pass", "rows": len(sdf), "sec": round(time.time() - t0, 1)}
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(rows_only)} rows-only")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "passed": len(passed),
                    "failed": len(failed),
                    "rows_only": len(rows_only),
                    "queries": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
