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


# --- in-engine order-insensitive hash compare (VERDICT r8 #1) ---------
#
# The pandas compare above materializes BOTH engines' full results in
# the driver — ~50 GB for the charges pair at sf10, which excluded
# them from the sf10 gate and made every big oracle's wall time mostly
# materialize+compare. The hash path instead aggregates each side
# in-engine to two scalars — count(*) and sum(uint64(md5-prefix)) over
# a canonicalized row string — and compares those. Order-insensitive
# by construction (sum is commutative), multiset-exact (differing
# multiplicities shift the sum), and the row canonicalization is
# engine-portable:
#   * columns in sorted-name order, joined with chr(31), NULL -> a
#     chr(2) sentinel (concat_ws would silently drop NULLs);
#   * float/double rounded to 6dp then rendered via DECIMAL(38,6) so
#     both engines print the identical fixed-point text (plain
#     double->string formats diverge: Spark '1.0E7', DuckDB
#     '10000000.0'); NaN/±Inf get sentinels; |x| >= 1e32 falls back to
#     the engine's native text (document-level caveat, no such query);
#   * timestamps forced to microsecond text on both sides;
#   * uint64 = first 16 hex chars of md5 (Spark conv(..,16,10) ==
#     DuckDB CAST('0x'||substr(..) AS UBIGINT), verified identical);
#     summed as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so ANSI-mode
#     sums can't overflow.
#
# Exactness caveat: the hash compare is EXACT after the 6dp round —
# no isclose tolerance — so it only applies to queries whose float
# columns are per-row values both engines derive bit-identically
# (parquet reads, correctly-rounded string->double casts). Queries
# whose floats carry cross-engine last-ULP noise (multi-row float
# aggregates like running_order_total's window sums) are NOT eligible
# unless allowlisted, and stay on the pandas path. On a digest
# mismatch of a small result the harness re-runs the pandas compare
# for diagnostics (and its verdict, restoring tolerance semantics);
# big results report the digests.

_HASH_SENT = "\x02"
_HASH_SEP = "\x1f"
_HASH_SIMPLE = {
    "string", "boolean", "tinyint", "smallint", "int", "bigint",
    "date", "timestamp", "timestamp_ntz",
}
_HASH_FLOATY = {"float", "double"}
# float-bearing queries whose floats are per-row (bit-identical) values:
# parsed/parquet-read prices, or deterministic per-row derivations of
# integers (part_name_linkage's levenshtein ratio) — never multi-row
# float aggregates
_HASH_FLOAT_OK = set(
    os.environ.get(
        "VERIFY_HASH_FLOAT_OK",
        "charges_cleaned,charges_quarantine,merge_orders_upsert,"
        "charges_rules_tagged,part_name_linkage",
    ).split(",")
)
_HASH_DIAG_MAX = int(os.environ.get("VERIFY_HASH_DIAG_MAX", "2000000"))


def hash_eligible(name: str, dtypes: list[tuple[str, str]]) -> bool:
    kinds = {t for _, t in dtypes}
    if not all(
        t in _HASH_SIMPLE or t in _HASH_FLOATY or t.startswith("decimal(")
        for t in kinds
    ):
        return False  # arrays/structs/maps/binary: pandas path
    if kinds & _HASH_FLOATY and name not in _HASH_FLOAT_OK:
        return False
    return True


def _spark_canon(name: str, dtype: str):
    from pyspark.sql import functions as F

    c = F.col(name)
    if dtype in _HASH_FLOATY:
        canon = (
            F.when(F.isnan(c), F.lit(_HASH_SENT + "NaN"))
            .when(c == float("inf"), F.lit(_HASH_SENT + "Inf"))
            .when(c == float("-inf"), F.lit(_HASH_SENT + "-Inf"))
            .otherwise(
                F.coalesce(
                    F.round(c, 6).try_cast("decimal(38,6)").cast("string"),
                    c.cast("string"),
                )
            )
        )
    elif dtype in ("timestamp", "timestamp_ntz"):
        canon = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    else:  # string / ints / boolean / date / decimal(p,s)
        canon = c.cast("string")
    return F.coalesce(canon, F.lit(_HASH_SENT + "NULL"))


def spark_hash_agg(df) -> tuple[int, int]:
    """(row count, order-insensitive digest) of a Spark DataFrame."""
    from pyspark.sql import functions as F

    dts = dict(df.dtypes)
    row = F.concat_ws(_HASH_SEP, *[_spark_canon(c, dts[c]) for c in sorted(dts)])
    h = F.conv(F.substring(F.md5(row), 1, 16), 16, 10).cast("decimal(38,0)")
    r = df.agg(F.count(F.lit(1)).alias("n"), F.sum(h).alias("s")).collect()[0]
    return int(r["n"]), int(r["s"]) if r["s"] is not None else 0


def _duck_canon(name: str, dtype: str) -> str:
    q = '"' + name.replace('"', '""') + '"'
    if dtype in _HASH_FLOATY:
        canon = (
            f"CASE WHEN isnan({q}::DOUBLE) THEN chr(2)||'NaN' "
            f"WHEN {q}::DOUBLE = 'infinity'::DOUBLE THEN chr(2)||'Inf' "
            f"WHEN {q}::DOUBLE = '-infinity'::DOUBLE THEN chr(2)||'-Inf' "
            f"ELSE coalesce(TRY_CAST(round({q}::DOUBLE, 6) AS DECIMAL(38,6))::VARCHAR, "
            f"({q}::DOUBLE)::VARCHAR) END"
        )
    elif dtype.startswith("decimal("):
        canon = f"({q}::{dtype.upper()})::VARCHAR"
    elif dtype in ("timestamp", "timestamp_ntz"):
        canon = f"strftime({q}::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f')"
    elif dtype == "date":
        canon = f"({q}::DATE)::VARCHAR"
    elif dtype == "boolean":
        canon = f"({q}::BOOLEAN)::VARCHAR"
    elif dtype == "string":
        canon = f"{q}::VARCHAR"
    else:  # ints — HUGEINT accommodates any integral oracle type
        canon = f"({q}::HUGEINT)::VARCHAR"
    return f"coalesce({canon}, chr(2)||'NULL')"


def duck_hash_agg(con, sql: str, dtypes: list[tuple[str, str]]) -> tuple[int, int, list[str]]:
    """(row count, digest, column names) of a DuckDB oracle query.
    Canonical types come from the SPARK schema (the compare's contract
    is Spark-typed), so e.g. a DuckDB DECIMAL sum under a Spark double
    column is rendered through the double canonicalization on both
    sides. DESCRIBE is binding-only — the oracle runs exactly once."""
    cols = [r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()]
    dts = dict(dtypes)
    if sorted(cols) != sorted(dts):
        raise ValueError(f"columns spark={sorted(dts)} duck={sorted(cols)}")
    exprs = ", ".join(_duck_canon(c, dts[c]) for c in sorted(dts))
    wrapped = (
        "SELECT count(*) AS n, "
        "coalesce(sum(CAST(('0x' || substr(md5(concat_ws(chr(31), "
        f"{exprs})),1,16)) AS UBIGINT)::HUGEINT), 0) AS s "
        f"FROM ({sql}) __t"
    )
    n, s = con.execute(wrapped).fetchone()
    return int(n), int(s), cols


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

    hash_on = os.environ.get("VERIFY_HASH", "auto") != "off"

    failed, passed, rows_only = [], [], []
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
        except Exception as e:
            failed.append(name)
            results[name] = {"status": "fail", "err": f"spark {type(e).__name__}: {e}"[:400]}
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue

        # in-engine digest path: never materializes either side
        if name in oracles and hash_on and hash_eligible(name, df.dtypes):
            try:
                n_s, s_s = spark_hash_agg(df)
            except Exception as e:
                failed.append(name)
                results[name] = {"status": "fail", "err": f"spark {type(e).__name__}: {e}"[:400]}
                print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
                continue
            try:
                con = fresh_con()
                try:
                    n_d, s_d, _ = duck_hash_agg(con, oracles[name], df.dtypes)
                finally:
                    con.close()
            except Exception as e:
                failed.append(name)
                results[name] = {"status": "fail", "err": f"duckdb {type(e).__name__}: {e}"[:400]}
                print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
                continue
            if (n_s, s_s) == (n_d, s_d):
                passed.append(name)
                results[name] = {
                    "status": "pass", "rows": n_s, "mode": "hash",
                    "digest": str(s_s), "sec": round(time.time() - t0, 1),
                }
                print(f"PASS {name}: {n_s} rows [hash] ({time.time()-t0:.1f}s)")
                continue
            if n_s > _HASH_DIAG_MAX or n_d > _HASH_DIAG_MAX:
                failed.append(name)
                err = (f"digest mismatch spark=(n={n_s}, h={s_s}) "
                       f"duck=(n={n_d}, h={s_d})")
                results[name] = {"status": "fail", "err": err, "mode": "hash"}
                print(f"FAIL {name}: {err}")
                continue
            # small mismatch: drop to the pandas compare for diagnostics
            # (and its isclose verdict — a last-ULP float wobble that the
            # exact digest flags is not a correctness failure)
            print(f"  {name}: digest mismatch on {n_s} rows — re-running pandas compare")

        try:
            sdf = df.toPandas()
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
