"""Adversarial A/B battery for the r10 gate machinery (VERDICT r10 #1).

Feeds both engines the EXACT edge values the tiered float
canonicalization and the injective length-prefixed row encoding must
agree on — tier boundaries, .5 ties, negative zero, denormals, the
2^83 fallback, and non-BMP unicode (does each engine count the length
prefix in codepoints?) — then diffs the per-value canonical strings
and the final digests. Pure probe: no artifact is trusted unless this
prints all-AGREE (the 2^83 rows are EXPECTED to disagree; they are the
documented fallback caveat and must stay outside every gated query).

Run solo (it owns a small Spark session): python tools/hash_canon_probe.py
"""

from __future__ import annotations

import json
import math
import sys

import duckdb

sys.path.insert(0, ".")

from tools.verify_local import _duck_canon, _spark_canon, duck_hash_agg, spark_hash_agg  # noqa: E402

FLOAT_CASES = [
    ("zero", 0.0),
    ("neg_zero", -0.0),
    ("tiny_denormal", 5e-324),
    ("neg_denormal", -5e-324),
    ("half_tie_pos", 2.5e-06),          # *1e6 = exactly 2.5
    ("half_tie_neg", -2.5e-06),
    ("classic_tie", 2.675),             # shortest repr below the tie
    ("t1_top", 9007199253.999998),
    ("t1_boundary_exact", 9007199254.0),  # first tier-2 value
    ("t2_low", 9007199254.000002),
    ("t2_tie", 10000000000.5),
    ("t2_top", 9007199254740990.0),
    ("t2_boundary_exact", 9007199254740992.0),  # 2^53, first tier-3
    ("t3_mid", 1.2345678901234e18),
    ("t3_top", 9.671406556917032e24),
    ("t3_boundary_exact", 9.671406556917033e24),  # 2^83 fallback starts
    ("fallback_2e83", 2e25),
    ("neg_t3", -3.7e20),
    ("nan", float("nan")),
    ("inf", float("inf")),
    ("neg_inf", float("-inf")),
    ("null", None),
]

STRING_CASES = [
    ("ascii", "plain"),
    ("empty", ""),
    ("separator_smuggle", "a\x1fb"),
    ("sentinel_smuggle", "\x02NULL"),
    ("length_colon", "7:abc"),
    ("bmp_accent", "café"),
    ("cjk", "測試"),
    ("non_bmp_emoji", "\U0001f600ab"),     # U+1F600: surrogate pair in UTF-16
    ("non_bmp_gclef", "\U0001d11e"),
    ("null", None),
]


def main() -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from clearcare_data_pipeline_spark.session import get_spark

    spark = get_spark("hash-canon-probe")
    con = duckdb.connect()

    failures = []
    expected_fallback_diffs = []

    # --- per-value canonical string A/B: doubles -----------------------
    fdf = spark.createDataFrame(
        [(k, v) for k, v in FLOAT_CASES],
        StructType([StructField("k", StringType()), StructField("x", DoubleType())]),
    )
    srows = {
        r["k"]: r["c"]
        for r in fdf.select("k", _spark_canon("x", "double").alias("c")).collect()
    }
    for k, v in FLOAT_CASES:
        lit = (
            "NULL::DOUBLE" if v is None
            else "'nan'::DOUBLE" if isinstance(v, float) and math.isnan(v)
            else f"'{v!r}'::DOUBLE" if v in (float("inf"), float("-inf"))
            else f"CAST({v!r} AS DOUBLE)"
        )
        dk = con.execute(
            f"SELECT {_duck_canon('x', 'double')} FROM (SELECT {lit} AS x) t"
        ).fetchone()[0]
        tag = "AGREE" if srows[k] == dk else "DIFF"
        if tag == "DIFF":
            (expected_fallback_diffs if "fallback" in k or "t3_boundary" in k
             else failures).append((k, srows[k], dk))
        print(f"double {k:22s} {tag}  spark={srows[k]!r}  duck={dk!r}")

    # --- per-value canonical string A/B: strings (length prefix) -------
    sdf = spark.createDataFrame(
        [(k, v) for k, v in STRING_CASES],
        StructType([StructField("k", StringType()), StructField("x", StringType())]),
    )
    s2 = {
        r["k"]: r["c"]
        for r in sdf.select("k", _spark_canon("x", "string").alias("c")).collect()
    }
    for k, v in STRING_CASES:
        lit = "NULL::VARCHAR" if v is None else "'" + v.replace("'", "''") + "'"
        dk = con.execute(
            f"SELECT {_duck_canon('x', 'string')} FROM (SELECT {lit} AS x) t"
        ).fetchone()[0]
        tag = "AGREE" if s2[k] == dk else "DIFF"
        if tag == "DIFF":
            failures.append((k, s2[k], dk))
        print(f"string {k:22s} {tag}  spark={s2[k]!r}  duck={dk!r}")

    # --- end-to-end digest A/B over the gateable float cases -----------
    gate = [(k, v) for k, v in FLOAT_CASES
            if "fallback" not in k and "t3_boundary" not in k]
    gdf = spark.createDataFrame(
        gate,
        StructType([StructField("k", StringType()), StructField("x", DoubleType())]),
    )
    n_s, h_s = spark_hash_agg(gdf)
    vals = ", ".join(
        "(" + ("'" + k + "'") + ", " + (
            "NULL" if v is None
            else "'nan'::DOUBLE" if isinstance(v, float) and math.isnan(v)
            else f"'{v!r}'::DOUBLE" if v in (float("inf"), float("-inf"))
            else f"CAST({v!r} AS DOUBLE)"
        ) + ")"
        for k, v in gate
    )
    n_d, h_d, _ = duck_hash_agg(
        con, f"SELECT * FROM (VALUES {vals}) AS t(k, x)",
        [("k", "string"), ("x", "double")],
    )
    digest_ok = (n_s, h_s) == (n_d, h_d)
    print(f"digest gateable-floats: spark=({n_s},{h_s}) duck=({n_d},{h_d}) "
          f"{'AGREE' if digest_ok else 'DIFF'}")
    if not digest_ok:
        failures.append(("digest", (n_s, h_s), (n_d, h_d)))

    print(json.dumps({
        "failures": [list(map(str, f)) for f in failures],
        "expected_fallback_diffs": [list(map(str, f)) for f in expected_fallback_diffs],
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
