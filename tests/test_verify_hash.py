"""In-engine order-insensitive hash compare (VERDICT r8 #1): the
Spark digest and the DuckDB digest must agree bit-for-bit on every
supported type — including NULLs, NaN/±Inf, empty strings, and the
separator characters themselves — and must detect any value or
multiplicity change."""

import datetime

import duckdb
import pytest

from tools.verify_local import (
    duck_hash_agg,
    hash_eligible,
    spark_hash_agg,
)

_DTYPES = [
    ("s", "string"),
    ("i", "bigint"),
    ("d", "double"),
    ("dt", "date"),
    ("ts", "timestamp"),
    ("b", "boolean"),
]

_ROWS = [
    ("plain", 1, 1.5, datetime.date(2024, 1, 2),
     datetime.datetime(2024, 1, 2, 3, 4, 5, 123456), True),
    ("", -7, float("nan"), None, None, False),
    (None, None, float("inf"), datetime.date(1999, 12, 31),
     datetime.datetime(2000, 1, 1), None),
    ("sep\x1fand\x02sent", 2**62, -0.0000004, datetime.date(2024, 1, 2),
     datetime.datetime(2024, 1, 2, 3, 4, 5), True),
    ("dup", 5, 123456789.123456789, datetime.date(2020, 6, 1),
     datetime.datetime(2020, 6, 1, 0, 0, 0, 1), False),
    ("dup", 5, 123456789.123456789, datetime.date(2020, 6, 1),
     datetime.datetime(2020, 6, 1, 0, 0, 0, 1), False),
]


def _spark_df(spark, rows=_ROWS):
    schema = ", ".join(f"{c} {t}" for c, t in _DTYPES)
    return spark.createDataFrame(rows, schema)


def _duck_rel(con, rows=_ROWS):
    con.execute(
        "CREATE OR REPLACE TABLE t (s VARCHAR, i BIGINT, d DOUBLE, "
        "dt DATE, ts TIMESTAMP, b BOOLEAN)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?, ?)", rows)
    return "SELECT * FROM t"


def test_digest_agrees_across_engines(spark):
    sdf = _spark_df(spark)
    n_s, h_s = spark_hash_agg(sdf)
    con = duckdb.connect()
    n_d, h_d, cols = duck_hash_agg(con, _duck_rel(con), sdf.dtypes)
    assert (n_s, h_s) == (n_d, h_d)
    assert sorted(cols) == sorted(c for c, _ in _DTYPES)


def test_digest_is_order_insensitive_and_multiset_exact(spark):
    n1, h1 = spark_hash_agg(_spark_df(spark, _ROWS))
    n2, h2 = spark_hash_agg(_spark_df(spark, list(reversed(_ROWS))))
    assert (n1, h1) == (n2, h2)
    # dropping one copy of the duplicated row must shift the digest
    n3, h3 = spark_hash_agg(_spark_df(spark, _ROWS[:-1]))
    assert n3 == n1 - 1 and h3 != h1


def test_digest_detects_value_change(spark):
    changed = list(_ROWS)
    changed[0] = ("plain2",) + _ROWS[0][1:]
    sdf = _spark_df(spark, changed)
    n_s, h_s = spark_hash_agg(sdf)
    con = duckdb.connect()
    n_d, h_d, _ = duck_hash_agg(con, _duck_rel(con), sdf.dtypes)  # original rows
    assert n_s == n_d and h_s != h_d


def test_digest_detects_float_sixth_decimal(spark):
    base = [("x", 1, 0.1234561, None, None, True)]
    other = [("x", 1, 0.1234569, None, None, True)]
    _, h1 = spark_hash_agg(_spark_df(spark, base))
    _, h2 = spark_hash_agg(_spark_df(spark, other))
    assert h1 != h2


def test_empty_result_digest_is_zero_both_sides(spark):
    sdf = _spark_df(spark).limit(0)
    assert spark_hash_agg(sdf) == (0, 0)
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES ('a', 1, 1.0, "
                "DATE '2024-01-01', TIMESTAMP '2024-01-01', true)) "
                "v(s, i, d, dt, ts, b) LIMIT 0")
    assert duck_hash_agg(con, "SELECT * FROM t", sdf.dtypes)[:2] == (0, 0)


def test_column_mismatch_raises(spark):
    sdf = _spark_df(spark)
    con = duckdb.connect()
    _duck_rel(con)
    with pytest.raises(ValueError, match="columns"):
        duck_hash_agg(con, "SELECT s, i FROM t", sdf.dtypes)


def test_eligibility_rules():
    assert hash_eligible("anything", [("a", "string"), ("b", "bigint")])
    assert not hash_eligible("anything", [("a", "array<double>")])
    # float columns need the allowlist (lineitem_stats has noisy
    # std/corr aggregates; running_order_total's decimal-internal
    # window sum earned it a spot — VERDICT r9 #4)
    assert not hash_eligible("lineitem_stats", [("a", "double")])
    assert hash_eligible("running_order_total", [("a", "double")])
    assert hash_eligible("charges_cleaned", [("a", "double"), ("b", "string")])


@pytest.mark.slow
def test_separator_collision_resolved(spark):
    """ADVICE r9 #1: values that straddle column boundaries with
    embedded chr(31) must NOT canonicalize identically — the length
    prefix makes the joined row string injectively decodable."""
    dt = [("a", "string"), ("b", "string")]
    df1 = spark.createDataFrame([("a\x1fb", "c")], "a string, b string")
    df2 = spark.createDataFrame([("a", "b\x1fc")], "a string, b string")
    _, h1 = spark_hash_agg(df1)
    _, h2 = spark_hash_agg(df2)
    assert h1 != h2
    # NULL-sentinel boundary ambiguity too: ('x\x02NULL', None) vs ('x', '\x02NULL\x1f\x02NULL'... )
    df3 = spark.createDataFrame([("x\x1f\x02NULL", "y")], "a string, b string")
    df4 = spark.createDataFrame([("x", "\x02NULL\x1fy")], "a string, b string")
    _, h3 = spark_hash_agg(df3)
    _, h4 = spark_hash_agg(df4)
    assert h3 != h4
    con = duckdb.connect()
    con.execute("CREATE TABLE t1 (a VARCHAR, b VARCHAR)")
    con.execute("INSERT INTO t1 VALUES ('a' || chr(31) || 'b', 'c')")
    n_d, h_d, _ = duck_hash_agg(con, "SELECT * FROM t1", dt)
    assert (1, h_d) == (1, h1)  # and the cross-engine digest still agrees


def test_float_canon_tie_cases_agree(spark):
    """ADVICE r9 #2: the scaled-integer float canonicalization must be
    a pure function of the bit pattern, identical across engines —
    including classic decimal-rendering tie cases (2.675), exact .5
    ties at the 6th decimal, negative ties, subnormals, and a sweep of
    random doubles."""
    import random

    rng = random.Random(42)
    vals = [
        2.675, -2.675, 0.0000005, -0.0000005, 1.0000005, 2.6749999,
        0.49999999999999994e-6, 123456789.1234565, -123456789.1234565,
        5e-324, -5e-324, 0.1 + 0.2, 1e15 + 0.5, 2**53 - 1.0,
        0.3333333333333333, -0.0,
        # tier boundaries (2^53/1e6, 2^53, 2^83) and sf10-money-sum range
        9007199253.999998, 9007199254.0, 9007199254.5, -9007199254.5,
        9007199254740991.0, 9007199254740992.0, 9.671406556917032e24,
        4.04e12, 4040404040404.0404, -4.04e12, 1e20, -7.7e22,
        # NOT included: |x| >= 2^83 (e.g. 1e25) falls back to
        # engine-native text, which legitimately differs — the
        # documented caveat; no query emits such magnitudes.
    ] + [rng.uniform(-1e9, 1e9) for _ in range(200)] \
      + [rng.uniform(-1, 1) for _ in range(200)] \
      + [rng.uniform(-1e13, 1e13) for _ in range(100)]
    rows = [(float(v),) for v in vals]
    sdf = spark.createDataFrame(rows, "d double")
    n_s, h_s = spark_hash_agg(sdf)
    con = duckdb.connect()
    con.execute("CREATE TABLE tf (d DOUBLE)")
    con.executemany("INSERT INTO tf VALUES (?)", rows)
    n_d, h_d, _ = duck_hash_agg(con, "SELECT * FROM tf", sdf.dtypes)
    assert (n_s, h_s) == (n_d, h_d)


def test_decimal_column_agrees(spark):
    from pyspark.sql import functions as F

    sdf = spark.range(3).select(
        (F.col("id") * 7).cast("decimal(12,2)").alias("m"),
        F.col("id").cast("int").alias("k"),
    )
    n_s, h_s = spark_hash_agg(sdf)
    con = duckdb.connect()
    sql = ("SELECT (r * 7)::DECIMAL(12,2) AS m, r::INT AS k "
           "FROM (SELECT unnest(range(3)) AS r)")
    n_d, h_d, _ = duck_hash_agg(con, sql, sdf.dtypes)
    assert (n_s, h_s) == (n_d, h_d)
