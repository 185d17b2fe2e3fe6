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
    # float columns need the allowlist
    assert not hash_eligible("running_order_total", [("a", "double")])
    assert hash_eligible("charges_cleaned", [("a", "double"), ("b", "string")])


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
