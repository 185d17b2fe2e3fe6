"""The whitespace-class convention (r12): the engine tokenizes with
Java regexes whose ``\\s`` INCLUDES vertical tab U+000B; DuckDB's RE2
``\\s`` EXCLUDES it. Oracles must therefore spell the Java class out
(queries/_textsql.py) — these tests pin the divergence itself, the
per-character parity of the explicit class, and a repo-wide guard
that no bare ``\\s``/``\\w`` survives in any emitted oracle SQL."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from clearcare_data_pipeline_spark.operators.textstats import words_expr
from clearcare_data_pipeline_spark.queries._textsql import WORDS_SQL, WS_PLUS

# name -> (text, expected tokens under JAVA \s — the engine semantics)
CASES = {
    "vt": ("a\x0bb", ["a", "b"]),          # THE divergent char
    "ff": ("a\x0cb", ["a", "b"]),
    "tab_nl_crlf": ("a\tb\nc\r\nd", ["a", "b", "c", "d"]),
    "nbsp": ("a\u00a0b", ["a\u00a0b"]),  # not ws in either engine
    "line_sep": ("a\u2028b", ["a\u2028b"]),
    "em_space": ("a\u2003b", ["a\u2003b"]),
    "mixed_runs": (" a \x0b\t b ", ["a", "b"]),
    "only_ws": (" \t\x0b\r\n ", []),
    "empty": ("", []),
}


def test_re2_bare_s_diverges_from_java_on_vt_only():
    """The finding itself: RE2 \\s misses U+000B; every other probed
    case agrees. If DuckDB ever changes this, the convention comment
    needs revisiting — this test is the tripwire."""
    for name, (text, java_tokens) in CASES.items():
        re2 = duckdb.sql(
            "SELECT list_filter(string_split_regex($1::VARCHAR, '\\s+'), "
            "t -> length(t) > 0)", params=[text]
        ).fetchone()[0]
        if name in ("vt", "mixed_runs", "only_ws"):
            assert re2 != java_tokens, name  # bare \s gets these WRONG
        else:
            assert re2 == java_tokens, name


def test_explicit_class_matches_java_semantics_in_duckdb():
    for name, (text, java_tokens) in CASES.items():
        got = duckdb.sql(
            f"SELECT list_filter(string_split_regex($1::VARCHAR, '{WS_PLUS}'), "
            "t -> length(t) > 0)", params=[text]
        ).fetchone()[0]
        assert got == java_tokens, (name, got)


def test_spark_words_expr_produces_java_semantics(spark):
    df = spark.createDataFrame(
        [(n, t) for n, (t, _) in CASES.items()], "name: string, s: string"
    )
    got = {r["name"]: r["w"]
           for r in df.select("name", words_expr(F.col("s")).alias("w")).collect()}
    for name, (_, java_tokens) in CASES.items():
        assert got[name] == java_tokens, name


def test_words_sql_and_words_expr_agree_per_case(spark):
    """End-to-end: the shared oracle snippet and the engine tokenizer
    agree token-for-token on every adversarial case. trim() in both
    only strips 0x20, so leading/trailing exotic whitespace exercises
    the split, not the trim."""
    for name, (text, _) in CASES.items():
        duck = duckdb.sql(
            f"SELECT {WORDS_SQL.replace('trim(text)', 'trim($1::VARCHAR)')}",
            params=[text],
        ).fetchone()[0]
        spark_row = (
            spark.range(1)
            .select(words_expr(F.trim(F.lit(text))).alias("w"))
            .collect()[0]["w"]
        )
        assert duck == spark_row, (name, duck, spark_row)


def test_algorithm_invalid_predicate_parity_on_vt(spark):
    """The F4 algorithm-format flag shares schema.ALGORITHM_INVALID_
    REGEX between Spark rlike (Java) and — before r12 — the DuckDB
    oracle verbatim. '12\\x0b34' is numeric-only under Java \\s but
    NOT under RE2 \\s; the explicit-class oracle twin
    (_textsql.ALGORITHM_INVALID_RE2) restores parity."""
    from clearcare_data_pipeline_spark.functions.cleaning import (
        algorithm_invalid_expr,
    )
    from clearcare_data_pipeline_spark.queries._textsql import (
        ALGORITHM_INVALID_RE2,
    )
    from clearcare_data_pipeline_spark.schema import ALGORITHM_INVALID_REGEX

    cases = ["12\x0b34", "12 34", "12x34", "$5%", "", "\x0b", "7\t7"]
    df = spark.createDataFrame([(c,) for c in cases], "s: string")
    spark_flags = [
        r["f"] for r in
        df.select(algorithm_invalid_expr(F.col("s")).alias("f")).collect()
    ]
    duck_flags = [
        duckdb.sql(
            f"SELECT coalesce(regexp_matches($1::VARCHAR, '{ALGORITHM_INVALID_RE2}'), FALSE)",
            params=[c],
        ).fetchone()[0]
        for c in cases
    ]
    assert spark_flags == duck_flags, list(zip(cases, spark_flags, duck_flags))
    # and the OLD bare-\s oracle really did diverge on the VT cases
    bare = [
        duckdb.sql(
            f"SELECT coalesce(regexp_matches($1::VARCHAR, '{ALGORITHM_INVALID_REGEX}'), FALSE)",
            params=[c],
        ).fetchone()[0]
        for c in cases
    ]
    assert bare != spark_flags


def test_no_bare_regex_class_in_any_oracle():
    """Repo-wide guard: no emitted oracle SQL may contain a bare \\s
    or \\w — the classes RE2 and Java can read differently. (Escaped
    literals like \\\\s would be fine but none exist; \\S/\\W are also
    banned for symmetry.)"""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    bad = {}
    for name, sql in entry.oracle_sql().items():
        hits = re.findall(r"\\[sSwW]", sql)
        if hits:
            bad[name] = hits
    assert not bad, bad


def test_ws_class_defined_once():
    """r13 (ADVICE r12): the explicit Java-\\s class must be DEFINED
    exactly once — queries/_textsql.py — and only REUSED elsewhere.
    The bare-class guard above catches a regression to '\\s' but not a
    site that drifts to a different explicit class; this one does: any
    query-module source spelling the class out by hand (detected via
    its distinctive x0B member) fails here."""
    import glob as _glob
    import os

    qdir = os.path.join(
        os.path.dirname(__file__), "..", "clearcare_data_pipeline_spark", "queries"
    )
    offenders = []
    for p in sorted(_glob.glob(os.path.join(qdir, "*.py"))):
        if os.path.basename(p) == "_textsql.py":
            continue
        if "x0B" in open(p).read():
            offenders.append(os.path.basename(p))
    assert not offenders, offenders


def test_gated_corpus_is_pure_ascii():
    """Premise of .r12state/ascii_scan.json, pinned at sf0.001 so data
    regeneration can't silently void it: every VARCHAR value in every
    table is pure ASCII, which makes all unicode engine-divergence
    classes (case mapping, normalization, exotic whitespace beyond the
    pinned U+000B handling) vacuous on gated data. Production corpora
    are NOT covered by this — the explicit-class oracles and the
    engine-parity pins above are the defense there."""
    import glob

    paths = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
    assert paths, "gated corpus missing at /root/testdata/sf0.001 — premise unverifiable"
    for p in paths:
        cols = [r[0] for r in duckdb.sql(f"DESCRIBE SELECT * FROM '{p}'").fetchall()
                if "VARCHAR" in str(r[1])]
        for c in cols:
            n = duckdb.sql(
                f"SELECT count(*) FROM '{p}' "
                f'WHERE octet_length(encode("{c}")) != length("{c}") '
                f'OR regexp_matches("{c}", \'[^\\x00-\\x7F]\')'
            ).fetchone()[0]
            assert n == 0, (p, c)
