"""materialize_ctes: rewrite CTE openers only (ADVICE r6 anchoring),
and only for CTEs referenced more than once (r7 — single-reference
CTEs pipeline in DuckDB; forcing them to temp storage filled the disk
at sf10, see the materialize_ctes docstring)."""

from clearcare_data_pipeline_spark.queries._oracle_expr import materialize_ctes


def test_rewrites_only_multiply_referenced_ctes():
    sql = (
        "WITH a AS (SELECT 1 AS x),\n"
        "b AS (SELECT x FROM a UNION ALL SELECT x FROM a), "
        "c AS (SELECT x FROM b)\n"
        "SELECT * FROM c"
    )
    out = materialize_ctes(sql)
    # a is consumed twice -> materialized; b and c once -> pipelined
    assert "a AS MATERIALIZED (" in out
    assert out.count("AS MATERIALIZED (") == 1


def test_single_reference_chain_stays_pipelined():
    sql = (
        "WITH a AS (SELECT 1),\n"
        "b AS (SELECT * FROM a), c AS (SELECT * FROM b)\n"
        "SELECT * FROM c"
    )
    assert materialize_ctes(sql) == sql


def test_comma_anchored_opener_is_rewritten():
    sql = (
        "WITH a AS (SELECT 1), b AS (SELECT * FROM a) "
        "SELECT * FROM a JOIN b ON true"
    )
    out = materialize_ctes(sql)
    assert "WITH a AS MATERIALIZED (" in out
    assert "b AS (" in out and "b AS MATERIALIZED" not in out


def test_recursive_cte_anchor():
    sql = "WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n+1 FROM r) SELECT * FROM r"
    assert "RECURSIVE r AS MATERIALIZED (" in materialize_ctes(sql)


def test_leaves_named_window_clause_alone():
    sql = (
        "WITH a AS (SELECT 1 AS x) "
        "SELECT sum(x) OVER w, (SELECT max(x) FROM a) FROM a WINDOW w AS (ORDER BY x)"
    )
    out = materialize_ctes(sql)
    # a is doubly referenced -> materialized; the window clause is not a CTE
    assert "WINDOW w AS (ORDER BY x)" in out
    assert out.count("AS MATERIALIZED (") == 1


def test_leaves_string_literal_alone():
    sql = "WITH a AS (SELECT 'x AS (' AS s) SELECT * FROM a JOIN a a2 ON true"
    out = materialize_ctes(sql)
    assert "'x AS ('" in out
    assert out.count("AS MATERIALIZED (") == 1
