"""materialize_ctes anchoring (ADVICE r6): rewrite CTE openers only."""

from clearcare_data_pipeline_spark.queries._oracle_expr import materialize_ctes


def test_rewrites_with_and_comma_anchored_ctes():
    sql = (
        "WITH a AS (SELECT 1),\n"
        "b AS (SELECT 2), c AS (SELECT 3)\n"
        "SELECT * FROM a, b, c"
    )
    out = materialize_ctes(sql)
    assert out.count("AS MATERIALIZED (") == 3


def test_recursive_cte_anchor():
    sql = "WITH RECURSIVE r AS (SELECT 1 UNION ALL SELECT n+1 FROM r) SELECT * FROM r"
    assert "RECURSIVE r AS MATERIALIZED (" in materialize_ctes(sql)


def test_leaves_named_window_clause_alone():
    sql = (
        "WITH a AS (SELECT 1 AS x) "
        "SELECT sum(x) OVER w FROM a WINDOW w AS (ORDER BY x)"
    )
    out = materialize_ctes(sql)
    assert "WINDOW w AS (ORDER BY x)" in out
    assert out.count("AS MATERIALIZED (") == 1


def test_leaves_string_literal_alone():
    sql = "WITH a AS (SELECT 'x AS (' AS s) SELECT * FROM a"
    out = materialize_ctes(sql)
    assert "'x AS ('" in out
    assert out.count("AS MATERIALIZED (") == 1
