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


def test_leaves_multi_window_clause_alone():
    # ADVICE r7 #2: the second entry of a multi-window clause follows a
    # comma and used to be reachable by the comma-anchored opener.
    sql = (
        "WITH a AS (SELECT 1 AS x) "
        "SELECT sum(x) OVER w1, avg(x) OVER w2, (SELECT max(x) FROM a) "
        "FROM a, a a2, a a3 "
        "WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY x DESC), "
        "w2_b AS (PARTITION BY x) "
        "SELECT 1 FROM x WHERE y = w2 AND z = w2"
    )
    out = materialize_ctes(sql)
    assert "WINDOW w1 AS (ORDER BY x), w2 AS (ORDER BY x DESC)" in out
    assert out.count("AS MATERIALIZED (") == 1  # only the CTE `a`


def test_refs_counted_case_insensitively():
    # ADVICE r7 #2: SQL identifiers are case-insensitive — `A` and `a`
    # are the same CTE, so it is multiply referenced and must
    # materialize (losing it dropped the OOM protection).
    sql = "WITH a AS (SELECT 1 AS x) SELECT * FROM A JOIN a a2 ON true"
    out = materialize_ctes(sql)
    assert "WITH a AS MATERIALIZED (" in out


def test_regex_parens_inside_cte_body_literals():
    # rule-predicate oracles carry regexes with unbalanced parens in
    # string literals — the body skipper must not miscount depth
    sql = (
        "WITH a AS (SELECT regexp_matches(s, '^[(]+', 'i') FROM t),\n"
        "b AS (SELECT * FROM a UNION ALL SELECT * FROM a) SELECT * FROM b"
    )
    out = materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out
    assert "b AS MATERIALIZED" not in out


def test_as_without_space_accepted():
    """ADVICE r8 #1: the old regex required whitespace between AS and
    '(' — 'AS(' silently ended the walk."""
    sql = "WITH a AS(SELECT 1) SELECT * FROM a JOIN a a2 ON true"
    out = materialize_ctes(sql)
    assert "a AS MATERIALIZED (SELECT 1)" in out


def test_comment_with_paren_inside_body_does_not_derail():
    """A '--' comment carrying an unbalanced paren inside a CTE body
    used to corrupt the depth counter and skip every later CTE."""
    sql = (
        "WITH a AS (SELECT 1 -- stray ( paren\n),\n"
        "b AS (SELECT * FROM a)\n"
        "SELECT * FROM a JOIN b ON true"
    )
    out = materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out


def test_double_quoted_identifier_with_paren_does_not_derail():
    sql = (
        'WITH a AS (SELECT 1 AS "odd ( name"),\n'
        "b AS (SELECT * FROM a)\n"
        "SELECT * FROM a JOIN b ON true"
    )
    out = materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out
    assert '"odd ( name"' in out


def test_comments_between_cte_entries():
    sql = (
        "WITH -- preamble\n a AS (SELECT 1), -- note\n"
        "b AS (SELECT * FROM a) SELECT * FROM a JOIN b ON true"
    )
    out = materialize_ctes(sql)
    assert "a AS MATERIALIZED (" in out


def test_unparseable_cte_list_entry_warns():
    """Silence on a derailed walk restores the sf10 spill failure this
    function exists to prevent — it must be loud."""
    import pytest

    sql = "WITH a AS (SELECT 1), ORDER BY x"
    with pytest.warns(UserWarning, match="unparseable"):
        materialize_ctes(sql)
