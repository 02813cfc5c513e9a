"""Textual dialect rewriters (dialect.py): scanner edge cases that the
Spark-level grids in test_engine.py don't isolate — comments, nested
parens, quoted identifiers, marker reordering arithmetic.  Pure Python,
no session."""

from __future__ import annotations

import pytest

from data_chunk_compaction_in_duckdb_spark.dialect import (
    _count_markers,
    rewrite_qualify,
    rewrite_star_modifiers,
)


def test_qualify_none_when_absent_or_nested():
    assert rewrite_qualify("SELECT 1") is None
    assert rewrite_qualify("SELECT 'QUALIFY' AS s") is None
    assert rewrite_qualify('SELECT 1 AS "QUALIFY"') is None
    assert rewrite_qualify("SELECT 1 -- QUALIFY in comment") is None
    assert rewrite_qualify("SELECT 1 /* QUALIFY */ AS a") is None
    # inside a subquery: not top-level, untouched
    assert (
        rewrite_qualify(
            "SELECT * FROM (SELECT a, row_number() OVER (ORDER BY a) rn "
            "FROM t) x WHERE rn = 1"
        )
        is None
    )


def test_qualify_splits_pred_and_tail():
    sql = (
        "SELECT a, rank() OVER (ORDER BY a) rnk FROM t "
        "QUALIFY rnk <= 2 ORDER BY a LIMIT 5"
    )
    rewritten, col, _ = rewrite_qualify(sql)
    assert col == "__qualify"
    assert "ORDER BY a\nLIMIT" in rewritten or "ORDER BY a LIMIT" in rewritten
    # the predicate must not swallow the tail
    assert "(" + "(rank() OVER (ORDER BY a)) <= 2" + ")" in rewritten.replace(
        "  ", " "
    )


def test_qualify_pred_with_nested_parens_and_commas():
    sql = (
        "SELECT a FROM t QUALIFY row_number() OVER "
        "(PARTITION BY b, c ORDER BY a, d) IN (1, 2)"
    )
    rewritten, _, _ = rewrite_qualify(sql)
    assert "IN (1, 2)" in rewritten and rewritten.count("__qualify") == 2


def test_qualify_marker_reorder_inject_form():
    sql = (
        "SELECT a + ? AS x FROM t WHERE b = ? "
        "QUALIFY row_number() OVER (ORDER BY a) <= ? LIMIT ?"
    )
    rewritten, _, reorder = rewrite_qualify(sql)
    # original arg order: sel(1), rest(2), pred(3), tail(4)
    # rewritten text order: sel, pred, rest, tail
    assert reorder([1, 2, 3, 4]) == [1, 3, 2, 4]
    assert _count_markers(rewritten) == 4
    with pytest.raises(ValueError, match="positional args"):
        reorder([1])


def test_qualify_distinct_uses_wrap_form():
    sql = (
        "SELECT DISTINCT a, rank() OVER (ORDER BY a) rnk FROM t "
        "QUALIFY rnk = 1"
    )
    rewritten, _, _ = rewrite_qualify(sql)
    # wrap form keeps the DISTINCT head intact inside a subquery
    assert "SELECT DISTINCT a" in rewritten and "__q.*" in rewritten


def test_star_modifiers_rewrites_and_non_matches():
    assert rewrite_star_modifiers("SELECT a * b FROM t") is None
    assert rewrite_star_modifiers("SELECT count(*) FROM t") is None
    assert rewrite_star_modifiers("SELECT '* EXCLUDE (x)' AS s") is None
    out = rewrite_star_modifiers("SELECT * EXCLUDE (a) FROM t")
    assert out == "SELECT * EXCEPT (a) FROM t"
    out = rewrite_star_modifiers("SELECT t.* EXCLUDE a FROM t")
    assert out == "SELECT t.* EXCEPT (a) FROM t"
    out = rewrite_star_modifiers(
        "SELECT * REPLACE (f(x, y) AS x, g(z) AS z) FROM t"
    )
    assert out == "SELECT * EXCEPT (x, z), f(x, y) AS x, g(z) AS z FROM t"
    # combined, and inside a subquery
    out = rewrite_star_modifiers(
        "SELECT c FROM (SELECT * EXCLUDE (a) REPLACE (b+1 AS b) FROM t) q"
    )
    assert "EXCEPT (a, b), b+1 AS b" in out
    # two independent stars in one statement
    out = rewrite_star_modifiers(
        "SELECT * EXCLUDE (a) FROM t UNION ALL SELECT * EXCLUDE (b) FROM u"
    )
    assert out.count("EXCEPT") == 2


def test_star_modifier_malformed_replace_raises():
    with pytest.raises(ValueError, match="expr AS col"):
        rewrite_star_modifiers("SELECT * REPLACE (x + 1) FROM t")


def test_qualify_requires_a_window_function():
    # DuckDB binder rule (probed): plain boolean QUALIFY must error,
    # never silently become a filter
    with pytest.raises(ValueError, match="window function"):
        rewrite_qualify("SELECT a FROM t QUALIFY a > 5")
    # a window in the head select list satisfies the rule
    assert rewrite_qualify(
        "SELECT a, rank() OVER (ORDER BY a) rnk FROM t QUALIFY rnk = 1"
    ) is not None
    # ... as does one in the predicate
    assert rewrite_qualify(
        "SELECT a FROM t QUALIFY row_number() OVER (ORDER BY a) = 1"
    ) is not None
    # windows nested inside CAST/function parens still count
    assert rewrite_qualify(
        "SELECT CAST(rank() OVER (ORDER BY a) AS INT) AS rnk FROM t "
        "QUALIFY rnk <= 2"
    ) is not None
    # the keyword inside a string literal does not satisfy the rule
    with pytest.raises(ValueError, match="window function"):
        rewrite_qualify("SELECT a, 'OVER' AS s FROM t QUALIFY a > 5")
