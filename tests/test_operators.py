"""Tests for the custom operators (asof/positional/recursive) plus the
oracle-parity queries built on them (SURVEY.md §2.3, §2.7)."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        advanced_joins,
        recursion,
        subqueries,
    )

    mods = {advanced_joins.__name__, subqueries.__name__, recursion.__name__}
    return [n for n, q in REGISTRY.items() if q.builder.__module__ in mods]


@pytest.mark.parametrize("name", _names())
def test_advanced_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_asof_forward_direction(spark, duck, sf_dir):
    """Forward asof (earliest right at-or-after left) vs DuckDB ASOF with
    <= predicate."""
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.operators import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, errors, ["user_id"], "ts", "ts", ["value"], direction="forward"
    ).select("event_id", F.round("value", 4).alias("next_err"))
    got = sorted((r.event_id, r.next_err) for r in out.collect())
    exp = duck.execute(
        """
        SELECT e.event_id, ROUND(x.value, 4) AS next_err
        FROM (SELECT * FROM events WHERE event_type = 'click') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') x
          ON e.user_id = x.user_id AND e.ts <= x.ts
        """
    ).fetchall()
    assert got == sorted(exp)


def test_asof_null_field_stays_bound_to_matched_row(spark):
    """A NULL value column in the MATCHED right row must stay NULL — not be
    filled from an older right row (the reference attaches one row whole,
    physical_asof_join.cpp)."""
    left = spark.createDataFrame([(1, 30)], "k INT, lts INT")
    right = spark.createDataFrame(
        [(1, 10, 100, "old"), (1, 20, None, "new")],
        "k INT, rts INT, v INT, tag STRING",
    )
    from data_chunk_compaction_in_duckdb_spark.operators import asof_join

    row = asof_join(left, right, ["k"], "lts", "rts", ["v", "tag"]).collect()[0]
    assert row.tag == "new" and row.v is None and row.rts == 20


def test_recursive_cte_distinct_terminates_on_cycle(spark):
    """UNION-DISTINCT recursion must reach a fixed point on a cyclic graph."""
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.operators import recursive_cte

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src INT, dst INT"
    )
    initial = spark.createDataFrame([(1,)], "node INT")

    def step(prev):
        return (
            prev.join(edges, prev.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
        )

    out = recursive_cte(initial, step, union_all=False, max_iterations=10)
    assert sorted(r.node for r in out.collect()) == [1, 2, 3, 4]


def test_positional_join_pads_shorter_side(spark):
    from data_chunk_compaction_in_duckdb_spark.operators import positional_join

    a = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING")
    b = spark.createDataFrame([(10, "x"), (20, "y")], "k2 INT, w STRING")
    out = positional_join(a, b, ["k"], ["k2"], how="full").collect()
    assert len(out) == 3
    padded = [r for r in out if r.k2 is None]
    assert len(padded) == 1 and padded[0].k == 3
