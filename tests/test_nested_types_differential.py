"""Struct-of-list-of-map depth, cross-checked engine-vs-engine
(reference test/sql/types/nested/ — struct_pack/list/map nesting).

The sqllogic corpus covers the DIALECT-COMMON surface; nested TYPE
construction has no shared spelling (Spark: named_struct/array/map,
DuckDB: struct_pack/[..]/map(keys, vals)), so this suite builds the
same nested value in each engine's own dialect, extracts the same
leaves, and requires identical scalars — the differential-fuzzer
discipline applied to the nested-type dirs."""

from __future__ import annotations

import pytest

from tests.oracle_compare import _cells_equal, normalize


def _compare(spark, duck, spark_sql: str, duck_sql: str, name: str) -> None:
    sdf = spark.sql(spark_sql)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    ores = duck.execute(duck_sql)
    o_cols = [d[0] for d in ores.description]
    o_rows = [tuple(r) for r in ores.fetchall()]
    assert sorted(s_cols) == sorted(o_cols), (name, s_cols, o_cols)
    assert len(s_rows) == len(o_rows), (name, len(s_rows), len(o_rows))
    sn, on = normalize(s_cols, s_rows), normalize(o_cols, o_rows)
    bad = [(a, b) for a, b in zip(sn, on) if not _cells_equal(a, b)]
    assert not bad, (name, bad[:3])


CASES = [
    (
        "struct_of_list_leaf",
        """SELECT n_nationkey AS k,
                  element_at(named_struct('tags', array(n_name, upper(n_name))).tags, 2) AS leaf
           FROM nation ORDER BY k""",
        """SELECT n_nationkey AS k,
                  struct_pack(tags := [n_name, upper(n_name)]).tags[2] AS leaf
           FROM nation ORDER BY k""",
    ),
    (
        "struct_of_map_leaf",
        """SELECT n_nationkey AS k,
                  element_at(named_struct('m', map('a', n_regionkey * 10)).m, 'a') AS leaf
           FROM nation ORDER BY k""",
        """SELECT n_nationkey AS k,
                  struct_pack(m := map(['a'], [n_regionkey * 10])).m['a'][1] AS leaf
           FROM nation ORDER BY k""",
    ),
    (
        "list_of_struct_field",
        """SELECT n_nationkey AS k,
                  element_at(array(named_struct('id', n_nationkey, 's', n_name),
                                   named_struct('id', -n_nationkey, 's', lower(n_name))), 2).s AS leaf
           FROM nation ORDER BY k""",
        """SELECT n_nationkey AS k,
                  [struct_pack(id := n_nationkey, s := n_name),
                   struct_pack(id := -n_nationkey, s := lower(n_name))][2].s AS leaf
           FROM nation ORDER BY k""",
    ),
    (
        "map_of_list_element",
        """SELECT n_nationkey AS k,
                  element_at(element_at(map('k', array(n_nationkey, n_regionkey)), 'k'), 2) AS leaf
           FROM nation ORDER BY k""",
        """SELECT n_nationkey AS k,
                  map(['k'], [[n_nationkey, n_regionkey]])['k'][1][2] AS leaf
           FROM nation ORDER BY k""",
    ),
    (
        "struct_list_map_three_deep",
        """SELECT n_nationkey AS k,
                  element_at(element_at(named_struct(
                      'lvl1', array(named_struct('lvl2', map('x', n_nationkey * 2)))
                  ).lvl1, 1).lvl2, 'x') AS leaf
           FROM nation ORDER BY k""",
        """SELECT n_nationkey AS k,
                  struct_pack(lvl1 := [struct_pack(lvl2 := map(['x'], [n_nationkey * 2]))])
                    .lvl1[1].lvl2['x'][1] AS leaf
           FROM nation ORDER BY k""",
    ),
    (
        "map_over_struct_of_region_join",
        """SELECT r.r_regionkey AS k,
                  element_at(map(r.r_name, named_struct('cnt', cnt).cnt), r.r_name) AS leaf
           FROM region r JOIN (SELECT n_regionkey, count(*) AS cnt
                               FROM nation GROUP BY n_regionkey) n
             ON n.n_regionkey = r.r_regionkey
           ORDER BY k""",
        """SELECT r.r_regionkey AS k,
                  map([r.r_name], [struct_pack(cnt := cnt).cnt])[r.r_name][1] AS leaf
           FROM region r JOIN (SELECT n_regionkey, count(*) AS cnt
                               FROM nation GROUP BY n_regionkey) n
             ON n.n_regionkey = r.r_regionkey
           ORDER BY k""",
    ),
    (
        "aggregated_list_of_names_first_last",
        """SELECT n_regionkey AS k,
                  element_at(sort_array(collect_list(n_name)), 1) AS first_name,
                  element_at(sort_array(collect_list(n_name)),
                             size(collect_list(n_name))) AS last_name
           FROM nation GROUP BY n_regionkey ORDER BY k""",
        """SELECT n_regionkey AS k,
                  list_sort(list(n_name))[1] AS first_name,
                  list_sort(list(n_name))[-1] AS last_name
           FROM nation GROUP BY n_regionkey ORDER BY k""",
    ),
    (
        "nested_struct_equality_groups",
        """SELECT leaf, count(*) AS c FROM (
             SELECT named_struct('a', n_nationkey % 3,
                                 'b', array(n_regionkey % 2)).a
                    + element_at(named_struct('a', n_nationkey % 3,
                                 'b', array(n_regionkey % 2)).b, 1) AS leaf
             FROM nation) t GROUP BY leaf ORDER BY leaf""",
        """SELECT leaf, count(*) AS c FROM (
             SELECT struct_pack(a := n_nationkey % 3, b := [n_regionkey % 2]).a
                    + struct_pack(a := n_nationkey % 3, b := [n_regionkey % 2]).b[1] AS leaf
             FROM nation) t GROUP BY leaf ORDER BY leaf""",
    ),
    (
        "embeddings_list_column_depth",
        """SELECT vec_id AS k,
                  element_at(named_struct('v', embedding).v, 1) >= 0.0 AS leaf_sign,
                  size(named_struct('v', embedding).v) AS leaf_len
           FROM embeddings ORDER BY k LIMIT 50""",
        """SELECT vec_id AS k,
                  struct_pack(v := embedding).v[1] >= 0.0 AS leaf_sign,
                  length(struct_pack(v := embedding).v) AS leaf_len
           FROM embeddings ORDER BY k LIMIT 50""",
    ),
]


@pytest.mark.parametrize("name,spark_sql,duck_sql", CASES, ids=[c[0] for c in CASES])
def test_nested_depth_matches(spark, duck, sf_dir, name, spark_sql, duck_sql):
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    _compare(spark, duck, spark_sql, duck_sql, name)
