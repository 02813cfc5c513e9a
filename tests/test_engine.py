"""Engine facade tests: SQL entry, parameterized SQL (prepared-statement
analog), DataFrame entry, explain, compaction hooks."""

from __future__ import annotations


def test_engine_sql_and_tables(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    df = eng.sql("SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1")
    assert df.count() == 3
    assert eng.table("region").count() == 5
    plan = eng.explain(df)
    assert "HashAggregate" in plan or "Aggregate" in plan


def test_engine_parameterized_sql(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    hi = eng.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > :p", p=400000
    ).collect()[0].n
    lo = eng.sql(
        "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > :p", p=100000
    ).collect()[0].n
    assert 0 < hi < lo


def test_engine_compaction_hooks(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    li = eng.table("lineitem").repartition(16).filter("l_quantity <= 2")
    hist = eng.profile(li)
    assert hist.n_partitions == 16
    out = eng.compact(li, target_rows=10_000)
    assert out.rdd.getNumPartitions() <= 16
