"""Coverage tail — SURVEY.md §2.1 mutations, §2.8 collation/enum/union
types, §2.4 histogram, approximate aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.operators.mutations import (
    delete_where_in,
    update_returning,
    update_where,
    upsert,
)
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "mutation_delete_rewrite",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n
    FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 50)
    GROUP BY o_orderstatus
    """,
)
def mutation_delete_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE (physical_delete.cpp:102) as anti-join: remove orders that
    have any max-quantity lineitem, return the surviving relation's
    profile."""
    orders = load_table(spark, sf_dir, "orders")
    doomed = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 50)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    remaining = delete_where_in(orders, doomed, "o_orderkey")
    return remaining.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


@query(
    "mutation_update_rewrite",
    oracle="""
    SELECT o_orderkey,
           ROUND(CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.1
                      ELSE o_totalprice END, 2) AS o_totalprice,
           CASE WHEN o_orderstatus = 'P' THEN '1-URGENT'
                ELSE o_orderpriority END AS o_orderpriority
    FROM orders WHERE o_orderkey <= 400
    """,
)
def mutation_update_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE (physical_update.cpp:187) as conditional projection: bump
    pending orders' price 10% and escalate their priority."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    updated = update_where(
        orders,
        F.col("o_orderstatus") == "P",
        {
            "o_totalprice": F.col("o_totalprice") * 1.1,
            "o_orderpriority": F.lit("1-URGENT"),
        },
    )
    return updated.select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        "o_orderpriority",
    )


@query(
    "mutation_upsert_rewrite",
    oracle="""
    WITH updates AS (
      SELECT r_regionkey, 'REGION_X' AS r_name
      FROM region WHERE r_regionkey IN (1, 3)
      UNION ALL SELECT 99, 'REGION_NEW'
    )
    SELECT r_regionkey, r_name FROM updates
    UNION ALL
    SELECT r_regionkey, r_name FROM region
    WHERE r_regionkey NOT IN (SELECT r_regionkey FROM updates)
    """,
)
def mutation_upsert_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT ... ON CONFLICT DO UPDATE (physical_insert.cpp upsert path):
    two updated keys + one new key against the region dimension."""
    region = load_table(spark, sf_dir, "region")
    updates = spark.createDataFrame(
        [(1, "REGION_X"), (3, "REGION_X"), (99, "REGION_NEW")],
        "r_regionkey INT, r_name STRING",
    )
    return upsert(region, updates, "r_regionkey")


@query(
    "mutation_update_returning",
    oracle="""
    SELECT o_orderkey,
           'X' AS o_orderstatus,
           o_totalprice + 10.0 AS o_totalprice
    FROM orders
    WHERE o_orderstatus = 'P' AND o_totalprice > 150000
    """,
)
def mutation_update_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... RETURNING (reference test/sql/returning/,
    physical_update.cpp return_collection): the RETURNING stream is the
    post-update image of the affected rows — pinned against real DuckDB
    `UPDATE ... RETURNING` in tests/test_mutations_returning.py; the
    oracle here replays the post-image as a SELECT because the driver's
    fixture views are read-only.  The assignment is one exact IEEE add
    (a `ROUND(x * 1.05, 2)` form diverged on half-ulp boundaries
    between the engines' round implementations)."""
    orders = load_table(spark, sf_dir, "orders")
    cond = (F.col("o_orderstatus") == "P") & (F.col("o_totalprice") > 150000)
    _post, ret = update_returning(
        orders,
        cond,
        {
            "o_orderstatus": F.lit("X"),
            "o_totalprice": F.col("o_totalprice") + 10.0,
        },
    )
    return ret.select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "fn_collation_nocase",
    oracle="""
    SELECT p_partkey,
           lower(p_name) = lower(upper(p_name)) AS nocase_eq,
           CASE WHEN lower(p_brand) = 'brand#1' THEN 1 ELSE 0 END AS is_brand1,
           strip_accents('Crème Brûlée à côté') AS stripped
    FROM part WHERE p_partkey <= 40
    """,
)
def fn_collation_nocase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOCASE/NOACCENT collation (reference extension/icu,
    strip_accents.cpp) via lower()/translate() normalization — Spark
    pre-4.0 collation is binary, so collation is normalize-then-compare."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 40)
    accented = "àáâãäåèéêëìíîïòóôõöùúûüýÿçñ"
    plain = "aaaaaaeeeeiiiiooooouuuuyycn"
    return part.select(
        "p_partkey",
        (F.lower("p_name") == F.lower(F.upper("p_name"))).alias("nocase_eq"),
        F.when(F.lower("p_brand") == "brand#1", 1).otherwise(0).alias("is_brand1"),
        F.translate(F.lit("Crème Brûlée à côté"), accented, plain).alias("stripped"),
    )


@query(
    "type_enum_codes",
    oracle="""
    SELECT p_partkey, p_type,
           CAST(list_position(['ECONOMY','LARGE','MEDIUM','PROMO','SMALL','STANDARD'],
                              p_type) AS INT) AS enum_code,
           'ECONOMY' AS enum_first, 'STANDARD' AS enum_last
    FROM part WHERE p_partkey <= 60
    """,
)
def type_enum_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENUM type (types.hpp ENUM; enum_first/enum_last functions) as a
    string domain + dictionary code via array_position."""
    domain = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 60)
    return part.select(
        "p_partkey",
        "p_type",
        F.array_position(
            F.array(*[F.lit(d) for d in domain]), F.col("p_type")
        ).cast("int").alias("enum_code"),
        F.lit(domain[0]).alias("enum_first"),
        F.lit(domain[-1]).alias("enum_last"),
    )


@query(
    "type_union_tagged",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN 'price' ELSE 'status' END AS tag,
           CASE WHEN o_orderkey % 2 = 0 THEN ROUND(o_totalprice, 2) END AS price_val,
           CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus END AS status_val
    FROM orders WHERE o_orderkey <= 200
    """,
)
def type_union_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION type (types.hpp:227) as its tagged-struct encoding: a tag
    column + one nullable field per member (SURVEY.md §1.2 mapping)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    even = F.col("o_orderkey") % 2 == 0
    u = F.struct(
        F.when(even, "price").otherwise("status").alias("tag"),
        F.when(even, F.round("o_totalprice", 2)).alias("price_val"),
        F.when(~even, F.col("o_orderstatus")).alias("status_val"),
    )
    return orders.select("o_orderkey", u.alias("u")).select(
        "o_orderkey",
        F.col("u.tag").alias("tag"),
        F.col("u.price_val").alias("price_val"),
        F.col("u.status_val").alias("status_val"),
    )


@query(
    "agg_histogram_buckets",
    oracle="""
    SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS bucket, COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram() (function_list.cpp:176) in row form — bucketed value
    counts (the map form is the same rows pivoted client-side)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor(F.col("l_quantity") / 10).cast("bigint").alias("bucket")
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5)
             / 100.0 AS exact_med,
           CAST(abs(approx_quantile(l_extendedprice, 0.5)
                    - quantile_cont(l_extendedprice, 0.5))
                <= 0.05 * quantile_cont(l_extendedprice, 0.5) AS STRING)
             AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_quantile / reservoir_quantile (function_list.cpp:67,280) via
    percentile_approx — sketch-based, so the driver-checkable output is
    each engine's self-check on its OWN sketch: the exact interpolated
    median computed over integer cents (interpolating two integers at
    0.5 is exact in double, so both engines produce the same bits —
    interpolating raw doubles drifts a last bit) plus a within-5%
    boolean both engines' sketches satisfy.  pytest additionally asserts
    the closeness bound directly."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    exact_raw = F.percentile("l_extendedprice", 0.5)
    return li.groupBy("l_returnflag").agg(
        (F.percentile(cents, 0.5) / 100.0).alias("exact_med"),
        (
            F.abs(
                F.percentile_approx("l_extendedprice", 0.5, 10000) - exact_raw
            )
            <= 0.05 * exact_raw
        )
        .cast("string")
        .alias("within_5pct"),
    )


@query(
    "scan_summarize",
    oracle="""
    SELECT 'l_quantity' AS column_name,
           CAST(MIN(l_quantity) AS VARCHAR) AS min,
           CAST(MAX(l_quantity) AS VARCHAR) AS max,
           COUNT(l_quantity) AS count,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag',
           CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR),
           COUNT(l_returnflag),
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate',
           CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR),
           COUNT(l_shipdate),
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_shipdate)
    FROM lineitem
    """,
)
def scan_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUMMARIZE table function (reference summary table function,
    src/function/table/summary.cpp): per-column stats in ONE aggregate
    pass + stack reshape — no per-column rescan."""
    from data_chunk_compaction_in_duckdb_spark.sources import summarize

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag", "l_shipdate"
    )
    return summarize(li)


@query(
    "type_time_micros",
    oracle="""
    SELECT event_id,
           CAST(datediff('microsecond', date_trunc('day', ts), ts) AS BIGINT)
             AS t_us,
           strftime(ts, '%H:%M:%S') AS t_text
    FROM events
    WHERE event_id < 50
    """,
)
def type_time_micros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME type mapping (SURVEY.md §1.2: no native Spark TIME →
    micros-since-midnight BIGINT + text form).  Exact integer
    arithmetic on the timestamp's µs value."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    secs = (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    ).cast("long")
    micros_of_day = secs * 1_000_000 + F.date_format("ts", "SSSSSS").cast("long")
    return ev.select(
        "event_id",
        micros_of_day.alias("t_us"),
        F.date_format("ts", "HH:mm:ss").alias("t_text"),
    )


@query(
    "scan_range_series",
    oracle="""
    SELECT CAST(range AS BIGINT) AS x,
           CAST(range * range AS BIGINT) AS x_sq,
           CAST(SUM(range) OVER (ORDER BY range) AS BIGINT) AS run
    FROM range(0, 1000, 7)
    """,
)
def scan_range_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range/generate_series table function (src/function/table/range.cpp,
    the generator vector_compaction.cpp:103 builds tables from) =
    spark.range — a parallel lazy source, no data file."""
    from data_chunk_compaction_in_duckdb_spark.sources import range_source

    from pyspark.sql import Window

    r = range_source(spark, 0, 1000, 7).withColumnRenamed("id", "x")
    return r.select(
        "x",
        (F.col("x") * F.col("x")).alias("x_sq"),
        F.sum("x").over(Window.orderBy("x")).alias("run"),
    )


_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_c
FROM orders GROUP BY ALL ORDER BY ALL
""".strip()


@query("agg_group_by_all", oracle=_GROUP_BY_ALL_SQL)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (DuckDB binder sugar both engines now
    share) — the IDENTICAL SQL text runs on Spark and the oracle,
    exercising the spark.sql entry point end-to-end (SURVEY.md §3 entry
    point 1)."""
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUP_BY_ALL_SQL)


@query(
    "select_exclude_replace",
    oracle="""
    SELECT * EXCLUDE (o_orderpriority)
           REPLACE (CAST(ROUND(o_totalprice) AS BIGINT) AS o_totalprice,
                    upper(o_orderstatus) AS o_orderstatus)
    FROM orders WHERE o_orderkey < 200
    """,
)
def select_exclude_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCLUDE/REPLACE star modifiers (DuckDB binder sugar over
    the projection) — the Spark form is the rewrite itself: drop +
    withColumns on the DataFrame, producing the same projection list."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.drop("o_orderpriority").withColumns(
        {
            "o_totalprice": F.round("o_totalprice").cast("long"),
            "o_orderstatus": F.upper("o_orderstatus"),
        }
    )


_STARMOD_SQL = """
    SELECT * EXCLUDE (o_orderpriority)
           REPLACE (CAST(ROUND(o_totalprice) AS BIGINT) AS o_totalprice,
                    upper(o_orderstatus) AS o_orderstatus)
    FROM orders WHERE o_orderkey < 200
    """


@query("select_exclude_replace_sql", oracle=_STARMOD_SQL)
def select_exclude_replace_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star modifiers through the SQL entry point
    (dialect.rewrite_star_modifiers; reference test/sql/parser/
    test_exclude.test, test_replace.test): the engine accepts DuckDB\'s
    EXCLUDE/REPLACE text VERBATIM — the oracle string IS the engine
    input.  EXCLUDE maps to Spark\'s native `* EXCEPT`; REPLACE becomes
    `* EXCEPT (col), expr AS col` in the same select scope (replaced
    columns land at the end of the projection — the one documented
    divergence, invisible to the name-sorted driver compare)."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(_STARMOD_SQL)


@query(
    "agg_salted_skew_groupby",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c,
           COUNT(*) AS n,
           CAST(MAX(l_quantity) AS BIGINT) AS max_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_salted_skew_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation (operators.salted_aggregate):
    l_returnflag has only 3 values, so a plain groupBy funnels a third of
    the fact through each of 3 reducers at any scale — the salted partial
    stage spreads each hot key over 8 buckets first.  The oracle is the
    PLAIN group-by: salting must be invisible in the result (exact
    integer partials merge losslessly)."""
    from data_chunk_compaction_in_duckdb_spark.operators import salted_aggregate
    from data_chunk_compaction_in_duckdb_spark.queries.relational import _cents

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        _cents("l_extendedprice").alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    out = salted_aggregate(
        li,
        ["l_returnflag"],
        n_salts=8,
        rev_c=("sum", "cents"),
        n=("count", "cents"),
        max_qty=("max", "qty"),
    )
    return out.orderBy("l_returnflag")


@query(
    "mutation_scd2_merge",
    oracle="""
    SELECT c_custkey, segment, is_current FROM (
      SELECT c_custkey, c_mktsegment AS segment, 0 AS is_current
      FROM customer WHERE c_acctbal < 0
      UNION ALL
      SELECT c_custkey, 'DELINQUENT' AS segment, 1 AS is_current
      FROM customer WHERE c_acctbal < 0
      UNION ALL
      SELECT c_custkey, c_mktsegment AS segment, 1 AS is_current
      FROM customer WHERE c_acctbal >= 0
    ) t
    """,
)
def mutation_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension merge: an incoming snapshot reclassifies
    delinquent customers, so each changed key emits a CLOSED history row
    (is_current=0, prior segment) plus an OPEN row (new segment), while
    unchanged keys keep one current row — the MERGE INTO ... WHEN MATCHED
    pattern expressed as a branch-union over one scan.  Catalyst collapses
    the three branches into a single-pass union; no join is needed because
    the change predicate is computable from the current row."""
    c = load_table(spark, sf_dir, "customer")
    changed = F.col("c_acctbal") < 0
    closed = c.filter(changed).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).alias("is_current"),
    )
    opened = c.filter(changed).select(
        "c_custkey",
        F.lit("DELINQUENT").alias("segment"),
        F.lit(1).alias("is_current"),
    )
    kept = c.filter(~changed).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(1).alias("is_current"),
    )
    return closed.unionByName(opened).unionByName(kept)


@query(
    "scan_pyds_repeat",
    oracle="""
    SELECT CAST(g AS BIGINT) AS idx,
           concat('row_', CAST(g % 7 AS VARCHAR)) AS tag
    FROM generate_series(0, 499) t(g)
    """,
)
def scan_pyds_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python DataSource scan (Spark 4 pyspark.sql.datasource): the
    repeat/generate_series-style table function implemented as a
    registered source with real InputPartitions — a parallel generator
    scan, not a driver-side createDataFrame (reference table-function
    registry, src/function/table/).  500 rows over 5 partitions."""
    from data_chunk_compaction_in_duckdb_spark.sources import (
        register_python_sources,
    )

    register_python_sources(spark)
    return (
        spark.read.format("repeat_rows")
        .option("n", 500)
        .option("partitions", 5)
        .load()
    )


@query(
    "introspect_columns",
    oracle="""
    SELECT table_name,
           CAST(ordinal_position AS INTEGER) AS column_index,
           column_name, data_type, is_nullable
    FROM information_schema.columns
    WHERE table_name IN ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents',
                         'embeddings')
    ORDER BY table_name, column_index
    """,
)
def introspect_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_columns() / information_schema readback (introspect.py;
    reference test/sql/pg_catalog/, src/function/table/system/): the
    engine's catalog metadata for all ten fixture tables — DuckDB-named
    types, 1-based ordinals, YES/NO nullability — must equal what
    DuckDB's own information_schema reports over the same parquet.  A
    wrong type mapping (e.g. timestamp_ntz vs TIMESTAMP, array<float>
    vs FLOAT[]) or ordinal drift diverges the hash.  Schemas come from
    the named fixture loads, not listTables(), so unrelated session
    temp views never leak in."""
    from pyspark.sql.types import (
        IntegerType as _Int,
        StringType as _Str,
        StructField as _SF,
        StructType as _ST,
    )

    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_type_name,
    )

    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    rows = []
    for t in sorted(tables):
        for i, f in enumerate(load_table(spark, sf_dir, t).schema.fields):
            rows.append(
                (t, i + 1, f.name, duckdb_type_name(f.dataType),
                 "YES" if f.nullable else "NO")
            )
    schema = _ST(
        [
            _SF("table_name", _Str()),
            _SF("column_index", _Int()),
            _SF("column_name", _Str()),
            _SF("data_type", _Str()),
            _SF("is_nullable", _Str()),
        ]
    )
    return spark.createDataFrame(rows, schema)


@query(
    "introspect_sequences",
    oracle="""
    CREATE OR REPLACE SEQUENCE iq_fwd START 500 INCREMENT 7;
    CREATE OR REPLACE SEQUENCE iq_rev INCREMENT -3 MINVALUE -100000 MAXVALUE 90;
    CREATE OR REPLACE SEQUENCE iq_cyc START 2 MINVALUE 1 MAXVALUE 5 CYCLE;
    CREATE OR REPLACE SEQUENCE iq_fresh START 42;
    SELECT nextval('iq_fwd') AS a, nextval('iq_rev') AS b
    FROM customer WHERE c_custkey % 100 = 0;
    SELECT nextval('iq_cyc') FROM range(7);
    SELECT sequence_name, start_value, min_value, max_value,
           increment_by, cycle, last_value
    FROM duckdb_sequences()
    WHERE sequence_name LIKE 'iq!_%' ESCAPE '!'
    ORDER BY sequence_name
    """,
)
def introspect_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_sequences() readback vs DuckDB's OWN duckdb_sequences()
    (introspect.py duckdb_sequences; reference src/function/table/
    system/duckdb_sequences.cpp, test/sql/catalog/sequence/) — the
    oracle literally CREATEs the same four sequences in DuckDB, replays
    the same allocations (one per filtered customer row for the
    ascending/descending pair — data-dependent, so last_value moves
    with SF — plus a 7-step wrapping CYCLE claim and one untouched
    sequence whose last_value must be NULL), then reads DuckDB's real
    catalog function.  Divergent wrap anchoring, exhaustion handling,
    bound defaults, or a stale last_value all hash-mismatch."""
    import shutil
    import tempfile

    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_sequences,
    )
    from data_chunk_compaction_in_duckdb_spark.storage import (
        Sequence,
        with_sequence,
    )

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 100 == 0
    )
    root = tempfile.mkdtemp(prefix="iq_seq_")
    try:
        fwd = Sequence.create(
            spark, root + "/iq_fwd", start=500, increment=7
        )
        rev = Sequence.create(
            spark, root + "/iq_rev", increment=-3, minvalue=-100000,
            maxvalue=90,
        )
        cyc = Sequence.create(
            spark, root + "/iq_cyc", start=2, minvalue=1, maxvalue=5,
            cycle=True,
        )
        fresh = Sequence.create(spark, root + "/iq_fresh", start=42)
        # the claims ARE the side effect under test (with_sequence
        # commits eagerly; the numbered DataFrame itself is unused)
        with_sequence(
            with_sequence(cust, fwd, "a", order=["c_custkey"]),
            rev,
            "b",
            order=["c_custkey"],
        )
        cyc.claim(7)
        # duckdb_sequences reads each head manifest eagerly into driver
        # rows, so the result has no dependency on the tmpdir
        out = duckdb_sequences(spark, [fwd, rev, cyc, fresh])
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


@query(
    "introspect_indexes",
    oracle="""
    CREATE OR REPLACE TABLE nt_nation AS SELECT * FROM nation;
    CREATE OR REPLACE TABLE nt_supplier AS SELECT * FROM supplier;
    CREATE OR REPLACE TABLE nt_customer AS SELECT * FROM customer;
    CREATE INDEX ntidx_nation_region ON nt_nation(n_regionkey);
    CREATE INDEX ntidx_supplier_nat ON nt_supplier(s_nationkey, s_suppkey);
    CREATE UNIQUE INDEX ntidx_customer_key ON nt_customer(c_custkey);
    SELECT schema_name, index_name, table_name, is_unique, is_primary, sql
    FROM duckdb_indexes()
    WHERE index_name LIKE \'ntidx!_%\' ESCAPE \'!\'
    ORDER BY index_name
    """,
)
def introspect_indexes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_indexes() readback vs DuckDB\'s OWN duckdb_indexes()
    (introspect.py duckdb_indexes; reference src/function/table/system/
    duckdb_indexes.cpp) — the oracle literally CREATEs the same three
    indexes (plain single-column, composite, UNIQUE) on copies of the
    same tables in DuckDB and reads its real catalog function; the
    engine side runs Engine.create_index (the bucketed ART analog,
    which also validates the UNIQUE constraint on creation) and reads
    the engine catalog.  Name, table, uniqueness flags and DuckDB\'s
    canonical sql rendering must all agree."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    eng = Engine(spark=spark, sf_dir=sf_dir)
    try:
        eng.tables["nt_nation"] = load_table(spark, sf_dir, "nation")
        eng.tables["nt_supplier"] = load_table(spark, sf_dir, "supplier")
        eng.tables["nt_customer"] = load_table(spark, sf_dir, "customer")
        root = retained_tmpdir("ntidx_q_")
        eng.create_index(
            "nt_nation", ["n_regionkey"], root + "/n", n_buckets=4,
            name="ntidx_nation_region",
        )
        eng.create_index(
            "nt_supplier", ["s_nationkey", "s_suppkey"], root + "/s",
            n_buckets=4, name="ntidx_supplier_nat",
        )
        eng.create_index(
            "nt_customer", ["c_custkey"], root + "/c", n_buckets=4,
            name="ntidx_customer_key", unique=True,
        )
        # duckdb_indexes reads engine metadata eagerly into driver rows
        return eng.duckdb_indexes()
    finally:
        # restore the plain fixture views for session neighbors
        from data_chunk_compaction_in_duckdb_spark import catalog as _c

        _c.register_views(spark, sf_dir)


@query(
    "introspect_constraints",
    oracle="""
    CREATE OR REPLACE TABLE ctq_t (k BIGINT PRIMARY KEY,
                                   name VARCHAR NOT NULL,
                                   nk INTEGER CHECK (nk > 0));
    INSERT INTO ctq_t
      SELECT c_custkey, c_name, CAST(c_nationkey + 1 AS INTEGER)
      FROM customer;
    CREATE OR REPLACE TABLE ctq_u (r BIGINT, k BIGINT, PRIMARY KEY (r, k));
    INSERT INTO ctq_u SELECT n_regionkey, n_nationkey FROM nation;
    SELECT table_name, constraint_type, constraint_text,
           array_to_string(constraint_column_names, ',')
               AS constraint_column_names
    FROM duckdb_constraints()
    WHERE table_name IN (\'ctq_t\', \'ctq_u\')
    ORDER BY table_name, constraint_type, constraint_text
    """,
)
def introspect_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_constraints() readback vs DuckDB\'s OWN catalog function
    (introspect.duckdb_constraints; reference src/function/table/system/
    duckdb_constraints.cpp): the oracle declares the same constraints
    (single- and multi-column PRIMARY KEY, NOT NULL, single-column
    CHECK) on real DuckDB tables and INSERTs the same fixture rows —
    both engines therefore also VALIDATE the data against the
    constraints before the readback (a violating row errors the query
    on either side).  Canonical text (\'PRIMARY KEY(a, b)\',
    \'CHECK((expr))\') and the implied per-PK-column NOT NULL rows
    must agree."""
    import shutil
    import tempfile

    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_constraints,
    )
    from data_chunk_compaction_in_duckdb_spark.storage import (
        VersionedTable,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        (F.col("c_nationkey") + 1).cast("int").alias("nk"),
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_regionkey").alias("r"), F.col("n_nationkey").alias("k")
    )
    root = tempfile.mkdtemp(prefix="ctq_")
    try:
        t = VersionedTable.create(
            spark, root + "/t", cust,
            constraints=[
                {"type": "primary_key", "columns": ["k"]},
                {"type": "not_null", "column": "name"},
                {"type": "check", "expr": "nk > 0"},
            ],
        )
        u = VersionedTable.create(
            spark, root + "/u", nat,
            constraints=[{"type": "primary_key", "columns": ["r", "k"]}],
        )
        # the readback is metadata-only driver rows; the tmpdir can go.
        # Serialize the LIST column for the driver canon (which cannot
        # hash raw list cells) — the catalog function itself keeps the
        # ArrayType to mirror DuckDB's duckdb_constraints() schema.
        return duckdb_constraints(spark, {"ctq_t": t, "ctq_u": u}).select(
            "table_name",
            "constraint_type",
            "constraint_text",
            F.array_join("constraint_column_names", ",").alias(
                "constraint_column_names"
            ),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "introspect_settings",
    oracle="""
    SET threads=7;
    SET TimeZone='Asia/Tokyo';
    SET memory_limit='2GB';
    SET default_collation='nocase';
    SET enable_progress_bar=true;
    CREATE OR REPLACE TEMP TABLE __settings_snap AS
      SELECT name, value, description, input_type FROM duckdb_settings()
      WHERE name IN ('threads', 'memory_limit', 'TimeZone',
                     'default_collation', 'enable_progress_bar');
    RESET threads;
    RESET TimeZone;
    RESET memory_limit;
    RESET default_collation;
    RESET enable_progress_bar;
    SELECT * FROM __settings_snap
    """,
)
def introspect_settings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_settings() readback vs DuckDB's OWN catalog function
    (engine settings surface; reference src/main/settings/settings.cpp,
    src/function/table/system/duckdb_settings.cpp, test/sql/settings/).
    Both engines SET the same five knobs, snapshot the catalog rows
    (value text must match byte-for-byte, incl. DuckDB's binary-unit
    memory rendering '2GB' -> '1.8 GiB'), then RESET so neither session
    leaks the values into its batch neighbors.  ``scope`` is projected
    away: DuckDB flips it GLOBAL->LOCAL depending on where the current
    value came from, which is connection-history, not catalog, state."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    old_threads = spark.conf.get("spark.sql.shuffle.partitions")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        for stmt in (
            "SET threads=7",
            "SET TimeZone='Asia/Tokyo'",
            "SET memory_limit='2GB'",
            "SET default_collation='nocase'",
            "SET enable_progress_bar=true",
        ):
            eng.sql(stmt)
        # rows are driver-built literals — materialized before restore
        return eng.duckdb_settings().select(
            "name", "value", "description", "input_type"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_threads)
        spark.conf.set("spark.sql.session.timeZone", old_tz)


@query(
    "introspect_table_info",
    oracle="""
    CREATE OR REPLACE TABLE pti_t (k BIGINT PRIMARY KEY,
                                   name VARCHAR NOT NULL,
                                   nk INTEGER, bal DOUBLE);
    INSERT INTO pti_t
      SELECT c_custkey, c_name, CAST(c_nationkey AS INTEGER), c_acctbal
      FROM customer;
    SELECT cid, name, type, "notnull", dflt_value, pk
    FROM pragma_table_info('pti_t')
    """,
)
def introspect_table_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pragma_table_info readback vs DuckDB's OWN table function
    (introspect.pragma_table_info; reference keeps SQLite's
    cid/name/type/notnull/dflt_value/pk shape): same columns, same
    declared constraints, fixture rows INSERTed on the oracle side so
    DuckDB also validates them — ordinal order, DuckDB-named types and
    the PK-implies-notnull rendering must agree."""
    import shutil
    import tempfile

    from data_chunk_compaction_in_duckdb_spark.introspect import (
        pragma_table_info,
    )
    from data_chunk_compaction_in_duckdb_spark.storage import (
        VersionedTable,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").cast("int").alias("nk"),
        F.col("c_acctbal").alias("bal"),
    )
    root = tempfile.mkdtemp(prefix="pti_")
    try:
        t = VersionedTable.create(
            spark, root + "/t", cust,
            constraints=[
                {"type": "primary_key", "columns": ["k"]},
                {"type": "not_null", "column": "name"},
            ],
        )
        return pragma_table_info(spark, t)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "prepared_execute_params",
    oracle="""
    PREPARE r8_pq AS
      SELECT o_orderstatus AS st, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS keysum
      FROM orders
      WHERE o_orderkey % $1 = $2 AND o_totalprice > $3
      GROUP BY o_orderstatus ORDER BY st;
    EXECUTE r8_pq(7, 3, 1000.0)
    """,
)
def prepared_execute_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREPARE/EXECUTE parity (prepared.py; reference
    src/main/prepared_statement.cpp, test/sql/prepared/): BOTH engines
    run the literal PREPARE then EXECUTE with three numbered
    parameters — the oracle through DuckDB's real prepared-statement
    machinery, the engine through prepared.py's marker rewrite +
    literal-Column binding (never string interpolation).  A
    mis-numbered marker, wrong binding order, or type-lossy fold
    diverges the per-status counts and key sums."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql(
        "PREPARE r8_pq AS "
        "SELECT o_orderstatus AS st, count(*) AS n, "
        "CAST(sum(o_orderkey) AS BIGINT) AS keysum "
        "FROM orders "
        "WHERE o_orderkey % $1 = $2 AND o_totalprice > $3 "
        "GROUP BY o_orderstatus ORDER BY st"
    )
    return eng.sql("EXECUTE r8_pq(7, 3, 1000.0)")


@query(
    "introspect_keywords",
    oracle="""
    SELECT keyword_name, keyword_category FROM duckdb_keywords()
    ORDER BY keyword_name
    """,
)
def introspect_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_keywords() readback vs DuckDB's OWN catalog function
    (introspect.duckdb_keywords; reference src/function/table/system/
    duckdb_keywords.cpp): the engine's full keyword/category table —
    the classification its identifier-quoting renderer uses — must
    equal the real parser catalog row-for-row (479 rows, 4 classes)."""
    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_keywords,
    )

    return duckdb_keywords(spark).orderBy("keyword_name")


@query(
    "introspect_types",
    oracle="""
    SELECT DISTINCT type_name, type_size, logical_type, type_category
    FROM duckdb_types()
    WHERE database_name = 'memory' AND schema_name = 'main' AND internal
    ORDER BY type_name
    """,
)
def introspect_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_types() readback vs DuckDB's OWN catalog function
    (introspect.duckdb_types; reference src/function/table/system/
    duckdb_types.cpp): the built-in type table — name, physical size,
    logical type id, category — for the main catalog; oids are
    connection-specific and excluded on both sides."""
    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_types,
    )

    return duckdb_types(spark).orderBy("type_name")


@query(
    "introspect_schemas",
    oracle="""
    CREATE SCHEMA IF NOT EXISTS r8sch;
    SELECT database_name, schema_name, internal
    FROM duckdb_schemas()
    ORDER BY database_name, schema_name
    """,
)
def introspect_schemas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_schemas() readback vs DuckDB's OWN catalog function
    (introspect.duckdb_schemas; reference src/function/table/system/
    duckdb_schemas.cpp): the fresh-connection layout (three databases x
    three internal schemas) plus one user-created schema through the
    engine's CREATE SCHEMA dispatch — internal flags and sort order
    must agree."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql("CREATE SCHEMA IF NOT EXISTS r8sch")
    return eng.duckdb_schemas().select(
        "database_name", "schema_name", "internal"
    )


@query(
    "introspect_functions",
    oracle="""
    SELECT DISTINCT function_name, function_type
    FROM duckdb_functions()
    WHERE function_name IN (
      'abs','upper','lower','trim','replace','reverse','concat','substr',
      'length','round','floor','ceil','sqrt','ln','exp','sign','mod','pow',
      'greatest','least','nullif','date_trunc','date_part','year','month',
      'day','last_day','strftime','regexp_matches','regexp_replace',
      'regexp_extract','list_extract','list_contains','unnest','contains',
      'starts_with','string_split','md5','hash','levenshtein','jaccard',
      'hamming','jaro_winkler_similarity','damerau_levenshtein','sum','avg',
      'count','min','max','median','mode','entropy','histogram','corr',
      'covar_pop','stddev','variance','arg_min','arg_max','string_agg',
      'bool_and','bool_or','bit_and','bit_or','product','quantile_cont',
      'quantile_disc','mad','approx_count_distinct','approx_quantile',
      'reservoir_quantile','nextval','currval','range','generate_series',
      'repeat','read_parquet','read_csv','glob')
    ORDER BY function_name, function_type
    """,
)
def introspect_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_functions() readback at the deterministic
    (function_name, function_type) grain (introspect.FUNCTION_CATALOG;
    reference src/function/table/system/duckdb_functions.cpp): every
    function the engine claims — scalar/aggregate/table/macro — must
    carry the SAME classification in DuckDB's real catalog, including
    the dual-typed scalar+table generators (range/generate_series/
    repeat) and nullif's macro kind."""
    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_functions,
    )

    return duckdb_functions(spark).orderBy(
        "function_name", "function_type"
    )


@query(
    "introspect_tables",
    oracle="""
    CREATE OR REPLACE TABLE r8t_a (k BIGINT PRIMARY KEY,
                                   name VARCHAR NOT NULL,
                                   nk INTEGER CHECK (nk > 0));
    INSERT INTO r8t_a
      SELECT c_custkey, c_name, CAST(c_nationkey + 1 AS INTEGER)
      FROM customer;
    CREATE OR REPLACE TABLE r8t_b (r BIGINT, k BIGINT, PRIMARY KEY (r, k));
    INSERT INTO r8t_b SELECT n_regionkey, n_nationkey FROM nation;
    CREATE OR REPLACE TABLE r8t_c AS
      SELECT r_regionkey, r_name FROM region;
    CREATE INDEX r8t_ci ON r8t_c(r_regionkey);
    SELECT database_name, schema_name, table_name, internal, temporary,
           has_primary_key, CAST(estimated_size AS BIGINT) AS estimated_size,
           CAST(column_count AS BIGINT) AS column_count,
           CAST(index_count AS BIGINT) AS index_count,
           CAST(check_constraint_count AS BIGINT) AS check_constraint_count,
           sql
    FROM duckdb_tables()
    WHERE table_name LIKE 'r8t!_%' ESCAPE '!'
    ORDER BY table_name
    """,
)
def introspect_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_tables() readback vs DuckDB's OWN catalog function
    (introspect.duckdb_tables; reference src/function/table/system/
    duckdb_tables.cpp): three tables covering inline single-column
    PRIMARY KEY (+ its implicit index), NOT NULL on a quoted-keyword
    column name, a CHECK, a table-level multi-column PRIMARY KEY, and
    a plain table carrying a CREATE INDEX.  estimated_size (exact row
    count — the engine reads parquet FOOTERS only), counts, flags and
    DuckDB's canonical CREATE TABLE rendering must all agree."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine
    from data_chunk_compaction_in_duckdb_spark.introspect import (
        duckdb_tables,
    )
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )
    from data_chunk_compaction_in_duckdb_spark.storage import (
        VersionedTable,
    )

    eng = Engine(spark=spark, sf_dir=sf_dir)
    root = retained_tmpdir("r8t_q_")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        (F.col("c_nationkey") + 1).cast("int").alias("nk"),
    )
    a = VersionedTable.create(
        spark, root + "/a", cust,
        constraints=[
            {"type": "primary_key", "columns": ["k"]},
            {"type": "not_null", "column": "name"},
            {"type": "check", "expr": "nk > 0"},
        ],
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_regionkey").cast("bigint").alias("r"),
        F.col("n_nationkey").cast("bigint").alias("k"),
    )
    b = VersionedTable.create(
        spark, root + "/b", nat,
        constraints=[{"type": "primary_key", "columns": ["r", "k"]}],
    )
    reg = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    c = VersionedTable.create(spark, root + "/c", reg)
    eng.tables["r8t_c"] = c.read()
    c.read().createOrReplaceTempView("r8t_c")
    eng.create_index(
        "r8t_c", ["r_regionkey"], root + "/ci", n_buckets=2, name="r8t_ci"
    )
    try:
        return duckdb_tables(
            spark,
            {"r8t_a": a, "r8t_b": b, "r8t_c": c},
            getattr(eng, "_art_indexes", {}),
        )
    finally:
        # create_index rebound r8t_c; restore plain fixture views for
        # session neighbors
        from data_chunk_compaction_in_duckdb_spark import catalog as _c

        _c.register_views(spark, sf_dir)


@query(
    "introspect_views",
    oracle="""
    CREATE OR REPLACE VIEW r8v_a AS
      SELECT o_orderkey, o_custkey FROM orders WHERE (o_orderkey > 100);
    CREATE OR REPLACE VIEW r8v_b AS SELECT upper(r_name) AS rn FROM region;
    CREATE OR REPLACE VIEW r8v_c AS
      SELECT n_nationkey AS k, n_name FROM nation
      ORDER BY n_nationkey LIMIT 5;
    SELECT database_name, schema_name, view_name, internal, temporary,
           CAST(column_count AS BIGINT) AS column_count, sql
    FROM duckdb_views()
    WHERE view_name LIKE 'r8v!_%' ESCAPE '!'
    ORDER BY view_name
    """,
)
def introspect_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duckdb_views() readback vs DuckDB's OWN catalog function
    (introspect.duckdb_views; reference src/function/table/system/
    duckdb_views.cpp): three views created through the engine's CREATE
    VIEW dispatch — DuckDB stores the DEPARSE of the parsed body, so
    the bodies are written in round-trip form (explicit parens on the
    comparison, no count(*) shorthand) and the stored sql, resolved
    column counts and flags must agree byte-for-byte."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.sql(
        "CREATE OR REPLACE VIEW r8v_a AS SELECT o_orderkey, o_custkey "
        "FROM orders WHERE (o_orderkey > 100)"
    )
    eng.sql(
        "CREATE OR REPLACE VIEW r8v_b AS SELECT upper(r_name) AS rn "
        "FROM region"
    )
    eng.sql(
        "CREATE OR REPLACE VIEW r8v_c AS SELECT n_nationkey AS k, n_name "
        "FROM nation ORDER BY n_nationkey LIMIT 5"
    )
    return eng.duckdb_views()


@query(
    "introspect_info_schema_tables",
    oracle="""
    CREATE OR REPLACE TABLE ist_t AS
      SELECT n_nationkey AS k, n_name AS v FROM nation;
    CREATE OR REPLACE VIEW ist_v AS SELECT k, upper(v) AS uv FROM ist_t;
    SELECT table_catalog, table_schema, table_name, table_type
    FROM information_schema.tables
    WHERE table_name LIKE 'ist!_%' ESCAPE '!'
    ORDER BY table_name
    """,
)
def introspect_info_schema_tables(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """information_schema.tables readback vs DuckDB's OWN view
    (introspect.information_schema_tables; reference test/sql/
    pg_catalog/sqlalchemy.test): one engine table and one view created
    through the same DDL on both engines — catalog/schema names and
    the BASE TABLE / VIEW kind classification must agree."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine
    from data_chunk_compaction_in_duckdb_spark.introspect import (
        information_schema_tables,
    )
    from data_chunk_compaction_in_duckdb_spark.queries.registry import (
        retained_tmpdir,
    )

    eng = Engine(spark=spark, sf_dir=sf_dir)
    base = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"), F.col("n_name").alias("v")
    )
    root = retained_tmpdir("ist_q_")
    eng.create_versioned_table("ist_t", base, root + "/t")
    eng.sql("CREATE OR REPLACE VIEW ist_v AS SELECT k, upper(v) AS uv FROM ist_t")
    return information_schema_tables(
        spark, getattr(eng, "_versioned", {}), getattr(eng, "_views", {})
    )


_DIALECT_EXPR_SQL = """
    SELECT event_id,
           CAST(props ->> 'k' AS BIGINT) AS k_num,
           props -> 'k' AS k_json,
           event_type[1:4] AS et_head,
           event_type[-2:] AS et_tail,
           event_id // 100 AS bucket,
           [event_id % 3, event_id % 5][2] AS pick
    FROM events
    WHERE event_type SIMILAR TO '(view|click|purchase)'
      AND CAST(props ->> 'k' AS BIGINT) // 10 >= 2
    ORDER BY event_id
    LIMIT 500
    """


@query("dialect_expr_rewrites", oracle=_DIALECT_EXPR_SQL)
def dialect_expr_rewrites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB expression grammar through the SQL entry point
    (dialect.rewrite_expressions; reference src/parser/transform/
    expression/, test/sql/json/, test/sql/types/string/): the engine
    accepts DuckDB's ``->``/``->>`` JSON arrows, 1-based string slicing
    ``s[a:b]``, list literals + 1-based indexing ``[..][n]``, full-match
    ``SIMILAR TO`` and ``//`` integer division VERBATIM — the oracle
    string IS the engine input.  Arrows map to get_json_object /
    variant_get (JVM-side, codegen'd), slices to substring, so the
    rewritten plan is pure Catalyst — no UDF, scale-invariant."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(_DIALECT_EXPR_SQL)


_DIALECT_FN_SQL = """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m') AS ym,
           date_diff('day', o_orderdate, DATE '1998-12-31') AS days_left,
           date_diff('month', o_orderdate, DATE '1998-12-31') AS months_left,
           string_split(o_orderpriority, '-')[1] AS prio_code,
           list_max([o_orderkey % 7, o_orderkey % 5, 2]) AS pick
    FROM orders
    WHERE starts_with(o_orderpriority, '1')
      AND regexp_matches(o_orderstatus, 'F|O')
    ORDER BY o_orderkey
    LIMIT 400
    """


@query("dialect_fn_rewrites", oracle=_DIALECT_FN_SQL)
def dialect_fn_rewrites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB function-name surface through the SQL entry point
    (dialect._rw_fn_aliases/_rw_fn_complex; reference
    src/function/scalar/, test/sql/function/): strftime format
    translation, boundary-count date_diff, string_split with a literal
    separator, list literals + list_max, starts_with and
    regexp_matches — the oracle string IS the engine input.  Every
    rewrite lands on a Spark built-in (JVM codegen), so the plan is
    identical to hand-written Spark SQL at any scale."""
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, sf_dir=sf_dir)
    return eng.sql(_DIALECT_FN_SQL)
