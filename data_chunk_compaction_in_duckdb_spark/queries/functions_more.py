"""Scalar-function coverage tail — format/printf, timestamp parsing,
interval arithmetic, extended list functions (SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "fn_format_printf",
    oracle="""
    SELECT s_suppkey,
           printf('%d:%s', s_suppkey, s_name) AS tagged,
           printf('%05d', CAST(s_suppkey AS INT)) AS padded,
           printf('%.3f', s_acctbal) AS fixed3,
           concat(s_name, '/', CAST(s_nationkey AS VARCHAR)) AS joined
    FROM supplier
    """,
)
def fn_format_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf/format (src/function/scalar/string printf family) =
    format_string (both use C-style %-formatting)."""
    supp = load_table(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.format_string("%d:%s", "s_suppkey", "s_name").alias("tagged"),
        F.format_string("%05d", F.col("s_suppkey").cast("int")).alias("padded"),
        F.format_string("%.3f", "s_acctbal").alias("fixed3"),
        F.concat(
            "s_name", F.lit("/"), F.col("s_nationkey").cast("string")
        ).alias("joined"),
    )


@query(
    "fn_timestamp_parse",
    oracle="""
    SELECT event_id,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS reparsed,
           CAST(strptime('2024-' || lpad(CAST(1 + event_id % 12 AS VARCHAR), 2, '0')
                         || '-15', '%Y-%m-%d') AS TIMESTAMP) AS built,
           CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts
    FROM events WHERE event_id <= 150
    """,
)
def fn_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strptime/to_timestamp round-trip (strftime_format.cpp) — format
    strings translated %Y-%m-%d ↔ yyyy-MM-dd."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 150)
    return ev.select(
        "event_id",
        F.to_timestamp(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd HH:mm:ss"
        ).cast("timestamp_ntz").alias("reparsed"),
        F.to_timestamp(
            F.concat(
                F.lit("2024-"),
                F.lpad((1 + F.col("event_id") % 12).cast("string"), 2, "0"),
                F.lit("-15"),
            ),
            "yyyy-MM-dd",
        ).cast("timestamp_ntz").alias("built"),
        F.col("ts").cast("date").cast("timestamp_ntz").alias("day_ts"),
    )


@query(
    "fn_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus_3m,
           CAST(o_orderdate - INTERVAL 45 DAY AS TIMESTAMP) AS minus_45d,
           CAST(o_orderdate + INTERVAL 1 YEAR + INTERVAL 2 HOUR AS TIMESTAMP) AS plus_1y2h,
           datediff('month', o_orderdate, TIMESTAMP '2002-01-01') AS months_to_2002,
           age(TIMESTAMP '2002-01-01', o_orderdate) > INTERVAL 2 YEAR AS older_than_2y
    FROM orders WHERE o_orderkey <= 200
    """,
)
def fn_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL arithmetic + date_diff months + age comparison
    (core_functions/scalar/date)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 200)
    od = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.add_months(od, 3).cast("timestamp_ntz").alias("plus_3m"),
        F.date_sub(od.cast("date"), 45).cast("timestamp_ntz").alias("minus_45d"),
        (F.add_months(od, 12).cast("timestamp_ntz") + F.expr("INTERVAL 2 HOURS")).alias(
            "plus_1y2h"
        ),
        # months_between(floor) == DuckDB datediff('month'): month-boundary count
        (
            (F.lit(2002) * 12 + 1) - (F.year(od) * 12 + F.month(od))
        ).cast("bigint").alias("months_to_2002"),
        (od < F.lit("2000-01-01").cast("timestamp_ntz")).alias("older_than_2y"),
    )


@query(
    "fn_list_extended",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_transform(prices[2:3],
               x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS sliced,
           len(flatten([prices, prices])) AS flat_len,
           list_contains(prices, prices[1]) AS has_first,
           list_position(prices, prices[1]) AS pos_first,
           array_to_string(list_transform(list_reverse(list_sort(prices)),
               x -> CAST(CAST(x AS DECIMAL(18,2)) AS VARCHAR)), ',') AS sorted_desc,
           array_to_string(list_transform(generate_series(1, 3),
               x -> CAST(x * 10 AS VARCHAR)), ',') AS seq_x10
    FROM (
      SELECT o_custkey,
             list_sort(list(ROUND(o_totalprice, 2)), 'DESC') AS prices
      FROM orders WHERE o_custkey <= 60 GROUP BY o_custkey
      HAVING COUNT(*) >= 3
    ) t
    """,
)
def fn_list_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended list surface: slice, flatten, contains, position,
    reverse-sort, sequence (core_functions/scalar/list).

    Array-valued outputs are serialized to delimited strings with a
    fixed DECIMAL(18,2) rendering on BOTH sides: the driver's pandas
    canon cannot sort/hash raw list cells (round-6 ERR class), and a
    fixed-scale decimal print avoids float-repr divergence between
    the engines. The list ops themselves stay fully exercised."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 60)
    prices = F.reverse(F.array_sort(F.collect_list(F.round("o_totalprice", 2))))
    g = (
        orders.groupBy("o_custkey")
        .agg(prices.alias("prices"), F.count("*").alias("_n"))
        .filter(F.col("_n") >= 3)
    )

    def _csv2(col):  # fixed-scale decimal rendering, comma-joined
        return F.array_join(
            F.transform(col, lambda x: x.cast("decimal(18,2)").cast("string")), ","
        )

    return g.select(
        "o_custkey",
        _csv2(F.slice("prices", 2, 2)).alias("sliced"),
        F.size(F.flatten(F.array("prices", "prices"))).alias("flat_len"),
        F.array_contains("prices", F.element_at("prices", 1)).alias("has_first"),
        F.array_position("prices", F.element_at("prices", 1)).alias("pos_first"),
        _csv2(F.reverse(F.array_sort("prices"))).alias("sorted_desc"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda x: (x * 10).cast("string"),
            ),
            ",",
        ).alias("seq_x10"),
    )


@query(
    "agg_bitstring",
    oracle="""
    SELECT l_returnflag,
           CAST(bitstring_agg(CAST(FLOOR(l_quantity) AS BIGINT), 1, 50)
                AS VARCHAR) AS bitstring
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bitstring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bitstring_agg (function_list.cpp registry; BIT rendered as text) —
    presence bitmap of floored quantities over the domain [1, 50]."""
    from data_chunk_compaction_in_duckdb_spark.functions import bitstring_agg

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_q", F.floor("l_quantity").cast("long")
    )
    return bitstring_agg(li, "_q", ["l_returnflag"], 1, 50)


@query(
    "fn_datetime_parts_extended",
    oracle="""
    SELECT o_orderkey,
           CAST(decade(o_orderdate) AS BIGINT) AS dec,
           CAST(century(o_orderdate) AS BIGINT) AS cent,
           CAST(millennium(o_orderdate) AS BIGINT) AS mill,
           CAST(epoch(o_orderdate) AS BIGINT) AS ep,
           CAST(isoyear(o_orderdate) AS BIGINT) AS iso_y,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
    FROM orders WHERE o_orderkey < 100
    """,
)
def fn_datetime_parts_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named date parts beyond year/month/day (date_part registry,
    core_functions/scalar/date): decade/century/millennium computed as
    expressions (Spark has no built-ins), epoch via TZ-free ntz timestampdiff,
    ISO year/quarter/day-of-year native."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    y = F.year("o_orderdate")
    return o.select(
        "o_orderkey",
        F.floor(y / 10).cast("long").alias("dec"),
        F.ceil(y / 100.0).cast("long").alias("cent"),
        F.ceil(y / 1000.0).cast("long").alias("mill"),
        F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)").cast("long").alias("ep"),
        F.expr("extract(yearofweek FROM o_orderdate)").cast("long").alias("iso_y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
    )


@query(
    "fn_bit_ops",
    oracle="""
    SELECT p_partkey,
           p_partkey & 2730 AS b_and,
           p_partkey | 5 AS b_or,
           xor(p_partkey, 170) AS b_xor,
           p_partkey << 2 AS shl,
           p_partkey >> 1 AS shr,
           (p_partkey >> 4) & 1 AS bit4,
           decode(unhex(hex(encode(p_name)))) AS hex_rt,
           decode(from_base64(to_base64(encode(p_name)))) AS b64_rt,
           ends_with(p_type, 'ARD') AS is_standard,
           unicode(p_name) AS first_cp
    FROM part WHERE p_partkey <= 200
    """,
)
def fn_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise-operator family (src/function/scalar/operators, get_bit via
    shift-and-mask) plus blob round-trips hex/unhex, base64/from_base64
    (core_functions/scalar/blob) and suffix/unicode
    (src/function/scalar/string)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return part.select(
        "p_partkey",
        F.expr("p_partkey & 2730").alias("b_and"),
        F.expr("p_partkey | 5").alias("b_or"),
        F.expr("p_partkey ^ 170").alias("b_xor"),
        F.shiftleft(F.col("p_partkey"), 2).alias("shl"),
        F.shiftright(F.col("p_partkey"), 1).alias("shr"),
        F.expr("getbit(p_partkey, 4)").cast("int").alias("bit4"),
        F.expr("decode(unhex(hex(encode(p_name, 'UTF-8'))), 'UTF-8')").alias(
            "hex_rt"
        ),
        F.expr(
            "decode(unbase64(base64(encode(p_name, 'UTF-8'))), 'UTF-8')"
        ).alias("b64_rt"),
        F.expr("endswith(p_type, 'ARD')").alias("is_standard"),
        F.ascii("p_name").alias("first_cp"),
    )


@query(
    "fn_math_edge",
    oracle="""
    SELECT s_suppkey,
           even(s_acctbal / 100) AS ev,
           signbit(s_acctbal - 3000) AS sb,
           ROUND(cot(1.0 + s_suppkey % 7), 10) AS ct,
           isinf(CAST('Infinity' AS DOUBLE) * sign(1 + s_suppkey % 3))
             AS is_inf,
           isfinite(s_acctbal) AS is_fin,
           nextafter(CAST(s_suppkey AS DOUBLE), 1e18) AS na
    FROM supplier
    """,
)
def fn_math_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-edge family (core_functions/scalar/math): even (round away
    from zero to the next even integer — 2*ceil/floor(x/2) expression),
    signbit (x<0: the fixture has no negative zero), cot, isinf/isfinite
    via infinity literals, nextafter (numpy pandas UDF — bit-level float
    stepping has no JVM builtin)."""
    from data_chunk_compaction_in_duckdb_spark.functions import nextafter_udf

    s = load_table(spark, sf_dir, "supplier")
    x = F.col("s_acctbal") / 100
    inf = F.lit(float("inf"))
    return s.select(
        "s_suppkey",
        F.when(x >= 0, 2 * F.ceil(x / 2)).otherwise(2 * F.floor(x / 2))
        .cast("double")
        .alias("ev"),
        (F.col("s_acctbal") - 3000 < 0).alias("sb"),
        F.round(F.cot(1.0 + F.col("s_suppkey") % 7), 10).alias("ct"),
        (
            (inf * F.signum(1 + F.col("s_suppkey") % 3)) == inf
        ).alias("is_inf"),
        (~F.isnan("s_acctbal") & (F.abs("s_acctbal") != inf)).alias("is_fin"),
        nextafter_udf(
            F.col("s_suppkey").cast("double"), F.lit(1e18)
        ).alias("na"),
    )


@query(
    "fn_inet_ops",
    oracle="""
    WITH ips AS (
      SELECT c_mktsegment,
             '10.' || CAST(c_custkey % 200 AS VARCHAR) || '.'
                   || CAST((c_custkey // 7) % 256 AS VARCHAR) || '.'
                   || CAST(c_custkey % 256 AS VARCHAR) AS ip,
             CAST(10 * 16777216 + (c_custkey % 200) * 65536
                  + ((c_custkey // 7) % 256) * 256
                  + (c_custkey % 256) AS BIGINT) AS addr
      FROM customer
    )
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN addr >= 10 * 16777216 + 57 * 65536
                          AND addr < 10 * 16777216 + 58 * 65536
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_in_cidr,
           CAST(MIN(addr) AS BIGINT) AS min_addr,
           CAST((MIN(addr) // 16777216) % 256 AS VARCHAR) || '.'
             || CAST((MIN(addr) // 65536) % 256 AS VARCHAR) || '.'
             || CAST((MIN(addr) // 256) % 256 AS VARCHAR) || '.'
             || CAST(MIN(addr) % 256 AS VARCHAR) AS min_ip
    FROM ips
    GROUP BY c_mktsegment
    """,
)
def fn_inet_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 functions (reference extension/inet, test/sql/inet): INET as
    uint32-in-BIGINT — inet_aton/inet_ntoa round trip and CIDR
    containment (`<<=`) as pure integer arithmetic over synthetic
    addresses derived from customer keys.  The oracle replays the same
    integer math; containment for 10.57.0.0/16 is the addr-range check
    the functions module compiles CIDR literals into."""
    from data_chunk_compaction_in_duckdb_spark.functions.inet import (
        inet_aton,
        inet_contains,
        inet_ntoa,
    )

    c = load_table(spark, sf_dir, "customer")
    ips = c.select(
        "c_mktsegment",
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("c_custkey") % 200).cast("string"),
            ((F.col("c_custkey") / 7).cast("long") % 256).cast("string"),
            (F.col("c_custkey") % 256).cast("string"),
        ).alias("ip"),
    ).withColumn("addr", inet_aton("ip"))
    return ips.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(inet_contains("10.57.0.0/16", F.col("ip")), 1).otherwise(0)
        ).cast("long").alias("n_in_cidr"),
        F.min("addr").alias("min_addr"),
        inet_ntoa(F.min("addr")).alias("min_ip"),
    )


@query(
    "fn_excel_text",
    oracle="""
    WITH v AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey <= 100
    )
    SELECT o_orderkey,
           CAST(cents // 100 AS VARCHAR) || '.'
             || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS plain2,
           format('{:,}', CAST((cents + 50) // 100 AS BIGINT)) AS grouped0,
           format('{:,}', CAST(cents // 100 AS BIGINT)) || '.'
             || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS grouped2,
           CAST((cents + 50) // 100 AS VARCHAR) AS rounded0
    FROM v
    """,
)
def fn_excel_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel-style number formatting (reference extension/excel:
    text()/excel_text()) driven from exact integer cents — digit
    grouping via format_number on BIGINT, fraction digits via modulus,
    half-up integer rounding for the '0' code; the oracle rebuilds the
    identical strings with DuckDB's format('{:,}') + lpad, so no double
    ever reaches the formatter on either engine."""
    from data_chunk_compaction_in_duckdb_spark.functions.excel import (
        excel_text_cents,
    )

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    v = o.select(
        "o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return v.select(
        "o_orderkey",
        excel_text_cents("cents", "0.00").alias("plain2"),
        excel_text_cents("cents", "#,##0").alias("grouped0"),
        excel_text_cents("cents", "#,##0.00").alias("grouped2"),
        excel_text_cents("cents", "0").alias("rounded0"),
    )


@query(
    "fn_timezone_convert",
    oracle="""
    WITH e AS (SELECT event_id,
                      CAST(ts AS TIMESTAMP)
                        + INTERVAL (event_id % 90) DAY AS t
               FROM events WHERE event_id % 37 = 0)
    SELECT event_id,
           strftime(timezone('America/New_York', timezone('UTC', t)),
                    '%Y-%m-%d %H:%M:%S') AS nyc,
           strftime(timezone('Asia/Kolkata', timezone('UTC', t)),
                    '%Y-%m-%d %H:%M:%S') AS kolkata,
           strftime(timezone('Australia/Lord_Howe', timezone('UTC', t)),
                    '%Y-%m-%d %H:%M:%S') AS lord_howe,
           strftime(timezone('UTC', timezone('America/New_York',
                    timezone('America/New_York', timezone('UTC', t)))),
                    '%Y-%m-%d %H:%M:%S') AS utc_roundtrip
    FROM e ORDER BY event_id
    """,
)
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICU timezone conversion parity (reference test/sql/timezone/
    test_icu_timezone.test): naive event timestamps treated as UTC
    instants and rendered in three zones — standard-offset, half-hour
    (Asia/Kolkata +5:30) and half-hour-DST (Australia/Lord_Howe
    +10:30/+11) — plus a local->UTC round trip.  The derived span
    (Jan + id%90 days) crosses the 2024-03-10 US spring-forward gap,
    so a wrong DST rule or offset table diverges the hash; the span
    deliberately stops before the November fall-back (ambiguous local
    times are the one point the engines' disambiguation rules are
    allowed to differ).  Both sides run their native ICU machinery:
    Spark convert_timezone over TIMESTAMP_NTZ (JVM zone rules — the
    NTZ form because from_utc_timestamp + date_format re-encodes
    through the SESSION zone and would change under a non-UTC driver),
    DuckDB the ICU timezone() pair."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 37 == 0
    )
    t = F.col("ts") + F.make_interval(days=F.col("event_id") % 90)

    def render(c: F.Column) -> F.Column:
        # NTZ -> string directly: a pure wall-clock rendering.
        # date_format would cast through the SESSION zone first, and a
        # wall time that falls in the session zone's own DST gap gets
        # shifted +1h (found by the TZ=America/Chicago probe: UTC wall
        # 2024-03-10 02:17 does not exist as a Chicago local time).
        return F.substring(c.cast("string"), 1, 19)

    def in_zone(zone: str) -> F.Column:
        return render(F.convert_timezone(F.lit("UTC"), F.lit(zone), t))

    ny_local = F.convert_timezone(
        F.lit("UTC"), F.lit("America/New_York"), t
    )
    roundtrip = render(
        F.convert_timezone(F.lit("America/New_York"), F.lit("UTC"), ny_local)
    )
    return ev.select(
        "event_id",
        in_zone("America/New_York").alias("nyc"),
        in_zone("Asia/Kolkata").alias("kolkata"),
        in_zone("Australia/Lord_Howe").alias("lord_howe"),
        roundtrip.alias("utc_roundtrip"),
    ).orderBy("event_id")
