"""Scalar function parity — SURVEY.md §2.8 (string, regex, math, datetime,
hash/encode, conditional/cast, JSON).

One named query per function family, each evaluating many functions as
columns so the oracle hash covers the whole family at once.  Reference
registries: src/function/scalar/ and src/core_functions/function_list.cpp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up, lower(p_brand) AS lo,
           length(p_name) AS len,
           substring(p_name, 2, 5) AS sub,
           trim('  ' || p_type || ' ') AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           left(p_name, 4) AS l4, right(p_name, 3) AS r3,
           repeat(p_brand, 2) AS rep, reverse(p_type) AS rev,
           replace(p_name, ' ', '_') AS repl,
           instr(p_name, 'a') AS pos_a,
           split_part(p_name, ' ', 2) AS word2,
           translate(p_brand, '#', '-') AS trans,
           ascii(p_type) AS asc1, chr(65 + p_size % 26) AS chr1,
           starts_with(p_name, 'b') AS sw,
           contains(p_name, 'val') AS ct,
           p_name LIKE '%table%' AS lk,
           concat(p_brand, ':', p_type) AS cat
    FROM part WHERE p_partkey <= 100
    """,
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions (src/function/scalar/string/*.cpp)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.substring("p_name", 1, 4).alias("l4"),
        F.expr("right(p_name, 3)").alias("r3"),
        F.repeat("p_brand", 2).alias("rep"),
        F.reverse("p_type").alias("rev"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
        F.instr("p_name", "a").alias("pos_a"),
        F.expr("split_part(p_name, ' ', 2)").alias("word2"),
        F.translate("p_brand", "#", "-").alias("trans"),
        F.ascii("p_type").alias("asc1"),
        F.chr(F.lit(65) + F.col("p_size") % 26).alias("chr1"),
        F.startswith("p_name", F.lit("b")).alias("sw"),
        F.contains("p_name", F.lit("val")).alias("ct"),
        F.col("p_name").like("%table%").alias("lk"),
        F.concat("p_brand", F.lit(":"), "p_type").alias("cat"),
    )


@query(
    "fn_string_similarity",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_name, p_type) AS lev,
           ROUND(jaccard(p_name, p_type), 6) AS jac,
           hamming(rpad(left(p_name, 5), 5, 'x'), rpad(left(p_type, 5), 5, 'x')) AS ham,
           damerau_levenshtein(p_brand, p_type) AS dam,
           ROUND(jaro_winkler_similarity(p_name, p_type), 6) AS jw
    FROM part WHERE p_partkey <= 60
    """,
)
def fn_string_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String similarity family (function_list.cpp: jaccard/hamming/
    damerau_levenshtein/jaro_winkler_similarity).  levenshtein is Spark
    built-in; the rest are the engine's pandas UDFs
    (functions/scalar.py)."""
    from data_chunk_compaction_in_duckdb_spark.functions import (
        damerau_levenshtein,
        hamming,
        jaccard,
        jaro_winkler,
    )

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 60)
    fixed = lambda c: F.rpad(F.substring(c, 1, 5), 5, "x")  # noqa: E731
    return part.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").alias("lev"),
        F.round(jaccard("p_name", "p_type"), 6).alias("jac"),
        hamming(fixed("p_name"), fixed("p_type")).alias("ham"),
        damerau_levenshtein("p_brand", "p_type").alias("dam"),
        F.round(jaro_winkler("p_name", "p_type"), 6).alias("jw"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS a,
           CAST(ceil(l_discount * 100) AS BIGINT) AS ce, CAST(floor(l_tax * 100) AS BIGINT) AS fl,
           ROUND(sqrt(l_quantity), 6) AS sq,
           ROUND(cbrt(l_quantity), 6) AS cb,
           ROUND(exp(l_discount), 6) AS ex,
           ROUND(ln(l_quantity), 6) AS lnx,
           ROUND(log10(l_extendedprice), 6) AS lg10,
           ROUND(log2(l_quantity), 6) AS lg2,
           ROUND(pow(l_quantity, 1.5), 4) AS pw,
           CAST(l_partkey % 7 AS BIGINT) AS md,
           CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sg,
           ROUND(sin(l_discount), 6) AS sn,
           ROUND(atan2(l_discount, l_tax + 0.01), 6) AS at2,
           ROUND(degrees(l_discount), 6) AS dg,
           CAST(factorial(CAST(l_linenumber AS INT)) AS BIGINT) AS fact,
           ROUND(pi(), 6) AS pi_
    FROM lineitem WHERE l_orderkey <= 60
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (core_functions/scalar/math)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 60)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("a"),
        F.ceil(F.col("l_discount") * 100).alias("ce"),
        F.floor(F.col("l_tax") * 100).alias("fl"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        F.round(F.cbrt("l_quantity"), 6).alias("cb"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        F.round(F.log("l_quantity"), 6).alias("lnx"),
        F.round(F.log10("l_extendedprice"), 6).alias("lg10"),
        F.round(F.log2("l_quantity"), 6).alias("lg2"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 4).alias("pw"),
        (F.col("l_partkey") % 7).alias("md"),
        F.signum(F.col("l_quantity") - 25.0).alias("sg"),
        F.round(F.sin("l_discount"), 6).alias("sn"),
        F.round(F.atan2("l_discount", F.col("l_tax") + 0.01), 6).alias("at2"),
        F.round(F.degrees("l_discount"), 6).alias("dg"),
        F.factorial(F.col("l_linenumber").cast("int")).alias("fact"),
        F.round(F.lit(3.14159265358979), 6).alias("pi_"),
    )


@query(
    "fn_math_special",
    oracle="""
    SELECT p_partkey,
           ROUND(gamma(1 + p_size % 8), 4) AS gm,
           ROUND(lgamma(1 + p_size), 6) AS lgm,
           gcd(p_partkey, p_size) AS g,
           lcm(1 + p_partkey % 10, 1 + p_size % 6) AS l
    FROM part WHERE p_partkey <= 80
    """,
)
def fn_math_special(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gamma/lgamma/gcd/lcm — no Spark built-ins; engine pandas UDFs."""
    from data_chunk_compaction_in_duckdb_spark.functions import (
        gamma_udf,
        gcd_udf,
        lcm_udf,
        lgamma_udf,
    )

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 80)
    return part.select(
        "p_partkey",
        F.round(gamma_udf((1 + F.col("p_size") % 8).cast("double")), 4).alias("gm"),
        F.round(lgamma_udf((1 + F.col("p_size")).cast("double")), 6).alias("lgm"),
        gcd_udf("p_partkey", F.col("p_size").cast("long")).alias("g"),
        lcm_udf(
            (1 + F.col("p_partkey") % 10), (1 + F.col("p_size") % 6).cast("long")
        ).alias("l"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT event_id,
           year(ts) AS y, quarter(ts) AS q, month(ts) AS m,
           day(ts) AS d, hour(ts) AS h, minute(ts) AS mi, second(ts) AS s,
           date_part('dow', ts) AS dow,
           date_part('week', ts) AS wk,
           date_part('doy', ts) AS doy,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS trunc_day,
           CAST(date_trunc('month', ts) AS TIMESTAMP) AS trunc_month,
           datediff('day', TIMESTAMP '2024-01-01', ts) AS days_in,
           CAST(last_day(CAST(ts AS DATE)) AS DATE) AS ld,
           strftime(ts, '%Y-%m-%d %H:%M') AS fmt,
           CAST(ts + INTERVAL 90 MINUTE AS TIMESTAMP) AS plus90m,
           make_date(2024, 1 + CAST(event_id % 12 AS INT), 15) AS md
    FROM events WHERE event_id <= 200
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions (core_functions/scalar/date; strftime via
    strftime_format.cpp).  DuckDB dow is 0=Sunday, Spark dayofweek is
    1=Sunday — normalized here; format strings translated %Y→yyyy."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.quarter("ts").alias("q"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
        F.weekofyear("ts").cast("long").alias("wk"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.date_trunc("day", "ts").alias("trunc_day"),
        F.date_trunc("month", "ts").alias("trunc_month"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_in"),
        F.last_day(F.col("ts").cast("date")).alias("ld"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("plus90m"),
        F.make_date(
            F.lit(2024), (1 + F.col("event_id") % 12).cast("int"), F.lit(15)
        ).alias("md"),
    )


@query(
    "fn_hash_encode",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS m5,
           sha256(c_name) AS s256,
           hex(c_name) AS hx,
           to_base64(CAST(c_name AS BLOB)) AS b64,
           bit_count(CAST(c_custkey AS BIGINT)) AS bc
    FROM customer WHERE c_custkey <= 100
    """,
)
def fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/encode functions (md5/sha256/hex/base64/bit_count —
    core_functions/scalar/{string,bit,blob})."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return cust.select(
        "c_custkey",
        F.md5(F.col("c_name").cast("binary")).alias("m5"),
        F.sha2(F.col("c_name").cast("binary"), 256).alias("s256"),
        F.hex(F.col("c_name")).alias("hx"),
        F.base64(F.col("c_name").cast("binary")).alias("b64"),
        F.bit_count(F.col("c_custkey")).cast("long").alias("bc"),
    )


@query(
    "fn_conditional_cast",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           coalesce(NULLIF(o_orderstatus, 'O'), 'open') AS st,
           greatest(o_totalprice, 250000.0) AS gr,
           least(CAST(o_custkey AS BIGINT), o_orderkey) AS le,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_num,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
           isnan(o_totalprice / 1.0) AS nn
    FROM orders WHERE o_orderkey <= 300
    """,
)
def fn_conditional_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/coalesce/nullif/greatest/least/try_cast/cast (src/function/cast/,
    generic function family)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "st"
        ),
        F.greatest("o_totalprice", F.lit(250000.0)).alias("gr"),
        F.least(F.col("o_custkey"), F.col("o_orderkey")).alias("le"),
        F.expr("TRY_CAST(o_orderpriority AS INT)").alias("bad_cast"),
        F.expr("TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT)").alias(
            "prio_num"
        ),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.isnan(F.col("o_totalprice") / 1.0).alias("nn"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           regexp_replace(p_name, '[aeiou]', '*', 'g') AS starred,
           regexp_matches(p_name, 'a.*e') AS has_ae,
           regexp_extract(p_type, '([A-Z]+)#([0-9]+)', 2) AS type_num
    FROM part WHERE p_partkey <= 120
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family (src/function/scalar/string/regexp.cpp).  Spark
    regexp_replace is global by default = DuckDB 'g' flag."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 120)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("starred"),
        F.col("p_name").rlike("a.*e").alias("has_ae"),
        F.regexp_extract("p_type", "([A-Z]+)#([0-9]+)", 2).alias("type_num"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_num,
           json_valid(props) AS ok
    FROM events WHERE event_id <= 300
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (reference extension/json) = get_json_object /
    from_json."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.when(
            F.from_json("props", "k BIGINT").isNotNull(), F.lit(True)
        ).otherwise(F.lit(False)).alias("ok"),
    )
