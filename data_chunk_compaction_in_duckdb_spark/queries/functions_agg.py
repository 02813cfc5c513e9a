"""Aggregate function parity — SURVEY.md §2.4 function list
(src/core_functions/function_list.cpp:66-320).

Statistical, positional (arg_min/arg_max), ordered (string_agg), holistic
(median/quantile/mad/mode/entropy) and bit/bool aggregate families.  Gap
aggregates use the combinators in functions/aggregates.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


@query(
    "agg_stats_spread",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_samp,
           ROUND(stddev_pop(l_quantity), 6) AS sd_pop,
           ROUND(var_samp(l_quantity), 6) AS v_samp,
           ROUND(var_pop(l_quantity), 6) AS v_pop,
           ROUND(sem(l_quantity), 6) AS sem_
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance family (aggregate/algebraic) + sem (standard error
    of the mean — DuckDB computes it as stddev_POP/sqrt(n))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_samp"),
        F.round(F.stddev_pop("l_quantity"), 6).alias("sd_pop"),
        F.round(F.var_samp("l_quantity"), 6).alias("v_samp"),
        F.round(F.var_pop("l_quantity"), 6).alias("v_pop"),
        F.round(
            F.stddev_pop("l_quantity") / F.sqrt(F.count("l_quantity")), 6
        ).alias("sem_"),
    )


@query(
    "agg_corr_regr",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS r,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS cv_pop,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cv_samp,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n,
           ROUND(regr_avgx(l_extendedprice, l_quantity), 6) AS ax,
           ROUND(regr_avgy(l_extendedprice, l_quantity), 4) AS ay,
           ROUND(regr_sxx(l_extendedprice, l_quantity) / 1000.0, 4) AS sxx_k,
           ROUND(regr_syy(l_extendedprice, l_quantity) / 1e9, 4) AS syy_g,
           ROUND(regr_sxy(l_extendedprice, l_quantity) / 1e6, 4) AS sxy_m
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr/covar/regr_* — all 9 regression aggregates
    (aggregate/regression, function_list.cpp:269-277).  The raw sxx/syy/
    sxy sums are display-scaled before rounding: summation-order noise on
    the ~1e14 raw values exceeds 1e-4, so rounding the scaled value is
    the engine-stable comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(x, y), 6).alias("r"),
        F.round(F.covar_pop(x, y), 4).alias("cv_pop"),
        F.round(F.covar_samp(x, y), 4).alias("cv_samp"),
        F.round(F.regr_slope(y, x), 4).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_avgx(y, x), 6).alias("ax"),
        F.round(F.regr_avgy(y, x), 4).alias("ay"),
        F.round(F.regr_sxx(y, x) / 1000.0, 4).alias("sxx_k"),
        F.round(F.regr_syy(y, x) / 1e9, 4).alias("syy_g"),
        F.round(F.regr_sxy(y, x) / 1e6, 4).alias("sxy_m"),
    )


@query(
    "agg_skew_kurt",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, AVG(l_quantity) AS mu, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           ROUND((SUM(POW(l_quantity - mu, 3)) / ANY_VALUE(n))
                 / POW(SUM(POW(l_quantity - mu, 2)) / ANY_VALUE(n), 1.5), 6) AS skew_pop,
           ROUND((SUM(POW(l_quantity - mu, 4)) / ANY_VALUE(n))
                 / POW(SUM(POW(l_quantity - mu, 2)) / ANY_VALUE(n), 2) - 3, 6) AS kurt_pop
    FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skewness/kurtosis (aggregate/distributive).  Spark built-ins compute
    the population (g1, excess-g2) definitions; the oracle derives the same
    from raw central moments since DuckDB's built-ins apply sample-bias
    correction."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_quantity"), 6).alias("skew_pop"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_pop"),
    )


@query(
    "agg_arg_minmax",
    oracle="""
    SELECT o_orderstatus,
           arg_max(o_orderkey, o_totalprice) AS priciest_order,
           arg_min(o_orderkey, o_totalprice) AS cheapest_order,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(MIN(o_totalprice), 2) AS min_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg_min/arg_max (function_list.cpp:68-71) = min_by/max_by."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
    )


@query(
    "agg_string_agg_ordered",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, '|' ORDER BY c_name) AS names
    FROM customer
    WHERE c_acctbal > 9800
    GROUP BY c_nationkey
    """,
)
def agg_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """string_agg(x, sep ORDER BY y) (function_list.cpp:172; ordered
    aggregate via sorted_aggregate_function.cpp) = sorted collect_list +
    array_join."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9800)
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("names")
    )


@query(
    "agg_entropy",
    oracle="""
    SELECT l_returnflag, ROUND(entropy(l_linestatus), 6) AS entropy
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entropy() (function_list.cpp:137) via the counts combinator."""
    from data_chunk_compaction_in_duckdb_spark.functions import entropy_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = entropy_agg(li, "l_linestatus", ["l_returnflag"])
    return out.select(
        "l_returnflag", F.round(F.col("entropy"), 6).alias("entropy")
    )


@query(
    "agg_median_quantile",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 4) AS med,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_median_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median/quantile_cont (holistic, function_list.cpp:241,261-263) —
    Spark's exact `percentile` uses the same linear interpolation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 4).alias("med"),
        F.round(F.percentile("l_quantity", 0.25), 4).alias("q25"),
        F.round(F.percentile("l_quantity", 0.75), 4).alias("q75"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90_price"),
    )


@query(
    "agg_quantile_disc",
    oracle="""
    SELECT o_orderstatus, o_totalprice AS quantile_disc
    FROM (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    ) t
    WHERE rn = GREATEST(1, CAST(CEIL(0.75 * n) AS BIGINT))
    """,
)
def agg_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_disc (exact discrete quantile) via the rank combinator —
    both sides use the identical ceil(q*n) rank so the hash matches."""
    from data_chunk_compaction_in_duckdb_spark.functions import quantile_disc

    orders = load_table(spark, sf_dir, "orders")
    return quantile_disc(orders, "o_totalprice", ["o_orderstatus"], 0.75)


@query(
    "agg_mode_deterministic",
    oracle="""
    SELECT l_returnflag, l_quantity AS mode
    FROM (
      SELECT l_returnflag, l_quantity, COUNT(*) AS c,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_quantity) AS rn
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ) t WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() with deterministic tie-break (smallest value) — reference
    mode (function_list.cpp:249) leaves ties unspecified."""
    from data_chunk_compaction_in_duckdb_spark.functions import mode_deterministic

    li = load_table(spark, sf_dir, "lineitem")
    return mode_deterministic(li, "l_quantity", ["l_returnflag"])


@query(
    "agg_mad",
    oracle="""
    SELECT l_returnflag, ROUND(mad(l_quantity), 4) AS mad
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mad() (function_list.cpp:223) via the two-pass combinator."""
    from data_chunk_compaction_in_duckdb_spark.functions import mad_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = mad_agg(li, "l_quantity", ["l_returnflag"])
    return out.select("l_returnflag", F.round(F.col("mad"), 4).alias("mad"))


@query(
    "agg_product_bool_bit",
    oracle="""
    SELECT l_returnflag,
           ROUND(ln(product(1 + l_discount)), 4) AS disc_ln_product,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_quantity > 49) AS any_huge,
           bit_and(CAST(l_linenumber AS BIGINT)) AS b_and,
           bit_or(CAST(l_linenumber AS BIGINT)) AS b_or,
           bit_xor(CAST(l_linenumber AS BIGINT)) AS b_xor
    FROM lineitem
    WHERE l_orderkey % 499 = 0
    GROUP BY l_returnflag
    """,
)
def agg_product_bool_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """product / bool_and / bool_or / bit_and / bit_or / bit_xor
    (function_list.cpp:91-99).  The product is compared in LOG space:
    a k-factor float product carries ~k·ulp multiplication-ORDER drift
    between the engines, which outgrows any decimal rounding once the
    magnitude explodes (at sf1 the ~4k-factor group product is ~1e84
    and the raw ROUND(x, 6) hash diverged — found by the round-6 sf1
    full sweep).  ln() compresses that to ~1e-12 ABSOLUTE drift at any
    SF, so ROUND(ln(product), 4) is scale-stable while still executing
    the real product() aggregate in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 499 == 0)
    ln = F.col("l_linenumber").cast("bigint")
    return li.groupBy("l_returnflag").agg(
        F.round(F.log(F.product(1 + F.col("l_discount"))), 4).alias(
            "disc_ln_product"
        ),
        F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_huge"),
        F.bit_and(ln).alias("b_and"),
        F.bit_or(ln).alias("b_or"),
        F.bit_xor(ln).alias("b_xor"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           CAST(abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
                    - COUNT(DISTINCT l_partkey))
                <= 0.05 * COUNT(DISTINCT l_partkey) AS STRING) AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL, function_list.cpp:66) — raw sketch
    estimates are engine-specific, so the driver-checkable output is the
    self-check each engine performs on its OWN sketch: the exact count
    plus a within-5% boolean (the reference's documented HLL error bound;
    both engines' HLL variants are well inside it at these cardinalities,
    so the booleans agree even though the estimates differ).  pytest
    additionally asserts the <5% relative error directly."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey").cast("double")
                - F.countDistinct("l_partkey")
            )
            <= 0.05 * F.countDistinct("l_partkey")
        )
        .cast("string")
        .alias("within_5pct"),
    )


@query(
    "agg_first_last_deterministic",
    oracle="""
    SELECT o_orderstatus,
           first(o_orderkey ORDER BY o_orderdate, o_orderkey) AS first_key,
           last(o_orderkey ORDER BY o_orderdate, o_orderkey) AS last_key,
           any_value(mn) AS any_min
    FROM (
      SELECT o_orderstatus, o_orderkey, o_orderdate,
             MIN(o_orderkey) OVER (PARTITION BY o_orderstatus) AS mn
      FROM orders
    ) t
    GROUP BY o_orderstatus
    """,
)
def agg_first_last_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/any_value (function_list.cpp any_value/first/last) made
    deterministic via explicit ordering — min_by/max_by on a total order."""
    orders = load_table(spark, sf_dir, "orders")
    # Total order (o_orderdate, o_orderkey) encoded as a sortable string —
    # min_by/max_by take a single orderable expression.
    order_key = F.concat(
        F.date_format("o_orderdate", "yyyyMMddHHmmss"),
        F.lpad(F.col("o_orderkey").cast("string"), 15, "0"),
    )
    return orders.groupBy("o_orderstatus").agg(
        F.min_by("o_orderkey", order_key).alias("first_key"),
        F.max_by("o_orderkey", order_key).alias("last_key"),
        F.min("o_orderkey").alias("any_min"),
    )


@query(
    "agg_histogram_map",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list_transform(
             map_entries(histogram(l_linestatus)),
             e -> e.key || ':' || e.value)), ',') AS hist
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_histogram_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram() as the reference returns it — a value→count MAP
    (core_functions/aggregate/holistic) — rendered as sorted k:v text so
    both engines compare exactly.  Spark shape: two-level aggregation —
    the first groupBy does the heavy counting with map-side partial
    aggregation, so the second shuffle (map assembly) only moves the
    distinct (group, value) pairs, which stay tiny at any data scale."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_c")
    )
    return counts.groupBy("l_returnflag").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(
                    F.concat_ws(":", "l_linestatus", "_c")
                )
            ),
            ",",
        ).alias("hist")
    )
