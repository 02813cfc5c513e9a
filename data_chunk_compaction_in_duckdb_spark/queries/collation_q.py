"""ICU locale collation — closes the last documented out-of-scope item.

The reference ships locale-aware sort orders through its ICU extension
(reference extension/icu/icu_extension.cpp registers one collation per
ICU locale; CollateCatalogEntry wired at src/catalog/catalog_entry/
collate_catalog_entry.cpp).  Spark 4 has the same capability natively:
``expr COLLATE locale`` / ``collate(expr, 'locale')`` binds an ICU
collator at tertiary strength — the identical library, so orderings
agree engine-for-engine.  Verified locales (probe committed in this
round's notes): de fr sv pl tr cs da hu es nl fi ru el.  ``nb`` diverges
(DuckDB's ICU treats 'aa' as 'å', Spark's build does not) and the
case-/accent-insensitive locale variants ('de_CI') use a different
strength than DuckDB's combined NOCASE.de — both excluded.

The fixture is ASCII, so each query first synthesizes accented strings
deterministically with translate()/concat (same semantics both engines),
then makes the collation OBSERVABLE IN VALUES via dense_rank/row_number
over the collated order — the driver hash sorts rows, so ordering alone
would not be checked.

Scale shape: every window here is over the DISTINCT of a bounded
vocabulary (64 part-name combinations at any SF — the distinct is a
map-side-partial shuffle of short strings), so the unpartitioned
global-order windows see at most a few hundred rows regardless of data
size; the grouped variant partitions by p_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_chunk_compaction_in_duckdb_spark.catalog import load_table
from data_chunk_compaction_in_duckdb_spark.queries.registry import query


def _names(spark: SparkSession, sf_dir: str, from_chars: str, to_chars: str) -> DataFrame:
    """Distinct part names with a deterministic accent substitution."""
    return (
        load_table(spark, sf_dir, "part")
        .select(F.translate("p_name", from_chars, to_chars).alias("name"))
        .distinct()
    )


@query(
    "collate_de_umlaut_rank",
    oracle="""
    WITH names AS (
      SELECT DISTINCT translate(p_name, 'aeou', 'äéöü') AS name FROM part
    )
    SELECT name,
           DENSE_RANK() OVER (ORDER BY name COLLATE de) AS rank_de,
           DENSE_RANK() OVER (ORDER BY name) AS rank_binary
    FROM names
    """,
)
def collate_de_umlaut_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """German phonebook-adjacent ordering: ä/é/ö/ü interleave with their
    base letters under COLLATE de but sort after 'z' under binary — the
    two rank columns disagree on every accented name (reference
    extension/icu collations; test/sql/collate ordering files)."""
    names = _names(spark, sf_dir, "aeou", "äéöü")
    return names.select(
        "name",
        F.dense_rank().over(Window.orderBy(F.expr("name COLLATE de"))).alias("rank_de"),
        F.dense_rank().over(Window.orderBy("name")).alias("rank_binary"),
    )


@query(
    "collate_sv_after_z",
    oracle="""
    WITH names AS (
      SELECT DISTINCT translate(p_name, 'ao', 'åö') AS name FROM part
    )
    SELECT name,
           DENSE_RANK() OVER (ORDER BY name COLLATE sv) AS rank_sv,
           DENSE_RANK() OVER (ORDER BY name COLLATE de) AS rank_de
    FROM names
    """,
)
def collate_sv_after_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Swedish sorts å/ö AFTER z (distinct letters) while German folds
    them into a/o — the same strings rank differently per locale."""
    names = _names(spark, sf_dir, "ao", "åö")
    return names.select(
        "name",
        F.dense_rank().over(Window.orderBy(F.expr("name COLLATE sv"))).alias("rank_sv"),
        F.dense_rank().over(Window.orderBy(F.expr("name COLLATE de"))).alias("rank_de"),
    )


@query(
    "collate_cs_digraph_ch",
    oracle="""
    WITH names AS (
      SELECT DISTINCT concat(CASE WHEN length(p_name) % 3 = 0 THEN 'ch'
                                  WHEN length(p_name) % 3 = 1 THEN 'c'
                                  ELSE 'h' END, p_name) AS name
      FROM part
    )
    SELECT name,
           DENSE_RANK() OVER (ORDER BY name COLLATE cs) AS rank_cs,
           DENSE_RANK() OVER (ORDER BY name) AS rank_binary
    FROM names
    """,
)
def collate_cs_digraph_ch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Czech treats the digraph 'ch' as its own letter sorted after 'h':
    'ch…' names outrank every 'h…' name under COLLATE cs but fall
    between 'c' and 'd' under binary."""
    prefix = (
        F.when(F.length("p_name") % 3 == 0, F.lit("ch"))
        .when(F.length("p_name") % 3 == 1, F.lit("c"))
        .otherwise(F.lit("h"))
    )
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.concat(prefix, F.col("p_name")).alias("name"))
        .distinct()
    )
    return names.select(
        "name",
        F.dense_rank().over(Window.orderBy(F.expr("name COLLATE cs"))).alias("rank_cs"),
        F.dense_rank().over(Window.orderBy("name")).alias("rank_binary"),
    )


@query(
    "collate_tr_dotless_i",
    oracle="""
    WITH names AS (
      SELECT DISTINCT CASE WHEN p_partkey % 2 = 0
                           THEN translate(p_name, 'i', 'ı')
                           ELSE p_name END AS name
      FROM part
    )
    SELECT name,
           DENSE_RANK() OVER (ORDER BY name COLLATE tr) AS rank_tr,
           DENSE_RANK() OVER (ORDER BY name) AS rank_binary
    FROM names
    """,
)
def collate_tr_dotless_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turkish dotless ı orders immediately BEFORE dotted i under
    COLLATE tr but after every ASCII letter under binary; even part
    keys contribute the dotless variant, odd keys the base name."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select(
            F.when(F.col("p_partkey") % 2 == 0, F.translate("p_name", "i", "ı"))
            .otherwise(F.col("p_name"))
            .alias("name")
        ).distinct()
    )
    return names.select(
        "name",
        F.dense_rank().over(Window.orderBy(F.expr("name COLLATE tr"))).alias("rank_tr"),
        F.dense_rank().over(Window.orderBy("name")).alias("rank_binary"),
    )


@query(
    "collate_fr_accent_variants",
    oracle="""
    WITH names AS (
      SELECT DISTINCT CASE p_partkey % 3
                        WHEN 0 THEN translate(p_name, 'e', 'é')
                        WHEN 1 THEN translate(p_name, 'e', 'è')
                        ELSE p_name END AS name
      FROM part
    )
    SELECT name,
           DENSE_RANK() OVER (ORDER BY name COLLATE fr) AS rank_fr,
           DENSE_RANK() OVER (ORDER BY name) AS rank_binary
    FROM names
    """,
)
def collate_fr_accent_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """French secondary-strength accents: é/è variants of the same base
    word stay adjacent to it under COLLATE fr (accent decides only the
    tie) but scatter past 'z' under binary."""
    part = load_table(spark, sf_dir, "part")
    names = (
        part.select(
            F.when(F.col("p_partkey") % 3 == 0, F.translate("p_name", "e", "é"))
            .when(F.col("p_partkey") % 3 == 1, F.translate("p_name", "e", "è"))
            .otherwise(F.col("p_name"))
            .alias("name")
        ).distinct()
    )
    return names.select(
        "name",
        F.dense_rank().over(Window.orderBy(F.expr("name COLLATE fr"))).alias("rank_fr"),
        F.dense_rank().over(Window.orderBy("name")).alias("rank_binary"),
    )


@query(
    "collate_de_group_extremes",
    oracle="""
    WITH parts AS (
      SELECT p_type, translate(p_name, 'aou', 'äöü') AS name FROM part
    )
    SELECT DISTINCT p_type,
           first_value(name) OVER (
             PARTITION BY p_type ORDER BY name COLLATE de, name
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_de,
           last_value(name) OVER (
             PARTITION BY p_type ORDER BY name COLLATE de, name
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_de
    FROM parts
    """,
)
def collate_de_group_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min/max under a locale order (reference test/sql/collate
    group/aggregate files): the de-collated first/last names differ from
    binary min/max whenever an umlauted name is the locale extreme."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_type", F.translate("p_name", "aou", "äöü").alias("name")
    )
    w = (
        Window.partitionBy("p_type")
        .orderBy(F.expr("name COLLATE de"), "name")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return parts.select(
        "p_type",
        F.first("name").over(w).alias("first_de"),
        F.last("name").over(w).alias("last_de"),
    ).distinct()


@query(
    "collate_ru_cyrillic_rank",
    oracle="""
    WITH names AS (
      SELECT DISTINCT translate(p_name, 'abcdegiklmnoprstw',
                                'абцдегиклмнопрств') AS name
      FROM part
    )
    SELECT name,
           DENSE_RANK() OVER (ORDER BY name COLLATE ru) AS rank_ru,
           DENSE_RANK() OVER (ORDER BY name) AS rank_binary
    FROM names
    """,
)
def collate_ru_cyrillic_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-Latin script: transliterated Cyrillic names collate by the
    Russian alphabet (б before в before г …) which disagrees with UTF-8
    code-point order for the mixed residual Latin letters."""
    names = _names(spark, sf_dir, "abcdegiklmnoprstw", "абцдегиклмнопрств")
    return names.select(
        "name",
        F.dense_rank().over(Window.orderBy(F.expr("name COLLATE ru"))).alias("rank_ru"),
        F.dense_rank().over(Window.orderBy("name")).alias("rank_binary"),
    )
