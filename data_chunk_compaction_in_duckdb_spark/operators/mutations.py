"""Mutation rewrites (SURVEY.md §2.1: INSERT/DELETE/UPDATE,
physical_insert.cpp:550, physical_delete.cpp:102, physical_update.cpp:187).

Vanilla Spark DataFrames are immutable, so row-level mutations become
transformations producing the post-mutation relation — the same rewrite
the reference's MVCC layer applies logically (delete = anti-filter,
update = projection, upsert = anti-join + union).  Re-register the temp
view (or overwrite the table) with the result to "commit".

At 100 TB these rewrites are exactly what Delta/Iceberg MERGE compiles
to; using them directly keeps the engine dependency-free.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_where(df: DataFrame, cond: Column) -> DataFrame:
    """DELETE FROM df WHERE cond."""
    return df.filter(~cond | cond.isNull())


def delete_where_in(df: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """DELETE FROM df WHERE key_col IN (SELECT ... ) — anti-join form."""
    return df.join(keys, key_col, "left_anti")


def apply_assignments(
    df: DataFrame, cond: Column, assignments: Mapping[str, Column]
) -> DataFrame:
    """Apply every SET clause in ONE projection so each RHS sees the
    PRE-update row (SQL simultaneous-assignment semantics; the
    reference binds all UPDATE expressions against the scanned row,
    physical_update.cpp:187 — `UPDATE t SET a=b, b=a` swaps)."""
    return df.select(
        *[
            (
                F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
            )
            for c in df.columns
        ]
    )


def update_where(
    df: DataFrame, cond: Column, assignments: Mapping[str, Column]
) -> DataFrame:
    """UPDATE df SET col = expr, ... WHERE cond."""
    return apply_assignments(df, cond, assignments)


def insert_into(df: DataFrame, rows: DataFrame) -> DataFrame:
    """INSERT INTO df SELECT * FROM rows (append)."""
    return df.unionByName(rows)


def upsert(df: DataFrame, updates: DataFrame, key_col: str) -> DataFrame:
    """INSERT ... ON CONFLICT (key) DO UPDATE (reference physical_insert
    on-conflict path): new rows win on key collision."""
    survivors = df.join(updates.select(key_col), key_col, "left_anti")
    return survivors.unionByName(updates)


# --- RETURNING clause analogs (reference test/sql/returning/,
# physical_insert.cpp / physical_delete.cpp / physical_update.cpp
# return_collection paths).  Each returns (post_mutation_relation,
# returned_rows); RETURNING projects the POST-image of the affected
# rows — the same rows DuckDB's `... RETURNING *` emits (pinned against
# real DuckDB DML by tests/test_mutations_returning.py).  Both outputs
# are plain DataFrames, so RETURNING expressions are ordinary .select()
# compositions on the second element.


def delete_returning(
    df: DataFrame, cond: Column
) -> tuple[DataFrame, DataFrame]:
    """DELETE FROM df WHERE cond RETURNING * — returned rows are the
    deleted ones (their pre-image: DELETE has no post-image)."""
    return delete_where(df, cond), df.filter(cond)


def update_returning(
    df: DataFrame, cond: Column, assignments: Mapping[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """UPDATE df SET ... WHERE cond RETURNING * — returned rows are the
    updated rows with the assignments APPLIED (DuckDB returns the
    post-update image)."""
    post = update_where(df, cond, assignments)
    updated = apply_assignments(df.filter(cond), F.lit(True), assignments)
    return post, updated


def insert_returning(
    df: DataFrame, rows: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """INSERT INTO df ... RETURNING * — returned rows are the inserted
    ones (column-aligned to the target's schema, as the reference
    binds RETURNING against the target table)."""
    aligned = rows.selectExpr(*df.columns)
    return insert_into(df, aligned), aligned


def upsert_returning(
    df: DataFrame, updates: DataFrame, key_col: str
) -> tuple[DataFrame, DataFrame]:
    """INSERT ... ON CONFLICT DO UPDATE ... RETURNING * — every
    proposed row is returned (inserted or conflict-updated, both carry
    the update's post-image values)."""
    aligned = updates.selectExpr(*df.columns)
    return upsert(df, aligned, key_col), aligned


# --- join-DML forms (reference DELETE ... USING / UPDATE ... FROM,
# physical_delete.cpp / physical_update.cpp over a join plan;
# test/sql/update/, test/sql/delete/).  The SQL layer prefix-renames
# the source columns to __src_* (storage/dmlsql.rewrite_qualified), so
# these frame ops need no alias scoping.


def prefix_source(src: DataFrame) -> DataFrame:
    """Rename source columns to ``__src_<name>`` and add the non-null
    match marker the left-join form keys on (a NULL source VALUE must
    not read as 'unmatched')."""
    out = src.select(
        *[F.col(c).alias(f"__src_{c}") for c in src.columns]
    )
    return out.withColumn("__src__match", F.lit(True))


def delete_using(df: DataFrame, src_pref: DataFrame, cond) -> DataFrame:
    """DELETE FROM df USING src WHERE cond: drop every df row with ANY
    matching source row (anti-join on the join predicate — one shuffle,
    never a row-multiplying join)."""
    return df.join(src_pref, cond, "left_anti")


def update_from(
    df: DataFrame,
    src_pref: DataFrame,
    cond,
    assignments,
) -> DataFrame:
    """UPDATE df SET ... FROM src WHERE cond: rows with a match take
    the assignment expressions (which may reference ``__src_*``
    columns); unmatched rows pass through.  When several source rows
    match one target row, ONE is taken arbitrarily — DuckDB's probed
    multi-match behavior (also nondeterministic there); the row
    identity + row_number pick is bounded by the affected rows, not
    the table."""
    from pyspark.sql import Window

    out_cols = df.columns
    rid = df.withColumn("_t_rid", F.monotonically_increasing_id())
    joined = rid.join(src_pref, cond, "left")
    w = Window.partitionBy("_t_rid").orderBy(F.lit(1))
    picked = joined.withColumn("_t_rn", F.row_number().over(w)).filter(
        F.col("_t_rn") == 1
    )
    matched = F.col("__src__match").isNotNull()
    picked = apply_assignments(picked, matched, assignments)
    return picked.select(*out_cols)
