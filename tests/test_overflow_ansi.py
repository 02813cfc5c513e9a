"""Arithmetic/cast overflow error parity under ANSI mode (reference
test/sql/overflow/: bigint_overflow.test, integer_overflow.test,
test_numeric_overflow.test — the reference RAISES on overflow).

Spark's default (non-ANSI) mode wraps integer arithmetic and numeric
down-casts and NULLs unparseable strings; `Engine.pragma("ansi_errors",
True)` flips the session to the reference's raise-on-overflow
semantics.  Each case asserts BOTH Spark modes (so a default change or
an accidental global ANSI flip is caught) and the DuckDB behavior of
the same expression — the error-for-error parity the pragma provides,
with the deltas documented where DuckDB itself does NOT raise."""

from __future__ import annotations

import pytest

I32_MAX = 2147483647
I64_MAX = 9223372036854775807

ARITH_CASES = [
    (f"SELECT CAST({I32_MAX} AS INT) + CAST(1 AS INT) AS v", -2147483648),
    (f"SELECT CAST({I64_MAX} AS BIGINT) + CAST(1 AS BIGINT) AS v",
     -9223372036854775808),
    ("SELECT CAST(127 AS TINYINT) + CAST(1 AS TINYINT) AS v", -128),
    (f"SELECT CAST({I32_MAX} AS INT) * CAST(2 AS INT) AS v", -2),
]

# (sql, non-ANSI Spark value): numeric down-casts WRAP in non-ANSI
# Spark, string casts NULL; both raise under ANSI and in DuckDB.
CAST_CASES = [
    ("SELECT CAST(128 AS TINYINT) AS v", -128),
    ("SELECT CAST('abc' AS INTEGER) AS v", None),
    (f"SELECT CAST({I64_MAX} AS INTEGER) AS v", -1),
]


@pytest.fixture
def ansi(spark):
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, register=False)
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    yield eng
    eng.spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.mark.parametrize("sql,wrapped", ARITH_CASES)
def test_arith_overflow_both_modes(ansi, spark, duck, sql, wrapped):
    ansi.pragma("ansi_errors", False)
    assert spark.sql(sql).collect()[0].v == wrapped  # documented wrap
    ansi.pragma("ansi_errors", True)
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        spark.sql(sql).collect()
    # the reference raises too (error-for-error parity)
    with pytest.raises(Exception, match="(?i)overflow|out of range"):
        duck.execute(sql).fetchall()


@pytest.mark.parametrize("sql,nonansi", CAST_CASES)
def test_cast_overflow_both_modes(ansi, spark, duck, sql, nonansi):
    ansi.pragma("ansi_errors", False)
    assert spark.sql(sql).collect()[0].v == nonansi
    ansi.pragma("ansi_errors", True)
    with pytest.raises(Exception, match="(?i)cast"):
        spark.sql(sql).collect()
    with pytest.raises(Exception, match="(?i)conversion|cast|out of range"):
        duck.execute(sql).fetchall()


def test_division_by_zero_modes(ansi, spark, duck):
    """Documented delta: DuckDB integer division by zero yields NULL
    (test/sql/types/numeric), matching Spark's NON-ANSI mode; ANSI
    Spark raises (stricter than the reference here)."""
    ansi.pragma("ansi_errors", False)
    assert spark.sql("SELECT 1 / 0 AS v").collect()[0].v is None
    assert duck.execute("SELECT 1 // 0").fetchall() == [(None,)]
    ansi.pragma("ansi_errors", True)
    with pytest.raises(Exception, match="(?i)divide|division"):
        spark.sql("SELECT 1 / 0 AS v").collect()


def test_unknown_pragma_still_rejected(ansi):
    with pytest.raises(ValueError, match="no runtime-settable"):
        ansi.pragma("not_a_pragma", 1)
