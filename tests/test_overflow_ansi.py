"""Arithmetic/cast overflow error parity (reference test/sql/overflow/:
bigint_overflow.test, integer_overflow.test, test_numeric_overflow.test
— the reference RAISES on overflow).

Spark 4 runs ANSI mode BY DEFAULT, so the engine is error-for-error
parity with the reference out of the box; `Engine.pragma("ansi_errors",
False)` opts a session into Spark's legacy wrap/NULL semantics.  Each
case asserts BOTH modes and the DuckDB behavior of the same expression,
with the deltas documented where DuckDB itself does NOT raise.

The fixture restores the session's EFFECTIVE prior value via a
no-default conf.get — `conf.get(key, "false")` returns the caller's
fallback even when the conf is unset with a built-in default of true,
so restoring THAT would silently flip the shared session out of ANSI
(found when decimal renderings changed corpus-wide mid-suite)."""

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

# (sql, legacy-mode Spark value): numeric down-casts WRAP in legacy
# mode, string casts NULL; both raise under ANSI and in DuckDB.
CAST_CASES = [
    ("SELECT CAST(128 AS TINYINT) AS v", -128),
    ("SELECT CAST('abc' AS INTEGER) AS v", None),
    (f"SELECT CAST({I64_MAX} AS INTEGER) AS v", -1),
]


@pytest.fixture
def ansi(spark):
    from data_chunk_compaction_in_duckdb_spark.engine import Engine

    eng = Engine(spark=spark, register=False)
    old = spark.conf.get("spark.sql.ansi.enabled")  # effective value
    yield eng
    eng.spark.conf.set("spark.sql.ansi.enabled", old)


def test_ansi_is_the_session_default(spark):
    """Spark 4 default = ANSI on = the reference's error semantics;
    every other suite (including the whole sqllogic corpus) runs under
    it, so a default flip would be a corpus-wide semantic change."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"


@pytest.mark.parametrize("sql,wrapped", ARITH_CASES)
def test_arith_overflow_both_modes(ansi, spark, duck, sql, wrapped):
    ansi.pragma("ansi_errors", False)
    assert spark.sql(sql).collect()[0].v == wrapped  # legacy wrap
    ansi.pragma("ansi_errors", True)
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        spark.sql(sql).collect()
    # the reference raises too (error-for-error parity)
    with pytest.raises(Exception, match="(?i)overflow|out of range"):
        duck.execute(sql).fetchall()


@pytest.mark.parametrize("sql,legacy", CAST_CASES)
def test_cast_overflow_both_modes(ansi, spark, duck, sql, legacy):
    ansi.pragma("ansi_errors", False)
    assert spark.sql(sql).collect()[0].v == legacy
    ansi.pragma("ansi_errors", True)
    with pytest.raises(Exception, match="(?i)cast"):
        spark.sql(sql).collect()
    with pytest.raises(Exception, match="(?i)conversion|cast|out of range"):
        duck.execute(sql).fetchall()


def test_division_by_zero_modes(ansi, spark, duck):
    """Documented delta: DuckDB integer division by zero yields NULL
    (test/sql/types/numeric), matching Spark's LEGACY mode; ANSI Spark
    raises (stricter than the reference here)."""
    ansi.pragma("ansi_errors", False)
    assert spark.sql("SELECT 1 / 0 AS v").collect()[0].v is None
    assert duck.execute("SELECT 1 // 0").fetchall() == [(None,)]
    ansi.pragma("ansi_errors", True)
    with pytest.raises(Exception, match="(?i)divide|division"):
        spark.sql("SELECT 1 / 0 AS v").collect()


def test_unknown_pragma_still_rejected(ansi):
    with pytest.raises(ValueError, match="no runtime-settable"):
        ansi.pragma("not_a_pragma", 1)
