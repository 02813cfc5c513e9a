"""Settings surface unit grid (engine settings store + DuckDB parity).

Dual-engine behavior is pinned by tests/sqllogic/settings_set_readback
.test (generated with live DuckDB validation) and the oracle-paired
``introspect_settings`` registry query; this file pins the pure-Python
pieces — DuckDB 1.0's probed memory grammar/formatter and the SET/RESET
SQL parser — which must stay byte-compatible for those to hold.
"""

from __future__ import annotations

import pytest

from data_chunk_compaction_in_duckdb_spark.settings import (
    canonical_name,
    parse_memory,
    parse_reset,
    parse_set,
    render_memory,
)


def test_memory_render_matches_duckdb_probes():
    # every pair probed against DuckDB 1.0 (SET memory_limit readback)
    for text, rendered in [
        ("2GB", "1.8 GiB"),
        ("1GB", "953.6 MiB"),
        ("512MB", "488.2 MiB"),
        ("1000MB", "953.6 MiB"),
        ("16GB", "14.9 GiB"),
        ("1GiB", "1.0 GiB"),
        ("100KB", "97.6 KiB"),
        ("1TB", "931.3 GiB"),
        ("2.5GB", "2.3 GiB"),
        ("1KB", "1000 bytes"),
        ("2kb", "1.9 KiB"),
        ("900B", "900 bytes"),
        ("1b", "1 byte"),
        ("10KiB", "10.0 KiB"),
        ("0.5GB", "476.8 MiB"),
    ]:
        assert render_memory(parse_memory(text)) == rendered, text


def test_memory_parse_rejects_like_duckdb():
    for bad in ["123456789", "0", "12elephants", "", "GB"]:
        with pytest.raises(ValueError, match="Unknown unit"):
            parse_memory(bad)


def test_set_reset_grammar():
    assert parse_set("SET threads=7") == ("threads", 7, None)
    assert parse_set("SET threads TO 5") == ("threads", 5, None)
    assert parse_set("PRAGMA threads=9") == ("threads", 9, None)
    assert parse_set("SET memory_limit='2GB'") == (
        "memory_limit", "2GB", None,
    )
    assert parse_set("SET enable_progress_bar=true") == (
        "enable_progress_bar", "true", None,
    )
    assert parse_set("SET TimeZone='Asia/Tokyo';") == (
        "TimeZone", "Asia/Tokyo", None,
    )
    assert parse_set("SET SESSION enable_progress_bar=true") == (
        "enable_progress_bar", "true", "session",
    )
    assert parse_set("SET GLOBAL threads=4") == ("threads", 4, "global")
    # dotted Spark conf keys and SQL variables never match
    assert parse_set("SET spark.sql.adaptive.enabled=true") is None
    assert parse_set("SET VARIABLE x = 3") is None
    assert parse_set("SELECT 1") is None
    assert parse_reset("RESET threads") == ("threads", None)
    assert parse_reset("RESET SESSION enable_progress_bar") == (
        "enable_progress_bar", "session",
    )
    assert parse_reset("RESET GLOBAL threads") == ("threads", "global")
    assert parse_reset("RESET spark.sql.x") is None


def test_scope_rules_match_duckdb():
    # probed: SESSION-qualified SET/RESET of a GLOBAL-scope setting
    # raises; GLOBAL qualification and LOCAL-scope settings are fine
    from data_chunk_compaction_in_duckdb_spark.settings import check_scope

    check_scope("threads", None, "set")
    check_scope("threads", "global", "reset")
    check_scope("enable_progress_bar", "session", "reset")
    with pytest.raises(ValueError, match="cannot be set locally"):
        check_scope("threads", "session", "set")
    with pytest.raises(ValueError, match="cannot be reset locally"):
        check_scope("memory_limit", "session", "reset")


def test_canonical_name_aliases_and_errors():
    assert canonical_name("max_memory") == "memory_limit"
    assert canonical_name("timezone") == "TimeZone"
    assert canonical_name("THREADS") == "threads"
    with pytest.raises(ValueError, match="unrecognized configuration"):
        canonical_name("nosuch")
