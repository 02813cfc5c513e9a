"""Oracle parity for the scalar-function coverage tail."""

from __future__ import annotations

import pytest

from tests.oracle_compare import assert_query_matches_oracle


def _names():
    from data_chunk_compaction_in_duckdb_spark.queries import (
        REGISTRY,
        functions_more,
    )

    return [
        n
        for n, q in REGISTRY.items()
        if q.builder.__module__ == functions_more.__name__
    ]


@pytest.mark.parametrize("name", _names())
def test_functions_more_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_inet_functions_edges(spark):
    """inet_aton rejects malformed/out-of-range quads (NULL, matching
    the INET cast error surface), ntoa round-trips, and containment
    handles non-aligned CIDR bases by normalizing to the block start."""
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.functions.inet import (
        inet_aton,
        inet_contains,
        inet_ntoa,
    )

    df = spark.createDataFrame(
        [
            ("192.168.1.200", True),
            ("0.0.0.0", True),
            ("255.255.255.255", True),
            ("256.1.1.1", False),
            ("1.2.3", False),
            ("a.b.c.d", False),
            ("1.2.3.4.5", False),
        ],
        "ip string, ok boolean",
    )
    out = df.select(
        "ip",
        "ok",
        inet_aton("ip").alias("addr"),
        inet_ntoa(inet_aton("ip")).alias("rt"),
        inet_contains("192.168.0.0/16", F.col("ip")).alias("in_net"),
    ).collect()
    for r in out:
        assert (r.addr is not None) == r.ok, r
        if r.ok:
            assert r.rt == r.ip, r
    by_ip = {r.ip: r for r in out}
    assert by_ip["192.168.1.200"].in_net is True
    assert by_ip["0.0.0.0"].in_net is False
    # non-aligned base normalizes: 10.57.200.7/16 == 10.57.0.0/16
    df2 = spark.createDataFrame([("10.57.3.9",), ("10.58.0.0",)], "ip string")
    rows = df2.select(
        inet_contains("10.57.200.7/16", F.col("ip")).alias("c")
    ).collect()
    assert [r.c for r in rows] == [True, False]
