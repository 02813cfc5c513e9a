"""Tests: events queries vs oracle, Structured Streaming parity with the
batch twin, sources round-trips, plan-inspection assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_compare import assert_query_matches_oracle


def _event_names():
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY, events_q

    return [
        n for n, q in REGISTRY.items() if q.builder.__module__ == events_q.__name__
    ]


@pytest.mark.parametrize("name", _event_names())
def test_events_query_matches_oracle(spark, duck, sf_dir, name):
    assert_query_matches_oracle(spark, duck, sf_dir, name)


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    """Streaming (memory sink, processAllAvailable) must equal the batch
    twin — the semantics guarantee Structured Streaming is built on."""
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_tumbling_counts,
    )

    sdf = streaming_tumbling_counts(spark, sf_dir)
    run_stream_to_memory(sdf, name="t_stream_out", mode="complete")
    got = {
        (r.win_start, r.event_type): (r.n, r.total)
        for r in spark.table("t_stream_out").collect()
    }
    batch = REGISTRY["events_tumbling_window"].builder(spark, sf_dir)
    exp = {
        (r.win_start, r.event_type): (r.n, r.total) for r in batch.collect()
    }
    assert got == exp


def _batch_events_utc(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "ts_evt",
        F.timestamp_micros(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            )
        ),
    )


def test_streaming_sliding_matches_batch(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_sliding_counts,
    )

    sdf = streaming_sliding_counts(spark, sf_dir)
    run_stream_to_memory(sdf, name="t_slide_out", mode="complete")
    got = {
        (r.win_start, r.event_type): r.n
        for r in spark.table("t_slide_out").collect()
    }
    batch = (
        _batch_events_utc(spark, sf_dir)
        .groupBy(F.window("ts_evt", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval("
                "0, 0, 0, CAST(unix_micros(w.start) AS DECIMAL(26,6))"
                " / 1000000)"
            ).alias("win_start"),
            "event_type",
            "n",
        )
    )
    exp = {(r.win_start, r.event_type): r.n for r in batch.collect()}
    assert got == exp
    # sliding windows double-count by construction: total == 2 * events
    n_events = _batch_events_utc(spark, sf_dir).count()
    assert sum(got.values()) == 2 * n_events


def test_streaming_session_windows_matches_batch(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_session_windows,
    )

    sdf = streaming_session_windows(spark, sf_dir)
    run_stream_to_memory(sdf, name="t_sess_win_out", mode="complete")
    got = {
        (r.user_id, r.sess_start): r.n_events
        for r in spark.table("t_sess_win_out").collect()
    }
    batch = (
        _batch_events_utc(spark, sf_dir)
        .groupBy(F.session_window("ts_evt", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.expr(
                "TIMESTAMP_NTZ '1970-01-01 00:00:00' + make_dt_interval("
                "0, 0, 0, CAST(unix_micros(w.start) AS DECIMAL(26,6))"
                " / 1000000)"
            ).alias("sess_start"),
            "n_events",
        )
    )
    exp = {(r.user_id, r.sess_start): r.n_events for r in batch.collect()}
    assert got == exp
    # session counts must agree with the stateful sessionizer's totals
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    sess = REGISTRY["events_sessionization"].builder(spark, sf_dir)
    n_sessions_batch = sum(r.n_sessions for r in sess.collect())
    assert len(got) == n_sessions_batch


def test_streaming_dedup_matches_batch(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_dedup_events,
    )

    sdf = streaming_dedup_events(spark, sf_dir)
    run_stream_to_memory(sdf, name="t_dedup_out", mode="append")
    got = {
        (r.user_id, r.event_type)
        for r in spark.table("t_dedup_out").collect()
    }
    exp = {
        (r.user_id, r.event_type)
        for r in _batch_events_utc(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == exp


def test_streaming_static_join_matches_batch(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_static_join_rollup,
    )

    sdf = streaming_static_join_rollup(spark, sf_dir)
    run_stream_to_memory(sdf, name="t_sj_out", mode="complete")
    got = {
        r.tier: (r.n, r.total_value) for r in spark.table("t_sj_out").collect()
    }
    ev = _batch_events_utc(spark, sf_dir)
    dim = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_total"))
        .select(
            "user_id",
            F.when(F.col("n_total") >= 100, "heavy")
            .otherwise("light")
            .alias("tier"),
        )
    )
    batch = (
        ev.join(dim, "user_id")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    exp = {r.tier: (r.n, r.total_value) for r in batch.collect()}
    assert got == exp


def test_streaming_stateful_sessionize_matches_batch(spark, sf_dir):
    """applyInPandasWithState sessionization == batch sessionization when
    the whole fixture arrives as one micro-batch."""
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY
    from data_chunk_compaction_in_duckdb_spark.streaming import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    sdf = streaming_sessionize(spark, sf_dir)
    run_stream_to_memory(sdf, name="t_sessions_out", mode="update")
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.table("t_sessions_out").collect()
    }
    batch = REGISTRY["events_sessionization"].builder(spark, sf_dir)
    exp = {}
    for r in batch.collect():
        total_events = round(r.avg_events_per_session * r.n_sessions)
        exp[r.user_id] = (r.n_sessions, int(total_events))
    assert got == exp


def test_sources_roundtrip(spark, tmp_path):
    from data_chunk_compaction_in_duckdb_spark.sources import (
        copy_to_file,
        from_values,
        range_source,
        read_csv,
        read_json,
        read_parquet,
    )

    df = from_values(spark, [(1, "a"), (2, "b")], "id INT, v STRING")
    p = str(tmp_path / "t.parquet")
    copy_to_file(df, p, fmt="parquet", compact_target_rows=10)
    assert sorted(r.id for r in read_parquet(spark, p).collect()) == [1, 2]

    c = str(tmp_path / "t.csv")
    copy_to_file(df, c, fmt="csv")
    back = read_csv(spark, c, schema="id INT, v STRING", header=False)
    assert back.count() == 2

    j = str(tmp_path / "t.json")
    copy_to_file(df, j, fmt="json")
    assert read_json(spark, j, schema="id INT, v STRING").count() == 2

    assert range_source(spark, 0, 100, 7).count() == 15


def test_plan_q6_pushdown_no_shuffle_before_agg(spark, sf_dir):
    """TPC-H Q6 shape: every predicate must reach the parquet scan and the
    plan must contain exactly one exchange (the final 1-row aggregate)."""
    from data_chunk_compaction_in_duckdb_spark.plans import (
        count_exchanges,
        has_filter_pushdown,
    )
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["tpch_q6_forecast_revenue"].builder(spark, sf_dir)
    assert has_filter_pushdown(df, "l_discount")
    assert has_filter_pushdown(df, "l_shipdate")
    assert count_exchanges(df) <= 1


def test_plan_q3_broadcasts_dimensions(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.plans import join_strategies
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["tpch_q3_shipping_priority"].builder(spark, sf_dir)
    strats = join_strategies(df)
    assert strats and all(s == "BroadcastHashJoin" for s in strats), strats


def test_plan_scan_projection_prunes_columns(spark, sf_dir):
    from data_chunk_compaction_in_duckdb_spark.plans import explain_str
    from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY

    df = REGISTRY["scan_projection_filter"].builder(spark, sf_dir)
    plan = explain_str(df, "formatted")
    # ReadSchema must not include unused wide columns.
    import re

    m = re.search(r"ReadSchema: struct<(.*?)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "l_comment" not in cols and "l_partkey" not in cols
    assert {"l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"} <= cols


def test_summarize_one_pass(spark, sf_dir):
    """summarize(): one row per column, stats computed in native type,
    and the whole thing is a single aggregate job (one exchange)."""
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.plans import count_exchanges
    from data_chunk_compaction_in_duckdb_spark.sources import summarize

    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_returnflag")
    out = summarize(li)
    rows = {r.column_name: r for r in out.collect()}
    assert set(rows) == {"l_quantity", "l_returnflag"}
    q = rows["l_quantity"]
    # native numeric ordering: min is 1.0, not lexicographic "1.0" < "10.0"
    assert float(q.min) == 1.0 and float(q.max) == 50.0
    assert q.n_nulls == 0 and q["count"] > 0 and q.n_distinct == 50
    # the scale path: HLL distinct keeps the whole summary one exchange
    approx = summarize(li, approx=True)
    assert count_exchanges(approx) <= 1
    arows = {r.column_name: r for r in approx.collect()}
    assert abs(arows["l_quantity"].n_distinct - 50) <= 5


def test_export_import_database(spark, sf_dir, tmp_path):
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.sources import (
        export_database,
        import_database,
    )

    out = str(tmp_path / "exported")
    tables = {
        "nation": load_table(spark, sf_dir, "nation"),
        "region": load_table(spark, sf_dir, "region"),
    }
    export_database(spark, tables, out)
    back = import_database(spark, out)
    assert set(back) == {"nation", "region"}
    assert back["nation"].count() == tables["nation"].count()
    ddl = open(f"{out}/schema.sql").read()
    assert "CREATE TABLE nation" in ddl and "n_nationkey int" in ddl


def test_events_ts_is_session_tz_independent(spark, sf_dir, duck):
    """The ns→µs NTZ conversion must yield the same wall-clock under any
    session timezone (the driver's session TZ is unknown).  A cast-based
    conversion renders the instant in session TZ — this pins the
    arithmetic construction."""
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table

    expected = {
        r[0]: r[1]
        for r in duck.execute(
            "SELECT event_id, CAST(ts AS TIMESTAMP) FROM events"
            " WHERE event_id < 20 ORDER BY event_id"
        ).fetchall()
    }
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {
                r.event_id: r.ts
                for r in load_table(spark, sf_dir, "events")
                .filter(F.col("event_id") < 20)
                .select("event_id", "ts")
                .collect()
            }
            assert got == expected, f"wall-clock shifted under session TZ {tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_attach_detach_database(spark, sf_dir):
    """ATTACH a second SF directory under an alias prefix and join across
    the two catalogs; DETACH removes exactly the attached views."""
    from data_chunk_compaction_in_duckdb_spark.catalog import register_views
    from data_chunk_compaction_in_duckdb_spark.sources import (
        attach_database,
        detach_database,
    )

    register_views(spark, sf_dir)
    attached = attach_database(spark, "/root/testdata/sf0.001", "tiny")
    assert "tiny_nation" in attached and "tiny_lineitem" in attached
    cross = spark.sql(
        """
        SELECT n.n_name, t.n_name AS tiny_name
        FROM nation n JOIN tiny_nation t ON n.n_nationkey = t.n_nationkey
        """
    )
    assert cross.count() == 25
    assert cross.filter("n_name <> tiny_name").count() == 0
    n = detach_database(spark, "tiny")
    assert n == len(attached)
    assert not spark.catalog.tableExists("tiny_nation")


def test_like_prefix_pushes_startswith(spark, sf_dir):
    """LIKE 'A%' must reach the parquet scan as StringStartsWith — the
    Catalyst analog of the reference's LIKE->prefix rewrite
    (rule/like_optimizations.cpp) feeding table_filters."""
    from data_chunk_compaction_in_duckdb_spark.plans.inspect import explain_str

    df = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_name").like("A%"))
        .select("n_name")
    )
    plan = explain_str(df, "formatted")
    assert "StringStartsWith(n_name,A)" in plan
    df2 = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_type").like("%BRASS"))
        .select("p_partkey")
    )
    plan2 = explain_str(df2, "formatted")
    assert "StringEndsWith(p_type,BRASS)" in plan2


def test_explain_analyze_metrics(spark, sf_dir):
    """Executed-plan metrics (EXPLAIN ANALYZE analog): operator tree with
    numOutputRows, and per-join row factors (HashJoinProfiler's chunk
    factor at row granularity)."""
    from data_chunk_compaction_in_duckdb_spark.plans import (
        explain_analyze,
        join_row_factors,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_quantity") > 40)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    ops = explain_analyze(df)
    names = [m.name for m in ops]
    assert any(n.startswith("AdaptiveSparkPlan") for n in names)
    assert any("Join" in n for n in names)
    scans = [m for m in ops if m.name.startswith("Scan") and m.rows]
    assert len(scans) == 2 and all(m.rows > 0 for m in scans)

    factors = join_row_factors(df, execute=True)
    assert len(factors) == 1
    f = factors[0]
    assert f["output_rows"] > 0 and f["input_rows"] > 0
    # join of filtered lineitem to orders keeps every probe row here, but
    # the factor must be computed and finite
    assert 0 < f["row_factor"] < 2


def test_streaming_interval_join_matches_batch(spark, sf_dir):
    """Stream-stream interval join (purchase <- same-user clicks within
    30 min) must equal the equivalent batch join."""
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.streaming.events import (
        run_stream_to_memory,
        streaming_interval_join,
    )
    from pyspark.sql import functions as F

    sdf = streaming_interval_join(spark, sf_dir)
    run_stream_to_memory(sdf, "interval_join_out")
    got = sorted(
        tuple(r) for r in spark.table("interval_join_out").collect()
    )

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    batch = (
        clicks.join(
            buys,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            F.col("p_user").alias("user_id"),
            F.col("c_ts").alias("click_ts"),
            F.col("p_ts").alias("purchase_ts"),
            F.col("p_value").alias("purchase_value"),
        )
    )
    want = sorted(tuple(r) for r in batch.collect())
    assert len(got) > 0
    assert got == want


def test_streaming_upsert_sink_matches_batch(spark, sf_dir, tmp_path):
    """The foreachBatch-maintained state table must equal the batch
    per-user aggregate regardless of micro-batch boundaries."""
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.streaming.events import (
        streaming_upsert_sink,
    )
    from pyspark.sql import functions as F

    state = str(tmp_path / "user_state")
    streaming_upsert_sink(spark, sf_dir, state)
    got = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in spark.read.parquet(state).collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_tws_running_totals_parity_or_env_gate(spark, sf_dir):
    """transformWithStateInPandas running totals == batch groupBy when
    the protobuf runtime exists; otherwise the operator must fail fast
    with the documented ImportError (environment gate, not a stub)."""
    import pytest
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.streaming import events as sev

    if not sev.tws_available():
        with pytest.raises(ImportError, match="protobuf"):
            sev.streaming_tws_running_totals(spark, sf_dir)
        pytest.skip("google.protobuf not installed; TWS API gated off")

    out = sev.streaming_tws_running_totals(spark, sf_dir)
    sev.run_stream_to_memory(out, name="tws_totals", mode="update")
    res = spark.table("tws_totals")
    import os

    batch = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    assert res.exceptAll(batch).count() == 0
    assert batch.exceptAll(res).count() == 0
