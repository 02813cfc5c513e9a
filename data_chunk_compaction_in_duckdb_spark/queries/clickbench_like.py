"""ClickBench corpus — all 43 queries (reference benchmark/clickbench/
queries/q01..q43.sql, run via clickbench.benchmark.in) mapped to the
``events`` fixture as a derived web-analytics ``hits`` relation.

Every query is ONE dialect-common SQL text executed verbatim by BOTH
engines: ``spark.sql`` over the registered fixture views (SURVEY.md §3
entry point 1) and DuckDB as the oracle.  That keeps the 43 shapes
byte-identical across engines — the same discipline the sqllogic corpus
uses — while still exercising Catalyst end-to-end (parse → optimize →
AQE), and it mirrors how the reference runs ClickBench: interpreted SQL
files against one loaded table.

Fixture mapping (the ``hits`` CTE below): UserID→user_id,
WatchID→event_id, EventTime→ts, EventDate→CAST(ts AS DATE), and the
remaining ClickBench columns as deterministic derivations of
(event_id, user_id, value) — AdvEngineID = event_id % 7,
ResolutionWidth = exact integer cents of value, SearchPhrase / URL /
Title / Referer as generated strings whose '' cases reproduce the
empty-string filters, CounterID = user_id % 20, etc.  Point/selectivity
constants are rescaled to the fixture (e.g. HAVING COUNT(*) > 100000 →
> 20, the July-2013 date band → a Jan-2024 band, OFFSET 1000 → 5) so
every query is non-degenerate at sf0.001..sf0.1 — same constant-scaling
discipline as the TPC-DS corpus.

Determinism deltas from the reference text (the driver gate hash-compares
rows): every ORDER BY gets a full unique tiebreaker suffix, and q18
(GROUP BY ... LIMIT with no ORDER BY) gains an ORDER BY — the reference
relies on sqllogictest-style unordered compare there.

Exactness: no AVG() — averages are CAST(SUM(int) AS DOUBLE) / COUNT(*)
so both engines divide the same exact integers (one IEEE division);
SUMs are over integer derivations only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_chunk_compaction_in_duckdb_spark.catalog import register_views
from data_chunk_compaction_in_duckdb_spark.queries.registry import query

_HITS = """hits AS (
  SELECT event_id, ts, user_id, event_type, value,
         event_id % 7 AS adv,
         CAST(ROUND(value * 100) AS BIGINT) AS width,
         CASE WHEN user_id % 13 = 0 THEN ''
              ELSE event_type || '_' || CAST(user_id % 13 AS STRING) END AS phrase,
         CASE WHEN event_id % 19 = 0 THEN ''
              ELSE 'https://site_' || CAST(event_id % 97 AS STRING)
                   || '.example/p/' || event_type END AS url,
         CASE WHEN event_id % 23 = 0 THEN ''
              ELSE 'T-' || CAST(event_id % 11 AS STRING) || '-'
                   || upper(event_type) END AS title,
         CASE WHEN user_id % 11 = 0 THEN ''
              ELSE 'https://ref_' || CAST(user_id % 31 AS STRING)
                   || '.example/x/' || CAST(user_id AS STRING) END AS ref,
         user_id % 10 AS region,
         user_id % 20 AS counter,
         user_id AS client_ip,
         event_id AS watch_id,
         event_id % 4 AS search_engine,
         event_id % 2 AS is_refresh,
         event_id % 5 AS is_link,
         CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END AS is_download,
         event_id % 3 AS dont_count,
         event_id % 50 AS url_hash,
         user_id % 4 AS ref_hash,
         event_id % 9 - 1 AS trafic_src,
         event_id % 12 AS win_w,
         user_id % 8 AS win_h,
         event_id % 3 AS mobile,
         CASE WHEN user_id % 5 = 0 THEN ''
              ELSE 'model_' || CAST(user_id % 5 AS STRING) END AS mobile_model,
         CAST(ts AS DATE) AS event_date
  FROM events)"""

_W90 = ", ".join(
    f"CAST(SUM(width + {i}) AS BIGINT) AS w{i}" for i in range(90)
)

_DATE_BAND = (
    "event_date >= DATE '2024-01-08' AND event_date <= DATE '2024-01-21'"
)

# q-number -> (description, SELECT body).  The full query text is
# `WITH <hits CTE> <body>` on both engines.
_QUERIES: dict[int, tuple[str, str]] = {
    1: ("full-table COUNT(*)",
        "SELECT COUNT(*) AS n FROM hits"),
    2: ("filtered COUNT(*)",
        "SELECT COUNT(*) AS n FROM hits WHERE adv <> 0"),
    3: ("ungrouped SUM/COUNT/AVG",
        "SELECT CAST(SUM(adv) AS BIGINT) AS sum_adv, COUNT(*) AS n, "
        "CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width FROM hits"),
    4: ("ungrouped AVG of a key",
        "SELECT CAST(SUM(user_id) AS DOUBLE) / COUNT(*) AS avg_user FROM hits"),
    5: ("COUNT(DISTINCT) high-cardinality",
        "SELECT COUNT(DISTINCT user_id) AS u FROM hits"),
    6: ("COUNT(DISTINCT) string",
        "SELECT COUNT(DISTINCT phrase) AS p FROM hits"),
    7: ("MIN/MAX of date",
        "SELECT MIN(event_date) AS min_d, MAX(event_date) AS max_d FROM hits"),
    8: ("top-K by small group",
        "SELECT adv, COUNT(*) AS c FROM hits WHERE adv <> 0 "
        "GROUP BY adv ORDER BY c DESC, adv LIMIT 10"),
    9: ("top-K regions by distinct users",
        "SELECT region, COUNT(DISTINCT user_id) AS u FROM hits "
        "GROUP BY region ORDER BY u DESC, region LIMIT 10"),
    10: ("multi-aggregate per region",
         "SELECT region, CAST(SUM(adv) AS BIGINT) AS sum_adv, COUNT(*) AS c, "
         "CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width, "
         "COUNT(DISTINCT user_id) AS u FROM hits "
         "GROUP BY region ORDER BY c DESC, region LIMIT 10"),
    11: ("distinct users per model, empty filtered",
         "SELECT mobile_model, COUNT(DISTINCT user_id) AS u FROM hits "
         "WHERE mobile_model <> '' GROUP BY mobile_model "
         "ORDER BY u DESC, mobile_model LIMIT 10"),
    12: ("two-key distinct users",
         "SELECT mobile, mobile_model, COUNT(DISTINCT user_id) AS u FROM hits "
         "WHERE mobile_model <> '' GROUP BY mobile, mobile_model "
         "ORDER BY u DESC, mobile, mobile_model LIMIT 10"),
    13: ("top search phrases",
         "SELECT phrase, COUNT(*) AS c FROM hits WHERE phrase <> '' "
         "GROUP BY phrase ORDER BY c DESC, phrase LIMIT 10"),
    14: ("top phrases by distinct users",
         "SELECT phrase, COUNT(DISTINCT user_id) AS u FROM hits "
         "WHERE phrase <> '' GROUP BY phrase ORDER BY u DESC, phrase LIMIT 10"),
    15: ("engine+phrase top-K",
         "SELECT search_engine, phrase, COUNT(*) AS c FROM hits "
         "WHERE phrase <> '' GROUP BY search_engine, phrase "
         "ORDER BY c DESC, search_engine, phrase LIMIT 10"),
    16: ("heavy-hitter users",
         "SELECT user_id, COUNT(*) AS c FROM hits "
         "GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10"),
    17: ("user+phrase pairs",
         "SELECT user_id, phrase, COUNT(*) AS c FROM hits "
         "GROUP BY user_id, phrase ORDER BY c DESC, user_id, phrase LIMIT 10"),
    18: ("pair aggregate, LIMIT slice (ORDER added for determinism)",
         "SELECT user_id, phrase, COUNT(*) AS c FROM hits "
         "GROUP BY user_id, phrase ORDER BY user_id, phrase LIMIT 10"),
    19: ("three-key with extracted minute",
         "SELECT user_id, extract(minute FROM ts) AS m, phrase, COUNT(*) AS c "
         "FROM hits GROUP BY user_id, extract(minute FROM ts), phrase "
         "ORDER BY c DESC, user_id, m, phrase LIMIT 10"),
    20: ("point lookup on user key",
         "SELECT user_id FROM hits WHERE user_id = 7"),
    21: ("LIKE substring count",
         "SELECT COUNT(*) AS n FROM hits WHERE url LIKE '%7.example%'"),
    22: ("LIKE + MIN + top-K",
         "SELECT phrase, MIN(url) AS min_url, COUNT(*) AS c FROM hits "
         "WHERE url LIKE '%7.example%' AND phrase <> '' "
         "GROUP BY phrase ORDER BY c DESC, phrase LIMIT 10"),
    23: ("multi-LIKE with NOT LIKE",
         "SELECT phrase, MIN(url) AS min_url, MIN(title) AS min_title, "
         "COUNT(*) AS c, COUNT(DISTINCT user_id) AS u FROM hits "
         "WHERE title LIKE '%CLICK%' AND url NOT LIKE '%site_1%' "
         "AND phrase <> '' GROUP BY phrase ORDER BY c DESC, phrase LIMIT 10"),
    24: ("row scan ordered by time",
         "SELECT event_id, user_id, event_type, url, phrase FROM hits "
         "WHERE url LIKE '%7.example%' ORDER BY ts, event_id LIMIT 10"),
    25: ("phrase scan ordered by time",
         "SELECT phrase FROM hits WHERE phrase <> '' "
         "ORDER BY ts, event_id LIMIT 10"),
    26: ("phrase scan ordered by phrase",
         "SELECT phrase FROM hits WHERE phrase <> '' "
         "ORDER BY phrase, event_id LIMIT 10"),
    27: ("phrase scan, two sort keys",
         "SELECT phrase FROM hits WHERE phrase <> '' "
         "ORDER BY ts, phrase, event_id LIMIT 10"),
    28: ("HAVING band over URL lengths (100000 -> 20 at fixture scale)",
         "SELECT counter, CAST(SUM(length(url)) AS DOUBLE) / COUNT(*) AS l, "
         "COUNT(*) AS c FROM hits WHERE url <> '' GROUP BY counter "
         "HAVING COUNT(*) > 20 ORDER BY l DESC, counter LIMIT 25"),
    29: ("regexp domain extraction + HAVING",
         "SELECT regexp_extract(ref, 'https?://([^/]+)/.*', 1) AS k, "
         "CAST(SUM(length(ref)) AS DOUBLE) / COUNT(*) AS l, COUNT(*) AS c, "
         "MIN(ref) AS min_ref FROM hits WHERE ref <> '' GROUP BY "
         "regexp_extract(ref, 'https?://([^/]+)/.*', 1) "
         "HAVING COUNT(*) > 20 ORDER BY l DESC, k LIMIT 25"),
    30: ("90-wide SUM projection stress",
         f"SELECT {_W90} FROM hits"),
    31: ("engine+IP multi-agg",
         "SELECT search_engine, client_ip, COUNT(*) AS c, "
         "CAST(SUM(is_refresh) AS BIGINT) AS sr, "
         "CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width FROM hits "
         "WHERE phrase <> '' GROUP BY search_engine, client_ip "
         "ORDER BY c DESC, search_engine, client_ip LIMIT 10"),
    32: ("near-unique two-key agg, filtered",
         "SELECT watch_id, client_ip, COUNT(*) AS c, "
         "CAST(SUM(is_refresh) AS BIGINT) AS sr, "
         "CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width FROM hits "
         "WHERE phrase <> '' GROUP BY watch_id, client_ip "
         "ORDER BY c DESC, watch_id, client_ip LIMIT 10"),
    33: ("near-unique two-key agg, unfiltered",
         "SELECT watch_id, client_ip, COUNT(*) AS c, "
         "CAST(SUM(is_refresh) AS BIGINT) AS sr, "
         "CAST(SUM(width) AS DOUBLE) / COUNT(*) AS avg_width FROM hits "
         "GROUP BY watch_id, client_ip "
         "ORDER BY c DESC, watch_id, client_ip LIMIT 10"),
    34: ("top URLs",
         "SELECT url, COUNT(*) AS c FROM hits "
         "GROUP BY url ORDER BY c DESC, url LIMIT 10"),
    35: ("constant + URL group",
         "SELECT 1 AS k, url, COUNT(*) AS c FROM hits "
         "GROUP BY k, url ORDER BY c DESC, url LIMIT 10"),
    36: ("arithmetic group keys",
         "SELECT client_ip, client_ip - 1 AS ip1, client_ip - 2 AS ip2, "
         "client_ip - 3 AS ip3, COUNT(*) AS c FROM hits "
         "GROUP BY client_ip, client_ip - 1, client_ip - 2, client_ip - 3 "
         "ORDER BY c DESC, client_ip LIMIT 10"),
    37: ("counter + date band page views",
         f"SELECT url, COUNT(*) AS pv FROM hits WHERE counter = 6 AND "
         f"{_DATE_BAND} AND dont_count = 0 AND is_refresh = 0 AND url <> '' "
         "GROUP BY url ORDER BY pv DESC, url LIMIT 10"),
    38: ("title page views",
         f"SELECT title, COUNT(*) AS pv FROM hits WHERE counter = 6 AND "
         f"{_DATE_BAND} AND dont_count = 0 AND is_refresh = 0 AND title <> '' "
         "GROUP BY title ORDER BY pv DESC, title LIMIT 10"),
    39: ("link flags + OFFSET slice (1000 -> 5 at fixture scale)",
         f"SELECT url, COUNT(*) AS pv FROM hits WHERE counter = 6 AND "
         f"{_DATE_BAND} AND is_refresh = 0 AND is_link <> 0 AND "
         "is_download = 0 GROUP BY url "
         "ORDER BY pv DESC, url LIMIT 10 OFFSET 5"),
    40: ("traffic-source matrix with CASE key",
         f"SELECT trafic_src, search_engine, adv, "
         "CASE WHEN search_engine = 0 AND adv = 0 THEN ref ELSE '' END AS src, "
         f"url AS dst, COUNT(*) AS pv FROM hits WHERE counter = 6 AND "
         f"{_DATE_BAND} AND is_refresh = 0 "
         "GROUP BY trafic_src, search_engine, adv, "
         "CASE WHEN search_engine = 0 AND adv = 0 THEN ref ELSE '' END, url "
         "ORDER BY pv DESC, trafic_src, search_engine, adv, src, dst "
         "LIMIT 10 OFFSET 5"),
    41: ("hash point filter + IN list",
         f"SELECT url_hash, event_date, COUNT(*) AS pv FROM hits WHERE "
         f"{_DATE_BAND} AND is_refresh = 0 AND trafic_src IN (-1, 6) AND "
         "ref_hash = 1 GROUP BY url_hash, event_date "
         "ORDER BY pv DESC, url_hash, event_date LIMIT 10 OFFSET 2"),
    42: ("viewport matrix at a URL-hash point",
         f"SELECT win_w, win_h, COUNT(*) AS pv FROM hits WHERE "
         f"{_DATE_BAND} AND is_refresh = 0 AND url_hash = 14 "
         "GROUP BY win_w, win_h ORDER BY pv DESC, win_w, win_h "
         "LIMIT 10 OFFSET 2"),
    43: ("per-minute series over a two-day band",
         "SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS m, "
         "COUNT(*) AS pv FROM hits WHERE "
         "event_date >= DATE '2024-01-14' AND event_date <= DATE '2024-01-15' "
         "AND is_refresh = 0 GROUP BY CAST(date_trunc('minute', ts) AS TIMESTAMP) "
         "ORDER BY m LIMIT 10 OFFSET 5"),
}


def _register(num: int, desc: str, body: str) -> None:
    full = f"WITH {_HITS}\n{body}"

    @query(f"clickbench_q{num:02d}", oracle=full)
    def _q(spark: SparkSession, sf_dir: str, _sql: str = full) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    _q.__doc__ = (
        f"ClickBench q{num:02d} (benchmark/clickbench/queries/"
        f"q{num:02d}.sql): {desc}.  Identical SQL text on both engines."
    )


for _num, (_desc, _body) in _QUERIES.items():
    _register(_num, _desc, _body)
