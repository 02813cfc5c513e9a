"""Train Benchmark corpus — all 6 graph-pattern queries (reference
benchmark/trainbenchmark/queries/{poslength,switchmonitored,routesensor,
switchset,semaphoreneighbor,connectedsegments}.sql over the railway
model of schema.sql) on the fixture.

Like ClickBench/H2O.ai, every query is ONE dialect-common SQL text run
verbatim by BOTH engines.  The railway entity/edge tables derive from
the TPC-H-ish fixture: Route=orders (active from status, entry/exit
semaphore refs from custkey with NULL punch-outs), Segment/Switch=part,
Semaphore=customer, SwitchPosition=lineitem (route=orderkey,
target=partkey), requires=distinct (orderkey, sensor) pairs of
qty-filtered lineitem, monitoredBy=a deterministic block grouping of
parts under sensors (sensor = partkey rounded down to its 10-block;
multiples of 7 left unmonitored — the model's unmonitored elements),
connectsTo=consecutive-partkey adjacency (the linear track).

Determinism/size deltas from the reference text (documented per query):
the three patterns whose raw matches grow superlinearly with SF
(routesensor, switchset, semaphoreneighbor) return the canonical
COUNT + MIN row instead of raw tuples — the JOB-corpus output
convention — and raw-output queries carry full ORDER BY.

Scale: every pattern is a chain of equi-joins on derived integer keys —
shuffle-partitioned joins end to end; the anti patterns are
null-filtered LEFT joins (Catalyst anti-join); nothing collects or
single-tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_chunk_compaction_in_duckdb_spark.catalog import register_views
from data_chunk_compaction_in_duckdb_spark.queries.registry import query

_TB = """tb_route AS (
  SELECT o_orderkey AS id,
         CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS active,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_custkey END AS entry,
         CASE WHEN o_orderkey % 13 = 0 THEN NULL
              ELSE (o_custkey + 7) % 150 END AS exit
  FROM orders),
tb_segment AS (SELECT p_partkey AS id, p_size - 3 AS length FROM part),
tb_semaphore AS (SELECT c_custkey AS id, c_custkey % 3 AS signal
                 FROM customer),
tb_switch AS (SELECT p_partkey AS id, p_partkey % 4 AS currentPosition
              FROM part),
tb_swpos AS (SELECT l_orderkey * 8 + l_linenumber AS id,
                    l_orderkey AS route, l_partkey AS target,
                    l_linenumber % 4 AS position
             FROM lineitem),
tb_monitored AS (SELECT DISTINCT p_partkey AS te,
                        p_partkey - (p_partkey % 10) AS sensor
                 FROM part WHERE p_partkey % 7 <> 0),
tb_sensor AS (SELECT DISTINCT sensor AS id FROM tb_monitored),
tb_requires AS (SELECT DISTINCT l_orderkey AS route,
                       l_partkey - (l_partkey % 10) AS sensor
                FROM lineitem WHERE l_quantity > 49),
tb_connects AS (SELECT a.p_partkey AS te1, b.p_partkey AS te2
                FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1)"""

_QUERIES: dict[str, tuple[str, str]] = {
    "tb_poslength": (
        "invalid segment lengths (single-table filter)",
        "SELECT id AS segment, length FROM tb_segment WHERE length <= 0 "
        "ORDER BY segment",
    ),
    "tb_switchmonitored": (
        "switches without a monitoring sensor (anti pattern)",
        "SELECT tb_switch.id AS sw FROM tb_switch "
        "LEFT JOIN tb_monitored ON tb_monitored.te = tb_switch.id "
        "WHERE tb_monitored.te IS NULL ORDER BY sw",
    ),
    "tb_routesensor": (
        "route missing the requires edge to a sensor its switch is "
        "monitored by (4-join + anti; COUNT+MIN output)",
        "SELECT COUNT(*) AS n, MIN(route) AS min_route, "
        "MIN(sensor) AS min_sensor, MIN(swp) AS min_swp, MIN(sw) AS min_sw "
        "FROM (SELECT r.id AS route, sen.id AS sensor, sp.id AS swp, "
        "sw.id AS sw "
        "FROM tb_sensor sen "
        "JOIN tb_monitored mb ON mb.sensor = sen.id "
        "JOIN tb_switch sw ON sw.id = mb.te "
        "JOIN tb_swpos sp ON sp.target = sw.id "
        "JOIN tb_route r ON r.id = sp.route "
        "LEFT JOIN tb_requires req ON req.route = r.id "
        "AND req.sensor = sen.id "
        "WHERE req.sensor IS NULL) t",
    ),
    "tb_switchset": (
        "active route whose entry semaphore shows GO but the switch is "
        "not in the followed position (COUNT+MIN output)",
        "SELECT COUNT(*) AS n, MIN(semaphore) AS min_sem, "
        "MIN(route) AS min_route, MIN(swp) AS min_swp, MIN(sw) AS min_sw, "
        "MIN(position) AS min_pos, MIN(currentPosition) AS min_cur "
        "FROM (SELECT sem.id AS semaphore, r.id AS route, sp.id AS swp, "
        "sw.id AS sw, sp.position AS position, "
        "sw.currentPosition AS currentPosition "
        "FROM tb_route r "
        "JOIN tb_swpos sp ON r.id = sp.route "
        "JOIN tb_switch sw ON sp.target = sw.id "
        "JOIN tb_semaphore sem ON r.entry = sem.id "
        "WHERE r.active = 1 AND sw.currentPosition <> sp.position "
        "AND sem.signal = 2) t",
    ),
    "tb_semaphoreneighbor": (
        "routes over connected track elements whose semaphores do not "
        "line up (7-join neighbor pattern; COUNT+MIN output)",
        "SELECT COUNT(*) AS n, MIN(semaphore) AS min_sem, "
        "MIN(route1) AS min_r1, MIN(route2) AS min_r2, "
        "MIN(sensor1) AS min_s1, MIN(sensor2) AS min_s2 "
        "FROM (SELECT r1.exit AS semaphore, r1.id AS route1, "
        "rr2.route2 AS route2, req1.sensor AS sensor1, "
        "rr2.sensor2 AS sensor2 "
        "FROM tb_route r1 "
        "JOIN tb_requires req1 ON r1.id = req1.route "
        "JOIN tb_monitored mb1 ON req1.sensor = mb1.sensor "
        "JOIN tb_connects ct ON mb1.te = ct.te1 "
        "JOIN tb_monitored mb2 ON ct.te2 = mb2.te "
        "JOIN (SELECT req2.sensor AS sensor2, r2.id AS route2, "
        "r2.entry AS entry2 FROM tb_requires req2 "
        "JOIN tb_route r2 ON req2.route = r2.id) rr2 "
        "ON mb2.sensor = rr2.sensor2 "
        "WHERE r1.id <> rr2.route2 AND r1.exit IS NOT NULL "
        "AND (rr2.entry2 IS NULL OR rr2.entry2 <> r1.exit)) t",
    ),
    "tb_connectedsegments": (
        "six consecutive track segments monitored by one sensor "
        "(5-hop adjacency chain + 6-way same-sensor closure)",
        "SELECT mb1.sensor AS sensor, ct1.te1 AS segment1, "
        "ct2.te1 AS segment2, ct3.te1 AS segment3, ct4.te1 AS segment4, "
        "ct5.te1 AS segment5, ct5.te2 AS segment6 "
        "FROM tb_connects ct1 "
        "JOIN tb_connects ct2 ON ct1.te2 = ct2.te1 "
        "JOIN tb_connects ct3 ON ct2.te2 = ct3.te1 "
        "JOIN tb_connects ct4 ON ct3.te2 = ct4.te1 "
        "JOIN tb_connects ct5 ON ct4.te2 = ct5.te1 "
        "JOIN tb_monitored mb1 ON mb1.te = ct1.te1 "
        "JOIN tb_monitored mb2 ON mb2.te = ct2.te1 "
        "JOIN tb_monitored mb3 ON mb3.te = ct3.te1 "
        "JOIN tb_monitored mb4 ON mb4.te = ct4.te1 "
        "JOIN tb_monitored mb5 ON mb5.te = ct5.te1 "
        "JOIN tb_monitored mb6 ON mb6.te = ct5.te2 "
        "WHERE mb1.sensor = mb2.sensor AND mb1.sensor = mb3.sensor "
        "AND mb1.sensor = mb4.sensor AND mb1.sensor = mb5.sensor "
        "AND mb1.sensor = mb6.sensor "
        "ORDER BY sensor, segment1",
    ),
}


def _register(name: str, desc: str, body: str) -> None:
    full = f"WITH {_TB}\n{body}"

    @query(name, oracle=full)
    def _q(spark: SparkSession, sf_dir: str, _sql: str = full) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    _q.__doc__ = (
        f"Train Benchmark {name[3:]} (benchmark/trainbenchmark/queries/"
        f"{name[3:]}.sql): {desc}."
    )


for _name, (_desc, _body) in _QUERIES.items():
    _register(_name, _desc, _body)
