import importlib
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
cmod = importlib.import_module(
    "data_chunk_compaction_in_duckdb_spark.compaction.compact"
)
import data_chunk_compaction_in_duckdb_spark.compaction as cpkg  # noqa: E402
from data_chunk_compaction_in_duckdb_spark.queries import REGISTRY  # noqa: E402
from data_chunk_compaction_in_duckdb_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
orig = cmod.fan_out


def uncapped(df, min_partitions=None, bytes_per_task=None):
    return orig(df, min_partitions)  # ignore the cap = r9 behavior


def set_impl(f):
    cmod.fan_out = f
    cpkg.fan_out = f


spark = get_spark(app_name="ab_veccap")
names = [
    "sim_topk_bruteforce",
    "sim_ann_ivf_topk",
    "sim_ann_pq_adc_topk",
    "dedup_semantic_ivf_pairs",
]
for name in names:
    builder = REGISTRY[name].builder
    times = {"r9_slots": [], "r10_cap": []}
    for v in times:  # warm-up
        set_impl(uncapped if v == "r9_slots" else orig)
        builder(spark, SF).write.format("noop").mode("overwrite").save()
    for _ in range(7):
        for v in times:
            set_impl(uncapped if v == "r9_slots" else orig)
            t0 = time.monotonic()
            builder(spark, SF).write.format("noop").mode("overwrite").save()
            times[v].append(time.monotonic() - t0)
    print(
        json.dumps(
            {
                "query": name,
                **{
                    v: {
                        "med": round(statistics.median(ts), 4),
                        "min": round(min(ts), 4),
                    }
                    for v, ts in times.items()
                },
            }
        ),
        flush=True,
    )
set_impl(orig)
spark.stop()
