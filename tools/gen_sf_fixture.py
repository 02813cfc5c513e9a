#!/usr/bin/env python
"""Deterministic fixture generator for larger scale factors.

The driver ships read-only parquet at sf0.001/0.01/0.1; the sf1
validation sweep (round-2 verdict item 6) needs a 10x dataset to flush
partitioning/sampling races the small fixtures can mask (the
spark_partition_id-over-unpersisted-repartition class documented in
SCALE.md).  This tool mirrors the shipped tables' schemas and value
domains — verified against sf0.1 with pyarrow/duckdb — at any scale,
seeded, so both engines read identical files and every oracle stays
bit-comparable.

Row counts scale linearly from sf0.1 (customer 150k/sf, orders 1.5M/sf,
lineitem ~6.1M/sf, events 1M/sf, documents 50k/sf, embeddings 20k/sf);
region/nation stay fixed dimension tables.

Usage:  python tools/gen_sf_fixture.py 1 /root/repo/.localdata/sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ADJ = ["large", "hot", "blue", "small", "red", "green", "dark", "pale"]
NOUN = ["ring", "bolt", "gear", "widget", "gizmo", "cog", "frame", "tube"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = (
    "spark line column order batch part sort fast value scan query agg "
    "table hash stream filter customer key group slow vector small merge "
    "join window data a b"
).split()
LANG_WORDS = {
    "en": ["the", "and", "of", "to", "is", "with", "for", "that"],
    "de": ["der", "die", "das", "und", "ist", "mit", "für", "nicht"],
    "es": ["el", "la", "los", "las", "es", "con", "para", "que"],
    "fr": ["le", "la", "les", "est", "avec", "pour", "que", "des"],
    "zh": ["一二三", "数据", "查询"],
}
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    def write(name, table):
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
        print(f"wrote {name}: {table.num_rows} rows")

    # fixed dims — identical to the shipped fixtures
    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, n_cust, -1000, 10000),
        "c_mktsegment": np.array(MKTSEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    n_supp = int(10_000 * sf)
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, n_supp, -1000, 10000),
    }))

    n_part = int(200_000 * sf)
    adj = np.array(ADJ)[rng.integers(0, len(ADJ), n_part)]
    noun = np.array(NOUN)[rng.integers(0, len(NOUN), n_part)]
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": np.array(TYPES)[rng.integers(0, len(TYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
    }))

    n_ord = int(1_500_000 * sf)
    base = np.datetime64("1995-01-01", "us")
    odates = base + rng.integers(0, 2400, n_ord) * np.timedelta64(86_400_000_000, "us")
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, n_ord, 1000, 500000),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": np.array(PRIOS)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: 1..7 lines per order (mean ~4, matching the fixture)
    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, c + 1) for c in lines_per]).astype(np.int32)
    sdates = np.repeat(odates, lines_per) + rng.integers(1, 96, n_li) * np.timedelta64(86_400_000_000, "us")
    write("lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": _money(rng, n_li, 900, 105000),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(sdates, pa.timestamp("us")),
    }))

    n_ev = int(1_000_000 * sf)
    ev_base = np.datetime64("2024-01-01", "us")
    ts = ev_base + rng.integers(0, 30 * 86_400_000_000, n_ev).astype("timedelta64[us]")
    ts = np.sort(ts)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, int(15_000 * sf), n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(80, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    n_doc = int(50_000 * sf)
    langs = np.array(LANGS)[rng.choice(len(LANGS), n_doc, p=LANG_P)]
    texts = []
    for i in range(n_doc):
        lang = langs[i]
        n_words = int(rng.integers(10, 60))
        words = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n_words)]
        # sprinkle the language's marker words so language_id has signal
        markers = LANG_WORDS[lang]
        for pos in rng.integers(0, n_words, max(2, n_words // 5)):
            words[pos] = markers[int(rng.integers(0, len(markers)))]
        texts.append(" ".join(words))
    # a few exact duplicates (the shipped sf0.1 has ~8) for the dedup ops
    for _ in range(max(1, n_doc // 600)):
        a, b = rng.integers(0, n_doc, 2)
        texts[a] = texts[b]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_vec = int(20_000 * sf)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_vec)
    vecs = centers[labels] * 0.8 + rng.normal(0, 0.3, (n_vec, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.localdata/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}"
    generate(sf, out)
