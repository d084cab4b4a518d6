"""Generate a measurement-scale replica of the driver's synthetic testdata.

The driver's own sf1.0 dataset (BENCH_r05.json records "sf": 1.0) is
generated on its side and not present in the sandbox; /root/testdata stops
at sf0.1. For the optimization round we need to MEASURE at the driver's
scale, so this script produces a local sf-scaled dataset with the same
schema and the same distributional shape as /root/testdata/sf0.1 (row
counts x10, same vocab / key ranges x10 / value distributions, seed=42
deterministic). It is used for TIMING ONLY: the correctness gate stays the
driver's sf0.01 oracle; nothing in any query path reads this directory
unless $SPARK_GRAFT_SF_DIR points at it.

Usage: python scripts/gen_sf.py [--sf 1.0] [--out /root/repo/.data/sf1.0]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "agg", "batch", "big", "column", "customer", "data", "fast", "filter",
    "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "value", "vector", "window", "a", "the",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def write(out_dir: str, name: str, table: pa.Table) -> None:
    # ONE row group per table, matching the driver layout (/root/testdata
    # tables are single-row-group; the adverse scan shape F2 targets)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                   compression="snappy", row_group_size=1 << 31)
    print(f"{name}: {table.num_rows} rows")


def gen(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    s = sf / 0.1  # scale relative to sf0.1
    rng = np.random.default_rng(42)

    n_cust = int(15000 * s)
    n_supp = int(1000 * s)
    n_part = int(20000 * s)
    n_ord = int(150000 * s)
    n_li = int(600000 * s)
    n_ev = int(100000 * s)
    n_doc = int(5000 * s)
    n_emb = int(2000 * s)

    # region / nation (fixed-size dims)
    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    # customer
    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
                      "MACHINERY"])[rng.integers(0, 5, n_cust)]),
    }))

    # supplier
    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    # part
    adjectives = ["large", "hot", "small", "cold", "red", "green", "soft",
                  "dim"]
    nouns = ["ring", "bolt", "case", "drum", "gear", "cam", "plate", "rod"]
    names = np.array([f"{a} {n}" for a in adjectives for n in nouns])
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(names[rng.integers(0, len(names), n_part)]),
        "p_brand": pa.array([f"Brand#{b}" for b in
                             rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL",
             "STANDARD"])[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) / 100.0, 2),
    }))

    # orders
    day = np.timedelta64(86400, "s")
    d0 = np.datetime64("1995-01-01", "s")
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(
            d0 + rng.integers(0, 2404, n_ord) * day,
            pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"])[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            d0 + rng.integers(1, 2500, n_li) * day, pa.timestamp("us")),
    }))

    # events: exponential inter-arrival over a 30-day window, exp values
    t0 = np.datetime64("2024-01-01", "us")
    gaps = rng.exponential(30 * 86400 / n_ev, n_ev)
    ts = t0 + (np.cumsum(gaps) * 1e6).astype(np.int64).astype(
        "timedelta64[us]")
    n_users = int(1500 * s)
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(
            ["view", "click", "signup", "purchase",
             "error"])[rng.integers(0, 5, n_ev)]),
        "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 600.0), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, n_ev)]),
    }))

    # documents: 10..100 words from the 30-word vocab (+ rare 'dup')
    vocab = np.array(VOCAB + ["dup"])
    p = np.full(31, 1.0 / 30.0)
    p[30] = 0.001
    p /= p.sum()
    lens = rng.integers(10, 101, n_doc)
    total = int(lens.sum())
    words = vocab[rng.choice(31, total, p=p)]
    texts = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(words[pos:pos + ln]))
        pos += ln
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 clusters of L2-normalized 64-dim float32
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = centers[labels] + rng.normal(0, 0.35, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))

    open(os.path.join(out_dir, "_DONE"), "w").close()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", f"sf{args.sf}")
    gen(args.sf, out)
