"""Deterministic synthetic testdata generator for scale factors beyond
the driver-provided sf0.1 — same star schema, same column domains and
distributions (measured from /root/testdata/sf0.1 — see comments per
table), seeded, so a sf1.0 run is reproducible byte-for-byte.

The driver's own generator is not published; this one replicates the
OBSERVED distributions (value domains, category weights, skew shapes,
planted exact-dup rate, unit-norm clustered embeddings) rather than its
exact byte stream — which is all correctness and benchmarking need,
because Spark and the DuckDB oracle always read the SAME files.

Usage:  python tools/gen_testdata.py <out_dir> [sf]
        python tools/gen_testdata.py /root/repo/testdata_sf1.0 1.0

Row counts scale linearly from the driver's table (TESTDATA.md):
lineitem 6M @ sf1.0, orders 1.5M, customer 150k, supplier 10k,
part 200k, events 1M, documents 50k, embeddings 20k.  region/nation
are fixed dimension tables copied verbatim from sf0.1.
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# the sf0.1 documents vocabulary, measured (31 distinct tokens)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
ADJ = ["blue", "hot", "small", "cold", "new", "old", "red", "large"]
NOUN = ["plate", "gear", "rod", "ring", "anvil", "bolt", "widget", "gizmo"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]  # measured sf0.1 mix


def _ts_array(days_ns: np.ndarray, origin: str) -> pa.Array:
    base = np.datetime64(origin, "us")
    return pa.array(base + days_ns.astype("timedelta64[us]"))


def generate(out: str, sf: float) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(150_000 * sf / 1.0)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    # customer: acctbal uniform(-1000, 10000) 2dp, nation uniform 0-24
    k = np.arange(n_cust, dtype=np.int64)
    pq.write_table(pa.table({
        "c_custkey": k,
        "c_name": pa.array([f"Customer#{i:09d}" for i in k]),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(list(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)])),
    }), f"{out}/customer.parquet")

    k = np.arange(n_supp, dtype=np.int64)
    pq.write_table(pa.table({
        "s_suppkey": k,
        "s_name": pa.array([f"Supplier#{i:09d}" for i in k]),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }), f"{out}/supplier.parquet")

    # part: retailprice 900 + 0.1*(key % 1000) (measured lattice)
    k = np.arange(n_part, dtype=np.int64)
    pq.write_table(pa.table({
        "p_partkey": k,
        "p_name": pa.array([
            f"{ADJ[a]} {NOUN[b]}" for a, b in zip(
                rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(list(np.array(PTYPES)[rng.integers(0, 6, n_part)])),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + 0.1 * (k % 1000), 2),
    }), f"{out}/orders_tmp_part.parquet")
    os.replace(f"{out}/orders_tmp_part.parquet", f"{out}/part.parquet")

    # orders: date uniform 1995-01-01..2001-08-01, status uniform O/P/F
    k = np.arange(n_ord, dtype=np.int64)
    span_us = int(2404 * 86400e6)  # 1995-01-01 -> 2001-08-01
    pq.write_table(pa.table({
        "o_orderkey": k,
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": pa.array(list(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)])),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_array(
            (rng.integers(0, span_us // 86_400_000_000, n_ord) * 86_400_000_000),
            "1995-01-01"),
        "o_orderpriority": pa.array(list(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)])),
    }), f"{out}/orders.parquet")

    # lineitem: orderkey uniform over orders (multinomial lines/order),
    # quantity 1..50 integral double, discount/tax decimal lattices,
    # flags independent uniform
    k = np.arange(n_li, dtype=np.int64)
    span_us = int(2499 * 86400e6)  # 1995-01-02 -> 2001-11-04
    pq.write_table(pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(list(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)])),
        "l_linestatus": pa.array(list(np.array(["O", "F"])[rng.integers(0, 2, n_li)])),
        "l_shipdate": _ts_array(
            (rng.integers(0, span_us // 86_400_000_000, n_li) * 86_400_000_000),
            "1995-01-02"),
    }), f"{out}/lineitem.parquet")

    # events: ts sorted ascending over 30 days, value ~ Exp(mean 50) 2dp,
    # users scale with sf (1500 @ sf0.1), props {"k": 0..99}
    k = np.arange(n_ev, dtype=np.int64)
    n_users = max(1, int(15_000 * sf))
    ts_us = np.sort(rng.integers(0, int(30 * 86400e6), n_ev))
    pq.write_table(pa.table({
        "event_id": k,
        "ts": _ts_array(ts_us, "2024-01-01"),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": pa.array(list(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)])),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array([f'{{"k": {v}}}' for v in rng.integers(0, 100, n_ev)]),
    }), f"{out}/events.parquet")

    # documents: 10..100 tokens from the 31-word vocab; ~0.2% of docs
    # are exact duplicates of an earlier doc (measured 8/5000 at sf0.1)
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.002:
            texts.append(texts[int(rng.integers(0, i))])
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    pq.write_table(pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": pa.array(texts),
        "lang": pa.array(list(np.array(LANGS)[
            rng.choice(5, n_doc, p=np.array(LANG_W) / sum(LANG_W))])),
        "source": pa.array([f"src{int(s)}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }), f"{out}/documents.parquet")

    # embeddings: 64-dim unit-norm float32, 10 Gaussian clusters
    # (label = cluster), same shape the sf0.1 corpus shows
    dim, n_lab = 64, 10
    cents = rng.normal(size=(n_lab, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    lab = rng.integers(0, n_lab, n_emb)
    pts = cents[lab] + rng.normal(scale=0.35, size=(n_emb, dim))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pq.write_table(pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(pts.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": lab.astype(np.int32),
    }), f"{out}/embeddings.parquet")
    print(f"wrote {out}: lineitem={n_li} orders={n_ord} events={n_ev} "
          f"docs={n_doc} emb={n_emb}")


if __name__ == "__main__":
    out_dir = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    generate(out_dir, sf)
