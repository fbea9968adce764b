"""Generate scale-test parquet tables matching /root/testdata's schemas.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). Every
performance number through round 4 was measured at sf0.1; this generator
exists to test the 10x (sf1) point EMPIRICALLY — same ten tables, same
schemas, same value distributions (measured from sf0.1: vocab, value
ranges, category sets, duplicate density), deterministic seed, 10x rows.
It does NOT reproduce the driver's exact rows (that generator is the
driver's); it reproduces the workload SHAPE, which is what scaling curves
depend on: join fan-outs (~4 lineitems/order), key cardinalities, the
31-word document vocabulary (the worst case for shingle-collision density
— dup-candidate growth is the #1 super-linear risk being probed), exact-dup
rate (~0.16%), unit-norm 10-cluster embeddings, 30-day event span with
constant per-user rate.

Usage:  python tools/gen_scale_data.py --sf 1 --out .scale_data/sf1
Writes <table>.parquet for: region nation customer supplier part orders
lineitem events documents embeddings.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
RETURNFLAGS = ["N", "A", "R"]
LINESTATUSES = ["O", "F"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
# exact driver word sets (measured from sf0.1) — q9/q17-style p_name LIKE
# filters must keep their selectivity or the scaling ratio is meaningless
PNOUNS = ["widget", "gizmo", "ring", "gear", "anvil", "bolt", "plate", "rod"]
PADJS = ["blue", "old", "small", "new", "large", "hot", "cold", "red"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]

DAY_US = 86_400_000_000


def _ts_us(base: str, us: np.ndarray) -> pa.Array:
    b = np.datetime64(base, "us").astype("int64")
    return pa.array((b + us).astype("datetime64[us]"))


def gen(sf: float, out: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = int(15_000 * sf)

    def w(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {table.num_rows} rows")

    w("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    w("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    w("customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    w("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    w("part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": [
            f"{PADJS[int(a)]} {PNOUNS[int(b)]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) * 0.1, 2),
    }))
    odate_us = (rng.integers(0, 2404, n_ord) * DAY_US).astype(np.int64)  # 1995..2001
    w("orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(STATUSES)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(900, 450_000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01T00:00:00", odate_us),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))
    li_ord = rng.integers(0, n_ord, n_li).astype(np.int64)
    ship_us = odate_us[li_ord] + (rng.integers(1, 121, n_li) * DAY_US).astype(np.int64)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(li_ord),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li).astype(np.int64)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li).astype(np.int64)),
        "l_linenumber": pa.array((rng.integers(1, 8, n_li)).astype(np.int32)),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUSES)[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us("1995-01-01T00:00:00", ship_us),
    }))
    ev_us = rng.integers(0, 30 * DAY_US, n_ev).astype(np.int64)
    w("events", pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": _ts_us("2024-01-01T00:00:00", ev_us),
        "user_id": pa.array(rng.integers(0, n_user, n_ev).astype(np.int64)),
        "event_type": pa.array(
            np.array(["click", "view", "purchase", "signup", "error"])[rng.integers(0, 5, n_ev)]
        ),
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))
    # documents: 10..100 tokens from the 31-word vocab; ~0.16% exact dups
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), int(ln))]) for ln in lens]
    n_dup = max(1, int(n_doc * 0.0016))
    dup_to = rng.integers(0, n_doc, n_dup)
    dup_from = rng.integers(0, n_doc, n_dup)
    for a, b in zip(dup_to, dup_from):
        texts[int(a)] = texts[int(b)]
    w("documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))
    # embeddings: 10 Gaussian clusters on the 64-dim unit sphere
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(scale=0.35, size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    w("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array([v for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32)),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=".scale_data/sf1")
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    gen(a.sf, a.out, a.seed)
