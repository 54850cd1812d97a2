"""Scale-factor fixture generator for the empirical scale-validation sweep.

Reproduces the driver testdata recipe (TESTDATA.md) at arbitrary scale
factors so the oracle-parity gate and bench can run at sf1 (~6M-row
lineitem, 10x the documents/embeddings corpora) without touching the
read-only /root/testdata. The recipe was reverse-measured from the
sf0.01/sf0.1 fixtures (distributions, key ranges, categorical vocab,
planted-duplicate rates); it is NOT byte-identical to the driver's
seed-42 stream and does not need to be — every gate query and oracle
derives its expectations from the live data it reads, so any
schema-conformant, distribution-faithful corpus exercises the same code
paths. Row counts scale linearly with sf exactly as the driver's do
(sf0.01 -> sf0.1 observed 10x on every table except the fixed dims).

Usage:
    python tools/gen_sf.py --sf 1 --out /root/repo/.scale/sf1

Layout matches the driver: one parquet file per table, pyarrow defaults
(so a 6M-row lineitem lands in ~6 row groups of 1Mi rows, which is what
a single driver-written file would contain at sf1 and what gives the
local[32] scan its intra-file split points).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# Base row counts at sf=1 (10x the observed sf0.1 fixture counts).
BASE = {
    "supplier": 10_000,
    "customer": 150_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "users": 15_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJECTIVES = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
# 30 common tokens, uniform; 'dup' is injected as a rare 31st marker token.
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000  # microseconds per day


def _ts_col(days_since_epoch: np.ndarray) -> pa.Array:
    return pa.array(days_since_epoch.astype("int64") * DAY_US, pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def gen(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = {k: max(1, int(round(v * sf))) for k, v in BASE.items()}

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    ns = n["supplier"]
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(ns), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": pa.array(rng.integers(0, 25, ns), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
    }))

    nc = n["customer"]
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(nc), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": pa.array(rng.integers(0, 25, nc), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": np.array(MKTSEGMENTS)[rng.integers(0, 5, nc)],
    }))

    npart = n["part"]
    adj = np.array(ADJECTIVES)[rng.integers(0, len(ADJECTIVES), npart)]
    noun = np.array(NOUNS)[rng.integers(0, len(NOUNS), npart)]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(npart), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, npart)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), npart)],
        "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, npart), 2),
    }))

    no = n["orders"]
    # o_orderdate: date-granular 1995-01-01 .. 2001-08-01 (epoch days 9131..11535)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(no), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, nc, no), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.integers(0, 3, no)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": _ts_col(rng.integers(9131, 11536, no)),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, no)],
    }))

    nl = n["lineitem"]
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, no, nl), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart, nl), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, ns, nl), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, nl), pa.int32()),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105000, nl), 2),
        "l_discount": rng.integers(0, 11, nl) / 100.0,
        "l_tax": rng.integers(0, 9, nl) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, nl)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, nl)],
        # date-granular 1995-01-02 .. 2001-11-04
        "l_shipdate": _ts_col(rng.integers(9132, 11631, nl)),
    }))

    ne = n["events"]
    # ts strictly increasing with event_id (observed), uniform over Jan 2024.
    start = np.datetime64("2024-01-01", "us").astype("int64")
    span = 30 * DAY_US
    ts = np.sort(start + rng.integers(0, span, ne))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(ne), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n["users"], ne), pa.int64()),
        "event_type": np.array(["click", "error", "purchase", "signup", "view"])[
            rng.integers(0, 5, ne)
        ],
        "value": np.round(np.minimum(rng.exponential(50.0, ne), 999.99), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, ne)],
    }))

    nd = n["documents"]
    lens = rng.integers(10, 101, nd)
    flat = np.array(VOCAB)[rng.integers(0, len(VOCAB), int(lens.sum()))]
    offs = np.concatenate([[0], np.cumsum(lens)])
    docs = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(nd)]
    # rare marker token 'dup' in ~5% of docs (observed 250/5000 at sf0.1)
    for i in np.nonzero(rng.random(nd) < 0.05)[0]:
        toks = docs[i].split(" ")
        toks[rng.integers(0, len(toks))] = "dup"
        docs[i] = " ".join(toks)
    # planted duplicates: ~1/600 exact copies + ~1/600 near copies (1-2
    # token mutations), matching the sf0.1 fixture's 8 exact + ~5 near
    # pairs per 5000 docs. Linear in corpus size by construction.
    n_special = max(2, nd // 600)
    pool = rng.choice(nd, 2 * 2 * n_special, replace=False)
    for j in range(n_special):  # exact
        docs[pool[2 * j + 1]] = docs[pool[2 * j]]
    for j in range(n_special):  # near
        src, dst = pool[2 * n_special + 2 * j], pool[2 * n_special + 2 * j + 1]
        toks = docs[src].split(" ")
        for _ in range(int(rng.integers(1, 3))):
            toks[rng.integers(0, len(toks))] = VOCAB[rng.integers(0, len(VOCAB))]
        docs[dst] = " ".join(toks)
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(nd), pa.int64()),
        "text": docs,
        "lang": np.array(LANGS)[rng.choice(len(LANGS), nd, p=LANG_P)],
        "source": [f"src{s}" for s in rng.integers(0, 20, nd)],
        "n_chars": pa.array([len(t) for t in docs], pa.int64()),
    }))

    nv = n["embeddings"]
    vecs = rng.standard_normal((nv, 64)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(nv), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, nv), pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    gen(a.sf, a.out, a.seed)
