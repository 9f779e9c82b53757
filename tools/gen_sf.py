#!/usr/bin/env python3
"""Generate synthetic testdata at an arbitrary scale factor, matching the
distributions of the driver-generated tables in /root/testdata/sf* (schemas,
row-count scaling, value ranges, duplicate structure) as reverse-engineered
from the sf0.001/0.01/0.1 parquet files. Used for the round-12 scaling-curve
measurement (sf1 = 10x the bench scale). Deterministic: seed 42.

Usage: python3 tools/gen_sf.py <sf> <outdir>
"""
import sys, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sf = float(sys.argv[1])
out = sys.argv[2]
os.makedirs(out, exist_ok=True)
rng = np.random.default_rng(42)

DAY_US = 86_400_000_000


def write(name, cols):
    t = pa.table(cols)
    pq.write_table(t, os.path.join(out, name + ".parquet"))
    print(name, t.num_rows, flush=True)


def ts_us(base_days, day_offsets):
    """timestamp[us] column at midnight of base + offset days."""
    us = (np.asarray(base_days, dtype=np.int64) + np.asarray(day_offsets, dtype=np.int64)) * DAY_US
    return pa.Array.from_pandas(us).cast(pa.timestamp("us"))


EPOCH_1995 = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
EPOCH_2024 = (np.datetime64("2024-01-01") - np.datetime64("1970-01-01")).astype(int)

# region / nation -------------------------------------------------------------
write("region", {
    "r_regionkey": pa.array(np.arange(5), pa.int32()),
    "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
})
write("nation", {
    "n_nationkey": pa.array(np.arange(25), pa.int32()),
    "n_name": ["NATION_%d" % i for i in range(25)],
    "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
})

# supplier --------------------------------------------------------------------
nsupp = int(10_000 * sf)
write("supplier", {
    "s_suppkey": pa.array(np.arange(nsupp), pa.int64()),
    "s_name": ["Supplier#%09d" % i for i in range(nsupp)],
    "s_nationkey": pa.array(rng.integers(0, 25, nsupp), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-1000, 10000, nsupp), 2),
})

# customer --------------------------------------------------------------------
ncust = int(150_000 * sf)
SEGS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
write("customer", {
    "c_custkey": pa.array(np.arange(ncust), pa.int64()),
    "c_name": ["Customer#%09d" % i for i in range(ncust)],
    "c_nationkey": pa.array(rng.integers(0, 25, ncust), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-1000, 10000, ncust), 2),
    "c_mktsegment": SEGS[rng.integers(0, 5, ncust)],
})

# part ------------------------------------------------------------------------
npart = int(200_000 * sf)
ADJ = np.array(["blue", "cold", "hot", "large", "new", "old", "red", "small"])
NOUN = np.array(["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"])
PTYPES = np.array(["ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD", "PROMO"])
pk = np.arange(npart)
write("part", {
    "p_partkey": pa.array(pk, pa.int64()),
    "p_name": np.char.add(np.char.add(ADJ[rng.integers(0, 8, npart)], " "), NOUN[rng.integers(0, 8, npart)]),
    "p_brand": np.char.add("Brand#", rng.integers(1, 26, npart).astype(str)),
    "p_type": PTYPES[rng.integers(0, 6, npart)],
    "p_size": pa.array(rng.integers(1, 51, npart), pa.int32()),
    "p_retailprice": 900.0 + (pk % 1000) / 10.0,
})

# orders ----------------------------------------------------------------------
nord = int(1_500_000 * sf)
PRIO = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
STAT = np.array(["F", "O", "P"])
write("orders", {
    "o_orderkey": pa.array(np.arange(nord), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, ncust, nord), pa.int64()),
    "o_orderstatus": STAT[rng.integers(0, 3, nord)],
    "o_totalprice": np.round(rng.uniform(1000, 500000, nord), 2),
    "o_orderdate": ts_us(EPOCH_1995, rng.integers(0, 2405, nord)),
    "o_orderpriority": PRIO[rng.integers(0, 5, nord)],
})

# lineitem --------------------------------------------------------------------
nli = int(6_000_000 * sf)
write("lineitem", {
    "l_orderkey": pa.array(rng.integers(0, nord, nli), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, npart, nli), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, nsupp, nli), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, nli), pa.int32()),
    "l_quantity": rng.integers(1, 51, nli).astype(np.float64),
    "l_extendedprice": np.round(rng.uniform(900, 105000, nli), 2),
    "l_discount": rng.integers(0, 11, nli) / 100.0,
    "l_tax": rng.integers(0, 9, nli) / 100.0,
    "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, nli)],
    "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, nli)],
    "l_shipdate": ts_us(EPOCH_1995, rng.integers(1, 2500, nli)),
})

# events ----------------------------------------------------------------------
nev = int(1_000_000 * sf)
nusers = int(15_000 * sf)
ETYPES = np.array(["click", "view", "purchase", "signup", "error"])
ev_ts = np.sort(rng.integers(0, 30 * DAY_US, nev))  # sorted uniform over 30 days
write("events", {
    "event_id": pa.array(np.arange(nev), pa.int64()),
    "ts": pa.Array.from_pandas(EPOCH_2024 * DAY_US + ev_ts).cast(pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, nusers, nev), pa.int64()),
    "event_type": ETYPES[rng.integers(0, 5, nev)],
    "value": np.round(np.maximum(rng.exponential(50.0, nev), 0.01), 2),
    "props": np.char.add(np.char.add('{"k": ', rng.integers(0, 100, nev).astype(str)), "}"),
})

# documents -------------------------------------------------------------------
ndoc = max(500, int(50_000 * sf))
VOCAB = np.array(["a", "agg", "batch", "big", "column", "customer", "data", "fast",
                  "filter", "group", "hash", "join", "key", "line", "merge", "order",
                  "part", "query", "row", "scan", "slow", "small", "sort", "spark",
                  "stream", "table", "the", "value", "vector", "window"])
lens = rng.integers(10, 100, ndoc)
texts = [" ".join(VOCAB[rng.integers(0, len(VOCAB), n)]) for n in lens]
# ~4.7% of docs are near-duplicates: another doc's base text + " dup"
dup_mask = rng.random(ndoc) < 0.048
base = list(texts)
for i in np.nonzero(dup_mask)[0]:
    j = int(rng.integers(0, ndoc))
    if j != i:
        texts[i] = base[j] + " dup"
LANGS = np.array(["en", "zh", "es", "fr", "de"])
write("documents", {
    "doc_id": pa.array(np.arange(ndoc), pa.int64()),
    "text": texts,
    "lang": LANGS[rng.choice(5, ndoc, p=[0.42, 0.15, 0.15, 0.145, 0.135])],
    "source": ["src%d" % (i % 20) for i in range(ndoc)],
    "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
})

# embeddings ------------------------------------------------------------------
nemb = max(500, int(20_000 * sf))
v = rng.standard_normal((nemb, 64)).astype(np.float32)
v /= np.linalg.norm(v, axis=1, keepdims=True)
write("embeddings", {
    "vec_id": pa.array(np.arange(nemb), pa.int64()),
    "embedding": pa.array(list(v), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, nemb), pa.int32()),
})
print("done", out)
