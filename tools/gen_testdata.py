#!/usr/bin/env python3
"""Seed-parameterized regeneration of the driver's synthetic star schema
(TESTDATA.md): same schemas, same value domains, same referential
integrity, DIFFERENT pseudo-random stream. Two uses:

  1. Second-seed oracle sweep (r11 verdict #1): re-run graft.Verify +
     the DuckDB oracle on a seed != 42 fixture to falsify any oracle
     that accidentally overfits seed-42 quirks (ties, cap boundaries,
     band-edge rounding).
  2. Scale ramp (r11 verdict #2): generate sf > 0.1 (the driver ships
     only 0.001/0.01/0.1) to measure per-query scaling ratios.

The distributions mirror the observed driver fixture (domains, ranges,
row-count scaling, planted document near-dups, unit-norm embeddings);
exact distributional identity is NOT required — Spark and DuckDB read
the same parquet, so the oracle comparison is self-contained. What
matters is staying in-domain for the catalog's literal predicates
(mktsegment/p_type/event_type/srcN values, date ranges).

Usage: gen_testdata.py --sf 0.01 --seed 43 --out DIR
Tool-side only (pyarrow/numpy) — not part of the Scala library.
"""
import argparse
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]

DAY_US = 86_400_000_000  # microseconds per day


def ts_us(arr_us, epoch="1970-01-01"):
    return pa.array(np.asarray(arr_us, dtype="int64"), pa.timestamp("us"))


def write(out, name, cols):
    pq.write_table(pa.table(cols), f"{out}/{name}.parquet")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    rng = np.random.default_rng(a.seed)
    sf = a.sf
    import os
    os.makedirs(a.out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    write(a.out, "region", {
        "r_regionkey": pa.array(np.arange(5, dtype="int32")),
        "r_name": REGIONS})

    write(a.out, "nation", {
        "n_nationkey": pa.array(np.arange(25, dtype="int32")),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(np.arange(25, dtype="int32") % 5)})

    write(a.out, "customer", {
        "c_custkey": np.arange(n_cust, dtype="int64"),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype("int32")),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]})

    write(a.out, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype="int64"),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype("int32")),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)})

    write(a.out, "part", {
        "p_partkey": np.arange(n_part, dtype="int64"),
        "p_name": [f"{ADJ[i]} {NOUN[j]}" for i, j in zip(
            rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part).astype("int32")),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) / 10.0, 2)})

    base = np.datetime64("1995-01-01", "us").astype("int64")
    span_days = 2404  # 1995-01-01 .. 2001-08-01 inclusive-ish
    odate = base + rng.integers(0, span_days, n_ord) * DAY_US
    o_custkey = rng.integers(0, n_cust, n_ord).astype("int64")
    write(a.out, "orders", {
        "o_orderkey": np.arange(n_ord, dtype="int64"),
        "o_custkey": o_custkey,
        "o_orderstatus": [("F", "O", "P")[i] for i in rng.choice(
            3, n_ord, p=[0.48, 0.48, 0.04])],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_us(odate),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_ord)]})

    nline = np.clip(rng.poisson(3.0, n_ord) + 1, 1, 13)
    l_orderkey = np.repeat(np.arange(n_ord, dtype="int64"), nline)
    n_li = l_orderkey.size
    l_linenumber = (np.arange(n_li) -
                    np.repeat(np.cumsum(nline) - nline, nline) + 1)
    qty = rng.integers(1, 51, n_li).astype("float64")
    unit = rng.uniform(900, 2100, n_li)
    shipdate = np.repeat(odate, nline) + rng.integers(1, 96, n_li) * DAY_US
    write(a.out, "lineitem", {
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(0, n_part, n_li).astype("int64"),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype("int64"),
        "l_linenumber": pa.array(l_linenumber.astype("int32")),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": np.round(rng.uniform(0, 0.10, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": [("A", "N", "R")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("F", "O")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": ts_us(shipdate)})

    ev_base = np.datetime64("2024-01-01", "us").astype("int64")
    gaps = rng.exponential(30 * DAY_US / max(1, n_ev), n_ev)
    ets = ev_base + np.cumsum(gaps).astype("int64")
    n_users = max(1, int(15_000 * sf))
    write(a.out, "events", {
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": ts_us(ets),
        "user_id": rng.integers(0, n_users, n_ev).astype("int64"),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(np.clip(rng.exponential(50, n_ev), 0.01, 500), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]})

    # documents: Zipf-ish token draw over the 31-word vocab; ~15% of docs
    # are near-dups of an earlier doc (1-3 token substitutions — the
    # observed 0.98-0.99 3-shingle-Jaccard planted pairs)
    w = 1.0 / np.arange(1, len(VOCAB) + 1) ** 0.7
    w /= w.sum()
    docs = []
    for i in range(n_doc):
        if i > 10 and rng.random() < 0.15:
            src = docs[rng.integers(0, i)].copy()
            for _ in range(rng.integers(1, 4)):
                src[rng.integers(0, len(src))] = VOCAB[
                    rng.choice(len(VOCAB), p=w)]
            docs.append(src)
        else:
            n_tok = rng.integers(10, 101)
            docs.append(list(np.array(VOCAB)[
                rng.choice(len(VOCAB), n_tok, p=w)]))
    texts = [" ".join(d) for d in docs]
    write(a.out, "documents", {
        "doc_id": np.arange(n_doc, dtype="int64"),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(
            5, n_doc, p=[0.45, 0.14, 0.14, 0.14, 0.13])],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64")})

    emb = rng.standard_normal((n_emb, 64)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(a.out, "embeddings", {
        "vec_id": np.arange(n_emb, dtype="int64"),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb).astype("int32"))})

    print(f"wrote sf={sf} seed={a.seed} -> {a.out}")


if __name__ == "__main__":
    main()
