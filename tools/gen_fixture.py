"""Seed-swept / perturbed fixture generator for distribution-robustness replays.

Every committed correctness artifact derives from ONE synthetic generator
family (seed 42, /root/testdata).  Data-calibrated constants (d5's cosine
threshold, c15's tier edges, em5/em6 bucket edges) and every quantization
recipe have therefore only ever been proven on that distribution.  This tool
regenerates the full 10-table schema at sf0.01 scale from a FRESH seed with
optional perturbation profiles, so `tools/verify_local.py` can replay the
entire contract (Spark vs DuckDB on the SAME new files) off-distribution:

    python tools/gen_fixture.py fixtures/seed101 101 base
    python tools/gen_fixture.py fixtures/seed202 202 heavydup
    python tools/gen_fixture.py fixtures/seed303 303 skew
    python tools/verify_local.py --json CORRECTNESS_seeds_r07.json fixtures/seed101

Profiles:
  base     -- same marginals as the driver's generator, new seed.
  heavydup -- 2x longer documents, 10% exact-dup + 25% near-dup docs,
              15% jittered near-dup embeddings (cos ~0.9): stresses every
              dedup cap (shingle counts, band buckets, span windows).
  skew     -- Zipf-hot customers/parts/users (one key takes ~10% of the
              fact side): stresses AQE skew handling, salting, and every
              groupBy whose reducer could see a hot key.

Schemas mirror /root/testdata exactly (arrow types included: int32 nation
keys, timestamp[us], list<float> embeddings) so io.py and the oracle views
read both interchangeably.  The point of the replay is ENGINE-VS-ORACLE
agreement on new data, not matching seed 42's values: a query may legally
return different rows here -- it must still hash-match its own oracle.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["small", "red", "blue", "green", "large", "shiny", "matte", "heavy"]
PNOUN = ["ring", "widget", "bolt", "gear", "cog", "plate", "tube", "wire"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_W = [0.44, 0.15, 0.15, 0.14, 0.12]
VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "a", "merge", "batch", "spark", "order", "data", "column",
    "join", "small", "line", "customer", "query", "big", "the", "sort",
    "window", "group", "stream", "filter", "grid", "span",
]

DAY_US = 86_400_000_000


def _ts_us(days_from_1995: np.ndarray) -> pa.Array:
    base = np.datetime64("1995-01-01T00:00:00", "us").astype("int64")
    return pa.array((base + days_from_1995.astype("int64") * DAY_US), type=pa.timestamp("us"))


def _zipf_keys(rng: np.random.Generator, n_draws: int, n_keys: int, hot: bool) -> np.ndarray:
    if not hot:
        return rng.integers(0, n_keys, n_draws)
    # one hot key takes ~10%; the rest follow a steep rank decay
    ranks = np.arange(1, n_keys + 1, dtype="float64")
    w = 1.0 / ranks**1.2
    w[0] *= 0.1 * w.sum() / w[0]  # pin key 0 at ~10% mass
    w /= w.sum()
    return rng.choice(n_keys, size=n_draws, p=w)


def generate(out_dir: str, seed: int, profile: str = "base") -> None:
    assert profile in ("base", "heavydup", "skew"), profile
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    skew = profile == "skew"
    heavydup = profile == "heavydup"

    n_cust, n_supp, n_part = 1500, 100, 2000
    n_orders, n_li, n_events, n_docs, n_vecs = 15000, 60000, 10000, 500, 500
    n_users, dim, n_labels = 150, 64, 10

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), type=pa.int32()),
        "r_name": REGIONS,
    }))
    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), type=pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], type=pa.int32()),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), type=pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), type=pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)],
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), type=pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), type=pa.int32()),
        "s_acctbal": np.round(rng.uniform(0, 9999.99, n_supp), 2),
    }))
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), type=pa.int64()),
        "p_name": [f"{PADJ[int(a)]} {PNOUN[int(b)]}" for a, b in zip(
            rng.integers(0, len(PADJ), n_part), rng.integers(0, len(PNOUN), n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(0, 25, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), type=pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, n_part), 2),
    }))

    odays = rng.integers(0, 2400, n_orders)  # 1995-01-01 .. 2001-07-x
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_orders), type=pa.int64()),
        "o_custkey": pa.array(_zipf_keys(rng, n_orders, n_cust, skew), type=pa.int64()),
        "o_orderstatus": [STATUSES[i] for i in rng.integers(0, 3, n_orders)],
        "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, n_orders), 2),
        "o_orderdate": _ts_us(odays),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, n_orders)],
    }))

    # ~Poisson(4) lines per order, spread over all orders
    lok = np.sort(rng.integers(0, n_orders, n_li))
    lnum = np.ones(n_li, dtype="int64")
    same = np.concatenate(([False], lok[1:] == lok[:-1]))
    for i in range(1, n_li):  # running line number within each order
        if same[i]:
            lnum[i] = lnum[i - 1] + 1
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lok, type=pa.int64()),
        "l_partkey": pa.array(_zipf_keys(rng, n_li, n_part, skew), type=pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), type=pa.int64()),
        "l_linenumber": pa.array(lnum, type=pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.0, 105000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [("F", "O")[i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_us(rng.integers(1, 2500, n_li)),
    }))

    # events: 30 days of 2024-01, ~Poisson per user; skew = hot user + bursts
    ebase = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * DAY_US
    ets = np.sort(rng.integers(0, span_us, n_events)) + ebase
    if skew:
        burst = rng.random(n_events) < 0.2  # 20% of events land in one hour
        ets[burst] = ebase + 5 * DAY_US + rng.integers(0, 3_600_000_000, int(burst.sum()))
        ets = np.sort(ets)
    write("events", pa.table({
        "event_id": pa.array(range(n_events), type=pa.int64()),
        "ts": pa.array(ets, type=pa.timestamp("us")),
        "user_id": pa.array(_zipf_keys(rng, n_events, n_users, skew), type=pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n_events)],
        "value": np.round(rng.uniform(0.01, 500.0, n_events), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)],
    }))

    # documents: word salad over the 31-token vocab; heavydup injects
    # exact and near duplicates plus 2x length
    len_lo, len_hi = (20, 220) if heavydup else (10, 110)
    texts: list[str] = []
    for i in range(n_docs):
        if heavydup and i >= 50 and rng.random() < 0.10:
            texts.append(texts[int(rng.integers(0, i))])  # exact dup
            continue
        if heavydup and i >= 50 and rng.random() < 0.25:
            words = texts[int(rng.integers(0, i))].split(" ")
            idx = rng.random(len(words)) < 0.10  # perturb 10% of tokens
            for j in np.flatnonzero(idx):
                words[j] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(words))
            continue
        n_words = int(rng.integers(len_lo, len_hi))
        texts.append(" ".join(VOCAB[int(w)] for w in rng.integers(0, len(VOCAB), n_words)))
    write("documents", pa.table({
        "doc_id": pa.array(range(n_docs), type=pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(len(LANGS), n_docs, p=LANG_W)],
        "source": [f"src{int(i)}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    # embeddings: unit vectors with a mild label-direction bias (matches the
    # reference fixture's ~0.15 own-centroid cosine); heavydup adds jittered
    # near-copies at cos ~0.9 to feed d5/d9/d10
    mus = rng.normal(size=(n_labels, dim))
    mus /= np.linalg.norm(mus, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, n_vecs)
    vecs = rng.normal(size=(n_vecs, dim)) + 1.2 * mus[labels]
    if heavydup:
        for i in range(75, n_vecs, 7):  # ~15% near-dups of an earlier vector
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + 0.35 * rng.normal(size=dim)
            labels[i] = labels[j]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_vecs), type=pa.int64()),
        "embedding": pa.array([v.astype("float32") for v in vecs], type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32()),
    }))
    print(f"wrote 10 tables to {out_dir} (seed={seed}, profile={profile})")


if __name__ == "__main__":
    out = sys.argv[1]
    seed = int(sys.argv[2])
    profile = sys.argv[3] if len(sys.argv) > 3 else "base"
    generate(out, seed, profile)
