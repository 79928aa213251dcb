"""Scale-up fixture generator: tile /root/testdata/sf0.1 K times into a
synthetic ~sf{0.1*K} directory so the oracle contract can be replayed one
decade past the driver's largest fixture (VERDICT r5 item 4 -- every
quantized-sum / cap-mirror invariant had only ever been proven across one
10x jump).

Replication scheme (pure pyarrow -- no Spark session, and parquet types
including the events timestamp pass through untouched):

* ``region``/``nation`` copy unchanged: they are genuine fixed-cardinality
  dimensions (5/25 rows at every official SF), and customer/supplier FK
  into them.
* Every other table is concatenated K times; replica r (0-based) offsets
  every SURROGATE KEY column by r * BASE(domain), where BASE is the next
  power of 10 above the domain's global max (max over ALL columns sharing
  the domain, e.g. orderkey spans o_orderkey and l_orderkey).  Replica 0
  is byte-identical to the original, so the real fixture embeds in the
  scaled one; referential joins (orders->customer, lineitem->part/supp/
  orders) stay consistent within each replica and never collide across
  replicas.
* Non-key payload (dates, prices, text, embeddings, labels) is untouched:
  value distributions, skew shape, and dup structure are preserved, and
  each document/embedding gains K-1 exact clones -- which deliberately
  STRESSES the dedup caps (posting lists and LSH buckets grow Kx, so the
  max_bucket/max_cell degenerate-group rules and their oracle mirrors are
  exercised, not bypassed).

Determinism: no randomness at all -- output is a pure function of the
input directory and K, so Spark and the DuckDB oracle replay identical
bytes and the verify gate stays hash-exact.

``--perturb-docs`` (VERDICT r9 item 2) makes documents.text REPLICA-LOCAL:
every whitespace-token in replica r >= 1 gets a deterministic ``_r{r}``
suffix (replica 0 stays byte-identical), and n_chars is recomputed to stay
= len(text).  The plain tiling gives every doc K-1 exact clones, so at
K=300 every shared shingle's document frequency crosses max_df and
d2/d12's pair stage legitimately agrees on 0 rows with the oracle --
green, but the pair path never executes.  The token suffix is an
INJECTIVE per-replica token map, so each replica reproduces sf0.1's
near-dup structure exactly (token counts, shingle sets, jaccard values
all preserved within a replica; no shingle is shared across replicas):
shingle df stays at sf0.1 levels, under the cap, and the pair stage runs
at K-fold volume -- K translated copies of the base pair set.  Exact-dup
structure (d1-family md5 groups) is destroyed across replicas by design;
use the plain tiling for those.

Usage:
    python tools/scale_fixture.py [--perturb-docs] [SRC_DIR] [DST_DIR] [K]
    # default: /root/testdata/sf0.1 -> /root/repo/fixtures/sf1, K=10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key domain -> [(table, column), ...] sharing that id space
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}
COPY_UNCHANGED = ("region", "nation")
REPLICATED = ("customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")


def _next_pow10(n: int) -> int:
    base = 1
    while base <= n:
        base *= 10
    return base


def _perturb_doc_columns(tab: pa.Table, cols: list, r: int) -> list:
    """Replica-local token identities for documents replica ``r``: suffix
    every \\S+ token with ``_r{r}`` (injective token map -- within-replica
    dup/near-dup structure is preserved exactly) and recompute n_chars so
    the stored length stays consistent with the rewritten text.  Column
    list is positional-aligned with tab.column_names."""
    out = list(cols)
    ti = tab.column_names.index("text")
    out[ti] = pc.replace_substring_regex(out[ti], pattern=r"(\S+)", replacement=rf"\1_r{r}")
    if "n_chars" in tab.column_names:
        out[tab.column_names.index("n_chars")] = pc.cast(pc.utf8_length(out[ti]), pa.int64())
    return out


def scale_dir(src: str, dst: str, k: int, perturb_docs: bool = False) -> dict[str, int]:
    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in COPY_UNCHANGED + REPLICATED}

    # one BASE per domain, from the global max over every column in it
    base: dict[tuple[str, str], int] = {}
    for domain, cols in KEY_DOMAINS.items():
        dom_max = max(pc.max(tables[t][c]).as_py() or 0 for t, c in cols)
        b = _next_pow10(int(dom_max))
        for t, c in cols:
            base[(t, c)] = b

    rows: dict[str, int] = {}
    for t in COPY_UNCHANGED:
        pq.write_table(tables[t], os.path.join(dst, f"{t}.parquet"))
        rows[t] = tables[t].num_rows
    for t in REPLICATED:
        tab = tables[t]
        key_cols = {c: b for (tt, c), b in base.items() if tt == t}
        replicas = [tab]
        for r in range(1, k):
            cols = []
            for name in tab.column_names:
                col = tab[name]
                if name in key_cols:
                    col = pc.add(col, pa.scalar(r * key_cols[name], type=pa.int64()))
                cols.append(col)
            if perturb_docs and t == "documents":
                cols = _perturb_doc_columns(tab, cols, r)
            replicas.append(pa.table(cols, schema=tab.schema))
        out = pa.concat_tables(replicas)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"), row_group_size=256 * 1024)
        rows[t] = out.num_rows
    return rows


def main() -> None:
    argv = sys.argv[1:]
    perturb = False
    if argv and argv[0] == "--perturb-docs":
        perturb = True
        argv = argv[1:]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    dst = argv[1] if len(argv) > 1 else "/root/repo/fixtures/sf1"
    k = int(argv[2]) if len(argv) > 2 else 10
    rows = scale_dir(src, dst, k, perturb_docs=perturb)
    for t, n in sorted(rows.items()):
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
