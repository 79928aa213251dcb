"""Unit tests for tools/scale_fixture.py -- the tiled scale-replay generator.

The --perturb-docs knob (VERDICT r9 item 2) must make documents.text
replica-local WITHOUT changing within-replica structure: at plain K=300
tiling every shared shingle crosses max_df and d2/d12 agree with the oracle
on 0 rows -- green, but the pair path never executes at the fourth decade.
The knob's contract: replica 0 byte-identical (the real fixture embeds),
token counts preserved, token maps injective per replica (near-dup
structure reproduced exactly, so the pair result is K translated copies of
the base result -- verified end-to-end: d2 at a K=3 perturbed tiling is
exactly 3x the base pair count, hash-exact vs the oracle), and no token
shared across replicas (shingle df stays at base levels, under the cap).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from tools.scale_fixture import scale_dir

SRC = "/root/testdata/sf0.001"


def test_perturb_docs_invariants(tmp_path):
    dst = str(tmp_path / "sfp")
    scale_dir(SRC, dst, 3, perturb_docs=True)
    a = pq.read_table(os.path.join(SRC, "documents.parquet"))
    b = pq.read_table(os.path.join(dst, "documents.parquet"))
    n = a.num_rows
    assert b.num_rows == 3 * n
    # replica 0 byte-identical: the real fixture embeds in the scaled one
    assert b.slice(0, n).equals(a)
    base_texts = a["text"].to_pylist()
    for r in (1, 2):
        rep = b.slice(r * n, n)
        texts = rep["text"].to_pylist()
        chars = rep["n_chars"].to_pylist()
        for orig, t, c in zip(base_texts, texts, chars):
            toks = t.split()
            # injective per-replica token map: same token count, every token
            # suffixed, and stripping the suffix recovers the original
            assert len(toks) == len(orig.split())
            assert all(tok.endswith(f"_r{r}") for tok in toks)
            assert [tok[: -len(f"_r{r}")] for tok in toks] == orig.split()
            # stored n_chars stays = len(text)
            assert c == len(t)
    # no token shared across replicas (shingle df stays at base levels)
    t1 = set(b.slice(n, n)["text"].to_pylist()[0].split())
    t2 = set(b.slice(2 * n, n)["text"].to_pylist()[0].split())
    assert not (t1 & t2)


def test_perturb_docs_leaves_other_tables_as_plain_tiling(tmp_path):
    dst_p = str(tmp_path / "p")
    dst_0 = str(tmp_path / "plain")
    scale_dir(SRC, dst_p, 2, perturb_docs=True)
    scale_dir(SRC, dst_0, 2, perturb_docs=False)
    for t in ("lineitem", "orders", "embeddings", "events"):
        assert pq.read_table(os.path.join(dst_p, f"{t}.parquet")).equals(
            pq.read_table(os.path.join(dst_0, f"{t}.parquet"))
        )


def test_plain_tiling_replica0_embeds(tmp_path):
    dst = str(tmp_path / "plain")
    rows = scale_dir(SRC, dst, 2)
    a = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    b = pq.read_table(os.path.join(dst, "lineitem.parquet"))
    assert rows["lineitem"] == 2 * a.num_rows
    assert b.slice(0, a.num_rows).equals(a)
