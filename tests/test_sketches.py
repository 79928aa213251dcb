"""Misra-Gries heavy-hitter sketch guarantees (partitioning-independent)."""

from __future__ import annotations


def _freqs(rows):
    out = {}
    for (v,) in rows:
        out[v] = out.get(v, 0) + 1
    return out


def test_mg_guarantees_on_skewed_stream(spark):
    from youtubeanalyzerproject_big_data__spark.operators.sketches import misra_gries_candidates

    # zipf-ish: one dominant key, a mid key, and a long tail of singletons
    rows = [("hot",)] * 400 + [("warm",)] * 120 + [(f"tail{i}",) for i in range(480)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    k = 16
    n = len(rows)
    exact = _freqs(rows)
    est = {r["k"]: r["est"] for r in misra_gries_candidates(df, "k", k=k).collect()}
    # completeness: every key above N/k present
    for key, c in exact.items():
        if c > n / k:
            assert key in est, f"heavy key {key} missing"
    for key, e in est.items():
        assert e <= exact[key], "overestimate"
        assert exact[key] - e <= n / k, "underestimate beyond bound"


def test_mg_gate_row_all_green(spark):
    from youtubeanalyzerproject_big_data__spark.operators.sketches import heavy_hitters_gate

    rows = [(f"k{i % 4}",) for i in range(1000)] + [(f"rare{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string").repartition(5)
    r = heavy_hitters_gate(df, "k", k=32).collect()[0]
    assert r["n_heavy"] == 4 and r["n_heavy_found"] == 4
    assert r["all_heavy_found"] == 1 and r["no_overestimate"] == 1 and r["underestimate_ok"] == 1
