"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "n": runs, "spread": {q: [min, max]}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-driver of the
bounded result), $SPARK_GRAFT_BENCH_N times (default 3); ``queries`` holds
per-query MEDIANS and ``value`` their sum -- this box swings +/-10-20% run
to run (CLAUDE.md), so single-run numbers are noise, and ``spread`` records
the min/max so a regression can be told from a swing.  A warmup query first
absorbs JVM/session startup so the numbers reflect engine throughput, not
cold-start.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from youtubeanalyzerproject_big_data__spark.session import get_spark

# Headline set: the heavy/representative queries (joins, multi-agg, window,
# graph/PageRank, dedup families, ANN, ALS) — not the trivial filters.
BENCH_QUERIES = [
    "tpch_q1_pricing_summary",
    "q3_revenue_by_customer",
    "q5_revenue_by_nation",
    "a5_order_size_distribution",
    "a7_order_parts_csv",
    "w1_top3_orders_per_priority",
    "w2_user_running_value",
    "e1_events_hourly",
    "e2_sessionize",
    "e3_asof_attribution",
    "g2_part_indegree_top20",
    "d2_ngram_jaccard_pairs",
    "d3_minhash_lsh_pairs",
    "d5_embedding_near_dups",
    "d7_dup_clusters",
    "e5_interval_join_reactions",
    "c1_corpus_curation",
    "km1_kmeans_centroids",
    "s1_ann_bruteforce_top5",
    "s4_ann_pq_top5",
    "s5_ann_ivfpq_top5",
    "g4_pagerank_top100",
    "m1_als_recommendations",
    "t8_unigram_logprob",
    "c3_decontamination",
    "c4_doc_chunks",
    "c5_sequence_packing",
    "w4_rolling_user_value",
    "g6_triangle_census",
    "u1_cdc_merge",
    "f11_funnel_counts",
    "a14_heavy_hitters_gate",
    "g7_personalized_pagerank",
    "s6_ann_refined_top5",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warmup: a trivial count absorbs session/JVM startup, and one tiny
    # Arrow UDF over every core pre-spawns the Python workers -- otherwise
    # the first Arrow-heavy query (d2) pays ~8s of worker spin-up in its
    # first sample.
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.functions._arrow_udfs import make_word_ngrams

    qs["a9_distinct_customers"](spark, sf_dir).collect()
    spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
        make_word_ngrams(2)(F.lit("warm up workers")).alias("g")
    ).count()

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_N", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        samples = []
        for _ in range(n_runs):
            # No clearCache needed: every operator that caches an
            # intermediate (shingles, edges, ratings) releases it before
            # returning (pin-result-then-unpersist pattern), so runs are
            # isolated by construction.
            t0 = time.time()
            rows = qs[name](spark, sf_dir).collect()
            samples.append(time.time() - t0)
            assert rows is not None
        timings[name] = round(statistics.median(samples), 3)
        spread[name] = [round(min(samples), 3), round(max(samples), 3)]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n": n_runs,
                "spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
