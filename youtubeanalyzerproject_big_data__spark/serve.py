"""Phase-2 serving facade: the engine-side analog of the reference GUI's
query dispatch and cache serving.

The reference's primary user surface is a menu-dispatched GUI
(Milestone4SourceCode.zip!.../guiV5.py:405-416) that answers statistics
queries from Phase-1 JSON caches (guiV5.py:66-103) and runs point/range
searches live.  This module reproduces that contract engine-side, minus the
presentation:

  * CACHED queries -- each name maps to a Phase-1 precompute job
    (jobs.py); ``serve`` reads the materialized JSON artifact if present
    and otherwise computes + materializes it first (write-through), exactly
    the cache-or-compute flow of guiV5.py:66-78.
  * LIVE queries -- parameterized operator dispatch (point lookup, range
    scan, dynamic search count, top-k), the guiV5.py:80-103 search paths,
    served straight from the operator library.

Scale: serving reads pre-aggregated artifacts (KB-scale JSON) -- the 100 TB
work happened in Phase 1 -- and live queries are predicate-pushed scans, so
a serving tier needs no cluster resources beyond a SparkSession.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youtubeanalyzerproject_big_data__spark import jobs
from youtubeanalyzerproject_big_data__spark.io import read_json_artifact, write_json_artifact
from youtubeanalyzerproject_big_data__spark.operators import filters, topk

# Phase-1 job registry: artifact name -> job over the videos model.
# Names follow the reference's cache collections (run_netagg_job.py,
# run_pagerank_job.py, run_alsrecs_job.py).
CACHED_JOBS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "categorystats": jobs.category_stats_job,
    "sizestats": jobs.size_stats_job,
    "viewstats": jobs.view_histogram_job,
    "globalstats": jobs.global_view_stats_job,
    "degreestat": jobs.degree_stats_job,
}


class QueryService:
    """Cache-or-compute query dispatch over a videos table.

    ``serve(name)`` answers a registered statistics query from its JSON
    artifact, materializing on first use; ``refresh(name)`` forces
    recomputation (the Phase-1 re-run); ``lookup``/``search_range``/
    ``search_count``/``top_k`` are the live query surface.
    """

    def __init__(self, spark: SparkSession, videos: DataFrame, cache_dir: str):
        self.spark = spark
        self.videos = videos
        self.cache_dir = cache_dir

    def _path(self, name: str) -> str:
        return os.path.join(self.cache_dir, name)

    def serve(self, name: str) -> DataFrame:
        """Cache-or-compute (guiV5.py:66-78): artifact hit -> read it;
        miss -> run the Phase-1 job, materialize, then read back (so the
        caller always sees exactly what the cache holds)."""
        if name not in CACHED_JOBS:
            raise KeyError(f"unknown cached query {name!r}; available: {sorted(CACHED_JOBS)}")
        path = self._path(name)
        # A bare os.path.exists(path) would treat a crashed, partially
        # written Phase-1 directory as a permanent cache hit; only a commit
        # marker (_SUCCESS, written last by the Hadoop committer) proves the
        # artifact is complete.  Anything less -> recompute.
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            self.refresh(name)
        return read_json_artifact(self.spark, path)

    def refresh(self, name: str) -> None:
        """Force Phase-1 recomputation of one artifact."""
        write_json_artifact(CACHED_JOBS[name](self.videos), self._path(name))

    # -- live query surface (guiV5.py:80-103 search paths) ----------------

    def lookup(self, video_id: str) -> DataFrame:
        """Point lookup (S6): predicate-pushed scan, no cache."""
        return self.videos.where(F.col("video_id") == video_id)

    def search_range(self, column: str, lo, hi) -> DataFrame:
        """Server-side range scan (S7/F4/F5)."""
        return filters.range_query(self.videos, column, lo, hi)

    def search_count(self, conditions: list[tuple]) -> DataFrame:
        """Dynamic predicate search count (F6)."""
        return filters.dynamic_search_count(self.videos, conditions)

    def top_k(self, measure: str, k: int) -> DataFrame:
        """Top-k by measure (A6/O4), deterministic tiebreak."""
        return topk.top_k(self.videos, measure, k, tiebreak="video_id")
