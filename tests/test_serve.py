"""Serving facade: cache-or-compute dispatch + live query surface."""

from __future__ import annotations

import pytest


@pytest.fixture()
def service(spark, videos, tmp_path):
    from youtubeanalyzerproject_big_data__spark.serve import QueryService

    return QueryService(spark, videos, str(tmp_path / "cache"))


def test_serve_materializes_then_reads_cache(service, videos, spark, tmp_path):
    out = {r["category"]: r["num_videos"] for r in service.serve("categorystats").collect()}
    assert out["Music"] == 3

    # second serve must come from the ARTIFACT, not recomputation: swap the
    # underlying table and confirm the answer is unchanged (cache semantics
    # of guiV5.py Phase-2 -- stale until refresh).
    service.videos = videos.where("category != 'Music'")
    again = {r["category"]: r["num_videos"] for r in service.serve("categorystats").collect()}
    assert again == out

    # refresh re-runs Phase 1 against the current table
    service.refresh("categorystats")
    fresh = {r["category"]: r["num_videos"] for r in service.serve("categorystats").collect()}
    assert "Music" not in fresh


def test_serve_recomputes_partial_artifact(service, tmp_path):
    """A crashed Phase-1 write (directory present, no _SUCCESS) must NOT be
    treated as a cache hit -- serve must recompute, not return truncated
    results forever (ADVICE r2)."""
    import os
    import shutil

    service.serve("categorystats")  # populate
    path = service._path("categorystats")
    os.remove(os.path.join(path, "_SUCCESS"))  # simulate partial write
    # drop the data files too: if serve wrongly trusted the directory it
    # would now return an empty/truncated frame instead of recomputing
    for f in os.listdir(path):
        os.remove(os.path.join(path, f))
    out = {r["category"]: r["num_videos"] for r in service.serve("categorystats").collect()}
    assert out["Music"] == 3
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    shutil.rmtree(path)


def test_serve_point_lookup_pushes_predicate(spark, videos, tmp_path):
    """The live point-lookup (reference find_one analog) must push the id
    equality into the parquet scan, not filter post-read.  Uses a
    parquet-backed videos table -- pushdown needs a file source."""
    from youtubeanalyzerproject_big_data__spark.serve import QueryService

    vpath = str(tmp_path / "videos_pq")
    videos.write.mode("overwrite").parquet(vpath)
    svc = QueryService(spark, spark.read.parquet(vpath), str(tmp_path / "cache"))
    df = svc.lookup("v03")
    assert df.collect()[0]["category"] == "Comedy"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "video_id" in plan.split("PushedFilters:")[1][:200]


def test_serve_unknown_name_lists_available(service):
    with pytest.raises(KeyError, match="categorystats"):
        service.serve("nope")


def test_live_queries_dispatch(service):
    assert service.lookup("v03").collect()[0]["category"] == "Comedy"
    assert {r["video_id"] for r in service.search_range("views", 1000, 30000).collect()} == {"v02", "v06"}
    assert service.search_count([("category", "eq", "Music"), ("views", "ge", 1000)]).collect()[0]["num_matches"] == 2
    top = service.top_k("views", 2).collect()
    assert [r["video_id"] for r in top] == ["v04", "v03"]
