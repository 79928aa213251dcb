"""SparkSession factory.

The reference hand-tunes each job's session (Kryo buffers, 8-16g heaps,
``repartition(400)`` -- PageRank_Spark_v5.py:29-31,94-95;
run_alsrecs_job.py:36-42).  The new engine centralises that into one factory
with AQE enabled so runtime re-planning (coalescing, skew splitting,
broadcast demotion/promotion) replaces hand-scheduling.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# All engine scratch (Spark local dirs for shuffle/blockmgr spill, streaming
# source/sink/checkpoint dirs, layout-query write-read dirs) lives under the
# repo, NOT /tmp.  Round 7's post-round bench and verify both died with
# FileNotFoundException on /tmp/blockmgr-*/NN/temp_shuffle_* -- Spark's
# lazily-created shuffle subdirs vanished mid-write, the signature of an
# external /tmp sweep racing a live JVM.  A repo-local scratch root is
# outside any system tmp cleaner's reach; .tmp/ is gitignored.
SCRATCH_ROOT = os.environ.get(
    "SPARK_GRAFT_SCRATCH",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp"),
)


def scratch_dir(prefix: str) -> str:
    """mkdtemp under the repo-local scratch root (sweep-safe; caller cleans up)."""
    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=SCRATCH_ROOT)


def scratch_free_gb() -> float:
    """Free space (GB) on the volume holding the scratch root -- the cheap,
    truthful bound signal for multi-hour scale sweeps (walking the blockmgr
    tree itself costs minutes at sf10)."""
    import shutil

    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    return shutil.disk_usage(SCRATCH_ROOT).free / 1e9

# Streaming state-store backends.  'hdfs' (Spark's default) keeps state as
# in-memory maps snapshotted to the checkpoint dir -- fine while every
# executor's keys fit in heap.  'rocksdb' spills state to local SSD with
# incremental checkpointing -- the provider that makes bounded-state claims
# (se6's TTL design) real at 100 TB key cardinalities.  The conf is a
# per-session SQLConf read at query start, so it can also be flipped at
# runtime: spark.conf.set('spark.sql.streaming.stateStore.providerClass', ...).
STATE_STORE_PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def get_spark(
    app_name: str = "youtubeanalyzer-spark",
    master: str | None = None,
    state_store: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    At test scale we run ``local[N]``; at cluster scale the same settings
    hold: AQE owns post-shuffle partition counts, so
    ``spark.sql.shuffle.partitions`` is an upper bound, not a schedule.

    ``state_store`` ('hdfs' | 'rocksdb', default env SPARK_GRAFT_STATE_STORE
    or Spark's default): streaming state backend; see STATE_STORE_PROVIDERS.
    Applied via spark.conf.set so it takes effect even when an existing
    session is reused (builder confs don't reach a live session).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    state_store = state_store or os.environ.get("SPARK_GRAFT_STATE_STORE")
    if state_store is not None and state_store not in STATE_STORE_PROVIDERS:
        raise ValueError(f"unknown state_store {state_store!r}; pick from {sorted(STATE_STORE_PROVIDERS)}")
    # spark.local.dir is read once at JVM start; pointing it at the repo-local
    # scratch keeps blockmgr/shuffle temp out of /tmp (see SCRATCH_ROOT note).
    spark_local = os.path.join(SCRATCH_ROOT, "spark-local")
    os.makedirs(spark_local, exist_ok=True)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.local.dir", spark_local)
        # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
        # sort-merge -> broadcast conversion when a side turns out small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        # Arrow for any toPandas()/mapInPandas boundary (multimodal, ALS export).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Keep parquet scans splittable at cluster scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # The AppStatusStore backs stage_metrics() (bench shuffle-bytes
        # accounting) even with the UI off; retain enough stages that a
        # before/after snapshot never spans an eviction mid-measurement.
        .config("spark.ui.retainedStages", "20000")
        # Console progress bars write \r-framed [Stage ...] lines to stdout;
        # harness channels that tail-capture stdout (bench.py's one-line JSON
        # contract) get their buffer eaten by them, so keep stdout clean.
        .config("spark.ui.showConsoleProgress", "false")
    )
    # Escape hatch for scale replays: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    # (e.g. spark.io.compression.codec=zstd to shrink the sf10 shuffle
    # footprint on a disk-tight box). Builder-time only.
    for kv in filter(None, os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    if state_store is not None:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", STATE_STORE_PROVIDERS[state_store])
    return spark
