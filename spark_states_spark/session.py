"""SparkSession builder helpers.

``use_rocksdb_state_store`` is the PySpark-native equivalent of the
reference's ``SparkSession.Builder`` implicit ``useRocksDBStateStore()``
(``implicits.scala:32-38``), pointed at Spark's *built-in* RocksDB provider
(SPARK-34198 — the modern descendant of the reference) instead of a custom
JNI provider, with changelog checkpointing enabled (supersedes the
reference's full-zip-per-commit snapshots, Provider.scala:448-462).

Tuning mirrors the intent of the reference's RocksDB options
(Provider.scala:101-107: 200 MB write buffers ×3, background compactions,
compression) through the ``spark.sql.streaming.stateStore.rocksdb.*`` conf
namespace.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# Defaults sized for the local[32] test harness; on a real cluster these are
# overridden per-deployment. Shuffle partitions should be ~2-3× total cores.
_LOCAL_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.ui.enabled": "false",
    # The events fixture stores TIMESTAMP(NANOS) which Spark rejects by
    # default; read it as raw int64 nanos and convert explicitly
    # (sources.tables.with_event_time).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def use_rocksdb_state_store(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Configure a builder to use the RocksDB state store provider.

    Parity: reference ``implicits.scala:32-38`` (sets
    ``spark.sql.streaming.stateStore.providerClass``). Additionally enables
    changelog checkpointing — the modern replacement for the reference's
    full-snapshot-per-commit durability (Provider.scala:448-462) — and write
    buffer tuning in the spirit of Provider.scala:101-107.
    """
    return (
        builder.config("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        # 64 MB write buffers (reference used 200 MB ×3 for a heavy JNI store;
        # Spark's provider defaults are per-partition so keep them moderate).
        .config("spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB", "64")
        .config("spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber", "3")
        .config("spark.sql.streaming.stateStore.rocksdb.compression", "lz4")
        # Row-count tracking OFF by default (optimization r14): with it on,
        # every put/delete pays an extra RocksDB point lookup solely to
        # maintain the numRowsTotal/numRowsRemoved observability counters —
        # Spark's own structured-streaming docs call this out as the knob
        # for write-heavy state. Measured on this harness (order-balanced
        # A/B, OPTIMIZATION_r14.md Change 2): state commit is >50% of a
        # chunked drain's wall; disabling tracking reads wall
        # flat-to-slightly-better (never worse) with the mechanism visible
        # in stateOperators.commitTimeMs — −8% on the RAM-backed checkpoint
        # path, −37% on the disk-backed path where the extra point-gets
        # interact with changelog fsyncs; the upside grows with state
        # volume. Query RESULTS are unaffected — eviction
        # still happens; only the counters read -1. Metric consumers
        # (streaming.metrics facade, the eviction-metric tests) opt back
        # in per-session/per-test with this conf set to "true".
        .config(
            "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
            "false",
        )
    )


def build_session(
    app_name: str = "spark_states_spark",
    master: str | None = None,
    rocksdb_state: bool = True,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession with scale-appropriate defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    for k, v in _LOCAL_DEFAULTS.items():
        builder = builder.config(k, v)
    # Local mode runs every task in the driver JVM: 32 concurrent tasks on
    # spark-submit's 1 GiB default heap is GC-bound (the 10x scale probe
    # flat-out dies on it). 8 GiB on the 128 GiB harness box; applies only
    # when this process launches the JVM (ignored by getOrCreate on a live
    # session, so tests sharing a session are unaffected mid-run). Read at
    # CALL time, not import time — a caller (scaleprobe) that sets
    # SPARK_GRAFT_DRIVER_MEM in main() after importing this module must
    # still get its heap (ADVICE r08: the import-time read silently ran
    # the 24g probe on 8g).
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    # Scratch space (shuffle files, RocksDB working dirs) on the fastest
    # local storage available (optimization r14, guide §2.1: local disk
    # bandwidth can be the shuffle's tighter limit). On this harness /tmp
    # is disk-backed ext4 while the box has 128 GiB RAM, so a RAM-backed
    # scratch dir is the local equivalent of the NVMe scratch volumes a
    # production cluster mounts for spark.local.dir. Data here is MBs —
    # far below any RAM-pressure concern; a real deployment sets its own
    # spark.local.dir per node. Env-overridable; static conf, so it only
    # applies when this process launches the JVM.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/sss_spark_local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if rocksdb_state:
        builder = use_rocksdb_state_store(builder)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
