"""Offline state inspection: Spark's state data source as the PySpark face
of the reference's state-scan surface.

Reference parity (all citations into /root/reference):

- ``StateStore.iterator`` (Provider.scala:244-277) — full scan of committed
  state as key/value pairs → ``read_state(...)`` over a checkpoint.
- ``StateStore.getRange`` (Provider.scala:190-193) — the reference's range
  read is DEGENERATE (ignores bounds, full iterator), so the same full scan
  satisfies its contract; callers filter the returned DataFrame instead.
- ``latestIterator`` (Provider.scala:655-660) — newest committed version;
  the data source's default when no ``batchId`` is given.
- ``Provider.getStore(version)`` (Provider.scala:384-401) — point-in-time
  state; ``batch_id=N`` reads the state exactly as committed by micro-batch
  N (versioned recovery made queryable).
- ``StateStore.metrics.numKeys`` (Provider.scala:282-283) — ``count()`` on
  the returned DataFrame; per-partition key counts via ``partition_id``.
- ``state-metadata`` lists every stateful operator in a checkpoint with its
  batch range — the operator inventory behind StateStoreId
  (Provider.scala:53-54,132).

Scale shape: the source plans one input partition per state-store shard
(``partition_id``), reading RocksDB/HDFS state files directly — no driver
collect, no re-run of the original query. At 100 TB of state this is the
only sane way to audit state: it is a parallel scan of the checkpoint,
pruned to one operator + one store + one version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state(
    spark: SparkSession,
    checkpoint_location: str,
    *,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Scan committed state from ``checkpoint_location``.

    Columns: ``key`` (struct), ``value`` (struct), ``partition_id``.
    Defaults mirror the reference: latest committed version
    (``latestIterator``), operator 0, the default store. ``batch_id``
    selects an older version (``getStore(version)``); ``store_name`` /
    ``join_side`` address the four per-side stores of a stream-stream
    join (``left``/``right``).
    """
    reader = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    return reader.load(checkpoint_location)


def state_metadata(spark: SparkSession, checkpoint_location: str) -> DataFrame:
    """Operator inventory of a checkpoint: operatorId, operatorName,
    stateStoreName, numPartitions, min/maxBatchId."""
    return spark.read.format("state-metadata").load(checkpoint_location)


def num_state_keys(
    spark: SparkSession, checkpoint_location: str, *, operator_id: int = 0
) -> int:
    """``StateStore.metrics.numKeys`` (Provider.scala:282-283) for the
    latest committed version."""
    return read_state(spark, checkpoint_location, operator_id=operator_id).count()
