"""State data source reader — parity with the reference's state-scan
surface: iterator (Provider.scala:244-277), latestIterator (:655-660),
getStore(version) (:384-401), metrics.numKeys (:282-283), and the
StateStoreId operator inventory (:53-54,132) via state-metadata.
"""

import os
import time
import uuid

import pandas as pd
import pytest

from spark_states_spark.streaming.state_reader import (
    num_state_keys,
    read_state,
    state_metadata,
)


def _write_chunk(src_dir, rows, mtime):
    os.makedirs(src_dir, exist_ok=True)
    pdf = pd.DataFrame(rows, columns=["k", "v", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    p = os.path.join(src_dir, f"chunk_{uuid.uuid4().hex[:8]}.parquet")
    pdf.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
    os.utime(p, (mtime, mtime))


def _run_count_agg(spark, src_dir, ckpt):
    stream = (
        spark.readStream.schema("k string, v long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = stream.groupBy("k").count()
    name = f"sr_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.fixture()
def two_batch_ckpt(spark, tmp_path):
    """Checkpoint of a 2-micro-batch count aggregation:
    batch 0 = {a:2, b:1}, batch 1 adds {a:1, c:1}."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    base = time.time() - 100
    t0 = "2024-01-01 00:00:00"
    _write_chunk(src, [("a", 1, t0), ("a", 2, t0), ("b", 3, t0)], base)
    _write_chunk(src, [("a", 4, t0), ("c", 5, t0)], base + 10)
    _run_count_agg(spark, src, ckpt)
    return ckpt


def test_latest_iterator_equals_final_state(spark, two_batch_ckpt):
    """Default read = latestIterator (Provider.scala:655-660): the newest
    committed version, i.e. counts over BOTH batches."""
    st = read_state(spark, two_batch_ckpt)
    got = {r["key"]["k"]: r["value"]["count"] for r in st.collect()}
    assert got == {"a": 3, "b": 1, "c": 1}
    assert num_state_keys(spark, two_batch_ckpt) == 3


def test_versioned_read_is_get_store_version(spark, two_batch_ckpt):
    """batch_id=N = getStore(version) (Provider.scala:384-401): state
    exactly as committed by micro-batch N, older versions intact after
    newer commits (the ProviderSuite 'Snapshotting' round-trip)."""
    st0 = read_state(spark, two_batch_ckpt, batch_id=0)
    got0 = {r["key"]["k"]: r["value"]["count"] for r in st0.collect()}
    assert got0 == {"a": 2, "b": 1}
    st1 = read_state(spark, two_batch_ckpt, batch_id=1)
    got1 = {r["key"]["k"]: r["value"]["count"] for r in st1.collect()}
    assert got1 == {"a": 3, "b": 1, "c": 1}


def test_state_metadata_operator_inventory(spark, two_batch_ckpt):
    """state-metadata = the StateStoreId inventory: operator name, store
    name, shard count, committed batch range."""
    md = state_metadata(spark, two_batch_ckpt).collect()
    assert len(md) == 1
    row = md[0]
    assert row["operatorId"] == 0
    assert row["operatorName"] == "stateStoreSave"
    assert row["stateStoreName"] == "default"
    assert row["numPartitions"] == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    assert (row["minBatchId"], row["maxBatchId"]) == (0, 1)


def test_join_side_state_read(spark, tmp_path):
    """A stream-stream join's per-side buffers are readable with
    join_side — the four-stores-per-partition layout made inspectable."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt = str(tmp_path / "ckpt")
    base = time.time() - 100
    t0 = "2024-01-01 00:00:00"
    _write_chunk(lsrc, [("a", 1, t0), ("b", 2, t0)], base)
    _write_chunk(rsrc, [("a", 10, t0)], base)
    L = (
        spark.readStream.schema("k string, v long, ts timestamp")
        .parquet(lsrc)
        .withWatermark("ts", "1 minute")
    )
    R = (
        spark.readStream.schema("k string, v long, ts timestamp")
        .parquet(rsrc)
        .selectExpr("k AS rk", "v AS rv", "ts AS rts")
        .withWatermark("rts", "1 minute")
    )
    j = L.join(R, L.k == R.rk).select("k", "v", "rv")
    name = f"sj_{uuid.uuid4().hex[:10]}"
    q = (
        j.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # join-key structs carry positional names (field0, ...); the value
    # struct is the buffered (column-pruned) input row per side
    left = read_state(spark, ckpt, join_side="left").collect()
    right = read_state(spark, ckpt, join_side="right").collect()
    assert {r["key"]["field0"] for r in left} == {"a", "b"}
    assert {r["key"]["field0"] for r in right} == {"a"}
    # buffered values round-trip, not just keys
    assert {(r["value"]["k"], r["value"]["v"]) for r in left} == {("a", 1), ("b", 2)}
    assert {(r["value"]["rk"], r["value"]["rv"]) for r in right} == {("a", 10)}
