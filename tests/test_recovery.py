"""Checkpoint corruption behavior — parity DIFFERENCE, encoded as a test.

The reference degrades: a corrupted newest snapshot falls back to the
previous snapshot, and with no readable snapshot it silently starts an
EMPTY store (RocksDbStateStoreProviderSuite.scala:106-133 "Corrupted
snapshots": version→version−1→∅). Spark's built-in RocksDB provider makes
the opposite call: corrupted/missing state files FAIL the restarted query
(fail-fast beats silently recomputing on an empty store — an empty-store
fallback wipes aggregation history without any signal to the operator).

This test pins the Spark behavior so the difference is load-bearing and
documented (PARITY.md row 11a), not accidental.
"""

import glob
import os
import time
import uuid

import pandas as pd
import pytest
from pyspark.errors.exceptions.captured import StreamingQueryException

from spark_states_spark.streaming.ttl import OPS_SCHEMA


def _write_batch(src_dir, rows, mtime):
    os.makedirs(src_dir, exist_ok=True)
    pdf = pd.DataFrame(
        [
            {"key": k, "op": op, "value": v, "ts_s": ts, "seq": j}
            for j, (k, op, v, ts) in enumerate(rows)
        ]
    )
    pdf["value"] = pd.array(pdf["value"], dtype="Int64")
    pdf["ts_s"] = pdf["ts_s"].astype("int64")
    pdf["seq"] = pdf["seq"].astype("int64")
    p = os.path.join(src_dir, f"batch_{uuid.uuid4().hex[:8]}.parquet")
    pdf.to_parquet(p)
    os.utime(p, (mtime, mtime))


def _run_counts(spark, src_dir, ckpt):
    stream = (
        spark.readStream.schema(OPS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    agg = stream.groupBy("key").count()
    name = f"rec_{uuid.uuid4().hex[:10]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_corrupted_state_files_fail_restart_not_degrade(spark, tmp_path):
    """Spark's RocksDB provider fails a restart over corrupted state files
    where the reference would degrade older-snapshot → empty store."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    base = time.time() - 100
    _write_batch(src, [("a", "put", 1, 0), ("b", "put", 2, 0)], base)
    out = _run_counts(spark, src, ckpt)
    assert out.count() == 2

    # Corrupt EVERY committed state artifact (changelogs and any zip
    # snapshots) — the analogue of the reference suite's corruptSnapshot.
    state_files = [
        f
        for pat in ("*.zip", "*.changelog")
        for f in glob.glob(
            os.path.join(ckpt, "state", "**", pat), recursive=True
        )
    ]
    assert state_files, "no RocksDB state artifacts found under checkpoint"
    for f in state_files:
        with open(f, "wb") as fh:
            fh.write(b"corrupted-not-a-state-file")

    # New input forces the restarted query to load prior state.
    _write_batch(src, [("a", "put", 3, 1)], base + 10)
    with pytest.raises(StreamingQueryException):
        _run_counts(spark, src, ckpt)
