"""Run a streaming DataFrame to completion and return the batch result.

The driver's contract wants every ``queries()`` entry to return a plain
DataFrame, so streaming operators are exercised end-to-end here: file-source
micro-batches → stateful operator (backed by the configured RocksDB state
store) → memory sink, with ``Trigger.AvailableNow`` so the query drains all
input and stops. Each trigger is one versioned state commit — the same
micro-batch lifecycle the reference participates in
(``RocksDbStateStoreProvider.scala:49-59``).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame


def run_stream_to_table(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
    checkpoint_location: str | None = None,
    with_progress: bool = False,
) -> DataFrame:
    """Start ``stream_df`` with availableNow, await drain, return result DF.

    With ``with_progress=True`` returns ``(result_df, progress)`` where
    ``progress`` is the query's per-batch ``recentProgress`` dicts — used by
    tests to assert on state-store metrics (numRowsTotal / numRowsRemoved),
    the PySpark face of ``StateStore.metrics`` (Provider.scala:282-283).
    """
    spark = stream_df.sparkSession
    name = query_name or f"sss_{uuid.uuid4().hex[:12]}"
    ckpt = checkpoint_location or tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    query = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    if with_progress:
        return spark.table(name), list(query.recentProgress)
    return spark.table(name)


def run_stream_drain_wallclock(
    stream_df: DataFrame,
    n_input_rows: int,
    output_mode: str = "append",
    timeout_s: float = 180.0,
) -> DataFrame:
    """Drain a ``ProcessingTimeTimeout`` stateful stream and return the sink.

    ``Trigger.AvailableNow`` never terminates a query whose operator holds
    a processing-time timeout conf (the engine keeps scheduling batches to
    service potential timeouts), so the wall-clock TTL kernel cannot use
    :func:`run_stream_to_table`. Instead: run on a fast processing-time
    trigger, wait until every input row has been processed AND a trailing
    empty batch has committed (so the sink provably holds all output),
    then stop. Caller supplies ``n_input_rows`` (a cheap metadata count of
    the source) to make "drained" well-defined.
    """
    import time as _time

    spark = stream_df.sparkSession
    name = f"sss_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    query = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if not query.isActive:
                # Surface the real failure instead of spinning to a
                # misleading drain timeout.
                exc = query.exception()
                raise RuntimeError(
                    f"wall-clock stream terminated before draining: {exc}"
                )
            progress = list(query.recentProgress)
            seen = sum(p["numInputRows"] for p in progress)
            if (
                seen >= n_input_rows
                and progress
                and progress[-1]["numInputRows"] == 0
            ):
                break
            _time.sleep(0.2)
        else:
            raise TimeoutError(
                f"wall-clock stream did not drain {n_input_rows} rows "
                f"within {timeout_s}s"
            )
    finally:
        query.stop()
    return spark.table(name)
