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
