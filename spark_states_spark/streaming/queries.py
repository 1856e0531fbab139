"""Streaming stateful queries exposed through the catalog.

Each runs a real Structured Streaming query (file micro-batches → stateful
operator on the RocksDB state store → memory sink, drained via
Trigger.AvailableNow) and returns the batch result. Where streaming
semantics coincide with a batch equivalent (complete-mode aggregation,
inner stream-stream join over a fully-drained bounded input), a DuckDB
oracle verifies the *values*, making these CONFIRMED rather than
rows-only checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import read_stream
from .runner import run_stream_to_table
from .windows import streaming_hourly_agg


@register(
    "streaming_hourly_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_hourly_agg_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: streaming tumbling-window aggregation, complete mode.

    Complete-mode final state == batch GROUP BY over the drained input, so
    the DuckDB oracle checks real streaming-state results.
    """
    return streaming_hourly_agg(spark, sf_dir)


@register(
    "streaming_dedup",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_unique_users
    FROM (SELECT DISTINCT event_type, user_id FROM events)
    GROUP BY event_type
    """,
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates — the reference's dedup-over-state use case.

    State = seen (event_type, user_id) pairs in RocksDB
    (SURVEY.md §2.3 'Streaming dedup'). Result re-aggregated per type.
    """
    events = read_stream(spark, sf_dir, "events")
    deduped = events.select("event_type", "user_id").dropDuplicates(
        ["event_type", "user_id"]
    )
    out = run_stream_to_table(deduped, output_mode="append")
    return out.groupBy("event_type").agg(F.count("*").alias("n_unique_users"))
