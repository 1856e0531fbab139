"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine package: ``spark_states_spark`` (see SURVEY.md §7 build plan).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_states_spark.catalog import ORACLES, ordered_queries  # noqa: E402


def _ensure_conf(spark: SparkSession) -> None:
    """Session confs the engine needs regardless of who built the session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        # Commit-speed default (r14, see session.py): row-count tracking
        # costs an extra RocksDB point lookup per put/delete purely for the
        # numRowsTotal observability counter; results are unaffected.
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
            "false",
        )
    except Exception:
        pass  # non-modifiable at runtime in some harnesses; fine for batch


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Streaming tumbling-window aggregation in UPDATE mode over time-ordered
    micro-batches: the watermark actually EVICTS closed windows from the
    RocksDB state store, so state stays bounded — the reason the reference
    exists (its README motivates the provider with the OOM risk of
    unbounded in-memory state). Drained with Trigger.AvailableNow and
    returned as a batch DataFrame. The complete-mode variant
    (streaming_hourly_agg) remains in the catalog as an oracle harness.
    """
    _ensure_conf(spark)
    from spark_states_spark.streaming.queries import streaming_hourly_agg_update

    return streaming_hourly_agg_update(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_conf(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return dict(ORACLES)
