"""Time-partitioned layout: partition pruning on the scan path.

The second physical-layout pattern (after bucketing): event data written
``partitionBy(day)`` so that any time-bounded query prunes to the matching
partition directories BEFORE reading a byte — at 100 TB with daily
partitions, a one-week query touches 7/365ths of the data, decided from
directory names alone. ``tests/test_plans.py`` pins the pruned partition
count in the scan node.

The partitioned copy is staged once under /tmp, keyed by the source file's
content identity (same convention as bucketing.py / chunked_stream), with a
write-to-tmp-then-rename so concurrent sessions can't observe a half-built
layout.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from .tables import _source_identity, load_table, table_path

# One-week query window over the 30-day events fixture.
PRUNE_START, PRUNE_END = "2024-01-10", "2024-01-16"


def ensure_day_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as a day-partitioned parquet layout; return its path."""
    src = table_path(sf_dir, "events")
    ident = hashlib.sha1(
        f"{os.path.abspath(src)}|{_source_identity(src)}|day".encode()
    ).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "sss_day_partitioned", ident)
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        tmp = f"{d}.tmp-{uuid.uuid4().hex[:8]}"
        (
            load_table(spark, sf_dir, "events")
            .withColumn("day", F.to_date("ts"))
            # One file per (writer-task, day) would give tiny files; sort by
            # the partition column first so each task writes few days — the
            # local-sort-before-partitioned-write recipe that keeps file
            # counts sane at scale.
            .sortWithinPartitions("day")
            .write.partitionBy("day")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, d)
        except OSError:  # concurrent builder won the race; theirs is identical
            shutil.rmtree(tmp, ignore_errors=True)
    return d


def pruned_week_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partition-pruned filtered scan itself (plan-test hook)."""
    d = ensure_day_partitioned_events(spark, sf_dir)
    df = spark.read.parquet(d)
    return df.filter(
        (F.col("day") >= F.lit(PRUNE_START)) & (F.col("day") <= F.lit(PRUNE_END))
    )


@register(
    "partitioned_scan_prune",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE CAST(date_trunc('day', ts) AS DATE) BETWEEN
          DATE '{PRUNE_START}' AND DATE '{PRUNE_END}'
    GROUP BY 1, 2
    """,
)
def partitioned_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One week of per-day/type event stats over the DAY-PARTITIONED
    layout: the day predicate resolves against partition directory names,
    so only 7 of the 30 day-partitions are ever opened (pinned in
    tests/test_plans.py). The DuckDB oracle computes the same week from
    the raw unpartitioned file — a value match proves the partitioned
    layout is, like bucketing, a pure physical optimization.
    """
    week = pruned_week_scan(spark, sf_dir)
    return week.groupBy("day", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_value"),
    )
