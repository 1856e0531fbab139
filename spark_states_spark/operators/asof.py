"""As-of (point-in-time) join — a custom operator Spark lacks natively.

Semantics: for each left row, attach the single most recent right row whose
time is ≤ the left row's time, per key — the canonical enrichment join of
event pipelines (DuckDB/Pandas/kdb ``ASOF JOIN``). The reference has no such
operator (it has no relational operators at all, SURVEY.md §2.3); this is
part of the training-data-pipeline extension surface.

Implementation is the **union + ordered-window** shape, not a per-row probe:
tag both sides, union them, and run ``last(value, ignorenulls=True)`` over a
(key, time)-ordered window — one shuffle on the key, one partition-local
sort, zero nested-loop joins. At 100 TB this is the right distributed plan:
it scales with the shuffle, reuses Spark's sort machinery, and admits
range-partitioning on (key, time) for pre-sorted inputs. Tie rule: at equal
timestamps the right-side row sorts first, so "≤" includes same-instant
matches (DuckDB ASOF semantics).

Determinism note: when several right rows share the winning timestamp the
*row* choice is engine-dependent, so the operator emits the matched
timestamp and values derived from it — deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table


@register(
    "asof_join_latest_order",
    oracle="""
    SELECT e.event_id, e.user_id,
           CAST(o.o_orderdate AS DATE) AS last_order_date,
           CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(e.ts AS DATE)) AS INT)
             AS days_since_order
    FROM events e
    ASOF JOIN orders o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    """,
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event enriched with the user's most recent order as of the
    event time (inner as-of: events with no prior order are dropped)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").alias("t")
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), F.col("o_orderdate").alias("t")
    )
    tagged = o.select(
        "user_id", "t", F.lit(None).cast("long").alias("event_id"),
        F.col("t").alias("odate"), F.lit(0).alias("side")
    ).unionByName(
        e.select(
            "user_id", "t", "event_id",
            F.lit(None).cast("timestamp").alias("odate"), F.lit(1).alias("side")
        )
    )
    # side=0 (orders) sorts before side=1 (events) at equal t → "≤" matches.
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("last_odate", F.last("odate", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .filter(F.col("last_odate").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.to_date("last_odate").alias("last_order_date"),
            F.datediff(F.to_date("t"), F.to_date("last_odate"))
            .cast("int")
            .alias("days_since_order"),
        )
    )
