"""Event analytics: batch sessionization & time-bucket aggregation.

Gap-based sessionization is the batch twin of streaming
``session_window`` (SURVEY.md §2.3): a new session starts when the gap to
the previous event of the same user is ≥ 30 minutes. Implemented with
lag + conditional cumsum — one shuffle on user_id serves every window in
the chain.

Timestamps: events.ts is ns in parquet; Spark works on µs. All comparisons
here use epoch *microseconds* (DuckDB: epoch_ns//1000) so both engines see
bit-identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, in microseconds

# THE sessionization convention, spelled once per dialect (three entries —
# sessionize_events, behavior_bounce_rate_daily,
# behavior_peak_concurrency_daily — share it; a convention edit that missed
# one of three verbatim copies would silently diverge the "shared
# convention" their docstrings advertise). 30-minute gap on the
# (ts_us, event_id) order; a session starts where the gap from the previous
# event is >= GAP_US.
_SESSION_CTES = """ordered AS (
      SELECT user_id, event_id, value,
             epoch_ns(ts) // 1000 AS ts_us,
             lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                                             ORDER BY epoch_ns(ts) // 1000, event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us >= 1800000000
                     THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), numbered AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                  AS session_id
      FROM flagged
    )"""


def _session_frame(e: DataFrame) -> DataFrame:
    """The Spark twin of ``_SESSION_CTES``: the input events frame with
    ``ts_us`` and ``session_id`` columns appended (all original columns
    kept). One user_id Exchange serves the lag and the cumsum; downstream
    per-(user, session) aggregates reuse it (groupBy keys ⊃ partition
    key)."""
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        e.withColumn("ts_us", F.unix_micros("ts"))
        .withColumn("prev_us", F.lag("ts_us").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("ts_us") - F.col("prev_us") >= GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(wrun))
    )


@register(
    "hourly_event_stats",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly time-bucket aggregation (batch twin of the streaming flagship)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
                "sum_value"
            ),
        )
    )


@register(
    "rollup_hourly_to_daily",
    # The oracle aggregates raw events straight to days; the engine rolls up
    # FROM the hourly aggregate — equal by associativity of count/sum.
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_hourly_to_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup cascade: daily stats derived from the HOURLY
    aggregate, not from raw events — the hypertable/continuous-aggregate
    pattern. At 100 TB the daily job reads n_hours × n_types pre-aggregated
    rows instead of re-scanning the raw table, and the hourly intermediate
    is exactly what ``streaming_hourly_agg_update`` maintains incrementally,
    so the cascade composes with the streaming pipeline.

    Only decomposable aggregates cascade (count/sum/min/max — summed here
    as DECIMALs so the two-level sum is bit-exact with the one-level
    oracle; double only at the end). Distinct counts do NOT roll up from
    finalized values — at scale those cascade as mergeable sketches (HLL),
    which is why this entry carries no ``n_users`` column.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_ts"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("sv"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "hour_ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
    )


@register(
    "sessionize_events",
    oracle=f"""
    WITH {_SESSION_CTES}
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(ts_us) // 1000000 AS BIGINT) AS start_s,
           CAST(max(ts_us) // 1000000 AS BIGINT) AS end_s,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag + cumsum of session-start flags
    (``_session_frame`` — the shared convention)."""
    sess = _session_frame(load_table(spark, sf_dir, "events"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.expr("min(ts_us) div 1000000").alias("start_s"),
        F.expr("max(ts_us) div 1000000").alias("end_s"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias(
            "session_value"
        ),
    )


@register(
    "user_funnel_counts",
    oracle="""
    SELECT user_id,
           CAST(count(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS n_signup,
           CAST(count(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS n_view,
           CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
           CAST(count(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS n_error
    FROM events
    GROUP BY user_id
    """,
)
def user_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (funnel counts) per user."""
    e = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return e.groupBy("user_id").agg(
        cnt("signup"), cnt("view"), cnt("purchase"), cnt("error")
    )


_GAP_SCHEMA = "user_id bigint, median_gap_us double, n_gaps bigint"


@register(
    "user_gap_median",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_ns(ts) // 1000
               - lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                                                 ORDER BY epoch_ns(ts) // 1000,
                                                          event_id) AS gap_us
      FROM events
    )
    SELECT user_id, median(gap_us) AS median_gap_us,
           CAST(count(gap_us) AS BIGINT) AS n_gaps
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def user_gap_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median inter-event gap per user via ``applyInPandas`` — the batch
    flatMapGroups surface (SURVEY.md §2.3). The Python stage sees one
    Arrow batch per user group after the keyed shuffle; medians use
    numpy's midpoint rule, identical to DuckDB's quantile_cont(0.5).

    (A pure-SQL spelling exists; this entry deliberately exercises the
    grouped-Pandas path the LLM ops build on, with an oracle to prove the
    crossing loses nothing.)
    """
    import numpy as np
    import pandas as pd

    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_id"
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        gaps = np.diff(pdf["ts_us"].to_numpy())
        if len(gaps) == 0:
            return pd.DataFrame(columns=["user_id", "median_gap_us", "n_gaps"])
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "median_gap_us": [float(np.median(gaps))],
                "n_gaps": [int(len(gaps))],
            }
        )

    return events.groupBy("user_id").applyInPandas(per_user, _GAP_SCHEMA)


@register(
    "user_gap_median_builtin",
    # Same oracle as user_gap_median — the two entries are semantically
    # identical by construction; only the execution surface differs.
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_ns(ts) // 1000
               - lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                                                 ORDER BY epoch_ns(ts) // 1000,
                                                          event_id) AS gap_us
      FROM events
    )
    SELECT user_id, median(gap_us) AS median_gap_us,
           CAST(count(gap_us) AS BIGINT) AS n_gaps
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def user_gap_median_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``user_gap_median`` spelled entirely in JVM built-ins (VERDICT r06
    #4 / r07 #5): gaps via a ``lag`` window, medians via Spark's exact
    ``percentile`` — no Python worker, no Arrow crossing. Benchmarked next
    to the grouped-Pandas demo above, the pair quantifies the crossing
    cost of the `applyInPandas` surface on identical semantics (the
    measured delta is recorded in BASELINE.md).

    Value parity is exact, not approximate: for an even gap count all
    three engines take the midpoint of two int64 microsecond values —
    numpy's midpoint rule, Spark percentile's ``lower + (upper-lower)*0.5``
    and DuckDB ``median``'s interpolation all hit the same exactly-
    representable double (integers < 2^52, halves exact).

    100 TB shape: one shuffle on user_id shared by the window and the
    aggregation; exact ``percentile`` buffers one user's gaps, so memory
    is O(events per user) — same bound the Arrow batch already imposed on
    the sibling. A global exact median would instead use the two-pass
    operators/orderstats.py approach.
    """
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("ts_us"), "event_id")
        .withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.expr("percentile(gap_us, 0.5)").alias("median_gap_us"),
        F.count("*").cast("bigint").alias("n_gaps"),
    )


@register(
    "behavior_bounce_rate_daily",
    # Shared sessionization convention (_SESSION_CTES / _session_frame);
    # a "bounce" is a single-event session, bucketed by the session's
    # start day (epoch-day of the first event). Counts are BIGINT; the
    # rate is one BIGINT->DOUBLE division — identical both engines.
    oracle=f"""
    WITH {_SESSION_CTES}, sessions AS (
      SELECT user_id, session_id,
             min(ts_us) // 1000000 // 86400 AS day,
             count(*) AS n_events
      FROM numbered GROUP BY user_id, session_id
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(CASE WHEN n_events = 1 THEN 1 END) AS BIGINT) AS n_bounces,
           CAST(count(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE) / count(*)
             AS bounce_rate
    FROM sessions
    GROUP BY day
    """,
)
def behavior_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: the share of sessions (30-minute-gap
    sessionization, shared convention with ``sessionize_events``) that
    contain exactly ONE event, bucketed by the session's start day — the
    standard engagement-health metric a product team reads next to the
    funnel and retention entries.

    Scale shape: the one Exchange on ``user_id`` serves the lag() window,
    the cumsum window, AND the per-session aggregate (the groupBy keys are
    a superset of the partition key, so no second full-width shuffle); the
    final day rollup aggregates ≤ |days| × partial rows. Per-user state
    never leaves its partition — the identical plan at 100 TB.
    """
    sess = _session_frame(load_table(spark, sf_dir, "events"))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.expr("min(ts_us) div 1000000 div 86400").alias("day"),
        F.count("*").alias("n_events"),
    )
    return per_session.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.count(F.when(F.col("n_events") == 1, 1)).alias("n_bounces"),
        (
            F.count(F.when(F.col("n_events") == 1, 1)).cast("double")
            / F.count("*")
        ).alias("bounce_rate"),
    )


@register(
    "behavior_peak_concurrency_daily",
    # Interval-overlap counting via the boundary sweep: each session
    # (shared 30-minute-gap convention) occupies the CLOSED microsecond
    # interval [start_us, end_us]; it contributes +1 at its (day-clipped)
    # entry instant and -1 one microsecond after its exit. Net deltas are
    # aggregated PER INSTANT before the running sum, so equal-timestamp
    # boundaries can never make the cumsum order-dependent — the peak is
    # deterministic without any tie-break. All-BIGINT arithmetic.
    oracle=f"""
    WITH {_SESSION_CTES}, sessions AS (
      SELECT user_id, session_id,
             min(ts_us) AS start_us, max(ts_us) AS end_us
      FROM numbered GROUP BY user_id, session_id
    ), days AS (
      SELECT start_us, end_us,
             unnest(generate_series(start_us // 86400000000,
                                    end_us // 86400000000)) AS day
      FROM sessions
    ), bounds AS (
      SELECT day, greatest(start_us, day * 86400000000) AS ts,
             1 AS delta
      FROM days
      UNION ALL
      SELECT day, least(end_us, (day + 1) * 86400000000 - 1) + 1 AS ts,
             -1 AS delta
      FROM days
    ), net AS (
      SELECT day, ts, CAST(sum(delta) AS BIGINT) AS d
      FROM bounds GROUP BY day, ts
    ), run AS (
      SELECT day, sum(d) OVER (PARTITION BY day ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS c
      FROM net
    ), act AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_sessions_active
      FROM days GROUP BY day
    )
    SELECT CAST(r.day AS BIGINT) AS day,
           a.n_sessions_active,
           CAST(max(r.c) AS BIGINT) AS peak_concurrent
    FROM run r JOIN act a ON a.day = r.day
    GROUP BY 1, 2
    """,
)
def behavior_peak_concurrency_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Peak concurrent sessions per day — the interval-overlap COUNTING
    operator (capacity planning's load question: "how many sessions were
    alive at the worst instant?"). Consumes the intervals the shared
    30-minute sessionization produces, where its siblings consume event
    or session COUNTS (``behavior_bounce_rate_daily`` — per-session
    sizes; ``sessionize_events`` — the intervals themselves): the sweep
    here is the classic +1/−1 boundary walk over day-clipped closed
    intervals, with net deltas aggregated per instant BEFORE the running
    sum so same-microsecond boundaries cannot make the peak
    order-dependent.

    Scale shape: the session build is the family's one user_id Exchange;
    the boundary frame is 2 rows per (session, day-overlapped) and is
    explicitly repartitioned on ``day`` so the per-instant aggregate
    (groupBy keys ⊃ day) AND the ordered running-sum window AND the
    final per-day max all reuse that single Exchange — one shuffle of
    O(sessions) boundary rows, never of raw events. Per-day window
    width is bounded by distinct boundary instants in that day. The
    final join is a broadcast of a ≤|days|-row frame.
    """
    sess = (
        _session_frame(load_table(spark, sf_dir, "events"))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("start_us"), F.max("ts_us").alias("end_us"))
    )
    day_us = 86400 * 1_000_000
    days = sess.select(
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                F.expr(f"start_us div {day_us}"),
                F.expr(f"end_us div {day_us}"),
            )
        ).alias("day"),
    )
    bounds = days.select(
        "day",
        F.greatest(F.col("start_us"), F.col("day") * F.lit(day_us)).alias("ts"),
        F.lit(1).alias("delta"),
    ).unionByName(
        days.select(
            "day",
            (
                F.least(
                    F.col("end_us"),
                    (F.col("day") + 1) * F.lit(day_us) - 1,
                )
                + 1
            ).alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    net = (
        bounds.repartition("day")
        .groupBy("day", "ts")
        .agg(F.sum("delta").cast("bigint").alias("d"))
    )
    wday = (
        W.partitionBy("day")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = net.withColumn("c", F.sum("d").over(wday))
    act = days.groupBy("day").agg(
        F.count("*").alias("n_sessions_active")
    )
    return (
        run.groupBy(F.col("day").cast("bigint").alias("day"))
        .agg(F.max("c").cast("bigint").alias("peak_concurrent"))
        .join(
            F.broadcast(
                act.select(
                    F.col("day").cast("bigint").alias("day"),
                    "n_sessions_active",
                )
            ),
            "day",
        )
        .select("day", "n_sessions_active", "peak_concurrent")
    )
