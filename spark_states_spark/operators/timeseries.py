"""Time-series / CDC-style operators over the ``events`` stream history.

Three patterns every large event pipeline needs downstream of ingestion:

- **Latest-wins compaction** (``cdc_upsert_latest``): collapse an append-only
  change feed to one current row per key — the batch equivalent of a
  streaming upsert materialized view (SCD type 1).
- **Run-collapse intervals** (``scd2_event_type_intervals``): turn the same
  feed into validity intervals per key (SCD type 2) — consecutive runs of an
  attribute value become [valid_from, valid_to) rows.
- **Grid gap-fill with LOCF** (``timeseries_gap_fill_locf``): regularize an
  irregular per-key series onto a daily grid, zero-filling counts and
  carrying the last observation forward for values.

All three are single-shuffle shapes (one hash partition by key, window or
aggregate within the partition) built from JVM expressions only — the same
plans survive a 1000-executor scale-up because the only exchange is the
per-key repartition the semantics require.

Float discipline (driver hash-compare is exact): value sums go through
DECIMAL(12,2) so summation order cannot perturb bits; timestamps are
emitted as epoch-microsecond BIGINTs (matching the interval-join oracles'
``epoch_ns(ts) // 1000`` convention in streaming/queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

# Latest-wins argmax BY (ts, event_id): struct comparison is lexicographic,
# so with the ordering columns leading the struct this is a map-side-
# combinable argmax. ONE definition (plus its SQL twin) shared by the batch
# compaction and the incremental MERGE so the two can never disagree on
# which row is "latest".
_LATEST_STRUCT_SQL = (
    "max(struct_pack(ts := epoch_ns(ts) // 1000, event_id := event_id,"
    " event_type := event_type, value := value))"
)


def _latest_struct_col() -> "F.Column":
    return F.max(
        F.struct(
            F.unix_micros("ts").alias("ts"),
            "event_id",
            "event_type",
            "value",
        )
    )


@register(
    "cdc_upsert_latest",
    oracle=f"""
    WITH m AS (
      SELECT user_id, {_LATEST_STRUCT_SQL} AS m
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           m.ts AS last_ts_us,
           m.event_id AS last_event_id,
           m.event_type AS last_event_type,
           m.value AS last_value
    FROM m
    """,
)
def cdc_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC compaction: one current row per user_id.

    Implemented as ``max(struct(ts, event_id, ...))`` rather than a
    row_number window: struct comparison is lexicographic, so with the
    ordering columns leading the struct this is an argmax BY (ts, event_id)
    — and as an aggregate it gets map-side partial combine, which a window
    function cannot. At 100 TB that means each mapper pre-collapses its
    shard to ≤ |keys| rows before the single shuffle. Ties on ts are broken
    by event_id (unique), so the result is deterministic in both engines.
    """
    events = load_table(spark, sf_dir, "events")
    m = events.groupBy("user_id").agg(_latest_struct_col().alias("m"))
    return m.select(
        "user_id",
        F.col("m.ts").alias("last_ts_us"),
        F.col("m.event_id").alias("last_event_id"),
        F.col("m.event_type").alias("last_event_type"),
        F.col("m.value").alias("last_value"),
    )


@register(
    "scd2_event_type_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS ts_us,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, event_type, ts_us,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM o
    ),
    runs AS (
      SELECT user_id, grp, event_type,
             min(ts_us) AS valid_from_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM g GROUP BY user_id, grp, event_type
    )
    SELECT user_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY grp)
             AS valid_to_us,
           n_events
    FROM runs
    """,
)
def scd2_event_type_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 run-collapse: per user, consecutive runs of the same event_type
    become validity intervals [valid_from_us, valid_to_us), NULL valid_to
    marking the current run.

    Classic gaps-and-islands: mark run starts with lag(), integrate the
    marks into run ids with a running sum, aggregate each run, then lead()
    for the closing bound. One shuffle (by user_id) serves every window and
    the aggregate — the island id is built inside the same partition order.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("is_start"),
    )
    # event_id tiebreak: without it, same-timestamp events of one user can
    # integrate the is_start marks in a different order than the lag()
    # window computed them, nondeterministically splitting runs.
    wg = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = o.withColumn("grp", F.sum("is_start").over(wg))
    runs = g.groupBy("user_id", "grp", "event_type").agg(
        F.min("ts_us").alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    wl = Window.partitionBy("user_id").orderBy("grp")
    return runs.select(
        "user_id",
        "event_type",
        "valid_from_us",
        F.lead("valid_from_us").over(wl).alias("valid_to_us"),
        "n_events",
    )


@register(
    "timeseries_gap_fill_locf",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             FROM daily GROUP BY user_id),
    grid AS (SELECT user_id,
                    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                      AS day
             FROM span)
    SELECT g.user_id, g.day,
           coalesce(d.n, 0) AS n_events,
           last_value(d.s IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_daily_value
    FROM grid g LEFT JOIN daily d USING (user_id, day)
    """,
)
def timeseries_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each user's event series onto a daily grid between their
    first and last active day: counts zero-filled, the daily value sum
    carried forward over inactive days (LOCF).

    The grid is generated per key with ``sequence()`` + ``explode`` — grid
    size is bounded by the key's own active span, never a global cross
    join. Daily sums go through DECIMAL(12,2) so the filled values are
    bit-exact across engines. The left join and both windows share the
    user_id hash partitioning; the grid side is tiny (keys × days) relative
    to the event scan at any scale.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .cast("double")
        .alias("s"),
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.last("s", ignorenulls=True).over(w).alias("locf_daily_value"),
    )


# MERGE cutoff: the last ~10 days of the 30-day fixture arrive as the delta.
_MERGE_CUTOFF = "2024-01-20"

@register(
    "merge_incremental_snapshot",
    oracle=f"""
    WITH base AS (
      SELECT user_id, {_LATEST_STRUCT_SQL} AS m
      FROM events WHERE ts < TIMESTAMP '{_MERGE_CUTOFF} 00:00:00'
      GROUP BY user_id
    ),
    delta AS (
      SELECT user_id, {_LATEST_STRUCT_SQL} AS m
      FROM events WHERE ts >= TIMESTAMP '{_MERGE_CUTOFF} 00:00:00'
      GROUP BY user_id
    )
    SELECT coalesce(b.user_id, d.user_id) AS user_id,
           coalesce(d.m, b.m).ts AS last_ts_us,
           coalesce(d.m, b.m).event_id AS last_event_id,
           coalesce(d.m, b.m).event_type AS last_event_type,
           coalesce(d.m, b.m).value AS last_value,
           CASE WHEN d.user_id IS NULL THEN 'unchanged'
                WHEN b.user_id IS NULL THEN 'inserted'
                ELSE 'updated' END AS merge_action
    FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
    """,
)
def merge_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO semantics without a table format: apply a change-feed
    delta (events ≥ cutoff) onto the previous latest-wins snapshot (events
    < cutoff) via one full-outer join — matched keys take the delta's newer
    row ('updated'), unmatched delta keys insert ('inserted'), untouched
    base keys carry over ('unchanged').

    This is the incremental maintenance recipe for ``cdc_upsert_latest``:
    at 100 TB you never recompact the whole history per batch — you merge
    the (small) delta against the (compacted) snapshot. Both sides
    pre-collapse to ≤ |keys| rows via the map-side-combinable
    ``max(struct)`` argmax BEFORE the join, so the full-outer join is
    snapshot-sized, not event-sized. Delta rows always beat base rows
    because every delta ts ≥ cutoff > every base ts.
    """
    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_MERGE_CUTOFF).cast("timestamp")
    base = (
        events.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(_latest_struct_col().alias("m"))
    )
    delta = (
        events.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(_latest_struct_col().alias("m"))
    )
    j = base.alias("b").join(
        delta.alias("d"), F.col("b.user_id") == F.col("d.user_id"), "full_outer"
    )
    m = F.coalesce("d.m", "b.m")
    return j.select(
        F.coalesce("b.user_id", "d.user_id").alias("user_id"),
        m.getField("ts").alias("last_ts_us"),
        m.getField("event_id").alias("last_event_id"),
        m.getField("event_type").alias("last_event_type"),
        m.getField("value").alias("last_value"),
        F.when(F.col("d.user_id").isNull(), "unchanged")
        .when(F.col("b.user_id").isNull(), "inserted")
        .otherwise("updated")
        .alias("merge_action"),
    )


# Probe set for time-series similarity: every 83rd user id — a fixed,
# deterministic "query workload" standing in for interactive lookups.
_SIM_PROBE_MOD = 83
_SIM_TOPK = 3


@register(
    "similar_users_timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    norms AS (
      SELECT user_id, CAST(sum(n * n) AS BIGINT) AS s2 FROM daily GROUP BY user_id
    ),
    probes AS (SELECT user_id AS p, s2 AS sp FROM norms
               WHERE user_id % {_SIM_PROBE_MOD} = 0),
    cross_term AS (
      SELECT pd.user_id AS p, ud.user_id AS u,
             CAST(sum(pd.n * ud.n) AS BIGINT) AS dot
      FROM daily pd JOIN daily ud ON pd.day = ud.day
      WHERE pd.user_id % {_SIM_PROBE_MOD} = 0
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT pr.p AS probe_user, nm.user_id AS candidate_user,
             pr.sp + nm.s2 - 2 * coalesce(ct.dot, 0) AS dist2
      FROM probes pr
      CROSS JOIN norms nm
      LEFT JOIN cross_term ct ON ct.p = pr.p AND ct.u = nm.user_id
      WHERE nm.user_id <> pr.p
    )
    SELECT probe_user, candidate_user, dist2,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_user
                                       ORDER BY dist2, candidate_user) AS rnk
          FROM pairs)
    WHERE rnk <= {_SIM_TOPK}
    """,
)
def similar_users_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search: for each probe user, the top-{k}
    users with the most similar 30-day activity profile (smallest squared
    Euclidean distance between daily event-count vectors).

    Sparse-exact shape (the streaming-similarity-search papers' recipe):
    vectors never materialize — dist²(p,u) = ‖p‖² + ‖u‖² − 2·(p·u), where
    the norms are one per-user aggregate and the dot products come from an
    inverted index on day (daily counts self-joined on day, probe side
    filtered first). Zero-overlap candidates are kept via the norms cross
    join, so the top-k is exact, not candidates-only. Everything is BIGINT
    arithmetic — bit-exact cross-engine. The probe set is a fixed bounded
    "query workload": probes×corpus pairs, never corpus², and the probe
    side broadcasts — at 100 TB the corpus side streams through one scan
    per query batch while probes ride along broadcast.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count("*").alias("n"))
    norms = daily.groupBy("user_id").agg(
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("s2")
    )
    is_probe = F.col("user_id") % _SIM_PROBE_MOD == 0
    probes = norms.filter(is_probe).select(
        F.col("user_id").alias("p"), F.col("s2").alias("sp")
    )
    pd_ = daily.filter(is_probe).select(
        F.col("user_id").alias("p"), "day", F.col("n").alias("np")
    )
    cross = (
        pd_.join(daily, "day")
        .groupBy("p", "user_id")
        .agg(F.sum(F.col("np") * F.col("n")).cast("bigint").alias("dot"))
    )
    pairs = (
        probes.crossJoin(norms)
        .filter(F.col("user_id") != F.col("p"))
        .join(cross, ["p", "user_id"], "left")
        .select(
            F.col("p").alias("probe_user"),
            F.col("user_id").alias("candidate_user"),
            (
                F.col("sp") + F.col("s2") - 2 * F.coalesce("dot", F.lit(0))
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("probe_user").orderBy("dist2", "candidate_user")
    return (
        pairs.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _SIM_TOPK)
    )


@register(
    "anomaly_zscore_events",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS s,
             CAST(sum(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2)))
                  AS DOUBLE) AS sq
      FROM events GROUP BY event_type
    ),
    enriched AS (
      SELECT event_type, n,
             s / n AS mean,
             sqrt((n * sq - s * s) / (n * (n - 1.0))) AS std
      FROM stats
    )
    SELECT e.event_type, en.n, en.mean, en.std,
           CAST(sum(CASE WHEN abs(e.value - en.mean) > 3.0 * en.std
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM events e JOIN enriched en ON e.event_type = en.event_type
    GROUP BY e.event_type, en.n, en.mean, en.std
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly counts per event type: events whose value deviates
    more than 3σ from their type's mean.

    Two-pass moments recipe: one aggregation computes (n, Σv, Σv²) in
    exact DECIMAL (summation-order-proof), the moments convert to double
    ONCE, and mean/std/every per-row comparison are then pure IEEE
    arithmetic on identical doubles in both engines — which is what makes
    a >3σ boundary comparison safe under the driver's exact float hash.
    The per-type stats frame (≤ |types| rows) joins back to the event scan
    without a hint; the optimizer broadcasts it from size estimates. At
    100 TB the shape is scan + tiny broadcast + re-aggregation — no
    event-to-event shuffle.
    """
    events = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(14,2)")
    stats = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s"),
        F.sum(v * v).cast("double").alias("sq"),
    )
    n, s, sq = F.col("n"), F.col("s"), F.col("sq")
    enriched = stats.select(
        "event_type",
        "n",
        (s / n).alias("mean"),
        F.sqrt((n * sq - s * s) / (n * (n - F.lit(1.0)))).alias("std"),
    )
    j = events.join(enriched, "event_type")
    return j.groupBy("event_type", "n", "mean", "std").agg(
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("mean")) > 3.0 * F.col("std"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_anomalies")
    )


_HIST_BINS = 20


@register(
    "histogram_event_values",
    oracle=f"""
    WITH ext AS (
      SELECT CAST(min(value) AS DOUBLE) AS lo, CAST(max(value) AS DOUBLE) AS hi
      FROM events
    )
    SELECT least(CAST(floor((value - lo) /
                   (CASE WHEN hi = lo THEN 1.0
                         ELSE (hi - lo) / {_HIST_BINS} END)) AS BIGINT),
                 {_HIST_BINS - 1}) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(value) AS DOUBLE) AS bin_min,
           CAST(max(value) AS DOUBLE) AS bin_max
    FROM events, ext
    GROUP BY 1
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values: {bins} equal bins between the
    observed min and max, with per-bin counts and actual bounds.

    Two-pass shape: the 1-row (min, max) extent broadcasts back onto the
    scan (crossJoin of a singleton — the sanctioned bounded-broadcast
    case), then binning is a projection and the GROUP BY has ≤ {bins}
    groups with full map-side combine. Determinism: lo/hi/width are
    IEEE-identical doubles in both engines, so floor() lands every value
    in the same bin; the max value is clamped into the last bin.
    """
    events = load_table(spark, sf_dir, "events")
    ext = events.agg(
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
    )
    # Degenerate-extent pin (same guard as exact_median / skyline): an
    # all-equal value column makes hi == lo, and 0/0 = NaN bins floor
    # differently across engines; width 1.0 puts every row in bin 0.
    width = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        (F.col("hi") - F.col("lo")) / _HIST_BINS
    )
    binned = events.crossJoin(ext).select(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("bigint"),
            F.lit(_HIST_BINS - 1),
        ).alias("bin"),
        "value",
    )
    return binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.min("value").cast("double").alias("bin_min"),
        F.max("value").cast("double").alias("bin_max"),
    )


@register(
    "ohlc_daily_bars",
    oracle="""
    WITH k AS (
      SELECT epoch_ns(ts) // 1000000000 // 86400 AS day,
             (epoch_ns(ts) // 1000 % 86400000000) * 10000000 + event_id AS seq,
             value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT CAST(day AS BIGINT) AS day,
           arg_min(value, seq) AS open,
           CAST(max(value) AS DOUBLE) AS high,
           CAST(min(value) AS DOUBLE) AS low,
           arg_max(value, seq) AS close,
           CAST(count(*) AS BIGINT) AS n_trades,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*)
             AS avg_value
    FROM k GROUP BY day
    """,
)
def ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars over purchase values — the canonical time-series
    compaction (open/high/low/close + mean), one map-side-combinable
    aggregate pass: open/close are ``min_by``/``max_by`` over a composite
    (ts_us, event_id) sequence key (deterministic under same-timestamp
    ties, same tie-break both engines), the mean is the DECIMAL-exact-sum
    average (operators/exact.py discipline). 100 TB shape: pure partial
    aggregation — rows collapse to ≤ |days| groups before the single
    shuffle, and every function here combines associatively (min_by/max_by
    merge by comparing keys), which is what makes OHLC viable as a
    streaming/update-mode rollup too.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    # seq = microseconds WITHIN the day * 1e7 + event_id: unique and
    # order-preserving inside each day group (the only scope argmin/argmax
    # compare in), and bounded at ~8.6e17 + 1e7 — no int64 overflow at any
    # SF, unlike a global micros*K composite. Order preservation REQUIRES
    # event_id < 1e7 (a larger id bleeds into the next microsecond's
    # keyspace, silently picking the wrong open/close — and the oracle
    # replays the same formula, so equality would not catch it); the
    # inline assert_true makes that precondition fail loudly instead.
    # assert_true returns NULL when the predicate holds, so the coalesce
    # term is a codegen'd no-op 0 on the happy path.
    seq_guard = (
        "coalesce(cast(assert_true(event_id >= 0 AND event_id < 10000000, "
        "'ohlc seq key: event_id outside [0, 1e7) breaks (ts, event_id) "
        "ordering — widen the composite key') AS BIGINT), 0)"
    )
    k = e.select(
        (F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        (
            F.expr("(unix_micros(ts) % 86400000000) * 10000000")
            + F.col("event_id")
            + F.expr(seq_guard)
        ).alias("seq"),
        "value",
    )
    return k.groupBy("day").agg(
        F.min_by("value", "seq").alias("open"),
        F.max("value").cast("double").alias("high"),
        F.min("value").cast("double").alias("low"),
        F.max_by("value", "seq").alias("close"),
        F.count("*").alias("n_trades"),
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
    )


@register(
    "timeseries_interpolate_linear",
    oracle="""
    WITH daily AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s
      FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
             FROM daily GROUP BY user_id),
    grid AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
             FROM span),
    j AS (
      SELECT g.user_id, g.day, d.s,
             last_value(d.s IGNORE NULLS) OVER w_prev AS v_p,
             last_value(CASE WHEN d.s IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER w_prev AS d_p,
             first_value(d.s IGNORE NULLS) OVER w_next AS v_n,
             first_value(CASE WHEN d.s IS NOT NULL THEN g.day END IGNORE NULLS)
               OVER w_next AS d_n
      FROM grid g LEFT JOIN daily d USING (user_id, day)
      WINDOW
        w_prev AS (PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(day AS BIGINT) AS day,
           s IS NOT NULL AS observed,
           CASE WHEN d_n = d_p THEN v_p
                ELSE v_p + (v_n - v_p) *
                     (CAST(day - d_p AS DOUBLE) / CAST(d_n - d_p AS DOUBLE))
           END AS interp_daily_value
    FROM j
    """,
)
def timeseries_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-grid gap fill with LINEAR interpolation: the sibling of
    ``timeseries_gap_fill_locf`` for continuous signals — inactive days
    between two observed days get the straight-line value between them
    (sensor rollups, rate series), observed days keep their exact sum.

    Plan shape — deliberately NOT the oracle's grid-then-join spelling:
    the oracle materializes the full grid and probes observations with a
    left join (which in Spark would rescan the daily aggregate for the
    span side); here each observed day emits its own gap rows from a
    single lead() pair — sequence(day, next_day - 1) — so the whole
    operator is ONE scan, one (user_id, day) aggregation, one user_id
    window pass. Grid ends are observed by construction (gap rows only
    exist between consecutive observations), so interior gaps always
    have both anchors. Float exactness: anchors are DECIMAL-summed then
    cast (bit-identical both engines) and the interpolation is the
    IDENTICAL IEEE expression tree in both dialects — scalar per-row
    arithmetic, no order-dependent float aggregation.
    """
    events = load_table(spark, sf_dir, "events").where(
        # NULL-row hygiene on BOTH engine sides (ADVICE r10): the oracle's
        # LEFT JOIN ... USING never matches a NULL user_id and its
        # `s IS NOT NULL` observed-flag would diverge from the engine's
        # `g == day` on an all-NULL-value day; filtering both keeps the
        # entry well-defined if a future fixture generation adds NULLs
        # (a NULL-value-only day is a GAP, not an observation).
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    daily = events.groupBy(
        "user_id",
        (F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("s")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    paired = daily.select(
        "user_id",
        "day",
        "s",
        F.lead("day").over(w).alias("d_n"),
        F.lead("s").over(w).alias("v_n"),
    )
    g = paired.select(
        "user_id",
        "day",
        "s",
        "d_n",
        "v_n",
        F.explode(
            F.sequence(
                "day", F.coalesce(F.col("d_n") - 1, F.col("day"))
            )
        ).alias("g"),
    )
    frac = (F.col("g") - F.col("day")).cast("double") / (
        F.col("d_n") - F.col("day")
    ).cast("double")
    return g.select(
        "user_id",
        F.col("g").alias("day"),
        (F.col("g") == F.col("day")).alias("observed"),
        F.when(F.col("g") == F.col("day"), F.col("s"))
        .otherwise(F.col("s") + (F.col("v_n") - F.col("s")) * frac)
        .alias("interp_daily_value"),
    )


@register(
    "changepoint_cusum_daily",
    # Integer-exact CUSUM: with daily counts n_i over the T observed days
    # and total N, the statistic S_t = T*prefix_t - t*N is the classic
    # centered cumulative sum multiplied through by T — pure BIGINT
    # arithmetic, so the argmax day is bit-deterministic in both engines
    # (no float running mean, whose summation order would not be).
    oracle="""
    WITH d AS (
      SELECT event_type, epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, day, n,
             count(*) OVER w_all AS t_days,
             sum(n) OVER w_all AS total,
             row_number() OVER w_ord AS t,
             sum(n) OVER w_run AS prefix
      FROM d
      WINDOW
        w_all AS (PARTITION BY event_type),
        w_ord AS (PARTITION BY event_type ORDER BY day),
        w_run AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    stat AS (
      SELECT event_type, day, t_days, total,
             abs(t_days * prefix - t * total) AS s_abs
      FROM s
    )
    SELECT event_type,
           CAST(max(t_days) AS BIGINT) AS n_days,
           CAST(max(total) AS BIGINT) AS n_events,
           CAST(min(CASE WHEN s_abs = ms THEN day END) AS BIGINT)
             AS changepoint_day,
           CAST(max(s_abs) AS BIGINT) AS cusum_stat
    FROM (SELECT *, max(s_abs) OVER (PARTITION BY event_type) AS ms
          FROM stat)
    GROUP BY event_type
    """,
)
def changepoint_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection per event type: the CUSUM statistic over the
    observed daily-count series — the day where the centered cumulative
    sum |T·prefix_t − t·N| peaks is the maximum-likelihood single change
    point of a level shift (Page's cumulative-sum test, the standard
    monitoring primitive for volume regime changes).

    Everything is BIGINT: counts are integers and the running mean is
    multiplied through by the day count, so the statistic and its argmax
    are bit-deterministic under any summation order — the same
    fixed-point discipline as ``graph_pagerank_fixedpoint``. One Exchange
    on event_type; every window and the final aggregation reuse it; output
    is one row per event type. Ties break to the earliest peaking day
    (min day at the max statistic) — the same spelling in both engines.
    """
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .agg(F.count("*").alias("n"))
    )
    w_all = Window.partitionBy("event_type")
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = d.select(
        "event_type",
        "day",
        F.count("*").over(w_all).alias("t_days"),
        F.sum("n").over(w_all).alias("total"),
        F.row_number().over(w_ord).cast("long").alias("t"),
        F.sum("n").over(w_run).alias("prefix"),
    )
    stat = s.select(
        "event_type",
        "day",
        "t_days",
        "total",
        F.abs(
            F.col("t_days") * F.col("prefix") - F.col("t") * F.col("total")
        ).alias("s_abs"),
    )
    stat = stat.withColumn("ms", F.max("s_abs").over(w_all))
    return stat.groupBy("event_type").agg(
        F.max("t_days").alias("n_days"),
        F.max("total").alias("n_events"),
        F.min(F.when(F.col("s_abs") == F.col("ms"), F.col("day"))).alias(
            "changepoint_day"
        ),
        F.max("s_abs").alias("cusum_stat"),
    )


@register(
    "timeseries_rolling_zscore",
    # Rolling anomaly score: each (event_type, observed day)'s count
    # z-scored against the TRAILING window of up to 7 previous observed
    # days (current day excluded — the classic "compare today to last
    # week" monitor). mean/var are built from BIGINT sum/sumsq/count in
    # the IDENTICAL expression order in both dialects (cast -> divide ->
    # multiply -> subtract -> sqrt), so every double — and therefore the
    # NULL-when-degenerate guard (fewer than 2 prior days, or zero
    # variance) — is bit-identical cross-engine.
    oracle="""
    WITH d AS (
      SELECT event_type, epoch_ns(ts) // 1000000000 // 86400 AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, n,
             sum(n)     OVER tw AS s,
             sum(n * n) OVER tw AS ss,
             CAST(count(*) OVER tw AS BIGINT) AS c
      FROM d
      WINDOW tw AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, CAST(day AS BIGINT) AS day, n,
           c AS n_window_days,
           CASE WHEN c >= 2
                 AND (CAST(ss AS DOUBLE) / c
                      - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c)) > 0
                THEN (n - CAST(s AS DOUBLE) / c)
                     / sqrt(CAST(ss AS DOUBLE) / c
                            - (CAST(s AS DOUBLE) / c) * (CAST(s AS DOUBLE) / c))
           END AS zscore
    FROM w
    """,
)
def timeseries_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scoring: per event type, each observed
    day's event count z-scored against the mean/stddev of the previous
    ≤7 observed days — the standard daily-volume monitor (traffic spike
    and outage detection). Distinct from both siblings:
    ``anomaly_zscore_events`` scores individual event VALUES against the
    type's GLOBAL distribution (static outlier count), and
    ``changepoint_cusum_daily`` estimates a single level shift; this is
    the time-LOCAL baseline that catches a spike even in a series whose
    global stats it barely moves. Degenerate windows (under 2 prior
    days, or zero variance) score NULL rather than a fabricated 0.

    One Exchange on ``event_type`` serves the single ordered window pass
    over the pre-aggregated daily frame (≤ types × days rows however
    large the event log — the 100 TB cost is the daily count's map-side-
    combined groupBy, not the window). Population variance from BIGINT
    sum/sumsq keeps the float work to one identical expression tree per
    row in both engines.
    """
    d = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .agg(F.count("*").alias("n"))
    )
    tw = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    )
    w = d.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(tw).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(tw).alias("ss"),
        F.count(F.lit(1)).over(tw).cast("bigint").alias("c"),
    )
    mean = F.col("s").cast("double") / F.col("c")
    var = F.col("ss").cast("double") / F.col("c") - mean * mean
    return w.select(
        "event_type",
        "day",
        "n",
        F.col("c").alias("n_window_days"),
        F.when(
            (F.col("c") >= 2) & (var > 0),
            (F.col("n") - mean) / F.sqrt(var),
        ).alias("zscore"),
    )
