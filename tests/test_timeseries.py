"""Linear-interpolation gap fill: semantic checks beyond the oracle gate."""

from decimal import Decimal

import pytest


@pytest.fixture(scope="module")
def interp_rows(spark, sf_dir):
    from spark_states_spark.operators.timeseries import (
        timeseries_interpolate_linear,
    )

    return timeseries_interpolate_linear(spark, sf_dir).collect()


def _daily_sums(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_states_spark.sources import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            (F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("s")
        )
        .collect()
    )
    return {(r.user_id, r.day): r.s for r in rows}


def test_interp_observed_days_keep_exact_sums(spark, sf_dir, interp_rows):
    daily = _daily_sums(spark, sf_dir)
    observed = [r for r in interp_rows if r.observed]
    assert observed, "fixture has observed days"
    for r in observed:
        assert r.interp_daily_value == daily[(r.user_id, r.day)]


def test_interp_gaps_are_linear_between_anchors(spark, sf_dir, interp_rows):
    """Every gap value must equal the python recompute of the same IEEE
    expression from its surrounding anchors, and grid ends are observed."""
    daily = _daily_sums(spark, sf_dir)
    by_user = {}
    for r in interp_rows:
        by_user.setdefault(r.user_id, []).append(r)
    n_gaps = 0
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.day)
        assert rows[0].observed and rows[-1].observed
        days = [r.day for r in rows]
        assert days == list(range(days[0], days[-1] + 1))  # dense grid
        obs_days = [r.day for r in rows if r.observed]
        for r in rows:
            if r.observed:
                continue
            n_gaps += 1
            d_p = max(d for d in obs_days if d < r.day)
            d_n = min(d for d in obs_days if d > r.day)
            v_p, v_n = daily[(user, d_p)], daily[(user, d_n)]
            expect = v_p + (v_n - v_p) * ((r.day - d_p) / (d_n - d_p))
            assert r.interp_daily_value == expect
    assert n_gaps > 0, "fixture exercises at least one gap"


def test_cusum_python_recompute(spark, sf_dir):
    """The integer CUSUM statistic and its earliest-peak argmax must equal
    a pure-python recompute over the observed daily series."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from spark_states_spark.catalog import QUERIES
    from spark_states_spark.sources import load_table

    got = {
        r.event_type: (r.n_days, r.n_events, r.changepoint_day, r.cusum_stat)
        for r in QUERIES["changepoint_cusum_daily"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.day] = r.n
    for g, by_day in series.items():
        days = sorted(by_day)
        t_days, total = len(days), sum(by_day.values())
        prefix, best = 0, None
        for t, day in enumerate(days, start=1):
            prefix += by_day[day]
            s = abs(t_days * prefix - t * total)
            if best is None or s > best[0]:
                best = (s, day)
        assert got[g] == (t_days, total, best[1], best[0])
        # the statistic is exactly 0 at t = T (prefix == total)
        assert t_days * total - t_days * total == 0
