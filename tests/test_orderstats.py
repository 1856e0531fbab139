"""Differential tests for the histogram-narrowed exact median: cases the
lineitem fixture can't produce (odd N, heavy duplicates, all-equal,
adversarial clustering) against a true sorted median."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_states_spark.operators.orderstats import exact_median


def _true_median(vals):
    s = sorted(vals)
    n = len(s)
    if n % 2 == 1:
        return float(s[n // 2])
    return (s[n // 2 - 1] + s[n // 2]) / 2.0


def _run(spark, vals):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [float(x) for x in vals]})
    ).repartition(8)
    row = exact_median(df).collect()[0]
    return row.n, row.median


@pytest.mark.parametrize(
    "vals",
    [
        [1.0, 2.0, 3.0],                       # odd N
        [1.0, 2.0, 3.0, 4.0],                  # even N, midpoint interpolated
        [5.0] * 7,                             # all equal (zero bin width)
        [5.0] * 6,                             # all equal, even
        [1.0] * 100 + [2.0],                   # duplicates straddling the middle
        [0.0, 1e9],                            # extreme spread, N=2
        list(range(1024)),                     # one value per bin boundary
    ],
)
def test_exact_median_known_cases(spark, vals):
    n, med = _run(spark, vals)
    assert n == len(vals)
    assert med == _true_median(vals)


def test_exact_median_random_differential(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = rng.randrange(50, 4000)
        # Cluster values so many collide into the same bins — the in-bin
        # rank resolution must disambiguate.
        vals = [round(rng.gauss(0, 1), 2) for _ in range(n)]
        got_n, got_med = _run(spark, vals)
        assert got_n == n
        assert got_med == _true_median(vals), f"trial {trial} n={n}"


def test_grouped_median_matches_per_group_truth(spark, tmp_path):
    """The grouped catalog entry vs per-group sorted medians on synthetic
    groups of different sizes, parities and value ranges — staged as an
    events-layout fixture so the REAL registered query runs."""
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_states_spark.catalog import QUERIES

    rng = random.Random(5)
    rows = []
    truth = {}
    for g, (n, lo, hi) in enumerate(
        [(7, 0, 1), (100, -50, 50), (101, 1e6, 2e6), (1, 3, 3), (2, 0, 10)]
    ):
        vals = [round(rng.uniform(lo, hi), 3) for _ in range(n)]
        truth[f"g{g}"] = (n, _true_median(vals))
        rows += [(f"g{g}", v) for v in vals]

    t = pa.table(
        {
            "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
            "ts": pa.array([1704067200_000000] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path / "gmed_fixture")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))

    got = {
        r.event_type: (r.n, r.median_value)
        for r in QUERIES["exact_median_by_group"](spark, d).collect()
    }
    assert got == truth


def test_winsorized_mean_python_recompute(spark, sf_dir):
    """Bounds and clipped mean must equal a pure-python recompute with the
    explicit rank spec (ceil(0.1n)/ceil(0.9n) order statistics)."""
    from decimal import ROUND_HALF_UP, Decimal

    from spark_states_spark.catalog import QUERIES
    from spark_states_spark.sources import load_table

    got = {
        r.event_type: r
        for r in QUERIES["agg_winsorized_mean"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r.event_type, []).append(r.value)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        plo = vals[(n + 9) // 10 - 1]
        phi = vals[(9 * n + 9) // 10 - 1]
        assert got[g].n == n
        assert got[g].p10 == plo
        assert got[g].p90 == phi
        dec = lambda v: Decimal(repr(min(max(v, plo), phi))).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
        total = sum(dec(v) for v in vals)
        assert got[g].winsorized_mean == float(total) / n
        # robustness invariant: clip bounds bracket the mean
        assert plo <= got[g].winsorized_mean <= phi


def _mad_truth(vals):
    med = _true_median(vals)
    devs = [abs(v - med) for v in vals]
    mad = _true_median(devs)
    return len(vals), med, mad, sum(1 for d in devs if d > 3.0 * mad)


def test_mad_outliers_python_recompute(spark, sf_dir):
    """Median / MAD / fence counts must equal a pure-python recompute per
    event type on the real fixture."""
    from spark_states_spark.catalog import QUERIES
    from spark_states_spark.sources import load_table

    got = {
        r.event_type: (r.n, r.median_value, r.mad, r.n_outliers)
        for r in QUERIES["anomaly_mad_outliers"](spark, sf_dir).collect()
    }
    by_g = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("event_type", "value")
        .collect()
    ):
        by_g.setdefault(r.event_type, []).append(r.value)
    assert got == {g: _mad_truth(vals) for g, vals in by_g.items()}


def test_mad_outliers_catches_masked_cluster(spark, tmp_path):
    """The adversarial case the entry exists for: a cluster of identical
    extreme values inflates sigma enough that the z-score fence (mean ±
    3σ) MISSES all of them — masking — while the MAD fence flags every
    one. Known answers on a synthetic events fixture, plus edge groups
    (clean odd-n, even-n interpolated median, n=1)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_states_spark.catalog import QUERIES

    groups = {
        # 10 inliers at 10.0 + 3 masked extremes: median 10, MAD 0 ->
        # the 3 extremes exceed the 0-width fence; z-score: mean 238.5,
        # sigma ~407 -> 3-sigma fence ~1461 misses all three.
        "masked": [10.0] * 10 + [1000.0] * 3,
        "clean_odd": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
        "even": [1.0, 2.0, 3.0, 4.0],
        "single": [42.0],
    }
    expected = {g: _mad_truth(v) for g, v in groups.items()}
    assert expected["masked"][3] == 3  # the masking scenario is real
    import statistics

    m = groups["masked"]
    mu, sd = statistics.mean(m), statistics.pstdev(m)
    assert all(abs(v - mu) <= 3 * sd for v in m)  # z-score finds NOTHING
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    t = pa.table(
        {
            "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
            "ts": pa.array([1704067200_000000] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([r[1] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path / "mad_fixture")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = {
        r.event_type: (r.n, r.median_value, r.mad, r.n_outliers)
        for r in QUERIES["anomaly_mad_outliers"](spark, d).collect()
    }
    assert got == expected
