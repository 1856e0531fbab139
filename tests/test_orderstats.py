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
