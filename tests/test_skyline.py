"""Two-phase skyline vs brute-force dominance on adversarial point sets:
duplicates, x-ties, y-ties, staircases, and random clouds."""

import random

import pandas as pd
import pytest

from spark_states_spark.operators.skyline import _sweep


def _brute(points):
    out = []
    for i, (x, y) in enumerate(points):
        dominated = any(
            (qx <= x and qy >= y and (qx < x or qy > y))
            for j, (qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _spark_skyline(spark, points):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame(points, columns=["x", "y"]).astype({"x": "float64", "y": "int64"})
    ).repartition(4)
    # same two-phase composition the catalog entry uses, on raw points
    bucketed = df.withColumn("bucket", (F.col("x") * 7).cast("int") % 5)
    local = _sweep(bucketed, ["bucket"])
    final = _sweep(local.withColumn("g", F.lit(0)), ["g"])
    return sorted((r.x, r.y) for r in final.select("x", "y").collect())


@pytest.mark.parametrize(
    "points",
    [
        [(1.0, 5), (2.0, 4), (3.0, 3)],            # pure staircase: all skyline
        [(1.0, 5), (1.0, 5), (2.0, 4)],            # duplicate skyline point
        [(1.0, 5), (1.0, 4)],                      # x-tie: higher y wins
        [(1.0, 5), (2.0, 5)],                      # y-tie: lower x wins
        [(1.0, 1), (2.0, 2), (3.0, 3)],            # anti-staircase: one survivor
        [(1.0, 3)] * 4,                            # all identical
    ],
)
def test_skyline_known_cases(spark, points):
    assert _spark_skyline(spark, points) == _brute(points)


def test_skyline_random_differential(spark):
    rng = random.Random(11)
    for trial in range(3):
        pts = [
            (round(rng.uniform(0, 10), 1), rng.randrange(0, 20))
            for _ in range(rng.randrange(30, 300))
        ]
        assert _spark_skyline(spark, pts) == _brute(pts), f"trial {trial}"
