"""Hot-bucket salting (functions/skew.py): a deliberately hot bucket must
be split across multiple bounded block tasks, and the salted pair set must
equal the naive self-join exactly (each pair once, none lost)."""

import math

from pyspark.sql import functions as F

from spark_states_spark.functions.skew import salted_pair_join, with_triangle_blocks

_CAP = 40
_HOT_N = 300  # one bucket with 300 rows -> s = ceil(300/40) = 8 blocks


def _fixture(spark):
    """One hot bucket (300 ids) + two cold buckets."""
    hot = [("hot", i) for i in range(_HOT_N)]
    cold = [("c1", 1000 + i) for i in range(5)] + [("c2", 2000 + i) for i in range(3)]
    return spark.createDataFrame(hot + cold, "bucket string, id long")


def test_triangle_blocks_split_hot_bucket(spark):
    df = _fixture(spark)
    t = with_triangle_blocks(df, ["bucket"], "id", cap=_CAP)
    s = math.ceil(_HOT_N / _CAP)
    tasks = (
        t.filter(F.col("bucket") == "hot")
        .groupBy("_bi", "_bj")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # The hot bucket fans out over all s(s+1)/2 block pairs — no single
    # task sees the whole bucket.
    assert len(tasks) == s * (s + 1) // 2
    assert max(r["n"] for r in tasks) < _HOT_N
    # Per-task load is bounded by ~2 blocks ≈ 2·cap (hash salting wobble
    # allowed), the no-straggler guarantee.
    assert max(r["n"] for r in tasks) <= 4 * _CAP
    # Cold buckets pass through exactly once, unsalted.
    cold = t.filter(F.col("bucket") != "hot")
    assert cold.count() == 8
    assert cold.select("_bi", "_bj").distinct().collect() == [
        type(cold.first())(_bi=0, _bj=0)
    ] or cold.filter((F.col("_bi") != 0) | (F.col("_bj") != 0)).count() == 0


def test_static_bound_skips_salting_machinery(spark):
    """Tier-1 adaptivity: an exact caller bound ≤ cap must produce the
    pass-through plan — constant cold-block columns and NO explode — while
    a bound > cap must still engage the probe/salting path for the hot
    bucket."""
    df = _fixture(spark)
    # cap ≥ any group: skip everything (bound here = total rows, exact).
    t = with_triangle_blocks(df, ["bucket"], "id", cap=400, max_group_bound=308)
    assert "Generate" not in t._jdf.queryExecution().optimizedPlan().toString()
    assert t.filter((F.col("_salt") != 0) | (F.col("_bi") != 0) | (F.col("_bj") != 0)).count() == 0
    assert t.count() == 308
    # bound above cap: the hot bucket is still split.
    t2 = with_triangle_blocks(df, ["bucket"], "id", cap=_CAP, max_group_bound=308)
    assert t2.filter(F.col("_bj") != 0).count() > 0
    # pair results agree between the two paths on the same data at cap≥max.
    p1 = {(r.id_a, r.id_b) for r in salted_pair_join(df, "bucket", "id", 400, 308).collect()}
    p2 = {(r.id_a, r.id_b) for r in salted_pair_join(df, "bucket", "id", 400).collect()}
    assert p1 == p2


def test_salted_pair_join_exact_once(spark):
    df = _fixture(spark)
    pairs = salted_pair_join(df, "bucket", "id", cap=_CAP)
    rows = [(r["bucket"], r["id_a"], r["id_b"]) for r in pairs.collect()]
    # Exactly once: no duplicates even before any distinct().
    assert len(rows) == len(set(rows))
    # Equals the naive self-join pair set.
    a, b = df.alias("a"), df.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select("a.bucket", F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .collect()
    )
    assert set(rows) == {(r["bucket"], r["id_a"], r["id_b"]) for r in naive}
    assert len(rows) == _HOT_N * (_HOT_N - 1) // 2 + 5 * 4 // 2 + 3 * 2 // 2
