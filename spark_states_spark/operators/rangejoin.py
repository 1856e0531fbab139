"""Bucketed range (band) join: BETWEEN predicates as equi-joins.

A range join — probe value BETWEEN range.lo AND range.hi — has no equi
key, so engines fall back to nested-loop/cartesian plans that die at
scale (Spark's only native accelerations are broadcast-range hints on
tiny sides). The standard distributed fix is RANGE BUCKETING: quantize
the value domain into fixed-width buckets, explode each range into the
buckets it overlaps, compute each probe's single bucket, equi-join on
bucket id, and re-verify the exact BETWEEN as a residual filter. Each
(range, probe) pair meets in exactly one bucket (the probe's), so no
dedup is needed; the join is a plain shuffled/broadcast HASH join and
skew is handled by AQE like any other equi-join.

Bucket width trades explode factor against join selectivity: width ≈
median range span keeps the per-range explode at ~2-3 rows while the
bucket key still prunes almost all non-overlapping pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

_BUCKET_W = 64.0  # price units; part bands span ~90-200 units → ~2-4 buckets


@register(
    "range_band_join",
    oracle="""
    SELECT p.p_partkey AS band_id,
           CAST(count(*) AS BIGINT) AS n_in_band,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_in_band
    FROM part p
    JOIN lineitem l
      ON l.l_extendedprice BETWEEN p.p_retailprice * 0.95
                               AND p.p_retailprice * 1.05
    GROUP BY p.p_partkey
    """,
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-band membership: for each part's ±5% retail-price band, how
    many lineitems priced inside it — a pure BETWEEN (non-equi) join,
    executed as a bucketed EQUI-join: ranges explode into ~2-4 overlapped
    buckets, probes compute one bucket, hash-join on bucket id, exact
    BETWEEN residual. The oracle runs the naive range join; value equality
    proves the bucketing is complete (no band/probe pair missed at bucket
    boundaries) and non-duplicating (each pair meets in exactly one
    bucket).
    """
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("band_id"),
        (F.col("p_retailprice") * 0.95).alias("lo"),
        (F.col("p_retailprice") * 1.05).alias("hi"),
    )
    ranges = part.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / _BUCKET_W).cast("long"),
                F.floor(F.col("hi") / _BUCKET_W).cast("long"),
            )
        ).alias("bucket"),
    )
    probes = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").alias("qty"),
        F.floor(F.col("l_extendedprice") / _BUCKET_W).cast("long").alias("bucket"),
    )
    joined = probes.join(ranges, "bucket").where(
        (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_in_band"),
        F.sum(F.col("qty").cast("long")).alias("qty_in_band"),
    )
