"""Distributed 2-D skyline (Pareto frontier) query.

The skyline of (minimize x, maximize y): rows not DOMINATED by any other
(q dominates p iff q.x ≤ p.x AND q.y ≥ p.y with at least one strict).
The naive formulation is a quadratic NOT-EXISTS self-join; the classic
distributed algorithm is two-phase:

1. **Local prune** — partition the data (here: by x-range bucket), compute
   each partition's local skyline with a sort-free window sweep: order by
   (x asc, y desc); a row survives iff no PRECEDING row has y ≥ its y.
   Every globally-dominated row is locally dominated by its dominator's
   bucket-mate or survives to phase 2 — local pruning never removes a
   global skyline row (dominance is preserved under subsetting).
2. **Final pass** — the same sweep over the union of local skylines, which
   is small (each bucket contributes a staircase, typically O(√n) rows),
   as the sanctioned bounded single-partition window.

The oracle runs the quadratic NOT EXISTS — a different algorithm whose
agreement verifies both the sweep logic and the two-phase decomposition.

Tie semantics: duplicate (x, y) points do not dominate each other, so ALL
copies of a skyline point are skyline rows in both formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

_SKY_BUCKETS = 32


def _sweep(df: DataFrame, part_cols: list[str]) -> DataFrame:
    """One skyline sweep: within each partition, order by (x asc, y desc)
    and keep rows whose y strictly exceeds every PRECEDING row's y — with
    the duplicate-(x,y) exception: copies of the current best survive.

    Correctness of the frame: a preceding row q has (q.x < x) OR
    (q.x = x AND q.y >= y). If q.y > y, q dominates (strict in y or x).
    If q.y = y and q.x < x, q dominates (strict in x). If q.y = y and
    q.x = x, q is a duplicate — NOT dominating. So p survives iff
    max-preceding-y < y, or max-preceding-y = y and that max comes only
    from duplicates of p itself — equivalently, no preceding row with
    y >= p.y AND (x < p.x OR y > p.y). One pass tracks both: the running
    max y and the running max y among STRICTLY-smaller-x rows.
    """
    w = (
        W.partitionBy(*part_cols)
        .orderBy(F.col("x").asc(), F.col("y").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # max y over preceding rows with strictly smaller x: preceding rows
    # with equal x are exactly those with y >= current y (sort order), so
    # track them separately via a max over (x < current) — expressed as
    # the max of y where the row's x differs from the current row's x.
    # Window functions can't reference the current row in the frame
    # condition, so use two running maxes keyed by x-change: max y so far
    # (any x) and max y so far per... simpler: lag-based approach fails
    # similarly. Use the pair (max_prev_y, min_x_at_max). A preceding row
    # dominates iff prev_y > y, OR (prev_y == y AND its x < x). Track
    # max(struct(y, -x)): the best preceding candidate — struct ordering
    # compares y first, then -x (larger = smaller x).
    best_prev = F.max(F.struct(F.col("y"), (-F.col("x")).alias("nx"))).over(w)
    return (
        df.withColumn("bp", best_prev)
        .where(
            F.col("bp").isNull()
            | (F.col("bp.y") < F.col("y"))
            | ((F.col("bp.y") == F.col("y")) & (-F.col("bp.nx") == F.col("x")))
        )
        .drop("bp")
    )


@register(
    "skyline_parts_2d",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice AS x, CAST(p.p_size AS BIGINT) AS y
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def skyline_parts_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts (cheapest price, largest size): two-phase
    distributed skyline — per-bucket window sweep prunes locally, a final
    bounded sweep over the surviving staircases closes it. The oracle's
    quadratic NOT EXISTS verifies the sweep + decomposition end to end.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("x"),
        F.col("p_size").cast("long").alias("y"),
    )
    ext = part.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        (F.col("hi") - F.col("lo")) / _SKY_BUCKETS
    )
    bucketed = part.crossJoin(F.broadcast(ext)).select(
        "p_partkey",
        "x",
        "y",
        F.least(
            F.floor((F.col("x") - F.col("lo")) / width), F.lit(_SKY_BUCKETS - 1)
        ).alias("bucket"),
    )
    local = _sweep(bucketed, ["bucket"])
    # Final pass: one sweep over the union of staircases (bounded small).
    final = _sweep(local.withColumn("g", F.lit(0)), ["g"])
    return final.select("p_partkey", "x", "y")
