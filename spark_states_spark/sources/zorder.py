"""Z-order (Morton) multi-dimensional clustering: the fourth
physical-layout pattern.

A single-key sort (bucketing.py, partitioned.py) gives perfect min/max
pruning on ONE dimension and none on any other: sort events by day and
every file spans the full user range, so a user-predicate scan reads
everything. Interleaving the bits of two keys (the Morton/Z curve) makes
file-level min/max bounds tight in BOTH dimensions at once — the layout
behind Delta Lake's ``OPTIMIZE ZORDER BY`` and ClickHouse/DB2 multi-dim
clustering. At 100 TB the operator is a pure projection (compute the
z-value) + a range repartition on it before the write; scans with a
predicate on EITHER dimension then prune most files by footer stats.

The catalog entry computes the z-assignment and the per-z-bucket bounding
boxes — the pruning evidence itself: each bucket's (day, user) box is a
small tile of the 2-D space, which is exactly what makes the footer
min/max stats selective. Everything is exact integer bit arithmetic,
spelled per dialect by ``_spread_sql`` (Spark ``shiftleft`` / DuckDB
``<<``) so the oracle verifies bit-identical codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from .tables import load_table

# 8 bits per dimension -> 16-bit Morton code; buckets of 16 codes each
# model "files" (4096 of them over the 65536-cell space; each bucket's
# 16 aligned codes cover exactly one 4x4 tile of the 2-D plane).
_DIM_BITS = 8
_DIM_MASK = (1 << _DIM_BITS) - 1
_BUCKET_SHIFT = 4


def _spread_sql(x: str, shift) -> str:
    """The classic 8-bit bit-spread (x -> bits in even positions), as SQL
    text: three (x | x<<k) & mask rounds. ``shift(expr, n)`` spells the
    dialect's left shift — Spark has shiftleft(), DuckDB has <<; the
    masks/ors are the same tokens in both."""
    out = f"({x} & {_DIM_MASK})"
    for k, mask in ((4, 0x0F0F), (2, 0x3333), (1, 0x5555)):
        out = f"(({out} | {shift(out, k)}) & {mask})"
    return out


def _z_sql(d1: str, d2: str, shift) -> str:
    """16-bit Morton interleave of two 8-bit dims (d2 in odd positions)."""
    return f"({_spread_sql(d1, shift)} | {shift(_spread_sql(d2, shift), 1)})"


_SPARK_SHIFT = lambda e, n: f"shiftleft({e}, {n})"  # noqa: E731
_DUCK_SHIFT = lambda e, n: f"({e} << {n})"  # noqa: E731

# The two clustering dimensions, identical SQL in both dialects once the
# timestamp spelling is fixed: low 8 bits of the epoch day and of user_id.
_SPARK_D1 = "(unix_micros(ts) div 1000000 div 86400)"
_DUCK_D1 = "(epoch_ns(ts) // 1000000000 // 86400)"
_D2 = "user_id"


def python_z16(d1: int, d2: int) -> int:
    """Reference Morton-16 implementation for tests: bit-by-bit."""
    z = 0
    for i in range(_DIM_BITS):
        z |= ((d1 >> i) & 1) << (2 * i)
        z |= ((d2 >> i) & 1) << (2 * i + 1)
    return z


@register(
    "layout_zorder_clustering",
    oracle=f"""
    WITH z AS (
      SELECT {_z_sql(f"({_DUCK_D1} & {_DIM_MASK})", f"({_D2} & {_DIM_MASK})", _DUCK_SHIFT)} AS zv,
             {_DUCK_D1} & {_DIM_MASK} AS d_day,
             {_D2} & {_DIM_MASK} AS d_user
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT CAST(zv >> {_BUCKET_SHIFT} AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(d_day) AS BIGINT) AS day_lo,
           CAST(max(d_day) AS BIGINT) AS day_hi,
           CAST(min(d_user) AS BIGINT) AS user_lo,
           CAST(max(d_user) AS BIGINT) AS user_hi
    FROM z GROUP BY 1
    """,
)
def layout_zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering assignment + per-bucket bounding boxes over
    events, on (epoch-day, user) low bytes: each output row is one
    z-bucket ("file") with its row count and its min/max extent in BOTH
    dimensions — the footer stats a z-ordered layout would expose to
    scan pruning. By the Z curve's locality, every bucket's box is a
    small tile (≤16-cell z-range ⊂ a ~4×4 tile), so a predicate on
    EITHER day or user prunes most buckets; contrast with the
    single-key layouts (``bucketed_join_no_shuffle``,
    ``partitioned_scan_prune``, ``compact_small_files``), whose files
    are tight in one dimension and full-width in the other.

    Scale shape: the z-value is a pure codegen'd bit-arithmetic
    projection (zero Python, zero joins); the bucket stats are one
    map-side-combinable aggregate over ≤4096 groups. In a real write
    path the same expression feeds ``repartitionByRange(z)`` before the
    sink — the assignment computed here IS the layout decision, and the
    aggregate is its audit.
    """
    z_expr = _z_sql(
        f"({_SPARK_D1} & {_DIM_MASK})", f"({_D2} & {_DIM_MASK})", _SPARK_SHIFT
    )
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .select(
            F.expr(z_expr).alias("zv"),
            F.expr(f"{_SPARK_D1} & {_DIM_MASK}").alias("d_day"),
            F.expr(f"{_D2} & {_DIM_MASK}").alias("d_user"),
        )
    )
    return (
        e.groupBy(
            F.expr(
                f"CAST(shiftright(zv, {_BUCKET_SHIFT}) AS BIGINT)"
            ).alias("bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("d_day").cast("bigint").alias("day_lo"),
            F.max("d_day").cast("bigint").alias("day_hi"),
            F.min("d_user").cast("bigint").alias("user_lo"),
            F.max("d_user").cast("bigint").alias("user_hi"),
        )
    )
