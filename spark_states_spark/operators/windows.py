"""Window-function operator catalog.

Analytic functions over partitioned, ordered frames. Every ordering includes
a unique tiebreak key (o_orderkey / l_orderkey+l_linenumber) so results are
fully deterministic and oracle-comparable. At scale the partition key is the
shuffle key — one exchange serves all window functions sharing the spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table
from .exact import dec2


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice AS totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (classic top-k per group)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            "rn",
        )
    )


@register(
    "window_running_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue per customer over order history.

    Decimal-exact running sum (DuckDB's windowed double sum uses a segment
    tree — different summation order than Spark's sequential frame scan).
    """
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "window_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS INT) AS days_since_prev
    FROM orders
    """,
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days between consecutive orders per customer (null for first)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


@register(
    "window_rank_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(rank()       OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           CAST(ntile(4)     OVER (PARTITION BY l_returnflag
                                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS INT) AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank (ties allowed) + ntile with deterministic order."""
    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_quantity")
    wt = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order
    FROM orders
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over a full-partition frame."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w).alias("last_order"),
        )
        .distinct()
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY epoch(o_orderdate)
                      RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS spend_90d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: per-customer trailing-90-day spend. Unlike a
    ROWS frame, the boundary is a value predicate on the ordering key, so
    same-timestamp rows aggregate identically regardless of tie order —
    deterministic by construction (and decimal-exact)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("spend_90d"),
    )


@register(
    "segment_customers_rfm",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS n_orders,
             sum(CAST(o_totalprice AS DECIMAL(14,2))) AS spend_dec
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, n_orders,
             CAST(spend_dec AS DOUBLE) AS spend,
             ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS r,
             ntile(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f,
             ntile(4) OVER (ORDER BY spend_dec DESC, o_custkey) AS m
      FROM per_cust
    )
    SELECT concat('R', r, 'F', f, 'M', m) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(spend AS DECIMAL(16,2))) AS DOUBLE) AS segment_spend
    FROM scored
    GROUP BY 1
    """,
)
def segment_customers_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores for Recency (last order
    date), Frequency (order count) and Monetary (total spend), composed
    into a segment label with per-segment size and spend.

    Determinism: each ntile orders by (metric, o_custkey) — a total order,
    so quartile boundaries are identical cross-engine; spend aggregates go
    through exact DECIMAL. Scale note: the three global ntiles sort the
    PER-CUSTOMER aggregate (|customers| rows, not |orders|); a 100 TB
    deployment replaces global ntile with approx quantile cutpoints
    broadcast back, trading exact quartiles for a sort-free plan — the
    exact version stays as the oracle-checkable reference.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("spend_dec"),
    )
    scored = per_cust.select(
        "o_custkey",
        "n_orders",
        F.col("spend_dec").cast("double").alias("spend"),
        F.ntile(4).over(W.orderBy(F.desc("last_order"), F.asc("o_custkey"))).alias("r"),
        F.ntile(4).over(W.orderBy(F.desc("n_orders"), F.asc("o_custkey"))).alias("f"),
        F.ntile(4).over(W.orderBy(F.desc("spend_dec"), F.asc("o_custkey"))).alias("m"),
    )
    return scored.groupBy(
        F.concat(F.lit("R"), "r", F.lit("F"), "f", F.lit("M"), "m").alias("segment")
    ).agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("spend").cast("decimal(16,2)")).cast("double").alias("segment_spend"),
    )


@register(
    "window_distribution_family",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice AS totalprice,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey)
    ) WHERE pr >= 0.99
    """,
)
def window_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist: the distribution window functions, kept
    to the top percentile per order priority.

    Determinism: the window orders by (o_totalprice, o_orderkey) — a
    total order, so every row's rank is unique cross-engine; percent_rank
    = (rank-1)/(n-1) and cume_dist = rows≤current/n are then single
    integer divisions, bit-identical in both engines, and the pr >= 0.99
    boundary filter compares identical doubles. One shuffle on the
    partition key serves both functions.
    """
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .filter(F.col("pr") >= 0.99)
    )
