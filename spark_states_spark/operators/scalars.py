"""Scalar-function catalog: string / date / math / conditional / JSON.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on this path. Oracle SQL uses
the DuckDB spelling of the same function where dialects differ (noted
inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                              AS brand_upper,
           lower(p_type)                               AS type_lower,
           CAST(length(p_name) AS INT)                 AS name_len,
           substring(p_name, 1, 8)                     AS name_prefix,
           concat(p_brand, '#', p_type)                AS brand_type,
           replace(p_name, ' ', '_')                   AS name_snake,
           reverse(p_brand)                            AS brand_rev,
           regexp_replace(p_name, '[aeiou]', '', 'g')  AS name_novowel,
           CAST(strpos(p_type, 'BRASS') AS INT)        AS brass_pos
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part.

    DuckDB dialect notes: regexp_replace needs the 'g' flag to match Spark's
    replace-all; Spark ``instr`` == DuckDB ``strpos``.
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.instr(F.col("p_type"), "BRASS").alias("brass_pos"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)        AS yr,
           CAST(quarter(o_orderdate) AS INT)     AS qtr,
           CAST(month(o_orderdate) AS INT)       AS mon,
           CAST(day(o_orderdate) AS INT)         AS dom,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
           CAST(weekofyear(o_orderdate) AS INT)  AS woy,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over orders.

    Dialect note: Spark dayofweek is 1=Sunday..7; DuckDB dayofweek is
    0=Sunday..6, hence the +1 in the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "plus30"
        ),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                 AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)       AS qty_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           sqrt(l_extendedprice)                  AS price_sqrt,
           round(ln(l_extendedprice + 1), 6)      AS price_ln,
           l_quantity * l_quantity                AS qty_sq,
           power(2.0, l_linenumber)               AS pow2_line,
           CAST(l_partkey % 97 AS BIGINT)         AS pk_mod,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           greatest(l_tax, l_discount)            AS max_rate,
           least(l_tax, l_discount)               AS min_rate
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over lineitem.

    Per-row IEEE arithmetic and sqrt are bit-deterministic → raw outputs.
    ln is not correctly-rounded across libms → rounded to 6. pow is
    exercised on exact powers of two (bit-exact in any libm).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pow2_line"),
        (F.col("l_partkey") % 97).alias("pk_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 150000 THEN 'high'
                WHEN o_totalprice >= 50000  THEN 'mid'
                ELSE 'low' END              AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CAST(CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                     THEN 1 ELSE 0 END AS INT) AS is_urgent
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / LIKE."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "high")
        .when(F.col("o_totalprice") >= 50000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        (
            F.col("o_orderpriority").like("1-%")
            | F.col("o_orderpriority").like("2-%")
        )
        .cast("int")
        .alias("is_urgent"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
    FROM events
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             list(l_linenumber ORDER BY l_linenumber, l_quantity) AS lns,
             list(CAST(l_quantity AS BIGINT)
                  ORDER BY l_linenumber, l_quantity) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(lns) AS INT) AS n_lines,
           array_to_string(lns, ',') AS line_numbers,
           CAST(qtys[1] AS BIGINT) AS first_qty,
           CAST(list_max(qtys) AS BIGINT) AS max_qty,
           CAST(list_sum(list_transform(qtys, q -> q * q)) AS BIGINT) AS sum_qty_sq,
           CAST(len(list_filter(qtys, q -> q >= 25)) AS INT) AS n_large
    FROM per_order
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over per-order lineitem collections: collect →
    sort → index/max/transform/aggregate/filter, all JVM higher-order
    expressions (no Python). collect_list order is pinned by sorting on
    (line number, quantity) — line numbers repeat in this fixture, so the
    secondary key makes the order total (up to identical pairs) and the
    results deterministic despite shuffle order."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("bigint").alias("q")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "q"))
        ).alias("pairs")
    )
    return per_order.selectExpr(
        "l_orderkey",
        "CAST(size(pairs) AS INT) AS n_lines",
        "concat_ws(',', transform(pairs, p -> cast(p.l_linenumber as string))) AS line_numbers",
        "pairs[0].q AS first_qty",
        "array_max(transform(pairs, p -> p.q)) AS max_qty",
        "aggregate(transform(pairs, p -> p.q), 0L, (acc, q) -> acc + q * q) AS sum_qty_sq",
        "CAST(size(filter(pairs, p -> p.q >= 25)) AS INT) AS n_large",
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS INT) AS n_types,
           CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)
                AS BIGINT) AS n_clicks,
           CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
                AS BIGINT) AS n_errors
    FROM events GROUP BY user_id
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: per-user event counters built as a real
    MapType column (collect → map_from_entries → size/element_at), with
    only flat scalars emitted — map column serialization order is
    engine-specific, so the values, not the container, are the contract.
    The oracle states the same semantics in plain ANSI SQL."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("counts")
    )
    return with_map.select(
        "user_id",
        F.size("counts").cast("int").alias("n_types"),
        F.coalesce(F.element_at("counts", F.lit("click")), F.lit(0))
        .cast("bigint")
        .alias("n_clicks"),
        F.coalesce(F.element_at("counts", F.lit("error")), F.lit(0))
        .cast("bigint")
        .alias("n_errors"),
    )
