"""Data-quality operators: column profiling, referential integrity, range
constraint audits.

The validation pass every 100 TB ingestion runs before anything downstream
trusts the data. All three shapes are single-scan: the per-column /
per-check metrics are computed in ONE aggregate over the table and then
unpivoted driver-side-free with ``stack`` — never one scan per metric
(11 checks × 100 TB = the difference between one pass and eleven).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..sources import load_table

# Columns profiled per kind. Numeric (and timestamp-as-epoch-micros) columns
# report min/max as DOUBLE — bigint/epoch values are < 2^53 so the double is
# exact; string columns report lexicographic min/max (fixture is ASCII, so
# Java-UTF8 and DuckDB binary collation agree). Doubles are NEVER cast to
# string (decimal-vs-exponent formatting diverges across engines).
_NUM_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
)
_STR_COLS = ("l_returnflag", "l_linestatus")
_TS_COLS = ("l_shipdate",)


@register(
    "profile_lineitem_columns",
    oracle=" UNION ALL ".join(
        [
            f"""
            SELECT '{c}' AS column_name,
                   CAST(count({c}) AS BIGINT) AS n_nonnull,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(min({c}) AS DOUBLE) AS min_num,
                   CAST(max({c}) AS DOUBLE) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str
            FROM lineitem
            """
            for c in _NUM_COLS
        ]
        + [
            f"""
            SELECT '{c}', CAST(count({c}) AS BIGINT),
                   CAST(count(DISTINCT {c}) AS BIGINT),
                   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                   min({c}), max({c})
            FROM lineitem
            """
            for c in _STR_COLS
        ]
        + [
            f"""
            SELECT '{c}', CAST(count({c}) AS BIGINT),
                   CAST(count(DISTINCT {c}) AS BIGINT),
                   CAST(epoch_ns(min({c})) // 1000 AS DOUBLE),
                   CAST(epoch_ns(max({c})) // 1000 AS DOUBLE),
                   CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
            FROM lineitem
            """
            for c in _TS_COLS
        ]
    ),
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem — non-null count, distinct count, min/max
    per column — computed in a SINGLE aggregate pass and unpivoted with
    ``stack``.

    Scale notes: the multi-column ``count(DISTINCT ...)`` makes Catalyst
    plan an Expand (one input row replicated per distinct aggregate) —
    still one scan, but the expand factor is the column count; a 100 TB
    profiler swaps exact distincts for ``approx_count_distinct`` (HLL,
    no expand) and keeps this exact version for audit samples. The DuckDB
    oracle is the naive 11-branch UNION ALL — matching it proves the
    single-pass unpivot computes the same profile.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _NUM_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    for c in _STR_COLS:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__smin"),
            F.max(c).alias(f"{c}__smax"),
        ]
    for c in _TS_COLS:
        # The fixture's shipdate is TIMESTAMP_NTZ; the UTC session makes the
        # TIMESTAMP cast value-preserving (sources/tables.py convention).
        ts = F.col(c).cast("timestamp")
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.unix_micros(F.min(ts)).cast("double").alias(f"{c}__min"),
            F.unix_micros(F.max(ts)).cast("double").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    # stack() takes FLAT per-row argument groups, not tuples (parenthesized
    # groups would parse as structs, whose differing field names fail type
    # coercion).
    branches = []
    for c in _NUM_COLS + _TS_COLS:
        branches.append(
            f"'{c}', {c}__nn, {c}__nd, {c}__min, {c}__max, "
            "CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in _STR_COLS:
        branches.append(
            f"'{c}', {c}__nn, {c}__nd, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), {c}__smin, {c}__smax"
        )
    n = len(branches)
    return one.selectExpr(
        f"stack({n}, {', '.join(branches)}) AS "
        "(column_name, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)"
    )


_FK_CHECKS = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


@register(
    "audit_referential_integrity",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{name}' AS relation,
               CAST((SELECT count(*) FROM {child} c
                     WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                       WHERE p.{pk} = c.{fk})) AS BIGINT)
                 AS n_orphans
        """
        for name, child, fk, parent, pk in _FK_CHECKS
    ),
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key audit across the whole star schema: for each edge,
    the number of child rows whose key has no parent (anti join count).

    Each check is a LEFT ANTI join — the parent side is a dimension (or a
    key projection of one), so Catalyst broadcasts it and the fact table
    never shuffles; six checks are six independent broadcast-anti scans
    unioned into one report. A healthy warehouse reports all zeros — the
    point is the audit runs cheaply enough to gate every ingest batch.
    """
    frames = []
    for name, child, fk, parent, pk in _FK_CHECKS:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(pk)
        orphans = c.join(p, c[fk] == p[pk], "left_anti")
        frames.append(
            orphans.agg(F.count("*").alias("n_orphans")).select(
                F.lit(name).alias("relation"), "n_orphans"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


_RANGE_CHECKS = (
    ("quantity_nonpositive", "l_quantity <= 0"),
    ("discount_out_of_range", "l_discount < 0 OR l_discount > 1"),
    ("tax_negative", "l_tax < 0"),
    ("price_nonpositive", "l_extendedprice <= 0"),
    ("shipdate_null", "l_shipdate IS NULL"),
    ("returnflag_invalid", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("linestatus_invalid", "l_linestatus NOT IN ('O', 'F')"),
)


@register(
    "audit_value_ranges",
    oracle=f"""
    WITH one AS (
      SELECT
        {', '.join(f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS c{i}"
                   for i, (_, cond) in enumerate(_RANGE_CHECKS))}
      FROM lineitem
    )
    {' UNION ALL '.join(f"SELECT '{name}' AS check_name, c{i} AS n_violations FROM one"
                        for i, (name, _) in enumerate(_RANGE_CHECKS))}
    """,
)
def audit_value_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/domain constraint audit over lineitem: violation counts for
    every business rule (non-positive quantities/prices, discounts outside
    [0,1], invalid enum values, null ship dates) in ONE scan — each check
    is a conditional sum in the same aggregate, unpivoted with ``stack``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.sum(F.when(F.expr(cond), 1).otherwise(0)).cast("bigint").alias(f"c{i}")
        for i, (_, cond) in enumerate(_RANGE_CHECKS)
    ]
    one = li.agg(*aggs)
    branches = ", ".join(
        f"'{name}', c{i}" for i, (name, _) in enumerate(_RANGE_CHECKS)
    )
    return one.selectExpr(
        f"stack({len(_RANGE_CHECKS)}, {branches}) AS (check_name, n_violations)"
    )
