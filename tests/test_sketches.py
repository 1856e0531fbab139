"""Sketch-operator guarantees the fixture can't exercise: Misra-Gries
eviction on genuinely skewed data, and that the Bloom bitmap actually
prunes the probe side before the exact join."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_states_spark.functions.sketches import (
    _BLOOM_SEEDS,
    bloom_semi_join,
    misra_gries_candidates,
)


def _zipf_rows(n_keys: int, reps_of_rank1: int) -> list[str]:
    """Deterministic Zipf-ish key list: rank r appears ~reps/r times."""
    rows = []
    for r in range(1, n_keys + 1):
        rows.extend([f"k{r:04d}"] * max(reps_of_rank1 // r, 1))
    return rows


@pytest.mark.parametrize("k", [8, 32])
def test_misra_gries_superset_on_skewed_data(spark, k):
    """With k counters forced far below the distinct-key count, eviction
    runs constantly — yet every key with global frequency > N/(k+1) must
    survive in the merged candidate set (the mergeable-summaries bound),
    and the NULL sentinel must carry the exact total."""
    rows = _zipf_rows(n_keys=500, reps_of_rank1=2000)
    df = spark.createDataFrame(pd.DataFrame({"key": rows})).repartition(8)
    sketch = misra_gries_candidates(df, "key", k=k).toPandas()
    total = int(sketch.loc[sketch["key"].isna(), "mg_count"].iloc[0])
    assert total == len(rows)
    candidates = set(sketch.loc[sketch["key"].notna(), "key"])
    exact = pd.Series(rows).value_counts()
    must_survive = set(exact[exact > len(rows) / (k + 1)].index)
    assert must_survive, "test data must contain heavy keys"
    missing = must_survive - candidates
    assert not missing, f"true heavy hitters evicted: {sorted(missing)}"


def test_misra_gries_bounded_output(spark):
    """The merged sketch stays O(partitions x k) however many distinct
    keys stream through — the bounded-memory contract."""
    df = (
        spark.range(0, 20000)
        .select(F.concat(F.lit("u"), F.col("id")).alias("key"))
        .repartition(8)
    )
    sketch = misra_gries_candidates(df, "key", k=16)
    assert sketch.count() <= 8 * (16 + 1) + 1


def test_bloom_prefilter_prunes_before_exact_join(spark):
    """The bitmap must reject (almost all) non-members before the exact
    semi join: count the rows surviving the bit tests alone and require
    a real reduction vs the probe size."""
    probe = spark.range(0, 5000).select(F.col("id").alias("pk"))
    build = spark.range(0, 5000, 50).select(F.col("id").alias("bk"))  # 2%

    joined = bloom_semi_join(probe, "pk", build, "bk")
    got = {r.pk for r in joined.toLocalIterator()}
    assert got == set(range(0, 5000, 50))

    from spark_states_spark.functions.sketches import bloom_prefilter

    n_candidates = bloom_prefilter(probe, "pk", build, "bk").count()
    # 100 members + false positives; with m=2^17, h=3 over 100 keys the fp
    # rate is ~1e-9 — anything beyond a handful of fps means the bitmap
    # is not filtering.
    assert n_candidates <= 120, n_candidates


def test_bloom_seed_family_is_stable():
    """The bitmap and probe sides must derive positions from the same seed
    family — a drifted seed silently turns the filter into a row dropper
    (caught by the oracle, but pin the root cause here)."""
    assert len(set(_BLOOM_SEEDS)) == len(_BLOOM_SEEDS) == 3


def test_hll_rho_case_boundaries(spark):
    """The integer-comparison rho rank must agree with Python bit_length at
    every boundary (powers of two, zero, max 20-bit value) in BOTH engines
    — an off-by-one here shifts register values and silently skews every
    estimate."""
    import duckdb

    from spark_states_spark.functions.sketches import _HLL_WBITS, _rho_case

    ws = [0, 1, 2, 3, (1 << 19) - 1, 1 << 19, (1 << 20) - 1]
    ws += [(1 << k) for k in range(_HLL_WBITS)] + [(1 << k) - 1 for k in range(2, _HLL_WBITS)]

    def py_rho(w):
        return _HLL_WBITS + 1 if w == 0 else _HLL_WBITS - (w.bit_length() - 1)

    con = duckdb.connect()
    try:
        for w in sorted(set(ws)):
            want = py_rho(w)
            got_duck = con.execute(f"SELECT {_rho_case(str(w))}").fetchone()[0]
            got_spark = (
                spark.range(1).selectExpr(f"{_rho_case(str(w))} AS r").collect()[0].r
            )
            assert got_duck == want == got_spark, (w, want, got_duck, got_spark)
    finally:
        con.close()


def test_hll_pow2neg_literals_exact(spark):
    """Every 2^-rho CASE literal must be the exact binary value (5^k/10^k)
    in both engines — a truncated literal biases the harmonic sum."""
    from decimal import Decimal

    import duckdb

    from spark_states_spark.functions.sketches import _HLL_WBITS, _pow2neg_case

    con = duckdb.connect()
    try:
        for r in range(1, _HLL_WBITS + 2):
            want = Decimal(1) / (Decimal(2) ** r)
            got = con.execute(
                f"SELECT CAST({_pow2neg_case(str(r))} AS DECIMAL(38,21))"
            ).fetchone()[0]
            assert Decimal(got) == want, (r, got)
    finally:
        con.close()


def test_misra_gries_bigint_keys_exact_past_2_53(spark):
    """Integer keys above 2^53 must survive the sketch's Arrow crossing
    exactly — a float64-coerced key column would collide adjacent ids."""
    base = 2**53
    ids = [base + i for i in range(8) for _ in range(3)]  # 8 keys x3 each
    df = spark.createDataFrame([(i,) for i in ids], "key bigint")
    sketch = misra_gries_candidates(df, "key", k=16)
    assert dict(sketch.dtypes)["key"] == "bigint"
    got = {r.key for r in sketch.collect() if r.key is not None}
    assert got == set(base + i for i in range(8))
    total = [r.mg_count for r in sketch.collect() if r.key is None]
    assert total == [len(ids)]


# --- Deterministic KLL-style quantile sketch --------------------------------


def _py_kll_reference(rows, shard_of, qs, merge_compact):
    """Bit-by-bit pure-Python mirror of the sketch pipeline (the zorder
    Morton-reference pattern): rows = [(v, i)], shard_of maps (v, i) ->
    sub-stream key. Returns {q_pct: (est_value, est_i, target_rank)}."""
    from collections import defaultdict

    shards = defaultdict(list)
    for v, i in rows:
        shards[shard_of(v, i)].append((v, i))
    survivors = []
    for items in shards.values():
        lvl = sorted(items)
        for _ in range(2):  # two keep-odd compactions per sub-stream
            lvl = lvl[::2]  # ranks 1,3,5,... (1-based odd)
        survivors.extend(lvl)
    weight = 4
    survivors.sort()
    if merge_compact:
        survivors = survivors[::2]
        weight = 8
    n = len(rows)
    out = {}
    for q in qs:
        target = -((-q * n) // 100)  # ceil(q*n/100)
        idx = -(-target // weight) - 1  # first survivor with cw >= target
        v, i = survivors[idx]
        out[q] = (v, i, target)
    return out


def test_kll_sketch_matches_python_reference(spark):
    """The Spark pipeline's estimates equal a pure-Python replay of the
    identical deterministic compaction on the same rows — pins that the
    windows implement keep-odd-under-(v,i) exactly, independent of the
    DuckDB oracle."""
    import hashlib

    from spark_states_spark.functions.sketches import (
        _KLL_QS,
        _KLL_SHARDS,
        _kll_quantile_frame,
        _kll_survivors,
    )

    rows = [(float((j * 37) % 1009) + 0.25, j) for j in range(2000)]
    base = spark.createDataFrame(
        [(v, i, int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
          % _KLL_SHARDS) for v, i in rows],
        "v double, i bigint, shard int",
    )
    got = {
        r.q_pct: (r.est_value, r.target_rank)
        for r in _kll_quantile_frame(
            spark, base, _kll_survivors(base).select("v", "i"), weight=4
        ).collect()
    }
    ref = _py_kll_reference(
        rows,
        shard_of=lambda v, i: int(
            hashlib.md5(str(i).encode()).hexdigest()[:8], 16
        )
        % _KLL_SHARDS,
        qs=_KLL_QS,
        merge_compact=False,
    )
    assert got == {q: (v, t) for q, (v, _i, t) in ref.items()}


def test_kll_sketch_rank_error_within_bound(spark, sf_dir):
    """The deterministic keep-odd drift is one-directional, so the BOUND
    is the guarantee: <= 3 weight-units per sub-stream + final weight
    quantization, over n. Checked on the fixture for both entries, with
    the sub-stream count taken from the data."""
    from spark_states_spark.functions.sketches import (
        _KLL_SHARDS,
        sketch_quantile_kll,
        sketch_quantile_merge_daily,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = events.count()
    n_days = events.selectExpr(
        "count(distinct unix_timestamp(ts) div 86400) AS d"
    ).first().d

    for fn, n_streams, weight in (
        (sketch_quantile_kll, _KLL_SHARDS, 4),
        (sketch_quantile_merge_daily, n_days, 8),
    ):
        bound = (3 * n_streams + weight + (4 if weight == 8 else 0)) / n
        out = fn(spark, sf_dir).collect()
        assert len(out) == 5
        worst = max(r.rank_err_frac for r in out)
        assert worst <= bound, f"{fn.__name__}: {worst} > bound {bound}"
        # estimates are monotone in q (a total-order sketch cannot invert)
        by_q = sorted((r.q_pct, r.est_value) for r in out)
        vals = [v for _, v in by_q]
        assert vals == sorted(vals)
        # audit columns are self-consistent: est_rank is a true rank
        for r in out:
            assert 1 <= r.est_rank <= n


def _py_kmv_reference(sets, k):
    """Pure-Python replay of the KMV pair estimator over integer-hash
    sets: bottom-k per set, union-threshold Jaccard + union-size
    estimates — the exact arithmetic the Spark kernel must reproduce."""
    out = {}
    names = sorted(sets)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ska, skb = set(sorted(sets[a])[:k]), set(sorted(sets[b])[:k])
            u = sorted(ska | skb)
            kk = min(k, len(u))
            kth = u[kk - 1]
            m = sum(1 for h in ska & skb if h <= kth)
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            out[(a, b)] = (
                m / kk,
                inter / union,
                abs(m / kk - inter / union),
                float(kk - 1) * float(1 << 60) / float(kth),
                union,
            )
    return out


def test_kmv_kernel_matches_python_reference(spark):
    """Exact-equality differential: three synthetic integer-hash sets
    (sized above k so the sketch path is non-degenerate) through the
    Spark kernel vs the pure-Python estimator — all five output columns
    bit-equal, pinning the two-tier bottom-k, the union ranking and the
    single-op IEEE estimate arithmetic."""
    import random

    from spark_states_spark.functions.sketches import _KMV_K, kmv_pair_estimates

    rng = random.Random(42)
    universe = rng.sample(range(1, 1 << 60), 4000)
    sets = {
        "a": set(universe[:1500]),
        "b": set(universe[800:2600]),  # overlaps a
        "c": set(universe[2400:4000]),  # overlaps b, barely a
    }
    assert all(len(s) > _KMV_K for s in sets.values())
    rows = [(t, h) for t, hs in sets.items() for h in hs]
    base = spark.createDataFrame(rows, "t string, h bigint")
    got = {
        (r.type_a, r.type_b): (
            r.kmv_jaccard,
            r.exact_jaccard,
            r.jaccard_abs_err,
            r.kmv_union,
            r.exact_union,
        )
        for r in kmv_pair_estimates(base).collect()
    }
    assert got == _py_kmv_reference(sets, _KMV_K)


def test_kmv_array_kernel_equals_two_tier(spark):
    """r15 (VERDICT r14 #5): the array-algebra pair kernel must be
    row-identical to the pre-r15 two-tier-window spelling — on sets above
    k (sketch path live) AND below k (degenerate kk=|union| path), with a
    disjoint pair included (m = 0, left-join n_inter coalesce)."""
    import random

    from spark_states_spark.functions.sketches import (
        _KMV_K,
        _kmv_pair_estimates_two_tier,
        kmv_pair_estimates,
    )

    rng = random.Random(7)
    universe = rng.sample(range(1, 1 << 60), 3000)
    sets = {
        "big_a": set(universe[:1200]),
        "big_b": set(universe[700:1900]),
        "small": set(universe[1900:1950]),  # below k
        "lonely": set(universe[2000:2100]),  # disjoint from small
    }
    assert any(len(s) > _KMV_K for s in sets.values())
    assert any(len(s) < _KMV_K for s in sets.values())
    rows = [(t, h) for t, hs in sets.items() for h in hs]
    base = spark.createDataFrame(rows, "t string, h bigint")

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    new = snap(kmv_pair_estimates(base))
    old = snap(_kmv_pair_estimates_two_tier(base))
    assert new == old


def test_kmv_is_exact_below_k(spark):
    """When every set fits inside k, the sketch IS the set: the Jaccard
    estimate must equal the exact Jaccard bit-for-bit (kk = |union|,
    m = |intersection|) — the estimator's degenerate-case contract."""
    from spark_states_spark.functions.sketches import _KMV_K, kmv_pair_estimates

    sets = {
        "x": set(range(1000, 1100)),
        "y": set(range(1050, 1150)),
    }
    assert all(len(s) < _KMV_K for s in sets.values())
    rows = [(t, h) for t, hs in sets.items() for h in hs]
    base = spark.createDataFrame(rows, "t string, h bigint")
    row = kmv_pair_estimates(base).collect()[0]
    assert row.kmv_jaccard == row.exact_jaccard
    assert row.jaccard_abs_err == 0.0


def test_kmv_fixture_error_within_bound(spark, sf_dir):
    """On the fixture (5 types, ~16k-element user-day sets, true J ~0.2),
    k = 256 gives sigma ~ 1/sqrt(k) ~ 0.06 on the Jaccard — assert a
    generous 2-sigma-ish band plus a 20% relative band on the union-size
    estimate, guarding estimator wiring rather than tuning luck."""
    from spark_states_spark.functions.sketches import sketch_kmv_jaccard

    rows = sketch_kmv_jaccard(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) type pairs
    for r in rows:
        assert r.jaccard_abs_err <= 0.12, (r.type_a, r.type_b, r.jaccard_abs_err)
        rel = abs(r.kmv_union - r.exact_union) / r.exact_union
        assert rel <= 0.20, (r.type_a, r.type_b, rel)
