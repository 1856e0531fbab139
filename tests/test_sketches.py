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
