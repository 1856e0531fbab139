"""Pinned equivalence for the Arrow-crossing measurement pair.

`user_gap_median` (grouped-Pandas) was demoted from the bench headline and
the scale probe in r09 (VERDICT r08 #2: its crossing-cost measurement vs
the JVM sibling is recorded in BASELINE.md). This pin keeps the demoted
spelling directly tested — the two entries must stay value-identical, or
the recorded crossing-cost table stops describing one semantics.
"""

from spark_states_spark.catalog import ORACLES, QUERIES


def test_gap_median_pair_value_identical(spark, sf_dir_small):
    pandas_rows = sorted(
        tuple(r) for r in QUERIES["user_gap_median"](spark, sf_dir_small).collect()
    )
    builtin_rows = sorted(
        tuple(r)
        for r in QUERIES["user_gap_median_builtin"](spark, sf_dir_small).collect()
    )
    assert pandas_rows, "empty gap-median result on the small fixture"
    assert pandas_rows == builtin_rows
    # Same oracle by construction — drift here would silently fork the pair.
    assert ORACLES["user_gap_median"] == ORACLES["user_gap_median_builtin"]
