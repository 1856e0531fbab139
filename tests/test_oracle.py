"""Oracle-differential tests: every catalog query with an oracle must match
DuckDB on sf0.01 — the same gate the driver runs (CORRECTNESS_r{N}.json)."""

import os

import pytest

from spark_states_spark.catalog import ORACLES, QUERIES

from .oracle_utils import compare, duckdb_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01_DIFF") != "1",
    reason="scale-up differential (~13 min); opt in with SPARK_GRAFT_SF01_DIFF=1",
)
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_differential_sf01(spark, name):
    """Scale-up differential: the same oracle gate at sf0.1 — 10× the
    driver's correctness scale. A query whose plan or numeric discipline
    only holds at small data (decimal overflow, candidate explosion,
    rank-boundary drift) fails here first. The full catalog (157 oracle
    entries) passed this at sf0.1 in ~15.5 min on local[32] (2026-08-14,
    round-4 end); env-gated so the default suite stays fast."""
    con = duckdb_con("/root/testdata/sf0.1")
    try:
        probs = compare(QUERIES[name](spark, "/root/testdata/sf0.1"), con, ORACLES[name])
        assert not probs, f"{name}: {probs}"
    finally:
        con.close()
