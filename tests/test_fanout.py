"""Scale-adaptive scan fan-out (optimization r14, guide §2.6/§8).

The driver's fixtures are single-row-group parquet files, so every scan
plans exactly one non-empty task and per-row-heavy expression work (md5
per k-gram position, stoplist scans, dot products) runs serially however
many cores the box has. ``load_table_fanned`` repartitions ONLY when the
source's native split count (its row-group count — the parquet scan's
smallest schedulable unit) is below what the row count warrants, so at
production scale (many row groups ≥ cores) it is a structural no-op.
"""

import os

from pyspark.sql import functions as F

from spark_states_spark.sources import load_table, load_table_fanned
from spark_states_spark.sources.tables import parquet_split_count, table_path


def test_fanned_scan_gets_parallelism(spark, sf_dir):
    """On a single-row-group fixture, the fanned load must plan more
    partitions than the plain scan (which is stuck at one per row group)."""
    plain = load_table(spark, sf_dir, "documents")
    fanned = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    n_plain = plain.rdd.getNumPartitions()
    n_fanned = fanned.rdd.getNumPartitions()
    cores = spark.sparkContext.defaultParallelism
    assert n_plain == parquet_split_count(table_path(sf_dir, "documents"))
    assert n_fanned > n_plain
    assert n_fanned <= cores


def test_fanned_rows_identical(spark, sf_dir):
    """Fan-out must not change WHAT the scan returns — same multiset."""
    plain = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fanned = load_table_fanned(spark, sf_dir, "documents", key="doc_id").select(
        "doc_id", "text"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, fanned.collect())
    )


def test_fanout_noop_when_native_splits_suffice(spark, sf_dir, tmp_path):
    """The production contract: a source whose native split count already
    covers the warranted parallelism gets NO repartition (no Exchange in
    the plan) — the helper must never add an exchange at scale."""
    src = load_table(spark, sf_dir, "documents")
    many = str(tmp_path / "documents.parquet")
    n_rows = src.count()
    cores = spark.sparkContext.defaultParallelism
    # Write enough part files that native splits >= any warranted target.
    src.repartition(max(cores, 2)).write.parquet(many)
    n_files = len([f for f in os.listdir(many) if f.endswith(".parquet")])
    assert n_files >= min(cores, max(1, n_rows // 32))

    fanned = load_table_fanned(spark, str(tmp_path), "documents", key="doc_id")
    plan = fanned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_fanout_keyed_exchange_subsumes_downstream_groupby(spark, sf_dir):
    """Hash fan-out on the groupBy key must leave exactly ONE exchange in
    the aggregation plan — the fan-out's own — not two (guide §2.4:
    operations keyed the same way share one exchange)."""
    fanned = load_table_fanned(spark, sf_dir, "documents", key="doc_id")
    agg = fanned.groupBy("doc_id").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
