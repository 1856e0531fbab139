"""Storage-layout scale levers: bucketed joins and partition pruning.

These pin the two write-side techniques the operator docstrings lean on
for 100 TB deployments:

- **bucketing** (`bucketBy` on the join key): both sides pre-hashed into
  the same bucket count → the sort-merge join runs with NO Exchange on
  either side. At scale this converts every recurring fact⋈fact join from
  a full shuffle into a local merge.
- **partitioned layout + pruning** (`partitionBy` on a derived cell/date
  column): a filter on the partition column must show up as a
  PartitionFilters entry on the scan, reading only matching directories —
  the batch analogue of an index probe (used by the IVF ANN design).
"""

import uuid

import pytest
from pyspark.sql import functions as F

from spark_states_spark.plans import plan_str
from spark_states_spark.sources import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Force non-broadcast joins so the Exchange behavior is observable."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path, no_broadcast):
    suffix = uuid.uuid4().hex[:8]
    lt, ot = f"li_b_{suffix}", f"o_b_{suffix}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    try:
        # External tables under tmp_path (warehouse dir is a static conf).
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
            "path", str(tmp_path / lt)
        ).saveAsTable(lt)
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
            "path", str(tmp_path / ot)
        ).saveAsTable(ot)
        joined = spark.table(lt).join(
            spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = plan_str(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
        # Same join over raw (unbucketed) parquet must shuffle both sides —
        # proving the layout, not the optimizer, removed the Exchange.
        raw = load_table(spark, sf_dir, "lineitem").join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert "Exchange" in plan_str(raw)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {ot}")


def test_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_type")
    events = load_table(spark, sf_dir, "events")
    events.write.partitionBy("event_type").parquet(path)
    one = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    p = plan_str(one)
    scan = p[p.index("Scan parquet") :]
    assert "PartitionFilters" in scan
    assert "purchase" in scan[scan.index("PartitionFilters") :].splitlines()[0]
    n_all = events.count()
    n_one = one.count()
    assert 0 < n_one < n_all
