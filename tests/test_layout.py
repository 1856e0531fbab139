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


def test_zorder_morton_reference_values():
    """python_z16 against hand-computed Morton codes."""
    from spark_states_spark.sources.zorder import python_z16

    assert python_z16(0, 0) == 0
    assert python_z16(1, 0) == 1      # d1 occupies even bit positions
    assert python_z16(0, 1) == 2      # d2 occupies odd bit positions
    assert python_z16(255, 255) == 65535
    assert python_z16(3, 5) == 39     # spread(3)=5, spread(5)=17 -> 5|34


def test_zorder_clustering_matches_python_recompute(spark, sf_dir):
    """Bucket assignment + bounding boxes must equal a python Morton
    recompute over the fixture, and every bucket's box must sit inside
    ONE 4x4 tile of the (day, user) plane — the locality guarantee that
    makes z-order footer stats prunable in BOTH dimensions (16 aligned
    z-codes = exactly a 4x4 tile)."""
    from spark_states_spark.catalog import QUERIES
    from spark_states_spark.sources import load_table
    from spark_states_spark.sources.zorder import python_z16

    got = {
        r.bucket: (r.n_rows, r.day_lo, r.day_hi, r.user_lo, r.user_hi)
        for r in QUERIES["layout_zorder_clustering"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull())
        .selectExpr(
            "unix_micros(ts) div 1000000 div 86400 as day", "user_id"
        )
        .collect()
    )
    ref = {}
    for r in rows:
        d1, d2 = r.day & 255, r.user_id & 255
        b = python_z16(d1, d2) >> 4
        n, dlo, dhi, ulo, uhi = ref.get(b, (0, 255, 0, 255, 0))
        ref[b] = (n + 1, min(dlo, d1), max(dhi, d1), min(ulo, d2), max(uhi, d2))
    assert got == ref
    for b, (_, dlo, dhi, ulo, uhi) in got.items():
        assert dlo // 4 == dhi // 4, f"bucket {b} crosses a day tile"
        assert ulo // 4 == uhi // 4, f"bucket {b} crosses a user tile"


def test_zorder_extreme_ids_match_python_and_oracle(spark, tmp_path):
    """Adversarial id values (negative, > 2^32, exact mask boundaries):
    the low-byte masking and Morton interleave must agree bit-for-bit
    across Spark, DuckDB, and the python reference — two's-complement &
    has the same semantics in all three."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_states_spark.catalog import ORACLES, QUERIES
    from spark_states_spark.sources.zorder import python_z16
    from tests.oracle_utils import canonicalize

    users = [-1, -256, -255, 0, 255, 256, 2**40 + 123, -(2**40) - 7, 97]
    t0_us = 1704067200 * 1_000_000
    t = pa.table(
        {
            "event_id": pa.array(range(1, len(users) + 1), pa.int64()),
            "ts": pa.array(
                [t0_us + i * 86400_000_000 for i in range(len(users))],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * len(users), pa.string()),
            "value": pa.array([1.0] * len(users), pa.float64()),
            "props": pa.array(["{}"] * len(users), pa.string()),
        }
    )
    d = str(tmp_path / "zx")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    sdf = QUERIES["layout_zorder_clustering"](spark, d)
    srows = [tuple(r) for r in sdf.collect()]
    # python reference
    ref = {}
    for i, u in enumerate(users):
        day = (t0_us // 1_000_000 // 86400 + i) & 255
        du = u & 255
        b = python_z16(day, du) >> 4
        n, dlo, dhi, ulo, uhi = ref.get(b, (0, 255, 0, 255, 0))
        ref[b] = (n + 1, min(dlo, day), max(dhi, day),
                  min(ulo, du), max(uhi, du))
    assert {r[0]: tuple(r[1:]) for r in srows} == ref
    # DuckDB oracle on the same fixture
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        res = con.execute(ORACLES["layout_zorder_clustering"])
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(ocols)
    assert canonicalize(sdf.columns, srows) == canonicalize(ocols, orows)
