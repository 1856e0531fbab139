"""The replay-order guard (_assert_event_id_ts_monotone) after the r06
rewrite: the global scope now uses a bucketed range decomposition (parallel
partitioned windows + a per-bucket boundary check) instead of a single-task
global-order window. These tests pin that the decomposition still catches
both violation shapes — an inversion inside one event_id bucket and an
inversion visible only across bucket boundaries — and passes clean data."""

import pytest

from pyspark.sql import functions as F

from spark_states_spark.streaming import queries as sq


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, us). Writes a minimal events.parquet."""
    df = spark.createDataFrame(rows, "event_id long, us long").select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.fixture(autouse=True)
def _clear_memo():
    sq._SEQ_ORDER_CHECKED.clear()
    yield
    sq._SEQ_ORDER_CHECKED.clear()


def test_global_guard_passes_monotone_ids_across_buckets(spark, tmp_path):
    rows = [(1, 10), (2, 20), (3, 30), (70000, 40), (70001, 50)]
    d = _write_events(spark, tmp_path, rows)
    sq._assert_event_id_ts_monotone(spark, d, scope="global")  # no raise


def test_global_guard_catches_within_bucket_inversion(spark, tmp_path):
    rows = [(1, 10), (2, 30), (3, 20)]  # all in bucket 0; id 3 goes back
    d = _write_events(spark, tmp_path, rows)
    with pytest.raises(AssertionError, match="inverted"):
        sq._assert_event_id_ts_monotone(spark, d, scope="global")


def test_global_guard_catches_cross_bucket_inversion(spark, tmp_path):
    # Each bucket is internally monotone, but bucket 1 (ids >= 65536)
    # starts EARLIER than bucket 0 ends — only the boundary check sees it.
    rows = [(1, 10), (2, 50), (70000, 30), (70001, 60)]
    d = _write_events(spark, tmp_path, rows)
    with pytest.raises(AssertionError, match="inverted"):
        sq._assert_event_id_ts_monotone(spark, d, scope="global")


def test_within_second_scope_ignores_cross_second_interleaving(spark, tmp_path):
    # ids interleave across seconds (the adversarial funnel fixture shape)
    # but never invert within one second: within_second passes, global fails.
    rows = [(1, 1_000_000), (3, 1_500_000), (2, 2_000_000), (4, 2_500_000)]
    d = _write_events(spark, tmp_path, rows)
    sq._assert_event_id_ts_monotone(spark, d, scope="within_second")
    sq._SEQ_ORDER_CHECKED.clear()
    with pytest.raises(AssertionError, match="inverted"):
        sq._assert_event_id_ts_monotone(spark, d, scope="global")
