"""Source/sink round-trips: every batch format preserves the data."""

import pytest

from spark_states_spark.sources import load_table
from spark_states_spark.sources.formats import BATCH_FORMATS, read_table, write_table


@pytest.mark.parametrize("fmt", BATCH_FORMATS)
def test_roundtrip_preserves_rows(spark, sf_dir, fmt, tmp_path):
    src = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_text_formats_require_schema(spark, tmp_path, fmt):
    with pytest.raises(ValueError, match="schema"):
        read_table(spark, str(tmp_path), fmt)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unsupported"):
        read_table(spark, str(tmp_path), "avro")


def test_compaction_reduces_file_count_without_shuffle(spark, sf_dir):
    """Compaction must actually merge files toward the size target, and its
    plan must be scan+write only (coalesce, no Exchange)."""
    import os

    from spark_states_spark.sources.compaction import (
        _TARGET_FILE_BYTES,
        _stage,
        compact,
        ensure_fragmented_events,
    )

    frag = ensure_fragmented_events(spark, sf_dir)
    n_frag = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    assert n_frag == 64

    compacted = compact(spark, frag, _stage(sf_dir, "compacted"))
    files = [f for f in os.listdir(compacted) if f.endswith(".parquet")]
    assert len(files) < n_frag / 4, f"barely compacted: {len(files)} files"
    total = sum(os.path.getsize(os.path.join(compacted, f)) for f in files)
    # each output file is within 2x of target on average (parquet encoding
    # changes sizes, so the bound is loose but catches a broken coalesce)
    assert total / len(files) <= 2 * _TARGET_FILE_BYTES

    # plan shape: narrowing only — no shuffle in the compaction read+write
    df = spark.read.parquet(frag).coalesce(2)
    assert "Exchange" not in df._jdf.queryExecution().executedPlan().toString()
