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
