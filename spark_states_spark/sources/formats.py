"""Multi-format batch sources/sinks: parquet, ORC, CSV, JSON (+ streaming).

The reference has no sources or sinks of its own (it sits below them at the
state-store SPI); this module is the engine's I/O surface for users whose
corpora arrive in other formats. Everything funnels through Spark's native
readers/writers so the scan keeps vectorization and, for the columnar
formats, predicate pushdown + column pruning.

Format guidance encoded here (and enforced by explicit schemas):
- **parquet/orc** — columnar, splittable, self-describing: the storage
  formats. All engine tables default to parquet.
- **csv/json** — interchange only. Text rows mean no pushdown, no pruning,
  full-file parsing cost; both readers REQUIRE an explicit schema here
  because schema inference is an extra full pass over 100 TB (and JSON
  inference silently widens types). Convert to parquet at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BATCH_FORMATS = ("parquet", "orc", "csv", "json")

_CSV_OPTS = {"header": "true", "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` to ``path`` in ``fmt`` (overwrite)."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {BATCH_FORMATS}")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.options(**_CSV_OPTS)
    elif fmt == "json":
        writer = writer.options(**_JSON_OPTS)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats (csv/json) require ``schema``."""
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {BATCH_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt in ("csv", "json"):
        if schema is None:
            raise ValueError(
                f"{fmt} requires an explicit schema: inference is a second full "
                "pass over the data and type-unstable at scale"
            )
        reader = reader.schema(schema)
        reader = reader.options(**(_CSV_OPTS if fmt == "csv" else _JSON_OPTS))
    elif schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
