"""Small-file compaction: the third physical-layout pattern.

Streaming sinks, CDC writers and over-parallel jobs leave thousands of
KB-sized parquet files per table; every downstream scan then pays
per-file open/footer/schedule costs that dwarf the data (the classic
"small files problem"). The fix is a periodic compaction job: read the
fragmented layout, coalesce to size-targeted files, atomically swap. At
100 TB this runs per-partition (compact yesterday's directory), driven by
a target file size (128–1024 MB); the operator here is that job in
miniature, with the correctness contract that matters: **compaction must
be a pure physical rewrite — bit-identical table contents**, which the
DuckDB oracle (over the ORIGINAL file) verifies.

Staging conventions match bucketing.py / partitioned.py: keyed by source
content identity, write-to-tmp-then-rename for concurrent sessions.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from .tables import _source_identity, load_table, table_path

# The fixture-scale miniature: fragment events into 64 files, compact
# toward this target size. Real deployments target 128-1024 MB.
_FRAGMENT_FILES = 64
_TARGET_FILE_BYTES = 4 << 20


def _stage(sf_dir: str, tag: str) -> str:
    src = table_path(sf_dir, "events")
    ident = hashlib.sha1(
        f"{os.path.abspath(src)}|{_source_identity(src)}|{tag}".encode()
    ).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"sss_{tag}", ident)


def ensure_fragmented_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage the 'pathological' input: events shattered into 64 files."""
    d = _stage(sf_dir, "fragmented")
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        tmp = f"{d}.tmp-{uuid.uuid4().hex[:8]}"
        load_table(spark, sf_dir, "events").repartition(_FRAGMENT_FILES).write.parquet(
            tmp
        )
        try:
            os.rename(tmp, d)
        except OSError:  # concurrent builder won the race
            shutil.rmtree(tmp, ignore_errors=True)
    return d


def compact(spark: SparkSession, src_dir: str, dst_dir: str) -> str:
    """Compact ``src_dir`` into size-targeted files at ``dst_dir``.

    File count = ceil(input_bytes / target): computed from the source
    files' actual sizes (driver-side listing — metadata, not data), then
    one ``coalesce`` write. ``coalesce`` (not ``repartition``): compaction
    must not pay a shuffle — it narrows existing partitions, so the
    rewrite is scan + write only.
    """
    if not os.path.exists(os.path.join(dst_dir, "_SUCCESS")):
        # Recursive walk (ADVICE r04): a hive-partitioned source keeps its
        # parquet files in subdirectories — a flat listdir would compute
        # total=0 and coalesce everything into one file regardless of size.
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(src_dir)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total // _TARGET_FILE_BYTES))
        tmp = f"{dst_dir}.tmp-{uuid.uuid4().hex[:8]}"
        spark.read.parquet(src_dir).coalesce(int(n_files)).write.parquet(tmp)
        try:
            os.rename(tmp, dst_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    return dst_dir


@register(
    "compact_small_files",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids,
           CAST(sum(CAST(trunc(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fragment events into 64 small files, compact to size-targeted files,
    and prove the rewrite is PURELY physical: the compacted layout's full
    content profile (rows, distinct ids, exact value total, users) matches
    the DuckDB oracle computed over the ORIGINAL single file. File-count
    and size assertions live in tests/test_sources.py.
    """
    frag = ensure_fragmented_events(spark, sf_dir)
    compacted = compact(spark, frag, _stage(sf_dir, "compacted"))
    df = spark.read.parquet(compacted)
    from .tables import with_event_time

    df = with_event_time(df)
    return df.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
        F.sum((F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )
