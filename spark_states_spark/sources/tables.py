"""Batch and streaming readers over the driver's parquet tables.

The driver generates TPC-H-ish tables plus ``events`` (streaming fixture),
``documents`` (text ops) and ``embeddings`` (similarity ops) at
``/root/testdata/sf*/``. Schemas are recorded in FIXTURES.md.

Design note (100 TB mindset): all readers go through ``spark.read.parquet``
so Catalyst gets predicate pushdown / column pruning / vectorized scan for
free. Streaming reads use ``readStream`` with an explicit schema (required
by the file source) — no sampling-based inference on the hot path.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The events fixture's ``ts`` physical type has varied across driver testdata
# generations: TIMESTAMP(NANOS) (read as int64 under
# spark.sql.legacy.parquet.nanosAsLong=true) or TIMESTAMP(MICROS) (read as
# TIMESTAMP_NTZ). ``with_event_time`` normalizes every layout to a session-TZ
# TimestampType (µs) — the session runs in UTC, so the NTZ cast is
# value-preserving and matches DuckDB's epoch view of the same file.


def with_event_time(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to TimestampType, whatever the layout."""
    from pyspark.sql import functions as F

    dtype = df.schema["ts"].dataType
    if isinstance(dtype, T.LongType):  # legacy nanos-as-long layout
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dtype, T.TimestampNTZType):  # micros layout (UTC session)
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _parquet_files(path: str):
    """Yield every ``*.parquet`` under ``path``, recursing into
    subdirectories (ADVICE r14: the flat listdir reported 0 rows / 0
    splits for hive-partitioned or nested layouts, silently no-opping the
    fan-out and corrupting the row-count metadata other callers rely on).
    Raises for a directory containing NO parquet files — a caller probing
    one is pointing at the wrong path, and 0 would propagate as a silently
    wrong sizing everywhere downstream."""
    found = False
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                found = True
                yield os.path.join(root, f)
    if not found:
        raise FileNotFoundError(f"no *.parquet files under {path!r}")


def parquet_row_count(path: str) -> int:
    """Exact row count from parquet FOOTER metadata — no Spark job, no data
    read (ADVICE r09: the KV drains ran a full ``load_table(...).count()``
    scan per memo-miss solely to pick their sink/partition knobs). Handles
    a single fixture file, a directory of part files (the scale probe's
    Spark-written replicas), and nested/hive-partitioned layouts
    (ADVICE r14)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        return sum(pq.read_metadata(f).num_rows for f in _parquet_files(path))
    return pq.read_metadata(path).num_rows


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = with_event_time(df)
    return df


# Fan-out sizing: target one task per ~this many rows, capped at the
# session's core count. Small because the call sites are the CPU-heavy
# per-row operators (md5 over every k-gram position, stoplist scans,
# dense-vector dot products) where even a few dozen rows per task amortize
# the scheduling overhead many times over.
_FANOUT_ROWS_PER_TASK = 32


def parquet_split_count(path: str, cap: int = 1 << 10) -> int:
    """Parquet's NATIVE parallelism floor for ``path``: the number of row
    groups (a row group is the smallest schedulable scan split — a
    single-row-group file yields one non-empty task no matter how
    ``maxPartitionBytes``/``openCostInBytes`` slice it). For a directory,
    sums across part files, short-circuiting at ``cap`` so a large staged
    replica never pays a full metadata sweep just to learn it is already
    parallel enough."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        total = 0
        for f in _parquet_files(path):
            total += pq.read_metadata(f).num_row_groups
            if total >= cap:
                return total
        return total
    return pq.read_metadata(path).num_row_groups


def load_table_fanned(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str | None = None,
    rows_per_task: int = _FANOUT_ROWS_PER_TASK,
) -> DataFrame:
    """``load_table`` plus a scale-adaptive map-side fan-out for
    compute-bound operators (optimization guide §2.6/§8: the per-task work
    is the bottleneck, not the bytes).

    The driver's fixtures are single-row-group parquet files, so every scan
    plans ONE non-empty task and per-row-heavy expression work (md5 per
    k-gram position, regex passes, per-row dot products) runs serially on a
    32-core box. When — and only when — the source's native split count is
    below what the row count warrants, repartition to
    ``min(cores, rows / rows_per_task)``:

    - ``key`` given: hash-partition on it. Downstream groupBy/window on the
      same key then satisfies its ClusteredDistribution from this exchange
      (no second shuffle), and hash partitioning skips round-robin's
      sort-before-repartition pass.
    - no ``key``: round-robin (pure projections with no downstream shuffle).

    At production scale this is a structural NO-OP: a 100 TB table has
    orders of magnitude more row groups than cores, so the metadata check
    short-circuits and no exchange is added. The knob is the generic
    parallelism floor, not a local[32] constant — ``defaultParallelism``
    is executor cores on a real cluster. Adds one parquet-footer metadata
    read (no Spark job); results are row-identical (the driver's compare is
    order-insensitive; every ordered operator downstream declares its own
    ordering)."""
    df = load_table(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    path = table_path(sf_dir, name)
    try:
        n_rows = parquet_row_count(path)
        native = parquet_split_count(path, cap=cores)
    except Exception:
        return df  # unreadable metadata — never fail the query for a hint
    target = min(cores, max(1, n_rows // rows_per_task))
    if native >= target or target <= 1:
        return df
    if key is not None:
        from pyspark.sql import functions as F

        return df.repartition(target, F.col(key))
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _stream_dir(path: str) -> str:
    """Stage a single parquet file behind a directory for the file stream
    source (which requires a directory input). A stable symlink dir in /tmp,
    keyed by the absolute path; the symlink resolves by path at read time,
    so it follows the driver's in-place regeneration of testdata between
    rounds. On a real deployment streams read directories/object-store
    prefixes directly and this staging is bypassed.
    """
    if os.path.isdir(path):
        return path
    digest = hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "sss_stream_src", digest)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    if not os.path.exists(link):
        try:
            os.symlink(path, link)
        except FileExistsError:
            pass
    return d


def _source_identity(path: str) -> str:
    """Content-identity stamp for a fixture path. A single file contributes
    its (mtime_ns, size); a directory of parquet parts contributes every
    member's (name, mtime_ns, size), since in-place member overwrites need
    not touch the directory's own stat."""
    if os.path.isdir(path):
        stamps = []
        for f in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, f))
            stamps.append(f"{f}:{st.st_mtime_ns}:{st.st_size}")
        return ";".join(stamps)
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def staged_chunks(
    sf_dir: str,
    name: str = "events",
    n_chunks: int = 8,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    arrival_order: tuple[int, ...] | None = None,
) -> str:
    """Stage a fixture table as ``n_chunks`` sorted time-range parquet files
    and return the directory (cached in /tmp; see :func:`chunked_stream` for
    the delivery-order contract). Exposed separately so restart-recovery
    harnesses can copy individual chunk files into a two-phase source dir."""
    if arrival_order is not None and sorted(arrival_order) != list(range(n_chunks)):
        raise ValueError(
            f"arrival_order {arrival_order} is not a permutation of "
            f"range({n_chunks})"
        )
    path = table_path(sf_dir, name)
    # Key the staged-chunk cache by source content identity (mtime+size per
    # file), not just path: the driver regenerates testdata in place between
    # rounds and a path-only key would silently serve the previous
    # generation's data. For a directory-of-parts fixture the member files'
    # stats are folded in — overwriting members in place need not change
    # the directory's own stat.
    key = (
        f"{os.path.abspath(path)}|{_source_identity(path)}"
        f"|{n_chunks}|{','.join(order_cols)}"
        + (f"|arrive:{arrival_order}" if arrival_order is not None else "")
    )
    digest = hashlib.sha1(key.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "sss_stream_chunks", digest)
    n_have = (
        len([f for f in os.listdir(d) if f.endswith(".parquet")])
        if os.path.isdir(d)
        else -1
    )
    if n_have != n_chunks:
        import time as _time
        import uuid as _uuid

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        t = t.take(pc.sort_indices(t, sort_keys=[(c, "ascending") for c in order_cols]))
        tmp = f"{d}.tmp-{_uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        bounds = [round(i * t.num_rows / n_chunks) for i in range(n_chunks + 1)]
        now = _time.time()
        ranks = {
            chunk: rank
            for rank, chunk in enumerate(arrival_order or range(n_chunks))
        }
        for i in range(n_chunks):
            f = os.path.join(tmp, f"part-{i:05d}.parquet")
            pq.write_table(t.slice(bounds[i], bounds[i + 1] - bounds[i]), f)
            os.utime(f, (now + ranks[i], now + ranks[i]))
        # Provenance marker (leading "_" = ignored by Spark's file listing
        # and by the *.parquet count above): records which source this
        # cache entry was staged FROM, so purge_staged_chunks can find and
        # drop entries for deleted scale-probe replicas — a 1000x events
        # replica stages ~1.6 GB of chunks whose content key can never hit
        # again once the replica dir is rmtree'd (r12: 16 GB of such dead
        # cache had accumulated in /tmp and was measurably slowing the
        # gate's writeback).
        with open(os.path.join(tmp, "_source_path.txt"), "w") as fh:
            fh.write(os.path.abspath(path))
        try:
            os.rename(tmp, d)
        except OSError:  # concurrent builder won the race; theirs is identical
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return d


def purge_staged_chunks(src_prefix: str) -> int:
    """Remove every staged-chunk cache entry whose recorded source path
    lives under ``src_prefix``; returns the number removed. Used by
    scale-probe teardown: replica fixtures are deleted after the run, so
    their staged chunks are permanently-dead cache (the content key
    embeds the replica's path and stat identity). Entries predating the
    provenance marker are left alone — they can still be validated
    against a live source by the normal key path."""
    import shutil

    root = os.path.join(tempfile.gettempdir(), "sss_stream_chunks")
    if not os.path.isdir(root):
        return 0
    prefix = os.path.abspath(src_prefix) + os.sep
    n = 0
    for entry in os.listdir(root):
        marker = os.path.join(root, entry, "_source_path.txt")
        try:
            with open(marker) as fh:
                src = fh.read().strip()
        except OSError:
            continue
        if src.startswith(prefix):
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
            n += 1
    return n


def chunked_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str = "events",
    n_chunks: int = 8,
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    arrival_order: tuple[int, ...] | None = None,
) -> DataFrame:
    """Stream a fixture table as ``n_chunks`` event-time-ordered micro-batches.

    The single-file fixture is re-staged (once, cached in /tmp keyed by
    source path + chunk count) as N parquet files sorted by ``order_cols``
    and split into contiguous time ranges, with strictly increasing mtimes
    so the file source (which orders by modification time) delivers them
    oldest-first; ``maxFilesPerTrigger=1`` then yields one micro-batch per
    chunk with a monotonically advancing watermark — real multi-batch state
    eviction, exactly the lifecycle the reference's store serves one commit
    per batch (Provider.scala:44-47).

    In-order arrival makes watermark-evicting queries deterministic: the
    watermark during batch N is max(ts of batches < N) − delay, which is
    ≤ every ts in batch N, so no event is ever late-dropped.

    ``arrival_order`` (default: in time order) permutes DELIVERY order
    while chunk CONTENTS stay time-contiguous: chunk i still holds the
    i-th time range, but its file's mtime is its rank in the permutation,
    so the file source replays chunks in that order. This is how late-data
    semantics are exercised deterministically — e.g. ``(0, 2, 1)`` delivers
    oldest, newest, then middle, making every middle-third event arrive
    behind the watermark the newest third advanced.

    100 TB note: this staging is test-harness-only — it simulates arrival
    order for a bounded fixture. Production streams arrive from Kafka /
    object-store listings already ordered by time; nothing here is on a
    scale path (the stage is a one-time local sort of a test file).
    """
    d = staged_chunks(sf_dir, name, n_chunks, order_cols, arrival_order)
    return _stream_from_chunk_dir(spark, d, name)


def _stream_from_chunk_dir(spark: SparkSession, d: str, name: str) -> DataFrame:
    # Infer the stream schema from the STAGED chunk files, not the original
    # fixture: pyarrow's writer may coerce the timestamp physical type
    # (e.g. nanos→micros), and schema + data must come from the same files.
    schema = spark.read.parquet(d).schema
    df = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .load(d)
    )
    if name == "events":
        df = with_event_time(df)
    return df


def read_stream(
    spark: SparkSession,
    sf_dir: str,
    name: str = "events",
    schema: T.StructType | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Read a fixture table as a file-source stream.

    This is the PySpark equivalent of feeding micro-batches through the
    reference's state store: each trigger becomes one versioned state commit
    (Provider.scala:44-47).
    """
    if schema is None:
        schema = spark.read.parquet(table_path(sf_dir, name)).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(_stream_dir(table_path(sf_dir, name)))
    if name == "events":
        df = with_event_time(df)
    return df
