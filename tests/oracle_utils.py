"""Local stand-in for the driver's DuckDB oracle-differential check.

Mirrors the driver contract: run the Spark query and the oracle SQL on the
same parquet tables, compare row count + column names + order-insensitive
values (columns sorted by name, rows sorted by canonical string).
"""

from __future__ import annotations

import hashlib
import math
import os
import pickle

import duckdb

from spark_states_spark.sources.tables import TABLES, table_path


def _content_sample(path: str) -> str:
    """sha256 over each file's first+last 64 KiB (ADVICE r11): the stat
    stamp below keys on (mtime_ns, size), which a timestamp-preserving
    restore (``cp -p`` / ``rsync -a`` / tar) of a DIFFERENT same-sized
    generation would collide with. Parquet's footer (row-group stats,
    offsets) lives in the tail and its data pages start at the head, so a
    128 KiB sample distinguishes real regenerations without reading
    multi-GB fixtures whole."""
    h = hashlib.sha256()
    files = (
        sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if not f.startswith((".", "_"))
        )
        if os.path.isdir(path)
        else [path]
    )
    for f in files:
        with open(f, "rb") as fh:
            h.update(fh.read(65536))
            size = os.fstat(fh.fileno()).st_size
            if size > 65536:
                fh.seek(max(65536, size - 65536))
                h.update(fh.read(65536))
    return h.hexdigest()[:16]


def fixture_identity(sf_dir: str) -> str:
    """Content-identity stamp covering EVERY fixture table under sf_dir:
    the (mtime_ns, size) stat stamp from sources.tables._source_identity
    PLUS a head+tail sha256 sample per table (ADVICE r11 — stat identity
    alone is spoofable by a timestamp-preserving restore of an equal-sized
    different generation). The cache key component that makes an in-place
    testdata regeneration invalidate every cached oracle result for that
    directory."""
    from spark_states_spark.sources.tables import _source_identity

    return ";".join(
        f"{t}={_source_identity(p)}@{_content_sample(p)}"
        for t in TABLES
        for p in [table_path(sf_dir, t)]
    )


def _oracle_cache_file(oracle_cache: tuple[str, str], oracle_sql: str) -> str:
    cache_dir, fixture_id = oracle_cache
    key = hashlib.sha256(
        f"{duckdb.__version__}\n{fixture_id}\n{oracle_sql}".encode()
    ).hexdigest()
    return os.path.join(cache_dir, f"{key}.pkl")


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        # Exact float comparison — stricter than any driver-side hashing.
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canonicalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[str]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    canon = sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)
    return cols, canon


_INTEGRAL_SPARK = {"tinyint", "smallint", "int", "bigint"}
# DuckDB types whose pandas materialization is float64 even without nulls —
# the driver's canonicalization then hashes 5.0 against Spark's 5.
_DUCK_FLOATY = ("HUGEINT", "UHUGEINT", "DOUBLE", "FLOAT", "REAL", "DECIMAL")


def _driver_fidelity_problems(spark_df, ora_types, null_cols) -> list[str]:
    """Checks mirroring the DRIVER's pandas-based canonicalization, which is
    stricter than the fetchall() value compare below in two ways observed in
    round 2 (VERDICT.md, What's wrong #1-2):

    - array/map output columns crash its sort (``unhashable type: 'list'``);
    - an oracle column pandas materializes as float64 while Spark returns an
      integer type hash-mismatches (e.g. DuckDB HUGEINT -> float64), even
      when every value is numerically identical.

    ``ora_types`` maps oracle columns to their DuckDB type names (from a
    DESCRIBE — binding only, no execution) and ``null_cols`` is the set of
    oracle columns containing a NULL. Through r06 this check re-EXECUTED
    the oracle via ``.df()`` to inspect pandas dtypes, doubling every
    oracle's cost in the sf0.1 gate (VERDICT r06 #1); the DuckDB type name
    predicts the pandas dtype exactly for the case under test (float-ish
    type, no nulls → float64 without the isna excuse).
    """
    problems: list[str] = []
    for f in spark_df.schema.fields:
        t = f.dataType.simpleString()
        if t.startswith(("array<", "map<")):
            problems.append(
                f"column {f.name!r}: {t} is unhashable in the driver's pandas "
                "canonicalization — flatten it (concat_ws / explode)"
            )
            continue
        if f.name in ora_types:
            dt = ora_types[f.name].upper()
            if (
                t in _INTEGRAL_SPARK
                and dt.startswith(_DUCK_FLOATY)
                and f.name not in null_cols
            ):
                problems.append(
                    f"column {f.name!r}: spark {t} vs oracle DuckDB {dt} "
                    "(pandas-materializes as float64, e.g. HUGEINT) — CAST "
                    "the oracle column"
                )
    return problems


def _exec_oracle(con, oracle_sql: str):
    """Run the oracle SQL + the driver-fidelity DESCRIBE on ``con``.

    Returns ``(ora_cols, ora_rows, ora_types, null_cols, cacheable,
    problems)`` — ``cacheable`` is False when the DESCRIBE fallback path
    ran (its problem entries would not be reproduced by a cache hit).
    The caller owns ``con`` for the duration (DuckDB connections are not
    re-entrant; compare() only ever runs this on one thread at a time).
    """
    problems: list[str] = []
    res = con.execute(oracle_sql)
    ora_cols = [d[0] for d in res.description]
    ora_rows = [tuple(r) for r in res.fetchall()]
    # Driver-fidelity pre-checks: DuckDB column types via DESCRIBE (binding
    # only — the old ``.df()`` here EXECUTED the oracle a second time).
    cacheable = True
    try:
        ora_types = {
            r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle_sql}").fetchall()
        }
    except Exception:
        cacheable = False
        # Fallback (ADVICE r07): a DESCRIBE failure must not silently skip
        # the integer-vs-float fidelity check — the one protection the
        # fetchall value-compare below cannot provide. Re-execute via the
        # pre-r07 ``.df()`` dtype inspection (one extra oracle run, but only
        # on this rare path); a float-ish pandas dtype maps onto the same
        # _DUCK_FLOATY branch the DESCRIBE names would have taken.
        try:
            odf = con.execute(oracle_sql).df()
            ora_types = {
                c: ("DOUBLE" if str(odf[c].dtype).startswith("float")
                    else str(odf[c].dtype).upper())
                for c in odf.columns
            }
        except Exception:
            ora_types = {}
            problems.append(
                "driver-fidelity dtype check skipped: DESCRIBE and .df() "
                "both failed on the oracle SQL"
            )
    null_cols = {
        ora_cols[i]
        for i in range(len(ora_cols))
        if any(r[i] is None for r in ora_rows)
    }
    return ora_cols, ora_rows, ora_types, null_cols, cacheable, problems


def compare(
    spark_df, con, oracle_sql: str, timings: dict | None = None,
    oracle_cache: tuple[str, str] | None = None, overlap: bool = False,
) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass).

    ``timings``, if given, ACCUMULATES ``spark_s`` (the Spark collect —
    added to any build time the caller pre-seeded, since eager entries
    execute inside the query-build call) and sets ``oracle_s`` (both
    DuckDB executions — the value fetch and the driver-fidelity pandas
    materialization) so callers recording wall seconds can attribute
    them without re-running anything.

    ``oracle_cache`` — ``(cache_dir, fixture_identity(sf_dir))`` — enables
    a content-keyed DuckDB-result cache (VERDICT r10 #5: the sf0.1 gate's
    oracle side alone was ~57 s of its 309 s wall and grows linearly with
    the catalog). Sound because the oracle result is a pure function of
    (oracle SQL, fixture bytes, duckdb version) — all three are in the
    key, so an edited oracle, a regenerated fixture, or a duckdb upgrade
    each miss and recompute; the SPARK side and the value/schema compare
    still run in full on every call, so per-entry hash coverage is
    unchanged. Delete the cache dir to force a cold recompute. Results
    that needed the DESCRIBE fallback (which appends its own problem
    entry) are never cached. ``timings['oracle_cached']`` reports a hit.

    ``overlap=True`` runs a cache-MISS oracle on a worker thread
    concurrently with the Spark collect (DuckDB releases the GIL during
    execution; the collect is mostly socket IO), hiding most of the
    oracle's wall on cold runs too. Identical results by construction —
    the two engines share no mutable state and ``con`` is owned by this
    call; ``timings['oracle_overlapped']`` reports the mode.
    """
    import time as _time

    problems: list[str] = []
    # Cache probe FIRST (cheap) so the overlap thread is only spawned for
    # genuine misses.
    cached = None
    t_oracle = _time.perf_counter()
    if oracle_cache is not None:
        # Broad except + shape check: a truncated/corrupted/stale-format
        # cache file must degrade to a MISS (recompute), never fail the
        # entry — and certainly not persistently until someone deletes
        # .oracle_cache/ by hand.
        try:
            with open(_oracle_cache_file(oracle_cache, oracle_sql), "rb") as fh:
                cached = pickle.load(fh)
            if not (isinstance(cached, tuple) and len(cached) == 4):
                cached = None
        except Exception:  # noqa: BLE001 — any load failure is a miss
            cached = None
    cache_load_s = _time.perf_counter() - t_oracle
    worker = None
    box: dict = {}
    if cached is None and overlap:
        import threading

        def _run() -> None:
            t = _time.perf_counter()
            try:
                box["v"] = _exec_oracle(con, oracle_sql)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                box["e"] = exc
            box["s"] = _time.perf_counter() - t

        worker = threading.Thread(target=_run, name="oracle-overlap")
        worker.start()
    t0 = _time.perf_counter()
    try:
        sp_rows = [tuple(r) for r in spark_df.collect()]
    except BaseException:
        # A failed collect must still JOIN the worker before the caller
        # sees the exception: the caller owns `con` again the moment
        # compare() unwinds, and an orphan thread mid-execute on the
        # shared DuckDB connection would race the NEXT entry's oracle
        # (DuckDB connections are not safe for concurrent queries) —
        # poisoning the rest of a sweep whose per-entry except was
        # designed to contain exactly this failure. Interrupt the
        # in-flight oracle first so the join returns in milliseconds
        # instead of waiting out a multi-second result that will be
        # discarded anyway.
        if worker is not None:
            try:
                con.interrupt()
            except Exception:  # noqa: BLE001 — interrupt is best-effort
                pass
            worker.join()
        raise
    if timings is not None:
        timings["spark_s"] = timings.get("spark_s", 0.0) + (
            _time.perf_counter() - t0
        )
    sp_cols = list(spark_df.columns)
    if cached is not None:
        ora_cols, ora_rows, ora_types, null_cols = cached
        if timings is not None:
            timings["oracle_cached"] = True
            timings["oracle_s"] = cache_load_s
        problems.extend(_driver_fidelity_problems(spark_df, ora_types, null_cols))
        return _value_compare(problems, sp_cols, sp_rows, ora_cols, ora_rows)
    if worker is not None:
        worker.join()
        if "e" in box:
            raise box["e"]
        ora_cols, ora_rows, ora_types, null_cols, cacheable, extra = box["v"]
        if timings is not None:
            timings["oracle_overlapped"] = True
            timings["oracle_s"] = box["s"]
    else:
        t_oracle = _time.perf_counter()
        ora_cols, ora_rows, ora_types, null_cols, cacheable, extra = (
            _exec_oracle(con, oracle_sql)
        )
        if timings is not None:
            timings["oracle_s"] = _time.perf_counter() - t_oracle
    problems.extend(extra)
    if oracle_cache is not None and cacheable:
        tmp = None
        try:
            os.makedirs(oracle_cache[0], exist_ok=True)
            path = _oracle_cache_file(oracle_cache, oracle_sql)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as fh:
                pickle.dump((ora_cols, ora_rows, ora_types, null_cols), fh)
            os.replace(tmp, path)
        except Exception:  # noqa: BLE001 — cache write is best-effort
            # Broad on purpose (ADVICE r11): a pickle.PicklingError on an
            # unpicklable fetched value (or any non-OS failure) must not
            # fail an entry whose compare data is already complete —
            # mirroring the broad-except on the cache-load side. A dump
            # that died mid-write leaves the tmp file behind; unlink it so
            # failures don't accumulate orphans in the cache dir.
            try:
                if tmp is not None:
                    os.unlink(tmp)
            except OSError:
                pass
    problems.extend(_driver_fidelity_problems(spark_df, ora_types, null_cols))
    return _value_compare(problems, sp_cols, sp_rows, ora_cols, ora_rows)


def _value_compare(
    problems: list[str], sp_cols, sp_rows, ora_cols, ora_rows
) -> list[str]:
    if sorted(sp_cols) != sorted(ora_cols):
        problems.append(f"columns differ: spark={sorted(sp_cols)} oracle={sorted(ora_cols)}")
        return problems
    if len(sp_rows) != len(ora_rows):
        problems.append(f"row count differs: spark={len(sp_rows)} oracle={len(ora_rows)}")
    _, sp_canon = canonicalize(sp_cols, sp_rows)
    _, ora_canon = canonicalize(ora_cols, ora_rows)
    if sp_canon != ora_canon:
        diffs = [
            (s, o) for s, o in zip(sp_canon, ora_canon) if s != o
        ][:5]
        only_spark = sorted(set(sp_canon) - set(ora_canon))[:3]
        only_ora = sorted(set(ora_canon) - set(sp_canon))[:3]
        problems.append(
            f"values differ; first aligned diffs={diffs!r}; "
            f"spark-only={only_spark!r}; oracle-only={only_ora!r}"
        )
    return problems
