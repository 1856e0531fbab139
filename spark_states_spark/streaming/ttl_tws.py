"""TTL keyed state on ``transformWithStateInPandas`` — Spark 4's native
arbitrary-state API (SPARK-46865), the surface the reference would target
if written today.

The reference (chermenin/spark-states, ``RocksDbStateStoreProvider.scala``)
predates any public arbitrary-state API rich enough for its TTL semantics,
so it re-implemented a whole ``StateStoreProvider``. Spark 4's
``transformWithStateInPandas`` makes that unnecessary: per-key typed
ValueState in the engine's own RocksDB store, lifecycle hooks, timers, and
(engine-native) state TTL. This module re-expresses the same virtual-clock
TTL kernel as ``ttl.py`` on that API — IDENTICAL semantics, shared fold
(``ttl.replay_virtual``), so the two bindings cannot drift and every
DuckDB oracle for the applyInPandasWithState entries applies verbatim.

Semantics note (PARITY.md): Spark's native state TTL
(``getValueState(..., ttlDurationMs=...)``) is expire-after-UPDATE on
processing time; the reference's contract is expire-after-ACCESS on a
configurable clock (``README.md:34-49``). The kernel therefore keeps
(value, last_access) in plain ValueState and enforces expire-after-access
itself, exactly as ``ttl.py`` does — native TTL would silently drop the
read-extension behavior the reference's suite pins ("ttl should reset on
get, set and update", ``RocksDbStateTimeoutSuite.scala:123-170``).

Environment gate: the transformWithState driver worker speaks protobuf to
the JVM state server; ``google.protobuf`` is not installed in this
container, so ``TWS_AVAILABLE`` is False here and the catalog entries are
registered only where the dependency exists. tests/test_ttl_tws.py skips
accordingly; the binding is exercised wherever protobuf is present.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from ..config import TtlConfig
from .ttl import OUTPUT_SCHEMA, STATE_SCHEMA, outcomes_frame, replay_virtual


def _tws_available() -> bool:
    try:  # the driver worker's hard dependency, absent in this container
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


TWS_AVAILABLE = _tws_available()


def make_ttl_processor(ttl: TtlConfig):
    """Build the StatefulProcessor enforcing the reference TTL contract.

    Deferred import: ``pyspark.sql.streaming.stateful_processor`` itself
    imports cleanly without protobuf, but constructing the processor is
    only useful where the worker can run, so the import lives here.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TtlKvProcessor(StatefulProcessor):
        """Per-key (value, last_access) state; expiry decided by the shared
        ``replay_virtual`` fold — bit-identical to the
        applyInPandasWithState binding."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            # Plain ValueState, NOT ttlDurationMs: native TTL is
            # expire-after-update, the reference needs expire-after-access
            # (see module docstring).
            self._kv = handle.getValueState("kv", STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            if self._kv.exists():
                value, last_access = self._kv.get()
                have = True
            else:
                value, last_access, have = None, None, False
            out, survived = replay_virtual(
                pd.concat(list(rows)), ttl, value, last_access, have
            )
            if survived is not None:
                self._kv.update(survived)
            else:
                self._kv.clear()
            if out:
                yield outcomes_frame(out)

        def close(self) -> None:
            pass

    return TtlKvProcessor()


def ttl_kv_ops_tws(ops_stream: DataFrame, ttl: TtlConfig) -> DataFrame:
    """The ``ttl_kv_ops`` contract on transformWithStateInPandas
    (timeMode="none" = the virtual clock; the rows' ``ts_s`` drives
    expiry, same as the applyInPandasWithState binding)."""
    return ops_stream.groupBy("key").transformWithStateInPandas(
        make_ttl_processor(ttl),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
