"""transformWithStateInPandas TTL binding (streaming/ttl_tws.py).

The binding shares ``replay_virtual`` with the applyInPandasWithState
kernel, so semantic equivalence is structural; these tests pin (a) the
shared fold IS what the processor calls, (b) the availability gate
reflects the real worker dependency, and (c) where protobuf exists, the
end-to-end stream matches the established binding on the same ops.
"""

import pandas as pd
import pytest

from spark_states_spark.config import TtlConfig
from spark_states_spark.streaming.ttl import replay_virtual
from spark_states_spark.streaming.ttl_tws import (
    TWS_AVAILABLE,
    make_ttl_processor,
    ttl_kv_ops_tws,
)


def _ops(rows):
    return pd.DataFrame(rows, columns=["key", "op", "value", "ts_s", "seq"])


def test_processor_uses_shared_fold_semantics():
    """Drive the processor's handleInputRows with a fake ValueState and
    check it emits exactly what replay_virtual dictates — the binding adds
    state plumbing, never semantics."""
    ttl = TtlConfig(query_name="t", ttl_secs=100, strict=True)
    proc = make_ttl_processor(ttl)

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    proc._kv = FakeState()
    rows = _ops(
        [
            ("k", "put", 7, 0, 1),
            ("k", "get", None, 50, 2),   # alive, resets clock to 50
            ("k", "get", None, 149, 3),  # 99 < 100 → alive, resets
            ("k", "get", None, 260, 4),  # 111 ≥ 100 → strict miss, dropped
        ]
    )
    emitted = list(proc.handleInputRows(("k",), iter([rows]), None))
    got = [
        (k, t, f, None if pd.isna(v) else int(v))
        for k, t, f, v in emitted[0].itertuples(index=False)
    ]
    expected_out, expected_state = replay_virtual(rows, ttl, None, None, False)
    assert got == expected_out
    assert proc._kv.v == expected_state  # strict miss → key dropped (None)
    assert expected_state is None


def test_availability_gate_matches_protobuf():
    """TWS_AVAILABLE must track the driver worker's real dependency: the
    proto module the state server protocol needs."""
    try:
        import google.protobuf  # noqa: F401

        has = True
    except ImportError:
        has = False
    assert TWS_AVAILABLE is has


def test_catalog_registration_follows_gate():
    from spark_states_spark.catalog import QUERIES

    registered = "keyed_state_ttl_tws_infinite" in QUERIES
    assert registered is TWS_AVAILABLE


@pytest.mark.skipif(
    not TWS_AVAILABLE, reason="transformWithState worker needs google.protobuf"
)
def test_tws_binding_matches_apply_in_pandas_binding(spark, sf_dir_small):
    """Where the worker can run: both bindings drain the same op stream to
    identical get-outcome summaries."""
    from pyspark.sql import functions as F

    from spark_states_spark.streaming.queries import (
        _event_kv_ops,
        _get_outcome_summary,
    )
    from spark_states_spark.streaming.runner import run_stream_to_table
    from spark_states_spark.streaming.ttl import ttl_kv_ops

    ttl = TtlConfig(query_name="t", ttl_secs=21600, strict=True)
    results = []
    for binding in (ttl_kv_ops, ttl_kv_ops_tws):
        out = run_stream_to_table(
            binding(_event_kv_ops(spark, sf_dir_small), ttl), output_mode="append"
        )
        results.append(
            sorted(
                tuple(r)
                for r in _get_outcome_summary(out).orderBy("key").toLocalIterator()
            )
        )
    assert results[0] == results[1]
