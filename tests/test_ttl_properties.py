"""Property-based differential test of the TTL kernel.

The reference pins its TTL semantics with a handful of hand-written
sequences (RocksDbStateTimeoutSuite); this goes further (SURVEY.md §5's
"richer than the reference" requirement): hypothesis drives random
op-sequences, batch splits, and TTL configs through the *actual* kernel
(`_make_kernel`, exercised with a fake GroupState — no Spark needed, so
hundreds of examples run in seconds) and compares every get-outcome and
the surviving state against an independently written model of the
documented contract:

- ttl=-1: alive while present; ttl=0: never alive; ttl=n: alive iff
  now - last_access < n, where put always touches, get touches only in
  strict mode (expire-after-access);
- strict: expired keys miss exactly and are dropped on read;
- non-strict: expired-but-unswept keys are still served within the batch
  (TtlDB "keys live ≥ ttl"), without extending the clock;
- batch end: expired state is physically dropped (the compaction stand-in),
  so laziness never crosses a commit.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_states_spark.config import TtlConfig
from spark_states_spark.streaming.ttl import _make_kernel


class FakeGroupState:
    def __init__(self):
        self._row = None

    @property
    def exists(self):
        return self._row is not None

    @property
    def get(self):
        return self._row

    def update(self, row):
        self._row = tuple(row)

    def remove(self):
        self._row = None


def run_kernel(ttl: TtlConfig, batches):
    state, outs = FakeGroupState(), []
    kernel = _make_kernel(ttl)
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["key", "op", "value", "ts_s", "seq"])
        for out in kernel(("k",), iter([pdf]), state):
            for row in out.itertuples(index=False):
                value = None if pd.isna(row.value) else int(row.value)
                outs.append((row.key, int(row.ts_s), bool(row.found), value))
    return outs, state._row


def model(ttl: TtlConfig, batches):
    """Independent spelling of the documented contract (docstring above)."""
    value = last = None
    outs = []

    def alive(now: int) -> bool:
        if value is None:
            return False
        if ttl.ttl_secs < 0:
            return True
        if ttl.ttl_secs == 0:
            return False
        return now - last < ttl.ttl_secs

    for batch in batches:
        end = 0
        for key, op, v, ts, _seq in sorted(batch, key=lambda r: (r[3], r[4])):
            end = max(end, ts)
            if op == "put":
                value, last = v, ts
            elif op == "get":
                if alive(ts):
                    outs.append((key, ts, True, value))
                    if ttl.strict:
                        last = ts
                elif value is not None and not ttl.strict and ttl.ttl_secs > 0:
                    outs.append((key, ts, True, value))
                else:
                    outs.append((key, ts, False, None))
                    if value is not None and ttl.strict:
                        value = last = None
            else:  # remove
                value = last = None
        if not (value is not None and ttl.ttl_secs != 0 and alive(end)):
            value = last = None
    final = None if value is None else (value, last)
    return outs, final


ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["put", "get", "get", "remove"]),
        st.integers(0, 99),
        st.integers(0, 30),
    ),
    min_size=1,
    max_size=40,
)
split_strategy = st.lists(st.integers(1, 8), min_size=1, max_size=5)
ttl_strategy = st.tuples(st.sampled_from([-1, 0, 1, 3, 10]), st.booleans())


@given(ops=ops_strategy, splits=split_strategy, cfg=ttl_strategy)
@settings(max_examples=300, deadline=None)
def test_kernel_matches_model(ops, splits, cfg):
    ttl = TtlConfig(query_name="prop", ttl_secs=cfg[0], strict=cfg[1])
    rows = [("k", op, v, ts, seq) for seq, (op, v, ts) in enumerate(ops)]
    # Batches must be non-decreasing in virtual time to be a valid stream
    # (watermark-ordered micro-batches): sort globally, then split.
    rows.sort(key=lambda r: (r[3], r[4]))
    batches, i = [], 0
    for width in splits:
        if i >= len(rows):
            break
        batches.append(rows[i : i + width])
        i += width
    if i < len(rows):
        batches.append(rows[i:])

    got_out, got_state = run_kernel(ttl, batches)
    want_out, want_state = model(ttl, batches)
    assert got_out == want_out
    assert got_state == want_state


@pytest.mark.parametrize("strict", [True, False])
@given(ops=ops_strategy)
@settings(max_examples=100, deadline=None)
def test_stateless_never_serves(strict, ops):
    ttl = TtlConfig(query_name="prop", ttl_secs=0, strict=strict)
    rows = sorted(
        [("k", op, v, ts, seq) for seq, (op, v, ts) in enumerate(ops)],
        key=lambda r: (r[3], r[4]),
    )
    outs, final = run_kernel(ttl, [rows])
    assert all(found is False for (_, _, found, _) in outs)
    assert final is None
