"""Behavioral-analytics operators on ADVERSARIAL data the uniform fixture
can't produce: users who stall mid-funnel, out-of-order stages, and
same-second ordering resolved by the composite (ts, event_id) key. Runs
the REAL catalog entries (batch funnel + streaming funnel) against a
synthetic events table staged in the fixture layout, and the streaming
entry against its own DuckDB oracle on that same table — a full
differential on data where the stage gating actually discriminates."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_states_spark.catalog import ORACLES, QUERIES

_T0 = 1704067200  # 2024-01-01 00:00:00 UTC, matches the fixture epoch


def _events_table(tmp_path):
    """user 1: clean view→signup→purchase; user 2: signup BEFORE view
    (never converts past stage 1); user 3: purchase before signup (stops
    at stage 2); user 4: purchase only (stage 0); user 5: signup in the
    SAME second as the view but a smaller event_id (arrival order puts it
    first → not eligible), then a later signup that is."""
    rows = [
        # (event_id, ts_offset_s, user_id, event_type)
        (1, 0, 1, "view"), (2, 10, 1, "signup"), (3, 20, 1, "purchase"),
        (4, 0, 2, "signup"), (5, 10, 2, "view"), (6, 20, 2, "purchase"),
        (7, 0, 3, "view"), (8, 10, 3, "purchase"), (9, 20, 3, "signup"),
        (10, 0, 4, "purchase"),
        (11, 100, 5, "signup"),   # same second as the view, SMALLER id →
        (12, 100, 5, "view"),     # arrives first, not eligible
        (13, 200, 5, "signup"),   # this one converts stage 2
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(_T0 + r[1]) * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path / "funnel_fixture")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


# Expected: stage 1 = users with a view = {1,2,3,5} = 4;
# stage 2 = signup strictly after the first view = {1,5} ∪ {2? no} ∪
#           {3: signup@20 > view@0 → yes} = {1,3,5} = 3;
# stage 3 = purchase after that signup = {1} = 1.
_EXPECTED = {1: 4, 2: 3, 3: 1}


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return _events_table(tmp_path_factory.mktemp("behavior"))


def test_streaming_funnel_stage_gating(spark, fixture_dir):
    got = {
        r.stage: r.n_users
        for r in QUERIES["streaming_funnel_stages"](spark, fixture_dir).collect()
    }
    assert got == _EXPECTED


def test_streaming_funnel_oracle_differential_on_adversarial_data(
    spark, fixture_dir
):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{fixture_dir}/events.parquet')"
    )
    try:
        oracle = {
            s: n
            for s, n in con.execute(
                ORACLES["streaming_funnel_stages"]
            ).fetchall()
        }
    finally:
        con.close()
    assert oracle == _EXPECTED  # the oracle itself encodes the gating


def test_batch_funnel_on_adversarial_data(spark, fixture_dir):
    """The batch funnel uses second-granularity >= gating (not the
    composite key), so user 2 — signup at t+0, view at t+10 — still never
    converts, and user 5's same-second signup DOES count there."""
    row = QUERIES["funnel_view_signup_purchase"](spark, fixture_dir).collect()[0]
    assert row.n_view == 4
    assert row.n_signup_after_view == 3  # users 1, 3, 5 (same-second counts)
    assert row.n_purchase_after_signup == 1


# --- kernel-level hypothesis differential (no Spark: pure pandas) --------

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_states_spark.streaming.queries import funnel_kernel


class _FakeGroupState:
    """The three members funnel_kernel touches, per the
    applyInPandasWithState GroupState contract."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _sequential_fold(seq):
    """Reference: one pass over (event_type, (t, e)) in arrival order —
    tuple comparison IS the lexicographic order the kernel implements."""
    k1 = k2 = k3 = None
    emits = []
    for et, k in seq:
        if k1 is None and et == "view":
            k1, _ = k, emits.append(1)
        elif k1 is not None and k2 is None and et == "signup" and k > k1:
            k2, _ = k, emits.append(2)
        elif k2 is not None and k3 is None and et == "purchase" and k > k2:
            k3, _ = k, emits.append(3)
    flat = lambda p: (None, None) if p is None else p  # noqa: E731
    return (*flat(k1), *flat(k2), *flat(k3)), emits


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(
        st.sampled_from(["view", "signup", "purchase", "other"]),
        min_size=0,
        max_size=40,
    ),
    keys=st.sets(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=40),
    cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=5),
)
def test_funnel_kernel_matches_sequential_fold(data, keys, cuts):
    """The kernel's per-batch chained masked-min fold == the one-pass
    sequential fold, for ANY contiguous ascending-k batching — including
    slots filled across batch boundaries and several slots filled inside
    one batch. This is the exact invariant the replay-order guard protects:
    time-ordered chunk delivery makes real micro-batches contiguous
    ascending-key, and under that precondition lexicographic-min-over-
    eligible per batch must reproduce arrival order. Emit-once rides
    along: each stage must surface exactly once, in the batch containing
    its filling event. Keys are (t, e) pairs (r08, uncapped slots);
    divmod by 1000 maps the generated ascending ints onto pairs with
    plenty of same-t ties, exercising the e tiebreak."""
    ks = [divmod(k, 1000) for k in sorted(keys)[: len(data)]]
    seq = list(zip(data[: len(ks)], ks))
    bounds = sorted({c for c in cuts if c < len(seq)})
    batches = []
    prev = 0
    for b in bounds + [len(seq)]:
        if b > prev:
            batches.append(seq[prev:b])
            prev = b
    state = _FakeGroupState()
    emitted = []
    for batch in batches:
        stage_of = {"view": 1, "signup": 2, "purchase": 3, "other": 0}
        pdf = pd.DataFrame(
            {
                # The kernel takes the int stage ids _funnel_transitions
                # maps JVM-side (r10); "other" -> 0 keeps the adversarial
                # non-stage rows in the batch (production filters them
                # before the operator, the kernel must still ignore them).
                "stage": pd.array(
                    [stage_of[et] for et, _ in batch], dtype="int64"
                ),
                "t": pd.array([t for _, (t, _e) in batch], dtype="int64"),
                "e": pd.array([e for _, (_t, e) in batch], dtype="int64"),
            }
        )
        for out in funnel_kernel((7,), iter([pdf]), state):
            emitted.extend(out["stage"].tolist())
            assert (out["user_id"] == 7).all()
    expect_state, expect_emits = _sequential_fold(seq)
    assert (state.get if state.exists else (None,) * 6) == expect_state
    assert emitted == expect_emits


def test_attribution_last_touch_matches_naive_join(spark, sf_dir):
    """The single-window attribution must agree with the quadratic-naive
    spelling: per purchase, argmax-by-k over strictly earlier non-purchase
    events of the same user."""
    from pyspark.sql import functions as F

    from spark_states_spark.operators.behavior import attribution_last_touch
    from spark_states_spark.sources import load_table

    got = {
        r.touch_type: r.n_purchases
        for r in attribution_last_touch(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        (F.unix_timestamp("ts") * F.lit(1000000) + F.col("event_id")).alias("k"),
    )
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "k")
    t = ev.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("touch"), F.col("k").alias("tk")
    )
    naive = (
        p.join(t, "user_id", "left")
        .where(F.col("tk").isNull() | (F.col("tk") < F.col("k")))
        .groupBy("user_id", "k")
        .agg(F.max_by("touch", "tk").alias("touch"))
    )
    # purchases whose ONLY join partners were later touches drop out of the
    # filtered join entirely — re-anchor on the purchase set so they count
    # as 'direct', same as the window spelling.
    ref_rows = (
        p.join(naive, ["user_id", "k"], "left")
        .groupBy(F.coalesce("touch", F.lit("direct")).alias("touch_type"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    ref = {r.touch_type: r.n for r in ref_rows}
    assert got == ref
    n_purchases = p.count()
    assert sum(got.values()) == n_purchases


def test_transition_matrix_python_recompute(spark, sf_dir):
    """Counts and probabilities must equal a python recompute of per-user
    bigrams in packed (ts, event_id) order."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from spark_states_spark.catalog import QUERIES
    from spark_states_spark.sources import load_table

    got = {
        (r.src, r.dst): (r.n_transitions, r.p_transition)
        for r in QUERIES["sequence_transition_matrix"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            (F.unix_timestamp("ts") * F.lit(1000000) + F.col("event_id")).alias("k"),
        )
        .collect()
    )
    seqs = defaultdict(list)
    for r in rows:
        seqs[r.user_id].append((r.k, r.event_type))
    counts = Counter()
    for s in seqs.values():
        s.sort()
        for (_, a), (_, b) in zip(s, s[1:]):
            counts[(a, b)] += 1
    src_tot = Counter()
    for (a, _), n in counts.items():
        src_tot[a] += n
    ref = {
        (a, b): (n, float(n) / src_tot[a]) for (a, b), n in counts.items()
    }
    assert got == ref


def test_assoc_lift_python_recompute(spark, sf_dir):
    """Pair supports and lift must equal the python recompute over user
    type-sets; lift must straddle 1 consistently with independence."""
    from collections import Counter, defaultdict

    from spark_states_spark.catalog import QUERIES
    from spark_states_spark.sources import load_table

    got = {
        (r.type_a, r.type_b): (r.n_both, r.lift)
        for r in QUERIES["assoc_event_type_lift"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r.user_id].add(r.event_type)
    n_users = len(baskets)
    supp = Counter()
    both = Counter()
    for types in baskets.values():
        ts = sorted(types)
        for t in ts:
            supp[t] += 1
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                both[(a, b)] += 1
    ref = {
        (a, b): (n, float(n * n_users) / (supp[a] * supp[b]))
        for (a, b), n in both.items()
    }
    assert got == ref


_GUARDED_1E9_ENTRIES = [
    "attribution_last_touch",
    "sequence_transition_matrix",
    "behavior_path_trigrams",
]


def _oob_events_dir(tmp_path) -> str:
    """Fixture-layout events table whose single event_id (2e9) exceeds the
    1e9 packed-ordering bound."""
    t = pa.table(
        {
            "event_id": pa.array([2_000_000_000], pa.int64()),
            "ts": pa.array([_T0 * 1_000_000], pa.timestamp("us")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["view"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    d = str(tmp_path / "oob_fixture")
    os.makedirs(d, exist_ok=True)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


@pytest.mark.parametrize("entry", _GUARDED_1E9_ENTRIES)
def test_behavior_pack_guard_fires_engine_side(spark, tmp_path, entry):
    """ADVICE r11: the 1e9 ordering packs in attribution_last_touch and
    sequence_transition_matrix must fail LOUDLY past their bound — an
    out-of-range event_id reorders IDENTICALLY on both engine and oracle
    sides, so the differential alone can never catch it. Runs the real
    catalog entry against an out-of-bound fixture; assert_true must error
    the job."""
    df = QUERIES[entry](spark, _oob_events_dir(tmp_path))
    with pytest.raises(Exception, match=r"outside \[0, 1e9\)"):
        df.collect()


@pytest.mark.parametrize("entry", _GUARDED_1E9_ENTRIES)
def test_behavior_pack_guard_fires_oracle_side(entry):
    """The DuckDB side of the same ADVICE r11 guard: error() past the
    bound, same contract as the streaming funnel oracle below."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT "
            "CAST(2000000000 AS BIGINT) AS event_id, "
            "TIMESTAMP '2024-01-01 00:00:00' AS ts, "
            "CAST(1 AS BIGINT) AS user_id, 'view' AS event_type, "
            "1.0 AS value, '{}' AS props"
        )
        with pytest.raises(duckdb.Error, match=r"outside \[0, 1e9\)"):
            con.execute(ORACLES[entry]).fetchall()
    finally:
        con.close()


def test_funnel_oracle_packed_key_guard_fires_out_of_range():
    """The streaming funnel oracle's 1e9 ordering pack is fail-loud: an
    event_id outside [0, 1e9) must ERROR the oracle (the kernel holds
    uncapped (t, e) pairs, so a silently reordered pack would be a false
    mismatch/pass — the failure class the guard exists to prevent)."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT "
            "CAST(2000000000 AS BIGINT) AS event_id, "
            "TIMESTAMP '2024-01-01 00:00:00' AS ts, "
            "CAST(1 AS BIGINT) AS user_id, 'view' AS event_type, "
            "1.0 AS value, '{}' AS props"
        )
        import pytest as _pytest

        with _pytest.raises(duckdb.Error, match="outside \\[0, 1e9\\)"):
            con.execute(ORACLES["streaming_funnel_stages"]).fetchall()
    finally:
        con.close()


def test_path_trigrams_python_recompute(spark, sf_dir):
    """Trigram path counts and shares must equal a python recompute of
    per-user 3-grams in packed (ts, event_id) order — the order-2 twin of
    the transition-matrix recompute above."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from spark_states_spark.sources import load_table

    got = {
        (r.e1, r.e2, r.e3): (r.n_paths, r.path_share)
        for r in QUERIES["behavior_path_trigrams"](spark, sf_dir).collect()
    }
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            (F.unix_timestamp("ts") * F.lit(1000000000) + F.col("event_id")).alias("k"),
        )
        .collect()
    )
    seqs = defaultdict(list)
    for r in rows:
        seqs[r.user_id].append((r.k, r.event_type))
    counts = Counter()
    for s in seqs.values():
        s.sort()
        for (_, a), (_, b), (_, c) in zip(s, s[1:], s[2:]):
            counts[(a, b, c)] += 1
    total = sum(counts.values())
    ref = {k: (n, float(n) / total) for k, n in counts.items()}
    assert got == ref


def _events_fixture(tmp_path, name, rows):
    """(event_id, ts_offset_s, user_id, event_type) rows -> fixture dir."""
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(_T0 + r[1]) * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path / name)
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return d


def test_path_trigrams_order2_distinguishes_what_bigrams_cannot(
    spark, tmp_path
):
    """The statistic's reason to exist, pinned: the sequences
    a-b-a-b-a and b-a-b-a-b have IDENTICAL bigram multisets ({ab x2,
    ba x2} each), so sequence_transition_matrix CANNOT separate the two
    histories - but their trigram rows differ (aba x2 + bab x1 vs
    bab x2 + aba x1). Also pins same-second tie-breaking through the
    packed key (order fixed by event_id, not arrival luck)."""
    seq_a = _events_fixture(
        tmp_path, "fx_a",
        [(i + 1, 10 * i, 1, t) for i, t in enumerate("ababa")],
    )
    seq_b = _events_fixture(
        tmp_path, "fx_b",
        [(i + 1, 10 * i, 1, t) for i, t in enumerate("babab")],
    )

    def bigrams(d):
        return {
            (r.src, r.dst): r.n_transitions
            for r in QUERIES["sequence_transition_matrix"](spark, d).collect()
        }

    def trigrams(d):
        return {
            (r.e1, r.e2, r.e3): r.n_paths
            for r in QUERIES["behavior_path_trigrams"](spark, d).collect()
        }

    assert bigrams(seq_a) == bigrams(seq_b)  # order-1 is blind here
    assert trigrams(seq_a) == {("a", "b", "a"): 2, ("b", "a", "b"): 1}
    assert trigrams(seq_b) == {("b", "a", "b"): 2, ("a", "b", "a"): 1}
    # same-second ties: both events in the same second, ids 1 < 2 fix
    # the order through the packed key
    tie = _events_fixture(
        tmp_path, "fx_tie",
        [(1, 0, 7, "x"), (2, 0, 7, "y"), (3, 10, 7, "z")],
    )
    assert trigrams(tie) == {("x", "y", "z"): 1}
