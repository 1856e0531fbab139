"""Known-answer semantics for the r11 quality/analytics entries
(text_repetition_ngrams, timeseries_rolling_zscore,
behavior_bounce_rate_daily) on ADVERSARIAL synthetic fixtures the uniform
driver data can't produce — degenerate repetition, constant series, gap
boundaries, single-event sessions — plus a full DuckDB differential of
each entry's oracle on the same fixture, so both engine sides are pinned
on data where the semantics actually discriminate."""

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_states_spark.catalog import ORACLES, QUERIES
from tests.oracle_utils import canonicalize

_T0 = 1704067200  # 2024-01-01 00:00:00 UTC, matches the fixture epoch
_DAY = 86400


def _write(tmp_path, name, table):
    d = str(tmp_path)
    pq.write_table(table, os.path.join(d, f"{name}.parquet"))
    return d


def _docs_table(pairs):
    """documents-schema pa.table from (doc_id, text) pairs — ONE spelling
    of the 5-column fixture layout shared by every test in this file."""
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in pairs], pa.int64()),
            "text": pa.array([s for _, s in pairs], pa.string()),
            "lang": pa.array(["en"] * len(pairs), pa.string()),
            "source": pa.array(["t"] * len(pairs), pa.string()),
            "n_chars": pa.array([len(s) for _, s in pairs], pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    texts = [
        (1, "a b a b c"),      # bigrams ab,ba,ab,bc -> dup 2/4
        (2, "x y z w"),        # all distinct -> 0/3
        (3, "q q q q q"),      # qq x4 -> 4/4
        (4, "solo"),           # 1 token -> filtered out
        (5, ""),               # empty -> filtered out
        (6, "A, b! a B?"),     # normalizes to a b a b -> ab,ba,ab -> 2/3
    ]
    return _write(
        tmp_path_factory.mktemp("repdocs"), "documents", _docs_table(texts)
    )


def test_repetition_known_answers(spark, docs_dir):
    rows = {
        r.doc_id: r
        for r in QUERIES["text_repetition_ngrams"](spark, docs_dir).collect()
    }
    assert set(rows) == {1, 2, 3, 6}  # 4 (one token) and 5 (empty) drop out
    assert (rows[1].n_bigrams, rows[1].n_dup_bigrams) == (4, 2)
    assert rows[1].dup_bigram_frac == 0.5 and bool(rows[1].is_repetitive)
    assert (rows[2].n_bigrams, rows[2].n_dup_bigrams) == (3, 0)
    assert rows[2].dup_bigram_frac == 0.0 and not rows[2].is_repetitive
    assert (rows[3].n_bigrams, rows[3].n_dup_bigrams) == (4, 4)
    assert rows[3].dup_bigram_frac == 1.0
    # tokenizer normalization: punctuation/case fold into the shared toks
    assert (rows[6].n_bigrams, rows[6].n_dup_bigrams) == (3, 2)


@pytest.fixture(scope="module")
def zscore_dir(tmp_path_factory):
    # one event per (day, i) so daily counts are exact: type 'a' counts
    # [1, 2, 3, 4, 4, 4, 4, 4, 4, 40]; type 'b' constant [5] * 9 (variance
    # 0 -> NULL z forever).
    rows = []
    eid = 1
    for day, cnt in enumerate([1, 2, 3, 4, 4, 4, 4, 4, 4, 40]):
        for _ in range(cnt):
            rows.append((eid, day * _DAY, 7, "a"))
            eid += 1
    for day in range(9):
        for _ in range(5):
            rows.append((eid, day * _DAY, 8, "b"))
            eid += 1
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
    return _write(tmp_path_factory.mktemp("zscore"), "events", t)


def test_rolling_zscore_known_answers(spark, zscore_dir):
    rows = {
        (r.event_type, r.day - _T0 // _DAY): r
        for r in QUERIES["timeseries_rolling_zscore"](spark, zscore_dir).collect()
    }
    counts = [1, 2, 3, 4, 4, 4, 4, 4, 4, 40]
    # day 0: empty window; day 1: one prior day -> both NULL
    assert rows[("a", 0)].zscore is None and rows[("a", 0)].n_window_days == 0
    assert rows[("a", 1)].zscore is None and rows[("a", 1)].n_window_days == 1
    # day >= 2: python recompute of the identical expression tree
    for day in range(2, 10):
        w = counts[max(0, day - 7):day]
        c = len(w)
        mean = sum(w) / c
        var = sum(x * x for x in w) / c - mean * mean
        r = rows[("a", day)]
        assert r.n_window_days == c
        if var > 0:
            assert r.zscore == (counts[day] - mean) / math.sqrt(var)
        else:
            assert r.zscore is None
    # the spike day scores extreme positive
    assert rows[("a", 9)].zscore > 5
    # constant series: var 0 on every scored day -> NULL z, never 0.0
    assert all(rows[("b", d)].zscore is None for d in range(9))


@pytest.fixture(scope="module")
def bounce_dir(tmp_path_factory):
    gap_min = 60  # seconds between in-session events
    rows = [
        # user 1: two events 10 min apart on day 0 -> ONE session, no bounce
        (1, 0, 1), (2, 600, 1),
        # user 2: one event day 0 -> bounce
        (3, 100, 2),
        # user 3: two events 31 min apart day 0 -> TWO sessions, 2 bounces
        (4, 0, 3), (5, 31 * 60, 3),
        # user 4: session STARTS day 1 (bucketed by start day), 2 events
        (6, _DAY + 10, 4), (7, _DAY + 10 + gap_min, 4),
        # user 5: single event day 1 -> bounce
        (8, _DAY + 500, 5),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(_T0 + r[1]) * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    return _write(tmp_path_factory.mktemp("bounce"), "events", t)


def test_bounce_rate_known_answers(spark, bounce_dir):
    rows = {
        r.day - _T0 // _DAY: r
        for r in QUERIES["behavior_bounce_rate_daily"](spark, bounce_dir).collect()
    }
    assert set(rows) == {0, 1}
    # day 0: sessions = {u1 x1, u2 x1, u3 x2} = 4; bounces = u2 + u3's two
    assert (rows[0].n_sessions, rows[0].n_bounces) == (4, 3)
    assert rows[0].bounce_rate == 3 / 4
    # day 1: u4 (2 events, no bounce) + u5 (bounce)
    assert (rows[1].n_sessions, rows[1].n_bounces) == (2, 1)
    assert rows[1].bounce_rate == 1 / 2


@pytest.mark.parametrize(
    "entry,table,fixture",
    [
        ("text_repetition_ngrams", "documents", "docs_dir"),
        ("timeseries_rolling_zscore", "events", "zscore_dir"),
        ("behavior_bounce_rate_daily", "events", "bounce_dir"),
        ("behavior_peak_concurrency_daily", "events", "concurrency_dir"),
    ],
)
def test_oracle_differential_on_adversarial_fixture(
    spark, entry, table, fixture, request
):
    """Both engine sides agree on the adversarial fixtures too — the same
    canonicalized compare the driver runs, on data where the semantics
    (degenerate repetition, zero variance, session splits) discriminate."""
    sf_dir = request.getfixturevalue(fixture)
    sdf = QUERIES[entry](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{table}.parquet')"
        )
        res = con.execute(ORACLES[entry])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()
    assert sorted(sdf.columns) == sorted(ocols)
    assert canonicalize(sdf.columns, srows) == canonicalize(ocols, orows)


def test_repetition_randomized_differential(spark, tmp_path):
    """Seeded randomized differential for the sorted-adjacency kernel: 60
    random token sequences (alphabet sized 1-6, so heavy collisions) in
    ONE batched job, each doc's (n_bigrams, n_dup_bigrams) checked against
    a pure-python Counter reference — tail coverage beyond the known
    answers (the adjacency logic's off-by-one space lives here)."""
    import random
    from collections import Counter

    rng = random.Random(11)
    docs = []
    for doc_id in range(60):
        k = rng.randint(2, 40)
        vocab = [f"w{j}" for j in range(rng.randint(1, 6))]
        docs.append((doc_id, " ".join(rng.choice(vocab) for _ in range(k))))
    d = _write(tmp_path, "documents", _docs_table(docs))
    got = {
        r.doc_id: (r.n_bigrams, r.n_dup_bigrams)
        for r in QUERIES["text_repetition_ngrams"](spark, d).collect()
    }
    for doc_id, text in docs:
        toks = text.split()
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        c = Counter(grams)
        want = (len(grams), sum(v for v in c.values() if v > 1))
        assert got[doc_id] == want, (doc_id, text, got[doc_id], want)


@pytest.fixture(scope="module")
def concurrency_dir(tmp_path_factory):
    """Adversarial interval layout: same-instant boundaries (a point
    session inside another, an end meeting a start at the SAME
    microsecond — closed-interval semantics must count both), a
    three-deep peak instant, and a session crossing midnight that must
    contribute to BOTH days' sweeps."""
    rows = [
        # (event_id, ts_offset_s, user_id)
        (1, 100, 1), (2, 700, 1),        # u1 session [100, 700]
        (3, 400, 2),                      # u2 point session [400, 400]
        (4, 650, 3), (5, 1250, 3),        # u3 [650, 1250]
        (6, 1000, 4), (7, 2000, 4),       # u4 [1000, 2000]
        (8, 2000, 5),                     # u5 point at u4's exact end
        (9, 680, 6),                      # u6 point -> 3-deep at t=680
        (10, 86100, 7), (11, 87300, 7),   # u7 [23:55, 00:15] crosses day
        (12, 87000, 8),                   # u8 day-1 point inside u7
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(_T0 + r[1]) * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    return _write(tmp_path_factory.mktemp("conc"), "events", t)


def test_peak_concurrency_known_answers(spark, concurrency_dir):
    rows = {
        r.day - _T0 // _DAY: (r.n_sessions_active, r.peak_concurrent)
        for r in QUERIES["behavior_peak_concurrency_daily"](
            spark, concurrency_dir
        ).collect()
    }
    # day 0: u1-u7 all overlap it (7 sessions); peak 3 at t=680
    # (u1 [100,700] + u3 [650,1250] + u6 point); u5's point at u4's exact
    # end instant gives 2, never 3 (closed intervals, both counted).
    # day 1: u7's tail [86400, 87300] + u8's point at 87000 -> peak 2.
    assert rows == {0: (7, 3), 1: (2, 2)}


def test_peak_concurrency_python_recompute(spark, sf_dir):
    """Daily peaks must equal a python sessionize + boundary-sweep
    recompute over the real fixture."""
    from collections import defaultdict

    from spark_states_spark.sources import load_table

    got = {
        r.day: (r.n_sessions_active, r.peak_concurrent)
        for r in QUERIES["behavior_peak_concurrency_daily"](
            spark, sf_dir
        ).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr("user_id", "event_id", "unix_micros(ts) as ts_us")
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append((r.ts_us, r.event_id))
    gap = 1800 * 1_000_000
    day_us = 86400 * 1_000_000
    sessions = []
    for seq in by_user.values():
        seq.sort()
        start = prev = seq[0][0]
        for ts, _ in seq[1:]:
            if ts - prev >= gap:
                sessions.append((start, prev))
                start = ts
            prev = ts
        sessions.append((start, prev))
    deltas = defaultdict(lambda: defaultdict(int))
    active = defaultdict(int)
    for s, e in sessions:
        for day in range(s // day_us, e // day_us + 1):
            active[day] += 1
            deltas[day][max(s, day * day_us)] += 1
            deltas[day][min(e, (day + 1) * day_us - 1) + 1] -= 1
    ref = {}
    for day, dd in deltas.items():
        c = peak = 0
        for ts in sorted(dd):
            c += dd[ts]
            peak = max(peak, c)
        ref[day] = (active[day], peak)
    assert got == ref


@pytest.mark.parametrize("seed", [7, 23])
def test_peak_concurrency_randomized_vs_python_sweep(spark, tmp_path, seed):
    """Randomized differential: arbitrary event layouts (user collisions,
    same-second ties, multi-day spans, singleton users) against an
    independent python sessionize + boundary-sweep reference."""
    import random
    from collections import defaultdict

    rng = random.Random(seed)
    n = 250
    rows = []
    for eid in range(1, n + 1):
        # offsets cluster inside sessions but jump across gaps and days
        user = rng.randint(1, 12)
        off = rng.choice(
            [rng.randint(0, 3600), rng.randint(0, 3 * 86400)]
        )
        rows.append((eid, off, user))
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [(_T0 + r[1]) * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = _write(tmp_path, "events", t)
    got = {
        r.day: (r.n_sessions_active, r.peak_concurrent)
        for r in QUERIES["behavior_peak_concurrency_daily"](spark, d).collect()
    }
    # independent reference sweep
    by_user = defaultdict(list)
    for eid, off, user in rows:
        by_user[user].append(((_T0 + off) * 1_000_000, eid))
    gap, day_us = 1800 * 1_000_000, 86400 * 1_000_000
    sessions = []
    for seq in by_user.values():
        seq.sort()
        start = prev = seq[0][0]
        for ts, _ in seq[1:]:
            if ts - prev >= gap:
                sessions.append((start, prev))
                start = ts
            prev = ts
        sessions.append((start, prev))
    deltas, active = defaultdict(lambda: defaultdict(int)), defaultdict(int)
    for s, e in sessions:
        for day in range(s // day_us, e // day_us + 1):
            active[day] += 1
            deltas[day][max(s, day * day_us)] += 1
            deltas[day][min(e, (day + 1) * day_us - 1) + 1] -= 1
    ref = {}
    for day, dd in deltas.items():
        c = peak = 0
        for ts in sorted(dd):
            c += dd[ts]
            peak = max(peak, c)
        ref[day] = (active[day], peak)
    assert got == ref
