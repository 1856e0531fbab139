"""Guard the driver contract: __spark_entry__ shape and bench.py output.

The driver imports __spark_entry__ fresh and runs bench.py as a script;
these tests fail fast on import rot, name drift between queries() and
oracle_sql(), or a bench that stops emitting its one JSON line.
"""

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_module_shape():
    mod = _load_entry()
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert len(qs) >= 70
    assert set(os_) <= set(qs), "oracle without a matching query"
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in os_.values())


def test_bench_headline_is_well_formed():
    """Every headline entry must resolve in the catalog (a renamed entry
    would crash the official bench run), no duplicates, and the CORE
    best-of-3 tier must stay the historical comparable prefix."""
    sys.path.insert(0, REPO)
    import bench
    from spark_states_spark.catalog import QUERIES

    missing = [q for q in bench.HEADLINE if q not in QUERIES]
    assert not missing, f"headline names not in catalog: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert 0 < bench.N_CORE < len(bench.HEADLINE)
    assert bench.HEADLINE[bench.N_CORE - 1] == "keyed_state_ttl_strict"
    # The comparable round-over-round series is the 98-entry historical
    # prefix (BASELINE.md's split); moving the boundary silently would
    # corrupt every prev-vs-now total the artifact reports.
    assert bench.N_PREFIX == 98
    assert bench.HEADLINE[bench.N_PREFIX] == "agg_cube_orders"


def test_bench_drain_groups_mark_carrier_and_sum():
    """VERDICT r07 #1/#2: the artifact must say which entry carried a
    shared drain and what the group sum is — with every participant
    present, the carrier is the first in run order."""
    sys.path.insert(0, REPO)
    import bench

    timings = {q: 1.0 for q in bench.HEADLINE}
    groups = bench._drain_groups(timings)
    assert set(groups) == {
        "funnel", "wallclock_kv", "cc_labels", "virtual_kv", "interval_fo",
        "embedding_pairs", "minhash_pairs", "topk_exact", "topk_ann",
    }
    wc = groups["wallclock_kv"]
    assert wc["carrier"] == "keyed_state_wallclock_finite_bounds"
    assert wc["sum_s"] == 2.0
    assert groups["funnel"]["carrier"] == "streaming_funnel_stages"
    # The shared full-outer interval-join drain (r14): left_outer runs
    # first in headline order; the semi entry is catalog-only, so the
    # headline group is the three outer-family entries.
    assert groups["interval_fo"]["carrier"] == (
        "streaming_interval_join_left_outer"
    )
    assert groups["interval_fo"]["sum_s"] == 3.0
    # The virtual-clock drain's carrier is whichever participant runs
    # first in headline order — lazy_bounds sits in the r05 block, before
    # the r07 EXTENDED tail's per_query entry.
    assert groups["virtual_kv"]["carrier"] == "keyed_state_ttl_lazy_bounds"
    # The shared embedding-pair materialization (r14): the pair entry
    # runs first in headline order and carries the pipeline; keep_first
    # reads the memo.
    assert groups["embedding_pairs"]["carrier"] == "dedup_embedding_cosine"
    # The shared minhash-pair / top-k materializations (r14): each
    # pipeline's own entry runs first in headline order and carries it;
    # the CC cluster family resp. the recall evaluation read the memos.
    assert groups["minhash_pairs"]["carrier"] == "dedup_minhash_lsh_pairs"
    assert groups["topk_exact"]["carrier"] == "similarity_cosine_topk"
    assert groups["topk_ann"]["carrier"] == "similarity_lsh_ann"
    # A subset run with only one participant present records no group
    # (nothing shared to adjudicate).
    solo = bench._drain_groups({"funnel_state_scan": 1.0})
    assert "funnel" not in solo


def test_bench_regression_tripwire_floors_and_ratio():
    sys.path.insert(0, REPO)
    import bench

    prev = {"a": 1.0, "b": 0.01, "c": 3.0, "d": 1.0}
    now = {"a": 2.5, "b": 0.4, "c": 3.2, "d": 1.9, "e": 9.9}
    rows = bench._regressions_vs_prev(now, prev)
    # a: 2.5/1.0 = 2.5x -> flagged; b: below the 0.5s floor now-side;
    # c: 1.07x; d: 1.9x < 2x; e: no previous measurement.
    assert [r["entry"] for r in rows] == ["a"]
    assert rows[0]["ratio"] == 2.5


def test_bench_ambient_ratio_is_robust_median():
    """VERDICT r09 #2: the artifact's box-noise deflator is the MEDIAN
    per-entry ratio vs the previous full map — robust to a handful of
    genuinely-regressed tails and blind to sub-floor noise entries."""
    sys.path.insert(0, REPO)
    import bench

    prev = {f"e{i}": 1.0 for i in range(10)}
    now = {f"e{i}": 1.27 for i in range(10)}
    now["e0"] = 5.0  # one real regression must not move the ambient median
    prev["tiny"], now["tiny"] = 0.05, 0.19  # both sides below the floor
    now["new_entry"] = 2.0  # no previous measurement -> not comparable
    assert bench._ambient_ratio(now, prev) == 1.27


def test_bench_ambient_ratio_needs_enough_common_entries():
    """A median over a handful of entries measures those entries, not the
    box: bootstrap rounds and tiny subset runs get None, and the deflated
    throughput key is simply absent."""
    sys.path.insert(0, REPO)
    import bench

    prev = {f"e{i}": 1.0 for i in range(7)}
    now = dict(prev)
    assert bench._ambient_ratio(now, prev) is None
    assert bench._ambient_ratio({}, {}) is None


def _synthetic_flags(n, prev_s=1.0, now_s=3.0):
    return [
        {"entry": f"e{i}", "prev_s": prev_s, "now_s": now_s, "ratio": 3.0}
        for i in range(n)
    ]


def test_bench_adjudication_rerulls_all_rows_when_few_flag():
    """<= _SYSTEMIC_FLAGS: every flagged row gets isolated_s, no verdict
    block (the per-row numbers ARE the adjudication)."""
    sys.path.insert(0, REPO)
    import bench

    rows = _synthetic_flags(3)
    reran = []
    out = bench._adjudicate_tripwires(
        rows, rerun=lambda n: (reran.append(n), 1.1)[1],
        prev_queries={}, canary=None,
    )
    assert out is None
    assert reran == ["e0", "e1", "e2"]
    assert all(r["isolated_s"] == 1.1 for r in rows)


def test_bench_adjudication_systemic_when_probe_clears():
    """VERDICT r08 #1 (the synthetic slow-run case): 9+ flags no longer
    skip adjudication — the worst 3 + canary are probed and the artifact
    carries systemic_contention=true when they land at previous levels."""
    sys.path.insert(0, REPO)
    import bench

    rows = _synthetic_flags(9)
    reran = []

    def rerun(n):
        reran.append(n)
        return 0.3 if n == "q1_pricing_summary" else 1.1

    out = bench._adjudicate_tripwires(
        rows, rerun=rerun, prev_queries={"q1_pricing_summary": 0.3},
    )
    # Bounded: exactly worst-3 + the canary, not all nine.
    assert reran == ["e0", "e1", "e2", "q1_pricing_summary"]
    assert out["systemic_contention"] is True
    assert out["flagged_cleared"] is True and out["canary_slow"] is False
    assert out["probe"]["e0"]["isolated_ratio"] == 1.1
    assert out["probe"]["q1_pricing_summary"]["role"] == "canary"
    # Probed rows also carry isolated_s in the regression list itself.
    assert rows[0]["isolated_s"] == 1.1 and "isolated_s" not in rows[3]


def test_bench_adjudication_real_regression_when_probe_stays_slow():
    sys.path.insert(0, REPO)
    import bench

    rows = _synthetic_flags(9)
    # Flagged entries stay 3x slow isolated; the sub-second canary stays
    # fast — the box is quiet, so the regressions are real.
    out = bench._adjudicate_tripwires(
        rows, rerun=lambda n: 0.3 if n == "q1_pricing_summary" else 3.0,
        prev_queries={"q1_pricing_summary": 0.3},
    )
    assert out["systemic_contention"] is False
    assert out["flagged_cleared"] is False and out["canary_slow"] is False


def test_bench_adjudication_canary_slow_means_still_contended():
    """Flagged entries still slow AND the canary slow => the box is still
    contended at probe time; nothing can be concluded against the engine."""
    sys.path.insert(0, REPO)
    import bench

    rows = _synthetic_flags(9)
    out = bench._adjudicate_tripwires(
        rows, rerun=lambda n: 3.0, prev_queries={"q1_pricing_summary": 0.3},
    )
    assert out["canary_slow"] is True
    assert out["systemic_contention"] is True
    assert out["flagged_cleared"] is False


def test_bench_budget_breach_adjudication():
    """VERDICT r11 #1: entries swept over the ~5 s budget get an isolated
    best-of-3 re-run stamped even UNDER the 2× tripwire; entries the
    tripwire already adjudicated reuse that isolated_s (no double re-run);
    drain-group membership is annotated; rows come worst-swept-first."""
    sys.path.insert(0, REPO)
    import bench

    timings = {
        "fast": 1.2,
        "drain_a": 6.5,   # over budget, not tripwired
        "drain_b": 5.5,   # over budget, tripwired (already has isolated_s)
        "solo": 5.1,      # over budget, no drain group
        "band": 5.05,     # over budget swept; isolated lands inside the
                          # 5% verdict noise band (VERDICT r12 #3)
    }
    regressions = [
        {"entry": "drain_b", "prev_s": 2.0, "now_s": 5.5, "ratio": 2.75,
         "isolated_s": 2.1},
    ]
    groups = {"kv": {"entries": ["drain_a", "drain_b"], "carrier": "drain_a",
                     "sum_s": 12.0}}
    reran = []

    def rerun(name):
        reran.append(name)
        return {"drain_a": 4.1, "solo": 5.3, "band": 5.2}[name]

    rows = bench._adjudicate_budget_breaches(
        timings, regressions, rerun, groups
    )
    assert reran == ["drain_a", "solo", "band"]  # drain_b reused, fast skipped
    assert [r["entry"] for r in rows] == ["drain_a", "drain_b", "solo", "band"]
    by = {r["entry"]: r for r in rows}
    assert by["drain_a"]["isolated_s"] == 4.1
    assert by["drain_a"]["isolated_over_budget"] is False
    assert by["drain_a"]["drain_group"] == "kv"
    assert by["drain_b"]["isolated_s"] == 2.1  # reused from the tripwire
    # 5.3 > 5.0 * _BUDGET_VERDICT_BAND (5.25): a real breach even with the
    # noise band; 5.2 sits inside the band — raw isolated_s still stamped,
    # only the verdict boolean tolerates the jitter floor.
    assert by["solo"]["isolated_over_budget"] is True
    assert "drain_group" not in by["solo"]
    assert by["band"]["isolated_s"] == 5.2
    assert by["band"]["isolated_over_budget"] is False
    # nothing over budget -> empty, no re-runs
    assert bench._adjudicate_budget_breaches(
        {"fast": 1.0}, [], rerun, {}
    ) == []


def test_bench_budget_breach_adjudication_is_bounded():
    """The budget adjudicator is capped like every other adjudicator:
    at most _MAX_BUDGET_ADJUDICATIONS fresh best-of-3 re-runs
    (worst-swept first; the rest carry a lost-the-slot note), and a
    systemic-contention verdict from the tripwire path suppresses fresh
    re-runs entirely (a re-run on the contended box proves nothing)
    while tripwire-stamped isolated_s values are still reused."""
    sys.path.insert(0, REPO)
    import bench

    timings = {f"e{i}": 10.0 - i * 0.5 for i in range(8)}  # all over budget
    reran = []
    rows = bench._adjudicate_budget_breaches(
        timings, [], lambda n: (reran.append(n), 4.0)[1], {}
    )
    assert len(reran) == bench._MAX_BUDGET_ADJUDICATIONS
    assert reran == [f"e{i}" for i in range(bench._MAX_BUDGET_ADJUDICATIONS)]
    noted = [r for r in rows if "note" in r]
    assert len(noted) == len(timings) - bench._MAX_BUDGET_ADJUDICATIONS
    assert all("re-run slots" in r["note"] for r in noted)
    assert all("isolated_s" not in r for r in noted)
    # systemic: no fresh re-runs at all; tripwire isolated_s still reused
    reran = []
    rows = bench._adjudicate_budget_breaches(
        {"a": 9.0, "b": 8.0},
        [{"entry": "b", "isolated_s": 3.0}],
        lambda n: (reran.append(n), 4.0)[1],
        {},
        systemic=True,
    )
    assert reran == []
    by = {r["entry"]: r for r in rows}
    assert "systemic" in by["a"]["note"] and "isolated_s" not in by["a"]
    assert by["b"]["isolated_s"] == 3.0


def test_bench_compact_counts_survive_note_only_rows():
    """ADVICE r12: note-only breach rows (slot-capped or systemic-
    suppressed) carry no isolated_over_budget key; the compact-line
    counting must use .get() (the r12 artifact dodged a KeyError only by
    luck) and report them as unadjudicated rather than silently counting
    them under-budget."""
    sys.path.insert(0, REPO)
    import bench

    timings = {f"e{i}": 10.0 - i * 0.5 for i in range(8)}
    rows = bench._adjudicate_budget_breaches(
        timings, [], lambda n: 6.0, {}
    )
    # the exact expressions main() feeds the compact line
    n_over = sum(1 for r in rows if r.get("isolated_over_budget"))
    n_unadj = sum(1 for r in rows if "isolated_over_budget" not in r)
    assert n_over == bench._MAX_BUDGET_ADJUDICATIONS  # rerun stub says 6.0
    assert n_unadj == len(timings) - bench._MAX_BUDGET_ADJUDICATIONS
    assert n_over + n_unadj == len(rows)


def test_bench_systemic_gate_requires_systemic_verdict():
    """ADVICE r12: a tripwire probe that ran but stamped
    systemic_contention=False (regressions reproduced isolated — engine
    implicated, box healthy) must NOT suppress fresh budget re-runs;
    main() now passes bool(contention and contention['systemic_
    contention']), so verify both verdict polarities end-to-end against
    the adjudicator."""
    sys.path.insert(0, REPO)
    import bench

    for verdict, expect_fresh in ((False, True), (True, False)):
        contention = {"systemic_contention": verdict}
        reran = []
        rows = bench._adjudicate_budget_breaches(
            {"a": 9.0},
            [],
            lambda n: (reran.append(n), 4.0)[1],
            {},
            systemic=bool(contention and contention["systemic_contention"]),
        )
        assert (len(reran) > 0) is expect_fresh
        if expect_fresh:
            assert rows[0]["isolated_over_budget"] is False
        else:
            assert "note" in rows[0]


def test_bench_prev_baseline_reads_round_artifacts():
    """_prev_bench must pick up the newest BENCH_r{N}.json round number and
    fall back to bench_result.json for totals the compact line predates."""
    sys.path.insert(0, REPO)
    import bench

    prev = bench._prev_bench()
    assert prev["round"] is not None and prev["round"] >= 7
    # The repo carries a committed full map, so totals must resolve.
    assert prev["core_total"] and prev["prefix_total"]
    assert prev["prefix_total"] >= prev["core_total"]


def test_bench_prev_baseline_prefers_round_artifact_totals(tmp_path):
    """Once the compact line carries totals (r08+), the per-round artifact
    outranks the re-run-overwritable full map; a full-coverage local map
    still supplies the per-entry queries for the tripwire."""
    sys.path.insert(0, REPO)
    import bench

    full_map = {name: 1.0 for name in bench.HEADLINE}
    (tmp_path / "bench_result.json").write_text(json.dumps({
        "queries": full_map
    }))
    (tmp_path / "BENCH_r08.json").write_text(json.dumps({
        "core_total": 41.5, "prefix_total": 119.25
    }))
    (tmp_path / "BENCH_r07.json").write_text(json.dumps({}))
    prev = bench._prev_bench(str(tmp_path))
    assert prev["round"] == 8
    assert prev["core_total"] == 41.5
    assert prev["prefix_total"] == 119.25
    assert prev["source"] == "BENCH_r08.json"
    assert prev["queries"] == full_map
    # Missing everything degrades cleanly.
    empty = bench._prev_bench(str(tmp_path / "nope"))
    assert empty["round"] is None and empty["queries"] == {}


def test_bench_prev_baseline_rejects_dev_subset_leftover(tmp_path):
    """A tiny map left behind by a SPARK_GRAFT_BENCH_QUERIES dev run must
    NOT become the baseline (r14: a 4-entry A/B leftover silently disabled
    the ambient deflator and the tripwire for the next full run) — the
    per-round artifact's slowest-8 takes over as the partial baseline."""
    sys.path.insert(0, REPO)
    import bench

    (tmp_path / "bench_result.json").write_text(json.dumps({
        "queries": {"q1_pricing_summary": 1.0, "keyed_state_ttl_strict": 2.0}
    }))
    (tmp_path / "BENCH_r08.json").write_text(json.dumps({
        "n": 8, "rc": 0, "parsed": {
            "core_total": 41.266, "prefix_total": 174.401,
            "queries": {"streaming_topk_per_day": 14.902},
        },
    }))
    prev = bench._prev_bench(str(tmp_path))
    assert prev["core_total"] == 41.266
    assert prev["source"] == "BENCH_r08.json"
    # The 2-entry leftover is discarded; the artifact's compact slowest-8
    # is the (partial) tripwire baseline instead.
    assert prev["queries"] == {"streaming_topk_per_day": 14.902}


def test_bench_prev_baseline_reads_driver_wrapper(tmp_path):
    """A fresh checkout carries ONLY the driver-recorded BENCH_r{N}.json,
    which wraps the compact line under "parsed" (bench_result.json is
    gitignored) — the baseline must resolve totals from the wrapper and use
    its slowest-8 queries map as a PARTIAL tripwire baseline."""
    sys.path.insert(0, REPO)
    import bench

    (tmp_path / "BENCH_r08.json").write_text(json.dumps({
        "n": 8, "rc": 0, "tail": "...",
        "parsed": {
            "core_total": 41.266, "prefix_total": 174.401,
            "queries": {"streaming_topk_per_day": 14.902},
        },
    }))
    prev = bench._prev_bench(str(tmp_path))
    assert prev["round"] == 8
    assert prev["core_total"] == 41.266
    assert prev["prefix_total"] == 174.401
    assert prev["queries"] == {"streaming_topk_per_day": 14.902}


def test_bench_prev_baseline_reads_committed_full_artifact(tmp_path):
    """r15 (VERDICT r14 #1): with no local bench_result.json, the newest
    committed BENCH_FULL_r{N}.json supplies the full per-entry baseline —
    the ambient deflator and the tripwire must not be starved down to the
    compact line's packed map on a fresh checkout."""
    sys.path.insert(0, REPO)
    import bench

    full_map = {name: 1.0 for name in bench.HEADLINE}
    (tmp_path / "BENCH_FULL_r14.json").write_text(json.dumps({
        "queries": full_map
    }))
    (tmp_path / "BENCH_r14.json").write_text(json.dumps({
        "n": 14, "rc": 0, "parsed": {
            "core_total": 41.266, "prefix_total": 174.401,
            "queries": {"streaming_topk_per_day": 14.902},
        },
    }))
    prev = bench._prev_bench(str(tmp_path))
    assert prev["queries"] == full_map
    # Per-round artifact still outranks for the totals once it has them.
    assert prev["core_total"] == 41.266
    # The packer's keep-carrying contract reads the COMPACT line's names.
    assert prev["compact_names"] == ["streaming_topk_per_day"]
    # A subset BENCH_FULL (pathological) is rejected like a subset local map.
    (tmp_path / "BENCH_FULL_r15.json").write_text(json.dumps({
        "queries": {"q1_pricing_summary": 1.0}
    }))
    prev = bench._prev_bench(str(tmp_path))
    assert prev["queries"] == {"streaming_topk_per_day": 14.902}


def test_bench_compact_query_packer_keeps_prev_names_and_budget():
    """r15 (VERDICT r14 #1): the packed map must (a) carry every entry the
    previous compact line had, (b) then fill slowest-first, (c) never
    exceed the line budget."""
    sys.path.insert(0, REPO)
    import bench

    timings = {f"entry_{i:03d}": float(i) for i in range(120)}
    compact = {"metric": "headline_total", "value": 1.0, "queries": {}}
    prev_names = ["entry_001", "entry_002", "missing_entry"]
    bench._pack_compact_queries(compact, timings, prev_names, budget=400)
    line = json.dumps(compact)
    assert len(line) <= 400
    # Guaranteed names (that were timed) are present despite being fast.
    assert "entry_001" in compact["queries"]
    assert "entry_002" in compact["queries"]
    assert "missing_entry" not in compact["queries"]
    # The rest of the space went to the slowest entries.
    assert "entry_119" in compact["queries"]
    assert len(compact["queries"]) > 3


def test_bench_core_drift_adjudicator():
    """r15 (VERDICT r13 #2 via r14 #1): core-total drift on a quiet box
    triggers bounded isolated re-runs and a residual verdict; a contended
    box (ambient > 1.0) or an under-threshold total does not."""
    sys.path.insert(0, REPO)
    import bench

    core = [f"c{i}" for i in range(8)]
    prev_q = {q: 1.0 for q in core}
    # Broad +30% drift, each entry under the 2x per-entry tripwire.
    timings = {q: 1.3 for q in core}
    reruns = []

    def rerun(name):
        reruns.append(name)
        return 1.0  # isolated numbers land back at baseline

    block = bench._adjudicate_core_drift(
        10.4, 8.0, 0.95, timings, prev_q, rerun, core
    )
    assert block["triggered"] is True
    assert len(reruns) == bench._MAX_CORE_DRIFT_RERUNS
    assert len(block["rows"]) == bench._MAX_CORE_DRIFT_RERUNS
    # 5 of 8 entries re-measured at 1.0 explains 1.5s: residual 8.9 ≤ 8.8
    # fails... residual = 10.4 - 5*0.3 = 8.9 > 8.0*1.10 = 8.8 → still real.
    assert block["residual_core_total"] == 8.9
    assert block["drift_real"] is True
    # Quiet box, small drift: no trigger, ratio still stamped.
    block = bench._adjudicate_core_drift(
        8.2, 8.0, 0.95, timings, prev_q, lambda n: 1.0, core
    )
    assert block["triggered"] is False and block["ratio"] == 1.025
    # Contended box: the ambient ratio already explains the drift.
    block = bench._adjudicate_core_drift(
        10.4, 8.0, 1.3, timings, prev_q, lambda n: 1.0, core
    )
    assert block["triggered"] is False
    # No baseline, or a subset run that didn't time the core set: None.
    assert bench._adjudicate_core_drift(
        10.4, None, 0.95, timings, prev_q, lambda n: 1.0, core
    ) is None
    assert bench._adjudicate_core_drift(
        10.4, 8.0, 0.95, {"c0": 1.3}, prev_q, lambda n: 1.0, core
    ) is None


def test_entry_returns_rows(spark, sf_dir_small):
    mod = _load_entry()
    df = mod.entry(spark)
    assert len(df.collect()) > 0


def test_bench_emits_json_line(tmp_path):
    # Route the subprocess's artifact to a tmp path (VERDICT r05 #2): the
    # default bench_result.json is the round's official loss-proofing
    # artifact and a pytest run after the real bench must not clobber it.
    bench_out = tmp_path / "bench_result.json"
    official = os.path.join(REPO, "bench_result.json")
    before = open(official, "rb").read() if os.path.exists(official) else None
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="q6_forecast_revenue,dedup_exact_keep_first",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_OUT=str(bench_out),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    # The printed line is the driver's bounded-tail capture target (a
    # measured 2000-char tail; _LINE_BUDGET leaves slack for trailing
    # shutdown noise — see bench.py's module docstring).
    import bench
    assert len(line) <= bench._LINE_BUDGET
    payload = json.loads(line)
    assert payload["metric"] == "headline_total"
    assert payload["unit"] == "sec"
    assert payload["value"] > 0
    assert payload["n_queries"] == 2
    assert set(payload["queries"]) == {"q6_forecast_revenue", "dedup_exact_keep_first"}
    # Self-adjudication keys (VERDICT r07 #1/#2) ride the compact line so
    # the driver-recorded BENCH artifact carries them.
    for key in ("core_total", "prefix_total", "prev_core_total",
                "prev_prefix_total", "drain_sums", "n_regressions"):
        assert key in payload, f"compact line lost {key}"
    # The FULL per-query map lands in the file.
    full = json.loads(bench_out.read_text())
    assert set(full["queries"]) == {"q6_forecast_revenue", "dedup_exact_keep_first"}
    assert full["value"] == payload["value"]
    # And the official artifact is bit-identical to before the run.
    after = open(official, "rb").read() if os.path.exists(official) else None
    assert after == before, "bench run clobbered the official bench_result.json"
