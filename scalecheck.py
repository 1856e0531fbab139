#!/usr/bin/env python
"""Scale-up differential gate (VERDICT r04 #6): the full catalog's oracle
check at sf0.1 — 10× the driver's correctness scale — recorded per round as
SCALECHECK_r{N}.json so scale regressions in new entries (decimal overflow,
candidate explosion, rank-boundary drift) surface the round they land.

Usage: python scalecheck.py [round_number]   (writes SCALECHECK_r{NN}.json)

Same compare as tests/test_oracle.py::test_oracle_differential_sf01 — this
script exists so the gate leaves a per-round artifact instead of only a
transient pytest pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_states_spark.catalog import ORACLES, QUERIES  # noqa: E402
from spark_states_spark.session import build_session  # noqa: E402
from tests.oracle_utils import compare, duckdb_con  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SCALECHECK_DIR", "/root/testdata/sf0.1")


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(SF_DIR)
    failures: dict[str, str] = {}
    t0 = time.time()
    from bench import _unload_state_providers

    entry_s: dict[str, float] = {}
    entry_spark_s: dict[str, float] = {}
    for i, name in enumerate(sorted(ORACLES), 1):
        # Same provider hygiene as bench.py: without it the ~40 streaming
        # entries leave hundreds of RocksDB maintenance threads competing
        # with the rest of the sweep.
        _unload_state_providers(spark)
        te = time.perf_counter()
        tm: dict[str, float] = {}
        try:
            # Build timed separately from compare's collect: iterative
            # entries (connected components' pointer jumping) execute
            # EAGERLY inside the build call via localCheckpoint, so the
            # Spark share must include it, not just the final collect.
            df = QUERIES[name](spark, SF_DIR)
            tm["spark_s"] = time.perf_counter() - te
            # compare() ACCUMULATES its collect time into spark_s.
            problems = compare(df, con, ORACLES[name], timings=tm)
            if problems:
                failures[name] = "; ".join(problems)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            failures[name] = f"error: {exc}"
        # Coarse per-entry wall seconds (VERDICT r05 #7): total includes the
        # DuckDB oracle (which dominates entries with expensive oracles,
        # e.g. recursive-CTE connected components); spark_s isolates the
        # plan-build + collect side — the engine's own regression series
        # for the ~70 catalog entries outside the bench headline set. NOT
        # comparable to bench.py's best-of-N noop-sink numbers.
        entry_s[name] = round(time.perf_counter() - te, 2)
        if "spark_s" in tm:
            entry_spark_s[name] = round(tm["spark_s"], 2)
        status = "FAIL" if name in failures else "ok"
        print(f"[{i}/{len(ORACLES)}] {name}: {status} {entry_s[name]}s", flush=True)
    result = {
        "sf_dir": SF_DIR,
        "n_entries": len(ORACLES),
        "n_pass": len(ORACLES) - len(failures),
        "failures": failures,
        "elapsed_s": round(time.time() - t0, 1),
        "entry_wall_s_incl_oracle": dict(sorted(entry_s.items())),
        "entry_spark_s": dict(sorted(entry_spark_s.items())),
    }
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"SCALECHECK_r{rnd:02d}.json" if rnd else "SCALECHECK.json",
    )
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    con.close()
    spark.stop()
    print(json.dumps({k: v for k, v in result.items() if k != "failures"}))
    print(f"wrote {out}; failures: {sorted(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
