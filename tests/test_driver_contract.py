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


def test_entry_returns_rows(spark, sf_dir_small):
    mod = _load_entry()
    df = mod.entry(spark)
    assert len(df.collect()) > 0


def test_bench_emits_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="q6_forecast_revenue,dedup_exact_keep_first",
        SPARK_GRAFT_CPUS="4",
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
    payload = json.loads(line)
    assert payload["metric"] == "headline_total"
    assert payload["unit"] == "sec"
    assert set(payload["queries"]) == {"q6_forecast_revenue", "dedup_exact_keep_first"}
    assert payload["value"] > 0
