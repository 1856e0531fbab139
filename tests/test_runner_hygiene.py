"""PID-keyed tmp-dir hygiene (ADVICE r05): sweeps must never remove a
still-running process's live checkpoint / restart-run dir, however old,
while reclaiming dead owners' dirs promptly."""

import os
import time

from spark_states_spark.streaming import runner


def _mk(parent, name, age_s=0.0):
    d = os.path.join(parent, name)
    os.makedirs(d)
    if age_s:
        t = time.time() - age_s
        os.utime(d, (t, t))
    return d


def test_sweep_keeps_live_pid_dirs_past_untagged_cutoff(tmp_path):
    parent = str(tmp_path)
    live = _mk(parent, f"ckpt_x_pid{os.getpid()}_abc", age_s=10 * 3600)
    runner.sweep_stale_dirs(parent)
    assert os.path.isdir(live)


def test_sweep_reaps_recycled_pid_dirs_past_secondary_cutoff(tmp_path):
    """ADVICE r06: a recycled PID (or a foreign process through a shared
    /tmp) must not keep a dead session's checkpoint forever. Our own PID
    stands in for the recycled one: this process started long after the
    8-day-old dir, which is exactly the recycling signature."""
    parent = str(tmp_path)
    ancient = _mk(parent, f"ckpt_x_pid{os.getpid()}_abc", age_s=8 * 24 * 3600)
    assert runner.pid_start_time(os.getpid()) is not None  # /proc available
    runner.sweep_stale_dirs(parent)
    assert not os.path.exists(ancient)


def test_sweep_keeps_genuine_old_owner_and_unknowable_start(
    tmp_path, monkeypatch
):
    """A PROVABLY-older-than-the-dir live owner (a genuine >7-day session)
    keeps its checkpoint; so does a live owner whose start time is
    unknowable (no /proc) — deleting a possibly live checkpoint is worse
    than a slow leak."""
    parent = str(tmp_path)
    old_owner = _mk(parent, f"ckpt_x_pid{os.getpid()}_abc", age_s=8 * 24 * 3600)
    monkeypatch.setattr(
        runner, "pid_start_time", lambda pid: time.time() - 30 * 24 * 3600
    )
    runner.sweep_stale_dirs(parent)
    assert os.path.isdir(old_owner)
    monkeypatch.setattr(runner, "pid_start_time", lambda pid: None)
    runner.sweep_stale_dirs(parent)
    assert os.path.isdir(old_owner)


def test_sweep_removes_dead_pid_dirs_immediately(tmp_path):
    parent = str(tmp_path)
    # find a dead pid: walk down from a large value until os.kill ENOSRCH
    pid = 99999
    while runner.pid_alive(pid):
        pid -= 1
    dead = _mk(parent, f"ckpt_x_pid{pid}_abc")  # fresh mtime, dead owner
    runner.sweep_stale_dirs(parent)
    assert not os.path.exists(dead)


def test_sweep_untagged_dirs_fall_back_to_mtime_cutoff(tmp_path):
    parent = str(tmp_path)
    fresh = _mk(parent, "legacy_fresh")
    old = _mk(parent, "legacy_old", age_s=10 * 3600)
    runner.sweep_stale_dirs(parent)
    assert os.path.isdir(fresh)
    assert not os.path.exists(old)


def test_auto_checkpoint_dir_embeds_owner_pid():
    d = runner.auto_checkpoint_dir("t")
    assert runner.owner_pid(os.path.basename(d)) == os.getpid()


def test_owner_pid_parsing():
    assert runner.owner_pid("ckpt_q_pid1234_xyz") == 1234
    assert runner.owner_pid("run_pid77_aaaa") == 77
    assert runner.owner_pid("legacy_dir") is None
