"""Failure detection + elastic recovery (SURVEY.md §5).

The reference has none of this (crash = lose the fused map, gvom.py:268-274);
these tests pin the replacement story: heartbeat liveness detection, and a
supervised worker that crashes mid-replay and resumes from the last periodic
checkpoint with a bitwise-identical final world."""

import os
import subprocess
import sys
import time

import numpy as np
import pytest

from gvom_tpu.utils.failures import HeartbeatMonitor, resume_latest, supervise

_HERE = os.path.dirname(os.path.abspath(__file__))


def _wait_for(pred, timeout=10.0, poll=0.05):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(poll)
    return False


def test_heartbeat_detects_dead_peer(tmp_path):
    failures = []
    a = HeartbeatMonitor(str(tmp_path), 0, 2, interval_s=0.05, timeout_s=0.3,
                         on_failure=failures.append)
    b = HeartbeatMonitor(str(tmp_path), 1, 2, interval_s=0.05, timeout_s=0.3)
    with a, b:
        assert _wait_for(lambda: a.check_peers() == [])  # both alive
        assert b.check_peers() == []
        b.stop()
        assert _wait_for(lambda: a.dead_peers() == [1], timeout=5.0)
    assert failures and failures[-1] == [1]
    # a restarted peer is seen as alive again
    b2 = HeartbeatMonitor(str(tmp_path), 1, 2, interval_s=0.05, timeout_s=0.3)
    with b2:
        assert _wait_for(lambda: a.check_peers() == [])


def test_resume_latest(tmp_path):
    assert resume_latest(str(tmp_path)) is None
    (tmp_path / "world_b2.npz").write_bytes(b"")
    (tmp_path / "world_b10.npz").write_bytes(b"")
    (tmp_path / "unrelated.txt").write_bytes(b"")
    path, nb = resume_latest(str(tmp_path))
    assert nb == 10 and path.endswith("world_b10.npz")


def _worker_env():
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_supervised_crash_recovery(tmp_path):
    """Kill the worker right after global batch 2 of 4; the supervisor
    restarts it, it resumes from the batch-2 checkpoint and skips the fused
    prefix; final world is bitwise identical to an uninterrupted run."""
    worker = os.path.join(_HERE, "fault_worker.py")

    golden_dir = tmp_path / "golden_ckpt"
    golden_dir.mkdir()
    golden = tmp_path / "golden.npz"
    subprocess.run([sys.executable, worker, str(golden_dir), str(golden)],
                   env=_worker_env(), check=True, timeout=560)

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    out = tmp_path / "out.npz"
    env = _worker_env()
    env["GVOM_FAULT_AT"] = "2"
    codes = supervise([sys.executable, worker, str(ckpt_dir), str(out)],
                      max_restarts=2, env=env)
    assert codes == [17, 0], codes
    # the crash happened mid-log: the fault run really did resume
    assert resume_latest(str(ckpt_dir))[1] == 4

    g, o = np.load(golden), np.load(out)
    for key in ("hit", "evidence", "minh", "mom"):
        np.testing.assert_array_equal(g[key], o[key])


def test_supervised_crash_recovery_with_heartbeat(tmp_path):
    """The full elastic-recovery flow in one piece (ADVICE r2 #1): the worker
    crashes mid-replay WHILE the supervisor watches its heartbeat. The
    restarted worker resets its seq to 1 with the pre-crash heartbeat file
    still on disk — the monitor must treat the change (not an increase) as
    liveness, so the healthy restarted worker is NOT killed and the final
    world still matches the uninterrupted run."""
    worker = os.path.join(_HERE, "fault_worker.py")

    golden_dir = tmp_path / "golden_ckpt"
    golden_dir.mkdir()
    golden = tmp_path / "golden.npz"
    subprocess.run([sys.executable, worker, str(golden_dir), str(golden)],
                   env=_worker_env(), check=True, timeout=560)

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    hb = tmp_path / "hb"
    hb.mkdir()
    out = tmp_path / "out.npz"
    env = _worker_env()
    env["GVOM_FAULT_AT"] = "2"
    codes = supervise(
        [sys.executable, worker, str(ckpt_dir), str(out), str(hb)],
        max_restarts=2, env=env,
        heartbeat_dir=str(hb), heartbeat_timeout_s=120.0,
    )
    assert codes == [17, 0], codes
    assert resume_latest(str(ckpt_dir))[1] == 4

    g, o = np.load(golden), np.load(out)
    for key in ("hit", "evidence", "minh", "mom"):
        np.testing.assert_array_equal(g[key], o[key])


def test_load_resumable_skips_torn_newest(tmp_path):
    """A torn newest checkpoint (crash mid-save on a non-atomic filesystem)
    must fall back to the next-older intact one (ADVICE r2 #2)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gvom_tpu.config import GvomConfig
    from gvom_tpu.types import empty_world_state
    from gvom_tpu.utils.checkpoint import save_world
    from gvom_tpu.utils.failures import load_resumable

    assert load_resumable(str(tmp_path)) is None
    cfg = GvomConfig(xy_size=8, z_size=8, max_points=16, buffer_size=2)
    world = empty_world_state(cfg)
    save_world(str(tmp_path / "world_b3"), world, cfg)
    (tmp_path / "world_b7.npz").write_bytes(b"torn")
    loaded, batches = load_resumable(str(tmp_path))
    assert batches == 3
    np.testing.assert_array_equal(np.asarray(loaded.grid.hit), np.asarray(world.grid.hit))


def test_supervisor_kills_hung_worker(tmp_path):
    """A worker that stops beating (hang, not crash) is killed and the
    restart budget eventually raises — exit codes show the kill."""
    hb = tmp_path / "hb"
    hb.mkdir()
    cmd = [sys.executable, "-c", "import time; time.sleep(60)"]
    with pytest.raises(RuntimeError) as ei:
        supervise(cmd, max_restarts=1, env=_worker_env(),
                  heartbeat_dir=str(hb), heartbeat_timeout_s=0.5,
                  heartbeat_startup_grace_s=0.5, poll_s=0.1)
    assert "exit codes [-9, -9]" in str(ei.value)
