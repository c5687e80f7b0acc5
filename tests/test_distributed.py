"""Cross-process jax.distributed test (SURVEY.md §2.3 item 4, §5 multi-host).

Two OS processes × 4 virtual CPU devices each form one global 8-device
(data, space) mesh; the sharded batched step's collectives cross the process
boundary over Gloo. Output must match the same batch run on the in-process
8-device mesh (all reductions are associative; int-valued maps exact)."""

import os
import socket
import subprocess
import sys

import numpy as np

import jax

from gvom_tpu.config import GvomConfig
from gvom_tpu.parallel.mesh import make_mesh
from gvom_tpu.parallel.sharding import make_batched_step
from gvom_tpu.types import empty_world_state

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_batched_step(tmp_path):
    port = _free_port()
    out = tmp_path / "p0.npz"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "dist_worker.py"), str(pid), "2", str(port), str(out)],
            env=env, cwd=_HERE, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=560)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    got = np.load(out)

    # in-process reference on the virtual 8-device mesh, same batch
    from helpers import dist_scan_batch, singular_fit_mask

    cfg = GvomConfig(xy_size=32, z_size=16, max_points=1024, buffer_size=2)
    scans, masks, egos = dist_scan_batch(cfg, 8)
    mesh = make_mesh(jax.devices()[:8])
    step = make_batched_step(cfg, mesh, raycast_impl="xla")
    world = empty_world_state(cfg)
    world, _ = step(world, scans, masks, egos)
    world, p2 = step(world, scans, masks, egos)

    np.testing.assert_array_equal(got["visibility"], np.asarray(p2.visibility))
    np.testing.assert_array_equal(got["negative"], np.asarray(p2.negative_obstacle))
    np.testing.assert_allclose(got["height"], np.asarray(p2.height), atol=1e-5)
    ref_h = np.asarray(p2.height, dtype=np.float64)
    ok = ~singular_fit_mask(ref_h, cfg.xy_resolution)
    np.testing.assert_array_equal(got["positive"][ok], np.asarray(p2.positive_obstacle)[ok])
    assert int(got["hit_sum"]) == int(np.asarray(world.grid.hit).sum())
    assert got["visibility"].sum() > 0
