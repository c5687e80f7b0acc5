"""On-chip facade dispatch-rate artifact (VERDICT r3 ask #6).

The r3 async bench (config #3) paced producers to real sensor rates and
synced per scan, so each facade call paid the axon tunnel's ~25-70 ms RTT —
it measured the tunnel, not the facade. This script pins the RESIDENT-host
numbers the deployment sees:

  * ingest burst: N process_pointcloud dispatches with NO per-scan sync,
    one block at the end — JAX's async dispatch overlaps host->device
    submission with device work, which is exactly how a resident node runs.
    total/N = device ingest cost + per-dispatch host overhead.
  * combine_maps: the facade's per-call `bool(ok)` host sync is part of its
    contract (the reference syncs per combine too), so its per-call wall
    here still contains ONE tunnel RTT; the device-side cost is the
    combine-mode bench (3.3 ms). Both are printed.

Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from gvom_tpu.config import GvomConfig
from gvom_tpu.engine import Gvom
from gvom_tpu.io import synthetic


def main():
    n_burst = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    if "--cpu" in sys.argv:
        # no-tunnel control: the facade's OWN per-call overhead (python,
        # padding, lock, dispatch) at a tiny grid on the local CPU backend —
        # isolates the tunnel's share of the TPU per-call number
        jax.config.update("jax_platforms", "cpu")
        cfg = GvomConfig(xy_size=32, z_size=16, max_points=512, buffer_size=8)
    else:
        cfg = GvomConfig(xy_size=256, z_size=64, max_points=131072, buffer_size=8)
    eng = Gvom(config=cfg)
    terrain = synthetic.composite_terrain()
    scans = []
    ego = np.array([0.5, 0.0, 1.6])
    for i in range(4):
        ego = ego + np.array([0.45, 0.25, 0.01])
        ch = 8 if "--cpu" in sys.argv else 128
        az = 64 if "--cpu" in sys.argv else 1200
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=ch, azimuth_steps=az, max_range=60.0,
            seed=i, coarse_step=0.5, refine_iters=12)
        scans.append((pts, ego.copy()))

    # warm up both graphs
    ok = eng.process_pointcloud(*scans[0])
    ok.block_until_ready()
    eng.combine_maps()

    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n_burst):
            ok = eng.process_pointcloud(*scans[i % 4])
        ok.block_until_ready()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({
        "metric": "facade_ingest_burst_rate_" + ("cpu_ctrl" if "--cpu" in sys.argv else "1chip_131072pts_256x256x64"),
        "value": round(n_burst / best, 2), "unit": "scans/s",
        "per_call_ms": round(best / n_burst * 1e3, 2), "n": n_burst,
        "sync": "none (async dispatch, one terminal block)",
        "device": str(jax.devices()[0]),
    }))

    n_cmb = 24
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_cmb):
            eng.combine_maps()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({
        "metric": "facade_combine_rate_" + ("cpu_ctrl" if "--cpu" in sys.argv else "1chip_buffer8"),
        "value": round(n_cmb / best, 2), "unit": "Hz",
        "per_call_ms": round(best / n_cmb * 1e3, 2), "n": n_cmb,
        "sync": "per-call bool(ok) host sync (facade contract) — each call "
                "carries one tunnel RTT on this box",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
