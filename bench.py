#!/usr/bin/env python
"""Benchmark: sustained end-to-end mapping throughput on one TPU chip.

Measures the full reference workload per step — one OS1-128-density scan
ingested (transform, voxelize, raycast, metrics) + one full combine (buffer
fusion + previous-map decay + all five 2D map products) — at the reference's
published grid configuration (256×256×64 @ 0.4 m, buffer 4;
/root/reference/launch/gvom_node.launch:9-24). The reference sustained
9-12 Hz for this pipeline on its GPU (README.md:17); vs_baseline is measured
against the 10.5 Hz midpoint.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N, ...}
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    def positive_int(v):
        iv = int(v)
        if iv <= 0:
            raise argparse.ArgumentTypeError("must be a positive integer")
        return iv

    ap.add_argument("--steps", type=positive_int, default=16, help="scans per timed jit call")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--xy-size", type=int, default=256)
    ap.add_argument("--z-size", type=int, default=64)
    ap.add_argument("--points", type=int, default=131072, help="OS1-128 density")
    ap.add_argument("--cpu", action="store_true", help="run on CPU instead of TPU")
    ap.add_argument("--raycast", default="auto", choices=["auto", "matmul", "xla"])
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    from gvom_tpu.config import GvomConfig
    from gvom_tpu.io import synthetic
    from gvom_tpu.models import pipeline
    from gvom_tpu.types import empty_buffer_state, empty_world_state

    cfg = GvomConfig(
        xy_size=args.xy_size,
        z_size=args.z_size,
        max_points=args.points,
        buffer_size=4,
    )

    # --- pre-stage a loop of distinct scans (generation is host-side input prep) ---
    terrain = synthetic.composite_terrain()
    n_distinct = 4
    scans, masks, egos = [], [], []
    ego = np.array([0.5, 0.0, 1.6])
    for i in range(n_distinct):
        ego = ego + np.array([0.45, 0.25, 0.01])
        # channels*az >= max_points so the padded buffer is fully populated
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=128, azimuth_steps=1200, max_range=60.0, seed=i,
            coarse_step=0.5, refine_iters=12,
        )
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        scans.append(pad)
        masks.append(mask)
        egos.append(ego.astype(np.float32))
    scans = jnp.asarray(np.stack(scans))
    masks = jnp.asarray(np.stack(masks))
    egos = jnp.asarray(np.stack(egos))
    if args.verbose:
        print(f"[bench] staged {n_distinct} scans, {int(masks[0].sum())} real points each", file=sys.stderr)

    raycast_impl = args.raycast

    def step(carry, i):
        buf, world = carry
        j = i % n_distinct
        buf, _ = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j], None, raycast_impl)
        world, products, _ = pipeline.combine(cfg, buf, world, egos[j])
        # checksum over every output layer so nothing is dead-code-eliminated
        probe = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)
        return (buf, world), probe

    @jax.jit
    def run(buf, world):
        (buf, world), probe = jax.lax.scan(step, (buf, world), jnp.arange(args.steps))
        return buf, world, probe

    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)

    t0 = time.time()
    out = run(buf, world)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0
    if args.verbose:
        print(f"[bench] first call (compile+run): {compile_and_first:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = run(buf, world)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    scans_per_s = args.steps / best
    baseline_hz = 10.5  # reference 9-12 Hz midpoint (README.md:17)

    result = {
        "metric": "e2e_scan+combine_throughput_1chip_OS1-128_256x256x64",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / baseline_hz, 2),
        "steps": args.steps,
        "best_s": round(best, 4),
        "per_step_ms": round(best / args.steps * 1e3, 2),
        "raycast": raycast_impl,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
