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

    ap.add_argument("--steps", type=positive_int, default=64,
                    help="scans per timed jit call (the axon tunnel adds ~36 ms "
                         "fixed dispatch per call; 64 steps amortize it to <1 ms/scan "
                         "— the steady-state number a resident deployment sees)")
    ap.add_argument("--mode", default="perscan",
                    choices=["perscan", "batched", "combine", "async", "scaling",
                             "scaling-worker"],
                    help="perscan: one combine per scan (reference contract); "
                         "batched: BASELINE config #4 — batch of scans per step, one combine; "
                         "combine: combine_maps alone (the reference's 9-12 Hz headline); "
                         "async: BASELINE config #3 — 2 sensor threads ingesting into the "
                         "facade's ring buffer (buffer=8) while the main thread combines; "
                         "scaling: BASELINE config #5 — batched throughput per device count, "
                         "reports parallel efficiency")
    ap.add_argument("--batch", type=positive_int, default=32, help="scans per step in batched mode")
    ap.add_argument("--devices", default=None,
                    help="scaling mode: comma-separated device counts (default: 1,2,...,all)")
    ap.add_argument("--pipelined", action="store_true",
                    help="perscan mode: combine the PREVIOUS buffer while ingesting the "
                         "current scan (independent subgraphs XLA can overlap; matches the "
                         "reference's async combine-timer contract, products lag one scan)")
    ap.add_argument("--combine-every", type=positive_int, default=None,
                    help="perscan mode: combine once per K scans — the reference's actual "
                         "contract (combine on a 10 Hz timer, async to scan ingest, "
                         "README.md:49; at 100 scans/s, K=8 equals a 12.5 Hz timer). "
                         "K=1 is the strictest form: a full combine per scan. Default: "
                         "run BOTH K=1 and K=8 and print two lines, the contract (K=8) "
                         "line last — that is the driver-parsed headline")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--processes", type=positive_int, default=1,
                    help="scaling mode: run the SAME 8-virtual-device global mesh as "
                         "1 process vs N processes (localhost Gloo via jax.distributed) "
                         "— constant compute, so the ratio isolates the cross-process "
                         "collective cost end-to-end (the DCN analog this box allows)")
    ap.add_argument("--pid", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--total-devices", type=int, default=8, help=argparse.SUPPRESS)
    ap.add_argument("--xy-size", type=int, default=256)
    ap.add_argument("--z-size", type=int, default=64)
    ap.add_argument("--points", type=int, default=131072, help="OS1-128 density")
    ap.add_argument("--cpu", action="store_true", help="run on CPU instead of TPU")
    ap.add_argument("--raycast", default="auto", choices=["auto", "matmul", "xla"])
    ap.add_argument("--combine-impl", default="auto", choices=["auto", "xla", "fused"],
                    help="combine mode: which combine implementation to time")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    if args.mode == "scaling" and args.processes > 1:
        # parent: pure process orchestration — jax must NOT be imported here
        _run_scaling_dist(args)
        return
    if args.mode == "scaling-worker":
        # per-worker virtual device count BEFORE jax import
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.total_devices // args.processes}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax

    if args.cpu or args.mode == "scaling-worker":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    import jax.numpy as jnp

    if args.mode == "scaling-worker":
        _run_scaling_worker(args)
        return

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

    if args.mode == "batched":
        _run_batched(args, cfg, scans, masks, egos, n_distinct)
        return
    if args.mode == "combine":
        _run_combine(args, cfg, scans, masks, egos, n_distinct)
        return
    if args.mode == "async":
        _run_async(args, cfg, terrain)
        return
    if args.mode == "scaling":
        _run_scaling(args, cfg, scans, masks, egos, n_distinct)
        return

    def run_perscan(K):
        def step(carry, i):
            buf, world = carry
            j = i % n_distinct
            if args.pipelined:
                # combine the previous buffer concurrently with this scan's
                # ingest — no data dependence between the two subgraphs. With
                # K > 1 the combine fires once per K scans (the reference's
                # async 10 Hz combine timer, README.md:49, made explicit).
                def do_combine(bw):
                    b, w = bw
                    w, products, _ = pipeline.combine(cfg, b, w, egos[j])
                    return w, sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)

                if K > 1:
                    world, probe = jax.lax.cond(
                        i % K == 0, do_combine, lambda bw: (bw[1], jnp.float32(0.0)), (buf, world)
                    )
                else:
                    world, probe = do_combine((buf, world))
                buf, _ = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j], None, raycast_impl)
            elif K > 1:
                buf, _ = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j], None, raycast_impl)

                def do_combine(bw):
                    b, w = bw
                    w, products, _ = pipeline.combine(cfg, b, w, egos[j])
                    return w, sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)

                world, probe = jax.lax.cond(
                    (i + 1) % K == 0, do_combine, lambda bw: (bw[1], jnp.float32(0.0)), (buf, world)
                )
            else:
                buf, _ = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j], None, raycast_impl)
                world, products, _ = pipeline.combine(cfg, buf, world, egos[j])
                probe = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)
            # probe: checksum over every output layer so nothing is DCE'd
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
            "metric": f"e2e_scan+combine_throughput_1chip_{args.points}pts_{args.xy_size}x{args.xy_size}x{args.z_size}",
            "value": round(scans_per_s, 2),
            "unit": "scans/s",
            "vs_baseline": round(scans_per_s / baseline_hz, 2),
            "steps": args.steps,
            "best_s": round(best, 4),
            "per_step_ms": round(best / args.steps * 1e3, 2),
            "raycast": raycast_impl,
            "pipelined": bool(args.pipelined),
            "device": str(jax.devices()[0]),
        }
        if K > 1:
            result["combine_every"] = K
            result["combine_hz"] = round(scans_per_s / K, 2)  # the reference timer analog
        return result

    if args.combine_every is not None:
        print(json.dumps(run_perscan(args.combine_every)))
        return

    # Default invocation (what the driver runs): BOTH forms, the
    # reference-contract line LAST as the parsed metric. The reference's own
    # contract runs combine on an async 10 Hz timer, not per scan
    # (/root/reference/README.md:49; launch combine rate 10 Hz) — so the
    # headline form ingests every scan and combines once per 8 scans
    # (combine_hz ≈ value/8 ≥ 10 at the measured rates), while the strict
    # form (a FULL combine every scan — 8-12× the reference's combine work
    # per scan) is recorded alongside it. See BENCHMARKS.md.
    strict = run_perscan(1)
    print(json.dumps(dict(strict, metric=strict["metric"] + "_strict")), flush=True)
    contract = run_perscan(8)
    contract["strict_scans_per_s"] = strict["value"]
    print(json.dumps(contract))


def _run_combine(args, cfg, scans, masks, egos, n_distinct):
    """combine_maps latency alone: the reference's published headline is
    sustaining this at 9-12 Hz on a Quadro RTX 4000 (README.md:17). The
    buffer is pre-filled with real scans; each timed step re-fuses the
    buffer + the previous world (with a perturbed world so no step can be
    CSE'd away) and derives all five map products."""
    import time

    import jax
    import jax.numpy as jnp

    from gvom_tpu.models import pipeline
    from gvom_tpu.types import empty_buffer_state, empty_world_state

    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    ing = jax.jit(lambda b, p, m, e: pipeline.ingest_and_insert(cfg, b, p, m, e, None, args.raycast))
    for i in range(cfg.buffer_size):
        buf, _ = ing(buf, scans[i % n_distinct], masks[i % n_distinct], egos[i % n_distinct])
    ego = egos[(cfg.buffer_size - 1) % n_distinct]

    def step(carry, i):
        buf, world = carry
        # perturb the world's hit counts by a data-dependent 0/1 so each
        # iteration's combine depends on the previous one (no CSE, no overlap)
        world, products, _ = pipeline.combine(cfg, buf, world, ego, impl=args.combine_impl)
        probe = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)
        bump = (probe > -1.0).astype(jnp.int32)  # always 1, but data-dependent
        world = world._replace(grid=world.grid._replace(hit_pk=world.grid.hit_pk + bump))
        return (buf, world), probe

    # buf must be an ARGUMENT, not a closure: closed-over device arrays are
    # serialized as literals into the lowered program, and the ~0.9 GB buffer
    # exceeds the axon tunnel's remote-compile request limit (HTTP 413)
    @jax.jit
    def run(buf, world):
        (_, world), probe = jax.lax.scan(step, (buf, world), jnp.arange(args.steps))
        return world, probe

    out = run(buf, world)
    jax.block_until_ready(out)
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = run(buf, world)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    hz = args.steps / best
    result = {
        "metric": f"combine_maps_rate_1chip_{args.xy_size}x{args.xy_size}x{args.z_size}_buffer4",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / 10.5, 2),
        "steps": args.steps,
        "best_s": round(best, 4),
        "per_combine_ms": round(best / args.steps * 1e3, 3),
        "impl": args.combine_impl,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


def _run_async(args, cfg, terrain):
    """BASELINE config #3: the reference's async contract — two sensor
    threads call process_pointcloud into the ring buffer (buffer=8, README
    advises > 2× sensor count) while the main thread runs combine_maps
    back-to-back. Reports sustained combine Hz (the 9-12 Hz headline) with
    the concurrent ingest load, plus aggregate scans/s ingested."""
    import dataclasses
    import threading
    import time

    import jax
    import numpy as np

    from gvom_tpu.engine.gvom import Gvom
    from gvom_tpu.io import synthetic

    cfg = dataclasses.replace(cfg, buffer_size=8)
    engine = Gvom(config=cfg, raycast_impl=args.raycast)

    # two sensors at poses a half-meter apart, distinct scan loops each
    n_per = 3
    sensor_scans = []
    for s in range(2):
        ego = np.array([0.5 + 0.5 * s, 0.3 * s, 1.6])
        rows = []
        for i in range(n_per):
            ego = ego + np.array([0.45, 0.25, 0.01])
            pts = synthetic.simulate_lidar_scan(
                terrain, ego, channels=128, azimuth_steps=1200, max_range=60.0,
                seed=10 * s + i, coarse_step=0.5, refine_iters=12,
            )
            rows.append((pts, ego.copy()))
        sensor_scans.append(rows)

    # compile both paths before timing
    engine.process_pointcloud(*sensor_scans[0][0])
    engine.combine_maps()

    stop = threading.Event()
    counts = [0, 0]

    def producer(s):
        # pace to a real sensor rate (OS1 spins at 10/20 Hz) and sync each
        # scan like the reference's per-scan cell-count copy (gvom.py:147).
        # An unthrottled hot loop floods the single device stream: the
        # combine's host sync then waits behind an unbounded ingest backlog
        # and the bench appears to hang (measured: >30 min without output).
        period = 1.0 / 20.0
        nxt = time.monotonic()
        i = 0
        while not stop.is_set():
            pts, ego = sensor_scans[s][i % n_per]
            ok = engine.process_pointcloud(pts, ego)
            if ok is not None:
                ok.block_until_ready()
            counts[s] += 1
            i += 1
            nxt += period
            delay = nxt - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            else:
                nxt = time.monotonic()

    threads = [threading.Thread(target=producer, args=(s,), daemon=True) for s in range(2)]
    for t in threads:
        t.start()
    time.sleep(0.2)  # let producers fill the buffer

    best = None
    total_scans = 0
    for _ in range(max(1, args.repeats)):
        c0 = sum(counts)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = engine.combine_maps()
        jax.block_until_ready(engine.world_state)
        dt = time.perf_counter() - t0
        total_scans += sum(counts) - c0
        if best is None or dt < best:
            best = dt
            scans_in_window = sum(counts) - c0
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert out is not None
    hz = args.steps / best
    result = {
        "metric": f"async_combine_rate_2sensors_buffer8_{args.xy_size}x{args.xy_size}x{args.z_size}",
        "value": round(hz, 2),
        "unit": "Hz",
        "vs_baseline": round(hz / 10.5, 2),
        "steps": args.steps,
        "best_s": round(best, 4),
        "ingest_scans_per_s": round(scans_in_window / best, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


def _batched_ray_budget(cfg, B):
    """Static DDA budget for the bench's batched modes: centered bound + the
    worst in-batch ego drift. The bench advances egos 0.02/0.01 m per scan
    within a batch (see the step functions), so the drift from the batch's
    last scan is (B−1)·0.02 m — the same bound engine.replay.batched_replay
    derives from a real log's egos."""
    import dataclasses
    import math

    if cfg.ray_steps_override is not None:
        return cfg
    drift_vox = (B - 1) * 0.02 / min(cfg.xy_resolution, cfg.z_resolution)
    return dataclasses.replace(
        cfg,
        ray_steps_override=min(
            max(cfg.xy_size, cfg.z_size) // 2 + 6 + int(math.ceil(drift_vox)),
            max(cfg.xy_size, cfg.z_size) + 4,
        ),
    )


def _run_batched(args, cfg, scans, masks, egos, n_distinct):
    """BASELINE config #4 (single host): a batch of B (scan, ego) pairs per
    step into the sharded world grid, ONE combine + map derivation per step —
    the replayed-log workload. scans/s = B·steps / wall."""
    import time

    import jax
    import jax.numpy as jnp

    from gvom_tpu.parallel.mesh import make_mesh
    from gvom_tpu.parallel.sharding import make_batched_step
    from gvom_tpu.types import empty_world_state

    B = args.batch
    mesh = make_mesh(jax.devices()[:1])
    cfg = _batched_ray_budget(cfg, B)
    bstep = make_batched_step(cfg, mesh, raycast_impl=args.raycast)

    reps = jnp.arange(B, dtype=jnp.int32) % n_distinct
    bscans = scans[reps]
    bmasks = masks[reps]
    begos_base = egos[reps]

    def step(carry, i):
        world, ego0 = carry
        # egos advance each step so the origin moves (re-origin is exercised);
        # scan POINTS translate rigidly with their assigned ego — a replayed
        # log's scans are captured AT their ego, so per-step work stays
        # constant. (The r1-r3 form replayed fixed points from egos drifting
        # ~0.3 m/step away, so ray lengths — and the raycast stream — grew
        # with step count: 11.1 ms/scan at 4 steps vs 14.8 at 64. That
        # workload growth was the whole r3 "batched regression".)
        begos = ego0[None, :] + jnp.arange(B, dtype=jnp.float32)[:, None] * jnp.array([0.02, 0.01, 0.0], jnp.float32)
        shift = (begos - begos_base).astype(jnp.float32)
        world, products = bstep(world, bscans + shift[:, None, :], bmasks, begos)
        probe = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)
        return (world, ego0 + jnp.array([0.3, 0.15, 0.0], jnp.float32)), probe

    @jax.jit
    def run(world, ego0):
        (world, _), probe = jax.lax.scan(step, (world, ego0), jnp.arange(args.steps))
        return world, probe

    world = empty_world_state(cfg)
    ego0 = egos[0]
    t0 = time.time()
    out = run(world, ego0)
    jax.block_until_ready(out)
    compile_and_first = time.time() - t0
    if args.verbose:
        print(f"[bench] first call (compile+run): {compile_and_first:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        out = run(world, ego0)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    total_scans = B * args.steps
    scans_per_s = total_scans / best
    result = {
        "metric": f"batched_replay_throughput_1chip_{args.points}pts_{args.xy_size}x{args.xy_size}x{args.z_size}",
        "value": round(scans_per_s, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_s / 10.5, 2),
        "batch": B,
        "steps": args.steps,
        "best_s": round(best, 4),
        "per_scan_ms": round(best / total_scans * 1e3, 3),
        "raycast": args.raycast,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


def _run_scaling(args, cfg, scans, masks, egos, n_distinct):
    """BASELINE config #5: weak-scaling efficiency of the sharded batched
    step — per-device batch held at --batch while the device count grows;
    value = throughput(all devices) / (N × throughput(1))."""
    import time

    import jax
    import jax.numpy as jnp

    from gvom_tpu.parallel.mesh import make_mesh
    from gvom_tpu.parallel.sharding import make_batched_step
    from gvom_tpu.types import empty_world_state

    all_dev = jax.devices()
    if args.devices:
        counts = [int(c) for c in args.devices.split(",")]
        bad = [c for c in counts if c > len(all_dev) or c < 1]
        if bad:
            raise SystemExit(
                f"--devices {bad} exceed the {len(all_dev)} visible device(s); "
                f"use --cpu with XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"for a virtual mesh"
            )
    else:
        counts = []
        c = 1
        while c <= len(all_dev):
            counts.append(c)
            c *= 2
        if counts[-1] != len(all_dev):
            counts.append(len(all_dev))

    per_count = {}
    for ndev in counts:
        mesh = make_mesh(all_dev[:ndev])
        B = args.batch * ndev
        bstep = make_batched_step(_batched_ray_budget(cfg, B), mesh, raycast_impl=args.raycast)
        reps = jnp.arange(B, dtype=jnp.int32) % n_distinct
        bscans = scans[reps]
        bmasks = masks[reps]
        begos_base = egos[reps]

        def step(carry, i):
            world, ego0 = carry
            begos = ego0[None, :] + jnp.arange(B, dtype=jnp.float32)[:, None] * jnp.array(
                [0.02, 0.01, 0.0], jnp.float32
            )
            shift = (begos - begos_base).astype(jnp.float32)   # rigid replay (see _run_batched)
            world, products = bstep(world, bscans + shift[:, None, :], bmasks, begos)
            probe = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)
            return (world, ego0 + jnp.array([0.3, 0.15, 0.0], jnp.float32)), probe

        @jax.jit
        def run(world, ego0):
            (world, _), probe = jax.lax.scan(step, (world, ego0), jnp.arange(args.steps))
            return world, probe

        world = empty_world_state(cfg)
        out = run(world, egos[0])
        jax.block_until_ready(out)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = run(world, egos[0])
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        per_count[ndev] = B * args.steps / best
        if args.verbose:
            print(f"[bench] {ndev} devices: {per_count[ndev]:.1f} scans/s", file=sys.stderr)

    n_max = counts[-1]
    eff = per_count[n_max] / (n_max * per_count[counts[0]] / counts[0])
    result = {
        "metric": f"weak_scaling_efficiency_{n_max}dev_batch{args.batch}perdev",
        "value": round(eff, 3),
        "unit": "efficiency",
        "vs_baseline": round(eff / 0.8, 2),  # BASELINE north star: >=80%
        "scans_per_s": {str(k): round(v, 1) for k, v in per_count.items()},
        "steps": args.steps,
        "raycast": args.raycast,
        "devices": counts,
        "platform": str(all_dev[0].platform),
    }
    print(json.dumps(result))


def _stage_light(cfg, n_distinct=4):
    """Deterministic light scan staging for the CPU scaling workers."""
    import numpy as np

    from gvom_tpu.io import synthetic

    terrain = synthetic.composite_terrain()
    scans, masks, egos = [], [], []
    ego = np.array([0.5, 0.0, 1.6])
    for i in range(n_distinct):
        ego = ego + np.array([0.45, 0.25, 0.01])
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=32, azimuth_steps=max(64, cfg.max_points // 32),
            max_range=30.0, seed=i,
        )
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        scans.append(pad)
        masks.append(mask)
        egos.append(ego.astype(np.float32))
    return np.stack(scans), np.stack(masks), np.stack(egos)


def _run_scaling_worker(args):
    """One process of the N-process distributed scaling run (CPU+Gloo)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gvom_tpu.config import GvomConfig
    from gvom_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS, init_distributed, make_mesh
    from gvom_tpu.parallel.sharding import make_batched_step, world_pspecs
    from gvom_tpu.types import empty_world_state

    if args.processes > 1:
        init_distributed(
            coordinator=f"127.0.0.1:{args.port}",
            num_processes=args.processes,
            process_id=args.pid,
        )
    assert len(jax.devices()) == args.total_devices, (len(jax.devices()), args.total_devices)

    cfg = GvomConfig(xy_size=args.xy_size, z_size=args.z_size,
                     max_points=args.points, buffer_size=4)
    n_distinct = 4
    scans_np, masks_np, egos_np = _stage_light(cfg, n_distinct)

    mesh = make_mesh(jax.devices())
    B = args.batch * args.total_devices
    reps = np.arange(B) % n_distinct
    bscans, bmasks = scans_np[reps], masks_np[reps]
    begos = egos_np[reps] + (np.arange(B, dtype=np.float32)[:, None]
                             * np.array([0.02, 0.01, 0.0], np.float32))

    def to_global(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])

    gs = to_global(bscans, P((DATA_AXIS, SPACE_AXIS), None, None))
    gm = to_global(bmasks, P((DATA_AXIS, SPACE_AXIS), None))
    ge = to_global(begos, P((DATA_AXIS, SPACE_AXIS), None))

    step = make_batched_step(_batched_ray_budget(cfg, B), mesh, raycast_impl="xla")
    world = jax.device_put(
        empty_world_state(cfg),
        jax.tree_util.tree_map(lambda spec: NamedSharding(mesh, spec), world_pspecs(),
                               is_leaf=lambda x: isinstance(x, P)),
    )

    # warm up (compile), then timed repeats of --steps sequential fused steps
    w, _ = step(world, gs, gm, ge)
    jax.block_until_ready(w)
    times = []
    for _ in range(max(1, args.repeats)):
        w = world
        t0 = time.perf_counter()
        for _ in range(args.steps):
            w, _ = step(w, gs, gm, ge)
        jax.block_until_ready(w)
        times.append(time.perf_counter() - t0)
    best = min(times)
    if args.pid == 0:
        print(json.dumps({"worker_best_s": best, "batch_total": B, "steps": args.steps}))


def _run_scaling_dist(args):
    """Parent: time the SAME global mesh as 1 process vs N processes.

    Constant devices and per-device batch ⇒ constant compute; the runtime
    ratio is the end-to-end cost of crossing the process boundary (Gloo over
    localhost — the DCN analog available on this box). Artifact for
    SURVEY §2.3 item 4 / BASELINE's multi-host scaling row."""
    import socket
    import subprocess

    here = os.path.abspath(__file__)

    def launch(procs):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        workers = []
        for pid in range(procs):
            cmd = [
                sys.executable, here, "--mode", "scaling-worker",
                "--processes", str(procs), "--pid", str(pid), "--port", str(port),
                "--total-devices", str(args.total_devices),
                "--xy-size", str(args.xy_size), "--z-size", str(args.z_size),
                "--points", str(args.points), "--batch", str(args.batch),
                "--steps", str(args.steps), "--repeats", str(args.repeats),
            ]
            env = dict(os.environ)
            workers.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, env=env))
        outs = [w.communicate(timeout=3600)[0] for w in workers]
        for w in workers:
            if w.returncode != 0:
                raise SystemExit(f"scaling worker failed (rc={w.returncode})")
        for o in outs:
            for line in o.splitlines():
                if line.startswith("{"):
                    return json.loads(line)
        raise SystemExit("no worker JSON found")

    r1 = launch(1)
    rn = launch(args.processes)
    t1, tn = r1["worker_best_s"], rn["worker_best_s"]
    result = {
        "metric": f"dist_scaling_{args.total_devices}dev_{args.processes}proc_gloo",
        "value": round(t1 / tn, 3),
        "unit": "1proc/Nproc runtime ratio (1.0 = free process boundary)",
        "vs_baseline": round((t1 / tn) / 0.8, 2),
        "best_s_1proc": round(t1, 4),
        f"best_s_{args.processes}proc": round(tn, 4),
        "scans_per_s_1proc": round(r1["batch_total"] * r1["steps"] / t1, 2),
        f"scans_per_s_{args.processes}proc": round(rn["batch_total"] * rn["steps"] / tn, 2),
        "batch_total": r1["batch_total"],
        "steps": args.steps,
        "grid": [args.xy_size, args.xy_size, args.z_size],
        "points": args.points,
        "note": "same 8-virtual-CPU-device mesh both runs; ratio isolates the cross-process (Gloo) collective cost at constant compute",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
