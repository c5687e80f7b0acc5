"""Per-stage device timing of the bench graph on the real TPU.

Times each pipeline stage as its own amortized lax.scan loop (64 steps per
jit call — same amortization as bench.py), so per-stage wall numbers are
directly comparable with the end-to-end bench. Stage graphs chain a probe
through the carry so no step can be CSE'd or overlapped away.

Usage:  python scratch/profile_step.py [--steps 64] [--points 131072]
        [--xy-size 256] [--z-size 64] [--stages raycast,moments,...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from gvom_tpu.config import GvomConfig
from gvom_tpu.io import synthetic
from gvom_tpu.models import pipeline
from gvom_tpu.ops import binning, maps2d, moments, raycast
from gvom_tpu.ops import grid as gridops
from gvom_tpu.types import empty_buffer_state, empty_world_state


def stage_scans(cfg, n_distinct=4):
    terrain = synthetic.composite_terrain()
    scans, masks, egos = [], [], []
    ego = np.array([0.5, 0.0, 1.6])
    for i in range(n_distinct):
        ego = ego + np.array([0.45, 0.25, 0.01])
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=128, azimuth_steps=1200, max_range=60.0, seed=i,
            coarse_step=0.5, refine_iters=12,
        )
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        scans.append(pad)
        masks.append(mask)
        egos.append(ego.astype(np.float32))
    return (jnp.asarray(np.stack(scans)), jnp.asarray(np.stack(masks)),
            jnp.asarray(np.stack(egos)))


def timed(name, fn, args, steps, repeats=3):
    """fn(carry, i) -> (carry, probe); scanned `steps` times per call."""

    @jax.jit
    def run(a):
        carry, probe = jax.lax.scan(fn, a, jnp.arange(steps))
        return carry, probe

    out = run(args)
    jax.block_until_ready(out)
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(args)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    ms = best / steps * 1e3
    print(json.dumps({"stage": name, "ms_per_step": round(ms, 3),
                      "best_s": round(best, 4), "steps": steps}))
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--xy-size", type=int, default=256)
    ap.add_argument("--z-size", type=int, default=64)
    ap.add_argument("--stages", default="")
    ap.add_argument("--combine-impl", default="auto",
                    help="combine impl for the combine/full/contract stages")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = GvomConfig(xy_size=args.xy_size, z_size=args.z_size,
                     max_points=args.points, buffer_size=4)
    scans, masks, egos = stage_scans(cfg)
    nd = scans.shape[0]
    print(f"[profile] device: {jax.devices()[0]}", file=sys.stderr)
    want = set(args.stages.split(",")) if args.stages else None

    def on(name):
        return want is None or name in want

    S = args.steps

    # --- prepare_points + origin (host-side input prep analog) ---
    if on("prep"):
        def prep(carry, i):
            (dummy,) = carry
            j = i % nd
            p, keep = binning.prepare_points(cfg, scans[j], masks[j], egos[j] + dummy)
            o = gridops.compute_origin(cfg, egos[j] + dummy)
            probe = jnp.sum(p) + jnp.sum(keep) + jnp.sum(o)
            return (dummy + 0.0 * probe.astype(jnp.float32) * 0,), probe

        timed("prep", prep, (jnp.float32(0.0),), S, args.repeats)

    # --- raycast (geometry + sort + hist kernels + placement) ---
    if on("raycast"):
        def rc(carry, i):
            (dummy,) = carry
            j = i % nd
            e = egos[j] + dummy
            p, keep = binning.prepare_points(cfg, scans[j], masks[j], e)
            o = gridops.compute_origin(cfg, e)
            passes = raycast.ray_pass_counts(cfg, p, keep, e, o)
            probe = jnp.sum(passes).astype(jnp.float32)
            return (dummy + 0.0 * probe,), probe

        timed("prep+raycast", rc, (jnp.float32(0.0),), S, args.repeats)

    # --- moments kernel (sort + matmul ladder + xbox epilogue) ---
    if on("moments"):
        from gvom_tpu.ops import pallas_kernels

        def mom(carry, i):
            (dummy,) = carry
            j = i % nd
            e = egos[j] + dummy
            p, keep = binning.prepare_points(cfg, scans[j], masks[j], e)
            o = gridops.compute_origin(cfg, e)
            hit, mh, mo = pallas_kernels.fused_point_moments(cfg, p, keep, o)
            probe = (jnp.sum(hit) + jnp.sum(mh) + jnp.sum(mo)).astype(jnp.float32)
            return (dummy + 0.0 * probe,), probe

        timed("prep+moments", mom, (jnp.float32(0.0),), S, args.repeats)

    # --- full ingest (everything device-side up to the grid) ---
    if on("ingest"):
        def ing(carry, i):
            (dummy,) = carry
            j = i % nd
            g, ok = pipeline.ingest_scan(cfg, scans[j], masks[j], egos[j] + dummy)
            probe = (jnp.sum(g.hit) + jnp.sum(g.miss) + jnp.sum(g.min_height)
                     + jnp.sum(g.mom)).astype(jnp.float32)
            return (dummy + 0.0 * probe,), probe

        timed("ingest", ing, (jnp.float32(0.0),), S, args.repeats)

    # --- ingest + buffer insert ---
    if on("insert"):
        def ii(carry, i):
            buf = carry
            j = i % nd
            buf, ok = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j])
            return buf, ok.astype(jnp.float32)

        timed("ingest+insert", ii, empty_buffer_state(cfg), S, args.repeats)

    # --- combine alone (prefilled buffer; world chained) ---
    if on("combine"):
        buf0 = empty_buffer_state(cfg)
        ii_j = jax.jit(lambda b, p, m, e: pipeline.ingest_and_insert(cfg, b, p, m, e))
        for i in range(cfg.buffer_size):
            buf0, _ = ii_j(buf0, scans[i % nd], masks[i % nd], egos[i % nd])
        jax.block_until_ready(buf0)

        def cmb(carry, i):
            buf, world = carry
            world, products, _ = pipeline.combine(cfg, buf, world, egos[0], impl=args.combine_impl)
            probe = sum(jnp.sum(l).astype(jnp.float32) for l in products)
            bump = (probe > -1.0).astype(jnp.int32)
            world = world._replace(grid=world.grid._replace(hit_pk=world.grid.hit_pk + bump))
            return (buf, world), probe

        timed(f"combine[{args.combine_impl}]", cmb, (buf0, empty_world_state(cfg)), S, args.repeats)

    # --- full step forms ---
    if on("full"):
        def full(carry, i):
            buf, world = carry
            j = i % nd
            buf, _ = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j])
            world, products, _ = pipeline.combine(cfg, buf, world, egos[j])
            probe = sum(jnp.sum(l).astype(jnp.float32) for l in products)
            return (buf, world), probe

        timed("full(strict)", full, (empty_buffer_state(cfg), empty_world_state(cfg)),
              S, args.repeats)

    # --- batched-path dissection (BASELINE config #4, B scans per step) ---
    # "bscan-noacc": B ingest_scans chained by probe only (no grid merge) —
    #   the pure per-scan ingest cost inside a scan loop at the batched ray
    #   budget. "bscan-acc": + the dead-mask + _merge_scan_grids accumulation
    #   (the batched path's extra HBM traffic). "bstep": the real
    #   make_batched_step on a 1-device mesh.
    if on("bscan-noacc") or on("bscan-acc") or on("bstep"):
        import dataclasses

        B = 32
        import math
        drift_vox = (B - 1) * 0.02 / min(cfg.xy_resolution, cfg.z_resolution)
        bcfg = dataclasses.replace(
            cfg,
            ray_steps_override=min(
                max(cfg.xy_size, cfg.z_size) // 2 + 6 + int(math.ceil(drift_vox)),
                max(cfg.xy_size, cfg.z_size) + 4,
            ),
        )
        reps = jnp.arange(B, dtype=jnp.int32) % nd
        bscans, bmasks = scans[reps], masks[reps]
        begos = egos[reps] + (jnp.arange(B, dtype=jnp.float32)[:, None]
                              * jnp.array([0.02, 0.01, 0.0], jnp.float32))

        if on("bscan-noacc"):
            def bna(carry, i):
                (dummy,) = carry
                o = gridops.compute_origin(bcfg, begos[-1] + dummy)

                def one(c, xs):
                    p, m, e = xs
                    g, ok = pipeline.ingest_scan(bcfg, p, m, e, None, "auto", origin=o)
                    pr = (jnp.sum(g.hit) + jnp.sum(g.miss) + jnp.sum(g.mom)
                          ).astype(jnp.float32)
                    return c + pr, pr

                tot, _ = jax.lax.scan(one, jnp.float32(0.0), (bscans, bmasks, begos))
                return (dummy + 0.0 * tot,), tot

            ms = timed("bscan-noacc(B=32)", bna, (jnp.float32(0.0),), max(4, S // 8),
                       args.repeats)
            print(json.dumps({"stage": "bscan-noacc per-scan", "ms": round(ms / B, 3)}))

        if on("bscan-acc"):
            from gvom_tpu.parallel.sharding import _merge_scan_grids
            from gvom_tpu.types import VoxelGrid, empty_voxel_grid

            def bac(carry, i):
                (dummy,) = carry
                o = gridops.compute_origin(bcfg, begos[-1] + dummy)

                def one(c, xs):
                    p, m, e = xs
                    g, ok = pipeline.ingest_scan(bcfg, p, m, e, None, "auto", origin=o)
                    dead = ~ok
                    ev = jnp.where(dead | (g.hit_pk > 0), 0, g.miss_pk)
                    g = jax.tree_util.tree_map(
                        lambda l: jnp.where(dead, jnp.zeros_like(l), l), g)
                    g = g._replace(origin=o, minh_pk=jnp.where(
                        dead, jnp.ones_like(g.minh_pk), g.minh_pk))
                    return _merge_scan_grids(c, (g, ev)), ok

                init_g = empty_voxel_grid(bcfg)._replace(origin=o)
                (acc, accev), _ = jax.lax.scan(
                    one, (init_g, jnp.zeros_like(init_g.miss_pk)), (bscans, bmasks, begos))
                tot = (jnp.sum(acc.hit_pk) + jnp.sum(acc.mom) + jnp.sum(accev)
                       ).astype(jnp.float32)
                return (dummy + 0.0 * tot,), tot

            ms = timed("bscan-acc(B=32)", bac, (jnp.float32(0.0),), max(4, S // 8),
                       args.repeats)
            print(json.dumps({"stage": "bscan-acc per-scan", "ms": round(ms / B, 3)}))

        if on("bstep"):
            from gvom_tpu.parallel.mesh import make_mesh
            from gvom_tpu.parallel.sharding import make_batched_step

            mesh = make_mesh(jax.devices()[:1])
            bstep = make_batched_step(bcfg, mesh)

            def bst(carry, i):
                world, ego0 = carry
                be = ego0[None, :] + jnp.arange(B, dtype=jnp.float32)[:, None] * jnp.array(
                    [0.02, 0.01, 0.0], jnp.float32)
                world, products = bstep(world, bscans, bmasks, be)
                probe = sum(jnp.sum(l).astype(jnp.float32) for l in products)
                return (world, ego0 + jnp.array([0.3, 0.15, 0.0], jnp.float32)), probe

            ms = timed("bstep(B=32)", bst, (empty_world_state(bcfg), egos[0]),
                       max(4, S // 8), args.repeats)
            print(json.dumps({"stage": "bstep per-scan", "ms": round(ms / B, 3)}))

    # --- slab ingest scaling: per-device compute vs y-window width on the
    # REAL kernels (SURVEY §2.3 item 2 / VERDICT r3 ask #5's measurement):
    # one chip runs the exact per-device slab program of an n_space-way mesh.
    # CAUTION (r4): through the axon tunnel these scan-loop calls have
    # returned anomalous ~0 ms for the windowed shapes (suspected terminal-
    # side memoization of repeated identical computations); the recorded
    # artifact uses scratch/traceprof.py --stage slabingest (xplane leaf-op
    # sums), which is immune. Works correctly on CPU.
    if on("slab"):
        Y = cfg.xy_size
        for nsp in (1, 2, 4, 8):
            Ys = Y // nsp
            ywin = None if nsp == 1 else (0, Ys)

            def slab_ing(carry, i, ywin=ywin):
                (dummy,) = carry
                j = i % nd
                g, ok = pipeline.ingest_scan(
                    cfg, scans[j], masks[j], egos[j] + dummy, None, "auto",
                    y_window=ywin)
                probe = (jnp.sum(g.hit) + jnp.sum(g.miss) + jnp.sum(g.mom)
                         ).astype(jnp.float32)
                return (dummy + 0.0 * probe,), probe

            timed(f"slab-ingest[n_space={nsp}, Ys={Ys}]", slab_ing,
                  (jnp.float32(0.0),), S, args.repeats)

    if on("contract"):
        K = 8

        def contract(carry, i):
            buf, world = carry
            j = i % nd
            buf, _ = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j])

            def do(bw):
                b, w = bw
                w, products, _ = pipeline.combine(cfg, b, w, egos[j])
                return w, sum(jnp.sum(l).astype(jnp.float32) for l in products)

            world, probe = jax.lax.cond(
                (i + 1) % K == 0, do, lambda bw: (bw[1], jnp.float32(0.0)), (buf, world)
            )
            return (buf, world), probe

        timed("contract(K=8)", contract,
              (empty_buffer_state(cfg), empty_world_state(cfg)), S, args.repeats)


if __name__ == "__main__":
    main()
