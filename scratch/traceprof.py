"""Leaf-op device profile of one pipeline graph via jax.profiler + xplane.

Runs the requested stage a few times under jax.profiler.trace, then parses
the raw .xplane.pb with tensorflow's xplane proto and prints per-op device
time, grouped by fusion/op name, descending. The r3 roofline's "per-stage
truth" table came from this kind of dump.

Usage: python scratch/traceprof.py [--stage contract|full|combine|ingest]
       [--top 40]
"""

import argparse
import glob
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from gvom_tpu.config import GvomConfig
from gvom_tpu.models import pipeline
from gvom_tpu.types import empty_buffer_state, empty_world_state

from profile_step import stage_scans


def parse_xplane(logdir, steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane under {logdir}"
    per_op = defaultdict(float)
    total = 0.0
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "/device:TPU" not in plane.name:
                continue
            stats_meta = {m.id: m.name for m in plane.stat_metadata.values()}
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    per_op[name] += dur
                    total += dur
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="contract")
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--xy-size", type=int, default=256)
    ap.add_argument("--z-size", type=int, default=64)
    ap.add_argument("--combine-impl", default="auto")
    ap.add_argument("--slab-ys", type=int, default=0,
                    help="slabingest stage: y-window width (default xy_size//2)")
    ap.add_argument("--slab-ys0", type=int, default=0,
                    help="slabingest stage: torus y of the slab start (0 lands "
                         "next to the bench ego; ~96 puts it mid-grid away)")
    args = ap.parse_args()

    cfg = GvomConfig(xy_size=args.xy_size, z_size=args.z_size,
                     max_points=args.points, buffer_size=4)
    scans, masks, egos = stage_scans(cfg)
    nd = scans.shape[0]
    K = 8

    if args.stage == "batched":
        # bench.py _run_batched's exact workload (B=32, rigid replay, one
        # combine per step) under the profiler
        import dataclasses

        from gvom_tpu.parallel.mesh import make_mesh
        from gvom_tpu.parallel.sharding import make_batched_step

        B = 32
        mesh = make_mesh(jax.devices()[:1])
        import math
        drift_vox = (B - 1) * 0.02 / min(cfg.xy_resolution, cfg.z_resolution)
        bcfg = dataclasses.replace(cfg, ray_steps_override=min(
            max(cfg.xy_size, cfg.z_size) // 2 + 6 + int(math.ceil(drift_vox)),
            max(cfg.xy_size, cfg.z_size) + 4))   # = bench._batched_ray_budget
        bstep = make_batched_step(bcfg, mesh)
        reps = jnp.arange(B, dtype=jnp.int32) % nd
        bscans, bmasks = scans[reps], masks[reps]
        begos_base = egos[reps]

        def bstep_scan(carry, i):
            world, ego0 = carry
            begos = ego0[None, :] + jnp.arange(B, dtype=jnp.float32)[:, None] * jnp.array(
                [0.02, 0.01, 0.0], jnp.float32)
            shift = (begos - begos_base).astype(jnp.float32)
            world, products = bstep(world, bscans + shift[:, None, :], bmasks, begos)
            probe = sum(jnp.sum(leaf).astype(jnp.float32) for leaf in products)
            return (world, ego0 + jnp.array([0.3, 0.15, 0.0], jnp.float32)), probe

        @jax.jit
        def brun(a):
            return jax.lax.scan(bstep_scan, a, jnp.arange(args.steps))

        init = (empty_world_state(bcfg), egos[0])
        out = brun(init)
        jax.block_until_ready(out)
        logdir = "/tmp/gvom_trace"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            out = brun(init)
            jax.block_until_ready(out)
        per_op, total = parse_xplane(logdir, args.steps)
        rows = sorted(per_op.items(), key=lambda kv: -kv[1])
        print(json.dumps({"stage": "batched", "steps": args.steps, "batch": B,
                          "device_total_ms_per_step": round(total / args.steps, 3),
                          "device_total_ms_per_scan": round(total / args.steps / B, 4)}))
        for name, ms in rows[: args.top]:
            print(f"{ms / args.steps / B:8.4f} ms/scan  {name[:110]}")
        return

    def step(carry, i):
        buf, world = carry
        j = i % nd
        if args.stage == "slabingest":
            ys = args.slab_ys or cfg.xy_size // 2
            ywin = None if ys >= cfg.xy_size else (args.slab_ys0, ys)
            g, _ = pipeline.ingest_scan(cfg, scans[j], masks[j], egos[j], None,
                                        "auto", y_window=ywin)
            probe = (jnp.sum(g.hit) + jnp.sum(g.miss) + jnp.sum(g.mom)).astype(jnp.float32)
            return (buf, world), probe
        if args.stage in ("contract", "full", "ingest"):
            buf, _ = pipeline.ingest_and_insert(cfg, buf, scans[j], masks[j], egos[j])
        if args.stage == "full":
            world, products, _ = pipeline.combine(cfg, buf, world, egos[j],
                                                  impl=args.combine_impl)
            probe = sum(jnp.sum(l).astype(jnp.float32) for l in products)
        elif args.stage == "combine":
            world, products, _ = pipeline.combine(cfg, buf, world, egos[j],
                                                  impl=args.combine_impl)
            probe = sum(jnp.sum(l).astype(jnp.float32) for l in products)
        elif args.stage == "contract":
            def do(bw):
                b, w = bw
                w, products, _ = pipeline.combine(cfg, b, w, egos[j],
                                                  impl=args.combine_impl)
                return w, sum(jnp.sum(l).astype(jnp.float32) for l in products)

            world, probe = jax.lax.cond(
                (i + 1) % K == 0, do, lambda bw: (bw[1], jnp.float32(0.0)),
                (buf, world))
        else:
            probe = jnp.float32(0.0)
        return (buf, world), probe

    @jax.jit
    def run(a):
        return jax.lax.scan(step, a, jnp.arange(args.steps))

    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    out = run((buf, world))
    jax.block_until_ready(out)

    logdir = "/tmp/gvom_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        out = run((buf, world))
        jax.block_until_ready(out)

    per_op, total = parse_xplane(logdir, args.steps)
    rows = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(json.dumps({"stage": args.stage, "steps": args.steps,
                      "device_total_ms_per_step": round(total / args.steps, 3)}))
    for name, ms in rows[: args.top]:
        print(f"{ms / args.steps:8.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
