"""Command-line tools.

    python -m gvom_tpu.cli replay  --scans 32 --batch 8       # batched replay on the mesh
    python -m gvom_tpu.cli replay  --scans 16 --sequential    # facade replay (live-node path)
    python -m gvom_tpu.cli parity  --scans 5                  # engine vs NumPy-oracle report
    python -m gvom_tpu.cli bench   ...                        # forwards to bench.py

The parity harness is the SURVEY §4 "replay identical synthetic scans through
the reference semantics (oracle) and the TPU engine; compare the five output
maps" — it prints a JSON report of per-map agreement.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def cmd_replay(args):
    from gvom_tpu.config import GvomConfig
    from gvom_tpu.engine.replay import batched_replay, sequential_replay
    from gvom_tpu.io.logio import synthesize_log

    cfg = GvomConfig(xy_size=args.grid, z_size=args.grid_z, max_points=args.points)
    log = synthesize_log(args.scans, channels=args.channels, azimuth_steps=args.azimuth)
    if args.sequential:
        engine, outputs, metrics = sequential_replay(cfg, log)
        print(json.dumps({"mode": "sequential", "scans": len(log), **metrics.snapshot()}, default=float))
    else:
        world, products, metrics = batched_replay(cfg, log, batch_size=args.batch)
        print(json.dumps({"mode": "batched", "scans": len(log), "batches": len(products), **metrics.snapshot()}, default=float))


def cmd_convert_bag(args):
    from gvom_tpu.io.logio import save_log
    from gvom_tpu.io.rosbag import bag_to_scanlog

    tf = None
    if args.transform is not None:
        tf = np.loadtxt(args.transform).reshape(-1, 4)
    log = bag_to_scanlog(
        args.bag, cloud_topic=args.cloud_topic, odom_topic=args.odom_topic,
        transform=tf, max_scans=args.max_scans,
    )
    save_log(args.out, log)
    pts = [len(p) for p, _, _ in log]
    print(json.dumps({
        "bag": args.bag, "out": args.out, "scans": len(log),
        "points_min": min(pts) if pts else 0, "points_max": max(pts) if pts else 0,
    }))


def cmd_parity(args):
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gvom_tpu.config import GvomConfig
    from gvom_tpu.io.logio import synthesize_log
    from gvom_tpu.io.synthetic import nudge_off_grid, pad_scan
    from gvom_tpu.models import pipeline
    from gvom_tpu.oracle import NumpyOracle
    from gvom_tpu.types import empty_buffer_state, empty_world_state

    cfg = GvomConfig(xy_size=args.grid, z_size=args.grid_z, max_points=args.points, buffer_size=3)
    log = synthesize_log(args.scans, channels=args.channels, azimuth_steps=args.azimuth, max_range=25.0)
    oracle = NumpyOracle(cfg)
    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    ing = jax.jit(lambda b, p, v, e: pipeline.ingest_and_insert(cfg, b, p, v, e))
    com = jax.jit(lambda b, w, e: pipeline.combine(cfg, b, w, e))
    report = []
    for pts, ego, _ in log:
        pts = nudge_off_grid(pts, cfg.xy_resolution, cfg.z_resolution)
        oracle.process_pointcloud(pts, ego)
        o_out = oracle.combine_maps()
        pad, mask = pad_scan(pts, cfg.max_points)
        buf, _ = ing(buf, jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(np.float32(ego)))
        world, products, _ = com(buf, world, jnp.asarray(np.float32(ego)))
        _, o_pos, o_neg, o_rough, o_vis = o_out
        pos = np.asarray(products.positive_obstacle)
        # exclude (near-)singular 3x3 plane fits: their det!=0 guard keys off
        # f32-vs-f64 rounding noise and flips slope-derived outputs
        # arbitrarily; the raw_* metrics include them for transparency
        from gvom_tpu.utils.parity import singular_fit_mask

        ok = ~singular_fit_mask(oracle.height_map, cfg.xy_resolution)
        rough = np.asarray(products.roughness)
        rdef = ok & (o_rough > -1) & (rough > -1)
        report.append(
            {
                "vis_equal": bool(np.array_equal(np.asarray(products.visibility), o_vis)),
                "neg_equal": bool(np.array_equal(np.asarray(products.negative_obstacle), o_neg)),
                "pos_mismatch_frac": float((pos != o_pos)[ok].mean()),
                "pos_max_diff": int(np.abs(pos - o_pos)[ok].max()),
                "rough_max_diff_defined": float(
                    np.abs(rough - o_rough)[rdef].max() if rdef.any() else 0.0
                ),
                "height_max_diff": float(
                    np.abs(np.asarray(products.height) - oracle.height_map).max()
                ),
                "singular_fit_frac": float((~ok).mean()),
                "raw_pos_mismatch_frac": float((pos != o_pos).mean()),
                "raw_pos_max_diff": int(np.abs(pos - o_pos).max()),
            }
        )
    print(json.dumps({"config": {"grid": args.grid, "scans": args.scans}, "per_combine": report}, indent=2))


def cmd_selftest(args):
    """Compiled (non-interpret) Pallas-vs-XLA exactness on the CURRENT
    backend. CI pins the kernels only in interpret mode, which cannot catch
    Mosaic lowering/alignment bugs (reference semantics at stake:
    gvom.py:1058-1150, 1170-1329); this runs the real compiled kernels
    against the XLA implementations and prints one JSON verdict line.
    Run it on the TPU after kernel changes; BENCHMARKS.md records the output
    each round. Exits nonzero on any mismatch."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gvom_tpu.config import GvomConfig
    from gvom_tpu.io import synthetic
    from gvom_tpu.ops import binning, moments, raycast
    from gvom_tpu.ops import grid as gridops
    from gvom_tpu.ops import pallas_kernels

    backend = jax.default_backend()
    interpret = backend != "tpu"  # the Mosaic kernels only compile on TPU;
    # --cpu exists to smoke the harness itself, labeled as interpret

    cfg = GvomConfig(xy_size=args.grid, z_size=args.grid_z,
                     max_points=args.points, buffer_size=4)
    terrain = synthetic.composite_terrain()
    checks = {}
    ok_all = True
    for seed in range(args.scans):
        ego = np.array([0.5 + 0.45 * seed, 0.25 * seed, 1.6])
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=64, azimuth_steps=max(64, args.points // 64),
            max_range=60.0, seed=seed,
        )
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        pad = synthetic.nudge_off_grid(pad, cfg.xy_resolution, cfg.z_resolution)
        p, v, e = jnp.asarray(pad), jnp.asarray(mask), jnp.asarray(np.float32(ego))
        origin = gridops.compute_origin(cfg, e)
        pw, keep = binning.prepare_points(cfg, p, v, e, None)

        # both implementations run inside ONE jit so they read the SAME f32
        # point coordinates: across separate graphs XLA's instruction
        # selection for pn = points/res − origin legally differs by 1 ulp
        # (div → reciprocal-multiply / fma fusion), which shows up as a
        # ±2⁻¹⁸ phantom "mismatch" at |coord|≈64 that says nothing about the
        # kernels (measured + bisected on-chip, r3)
        @jax.jit
        def pair(pw, keep):
            ray_pl = pallas_kernels.ray_pass_counts_matmul(
                cfg, pw, keep, e, origin, interpret=interpret)
            ray_x = raycast.ray_pass_counts_xla(cfg, pw, keep, e, origin)
            hit_pl, mh_pl, mom_pl = pallas_kernels.fused_point_moments(
                cfg, pw, keep, origin, interpret=interpret)
            bins = binning.bin_points(cfg, pw, keep, origin)
            n, s1, s2 = moments.box_aggregate_moments(cfg, bins)
            mom_x = moments.pack_moments(
                gridops.window_to_torus(n, origin),
                gridops.window_to_torus(s1, origin),
                gridops.window_to_torus(s2, origin),
            )
            # r5: stored moments are occupancy-pre-masked at ingest — apply
            # the identical mask to the XLA reference
            mom_x = jnp.where(
                moments.packed_voxel_mask(bins.hit > 0, cfg.z_size)[:, None],
                mom_x, 0.0)
            return (
                jnp.abs(ray_pl - ray_x).max(),
                jnp.abs(hit_pl - bins.hit).max(),
                jnp.abs(mh_pl - bins.min_height).max(),
                jnp.abs(mom_pl - mom_x).max(),
                jnp.abs(mom_pl - mom_x).max() / (jnp.abs(mom_x).max() + 1e-30),
            )

        dray, dh, dmh, dm, rel = pair(pw, keep)
        d, dh, dmh, dm, rel = int(dray), int(dh), float(dmh), float(dm), float(rel)
        checks[f"raycast_scan{seed}_maxdiff"] = d
        ok_all &= d == 0
        checks[f"moments_scan{seed}_hit_maxdiff"] = dh
        checks[f"moments_scan{seed}_minh_maxdiff"] = dmh
        checks[f"moments_scan{seed}_mom_maxreldiff"] = rel
        # hit and minh are EXACT by construction in every precision mode
        # (one-hot counts; bf16x3-decomposed first-of-run min). The nine
        # coordinate-moment channels' tolerance follows GVOM_MOM_PRECISION
        # (pallas_kernels._MOM_PRECISION): Mosaic's default f32 dots run a
        # single bf16 pass (~2⁻⁹ operand rounding; measured 1.8e-4 on-chip),
        # "split" drops only the lo·lo term, "highest" is multi-pass
        # ~f32-true. These channels feed only the debug eigen features
        # (PARITY.md K16).
        mom_tol = {"f32": 1e-3, "split": 1e-4, "highest": 1e-5}[
            pallas_kernels._MOM_PRECISION]
        ok_all &= dh == 0 and dmh == 0.0 and rel <= mom_tol
        _ = dm

        # slab (y_window) forms — the sharded ingest's per-device kernels
        # (slab one-hot targets + relabeled y-dominant worklist + point
        # prefilter). Raycast/hit/minh must be exact vs the XLA slab path;
        # moments to the same precision-mode tolerance.
        Ys = args.grid // 4
        ys0 = (seed + 1) * Ys % args.grid

        @jax.jit
        def slab_pair(pw, keep):
            ray_pl = pallas_kernels.ray_pass_counts_matmul(
                cfg, pw, keep, e, origin, interpret=interpret, y_window=(ys0, Ys))
            ray_x = raycast.ray_pass_counts_xla(cfg, pw, keep, e, origin,
                                                y_window=(ys0, Ys))
            hit_pl, mh_pl, mom_pl = pallas_kernels.fused_point_moments(
                cfg, pw, keep, origin, interpret=interpret, y_window=(ys0, Ys))
            hit_f, mh_f, mom_f = pallas_kernels.fused_point_moments(
                cfg, pw, keep, origin, interpret=interpret)
            sl = lambda x, axis=1: jax.lax.dynamic_slice_in_dim(x, ys0, Ys, axis=axis)
            return (
                jnp.abs(ray_pl - ray_x).max(),
                jnp.abs(hit_pl - sl(hit_f)).max(),
                jnp.abs(mh_pl - sl(mh_f)).max(),
                jnp.abs(mom_pl - sl(mom_f, 2)).max()
                / (jnp.abs(mom_f).max() + 1e-30),
            )

        sray, sh, smh, srel = [float(x) for x in slab_pair(pw, keep)]
        checks[f"slab_scan{seed}_ray_maxdiff"] = sray
        checks[f"slab_scan{seed}_hit_maxdiff"] = sh
        checks[f"slab_scan{seed}_minh_maxdiff"] = smh
        checks[f"slab_scan{seed}_mom_maxreldiff"] = srel
        # slab vs full-kernel moments: identical math, different chunk
        # boundaries (prefilter) → ulp-level f32 reassociation only
        ok_all &= sray == 0 and sh == 0 and smh == 0.0 and srel <= mom_tol

    # ---- mega-combine: compiled fused_combine vs the XLA combine path ----
    # (phase A latching + phase B fusion + column products must be BITWISE
    # equal — its accumulation is select/add in the identical order)
    from gvom_tpu.models import pipeline as _pl
    from gvom_tpu.types import empty_buffer_state, empty_world_state

    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    ing = jax.jit(lambda b, p, m, e: _pl.ingest_and_insert(
        cfg, b, p, m, e, None, "matmul" if not interpret else "xla"))
    for seed in range(cfg.buffer_size + 1):
        ego = np.array([0.5 + 0.45 * seed, 0.25 * seed, 1.6])
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=64, azimuth_steps=max(64, args.points // 64),
            max_range=60.0, seed=seed)
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        buf, _ = ing(buf, jnp.asarray(pad), jnp.asarray(mask),
                     jnp.asarray(np.float32(ego)))
    e_last = jnp.asarray(np.float32(ego))
    world, _, _ = jax.jit(lambda b, w: _pl.combine(cfg, b, w, e_last, impl="xla"))(
        buf, world)

    @jax.jit
    def combine_pair(buf, world):
        w_x, p_x, _ = _pl.combine(cfg, buf, world, e_last, impl="xla")
        origin = buf.grids.origin[buf.last_slot]
        w_f, p_f, _ = _pl._combine_fused(
            cfg, buf, world, e_last.astype(jnp.float32), origin,
            jnp.any(buf.slot_valid), interpret=interpret)
        dg = jnp.maximum(
            jnp.maximum(jnp.abs(w_f.grid.hit - w_x.grid.hit).max(),
                        jnp.abs(w_f.evidence - w_x.evidence).max()),
            jnp.abs(w_f.grid.miss - w_x.grid.miss).max())
        dmh = jnp.abs(w_f.grid.min_height - w_x.grid.min_height).max()
        dmm = jnp.abs(w_f.grid.mom - w_x.grid.mom).max()
        dp = jnp.maximum(
            jnp.maximum(jnp.abs(p_f.height - p_x.height).max(),
                        jnp.abs(p_f.inferred_height - p_x.inferred_height).max()),
            jnp.abs(p_f.positive_obstacle - p_x.positive_obstacle).max().astype(jnp.float32))
        return dg, dmh, dmm, dp

    cg, cmh, cmm, cp = [float(x) for x in combine_pair(buf, world)]
    checks["combine_grid_maxdiff"] = cg
    checks["combine_minh_maxdiff"] = cmh
    checks["combine_mom_maxdiff"] = cmm
    checks["combine_products_maxdiff"] = cp
    ok_all &= cg == 0 and cmh == 0.0 and cmm == 0.0 and cp == 0.0

    verdict = {
        "selftest": "pallas_vs_xla_compiled",
        "backend": backend,
        "device": str(jax.devices()[0]),
        "interpret": interpret,
        "grid": [args.grid, args.grid, args.grid_z],
        "points": args.points,
        "scans": args.scans,
        "mom_precision": pallas_kernels._MOM_PRECISION,
        "ok": bool(ok_all),
        "checks": {k: (float(v) if not isinstance(v, bool) else v) for k, v in checks.items()},
    }
    print(json.dumps(verdict))
    return 0 if ok_all else 1


def main(argv=None):
    ap = argparse.ArgumentParser(prog="gvom_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("replay", help="replay a synthetic drive")
    rp.add_argument("--scans", type=int, default=16)
    rp.add_argument("--batch", type=int, default=8)
    rp.add_argument("--sequential", action="store_true")
    rp.add_argument("--grid", type=int, default=128)
    rp.add_argument("--grid-z", type=int, default=64)
    rp.add_argument("--points", type=int, default=65536)
    rp.add_argument("--channels", type=int, default=64)
    rp.add_argument("--azimuth", type=int, default=1024)
    rp.set_defaults(fn=cmd_replay)

    cb = sub.add_parser("convert-bag", help="rosbag → .npz ScanLog (no ROS needed)")
    cb.add_argument("bag")
    cb.add_argument("out")
    cb.add_argument("--cloud-topic", default=None)
    cb.add_argument("--odom-topic", default=None)
    cb.add_argument("--max-scans", type=int, default=None)
    cb.add_argument("--transform", default=None,
                    help="optional 3x4/4x4 sensor→odom matrix file (np.loadtxt)")
    cb.set_defaults(fn=cmd_convert_bag)

    pp = sub.add_parser("parity", help="engine vs oracle parity report")
    pp.add_argument("--scans", type=int, default=5)
    pp.add_argument("--grid", type=int, default=64)
    pp.add_argument("--grid-z", type=int, default=32)
    pp.add_argument("--points", type=int, default=8192)
    pp.add_argument("--channels", type=int, default=32)
    pp.add_argument("--azimuth", type=int, default=64)
    pp.add_argument("--cpu", action="store_true", help="force the CPU backend")
    pp.set_defaults(fn=cmd_parity)

    st = sub.add_parser("selftest", help="compiled Pallas-vs-XLA kernel exactness on this backend")
    st.add_argument("--grid", type=int, default=256)
    st.add_argument("--grid-z", type=int, default=64)
    st.add_argument("--points", type=int, default=131072)
    st.add_argument("--scans", type=int, default=2)
    st.add_argument("--cpu", action="store_true",
                    help="smoke the harness on CPU (interpret mode; NOT a Mosaic check)")
    st.set_defaults(fn=cmd_selftest)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
