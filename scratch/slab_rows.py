"""Row-accounting probe for the slab x-dominant worklist: how many matmul
rows (incl. 1024-chunk padding) the bucketed vs unbucketed layouts stream,
and the ray entry distribution, for the bench scan at a given Ys."""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.io import synthetic
from gvom_tpu.ops import binning, raycast as raycast_mod
from gvom_tpu.ops import grid as gridops

ys_w = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cfg = GvomConfig(xy_size=256, z_size=64, max_points=131072, buffer_size=4)
terrain = synthetic.composite_terrain()
ego = np.array([0.95, 0.25, 1.61])
pts = synthetic.simulate_lidar_scan(terrain, ego, channels=128, azimuth_steps=1200,
                                    max_range=60.0, seed=0, coarse_step=0.5, refine_iters=12)
pad, mask = synthetic.pad_scan(pts, cfg.max_points)
e = jnp.asarray(np.float32(ego))
p, keep = binning.prepare_points(cfg, jnp.asarray(pad), jnp.asarray(mask), e, None)
origin = gridops.compute_origin(cfg, e)
X, Y, Z = cfg.grid_shape
S = cfg.ray_steps
start, step, delta, budget, dom = raycast_mod.ray_geometry(cfg, p, keep, e)
start_rel = start - origin.astype(jnp.float32)
s0, s1g, s2g = step[:, 0], step[:, 1], step[:, 2]
s_dom = jnp.where(dom == 0, s0, jnp.where(dom == 1, s1g, s2g))
group = dom * 2 + (s_dom < 0).astype(jnp.int32)

k0 = jnp.floor(budget / jnp.maximum(delta, 1e-20)).astype(jnp.int32) + 1
kmax = jnp.clip(jnp.where(budget >= 0, k0, 0), 0, S)
sizes_f = jnp.array([X, Y, Z], jnp.float32)
pos_exit = (sizes_f[None, :] - start_rel[None, :]) / jnp.where(step > 0, step, 1.0)
neg_exit = (start_rel[None, :] + 1.0) / jnp.where(step < 0, -step, 1.0)
per_axis = jnp.where(step > 0, pos_exit, jnp.where(step < 0, neg_exit, jnp.float32(1e9)))
s_exit = jnp.floor(jnp.min(per_axis, axis=1)).astype(jnp.int32) + 2
kmax = jnp.minimum(kmax, jnp.maximum(s_exit, 0))

ys0 = int(sys.argv[2]) if len(sys.argv) > 2 else 0
sy = step[:, 1]; u0 = start_rel[1]
a = jnp.mod(ys0 - origin[1], Y)
hi1 = jnp.minimum(a + ys_w, Y) - 1
hi2 = a + ys_w - Y - 1

def exit_step(lo, hi, valid):
    lo_f, hi_f = lo.astype(jnp.float32), hi.astype(jnp.float32)
    tpos = (hi_f + 1.0 - u0) / jnp.where(sy > 0, sy, 1.0)
    tneg = (lo_f - u0) / jnp.where(sy < 0, sy, 1.0)
    t = jnp.where(sy > 0, tpos, jnp.where(sy < 0, tneg, jnp.float32(1e9)))
    in0 = (u0 >= lo_f) & (u0 < hi_f + 1.0)
    t = jnp.where(sy == 0, jnp.where(in0, jnp.float32(1e9), -1.0), t)
    t = jnp.where(valid, t, -1.0)
    return jnp.floor(jnp.minimum(t, jnp.float32(1e8))).astype(jnp.int32) + 2

def entry_step(lo, hi, valid):
    lo_f, hi_f = lo.astype(jnp.float32), hi.astype(jnp.float32)
    in0 = (u0 >= lo_f) & (u0 < hi_f + 1.0)
    tpos = (lo_f - u0) / jnp.where(sy > 0, sy, 1.0)
    tneg = (u0 - (hi_f + 1.0)) / jnp.where(sy < 0, -sy, 1.0)
    t = jnp.where(sy > 0, tpos, jnp.where(sy < 0, tneg, jnp.float32(1e9)))
    t = jnp.where(in0, 0.0, t)
    t = jnp.where(valid, t, jnp.float32(1e9))
    t = jnp.maximum(t, 0.0)
    return jnp.floor(jnp.minimum(t, jnp.float32(1e8))).astype(jnp.int32) - 2

slab_cut = jnp.maximum(jnp.maximum(exit_step(a, hi1, True), exit_step(jnp.int32(0), hi2, hi2 >= 0)), 0)
kmax_s = jnp.where(dom == 1, kmax, jnp.minimum(kmax, slab_cut))
entry = jnp.clip(jnp.minimum(entry_step(a, hi1, True), entry_step(jnp.int32(0), hi2, hi2 >= 0)), 0, S)

km = np.asarray(kmax_s); en = np.asarray(entry); g = np.asarray(group)
xd = (g <= 1) & (km > 0)
print(f"Ys={ys_w} S={S} x-dom alive rays: {xd.sum()} of {len(g)}")
print("entry pct [50,75,90,99]:", np.percentile(en[xd], [50, 75, 90, 99]).astype(int),
      " kmax pct:", np.percentile(km[xd], [50, 75, 90, 99]).astype(int))

CH = 1024
for name, thresh in [("none", (0,)), ("exp5", (0, 16, 32, 64, 128)), ("exp3", (0, 48, 112))]:
    NB = len(thresh)
    b = np.zeros(len(g), np.int32)
    for t in thresh[1:]:
        b += (en >= t)
    b = np.where(g <= 1, b, 0)
    rows = 0; windows = 0; live_rows = 0
    for gg in (0, 1):
        for bb in range(NB):
            sel = (g == gg) & (b == bb)
            kk = np.sort(km[sel])[::-1]
            for s in range(1, S + 1):
                if s < thresh[bb]:
                    continue
                cnt = int((kk >= s).sum())
                if cnt == 0:
                    continue
                # offset alignment: window [abase, off+cnt) rounded to chunks
                rows += int(np.ceil(cnt / CH)) * CH   # ≈ alignment floor (abase≈off)
                windows += 1
                live_rows += int(((kk >= s) & True).sum())
    # truly-useful rows: visits where the ray is PAST its entry
    useful = 0
    for gg in (0, 1):
        sel = (g == gg) & (km > 0)
        for s in range(1, S + 1):
            useful += int(((km[sel] >= s) & (en[sel] <= s)).sum())
    print(f"{name:5s}: windows {windows:5d}  rows_streamed ≈ {rows/1e6:.2f}M  "
          f"(live-in-window {live_rows/1e6:.2f}M, past-entry {useful/1e6:.2f}M)")
