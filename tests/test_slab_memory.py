"""Grid-extent scaling of the slab ingest (VERDICT r2 ask #6, SURVEY §5
"long-dimension" analog): per-device memory of the sharded batched step at a
grid whose FULL-GRID per-device footprint is prohibitive.

Uses XLA's compile-time memory analysis of the SPMD per-device program (the
honest per-device number — each device executes this exact program) rather
than RSS, so the big-grid case needs no big-host execution. A small real
execution at a moderate grid cross-checks that both strategies actually run
and agree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gvom_tpu.parallel.mesh import DATA_AXIS, SPACE_AXIS, make_mesh
from gvom_tpu.parallel.sharding import make_batched_step, world_pspecs
from gvom_tpu.types import empty_world_state


def _cfg(xy, z, pts):
    from gvom_tpu.config import GvomConfig

    return GvomConfig(xy_size=xy, z_size=z, max_points=pts, buffer_size=4)


def _mem_bytes(cfg, mesh, ingest):
    """Per-device compile-time memory of one batched step (SPMD program)."""
    S = 8
    step = make_batched_step(cfg, mesh, raycast_impl="xla", ingest=ingest)
    scans = jax.ShapeDtypeStruct((S, cfg.max_points, 3), jnp.float32)
    masks = jax.ShapeDtypeStruct((S, cfg.max_points), jnp.bool_)
    egos = jax.ShapeDtypeStruct((S, 3), jnp.float32)
    world = jax.eval_shape(lambda: empty_world_state(cfg))
    sh = lambda spec: NamedSharding(mesh, spec)
    world_sh = jax.tree_util.tree_map(sh, world_pspecs(), is_leaf=lambda x: isinstance(x, P))
    jitted = jax.jit(step)
    lowered = jitted.lower(
        jax.tree_util.tree_map(
            lambda s, shd: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=shd),
            world, world_sh,
        ),
        jax.ShapeDtypeStruct(scans.shape, scans.dtype, sharding=sh(P((DATA_AXIS, SPACE_AXIS) if ingest == "scatter" else DATA_AXIS, None, None))),
        jax.ShapeDtypeStruct(masks.shape, masks.dtype, sharding=sh(P((DATA_AXIS, SPACE_AXIS) if ingest == "scatter" else DATA_AXIS, None))),
        jax.ShapeDtypeStruct(egos.shape, egos.dtype, sharding=sh(P((DATA_AXIS, SPACE_AXIS) if ingest == "scatter" else DATA_AXIS, None))),
    )
    ma = lowered.compile().memory_analysis()
    return ma


def test_slab_per_device_memory_scales_with_space_factor():
    """At 1024x1024x64 on a (1 data x 8 space) mesh, the slab strategy's
    per-device temp memory is a small fraction of scatter's full-grid
    footprint — the quantitative point of slab ingest."""
    devs = jax.devices()[:8]
    mesh = make_mesh(devs, space=8)         # pure space mesh: 1 x 8
    assert int(mesh.shape[SPACE_AXIS]) == 8
    cfg = _cfg(1024, 64, 4096)

    slab = _mem_bytes(cfg, mesh, "slab")
    scatter = _mem_bytes(cfg, mesh, "scatter")
    gb = 1024 ** 3
    slab_tot = slab.temp_size_in_bytes + slab.output_size_in_bytes
    scat_tot = scatter.temp_size_in_bytes + scatter.output_size_in_bytes
    print(f"[slab-mem] 1024x1024x64, 1x8 mesh: slab temp+out "
          f"{slab_tot / gb:.2f} GiB vs scatter {scat_tot / gb:.2f} GiB "
          f"(temps {slab.temp_size_in_bytes / gb:.2f} / "
          f"{scatter.temp_size_in_bytes / gb:.2f})")
    # slab's per-device footprint must be far below scatter's full-grid one
    assert slab_tot < scat_tot / 3, (slab_tot, scat_tot)
    # ... and below the full-grid state size itself (the 1/n_space claim):
    # full-grid mom alone is 1024*5*1024*128*4 B = 2.5 GiB
    full_mom = 1024 * 5 * 1024 * 128 * 4
    assert slab_tot < full_mom, (slab_tot, full_mom)


def test_slab_and_scatter_agree_small():
    """Cross-check the two strategies execute and agree at a small grid on
    the (2 data x 4 space) mesh (same check as the r2 slab tests, pinned
    here so the memory test above can stay compile-only)."""
    from gvom_tpu.io import synthetic

    devs = jax.devices()[:8]
    mesh = make_mesh(devs, space=4)
    cfg = _cfg(32, 16, 512)
    n = 8
    scans, masks, egos = [], [], []
    ego = np.array([0.3, -0.2, 1.5])
    for i in range(n):
        ego = ego + np.array([0.1, 0.05, 0.0])
        pts = synthetic.simulate_lidar_scan(
            synthetic.composite_terrain(), ego, channels=8, azimuth_steps=16,
            max_range=8.0, seed=i,
        )
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        scans.append(pad)
        masks.append(mask)
        egos.append(ego.astype(np.float32))
    scans = jnp.asarray(np.stack(scans))
    masks = jnp.asarray(np.stack(masks))
    egos = jnp.asarray(np.stack(egos))

    outs = {}
    for ingest in ("slab", "scatter"):
        step = make_batched_step(cfg, mesh, raycast_impl="xla", ingest=ingest)
        w, _ = step(empty_world_state(cfg), scans, masks, egos)
        outs[ingest] = w
    np.testing.assert_array_equal(np.asarray(outs["slab"].grid.hit),
                                  np.asarray(outs["scatter"].grid.hit))
    np.testing.assert_array_equal(np.asarray(outs["slab"].grid.miss),
                                  np.asarray(outs["scatter"].grid.miss))
    np.testing.assert_allclose(np.asarray(outs["slab"].grid.mom),
                               np.asarray(outs["scatter"].grid.mom),
                               rtol=1e-6, atol=1e-5)
