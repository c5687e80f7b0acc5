"""Mega-combine kernel parity: pallas_kernels.fused_combine (interpret mode)
must reproduce the XLA combine path bitwise — phase A slot-order evidence
latching, decay veto, occupied-wins, phase B fusion, the any_valid latch, and
the column products (height / inferred height / positive obstacle band sums).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gvom_tpu.io import synthetic
from gvom_tpu.models import pipeline
from gvom_tpu.types import empty_buffer_state, empty_world_state

from conftest import make_scan

# not 'quick': interpret-mode fused-combine runs ~70 s of this module alone


@pytest.fixture(scope="module")
def filled(small_cfg):
    cfg = small_cfg
    terrain = synthetic.composite_terrain()
    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    ego = np.array([0.3, -0.2, 1.5])
    ing = jax.jit(lambda b, p, m, e: pipeline.ingest_and_insert(cfg, b, p, m, e))
    egos = []
    for i in range(cfg.buffer_size + 1):          # one slot overwritten
        ego = ego + np.array([0.9, 0.5, 0.02])    # moves the origin (re-origin masks)
        pts = make_scan(terrain, ego, seed=i, cfg=cfg)
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        buf, _ = ing(buf, jnp.asarray(pad), jnp.asarray(mask),
                     jnp.asarray(np.float32(ego)))
        egos.append(np.float32(ego))
    # a previous world so the decay veto + old-map merge paths are live
    world, _, _ = jax.jit(lambda b, w, e: pipeline.combine(cfg, b, w, e, impl="xla"))(
        buf, world, jnp.asarray(egos[-2])
    )
    return cfg, buf, world, jnp.asarray(egos[-1])


def _run_both(cfg, buf, world, ego):
    ref_w, ref_p, ref_ok = jax.jit(
        lambda b, w, e: pipeline.combine(cfg, b, w, e, impl="xla")
    )(buf, world, ego)
    origin = buf.grids.origin[buf.last_slot]
    any_valid = jnp.any(buf.slot_valid)
    fus_w, fus_p, fus_ok = jax.jit(
        lambda b, w, e: pipeline._combine_fused(
            cfg, b, w, e.astype(jnp.float32), origin, any_valid, interpret=True
        )
    )(buf, world, ego)
    return (ref_w, ref_p, ref_ok), (fus_w, fus_p, fus_ok)


def _assert_equal(ref, fus):
    (ref_w, ref_p, ref_ok), (fus_w, fus_p, fus_ok) = ref, fus
    assert bool(ref_ok) == bool(fus_ok)
    for name in ("hit", "miss", "min_height", "mom", "origin"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fus_w.grid, name)),
            np.asarray(getattr(ref_w.grid, name)), err_msg=name)
    np.testing.assert_array_equal(np.asarray(fus_w.evidence), np.asarray(ref_w.evidence))
    assert bool(fus_w.valid) == bool(ref_w.valid)
    for name in ref_p._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(fus_p, name)), np.asarray(getattr(ref_p, name)),
            err_msg=name)


def test_fused_combine_bitwise(filled):
    cfg, buf, world, ego = filled
    ref, fus = _run_both(cfg, buf, world, ego)
    _assert_equal(ref, fus)
    # sanity: the scene actually produced data
    assert np.asarray(ref[0].grid.hit).sum() > 0


def test_fused_combine_empty_buffer(small_cfg):
    cfg = small_cfg
    buf = empty_buffer_state(cfg)
    world = empty_world_state(cfg)
    ego = jnp.asarray(np.float32([0.3, -0.2, 1.5]))
    ref, fus = _run_both(cfg, buf, world, ego)
    # any_valid False: world passes through unchanged on both paths
    _assert_equal(ref, fus)
    assert not bool(ref[2])


def test_fused_combine_after_decay(filled):
    """Second combine on the same buffer (old map now live everywhere) —
    exercises the revive/decay and old-evidence merge heavily."""
    cfg, buf, world, ego = filled
    (ref_w, _, _), (fus_w, _, _) = _run_both(cfg, buf, world, ego)
    ref2, fus2 = _run_both(cfg, buf, ref_w, ego)
    _assert_equal(ref2, fus2)
