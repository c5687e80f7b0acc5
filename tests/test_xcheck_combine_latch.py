"""Independent brute-force cross-check of combine's phase A/B semantics.

A literal per-world-voxel loop written directly from the reference's
combine_indices / combine_metrics semantics (gvom.py:941-997, 198-266):
slots in index order — occupied latches, misses accumulate only while the
voxel is unoccupied so far, the old map revives only under the staleness
veto, old evidence merges only at still-unoccupied voxels, and occupation
wins (evidence zeroed). Phase B fuses data only from occupied sources.

The buffers are CONSTRUCTED (random channels, random per-slot origins, mixed
slot validity), not ingested — so this fuzzes the combine's latching and
re-origin masks directly against the literal model, independent of every
other code path. pipeline.combine's XLA and fused implementations are pinned
against each other separately (test_combine_kernel.py); the oracle is pinned
against pipeline by the parity suites — this test anchors the chain to the
reference semantics themselves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.models import pipeline
from gvom_tpu.ops.moments import packed_lanes
from gvom_tpu.types import BufferState, VoxelGrid, WorldState

pytestmark = pytest.mark.quick

X = Y = 8
Z = 4
B = 3


def make_cfg():
    return GvomConfig(xy_size=X, z_size=Z, max_points=64, buffer_size=B,
                      decay_miss_limit=3)


def rand_channels(rng, density=0.35):
    hit = np.where(rng.random((X, Y, Z)) < density,
                   rng.integers(1, 5, (X, Y, Z)), 0).astype(np.int32)
    miss = np.where(rng.random((X, Y, Z)) < 0.5,
                    rng.integers(1, 6, (X, Y, Z)), 0).astype(np.int32)
    minh = rng.random((X, Y, Z)).astype(np.float32)
    Vp = packed_lanes(Z)
    mom = np.zeros((X, 5, Y, Vp), np.float32)
    mom[..., : 2 * Z] = rng.normal(0, 1, (X, 5, Y, 2 * Z)).astype(np.float32)
    # r5 state invariant: stored moments are occupancy-masked at ingest
    # (zero wherever hit == 0) — the combine's slot mom merges rely on it
    occm = (hit > 0).transpose(0, 1, 2)  # [X, Y, Z]
    lane_mask = np.concatenate([occm, occm], axis=-1)[:, None]      # [X,1,Y,2Z]
    mom[..., : 2 * Z] *= lane_mask
    return hit, miss, minh, mom


def build_state(seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(-5, 5, 3)
    origins = [base + rng.integers(-2, 3, 3) for _ in range(B)]
    slot_valid = rng.random(B) < 0.8
    slots = [rand_channels(rng) for _ in range(B)]
    old_origin = base + rng.integers(-2, 3, 3)
    old = rand_channels(rng)
    old_ev = np.where(rng.random((X, Y, Z)) < 0.5,
                      rng.integers(1, 6, (X, Y, Z)), 0).astype(np.int32)
    old_valid = bool(rng.random() < 0.9)
    last = int(rng.integers(0, B))
    while not slot_valid[last]:
        slot_valid[last] = True                    # last_slot is always real
    return origins, slot_valid, slots, old_origin, old, old_ev, old_valid, last


def to_buffer(cfg, origins, slot_valid, slots, last):
    Vp = packed_lanes(Z)
    z3 = np.zeros((X, Y, Z))
    grids = VoxelGrid.from_logical(
        hit=np.stack([s[0] for s in slots] + [z3.astype(np.int32)]),
        miss=np.stack([s[1] for s in slots] + [z3.astype(np.int32)]),
        min_height=np.stack([s[2] for s in slots] + [np.ones((X, Y, Z), np.float32)]),
        mom=np.stack([s[3] for s in slots] + [np.zeros((X, 5, Y, Vp), np.float32)]),
        origin=np.stack(origins + [np.zeros(3)]).astype(np.int32),
    )
    return BufferState(
        grids=grids,
        slot_valid=jnp.asarray(slot_valid),
        cursor=jnp.asarray(0, jnp.int32),
        last_slot=jnp.asarray(last, jnp.int32),
    )


def brute_combine(cfg, origins, slot_valid, slots, old_origin, old, old_ev,
                  old_valid, target_origin):
    """Literal per-world-voxel combine; returns torus-layout arrays."""
    Vp = packed_lanes(Z)
    size = np.array([X, Y, Z])
    occ = np.zeros((X, Y, Z), bool)
    ev = np.zeros((X, Y, Z), np.int64)
    hit = np.zeros((X, Y, Z), np.int64)
    miss = np.zeros((X, Y, Z), np.int64)
    minh = np.ones((X, Y, Z))
    mom = np.zeros((X, 5, Y, Vp))
    to = np.asarray(target_origin)

    def covered(o_s, w):
        return all(o_s[a] <= w[a] < o_s[a] + size[a] for a in range(3))

    for rx in range(X):
        for ry in range(Y):
            for rz in range(Z):
                w = to + (rx, ry, rz)              # world voxel of this window cell
                t = tuple(w % size)                # its torus array index
                # --- phase A: slot-order latching (gvom.py:941-997) ---
                for s in range(B):
                    if not slot_valid[s] or not covered(origins[s], w):
                        continue
                    h = slots[s][0][t]
                    if h > 0:
                        occ[t] = True
                    elif slots[s][1][t] > 0 and not occ[t]:
                        ev[t] += slots[s][1][t]
                old_cov = old_valid and covered(old_origin, w)
                old_occ = old_cov and old[0][t] > 0
                if old_occ and not occ[t] and ev[t] <= cfg.decay_miss_limit:
                    occ[t] = True                  # revive (staleness veto)
                if old_cov and not old_occ and old_ev[t] > 0 and not occ[t]:
                    ev[t] += old_ev[t]
                if occ[t]:
                    ev[t] = 0                      # occupied-wins
                # --- phase B: occupied-source data fusion (gvom.py:238-266) ---
                srcs = [
                    (slots[s][0][t], slots[s][1][t], slots[s][2][t], slots[s][3], False)
                    for s in range(B)
                    if slot_valid[s] and covered(origins[s], w) and slots[s][0][t] > 0
                ]
                if old_occ and occ[t]:
                    srcs.append((old[0][t], old[1][t], old[2][t], old[3], True))
                for h, m, mh, mo, _ in srcs:
                    hit[t] += h
                    miss[t] += m
                    minh[t] = min(minh[t], mh)
                    tz = t[2]                  # packed lanes address TORUS z
                    for c in range(5):
                        mom[t[0], c, t[1], tz] += mo[t[0], c, t[1], tz]
                        mom[t[0], c, t[1], Z + tz] += mo[t[0], c, t[1], Z + tz]
    return occ, ev, hit, miss, minh, mom


@pytest.mark.parametrize("seed", range(10))
def test_combine_latching_vs_brute(seed):
    cfg = make_cfg()
    origins, slot_valid, slots, old_origin, old, old_ev, old_valid, last = build_state(seed)
    buf = to_buffer(cfg, origins, slot_valid, slots, last)
    world = WorldState.from_logical(
        grid=VoxelGrid.from_logical(
            hit=old[0], miss=old[1], min_height=old[2], mom=old[3],
            origin=old_origin.astype(np.int32),
        ),
        evidence=old_ev,
        valid=old_valid,
    )
    ego = jnp.asarray(np.float32([0, 0, 0]))
    w, _, ok = jax.jit(lambda b, wd: pipeline.combine(cfg, b, wd, ego, impl="xla"))(
        buf, world)
    assert bool(ok)
    occ_b, ev_b, hit_b, miss_b, minh_b, mom_b = brute_combine(
        cfg, origins, slot_valid, slots, old_origin, old, old_ev, old_valid,
        origins[last])
    np.testing.assert_array_equal(np.asarray(w.grid.hit), hit_b)
    np.testing.assert_array_equal(np.asarray(w.grid.hit > 0), occ_b)
    np.testing.assert_array_equal(np.asarray(w.evidence), ev_b)
    np.testing.assert_array_equal(np.asarray(w.grid.miss), miss_b)
    np.testing.assert_allclose(np.asarray(w.grid.min_height), minh_b, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w.grid.mom), mom_b, atol=1e-4)
