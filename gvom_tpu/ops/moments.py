"""Moment algebra: raw voxel-local sums, the neighborhood box aggregation, and
covariance/eigenvalue features.

Replaces the reference's two-pass mean→covariance atomic scatter with
neighborhood expansion (K8-K11, gvom.py:1170-1299) and its parallel-axis map
merge (K15, gvom.py:853-909). State is raw sums in the *target voxel's local
frame* — n (point count, metrics[9]), S1 = Σ(p − v), R2 = Σ(p − v)(p − v)ᵀ —
exactly the frame the reference's metrics use (gvom.py:1205-1207). The
reference's normalized forms are recovered only at read time:
mean = S1/n, covariance C = R2/n − (S1/n)(S1/n)ᵀ.

Why raw sums and not Chan-style (n, μ, M2):

  * every merge — buffer-slot fusion, scan batching, device psum — is a plain
    masked ADD: associative, division-free, and exactly what the fused hot
    path wants (Chan merges cost ~16 ms/step in divisions at 256³ grids);
  * voxel-local sums are frame-INVARIANT under re-origining, so the torus
    re-origin (ops/grid.align_to) is masks only, no mean adjustment;
  * the ±eigen_dist neighborhood expansion is a separable shift+translate box
    filter (the translate is a static-offset polynomial update, below) —
    3 shifted adds per axis instead of 27 scatter passes per point.

Eigenvalues use the closed-form trigonometric method for symmetric 3×3
matrices, same algorithm as the reference (gvom.py:1331-1378).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops.binning import PointBins, moment_pad

__all__ = [
    "raw_merge",
    "translate_raw",
    "box_aggregate_moments",
    "mean_local",
    "covariance",
    "eigenvalues",
    "packed_lanes",
    "pack_moments",
    "unpack_moments",
    "packed_voxel_mask",
]

_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))

Moments = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # n [..], s1 [3,..], s2 [6,..]


# ----------------------------------------------------------------------
# Packed storage layout
#
# The hot path (ops.pallas_kernels.fused_point_moments) emits the ten raw
# moment channels as FIVE [Y, 2Z-in-lanes] matmul results per x-slice — two
# channels per result's lane halves, zero junk (a slot's halves may come from
# two matmuls whose B factors occupy disjoint column halves). Splitting lane
# halves into separate [X,Y,Z] channel arrays is pure vreg repacking
# (~5 ms/step at the reference config), and no hot consumer needs the split:
# buffer insert, slot fusion, decay merge, and device psum are all
# elementwise adds/masks. So VoxelGrid stores moments in the packed layout
# [X, 5, Y, Vp] and the split happens only at cold read points (debug
# exporters, parity tests).
#
#   slot  lanes [0:Z]  lanes [Z:2Z]
#   0     n            sz
#   1     sx           xz
#   2     sy           yz
#   3     xx           xy
#   4     yy           zz

_SLOT_LO = ("n", "sx", "sy", "xx", "yy")
_SLOT_HI = ("sz", "xz", "yz", "xy", "zz")
N_SLOTS = 5


def packed_lanes(z_size: int) -> int:
    """Lane width of the packed layout: two z halves, 128-lane aligned."""
    return max(128, ((2 * z_size + 127) // 128) * 128)


def pack_moments(n: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """(n [X,Y,Z], s1 [3,X,Y,Z], s2 [6,X,Y,Z]) → packed [X, 5, Y, Vp]."""
    z = n.shape[-1]
    ch = {"n": n, "sx": s1[0], "sy": s1[1], "sz": s1[2],
          "xx": s2[0], "xy": s2[1], "xz": s2[2], "yy": s2[3], "yz": s2[4], "zz": s2[5]}
    lo = jnp.stack([ch[k] for k in _SLOT_LO], axis=1)
    hi = jnp.stack([ch[k] for k in _SLOT_HI], axis=1)
    pad = packed_lanes(z) - 2 * z
    parts = [lo, hi]
    if pad:
        parts.append(jnp.zeros(lo.shape[:-1] + (pad,), lo.dtype))
    return jnp.concatenate(parts, axis=-1)


def unpack_moments(mom: jnp.ndarray, z_size: int) -> Moments:
    """Packed [..., X, 5, Y, Vp] → (n, s1 [3,...], s2 [6,...])  [..., X, Y, Z]."""
    lo = slice(0, z_size)
    hi = slice(z_size, 2 * z_size)
    get = lambda s, lanes: mom[..., :, s, :, lanes]
    n = get(0, lo)
    s1 = jnp.stack([get(1, lo), get(2, lo), get(0, hi)], axis=0)
    # s2 order (xx, xy, xz, yy, yz, zz)
    s2 = jnp.stack([get(3, lo), get(3, hi), get(1, hi), get(4, lo), get(2, hi), get(4, hi)], axis=0)
    return n, s1, s2


def packed_voxel_mask(mask: jnp.ndarray, z_size: int) -> jnp.ndarray:
    """Voxel mask [..., X, Y, Z] → packed-lane mask [..., X, Y, Vp] (both
    halves carry the voxel's mask; padding lanes False). Apply to a packed
    array as m[..., :, None, :, :]."""
    pad = packed_lanes(z_size) - 2 * z_size
    parts = [mask, mask]
    if pad:
        parts.append(jnp.zeros(mask.shape[:-1] + (pad,), mask.dtype))
    return jnp.concatenate(parts, axis=-1)

# per axis: (diagonal pair index, [(cross pair index, S1 component)])
_AX_TERMS = {
    0: (0, ((1, 1), (2, 2))),  # xx; xy += t·S1_y, xz += t·S1_z
    1: (3, ((1, 0), (4, 2))),  # yy; xy += t·S1_x, yz += t·S1_z
    2: (5, ((2, 0), (4, 1))),  # zz; xz += t·S1_x, yz += t·S1_y
}


def raw_merge(a: Moments, b: Moments) -> Moments:
    """Merge two same-frame raw-moment sets: a plain add."""
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def translate_raw(
    n: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray, axis: int, t: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-express raw local sums after shifting the frame by −t along `axis`
    (coordinates become x + t·e_axis): S1' = S1 + n·t·e, R2' picks up the
    parallel-axis cross terms. Static offset → compiles to fused adds."""
    tf = jnp.float32(t)
    diag, cross = _AX_TERMS[axis]
    s2_c = [s2[i] for i in range(6)]
    s2_c[diag] = s2_c[diag] + (2.0 * tf) * s1[axis] + (tf * tf) * n
    for pidx, comp in cross:
        s2_c[pidx] = s2_c[pidx] + tf * s1[comp]
    s1_c = [s1[i] for i in range(3)]
    s1_c[axis] = s1_c[axis] + tf * n
    return jnp.stack(s1_c, axis=0), jnp.stack(s2_c, axis=0)


def _shifted(arr: jnp.ndarray, off: int, axis: int) -> jnp.ndarray:
    """out[i] = arr[i + off] along `axis` (static off), zero-filled."""
    if off == 0:
        return arr
    n = arr.shape[axis]
    pad = [(0, 0)] * arr.ndim
    if off > 0:
        pad[axis] = (0, off)
        padded = jnp.pad(arr, pad)
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(off, off + n)
    else:
        pad[axis] = (-off, 0)
        padded = jnp.pad(arr, pad)
        idx = [slice(None)] * arr.ndim
        idx[axis] = slice(0, n)
    return padded[tuple(idx)]


def box_aggregate_moments(cfg: GvomConfig, bins: PointBins) -> Moments:
    """Aggregate own-voxel raw moments over the ±xy_eigen_dist/±z_eigen_dist
    box (the reference's per-point neighborhood scatter, gvom.py:1188-1202):
    target u receives source v = u + off with coordinates translated into u's
    local frame (p − u = (p − v) + off·e). Crops the padding; returns
    voxel-local (n, S1, R2) on the unpadded grid."""
    n, s1, s2 = bins.n0, bins.s1, bins.s2
    radii = moment_pad(cfg)
    for ax, r in enumerate(radii):
        if r == 0:
            continue
        acc_n, acc_s1, acc_s2 = n, s1, s2
        for off in range(-r, r + 1):
            if off == 0:
                continue
            sn = _shifted(n, off, ax)
            ts1, ts2 = translate_raw(
                sn, _shifted(s1, off, ax + 1), _shifted(s2, off, ax + 1), ax, float(off)
            )
            acc_n = acc_n + sn
            acc_s1 = acc_s1 + ts1
            acc_s2 = acc_s2 + ts2
        n, s1, s2 = acc_n, acc_s1, acc_s2
    rx, ry, rz = radii
    sl = (slice(rx, rx + cfg.xy_size), slice(ry, ry + cfg.xy_size), slice(rz, rz + cfg.z_size))
    return n[sl], s1[(slice(None),) + sl], s2[(slice(None),) + sl]


def mean_local(n: jnp.ndarray, s1: jnp.ndarray) -> jnp.ndarray:
    """Voxel-local normalized mean S1/n (reference metrics[0:3],
    gvom.py:1222-1230), zeros where empty."""
    safe = jnp.where(n > 0, n, 1.0)
    return jnp.where(n[None] > 0, s1 / safe[None], 0.0)


def covariance(n: jnp.ndarray, s1: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
    """Normalized covariance C = R2/n − μμᵀ with μ = S1/n, zeros where empty
    (gvom.py:1287-1299)."""
    safe = jnp.where(n > 0, n, 1.0)
    mu = s1 / safe[None]
    cov = s2 / safe[None] - jnp.stack([mu[i] * mu[j] for i, j in _PAIRS], axis=0)
    return jnp.where(n[None] > 0, cov, 0.0)


def eigenvalues(cov: jnp.ndarray) -> jnp.ndarray:
    """Sorted (λ0 ≥ λ1 ≥ λ2) eigenvalues of the symmetric 3×3 per-voxel
    covariance, closed-form trigonometric method (gvom.py:1345-1378).
    cov is [6, ...] in (xx,xy,xz,yy,yz,zz) order; returns [3, ...]."""
    xx, xy, xz, yy, yz, zz = [cov[i] for i in range(6)]
    p1 = xy * xy + xz * xz + yz * yz
    q = (xx + yy + zz) / 3.0
    e0d = jnp.maximum(xx, jnp.maximum(yy, zz))
    e2d = jnp.minimum(xx, jnp.minimum(yy, zz))
    p2 = (xx - q) ** 2 + (yy - q) ** 2 + (zz - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    ps = jnp.where(p > 0, p, 1.0)
    b0, b1, b2 = (xx - q) / ps, xy / ps, xz / ps
    b3, b4, b5 = (yy - q) / ps, yz / ps, (zz - q) / ps
    r = (b0 * (b3 * b5 - b4 * b4) - b1 * (b1 * b5 - b4 * b2) + b2 * (b1 * b4 - b3 * b2)) / 2.0
    phi = jnp.where(
        r <= -1.0,
        jnp.float32(math.pi / 3.0),
        jnp.where(r >= 1.0, 0.0, jnp.arccos(jnp.clip(r, -1.0, 1.0)) / 3.0),
    )
    e0 = q + 2.0 * p * jnp.cos(phi)
    e2 = q + 2.0 * p * jnp.cos(phi + 2.0 * math.pi / 3.0)
    diag = p1 == 0
    l0 = jnp.where(diag, e0d, e0)
    l2 = jnp.where(diag, e2d, e2)
    l1 = 3.0 * q - l0 - l2
    return jnp.stack([l0, l1, l2], axis=0)
