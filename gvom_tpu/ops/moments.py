"""Moment algebra: Chan-style merges, the neighborhood box aggregation, and
covariance/eigenvalue features.

Replaces the reference's two-pass mean→covariance atomic scatter with
neighborhood expansion (K8-K11, gvom.py:1170-1299) and its parallel-axis map
merge (K15, gvom.py:853-909). State is (n, μ, M2) with M2 = Σ(p−μ)(p−μ)ᵀ
unnormalized — the reference's normalized covariance is C = M2/n, and its
merge formula `C = (n1C1 + n2C2 + n1δ1δ1ᵀ + n2δ2δ2ᵀ)/(n1+n2)` is exactly the
Chan merge below multiplied through by n. The Chan form is associative and
translation-invariant, which is what lets:

  * the ±eigen_dist neighborhood expansion become a separable box filter
    (3 shifted merges per axis instead of 27 scatter passes per point), and
  * map fusion / scan batching / device psum all reuse one merge primitive.

Eigenvalues use the closed-form trigonometric method for symmetric 3×3
matrices, same algorithm as the reference (gvom.py:1331-1378).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.ops.binning import PointBins, moment_pad

__all__ = ["chan_merge", "box_aggregate_moments", "covariance", "eigenvalues"]

_PAIRS = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))

Moments = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # n [..], mean [3,..], m2 [6,..]


def chan_merge(a: Moments, b: Moments) -> Moments:
    """Associative merge of two moment sets (elementwise over trailing dims)."""
    n1, mu1, m21 = a
    n2, mu2, m22 = b
    n = n1 + n2
    safe = jnp.where(n > 0, n, 1.0)
    mu = (mu1 * n1 + mu2 * n2) / safe
    d1 = mu1 - mu
    d2 = mu2 - mu
    corr = jnp.stack(
        [n1 * d1[i] * d1[j] + n2 * d2[i] * d2[j] for i, j in _PAIRS], axis=0
    )
    m2 = m21 + m22 + corr
    has = n > 0
    return (
        jnp.where(has, n, 0.0),
        jnp.where(has, mu, 0.0),
        jnp.where(has, m2, 0.0),
    )


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
    """Aggregate own-voxel moments over the ±xy_eigen_dist/±z_eigen_dist box
    (the reference's per-point neighborhood scatter, gvom.py:1188-1202) and
    crop the padding. Returns map-frame (n, mean, m2) on the unpadded grid."""
    n, mu, m2 = bins.n0, bins.mean0, bins.m20
    radii = moment_pad(cfg)
    for ax, r in enumerate(radii):
        if r == 0:
            continue
        acc = (n, mu, m2)
        for off in range(-r, r + 1):
            if off == 0:
                continue
            sh = (
                _shifted(n, off, ax),
                _shifted(mu, off, ax + 1),
                _shifted(m2, off, ax + 1),
            )
            acc = chan_merge(acc, sh)
        n, mu, m2 = acc
    rx, ry, rz = radii
    sl = (slice(rx, rx + cfg.xy_size), slice(ry, ry + cfg.xy_size), slice(rz, rz + cfg.z_size))
    return n[sl], mu[(slice(None),) + sl], m2[(slice(None),) + sl]


def covariance(n: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Normalized covariance C = M2/n, zeros where empty (gvom.py:1287-1299)."""
    safe = jnp.where(n > 0, n, 1.0)
    return jnp.where(n > 0, m2 / safe, 0.0)


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
