"""2D map derivation (the reference's K17-K23, gvom.py:412-734).

Every kernel here is a per-column reduction or a bounded stencil — native XLA
territory. Designs:

  * height / inferred height: masked first-occupied-z argmax per column
    (replaces the per-column z loop, gvom.py:536-554).
  * slope + roughness: the 3×3 least-squares plane fit's normal equations are
    built from 9 statically shifted adds; coordinates are taken relative to
    the center cell (the fit is translation invariant — algebraically equal to
    gvom.py:679-734 but f32-stable).
  * guess height: the reference's data-dependent outward search
    (gvom.py:556-661) becomes per-row/column nearest-known-index prefix scans
    plus `guess_search_radius` unrolled constant-time steps, replicating the
    reference's early-exit quirks exactly (x_p_done never tested in the loop
    condition; y_nh merged under the x_nh guard).
  * positive obstacle: masked per-column band reduction (gvom.py:487-521,
    including the +1 band-start offset).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from gvom_tpu.config import GvomConfig
from gvom_tpu.types import UNKNOWN_HEIGHT

__all__ = [
    "height_map",
    "inferred_height_map",
    "slope_and_roughness",
    "guess_height_delta",
    "positive_obstacle_map",
    "negative_obstacle_map",
    "visibility_map",
]

# plain int (a jnp scalar here would initialize the device backend at import
# time, pinning the platform before hosts can select the virtual CPU mesh)
_BIG = 1 << 20


def _z_priority(cfg: GvomConfig, origin: jnp.ndarray) -> jnp.ndarray:
    """[Z] window-relative z of each torus z index (bottom of window = 0)."""
    Z = cfg.z_size
    return (jnp.arange(Z, dtype=jnp.int32) - origin[2]) % Z


def _z_priority_packed(cfg: GvomConfig, origin: jnp.ndarray) -> jnp.ndarray:
    """[2Z] window-relative z per y-paired lane (ops/grid layout)."""
    from gvom_tpu.ops.grid import packed_z_coord

    return (packed_z_coord(cfg.z_size) - origin[2]) % cfg.z_size


def _first_in_column(cfg: GvomConfig, mask_pk: jnp.ndarray, origin: jnp.ndarray):
    """(any [X,Y], rel_z of first [X,Y], packed one-hot of first) for a
    bottom-up column scan over a torus-layout y-paired [X, Y/2, 2Z] mask
    (replaces the reference's per-column z loop, gvom.py:536-554, without
    data movement)."""
    from gvom_tpu.ops.grid import expand_cols_packed, reduce_z_packed

    Z = cfg.z_size
    pz = _z_priority_packed(cfg, origin)[None, None, :]
    score = jnp.where(mask_pk, pz, Z)
    zrel = reduce_z_packed(score, "min")
    any_hit = zrel < Z
    sel = mask_pk & (score == expand_cols_packed(zrel, Z))
    return any_hit, zrel, sel


def height_map(
    cfg: GvomConfig,
    occ: jnp.ndarray,
    min_height: jnp.ndarray,
    origin: jnp.ndarray,
    ego_position: jnp.ndarray,
    y_coords: jnp.ndarray = None,
) -> jnp.ndarray:
    """First-occupied-voxel height per column with the ego-disk pre-seed
    (gvom.py:523-540). 3D inputs are torus-layout in the y-paired packed
    storage ([X, Y/2, 2Z], ops/grid); the output 2D map is
    torus-layout in (x, y) — canonicalize with torus_to_window for stencils.

    `y_coords` optionally gives the global torus y index of each input column
    (a y-sharded caller passes its slab's indices; default 0..X-1)."""
    from gvom_tpu.ops.grid import reduce_z_packed

    X = cfg.xy_size
    any_occ, zrel, sel = _first_in_column(cfg, occ, origin)
    mh = reduce_z_packed(jnp.where(sel, min_height, 0.0), "sum")
    col_h = (mh + zrel.astype(jnp.float32) + origin[2].astype(jnp.float32)) * cfg.z_resolution
    if y_coords is None:
        y_coords = jnp.arange(X, dtype=jnp.int32)
    relx = ((jnp.arange(X, dtype=jnp.int32) - origin[0]) % X).astype(jnp.float32)
    rely = ((y_coords.astype(jnp.int32) - origin[1]) % X).astype(jnp.float32)
    gx = (origin[0].astype(jnp.float32) + relx)[:, None] * cfg.xy_resolution - ego_position[0]
    gy = (origin[1].astype(jnp.float32) + rely)[None, :] * cfg.xy_resolution - ego_position[1]
    disk = gx * gx + gy * gy <= jnp.float32(cfg.robot_radius) ** 2
    seed = jnp.where(disk, ego_position[2] - jnp.float32(cfg.ground_to_lidar_height), UNKNOWN_HEIGHT)
    return jnp.where(any_occ, col_h, seed)


def inferred_height_map(
    cfg: GvomConfig, occ: jnp.ndarray, evidence: jnp.ndarray, origin: jnp.ndarray
) -> jnp.ndarray:
    """First observed-empty voxel per column (gvom.py:542-554); torus in/out
    (3D inputs y-paired packed)."""
    miss = (~occ) & (evidence > 0)
    any_miss, zrel, _ = _first_in_column(cfg, miss, origin)
    ih = (zrel.astype(jnp.float32) + origin[2].astype(jnp.float32)) * cfg.z_resolution
    return jnp.where(any_miss, ih, UNKNOWN_HEIGHT)


def _shift2(arr: jnp.ndarray, di: int, dj: int, fill) -> jnp.ndarray:
    """out[i,j] = arr[i+di, j+dj], static offsets, fill outside."""
    X, Y = arr.shape
    out = arr
    padi = (max(0, -di), max(0, di))
    padj = (max(0, -dj), max(0, dj))
    out = jnp.pad(out, (padi, padj), constant_values=fill)
    return out[padi[0] + di: padi[0] + di + X, padj[0] + dj: padj[0] + dj + Y]


def slope_and_roughness(cfg: GvomConfig, hm: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """3×3 neighborhood least-squares plane fit: x/y slope angles and
    roughness = log mean squared residual (gvom.py:663-734)."""
    res = jnp.float32(cfg.xy_resolution)
    known = hm > UNKNOWN_HEIGHT
    kf = known.astype(jnp.float32)
    hz = jnp.where(known, hm, 0.0).astype(jnp.float32)

    cnt = jnp.zeros_like(kf)
    sx = jnp.zeros_like(kf); sy = jnp.zeros_like(kf); sz = jnp.zeros_like(kf)
    sxx = jnp.zeros_like(kf); sxy = jnp.zeros_like(kf); sxz = jnp.zeros_like(kf)
    syy = jnp.zeros_like(kf); syz = jnp.zeros_like(kf); szz = jnp.zeros_like(kf)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            k = _shift2(kf, di, dj, 0.0)
            z = _shift2(hz, di, dj, 0.0)
            dx = di * res
            dy = dj * res
            cnt += k
            sx += dx * k
            sy += dy * k
            sz += z
            sxx += dx * dx * k
            sxy += dx * dy * k
            sxz += dx * z
            syy += dy * dy * k
            syz += dy * z
            szz += z * z

    ok = cnt >= 3
    c = jnp.where(ok, cnt, 1.0)
    mx, my, mz = sx / c, sy / c, sz / c
    xx = sxx - c * mx * mx
    xy = sxy - c * mx * my
    xz = sxz - c * mx * mz
    yy = syy - c * my * my
    yz = syz - c * my * mz
    zz = szz - c * mz * mz
    det = xx * yy - xy * xy
    ok = ok & (det != 0)
    dets = jnp.where(det != 0, det, 1.0)
    a0 = (yy * xz - xy * yz) / dets
    a1 = (xx * yz - xy * xz) / dets
    m = jnp.sqrt(a0 * a0 + a1 * a1 + 1.0)
    a0n, a1n = a0 / m, a1 / m
    err = (zz - 2.0 * (a0n * xz + a1n * yz) + a0n * a0n * xx + 2.0 * a0n * a1n * xy + a1n * a1n * yy) / c
    err = jnp.where(err > 0, jnp.log(jnp.where(err > 0, err, 1.0)), err)
    rough = jnp.where(ok, err, -1.0)
    slope_x = jnp.where(ok, jnp.arctan2(a0n, 1.0 / m), 0.0)
    slope_y = jnp.where(ok, jnp.arctan2(a1n, 1.0 / m), 0.0)
    return slope_x, slope_y, rough


def _nearest_known_with_value(known: jnp.ndarray, idx: jnp.ndarray, hm: jnp.ndarray, axis: int):
    """(nearest index >= i with known[index], its height) along `axis`.

    Flip, then an associative 'rightmost-valid-wins' scan: after flipping,
    positions later in scan order are original indices closer to the query
    from above, so keeping the latest valid element yields the nearest."""
    flipped = tuple(jnp.flip(a, axis=axis) for a in (known, idx, hm))

    def combine(a, b):
        av, ai, ah = a
        bv, bi, bh = b
        return (av | bv, jnp.where(bv, bi, ai), jnp.where(bv, bh, ah))

    out = jax.lax.associative_scan(combine, flipped, axis=axis)
    valid, oi, oh = tuple(jnp.flip(a, axis=axis) for a in out)
    oi = jnp.where(valid, oi, _BIG)
    return oi, oh


def guess_height_delta(cfg: GvomConfig, hm: jnp.ndarray, ihm: jnp.ndarray) -> jnp.ndarray:
    """Height uncertainty for inferred-only cells (gvom.py:556-661).

    For each cell with no measured height but an inferred one, search outward
    up to guess_search_radius steps in ±x/±y wedges for the nearest measured
    heights and output max−min over {found heights, inferred height}. The
    reference's early-exit and merge quirks are replicated (see module
    docstring)."""
    X = cfg.xy_size
    R = cfg.guess_search_radius
    known = hm > UNKNOWN_HEIGHT

    yidx = jax.lax.broadcasted_iota(jnp.int32, (X, X), 1)
    xidx = jax.lax.broadcasted_iota(jnp.int32, (X, X), 0)
    ny_idx, ny_val = _nearest_known_with_value(known, yidx, hm, axis=1)  # along y, per row
    nx_idx, nx_val = _nearest_known_with_value(known, xidx, hm, axis=0)  # along x, per column

    x0 = xidx
    y0 = yidx
    UH = jnp.float32(UNKNOWN_HEIGHT)

    # per-direction state
    done = {d: jnp.zeros((X, X), bool) for d in ("xp", "xn", "yp", "yn")}
    hval = {d: jnp.full((X, X), UH) for d in ("xp", "xn", "yp", "yn")}
    running = jnp.ones((X, X), bool)

    def row_query(n_idx, n_val, row_shift, lo_shift):
        """(cand_idx, cand_val) of the first known at column >= y0+lo_shift in
        row x0+row_shift — all static shifts (the window start clamps to 0 by
        broadcasting the row's column 0)."""
        shifted_i = _shift2(n_idx, row_shift, lo_shift, _BIG)
        shifted_v = _shift2(n_val, row_shift, lo_shift, UNKNOWN_HEIGHT)
        row_i = _shift2(n_idx, row_shift, 0, _BIG)
        row_v = _shift2(n_val, row_shift, 0, UNKNOWN_HEIGHT)
        clamped = y0 + lo_shift < 0
        cand = jnp.where(clamped, jnp.broadcast_to(row_i[:, 0:1], (X, X)), shifted_i)
        val = jnp.where(clamped, jnp.broadcast_to(row_v[:, 0:1], (X, X)), shifted_v)
        return cand, val

    def col_query(n_idx, n_val, col_shift, lo_shift):
        shifted_i = _shift2(n_idx, lo_shift, col_shift, _BIG)
        shifted_v = _shift2(n_val, lo_shift, col_shift, UNKNOWN_HEIGHT)
        col_i = _shift2(n_idx, 0, col_shift, _BIG)
        col_v = _shift2(n_val, 0, col_shift, UNKNOWN_HEIGHT)
        clamped = x0 + lo_shift < 0
        cand = jnp.where(clamped, jnp.broadcast_to(col_i[0:1, :], (X, X)), shifted_i)
        val = jnp.where(clamped, jnp.broadcast_to(col_v[0:1, :], (X, X)), shifted_v)
        return cand, val

    def update(d, active, oob, found, val):
        take = active & ~done[d] & ~oob & found
        hval[d] = jnp.where(take, val, hval[d])
        done[d] = done[d] | (active & ~done[d] & (oob | found))

    for i in range(1, R + 1):
        active = running
        # x_p: row x0+i, dy in [-i, i-1] (gvom.py:588-599)
        cand, val = row_query(ny_idx, ny_val, i, -i)
        update("xp", active, x0 + i >= X, cand <= jnp.minimum(y0 + i - 1, X - 1), val)
        # x_n: row x0-i, dy in [-i+1, i] (gvom.py:601-612)
        cand, val = row_query(ny_idx, ny_val, -i, -i + 1)
        update("xn", active, x0 - i < 0, cand <= jnp.minimum(y0 + i, X - 1), val)
        # y_p: column y0+i, dx in [-i+1, i] (gvom.py:614-625)
        cand, val = col_query(nx_idx, nx_val, i, -i + 1)
        update("yp", active, y0 + i >= X, cand <= jnp.minimum(x0 + i, X - 1), val)
        # y_n: column y0-i, dx in [-i, i-1] (gvom.py:627-638)
        cand, val = col_query(nx_idx, nx_val, -i, -i)
        update("yn", active, y0 - i < 0, cand <= jnp.minimum(x0 + i - 1, X - 1), val)
        # loop-exit quirk: x_p_done is never tested (gvom.py:581)
        running = running & ~(done["xn"] & done["yp"] & done["yn"])

    min_h = jnp.full((X, X), 1000.0)
    max_h = jnp.where(ihm != UNKNOWN_HEIGHT, ihm, UH)
    for d, guard in (("xp", "xp"), ("xn", "xn"), ("yp", "yp"), ("yn", "xn")):
        # the y_n merge is guarded by x_n's sentinel — reference quirk (gvom.py:655)
        g = hval[guard] > UNKNOWN_HEIGHT
        v = hval[d]
        min_h = jnp.where(g, jnp.minimum(v, min_h), min_h)
        max_h = jnp.where(g, jnp.maximum(v, max_h), max_h)
    dh = max_h - min_h
    out = jnp.where((~known) & (ihm != UNKNOWN_HEIGHT) & (dh > 0), dh, 0.0)
    return out


def positive_obstacle_map(
    cfg: GvomConfig,
    occ: jnp.ndarray,
    hit: jnp.ndarray,
    total: jnp.ndarray,
    hm: jnp.ndarray,
    slope_x: jnp.ndarray,
    slope_y: jnp.ndarray,
    origin: jnp.ndarray,
) -> jnp.ndarray:
    """Mean occupied-voxel density in the column band
    [height+threshold, height+robot_height] (gvom.py:487-521).

    All inputs (3D grid channels y-paired packed, hm, slopes) and the output
    are torus-layout; the band test uses each voxel's window-relative z (pure
    iota arithmetic)."""
    from gvom_tpu.ops.grid import expand_cols_packed, reduce_z_packed

    Z = cfg.z_size
    steep = jnp.sqrt(slope_x * slope_x + slope_y * slope_y) >= jnp.float32(cfg.slope_obstacle_threshold)
    o2 = origin[2].astype(jnp.float32)
    lo = jnp.floor((hm + cfg.positive_obstacle_threshold) / cfg.z_resolution - o2).astype(jnp.int32) + 1
    hi = jnp.floor((hm + cfg.robot_height) / cfg.z_resolution - o2).astype(jnp.int32)
    band_ok = (lo >= 0) & (lo < Z) & (hi >= 0) & (hi < Z)
    zs = _z_priority_packed(cfg, origin)[None, None, :]
    in_band = (zs >= expand_cols_packed(lo, Z)) & (zs <= expand_cols_packed(hi, Z))
    strong = occ & (hit > cfg.hit_count_threshold)
    sel = in_band & strong
    num = reduce_z_packed(jnp.where(sel, hit, 0), "sum").astype(jnp.float32)
    den = reduce_z_packed(jnp.where(sel, total, 0), "sum").astype(jnp.float32)
    dens = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
    val = (dens * 100.0).astype(jnp.int32)
    return jnp.where(steep, 100, jnp.where(band_ok, val, 0))


def negative_obstacle_map(cfg: GvomConfig, guessed_delta: jnp.ndarray) -> jnp.ndarray:
    """gvom.py:477-485."""
    return jnp.where(guessed_delta > jnp.float32(cfg.negative_obstacle_threshold), 100, 0).astype(jnp.int32)


def visibility_map(hm: jnp.ndarray) -> jnp.ndarray:
    """gvom.py:412-422."""
    return (hm > UNKNOWN_HEIGHT).astype(jnp.int32)
