"""Shared test utilities."""
import numpy as np


def dist_scan_batch(cfg, n):
    """Deterministic (scans, masks, egos) numpy batch — identical in every
    process (used by test_distributed's workers and the in-process
    reference)."""
    from gvom_tpu.io import synthetic

    scans, masks, egos = [], [], []
    ego = np.array([0.3, -0.2, 1.5])
    for i in range(n):
        ego = ego + np.array([0.15, 0.1, 0.0])
        pts = synthetic.simulate_lidar_scan(
            synthetic.composite_terrain(), ego, channels=8, azimuth_steps=32,
            max_range=10.0, seed=i,
        )
        pad, mask = synthetic.pad_scan(pts, cfg.max_points)
        scans.append(pad)
        masks.append(mask)
        egos.append(ego.astype(np.float32))
    return np.stack(scans), np.stack(masks), np.stack(egos).astype(np.float32)


def singular_fit_mask(hm, res):
    """Cells whose 3x3 plane fit is (near-)singular - det == 0 mathematically
    (e.g. exactly 3 collinear known cells). Any implementation's det!=0 guard
    then keys off rounding noise; excluded from parity comparisons."""
    X = hm.shape[0]
    known = hm > -1000
    cnt = np.zeros_like(hm); sx = np.zeros_like(hm); sy = np.zeros_like(hm)
    sxx = np.zeros_like(hm); sxy = np.zeros_like(hm); syy = np.zeros_like(hm)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            s0 = slice(max(0, -di), min(X, X - di)); s1 = slice(max(0, -dj), min(X, X - dj))
            t0 = slice(max(0, di), min(X, X + di)); t1 = slice(max(0, dj), min(X, X + dj))
            k = np.zeros_like(hm); k[s0, s1] = known[t0, t1]
            cnt += k; sx += di * res * k; sy += dj * res * k
            sxx += (di * res) ** 2 * k; sxy += di * dj * res * res * k; syy += (dj * res) ** 2 * k
    c = np.maximum(cnt, 1)
    xx = sxx - (sx * sx) / c
    xy = sxy - (sx * sy) / c
    yy = syy - (sy * sy) / c
    det = xx * yy - xy * xy
    scale = np.maximum(xx * yy, 1e-12)
    return (cnt < 3) | (np.abs(det) <= 1e-4 * scale)


def canonical(arr, origin):
    """Torus -> window-relative layout for the trailing 3 grid axes."""
    arr = np.asarray(arr)
    for ax in range(3):
        arr = np.roll(arr, -int(origin[ax]) % arr.shape[ax - 3], axis=ax - 3)
    return arr
