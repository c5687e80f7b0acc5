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


from gvom_tpu.utils.parity import singular_fit_mask  # noqa: F401  (re-export)


def canonical(arr, origin):
    """Torus -> window-relative layout for the trailing 3 grid axes."""
    arr = np.asarray(arr)
    for ax in range(3):
        arr = np.roll(arr, -int(origin[ax]) % arr.shape[ax - 3], axis=ax - 3)
    return arr
