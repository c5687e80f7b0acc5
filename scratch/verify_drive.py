"""Drive the library surface end-to-end on the real TPU (verify recipe).

Constructs the reference-shaped facade, feeds synthetic scans with a moving
ego (re-origin + decay veto exercised), combines, checks the five outputs,
the occupancy export, the three debug exporters, and the degenerate paths.
Exits nonzero on any failed check.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __import__('os').path.join(__import__('os').path.dirname(__file__), '..'))

import jax

from gvom_tpu.config import GvomConfig
from gvom_tpu.engine import Gvom
from gvom_tpu.io import synthetic


def main():
    dev = jax.devices()[0]
    print(f"[verify] device: {dev}", file=sys.stderr)
    cfg = GvomConfig(xy_size=128, z_size=32, max_points=32768, buffer_size=3)
    eng = Gvom(config=cfg)
    terrain = synthetic.composite_terrain()
    ego = np.array([0.5, 0.0, 1.6])

    t0 = time.time()
    for i in range(4):
        ego = ego + np.array([0.6, 0.3, 0.0])
        pts = synthetic.simulate_lidar_scan(
            terrain, ego, channels=64, azimuth_steps=512, max_range=40.0, seed=i
        )
        ok = eng.process_pointcloud(pts, ego)
        assert ok is not None, f"scan {i} dropped"
    out = eng.combine_maps()
    assert out is not None, "combine returned nothing"
    origin_world, pos, neg, rough, vis = out       # the reference 5-tuple
    X = cfg.xy_size
    assert len(origin_world) >= 2
    for name, m in [("pos", pos), ("neg", neg), ("rough", rough), ("vis", vis)]:
        m = np.asarray(m)
        assert m.shape == (X, X), f"{name} shape {m.shape}"
        assert np.isfinite(m[m > -1000.0]).all(), f"{name} non-finite"
    assert np.asarray(vis).sum() > 100, "visibility map nearly empty"
    occ = eng.get_map_as_occupancy_grid()
    assert np.asarray(occ).shape == (X, X, cfg.z_size)
    assert np.asarray(occ).sum() > 0, "no occupied voxels"
    for exporter in (eng.make_debug_voxel_map, eng.make_debug_height_map,
                     eng.make_debug_inferred_height_map):
        c = exporter()
        assert c is not None and len(c) > 0, f"{exporter.__name__} empty"
    print(f"[verify] main flow ok ({time.time()-t0:.1f}s incl compile)", file=sys.stderr)

    # degenerate paths
    empty = eng.process_pointcloud(np.zeros((0, 3), np.float32), ego)
    assert empty is None, "empty cloud must be dropped"
    # min_distance is WORLD-frame (reference quirk, binning.prepare_points):
    # points within min_distance of the world origin are discarded. The
    # facade stays async — it returns the device-side scan_ok flag (no host
    # sync per scan); an all-filtered cloud must flag False (not buffered).
    near = np.tile(np.array([0.05, 0.02, 0.01]), (16, 1)).astype(np.float32)
    below = eng.process_pointcloud(near, ego)
    assert below is not None and not bool(below), \
        "all-below-min-distance cloud must flag scan_ok=False"
    fresh = Gvom(config=cfg)
    assert fresh.combine_maps() is None, "combine before ingest must be None"
    # transform argument path
    tr = np.eye(4, dtype=np.float32)
    tr[:3, 3] = [0.2, -0.1, 0.0]
    pts = synthetic.simulate_lidar_scan(terrain, ego, channels=32,
                                        azimuth_steps=256, max_range=30.0, seed=9)
    ok = eng.process_pointcloud(pts, ego, transform=tr)
    assert ok is not None, "transformed scan dropped"
    out2 = eng.combine_maps()
    assert out2 is not None
    print("[verify] degenerate paths ok", file=sys.stderr)
    print("VERIFY_OK")


if __name__ == "__main__":
    main()
