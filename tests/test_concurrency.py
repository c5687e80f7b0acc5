"""BASELINE config #3: multi-sensor async ingest + timer-driven combine.

The reference decouples sensor callbacks from the combine timer with per-slot
semaphores (gvom.py:65-67) and recommends buffer_size > 2× sensor count
(README.md:49). Here the engine's functional state + one host lock must keep
concurrent ingest/combine race-free; this exercises two sensor threads
hammering process_pointcloud while combine_maps runs on a third."""

import threading

import numpy as np
import pytest

from gvom_tpu.config import GvomConfig
from gvom_tpu.engine.gvom import Gvom
from gvom_tpu.io import synthetic


def test_two_sensors_and_timer(small_cfg):
    cfg = GvomConfig(
        xy_size=small_cfg.xy_size,
        z_size=small_cfg.z_size,
        max_points=small_cfg.max_points,
        buffer_size=8,  # README.md:49 — > 2x sensor count
    )
    engine = Gvom(config=cfg, raycast_impl="xla")
    terrain = synthetic.composite_terrain()
    errors = []
    results = []
    n_per_sensor = 4

    def sensor(offset, seed0):
        try:
            ego = np.array([0.3 + offset, -0.2, 1.5])
            for i in range(n_per_sensor):
                ego = ego + np.array([0.3, 0.15, 0.0])
                pts = synthetic.simulate_lidar_scan(
                    terrain, ego, channels=16, azimuth_steps=48, max_range=20.0, seed=seed0 + i
                )
                engine.process_pointcloud(pts, ego)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def combiner():
        try:
            for _ in range(6):
                out = engine.combine_maps()
                if out is not None:
                    results.append(out)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=sensor, args=(0.0, 0)),
        threading.Thread(target=sensor, args=(1.5, 100)),
        threading.Thread(target=combiner),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    # a final combine after all ingests sees every sensor's data
    out = engine.combine_maps()
    assert out is not None
    origin, pos, neg, rough, vis = out
    assert vis.sum() > 0
    assert all(r is not None for r in results)
