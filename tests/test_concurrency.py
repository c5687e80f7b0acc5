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


def test_ingest_completes_while_combine_in_flight(small_cfg):
    """The reference's per-slot semaphores let sensors ingest during a
    combine (gvom.py:163-175, 198-208). The facade must preserve that:
    combine's device work + host sync run outside the state lock.

    Deterministic proof (no timing): combine is held open mid-flight by an
    event that is only released AFTER an ingest completes — if ingest had to
    wait for the combine (the round-1 behavior), this deadlocks and the
    waits below time out."""
    cfg = GvomConfig(
        xy_size=small_cfg.xy_size,
        z_size=small_cfg.z_size,
        max_points=small_cfg.max_points,
        buffer_size=4,
    )
    engine = Gvom(config=cfg, raycast_impl="xla")
    terrain = synthetic.composite_terrain()
    ego = np.array([0.3, -0.2, 1.5])
    pts = synthetic.simulate_lidar_scan(terrain, ego, channels=16, azimuth_steps=48, max_range=20.0)
    assert engine.process_pointcloud(pts, ego) is not None

    orig = engine._combine
    in_combine = threading.Event()
    release = threading.Event()

    def slow_combine(buf, world, ego_j):
        out = orig(buf, world, ego_j)
        in_combine.set()
        assert release.wait(timeout=120), "combine never released"
        return out

    engine._combine = slow_combine
    result = {}
    t = threading.Thread(target=lambda: result.setdefault("out", engine.combine_maps()))
    t.start()
    try:
        assert in_combine.wait(timeout=120), "combine never reached device work"
        # combine is mid-flight and will stay there until release.set() —
        # ingest must still complete
        ego2 = ego + np.array([0.3, 0.15, 0.0])
        pts2 = synthetic.simulate_lidar_scan(
            terrain, ego2, channels=16, azimuth_steps=48, max_range=20.0, seed=1
        )
        ok = engine.process_pointcloud(pts2, ego2)
        assert ok is not None
    finally:
        release.set()
        t.join(timeout=120)
    assert not t.is_alive()
    assert result["out"] is not None


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
