"""Hypothesis property tests over the host-side ingest/combine schedule
(SURVEY.md §5: the reference's semaphore-guarded ring buffer has a real
unguarded buffer_index race, gvom.py:172-175; the functional design must make
any schedule deterministic and keep the encoding invariants)."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gvom_tpu.config import GvomConfig
from gvom_tpu.engine import Gvom
from gvom_tpu.io import synthetic

_CFG = GvomConfig(xy_size=32, z_size=16, max_points=2048, buffer_size=3)

# a small pool of pre-generated scans (two "sensors" at offset poses)
_SCANS = []
for s in range(2):
    ego = np.array([0.3 + 0.5 * s, -0.2 + 0.3 * s, 1.5])
    for i in range(3):
        ego = ego + np.array([0.4, 0.2, 0.0])
        pts = synthetic.simulate_lidar_scan(
            synthetic.composite_terrain(), ego, channels=8, azimuth_steps=24,
            max_range=10.0, seed=10 * s + i,
        )
        pts = synthetic.nudge_off_grid(pts, _CFG.xy_resolution, _CFG.z_resolution)
        _SCANS.append((pts, ego.copy()))

# op > len(_SCANS)-1 would index out; -1 encodes combine_maps
_ops = st.lists(
    st.integers(min_value=-1, max_value=len(_SCANS) - 1), min_size=2, max_size=8
)


def _run(schedule):
    g = Gvom(config=_CFG)
    outs = []
    n_ingested = 0
    for op in schedule:
        if op < 0:
            outs.append(g.combine_maps())
        else:
            pts, ego = _SCANS[op]
            g.process_pointcloud(pts, ego)
            n_ingested += 1
    return g, outs, n_ingested


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_ops)
def test_schedule_determinism_and_invariants(schedule):
    g1, outs1, n1 = _run(schedule)
    g2, outs2, n2 = _run(schedule)
    assert n1 == n2
    for o1, o2 in zip(outs1, outs2):
        if o1 is None or o2 is None:
            assert o1 is None and o2 is None  # combine before any ingest
            continue
        for a, b in zip(o1, o2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # encoding invariants on the fused world (gvom.py:1152-1159 partition):
    # occupied voxels carry zero negative evidence; all counters non-negative
    w = g1.world_state
    hit = np.asarray(w.grid.hit)
    ev = np.asarray(w.evidence)
    miss = np.asarray(w.grid.miss)
    assert (hit >= 0).all() and (miss >= 0).all() and (ev >= 0).all()
    if bool(w.valid):
        assert (ev[hit > 0] == 0).all()
    mh = np.asarray(w.grid.min_height)
    assert (mh[hit > 0] < 1.0 + 1e-6).all()  # observed voxels got a real min
    assert (mh[hit == 0] == 1.0).all()       # init sentinel elsewhere
