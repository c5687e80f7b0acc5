from gvom_tpu.io.synthetic import (
    Terrain,
    flat_terrain,
    ramp_terrain,
    trench_terrain,
    wall_terrain,
    bumpy_terrain,
    composite_terrain,
    simulate_lidar_scan,
    pad_scan,
    nudge_off_grid,
)

__all__ = [
    "Terrain",
    "flat_terrain",
    "ramp_terrain",
    "trench_terrain",
    "wall_terrain",
    "bumpy_terrain",
    "composite_terrain",
    "simulate_lidar_scan",
    "pad_scan",
    "nudge_off_grid",
]
