"""gvom_tpu — a TPU-native voxel off-road mapping engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the G-VOM
reference system (voxel mapping for off-road ground robots: lidar + odometry in,
2D obstacle/slope/roughness/visibility cost-map layers out; see
/root/reference/README.md:11 for the reference's own description).

Public API:
    GvomConfig      — frozen, hashable configuration (static under jit)
    Gvom            — reference-shaped engine facade (process_pointcloud /
                      combine_maps / debug exporters / occupancy grid)
    pipelines       — jitted pure functions (ingest, fuse, derive) for users who
                      want functional composition instead of the facade
"""

import sys as _sys

from gvom_tpu.config import GvomConfig
from gvom_tpu.engine.gvom import Gvom
from gvom_tpu import models as pipelines

# make `import gvom_tpu.pipelines` work, not just attribute access
_sys.modules[__name__ + ".pipelines"] = pipelines

__version__ = "0.1.0"

__all__ = ["GvomConfig", "Gvom", "pipelines", "__version__"]
