"""Device mesh construction + multi-host runtime initialization.

The reference scales by calling process_pointcloud from more host threads on
one GPU (README.md:49). The TPU-native scale-out axes (SURVEY.md §2.3):

  data  — scan-level parallelism: thousands of (scan, ego) pairs per step,
          per-voxel accumulators are associative ⇒ psum/reduce_scatter
  space — spatial grid sharding (y-axis slabs) with bounded-stencil halos

Collectives ride ICI inside a host and DCN across hosts; jax.distributed
handles the multi-host runtime.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "init_distributed", "factor_devices"]

DATA_AXIS = "data"
SPACE_AXIS = "space"


def factor_devices(n: int, space: Optional[int] = None) -> Tuple[int, int]:
    """Split n devices into (data, space). Space defaults to the largest
    power-of-two divisor ≤ sqrt(n) so halo surface stays small."""
    if space is None:
        space = 1
        while space * 2 <= int(math.sqrt(n)) and n % (space * 2) == 0:
            space *= 2
    if n % space != 0:
        raise ValueError(f"{n} devices not divisible by space={space}")
    return n // space, space


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, space: Optional[int] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    data, space_n = factor_devices(n, space)
    arr = np.asarray(devices).reshape(data, space_n)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None, process_id: Optional[int] = None):
    """Multi-host bring-up (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
