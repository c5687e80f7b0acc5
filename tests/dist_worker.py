"""Worker for the 2-process jax.distributed test (not collected by pytest).

Each process owns 4 virtual CPU devices; the global 8-device (data, space)
mesh spans both processes, so the batched step's psum / psum_scatter /
all_gather collectives actually cross the process boundary (Gloo), exercising
the multi-host path of parallel/sharding.py (SURVEY.md §2.3 item 4).

Usage: python dist_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (os.path.dirname(_HERE), _HERE):  # repo root (gvom_tpu pkg) + tests/ (helpers)
    if _p not in sys.path:
        sys.path.insert(0, _p)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]

from gvom_tpu.parallel.mesh import init_distributed  # noqa: E402

init_distributed(coordinator=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from gvom_tpu.config import GvomConfig  # noqa: E402
from gvom_tpu.parallel.mesh import make_mesh, DATA_AXIS, SPACE_AXIS  # noqa: E402
from gvom_tpu.parallel.sharding import make_batched_step, world_pspecs  # noqa: E402
from gvom_tpu.types import empty_world_state  # noqa: E402
from helpers import dist_scan_batch  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc

cfg = GvomConfig(xy_size=32, z_size=16, max_points=1024, buffer_size=2)
scans_np, masks_np, egos_np = dist_scan_batch(cfg, 8)

mesh = make_mesh(jax.devices())


def to_global(np_arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(np_arr.shape, sh, lambda idx: np_arr[idx])


batch_spec = P((DATA_AXIS, SPACE_AXIS))
scans = to_global(scans_np, P((DATA_AXIS, SPACE_AXIS), None, None))
masks = to_global(masks_np, P((DATA_AXIS, SPACE_AXIS), None))
egos = to_global(egos_np, P((DATA_AXIS, SPACE_AXIS), None))

step = make_batched_step(cfg, mesh, raycast_impl="xla")
world = jax.device_put(empty_world_state(cfg), jax.tree_util.tree_map(
    lambda spec: NamedSharding(mesh, spec), world_pspecs(),
    is_leaf=lambda x: isinstance(x, P)))

world, p1 = step(world, scans, masks, egos)
world, p2 = step(world, scans, masks, egos)  # second step: revive/decay vs world

hit_sum = int(jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(world.grid.hit))

if pid == 0:
    np.savez(
        out_path,
        visibility=np.asarray(p2.visibility),
        positive=np.asarray(p2.positive_obstacle),
        negative=np.asarray(p2.negative_obstacle),
        height=np.asarray(p2.height),
        roughness=np.asarray(p2.roughness),
        hit_sum=np.int64(hit_sum),
    )
print(f"worker {pid}: ok hit_sum={hit_sum}", flush=True)
