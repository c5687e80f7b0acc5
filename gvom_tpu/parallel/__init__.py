from gvom_tpu.parallel.mesh import make_mesh, init_distributed
from gvom_tpu.parallel.sharding import batched_step, world_pspecs

__all__ = ["make_mesh", "init_distributed", "batched_step", "world_pspecs"]
