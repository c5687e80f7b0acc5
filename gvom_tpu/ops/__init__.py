"""Device compute ops.

Each op has an XLA lax/jnp implementation (portable: CPU test meshes + TPU)
and, where it is hot, a Pallas TPU kernel. Selection goes through
`gvom_tpu.ops.registry`.
"""

from gvom_tpu.ops import binning, grid, maps2d, moments, raycast  # noqa: F401
