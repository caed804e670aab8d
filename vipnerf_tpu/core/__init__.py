"""Pure, statically-shaped math for the ViP-NeRF pipeline.

Everything here is a jnp function with no I/O, no Python-level data-dependent
control flow, and explicit RNG keys — the building blocks that the jitted
train/render steps compose.
"""

from vipnerf_tpu.core import encoding, poses, rays, rendering, sampling  # noqa: F401
