"""Pure, statically-shaped math for the ViP-NeRF pipeline.

encoding/rays/rendering/sampling are jnp functions with no I/O, no
Python-level data-dependent control flow, and explicit RNG keys — the
building blocks the jitted train/render steps compose. poses is host-side
numpy (per-scene setup, runs once; not jit-traceable).
"""

from vipnerf_tpu.core import encoding, poses, rays, rendering, sampling  # noqa: F401
