"""ViP-NeRF TPU: a TPU-native JAX/XLA/Pallas framework with the capabilities of
NagabhushanSN95/ViP-NeRF (SIGGRAPH 2023).

This is a ground-up redesign for TPU hardware, not a port:

- All compute-path math lives in :mod:`vipnerf_tpu.core` as pure, statically
  shaped jnp functions that XLA fuses onto the MXU/VPU.
- The model (:mod:`vipnerf_tpu.models`) is a parameter-pytree + functional
  apply; matmuls run in bfloat16 on the MXU with float32 accumulation.
- Training (:mod:`vipnerf_tpu.train`) is a single jitted step scanned in
  device-resident chunks (`lax.scan`) with on-device ray-index streams, so the
  host never syncs inside the hot loop (the reference chunks rays 4096 at a
  time in a Python loop; see /root/reference/src/models/VipNeRF01.py:47-72).
- Multi-chip scaling (:mod:`vipnerf_tpu.parallel`) shards the ray axis over a
  `jax.sharding.Mesh`; parameters are replicated (the MLP is ~1.2M params) and
  gradients reduce over ICI via XLA-inserted psums.
- Hot ops are XLA-first; Pallas alternatives live in experiments/ with
  the measurements that retired them (the XLA path is HBM-roofline-bound
  and the fused kernels measured slower).

Reference parity citations in docstrings use paths relative to
/root/reference/.
"""

__version__ = "0.1.0"
