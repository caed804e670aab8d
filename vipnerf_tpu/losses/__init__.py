"""Loss functions for ViP-NeRF training, as pure jnp functions.

Each loss is a function `(configs, loss_configs) -> compute(batch, outputs,
return_loss_maps)` returning `{'loss_value': scalar[, 'loss_maps': {...}]}` or
None when inapplicable (mirroring the reference's per-loss classes under
src/loss_functions/). Boolean-mask selections become where/sum reductions so
shapes stay static under jit.
"""

from vipnerf_tpu.losses.computer import LossComputer  # noqa: F401
