"""Learning-rate schedules.

Parity targets (paths relative to /root/reference/):
- NeRFLearningRateDecayer01 (src/lr_decayers/NeRFLearningRateDecayer01.py:17-26):
  lr = lr_initial * 0.1^(iter / (lr_decay * 1000))
- MipNeRFLearningRateDecayer01 (src/lr_decayers/MipNeRFLearningRateDecayer01.py:18-35):
  log-lerp init->final with reverse-cosine warmup.

Expressed as optax-style schedules (step -> lr) so they live inside the jitted
train step (the reference mutates optimizer.param_groups per iteration on
host, src/Trainer01.py:293-295).
"""

from typing import Any, Callable, Dict

import jax.numpy as jnp


def nerf_lr_decayer(optimizer_configs: Dict[str, Any]) -> Callable:
    lr_init = optimizer_configs["lr_initial"]
    lr_decay = optimizer_configs["lr_decay"]

    def schedule(step):
        return lr_init * (0.1 ** (step / (lr_decay * 1000.0)))

    return schedule


def mip_nerf_lr_decayer(optimizer_configs: Dict[str, Any]) -> Callable:
    """Log-linear init->final with optional reverse-cosine warmup."""
    lr_init = optimizer_configs["lr_initial"]
    lr_final = optimizer_configs["lr_final"]
    max_steps = optimizer_configs["num_iterations"]
    # The reference names these lr_decay_steps/lr_decay_mult
    # (MipNeRFLearningRateDecayer01.py:21-22); the original mipnerf repo
    # calls them lr_delay_*. Accept both, reference name first.
    lr_delay_steps = optimizer_configs.get(
        "lr_decay_steps", optimizer_configs.get("lr_delay_steps", 0)
    )
    lr_delay_mult = optimizer_configs.get(
        "lr_decay_mult", optimizer_configs.get("lr_delay_mult", 1.0)
    )

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(
            jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t
        )
        return delay_rate * log_lerp

    return schedule


_REGISTRY = {
    "NeRFLearningRateDecayer01": nerf_lr_decayer,
    "MipNeRFLearningRateDecayer01": mip_nerf_lr_decayer,
}


def get_lr_schedule(configs: Dict[str, Any]) -> Callable:
    """Factory (reference LearningRateDecayerFactory.py:13-24)."""
    name = configs["optimizer"]["lr_decayer_name"]
    if name not in _REGISTRY:
        raise RuntimeError(f"Unknown lr decayer: {name}; known: {sorted(_REGISTRY)}")
    opt = dict(configs["optimizer"])
    # the MipNeRF decayer needs the run length, which lives at the top level
    # of a reference-style config (MipNeRFLearningRateDecayer01.py:20)
    opt.setdefault("num_iterations", configs.get("num_iterations"))
    return _REGISTRY[name](opt)
