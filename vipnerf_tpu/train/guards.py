"""Divergence guard: reject optimizer steps whose loss spikes far above the
running average.

Why this exists (BASELINE.md "sigma-noise interaction"): divergence events
during long training are usually loss SPIKES — a bad batch/noise draw whose
update destroys a converged model. Rejecting updates on excursion steps
(loss > factor x EMA) keeps the model in the healthy basin while changing
nothing about in-distribution steps.

Measured limits (be honest about what this can catch): the dead-sigma
attractor of the published ViP-NeRF loss stack on the synthetic scene is
entered via a ~700-step GRADUAL creep (TotalLoss 0.004 -> 0.02 -> 0.09 ->
3.2 with every step only slightly above trailing EMA) in which the weighted
objective genuinely descends (the visibility term keeps improving while
photometric terms degrade) — a ratio-to-trailing-EMA guard tracks the creep
and does not fire. Neither does gradient clipping (ordinary-magnitude
gradients). For that failure mode, use raw_noise_std 0 on synthetic scenes
(the sigma-noise smoothing of the visibility-loss target is the erosion
driver; see BASELINE.md).

This is a framework addition in the SURVEY.md §5 "failure detection"
category; the reference has no equivalent and the guard is OFF by default
(exact reference dynamics). Enable with:

    configs['optimizer']['loss_guard'] = {}            # defaults, or
    configs['optimizer']['loss_guard'] = {
        'factor': 10.0,              # reject when loss > factor * EMA
        'ema_decay': 0.99,           # EMA horizon ~100 steps
        'warmup': 100,               # always accept the first N steps
        'max_consecutive_skips': 100 # fail-open: never freeze training
    }

Implemented as an optax wrapper so every train-step variant (sequential,
scanned, vmapped multi-scene, sharded) gets it for free; the loss reaches
the transformation through optax's extra-args protocol.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LossGuardState(NamedTuple):
    inner: Any
    ema: jnp.ndarray  # running loss average (f32 scalar)
    count: jnp.ndarray  # total steps seen (int32)
    skips: jnp.ndarray  # consecutive rejected steps (int32)


def loss_guard(
    inner: optax.GradientTransformation,
    *,
    factor: float = 10.0,
    ema_decay: float = 0.99,
    warmup: int = 100,
    max_consecutive_skips: int = 100,
) -> optax.GradientTransformationExtraArgs:
    """Wrap `inner` so updates are zeroed (and inner state held) on steps
    whose `loss` exceeds factor * EMA(loss). Pass the loss at update time:
    ``tx.update(grads, state, params, loss=total_loss)``."""
    inner = optax.with_extra_args_support(inner)

    def init(params):
        return LossGuardState(
            inner=inner.init(params),
            ema=jnp.zeros((), jnp.float32),
            count=jnp.zeros((), jnp.int32),
            skips=jnp.zeros((), jnp.int32),
        )

    def update(updates, state, params=None, *, loss, **extra):
        loss = jnp.asarray(loss, jnp.float32)
        new_updates, new_inner = inner.update(
            updates, state.inner, params, loss=loss, **extra
        )
        in_warmup = state.count < warmup
        force_accept = state.skips >= max_consecutive_skips
        # The very first step always seeds the EMA (even with warmup=0):
        # otherwise accept = loss <= factor*0 rejects every step until the
        # fail-open fires, starting training in a reject/force-accept cycle.
        first_step = state.count == 0
        accept = (
            first_step | in_warmup | force_accept
            | (loss <= factor * state.ema)
        )

        def select(a, b):
            return jax.tree_util.tree_map(
                lambda x, y: jnp.where(accept, x, y), a, b
            )

        zero_updates = jax.tree_util.tree_map(jnp.zeros_like, new_updates)
        out_updates = select(new_updates, zero_updates)
        out_inner = select(new_inner, state.inner)

        ema_next = ema_decay * state.ema + (1.0 - ema_decay) * loss
        ema_next = jnp.where(state.count == 0, loss, ema_next)
        # EMA tracks ACCEPTED steps only, so an excursion cannot drag the
        # reference level up and mask a slow runaway.
        new_ema = jnp.where(accept, ema_next, state.ema)
        new_skips = jnp.where(accept, 0, state.skips + 1).astype(jnp.int32)
        return out_updates, LossGuardState(
            inner=out_inner,
            ema=new_ema,
            count=state.count + 1,
            skips=new_skips,
        )

    return optax.GradientTransformationExtraArgs(init, update)
