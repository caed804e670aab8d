"""The jitted train step and the scanned multi-step chunk.

This is the TPU-native replacement for the reference training inner loop
(src/Trainer01.py:61-107 `train_one_iter`, paths relative to /root/reference/):
one iteration = gather batch -> render -> losses -> backward -> Adam step.
Differences by design:

- The whole iteration is ONE traced computation (gather included), and K
  iterations run inside a single `lax.scan` ("step batching"), so the host
  dispatches once per K steps instead of ~8 times per step — eliminating
  per-step Python/dispatch overhead entirely (on the current axon backend
  the host-dispatched variant below is used instead; see its docstring).
- Gradient accumulation (reference sub_batch_size, :82-102): the batch is
  split into equal sub-batches whose grads are summed inside the step (the
  reference accumulates via repeated backward()) — no host involvement.
- The LR schedule is an optax schedule inside the optimizer (reference mutates
  param_groups per iteration, :293-295).
- Multi-chip: batch index arrays are sharded over the ray axis of the mesh;
  parameters are replicated; XLA inserts the grad psum over ICI.
"""

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from vipnerf_tpu.losses.computer import LossComputer
from vipnerf_tpu.train.lr_schedules import get_lr_schedule


def make_optimizer(configs: Dict[str, Any]) -> optax.GradientTransformation:
    """Adam with the configured schedule (reference Trainer01.py:519-521).

    Optional `optimizer.grad_clip_norm`: global-norm gradient clipping ahead
    of Adam. The reference has no clipping (default None = exact parity);
    it guards against the sparse-depth runaway documented in BASELINE.md
    (depth/(acc+1e-6) excursions can destroy a converged model in ~30 steps).
    """
    opt_cfg = configs["optimizer"]
    schedule = get_lr_schedule(configs)
    adam = optax.adam(
        learning_rate=schedule,
        b1=opt_cfg.get("beta1", 0.9),
        b2=opt_cfg.get("beta2", 0.999),
    )
    clip = opt_cfg.get("grad_clip_norm")
    tx = (
        optax.chain(optax.clip_by_global_norm(float(clip)), adam)
        if clip
        else adam
    )
    guard_cfg = opt_cfg.get("loss_guard")
    if guard_cfg is not None:
        from vipnerf_tpu.train.guards import loss_guard

        tx = loss_guard(tx, **guard_cfg)
    # Uniform extra-args interface: train_step always passes loss=...
    return optax.with_extra_args_support(tx)


def make_train_step(
    configs: Dict[str, Any],
    render_fn: Callable,
    loss_computer: LossComputer,
    tx: optax.GradientTransformation,
) -> Callable:
    """Build train_step(params, opt_state, batch, rng) -> (params, opt_state,
    loss_scalars)."""
    sub_batch_size = configs.get("sub_batch_size")

    def loss_fn(params, batch, rng):
        outputs = render_fn(params, configs, batch, train=True, rng=rng)
        losses = loss_computer.compute_losses(batch, outputs)
        scalars = {
            k: (v["loss_value"] if isinstance(v, dict) else v)
            for k, v in losses.items()
        }
        return losses["TotalLoss"], scalars

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(params, opt_state, batch, rng):
        if sub_batch_size is None:
            (_, scalars), grads = grad_fn(params, batch, rng)
        else:
            # Gradient accumulation: sum grads over equal sub-batches
            # (reference repeatedly calls backward before one step, :84-102).
            nr = batch["rays_o"].shape[0]
            assert nr % sub_batch_size == 0, (
                "sub_batch_size must divide the batch for a static scan"
            )
            n_sub = nr // sub_batch_size

            sliced_keys = [
                k
                for k, v in batch.items()
                if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == nr
            ]

            def sub_batch(i):
                out = dict(batch)
                for k in sliced_keys:
                    out[k] = jax.lax.dynamic_slice_in_dim(
                        batch[k], i * sub_batch_size, sub_batch_size, axis=0
                    )
                return out

            def body(carry, i):
                acc_grads = carry
                (_, scalars_i), grads_i = grad_fn(
                    params, sub_batch(i), jax.random.fold_in(rng, i)
                )
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads_i)
                return acc_grads, scalars_i

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
            grads, scalars_all = jax.lax.scan(
                body, zero_grads, jnp.arange(n_sub)
            )
            scalars = jax.tree_util.tree_map(jnp.sum, scalars_all)

        updates, opt_state = tx.update(
            grads, opt_state, params, loss=scalars["TotalLoss"]
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, scalars

    return train_step


def make_scan_train(
    configs: Dict[str, Any],
    gather_batch: Callable,
    train_step: Callable,
    *,
    with_sd: bool = True,
    donate: bool = True,
) -> Callable:
    """Build the scanned multi-step update.

    scan_train(params, opt_state, base_key, start_iter,
               nerf_indices (K, nr)[, sd_indices (K, nr_sd)])
      -> (params, opt_state, loss_scalars stacked over K)

    `gather_batch` is the preprocessor's pure device gather; index blocks come
    from the host once per chunk (vipnerf_tpu.data.preprocessor.get_index_chunk).
    `with_sd=False` drops the sparse-depth index stream (the call then takes
    5 positional args); RNG folding and iteration numbering are identical in
    both modes.
    """

    def scan_train(params, opt_state, base_key, start_iter, nerf_idx, sd_idx=None):
        k_steps = nerf_idx.shape[0]
        step_ids = jnp.arange(k_steps)

        def body(carry, xs):
            params, opt_state = carry
            if with_sd:
                step_i, nerf_i, sd_i = xs
            else:
                step_i, nerf_i = xs
                sd_i = None
            iter_num = start_iter + step_i
            batch = gather_batch(nerf_i, sd_i, iter_num)
            rng = jax.random.fold_in(base_key, iter_num)
            params, opt_state, scalars = train_step(
                params, opt_state, batch, rng
            )
            return (params, opt_state), scalars

        xs = (step_ids, nerf_idx, sd_idx) if with_sd else (step_ids, nerf_idx)
        (params, opt_state), scalars = jax.lax.scan(
            body, (params, opt_state), xs
        )
        return params, opt_state, scalars

    return jax.jit(scan_train, donate_argnums=(0, 1) if donate else ())


def make_host_loop_train(
    configs: Dict[str, Any],
    gather_batch: Callable,
    train_step: Callable,
    *,
    with_sd: bool,
    donate: bool = True,
) -> Callable:
    """Host-dispatched variant of make_scan_train with the same signature.

    Two small jitted programs per iteration — batch gather, then the train
    step — dispatched from host. Used on the axon TPU backend, whose AOT
    compiler (a) is pathologically slow compiling `lax.scan` over the full
    train step and (b) fails register allocation (Mosaic RET_CHECK in
    live_range_finder) when the multi-million-row cache gather is fused into
    the train-step program. At full model size (~100ms/step) the extra ~1ms
    of host dispatch is noise. Semantics (RNG folding, iter numbering,
    per-step scalar stack) match the scanned version exactly.
    """

    @jax.jit
    def jit_gather_sd(nerf_i, sd_i, iter_num):
        return gather_batch(nerf_i, sd_i, iter_num)

    @jax.jit
    def jit_gather_nosd(nerf_i, iter_num):
        return gather_batch(nerf_i, None, iter_num)

    def step_fn(params, opt_state, batch, iter_num, base_key):
        rng = jax.random.fold_in(base_key, iter_num)
        return train_step(params, opt_state, batch, rng)

    donate_args = (0, 1) if donate else ()
    jit_step = jax.jit(step_fn, donate_argnums=donate_args)

    def run(params, opt_state, base_key, start_iter, nerf_idx, sd_idx=None):
        scalars_steps = []
        for i in range(nerf_idx.shape[0]):
            iter_num = start_iter + i
            if with_sd:
                batch = jit_gather_sd(nerf_idx[i], sd_idx[i], iter_num)
            else:
                batch = jit_gather_nosd(nerf_idx[i], iter_num)
            params, opt_state, scalars = jit_step(
                params, opt_state, batch, iter_num, base_key
            )
            scalars_steps.append(scalars)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *scalars_steps
        )
        return params, opt_state, stacked

    return run


def default_step_dispatch() -> str:
    """'scan' everywhere: one host dispatch per K-step chunk.

    On the remote-tunnel TPU backend each host dispatch costs milliseconds,
    so the host-loop variant (2 dispatches/step) measures up to ~30 ms/step
    slower than the scanned chunk. The backend's earlier pathological
    compile times for scanned train steps no longer reproduce (~2 min with
    the persistent compile cache); 'host' remains available via
    configs['step_dispatch'] as a fallback."""
    return "scan"


def make_scan_train_nosd(
    configs: Dict[str, Any],
    gather_batch: Callable,
    train_step: Callable,
    *,
    donate: bool = True,
) -> Callable:
    """Alias for make_scan_train(with_sd=False)."""
    return make_scan_train(
        configs, gather_batch, train_step, with_sd=False, donate=donate
    )
