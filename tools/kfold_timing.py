"""DCE-proof K-fold in-jit timing for the tunneled axon TPU backend.

On this backend `block_until_ready` on remote arrays can return without
syncing and a device_get round trip costs ~25-30 ms flat, so host-side
wall-clock around a single dispatch is untrustworthy. The only reliable
protocol (established round 2, recorded in BASELINE.md):

  1. run the computation K times inside ONE jit via lax.fori_loop,
  2. thread a scalar data dependency through every iteration so XLA cannot
     parallelize or dead-code-eliminate any of them,
  3. consume EVERY output (a global norm over the whole result pytree —
     partial consumption silently drops most of the backward),
  4. fetch the final scalar (device_get forces a real sync),
  5. report (t[K=a] - t[K=b]) / (a - b) to cancel dispatch+fetch overhead.
"""

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _global_norm(tree) -> jnp.ndarray:
    leaves = [
        x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "astype")
    ]
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    )


def kfold_time(
    fn: Callable,
    args: tuple,
    *,
    k_lo: int = 1,
    k_hi: int = 5,
    repeats: int = 3,
) -> dict:
    """Time one evaluation of `fn(*args)` (seconds).

    `fn` must be a pure function returning any pytree. The perturbation
    scalar is threaded through the FIRST array leaf of args (x * (1 + eps*s)
    with eps=0, which XLA cannot constant-fold away because s is a traced
    carry).
    """

    def make_run(k):
        def run(args):
            def body(_, carry):
                s, args = carry
                leaves, treedef = jax.tree_util.tree_flatten(args)
                # data dependency: scale the first leaf by (1 + eps*s).
                # eps must be NONZERO: with 0*s XLA constant-folds the
                # perturbation and loop-invariant code motion hoists the
                # whole computation out of the fori_loop (observed: a 68
                # GFLOP matmul "measured" at 930 TFLOPS). 1e-30*s underflows
                # numerically (s ~ O(1..1e6), eps*s << f32 ulp of 1.0) so
                # results are bitwise unchanged, but XLA cannot prove it.
                eps = jnp.float32(1e-30)
                # perturb the first FLOAT array leaf (skip ints/python scalars)
                idx = next(
                    (
                        i
                        for i, leaf in enumerate(leaves)
                        if hasattr(leaf, "dtype")
                        and jnp.issubdtype(leaf.dtype, jnp.floating)
                    ),
                    None,
                )
                leaves = list(leaves)
                if idx is not None:
                    leaves[idx] = leaves[idx] * (1.0 + eps * s).astype(
                        leaves[idx].dtype
                    )
                else:
                    # int-only args: add min(int(s), 0) == 0 at runtime (s is
                    # a norm, >= 0) but not provably zero to the compiler.
                    idx = next(
                        i for i, leaf in enumerate(leaves)
                        if hasattr(leaf, "dtype")
                    )
                    leaves[idx] = leaves[idx] + jnp.minimum(
                        s.astype(leaves[idx].dtype), 0
                    )
                out = fn(*jax.tree_util.tree_unflatten(treedef, leaves))
                return (s + _global_norm(out), args)

            s, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), args))
            return s

        return jax.jit(run)

    run_lo, run_hi = make_run(k_lo), make_run(k_hi)
    # compile + warm both
    float(jax.device_get(run_lo(args)))
    float(jax.device_get(run_hi(args)))

    t_lo, t_hi = [], []
    for _ in range(repeats):
        t0 = time.time()
        v = run_lo(args)
        float(jax.device_get(v))
        t_lo.append(time.time() - t0)
        t0 = time.time()
        v = run_hi(args)
        float(jax.device_get(v))
        t_hi.append(time.time() - t0)
    per_iter = (min(t_hi) - min(t_lo)) / (k_hi - k_lo)
    return {
        "seconds": per_iter,
        "t_lo": min(t_lo),
        "t_hi": min(t_hi),
        "k": (k_lo, k_hi),
    }
