"""Depth sampling along rays: stratified coarse samples and inverse-CDF fine
resampling.

Behavioral parity targets (paths relative to /root/reference/):
- coarse linspace/disparity + stratified jitter: src/models/VipNeRF01.py:173-203
- hierarchical sample_pdf (CDF inversion): src/models/VipNeRF01.py:229-262
- fine merge + sort: src/models/VipNeRF01.py:205-216

TPU-first notes: `sample_pdf` avoids lane-axis gathers entirely — the
searchsorted + take_along_axis formulation costs ~35 ms/step on the v5e
(lane-dynamic gathers don't vectorize); instead the interpolation endpoints
are masked max/min reductions over the broadcast compare cube, pure VPU work
(~0.26 ms, bitwise-identical output). Requires ascending `bins` (always true
for depth bins). Shapes are fully static; randomness comes from explicit keys.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def coarse_z_vals(
    near: jnp.ndarray,
    far: jnp.ndarray,
    num_samples: int,
    *,
    lindisp: bool = False,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Coarse depths per ray (reference get_z_vals_coarse :173-203).

    near/far: (num_rays, 1) (or broadcastable). Returns (num_rays, num_samples).
    With perturb, applies stratified jitter in the inter-sample intervals.
    """
    t = jnp.linspace(0.0, 1.0, num_samples, dtype=jnp.float32)
    if not lindisp:
        z = near * (1.0 - t) + far * t
    else:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)

    if perturb:
        assert key is not None, "perturb requires an rng key"
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * t_rand
    return z


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    *,
    det: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling (reference sample_pdf :229-262).

    bins: (num_rays, n_bins), weights: (num_rays, n_bins - 1).
    Returns (num_rays, num_samples). `det=True` uses a linspace of u values
    (eval path); otherwise uniform randoms.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    # cdf: (num_rays, n_bins); note bins has n_bins entries, cdf n_bins too
    # (reference builds cdf over n_bins-1 pdf entries + leading zero).

    if det:
        u = jnp.linspace(0.0, 1.0, num_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))
    else:
        assert key is not None, "stochastic sample_pdf requires an rng key"
        u = jax.random.uniform(key, cdf.shape[:-1] + (num_samples,), dtype=cdf.dtype)

    # Batched right-bisect + interpolation WITHOUT lane-axis gathers.
    # take_along_axis along the last (lane) axis is pathologically slow on
    # TPU (measured ~4.4 ms per gather at 4096x128-from-64 — the original
    # 4-gather formulation cost ~35 ms/step, dominating the non-MLP step
    # time). Because `bins` is ascending and `cdf` nondecreasing, the
    # below/above entries are exactly masked max/min reductions over the
    # (rays, samples, bins) compare cube — pure VPU work (measured 0.26 ms,
    # bitwise identical results):
    #   below = last bin with cdf <= u  -> max over masked entries
    #   above = first bin with cdf >  u -> min over unmasked entries
    big = jnp.asarray(1e10, cdf.dtype)
    mask = cdf[..., None, :] <= u[..., :, None]  # (..., num_samples, n_bins)
    cdf_below = jnp.max(jnp.where(mask, cdf[..., None, :], -big), axis=-1)
    cdf_above = jnp.min(jnp.where(mask, big, cdf[..., None, :]), axis=-1)
    bins_below = jnp.max(jnp.where(mask, bins[..., None, :], -big), axis=-1)
    bins_above = jnp.min(jnp.where(mask, big, bins[..., None, :]), axis=-1)
    # Edge semantics identical to clamped searchsorted indices: u below
    # cdf[0] -> (cdf[0], bins[0]); u at/above cdf[-1] -> (cdf[-1], bins[-1]).
    cdf_below = jnp.where(cdf_below < -big / 2, cdf[..., :1], cdf_below)
    bins_below = jnp.where(bins_below < -big / 2, bins[..., :1], bins_below)
    cdf_above = jnp.where(cdf_above > big / 2, cdf[..., -1:], cdf_above)
    bins_above = jnp.where(bins_above > big / 2, bins[..., -1:], bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def fine_z_vals(
    z_vals_coarse: jnp.ndarray,
    weights_coarse: jnp.ndarray,
    num_samples_fine: int,
    *,
    perturb: bool = False,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Hierarchical fine depths (reference get_z_vals_fine :205-216).

    Samples the PDF over coarse weight midpoints (weights[..., 1:-1], detached
    — stop_gradient here so fine sample locations don't backprop into the
    coarse MLP), merges with coarse z and sorts. Returns
    (num_rays, n_coarse + num_samples_fine).
    """
    z_mid = 0.5 * (z_vals_coarse[..., 1:] + z_vals_coarse[..., :-1])
    w = jax.lax.stop_gradient(weights_coarse[..., 1:-1])
    z_samples = sample_pdf(z_mid, w, num_samples_fine, det=not perturb, key=key)
    z_samples = jax.lax.stop_gradient(z_samples)
    z_all = jnp.concatenate([z_vals_coarse, z_samples], axis=-1)
    return jnp.sort(z_all, axis=-1)
