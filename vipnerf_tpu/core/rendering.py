"""Differentiable volume rendering (alpha compositing).

Behavioral parity target: src/models/VipNeRF01.py:331-384 `volume_rendering`
(paths relative to /root/reference/), including all epsilons:
- delta tail: 1e10 (metric) / 1.0 (NDC) (:333-342)
- alpha = 1 - exp(-sigma * delta) (:347)
- transmittance = cumprod([1, 1-alpha+1e-10]) (:348) — the reference names
  this "visibility"
- expected depth normalized by (acc + 1e-6) (:354) and depth variance (:355)
- NDC depth additionally converted to metric with near=1 (:359, 396)
- white background compositing (:363-364)
- per-pixel secondary-view visibility: weighted mean of per-point visibility2
  normalized by acc (:380-383).

TPU-first notes: the cumulative product over samples uses
`jax.lax.associative_scan` (log-depth scan that XLA maps well to the VPU)
rather than a sequential loop. Everything fuses into one kernel alongside the
MLP epilogue under jit.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from vipnerf_tpu.core.rays import depth_from_ndc


def exclusive_cumprod(x: jnp.ndarray) -> jnp.ndarray:
    """cumprod([1, x_0, ..., x_{n-2}]) along the last axis.

    Equals reference torch.cumprod(cat([ones, x], -1), -1)[:, :-1] (:348).
    """
    inclusive = jax.lax.associative_scan(jnp.multiply, x, axis=-1)
    return jnp.concatenate(
        [jnp.ones_like(x[..., :1]), inclusive[..., :-1]], axis=-1
    )


def volume_rendering(
    rgb: jnp.ndarray,
    sigma: jnp.ndarray,
    *,
    z_vals: Optional[jnp.ndarray] = None,
    rays_d: Optional[jnp.ndarray] = None,
    z_vals_ndc: Optional[jnp.ndarray] = None,
    rays_d_ndc: Optional[jnp.ndarray] = None,
    rays_o: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
    ndc: bool = False,
    visibility2: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Composite per-sample (rgb, sigma) into per-ray maps.

    rgb: (nr, ns, 3); sigma: (nr, ns). In NDC mode pass z_vals_ndc +
    rays_d_ndc + the *metric* rays_o/rays_d (used for the NDC->metric depth
    conversion); otherwise pass z_vals + rays_d.

    Returns the reference output contract: rgb, acc, alpha, visibility
    (transmittance), weights, depth, depth_var [, depth_ndc, depth_var_ndc]
    [, visibility2].
    """
    if not ndc:
        assert z_vals is not None and rays_d is not None
        z_for_delta = z_vals
        d_for_delta = rays_d
        tail = 1e10
    else:
        assert z_vals_ndc is not None and rays_d_ndc is not None
        assert rays_o is not None and rays_d is not None
        z_for_delta = z_vals_ndc
        d_for_delta = rays_d_ndc
        tail = 1.0

    z1 = jnp.concatenate(
        [z_for_delta, jnp.full_like(z_for_delta[..., :1], tail)], axis=-1
    )
    z_dists = z1[..., 1:] - z1[..., :-1]  # (nr, ns)
    delta = z_dists * jnp.linalg.norm(d_for_delta, axis=-1, keepdims=True)

    alpha = 1.0 - jnp.exp(-sigma * delta)  # (nr, ns)
    transmittance = exclusive_cumprod(1.0 - alpha + 1e-10)
    weights = alpha * transmittance
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)  # (nr, 3)
    acc_map = jnp.sum(weights, axis=-1)

    out: Dict[str, jnp.ndarray] = {}
    if not ndc:
        depth_map = jnp.sum(weights * z_vals, axis=-1) / (acc_map + 1e-6)
        depth_var_map = jnp.sum(
            weights * jnp.square(z_vals - depth_map[..., None]), axis=-1
        )
    else:
        depth_map_ndc = jnp.sum(weights * z_vals_ndc, axis=-1) / (acc_map + 1e-6)
        depth_var_map_ndc = jnp.sum(
            weights * jnp.square(z_vals_ndc - depth_map_ndc[..., None]), axis=-1
        )
        z_metric = depth_from_ndc(z_vals_ndc, rays_o, rays_d)
        depth_map = jnp.sum(weights * z_metric, axis=-1) / (acc_map + 1e-6)
        depth_var_map = jnp.sum(
            weights * jnp.square(z_metric - depth_map[..., None]), axis=-1
        )
        out["depth_ndc"] = depth_map_ndc
        out["depth_var_ndc"] = depth_var_map_ndc

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    out.update(
        rgb=rgb_map,
        acc=acc_map,
        alpha=alpha,
        visibility=transmittance,
        weights=weights,
        depth=depth_map,
        depth_var=depth_var_map,
    )

    if visibility2 is not None:
        # visibility2: (nr, ns, nf-1, 1) per-point; -> per-pixel (nr, nf-1)
        vis2_pixel = jnp.sum(
            weights[..., None] * visibility2[..., 0], axis=-2
        ) / (acc_map[..., None] + 1e-6)
        out["visibility2"] = vis2_pixel
    return out
