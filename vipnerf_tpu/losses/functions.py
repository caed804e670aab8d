"""The five ViP-NeRF losses as statically-shaped jnp functions.

Parity targets (paths relative to /root/reference/):
- MSE01 (src/loss_functions/MSE01.py:26-66): per-ray channel-mean squared rgb
  error on nerf-stream rays, per coarse & fine.
- VisibilityLoss01 (:27-74): symmetric stop-gradient MAE between the MLP's
  per-point visibility prediction and the compositing transmittance, over ALL
  rays (sparse-depth rays included).
- VisibilityPriorLoss01 (:26-92): sum over other views of mask * (1 - vis2)
  on nerf-stream rays; None when visibility2 absent (validation-view renders).
- SparseDepthMSE01 (:27-71): squared depth error on sparse-depth-stream rays
  (fine depth if a fine MLP exists, else coarse); zero for full-image batches.
- DenseDepthMSE01 (:26-68): masked depth MSE vs the dense prior. (The
  reference's fine branch reads an undefined `self.num_rays` — a latent bug
  since no shipped config uses this loss with a fine MLP; here the fine branch
  simply uses the full depth_fine vector.)

Masked means are computed as sum(x * mask) / max(count, 1), which equals the
reference's boolean-index mean and returns 0 on empty masks.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of values[mask]; 0 when mask is empty. values/mask: (nr,)."""
    mask = mask.astype(values.dtype)
    count = jnp.sum(mask)
    return jnp.sum(values * mask) / jnp.maximum(count, 1.0)


def mse(configs: Dict[str, Any], loss_configs: Dict[str, Any]):
    """Photometric MSE on nerf-stream rays (MSE01.py)."""
    coarse_needed = "coarse_mlp" in configs["model"]
    fine_needed = "fine_mlp" in configs["model"]

    def compute(batch, outputs, return_loss_maps=False):
        mask = batch["indices_mask_nerf"]
        target = batch["target_rgb"]
        total = 0.0
        loss_maps = {}
        for needed, suffix in ((coarse_needed, "coarse"), (fine_needed, "fine")):
            if not needed:
                continue
            pred = outputs[f"rgb_{suffix}"]
            per_ray = jnp.mean(jnp.square(pred - target), axis=1)  # (nr,)
            total = total + _masked_mean(per_ray, mask)
            if return_loss_maps:
                loss_maps[f"MSE01_{suffix}"] = per_ray
        out = {"loss_value": total}
        if return_loss_maps:
            out["loss_maps"] = loss_maps
        return out

    return compute


def visibility_loss(configs: Dict[str, Any], loss_configs: Dict[str, Any]):
    """Symmetric stop-grad MAE: MLP visibility vs transmittance
    (VisibilityLoss01.py:55-74)."""
    coarse_needed = "coarse_mlp" in configs["model"]
    fine_needed = "fine_mlp" in configs["model"]

    def compute(batch, outputs, return_loss_maps=False):
        total = 0.0
        loss_maps = {}
        for needed, suffix in ((coarse_needed, "coarse"), (fine_needed, "fine")):
            if not needed:
                continue
            pred = outputs[f"raw_visibility_{suffix}"][..., 0]  # (nr, ns)
            target = outputs[f"visibility_{suffix}"]  # (nr, ns) transmittance
            map1 = jnp.mean(
                jnp.abs(pred - jax.lax.stop_gradient(target)), axis=1
            )
            map2 = jnp.mean(
                jnp.abs(jax.lax.stop_gradient(pred) - target), axis=1
            )
            # The reference averages over ALL rays (VisibilityLoss01 has no
            # indices mask); `ray_valid` is only injected by the tiled
            # renderer to exclude its pad rows — absent in training batches.
            if "ray_valid" in batch:
                total = (
                    total
                    + _masked_mean(map1, batch["ray_valid"])
                    + _masked_mean(map2, batch["ray_valid"])
                )
            else:
                total = total + jnp.mean(map1) + jnp.mean(map2)
            if return_loss_maps:
                loss_maps[f"VisibilityLoss01_{suffix}"] = map1 + map2
        out = {"loss_value": total}
        if return_loss_maps:
            out["loss_maps"] = loss_maps
        return out

    return compute


def visibility_prior_loss(configs: Dict[str, Any], loss_configs: Dict[str, Any]):
    """Prior-masked (1 - vis2) consistency (VisibilityPriorLoss01.py:26-92)."""
    coarse_needed = "coarse_mlp" in configs["model"]
    fine_needed = "fine_mlp" in configs["model"]

    def compute(batch, outputs, return_loss_maps=False):
        if (coarse_needed and "raw_visibility2_coarse" not in outputs) or (
            fine_needed and "raw_visibility2_fine" not in outputs
        ):
            return None

        mask = batch["indices_mask_nerf"]
        if "visibility_prior_masks" in batch:
            prior = batch["visibility_prior_masks"]
        elif "visibility_prior_weights" in batch:
            prior = batch["visibility_prior_weights"]
        else:
            nr = batch["rays_o"].shape[0]
            nf_m1 = outputs[
                "visibility2_coarse" if coarse_needed else "visibility2_fine"
            ].shape[-1]
            prior = jnp.ones((nr, nf_m1), dtype=batch["rays_o"].dtype)

        total = 0.0
        loss_maps = {}
        for needed, suffix in ((coarse_needed, "coarse"), (fine_needed, "fine")):
            if not needed:
                continue
            vis2 = outputs[f"visibility2_{suffix}"]  # (nr, nf-1)
            per_ray = jnp.sum(prior * (1.0 - vis2), axis=1)  # (nr,)
            total = total + _masked_mean(per_ray, mask)
            if return_loss_maps:
                loss_maps[f"VisibilityPriorLoss01_{suffix}"] = per_ray
        out = {"loss_value": total}
        if return_loss_maps:
            out["loss_maps"] = loss_maps
        return out

    return compute


def sparse_depth_mse(configs: Dict[str, Any], loss_configs: Dict[str, Any]):
    """Depth MSE on sparse-depth-stream rays (SparseDepthMSE01.py:27-71)."""
    fine_needed = "fine_mlp" in configs["model"]

    def compute(batch, outputs, return_loss_maps=False):
        if "indices_mask_sparse_depth" not in batch:
            return {"loss_value": jnp.zeros((), jnp.float32)}
        gt = batch["sparse_depth_values"][:, 0]
        mask = batch["indices_mask_sparse_depth"]
        suffix = "fine" if fine_needed else "coarse"
        pred = outputs[f"depth_{suffix}"]
        per_ray = jnp.square(pred - gt)
        out = {"loss_value": _masked_mean(per_ray, mask)}
        if return_loss_maps:
            out["loss_maps"] = {}
        return out

    return compute


def dense_depth_mse(configs: Dict[str, Any], loss_configs: Dict[str, Any]):
    """Depth MSE vs dense prior on nerf-stream rays (DenseDepthMSE01.py)."""
    coarse_needed = "coarse_mlp" in configs["model"]
    fine_needed = "fine_mlp" in configs["model"]

    def compute(batch, outputs, return_loss_maps=False):
        mask = batch["indices_mask_nerf"]
        gt = batch["dense_depth_values"][:, 0]
        total = 0.0
        loss_maps = {}
        for needed, suffix in ((coarse_needed, "coarse"), (fine_needed, "fine")):
            if not needed:
                continue
            pred = outputs[f"depth_{suffix}"]
            per_ray = jnp.square(pred - gt)
            total = total + _masked_mean(per_ray, mask)
            if return_loss_maps:
                loss_maps[f"DenseDepthMSE01_{suffix}"] = per_ray
        out = {"loss_value": total}
        if return_loss_maps:
            out["loss_maps"] = loss_maps
        return out

    return compute
