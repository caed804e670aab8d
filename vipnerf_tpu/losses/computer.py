"""LossComputer: weighted sum of configured losses.

Parity target: src/loss_functions/LossComputer01.py (paths relative to
/root/reference/): constant `weight` or iteration-staged `iter_weights`
(:55-69, selected as the largest threshold <= iter_num), losses that return
None are skipped (:47-50), and the result dict carries per-loss values plus
'TotalLoss' (:52).

TPU-first notes: the reference resolves loss classes via importlib reflection
(:21-32); here the registry is static. `iter_num` may be a traced scalar —
iteration-staged weights compile to a chain of jnp.where, so the whole loss
computation stays inside the jitted train step.
"""

from typing import Any, Callable, Dict, Union

import jax.numpy as jnp

from vipnerf_tpu.losses import functions

_REGISTRY: Dict[str, Callable] = {
    "MSE01": functions.mse,
    "VisibilityLoss01": functions.visibility_loss,
    "VisibilityPriorLoss01": functions.visibility_prior_loss,
    "SparseDepthMSE01": functions.sparse_depth_mse,
    "DenseDepthMSE01": functions.dense_depth_mse,
}


class LossComputer:
    def __init__(self, configs: Dict[str, Any]):
        self.configs = configs
        self.losses: Dict[str, Callable] = {}
        self.loss_configs: Dict[str, Dict[str, Any]] = {}
        for loss_cfg in configs["losses"]:
            name = loss_cfg["name"]
            if name not in _REGISTRY:
                raise RuntimeError(
                    f"Unknown Loss Function: {name}; known: {sorted(_REGISTRY)}"
                )
            self.losses[name] = _REGISTRY[name](configs, loss_cfg)
            self.loss_configs[name] = loss_cfg
            if "weight" not in loss_cfg and "iter_weights" in loss_cfg:
                # The reference raises at the first iteration below the
                # smallest threshold (LossComputer01.py:66-69). iter_num is
                # traced here so the in-graph chain can't raise — validate
                # the config up front instead of silently zero-weighting.
                if min(int(k) for k in loss_cfg["iter_weights"]) != 0:
                    raise RuntimeError(
                        f"Invalid iter_weights for {name}: a '0' stage is "
                        f"required (got {sorted(loss_cfg['iter_weights'])})"
                    )

    def get_loss_weight(
        self, name: str, iter_num: Union[int, jnp.ndarray]
    ) -> Union[float, jnp.ndarray]:
        """Constant or staged weight (LossComputer01.py:55-69)."""
        cfg = self.loss_configs[name]
        if "weight" in cfg:
            return cfg["weight"]
        if "iter_weights" in cfg:
            stages = sorted((int(k), v) for k, v in cfg["iter_weights"].items())
            weight = jnp.asarray(0.0, jnp.float32)
            for threshold, value in stages:
                weight = jnp.where(iter_num >= threshold, value, weight)
            return weight
        raise RuntimeError(f"loss weight is unspecified for {name}")

    def compute_losses(
        self,
        batch: Dict[str, Any],
        outputs: Dict[str, Any],
        *,
        return_loss_maps: bool = False,
    ) -> Dict[str, Any]:
        """Weighted total + per-loss dicts (LossComputer01.py:34-52).

        `batch['iter_num']` may be traced. Returns
        {loss_name: {'loss_value': ...[, 'loss_maps': ...]}, 'TotalLoss': x}.
        """
        iter_num = batch["iter_num"]
        loss_values: Dict[str, Any] = {}
        total = jnp.zeros((), jnp.float32)
        for name, loss_fn in self.losses.items():
            loss_dict = loss_fn(batch, outputs, return_loss_maps)
            if loss_dict is None:
                continue
            weight = self.get_loss_weight(name, iter_num)
            loss_values[name] = loss_dict
            total = total + weight * loss_dict["loss_value"]
        loss_values["TotalLoss"] = total
        return loss_values
