"""Model factory: name -> (init, render) pair.

The reference resolves model classes by importlib reflection from config names
(src/models/ModelFactory.py:10-22). Here the registry is static (jit-friendly
and greppable); config `model.name` values keep the reference naming
convention ('VipNeRF01') for drop-in config compatibility.
"""

from typing import Any, Callable, Dict, Tuple

from vipnerf_tpu.models import vip_nerf

_REGISTRY: Dict[str, Tuple[Callable, Callable]] = {
    "VipNeRF01": (vip_nerf.init_params, vip_nerf.render_rays),
}


def get_model(configs: Dict[str, Any]) -> Tuple[Callable, Callable]:
    """Return (init_params, render_rays) for `configs['model']['name']`."""
    name = configs["model"]["name"]
    if name not in _REGISTRY:
        raise RuntimeError(f"Unknown model: {name}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name]
