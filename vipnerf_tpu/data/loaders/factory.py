"""Data-loader factory mapping reference loader names to dataset specs.

The reference resolves loader classes by importlib reflection
(src/data_loaders/DataLoaderFactory.py:14-26); here the registry is static
but accepts the same config names ('NerfLlffDataLoader01', ...).
"""

from typing import Optional

from vipnerf_tpu.data.loaders.base import (
    DTU_SPEC,
    NERF_LLFF_SPEC,
    REAL_ESTATE_SPEC,
    DataLoader,
    DatasetSpec,
)

_REGISTRY = {
    "NerfLlffDataLoader01": NERF_LLFF_SPEC,
    "RealEstateDataLoader01": REAL_ESTATE_SPEC,
    "DtuDataLoader01": DTU_SPEC,
}


def get_data_loader(configs: dict, data_dirpath, mode: Optional[str]) -> DataLoader:
    name = configs["data_loader"]["data_loader_name"]
    spec: Optional[DatasetSpec] = _REGISTRY.get(name)
    if spec is None:
        raise RuntimeError(f"Unknown data loader: {name}; known: {sorted(_REGISTRY)}")
    return DataLoader(spec, configs, data_dirpath, mode)
