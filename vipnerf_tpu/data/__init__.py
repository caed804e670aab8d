"""Dataset I/O and the device-resident ray-cache pipeline."""

from vipnerf_tpu.data.loaders.factory import get_data_loader  # noqa: F401
from vipnerf_tpu.data.preprocessor import DataPreprocessor, get_data_preprocessor  # noqa: F401
