from vipnerf_tpu.data.loaders.factory import get_data_loader  # noqa: F401
