from vipnerf_tpu.infer.renderer import TiledRenderer  # noqa: F401
