from vipnerf_tpu.infer.renderer import TiledRenderer  # noqa: F401
from vipnerf_tpu.infer.tester import NerfTester, start_testing  # noqa: F401
