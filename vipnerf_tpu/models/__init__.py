"""ViP-NeRF model family: MLP parameter pytrees, functional apply, and the
coarse+fine renderer."""

from vipnerf_tpu.models import mlp, vip_nerf  # noqa: F401
from vipnerf_tpu.models.factory import get_model  # noqa: F401
