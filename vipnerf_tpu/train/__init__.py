from vipnerf_tpu.train.trainer import Trainer, start_training  # noqa: F401
