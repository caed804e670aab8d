from vipnerf_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    ray_sharding,
    replicate,
    shard_index_chunk,
)
