"""Device mesh + sharding policy for ViP-NeRF training and rendering.

The reference's only parallelism is single-process torch DataParallel over 2
GPUs, scattering the ray batch (src/Trainer01.py:517, SURVEY.md §2.9). The
TPU-native equivalent is a 1-D `jax.sharding.Mesh` over all chips with the
ray axis sharded and parameters replicated (the MLP is ~1.2M params, so pure
data parallelism is optimal): XLA inserts the gradient psum over ICI
automatically when jitting grad(replicated params, sharded batch).

The mesh generalizes to multi-host DCN (axis order puts hosts outermost), but
a single scene trains comfortably on one chip — multi-chip is for throughput
on the ray axis, exactly like the reference's DataParallel, minus the
scatter/gather host hops.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the ray axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def select_devices(device_sel=None):
    """Resolve a ``configs['device']`` selection to a device list.

    The reference's configs carry CUDA device ids for DataParallel
    (src/Trainer01.py:517, device:[0,1]); here the same key selects mesh
    devices: ``None`` or ``"all"`` = every local device, otherwise an
    explicit list of local device indices."""
    devices = jax.devices()
    if device_sel is None or device_sel == "all":
        return list(devices)
    if isinstance(device_sel, int):
        device_sel = [device_sel]
    bad = [i for i in device_sel if not 0 <= i < len(devices)]
    if bad:
        raise ValueError(
            f"configs['device'] indices {bad} out of range: "
            f"{len(devices)} local device(s) present"
        )
    return [devices[i] for i in device_sel]


def ray_sharding(mesh: Mesh, axis: int = 0, ndim: int = 2) -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the ray axis."""
    spec = [None] * ndim
    spec[axis] = RAY_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_index_chunk(mesh: Mesh, chunk: np.ndarray) -> jax.Array:
    """Place a (K, batch) index block with the batch axis sharded."""
    return jax.device_put(chunk, ray_sharding(mesh, axis=1, ndim=chunk.ndim))
