"""Subprocess worker for the 2-process jax.distributed equivalence test.

Invoked by tests/test_multiprocess.py: each of two processes owns 4 virtual
CPU devices; `jax.distributed.initialize` joins them into the same 8-device
global mesh the single-process suite uses, so K train steps here exercise
SURVEY §2.9's DCN/multi-host mesh obligation at a real process boundary
(the gradient psum rides Gloo collectives over TCP instead of intra-process
XLA). The setup mirrors tests/test_parallel.py::
test_k_steps_sharded_match_single_device exactly — same seeds, same index
stream — so process 0's final params must match the single-process run.

With num_processes=1 it doubles as the single-process reference generator
(no distributed init), so a caller without a CPU backend of its own — e.g.
__graft_entry__.dryrun_multichip on the TPU — can produce both sides of the
comparison from plain numpy files.

argv: process_id num_processes local_devices coordinator_port out_npz
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
local_devices = int(sys.argv[3])
port = sys.argv[4]
out_path = sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices}"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# sitecustomize force-registers the axon TPU backend; the env var alone is
# ignored (see tests/conftest.py) — the config update keeps workers off the
# shared chip.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vipnerf_tpu.losses import LossComputer  # noqa: E402
from vipnerf_tpu.models import get_model  # noqa: E402
from vipnerf_tpu.parallel.mesh import make_mesh, ray_sharding  # noqa: E402
from vipnerf_tpu.train.step import (  # noqa: E402
    make_optimizer,
    make_scan_train_nosd,
    make_train_step,
)

from tests.test_train_step import (  # noqa: E402
    make_cache,
    make_gather,
    small_configs,
)

assert len(jax.local_devices()) == local_devices, "wrong local device count"
assert len(jax.devices()) == local_devices * nproc, (
    "global mesh must span all processes"
)

mesh = make_mesh()  # global: spans both processes' devices


def to_global(tree, spec=P()):
    """Lift host-local (identical-on-every-process) values onto the global
    mesh: each process supplies only its addressable shards."""

    def conv(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(conv, tree)


configs = small_configs()
init_fn, render_fn = get_model(configs)
params = init_fn(jax.random.PRNGKey(0), configs)
lc = LossComputer(configs)
tx = make_optimizer(configs)
cache = to_global(make_cache())  # replicated device-resident ray cache
gather = make_gather(cache)
ts = make_train_step(configs, render_fn, lc, tx)
scan_run = make_scan_train_nosd(configs, gather, ts, donate=False)

key = to_global(jax.random.PRNGKey(3))
idx_np = np.random.default_rng(1).integers(0, 512, (6, 64)).astype(np.int32)
idx = jax.make_array_from_callback(
    idx_np.shape, ray_sharding(mesh, axis=1), lambda s: idx_np[s]
)

p_final, _, scalars = scan_run(
    to_global(params), to_global(tx.init(params)), key, 10, idx
)
jax.block_until_ready(p_final)

if pid == 0:
    leaves = [
        np.asarray(leaf.addressable_data(0))
        for leaf in jax.tree.leaves(p_final)
    ]
    np.savez(
        out_path,
        total_loss=np.asarray(scalars["TotalLoss"].addressable_data(0)),
        **{f"leaf{i}": leaf for i, leaf in enumerate(leaves)},
    )
jax.distributed.shutdown()
print(f"worker {pid}: OK", flush=True)
