"""Multi-PROCESS mesh equivalence: 2 processes x 4 devices == 1 process x 8.

SURVEY §2.9 requires the mesh abstraction to generalize past a single
process to the multi-host/DCN topology real TPU pods use. The in-process
sharding tests (tests/test_parallel.py) cover the single-controller case;
this test covers the process boundary: two OS processes, each owning 4
virtual CPU devices, joined by `jax.distributed.initialize` into one
8-device global mesh (gradient psum over Gloo/TCP — the CPU stand-in for
ICI/DCN collectives), must produce bit-comparable params to the
single-process 8-device run after K train steps.

The reference has no analogue (torch DataParallel is single-process,
/root/reference/src/Trainer01.py:517) — this is TPU-native scaling evidence.
"""

import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np

from vipnerf_tpu.losses import LossComputer
from vipnerf_tpu.models import get_model
from vipnerf_tpu.parallel.mesh import make_mesh, ray_sharding, replicate
from vipnerf_tpu.train.step import (
    make_optimizer,
    make_scan_train_nosd,
    make_train_step,
)

from tests.test_train_step import make_cache, make_gather, small_configs

_WORKER = Path(__file__).parent / "mp_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """Same computation as the workers, on this process's 8-device mesh."""
    configs = small_configs()
    init_fn, render_fn = get_model(configs)
    params = init_fn(jax.random.PRNGKey(0), configs)
    lc = LossComputer(configs)
    tx = make_optimizer(configs)
    gather = make_gather(make_cache())
    ts = make_train_step(configs, render_fn, lc, tx)
    scan_run = make_scan_train_nosd(configs, gather, ts, donate=False)

    mesh = make_mesh()
    rep = replicate(mesh)
    idx_np = (
        np.random.default_rng(1).integers(0, 512, (6, 64)).astype(np.int32)
    )
    p, _, s = scan_run(
        jax.device_put(params, rep),
        jax.device_put(tx.init(params), rep),
        jax.random.PRNGKey(3),
        10,
        jax.device_put(idx_np, ray_sharding(mesh, axis=1)),
    )
    return p, np.asarray(s["TotalLoss"])


def test_two_processes_match_single_process(tmp_path):
    out_npz = tmp_path / "mp_result.npz"
    port = _free_port()

    # Workers must NOT inherit this process's 8-device XLA_FLAGS or any
    # JAX coordination state; they set their own 4-device topology.
    import os

    env = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith("JAX") and k != "XLA_FLAGS"
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), "2", "4", str(port),
             str(out_npz)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i}: OK" in out

    p_ref, loss_ref = _single_process_reference()
    got = np.load(out_npz)

    np.testing.assert_allclose(got["total_loss"], loss_ref, rtol=1e-5)
    ref_leaves = [np.asarray(x) for x in jax.tree.leaves(p_ref)]
    assert len(ref_leaves) == len(got.files) - 1
    for i, ref in enumerate(ref_leaves):
        np.testing.assert_allclose(
            got[f"leaf{i}"], ref, atol=2e-6, rtol=1e-5,
            err_msg=f"param leaf {i} diverged across the process boundary",
        )
