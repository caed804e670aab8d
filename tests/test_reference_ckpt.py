"""Reference torch checkpoint (.tar) -> our .ckpt conversion.

Builds the reference VipNeRF model (torch CPU, from /root/reference), runs a
real Adam step so its optimizer state is populated, saves a checkpoint in
the reference's exact on-disk format (Trainer01.py:352-366, including the
DataParallel ``module.`` key prefix), converts it, and verifies:

- converted params equal the torch weights (transposed layout);
- Adam mu/nu equal torch exp_avg/exp_avg_sq; all counts equal the step;
- the .ckpt round-trips through our own load_checkpoint;
- directory conversion handles multiple iterations + the Latest symlink.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)

from test_reference_parity import build_configs  # noqa: E402


def _make_reference_checkpoint(tmp_path, iteration=1200, dp_prefix=True):
    import torch

    sys.path.insert(0, (REFERENCE / "src").as_posix())
    from models.VipNeRF01 import VipNeRF  # noqa: E402

    configs = build_configs(ndc=False)
    torch.manual_seed(0)
    model = VipNeRF(configs, {})
    optimizer = torch.optim.Adam(
        model.parameters(), lr=5e-4, betas=(0.9, 0.999)
    )
    # One real optimization step so exp_avg/exp_avg_sq/step exist.
    loss = sum((p * p).sum() for p in model.parameters())
    loss.backward()
    optimizer.step()
    for group in optimizer.param_groups:
        for p in group["params"]:
            optimizer.state[p]["step"] = torch.tensor(float(iteration))

    model_sd = model.state_dict()
    if dp_prefix:  # DataParallel wrap prefixes every key (Trainer01.py:517)
        model_sd = {f"module.{k}": v for k, v in model_sd.items()}
    save_dir = tmp_path / "saved_models"
    save_dir.mkdir(parents=True, exist_ok=True)
    tar_path = save_dir / f"Model_Iter{iteration:06}.tar"
    torch.save(
        {
            "iteration_num": iteration,
            "model_state_dict": model_sd,
            "optimizer_state_dict": optimizer.state_dict(),
        },
        tar_path,
    )
    # optimizer section is required by make_optimizer at conversion time
    configs["optimizer"] = {
        "lr_decayer_name": "NeRFLearningRateDecayer01",
        "lr_initial": 5e-4,
        "lr_decay": 250,
        "beta1": 0.9,
        "beta2": 0.999,
    }
    return configs, model, optimizer, tar_path


def test_convert_matches_torch_weights_and_moments(tmp_path):
    import jax

    from vipnerf_tpu.models import get_model
    from vipnerf_tpu.train.checkpoints import load_checkpoint
    from vipnerf_tpu.train.step import make_optimizer
    from vipnerf_tpu.utils.reference_ckpt import convert_run

    configs, model, optimizer, tar_path = _make_reference_checkpoint(tmp_path)
    (ckpt_path,) = convert_run(tar_path, configs)
    assert ckpt_path.name == "Model_Iter001200.ckpt"

    init_fn, _ = get_model(configs)
    template = init_fn(jax.random.PRNGKey(0), configs)
    tx = make_optimizer(configs)
    it, params, opt_state = load_checkpoint(
        ckpt_path, template, tx.init(template)
    )
    assert it == 1200

    # weights: torch Linear (out, in) -> ours (in, out)
    w_torch = model.coarse_model.pts_linears[0].weight.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(params["coarse"]["pts_linears"][0]["w"]), w_torch.T,
        rtol=0, atol=1e-7,
    )
    b_torch = model.fine_model.views_output_linear.bias.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(params["fine"]["views_output_linear"]["b"]), b_torch,
        rtol=0, atol=1e-7,
    )

    # Adam moments: state index 0 is the first state_dict entry
    # (coarse_model.pts_linears.0.weight)
    adam_state, sched_state = opt_state
    entry0 = optimizer.state_dict()["state"][0]
    np.testing.assert_allclose(
        np.asarray(adam_state.mu["coarse"]["pts_linears"][0]["w"]),
        entry0["exp_avg"].numpy().T,
        rtol=0, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(adam_state.nu["coarse"]["pts_linears"][0]["w"]),
        entry0["exp_avg_sq"].numpy().T,
        rtol=0, atol=1e-7,
    )
    assert int(adam_state.count) == 1200
    assert int(sched_state.count) == 1200

    # the converted checkpoint trains: one step must not error / NaN
    import jax.numpy as jnp

    updates, _ = tx.update(
        jax.tree_util.tree_map(jnp.ones_like, params), opt_state, params,
        loss=jnp.asarray(0.1),
    )
    assert all(
        np.isfinite(np.asarray(u)).all()
        for u in jax.tree_util.tree_leaves(updates)
    )


def test_convert_directory_and_configs_discovery(tmp_path):
    from vipnerf_tpu.train.checkpoints import (
        checkpoint_iteration,
        latest_checkpoint,
    )
    from vipnerf_tpu.utils.reference_ckpt import convert_run

    configs, _, _, tar1 = _make_reference_checkpoint(
        tmp_path, iteration=100, dp_prefix=False
    )
    _, _, _, tar2 = _make_reference_checkpoint(tmp_path, iteration=200)
    save_dir = tar1.parent
    # reference Latest symlink must be skipped, not converted twice
    (save_dir / "Model_Latest.tar").symlink_to(tar2.name)
    # Configs.json one level up (reference run layout) -> auto-discovery
    (tmp_path / "Configs.json").write_text(json.dumps(configs))

    written = convert_run(save_dir)
    assert [p.name for p in written] == [
        "Model_Iter000100.ckpt",
        "Model_Iter000200.ckpt",
    ]
    latest = latest_checkpoint(save_dir)
    assert checkpoint_iteration(latest) == 200


def test_export_roundtrips_and_reference_loads_it(tmp_path):
    """our .ckpt -> reference .tar: bitwise roundtrip + the reference's own
    DataParallel-wrapped load path (Trainer01.py:376, Tester01.py:48)
    accepts it and can take an optimizer step."""
    import torch

    from vipnerf_tpu.utils.reference_ckpt import convert_run, export_run

    sys.path.insert(0, (REFERENCE / "src").as_posix())
    from models.VipNeRF01 import VipNeRF  # noqa: E402

    configs, model, optimizer, tar_path = _make_reference_checkpoint(tmp_path)
    (ckpt_path,) = convert_run(tar_path, configs)
    export_dir = tmp_path / "exported"
    export_dir.mkdir()
    (exported,) = export_run(ckpt_path, configs, export_dir)
    assert exported.name == "Model_Iter001200.tar"
    assert (export_dir / "Model_Latest.tar").resolve() == exported.resolve()

    orig = torch.load(tar_path, map_location="cpu")
    back = torch.load(exported, map_location="cpu")
    assert back["iteration_num"] == 1200

    # model weights: same (module.-prefixed) keys, bitwise-equal tensors
    assert list(back["model_state_dict"]) == list(orig["model_state_dict"])
    for k, v in orig["model_state_dict"].items():
        np.testing.assert_array_equal(
            back["model_state_dict"][k].numpy(), v.numpy(), err_msg=k
        )

    # Adam state: positional indices line up with parameters() order
    o_state = orig["optimizer_state_dict"]["state"]
    b_state = back["optimizer_state_dict"]["state"]
    assert sorted(b_state) == sorted(o_state)
    for idx in o_state:
        for field in ("exp_avg", "exp_avg_sq"):
            np.testing.assert_array_equal(
                b_state[idx][field].numpy(), o_state[idx][field].numpy(),
                err_msg=f"state[{idx}].{field}",
            )
        assert float(b_state[idx]["step"]) == float(o_state[idx]["step"])

    # the reference's actual load path: DataParallel wrap + Adam resume
    torch.manual_seed(1)  # different init, to prove the load overwrites it
    model2 = torch.nn.DataParallel(VipNeRF(configs, {}))
    model2.load_state_dict(back["model_state_dict"])
    np.testing.assert_array_equal(
        model2.module.coarse_model.pts_linears[0].weight.detach().numpy(),
        model.coarse_model.pts_linears[0].weight.detach().numpy(),
    )
    opt2 = torch.optim.Adam(model2.parameters(), lr=5e-4, betas=(0.9, 0.999))
    opt2.load_state_dict(back["optimizer_state_dict"])
    loss = sum((p * p).sum() for p in model2.parameters())
    loss.backward()
    opt2.step()  # must not error with the imported moments
    p0 = next(iter(opt2.state.values()))
    assert float(p0["step"]) == 1201.0


def test_single_file_conversion_never_rolls_latest_back(tmp_path):
    """Converting/exporting ONE older checkpoint into a dir that already
    has a newer one must not retarget the Latest pointer backwards."""
    from vipnerf_tpu.train.checkpoints import (
        checkpoint_iteration,
        latest_checkpoint,
    )
    from vipnerf_tpu.utils.reference_ckpt import convert_run, export_run

    configs, _, _, tar1 = _make_reference_checkpoint(
        tmp_path, iteration=100, dp_prefix=False
    )
    _, _, _, tar2 = _make_reference_checkpoint(tmp_path, iteration=200)
    save_dir = tar1.parent

    convert_run(tar2, configs)  # Latest -> 200
    convert_run(tar1, configs)  # older single-file convert
    assert checkpoint_iteration(latest_checkpoint(save_dir)) == 200

    export_run(save_dir / "Model_Iter000200.ckpt", configs)
    export_run(save_dir / "Model_Iter000100.ckpt", configs)
    latest_tar = save_dir / "Model_Latest.tar"
    assert latest_tar.resolve().name == "Model_Iter000200.tar"


def test_convert_rejects_mismatched_configs(tmp_path):
    from vipnerf_tpu.utils.reference_ckpt import convert_checkpoint

    configs, _, _, tar_path = _make_reference_checkpoint(tmp_path)
    wrong = json.loads(json.dumps(configs))
    wrong["model"]["coarse_mlp"]["netwidth"] = 128
    with pytest.raises(ValueError, match="mismatch"):
        convert_checkpoint(tar_path, wrong)


def test_dangling_latest_symlink_is_replaced(tmp_path):
    """A Model_Latest.ckpt whose target was deleted (manual rollback) must be
    re-pointed even when the dead target's NAME parses to a newer iteration."""
    import jax.numpy as jnp

    from vipnerf_tpu.train import checkpoints

    params = {"w": jnp.zeros((2,))}
    opt = {"m": jnp.zeros((2,))}
    checkpoints.save_checkpoint(tmp_path, 200, params, opt)
    (tmp_path / "Model_Iter000200.ckpt").unlink()  # rollback: Latest dangles
    checkpoints.save_checkpoint(tmp_path, 100, params, opt)
    latest = tmp_path / "Model_Latest.ckpt"
    assert latest.resolve().name == "Model_Iter000100.ckpt"
    it, _, _ = checkpoints.load_checkpoint(latest, params, opt)
    assert it == 100
