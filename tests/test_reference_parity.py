"""Golden parity vs the reference PyTorch implementation.

Loads the reference VipNeRF model (torch CPU) from /root/reference when that
checkout exists (skipped otherwise — the framework itself never depends on
it), copies OUR parameters into it, and compares full eval-mode renders.
At eval time both implementations are deterministic (no stratified jitter,
linspace CDF samples), so rgb/depth/visibility must agree to float tolerance.
This is the strongest available evidence for the ±0.1 dB quality target
(SURVEY.md §6): identical math => identical training signal.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


def build_configs(ndc: bool):
    mlp = {
        "num_samples": 32,
        "netdepth": 8,
        "netwidth": 256,
        "points_positional_encoding_degree": 10,
        "views_positional_encoding_degree": 4,
        "use_view_dirs": True,
        "view_dependent_rgb": True,
        "predict_visibility": True,
    }
    fine = dict(mlp)
    fine["num_samples"] = 64
    return {
        "data_loader": {"ndc": ndc},
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": mlp,
            "fine_mlp": fine,
            "chunk": 4096,
            "lindisp": False,
            "netchunk": 16384,
            "perturb": True,  # ignored at eval in both implementations
            "raw_noise_std": 1.0,  # ditto
            "white_bkgd": False,
        },
    }


def make_inputs(nr: int, nf_m1: int, ndc: bool, seed: int = 0):
    rng = np.random.default_rng(seed)
    rays_d = (rng.normal(size=(nr, 3)) - [0, 0, 3.0]).astype(np.float32)
    view_dirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    batch = {
        "rays_o": rng.normal(size=(nr, 3)).astype(np.float32),
        "rays_d": rays_d,
        "view_dirs": view_dirs.astype(np.float32),
        "near": np.full((nr, 1), 1.5, np.float32),
        "far": np.full((nr, 1), 6.0, np.float32),
        "rays_o2": rng.normal(size=(nr, nf_m1, 3)).astype(np.float32),
    }
    if ndc:
        batch["rays_o_ndc"] = rng.uniform(-1, 1, (nr, 3)).astype(np.float32)
        batch["rays_d_ndc"] = rng.uniform(-1, 1, (nr, 3)).astype(np.float32)
        batch["near_ndc"] = np.zeros((nr, 1), np.float32)
        batch["far_ndc"] = np.ones((nr, 1), np.float32)
    return batch


def copy_params_to_torch(params, torch_model):
    """Our pytree (w: (in, out)) -> torch Linear (weight: (out, in))."""
    import torch

    def fill(linear, layer):
        with torch.no_grad():
            linear.weight.copy_(torch.from_numpy(np.asarray(layer["w"]).T))
            linear.bias.copy_(torch.from_numpy(np.asarray(layer["b"])))

    for ours, theirs in (
        (params["coarse"], torch_model.coarse_model),
        (params["fine"], torch_model.fine_model),
    ):
        for i, layer in enumerate(ours["pts_linears"]):
            fill(theirs.pts_linears[i], layer)
        fill(theirs.pts_output_linear, ours["pts_output_linear"])
        fill(theirs.feature_linear, ours["feature_linear"])
        fill(theirs.views_linears[0], ours["views_linears"][0])
        fill(theirs.views_output_linear, ours["views_output_linear"])


@pytest.mark.parametrize("ndc", [False, True])
def test_eval_render_matches_reference(ndc):
    import torch

    sys.path.insert(0, (REFERENCE / "src").as_posix())
    from models.VipNeRF01 import VipNeRF  # noqa: E402  (reference import)

    import jax

    from vipnerf_tpu.models import vip_nerf

    configs = build_configs(ndc)
    params = vip_nerf.init_params(jax.random.PRNGKey(0), configs)

    torch_model = VipNeRF(configs, {})
    torch_model.eval()
    copy_params_to_torch(params, torch_model)

    nr, nf_m1 = 64, 2
    batch_np = make_inputs(nr, nf_m1, ndc)

    torch_batch = {k: torch.from_numpy(v) for k, v in batch_np.items()}
    with torch.no_grad():
        ref_out = torch_model(torch_batch, retraw=True, sec_views_vis=True)

    import jax.numpy as jnp

    jax_batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    out = vip_nerf.render_rays(
        params, configs, jax_batch, train=False, sec_views_vis=True, retraw=True
    )

    checked = 0
    for key in (
        "rgb_coarse", "rgb_fine", "depth_coarse", "depth_fine",
        "acc_fine", "depth_var_fine", "visibility2_coarse",
        "visibility2_fine", "z_vals_fine", "weights_fine",
        "raw_sigma_fine", "raw_visibility_fine",
    ):
        if key not in ref_out:
            continue
        ref_v = ref_out[key].numpy()
        ours_v = np.asarray(out[key])
        np.testing.assert_allclose(
            ours_v, ref_v, atol=2e-4, rtol=2e-3, err_msg=key
        )
        checked += 1
    assert checked >= 10
    if ndc:
        np.testing.assert_allclose(
            np.asarray(out["depth_ndc_fine"]),
            ref_out["depth_ndc_fine"].numpy(),
            atol=2e-4, rtol=2e-3,
        )
