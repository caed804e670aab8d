"""Coarse-only preview rendering (`infer.renderer.preview_configs`).

The preview drops the fine pass (and optionally reduces samples) while
reusing the FULL model's params. At eval time the coarse pass is
deterministic and independent of the fine pass, so the preview's coarse
outputs must be bitwise identical to the coarse outputs of a full render
with the same params — that is the correctness contract.
"""

import numpy as np


def full_configs():
    mlp = {
        "num_samples": 8, "netdepth": 4, "netwidth": 32,
        "points_positional_encoding_degree": 4,
        "views_positional_encoding_degree": 2,
        "use_view_dirs": True, "view_dependent_rgb": True,
        "predict_visibility": True,
    }
    fine = dict(mlp, num_samples=16)
    return {
        "data_loader": {"ndc": False},
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": mlp,
            "fine_mlp": fine,
            "chunk": 4096, "lindisp": False, "netchunk": 16384,
            "perturb": True, "raw_noise_std": 0.0, "white_bkgd": False,
        },
    }


def make_batch(nr, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    rays_d = (rng.normal(size=(nr, 3)) - [0, 0, 3.0]).astype(np.float32)
    return {
        "rays_o": jnp.asarray(rng.normal(size=(nr, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(rays_d),
        "view_dirs": jnp.asarray(
            rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        ),
        "near": jnp.full((nr, 1), 1.0, jnp.float32),
        "far": jnp.full((nr, 1), 5.0, jnp.float32),
    }


def test_preview_matches_full_coarse_outputs():
    import jax

    from vipnerf_tpu.infer.renderer import TiledRenderer, preview_configs
    from vipnerf_tpu.models import get_model

    configs = full_configs()
    init_fn, render_fn = get_model(configs)
    params = init_fn(jax.random.PRNGKey(0), configs)
    batch = make_batch(96)

    full = TiledRenderer(render_fn, configs)
    full_out, _ = full.render(
        params, batch, chunk_size=64,
        keep=("rgb_coarse", "rgb_fine", "depth_coarse"),
    )
    assert "rgb_fine" in full_out

    pcfg = preview_configs(configs)
    assert "fine_mlp" not in pcfg["model"]
    assert "fine_mlp" in configs["model"]  # original untouched
    preview = TiledRenderer(render_fn, pcfg)
    prev_out, _ = preview.render(
        params, batch, chunk_size=64, keep=("rgb_coarse", "depth_coarse"),
    )
    assert "rgb_fine" not in prev_out
    np.testing.assert_array_equal(
        prev_out["rgb_coarse"], full_out["rgb_coarse"]
    )
    np.testing.assert_array_equal(
        prev_out["depth_coarse"], full_out["depth_coarse"]
    )


def test_preview_sample_override_runs():
    import jax

    from vipnerf_tpu.infer.renderer import TiledRenderer, preview_configs
    from vipnerf_tpu.models import get_model

    configs = full_configs()
    init_fn, render_fn = get_model(configs)
    params = init_fn(jax.random.PRNGKey(0), configs)
    batch = make_batch(64)

    pcfg = preview_configs(configs, num_samples=4)
    out, _ = TiledRenderer(render_fn, pcfg).render(
        params, batch, chunk_size=64, keep=("rgb_coarse",)
    )
    assert out["rgb_coarse"].shape == (64, 3)
    assert np.isfinite(out["rgb_coarse"]).all()
