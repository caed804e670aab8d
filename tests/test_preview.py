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


def test_preview_budget_configs_keeps_full_pipeline():
    """`preview: true` = the 32+8 reduced-budget FULL pipeline (the
    coarse-only preview was retired with a held-out quality measurement,
    BASELINE.md round-5): both MLPs stay, only the quadrature shrinks
    (clamped to the trained counts), and the source configs are
    untouched."""
    from vipnerf_tpu.infer.renderer import (
        PREVIEW_BUDGET,
        preview_budget_configs,
    )

    configs = full_configs()
    # Flagship-shaped counts reduce to exactly the measured 32+8 budget.
    flagship = full_configs()
    flagship["model"]["coarse_mlp"]["num_samples"] = 64
    flagship["model"]["fine_mlp"]["num_samples"] = 128
    fcfg = preview_budget_configs(flagship)
    assert fcfg["model"]["coarse_mlp"]["num_samples"] == PREVIEW_BUDGET[0]
    assert fcfg["model"]["fine_mlp"]["num_samples"] == PREVIEW_BUDGET[1]

    # Counts already below the budget are never INCREASED by a preview.
    bcfg = preview_budget_configs(configs)
    assert bcfg["model"]["coarse_mlp"]["num_samples"] == 8
    assert bcfg["model"]["fine_mlp"]["num_samples"] == PREVIEW_BUDGET[1]
    assert configs["model"]["coarse_mlp"]["num_samples"] == 8  # untouched
    assert configs["model"]["fine_mlp"]["num_samples"] == 16

    # Coarse-only models stay coarse-only (the app-video fixture shape).
    coarse_only = full_configs()
    del coarse_only["model"]["fine_mlp"]
    ccfg = preview_budget_configs(coarse_only)
    assert "fine_mlp" not in ccfg["model"]
    assert ccfg["model"]["coarse_mlp"]["num_samples"] == 8

    import jax

    from vipnerf_tpu.infer.renderer import TiledRenderer
    from vipnerf_tpu.models import get_model

    init_fn, render_fn = get_model(configs)
    params = init_fn(jax.random.PRNGKey(0), configs)
    out, _ = TiledRenderer(render_fn, bcfg).render(
        params, make_batch(64), chunk_size=64,
        keep=("rgb_coarse", "rgb_fine"),
    )
    # The fine pass runs (unlike the retired coarse-only default).
    assert out["rgb_fine"].shape == (64, 3)
    assert np.isfinite(out["rgb_fine"]).all()


def test_tester_preview_mode_selection():
    """NerfTester routes `preview: true` to the budget pipeline and an
    explicit integer to the coarse-only debug view."""
    import json
    from pathlib import Path

    from vipnerf_tpu.infer.renderer import PREVIEW_BUDGET
    from vipnerf_tpu.infer.tester import NerfTester

    configs = full_configs()
    configs["model"]["coarse_mlp"]["num_samples"] = 64  # flagship counts
    configs["model"]["fine_mlp"]["num_samples"] = 128
    configs.update({
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "data_loader": {
            "ndc": False,
            "batching": True,
            "data_preprocessor_name": "DataPreprocessor01",
            "bd_factor": None,
            "downsampling_factor": 1,
            "num_rays": 32,
        },
        "seed": 0,
    })
    model_configs = {"resolution": [8, 10], "near": 1.0, "far": 5.0}

    t_true = NerfTester(
        json.loads(json.dumps(configs)), dict(model_configs),
        {"device": [0], "preview": True}, Path("/tmp"),
    )
    rc = t_true.renderer.configs["model"]
    assert rc["coarse_mlp"]["num_samples"] == PREVIEW_BUDGET[0]
    assert rc["fine_mlp"]["num_samples"] == PREVIEW_BUDGET[1]

    t_int = NerfTester(
        json.loads(json.dumps(configs)), dict(model_configs),
        {"device": [0], "preview": 4}, Path("/tmp"),
    )
    rc = t_int.renderer.configs["model"]
    assert rc["coarse_mlp"]["num_samples"] == 4
    assert "fine_mlp" not in rc
