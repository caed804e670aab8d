"""Parity tests: Pallas fused MLP (interpret mode) vs the XLA apply_mlp.

The kernel was retired from the production tree round 3 (see
experiments/README.md for the measured rationale); these tests keep its
numerics claims verifiable.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vipnerf_tpu.models.mlp import apply_mlp, init_mlp_params

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "experiments"))
import fused_mlp as fm  # noqa: E402

CFG = {
    "num_samples": 0,
    "netdepth": 8,
    "netwidth": 256,
    "points_positional_encoding_degree": 10,
    "views_positional_encoding_degree": 4,
    "use_view_dirs": True,
    "view_dependent_rgb": True,
    "predict_visibility": True,
}


@pytest.fixture(scope="module")
def setup():
    params = init_mlp_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    npts = fm.TILE  # one tile
    pts = jnp.asarray(rng.uniform(-1, 1, (npts, 3)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(npts, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)
    vd2 = jnp.asarray(rng.normal(size=(npts, 2, 3)).astype(np.float32))
    vd2 = vd2 / jnp.linalg.norm(vd2, axis=-1, keepdims=True)
    return params, pts, vd, vd2


class TestFusedForward:
    def test_forward_parity(self, setup):
        params, pts, vd, vd2 = setup
        ref = apply_mlp(params, CFG, pts, vd, vd2)
        with pltpu.force_tpu_interpret_mode():
            out = fm.apply_fused_mlp(
                params, CFG, pts, vd, vd2, dtype=jnp.float32
            )
        for k in ("sigma", "rgb", "visibility"):
            np.testing.assert_allclose(
                np.asarray(out[k]), np.asarray(ref[k]), atol=2e-5,
                err_msg=k,
            )
        np.testing.assert_allclose(
            np.asarray(out["visibility2"]), np.asarray(ref["visibility2"]),
            atol=2e-5,
        )

    def test_forward_parity_no_secondary(self, setup):
        params, pts, vd, _ = setup
        ref = apply_mlp(params, CFG, pts, vd, None)
        with pltpu.force_tpu_interpret_mode():
            out = fm.apply_fused_mlp(params, CFG, pts, vd, None,
                                     dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(ref["rgb"]), atol=2e-5
        )
        assert "visibility2" not in out

    def test_padding_to_tile(self, setup):
        params, pts, vd, vd2 = setup
        k = 100  # non-multiple of TILE
        with pltpu.force_tpu_interpret_mode():
            out = fm.apply_fused_mlp(
                params, CFG, pts[:k], vd[:k], vd2[:k], dtype=jnp.float32
            )
            full = fm.apply_fused_mlp(
                params, CFG, pts, vd, vd2, dtype=jnp.float32
            )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]), np.asarray(full["rgb"])[:k], atol=1e-6
        )


class TestFusedBackward:
    def test_gradient_parity(self, setup):
        params, pts, vd, vd2 = setup

        def loss_ref(p):
            out = apply_mlp(p, CFG, pts, vd, vd2)
            return (
                jnp.sum(out["rgb"] ** 2)
                + jnp.sum(out["sigma"])
                + jnp.sum(out["visibility"] * 0.5)
                + jnp.sum(out["visibility2"] * 0.25)
            )

        def loss_fused(p):
            out = fm.apply_fused_mlp(p, CFG, pts, vd, vd2,
                                     dtype=jnp.float32)
            return (
                jnp.sum(out["rgb"] ** 2)
                + jnp.sum(out["sigma"])
                + jnp.sum(out["visibility"] * 0.5)
                + jnp.sum(out["visibility2"] * 0.25)
            )

        g_ref = jax.grad(loss_ref)(params)
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused)(params)

        flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
        flat_fused, _ = jax.tree_util.tree_flatten_with_path(g_fused)
        for (path_r, vr), (path_f, vf) in zip(flat_ref, flat_fused):
            assert path_r == path_f
            scale = np.abs(np.asarray(vr)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(vf), np.asarray(vr), atol=3e-4 * scale,
                err_msg=str(path_r),
            )

    def test_input_gradients(self, setup):
        params, pts, vd, vd2 = setup

        def loss_ref(pts_, vd_, vd2_):
            out = apply_mlp(params, CFG, pts_, vd_, vd2_)
            return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["visibility2"])

        def loss_fused(pts_, vd_, vd2_):
            out = fm.apply_fused_mlp(params, CFG, pts_, vd_, vd2_,
                                     dtype=jnp.float32)
            return jnp.sum(out["rgb"] ** 2) + jnp.sum(out["visibility2"])

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(pts, vd, vd2)
        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(pts, vd, vd2)
        for vr, vf, name in zip(g_ref, g_fused, ("pts", "vd", "vd2")):
            scale = np.abs(np.asarray(vr)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(vf), np.asarray(vr), atol=3e-4 * scale,
                err_msg=name,
            )
