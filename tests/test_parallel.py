"""Multi-device correctness: DP train-step equivalence and sharded rendering.

The reference's parallelism is torch.nn.DataParallel over the ray axis at
train AND test time (/root/reference/src/Trainer01.py:517, Tester01.py:42).
These tests assert the actual correctness property of the TPU replacement on
the 8-device virtual CPU mesh: the same math, sharded, produces the same
numbers as one device.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipnerf_tpu.infer.renderer import TiledRenderer
from vipnerf_tpu.losses import LossComputer
from vipnerf_tpu.models import get_model
from vipnerf_tpu.parallel.mesh import make_mesh, ray_sharding, replicate
from vipnerf_tpu.train.step import (
    make_optimizer,
    make_scan_train_nosd,
    make_train_step,
)
from vipnerf_tpu.train.trainer import Trainer

from tests.test_train_step import make_cache, make_gather, small_configs


class TestDataParallelEquivalence:
    def test_k_steps_sharded_match_single_device(self):
        """K train steps with the batch axis sharded over 8 devices must
        produce the same params as K steps on one device (fp32 tolerance).
        This is the DataParallel-replacement correctness property
        (reference Trainer01.py:517)."""
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        tx = make_optimizer(configs)
        cache = make_cache()
        gather = make_gather(cache)
        ts = make_train_step(configs, render_fn, lc, tx)
        scan_run = make_scan_train_nosd(configs, gather, ts, donate=False)

        key = jax.random.PRNGKey(3)
        idx_np = (
            np.random.default_rng(1).integers(0, 512, (6, 64)).astype(np.int32)
        )

        # single device: everything placed on device 0
        dev0 = jax.devices()[0]
        p1, _, s1 = scan_run(
            jax.device_put(params, dev0),
            jax.device_put(tx.init(params), dev0),
            key,
            10,
            jax.device_put(jnp.asarray(idx_np), dev0),
        )

        # 8-device mesh: params/opt replicated, index batch axis sharded
        mesh = make_mesh()
        assert mesh.size == 8
        rep = replicate(mesh)
        idx_sharded = jax.device_put(idx_np, ray_sharding(mesh, axis=1))
        assert len(idx_sharded.sharding.device_set) == 8
        p8, _, s8 = scan_run(
            jax.device_put(params, rep),
            jax.device_put(tx.init(params), rep),
            key,
            10,
            idx_sharded,
        )

        np.testing.assert_allclose(
            np.asarray(s1["TotalLoss"]), np.asarray(s8["TotalLoss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
            )

    def test_place_indices_shards_on_multi_device(self):
        """Trainer._place_indices must actually shard the batch axis when
        multiple devices are present (and fall back cleanly when the batch
        does not divide)."""
        mesh = make_mesh()
        fake = SimpleNamespace(mesh=mesh, multi_device=True)
        arr = np.arange(5 * 64, dtype=np.int32).reshape(5, 64)
        placed = Trainer._place_indices(fake, arr)
        assert len(placed.sharding.device_set) == 8
        # non-divisible batch axis: placed unsharded rather than crashing
        odd = np.arange(5 * 63, dtype=np.int32).reshape(5, 63)
        placed_odd = Trainer._place_indices(fake, odd)
        assert len(placed_odd.sharding.device_set) == 1


def _render_batch(n=300, nf=3, seed=0):
    rng = np.random.default_rng(seed)
    rays_d = (rng.normal(size=(n, 3)) - [0, 0, 3.0]).astype(np.float32)
    return {
        "rays_o": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(rays_d),
        "view_dirs": jnp.asarray(
            rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        ),
        "near": jnp.full((n, 1), 1.0),
        "far": jnp.full((n, 1), 4.0),
        # test-time secondary origins (reference Tester01.py:85-86 path)
        "rays_o2": jnp.asarray(
            rng.normal(size=(n, nf - 1, 3)).astype(np.float32)
        ),
    }


class TestShardedRendering:
    def test_sharded_render_matches_single_device(self):
        """TiledRenderer with a mesh = TiledRenderer without, bit-for-bit
        goal, fp32 tolerance (reference Tester01.py:42 DataParallel)."""
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        batch = _render_batch()

        single = TiledRenderer(render_fn, configs)
        sharded = TiledRenderer(render_fn, configs, mesh=make_mesh())
        assert sharded.mesh is not None

        for kwargs in (
            dict(single_dispatch=True),
            dict(single_dispatch=False),
            dict(single_dispatch=True, sec_views_vis=True),
        ):
            out1, _ = single.render(params, batch, chunk_size=64, **kwargs)
            out8, _ = sharded.render(params, batch, chunk_size=64, **kwargs)
            assert set(out1) == set(out8)
            for k in out1:
                np.testing.assert_allclose(
                    out1[k], out8[k], atol=1e-5, rtol=1e-5,
                    err_msg=f"key {k} kwargs {kwargs}",
                )

    def test_sharded_render_with_losses(self):
        """The eager tile path with loss computation also shards."""
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        batch = _render_batch()
        batch["target_rgb"] = jnp.asarray(
            np.random.default_rng(9).uniform(size=(300, 3)).astype(np.float32)
        )
        batch["indices_mask_nerf"] = jnp.ones((300,), bool)
        batch["num_frames"] = 3
        batch["iter_num"] = 0

        single = TiledRenderer(render_fn, configs, loss_computer=lc)
        sharded = TiledRenderer(
            render_fn, configs, loss_computer=lc, mesh=make_mesh()
        )
        out1, l1 = single.render(
            params, batch, chunk_size=64, with_losses=True, retraw=True
        )
        out8, l8 = sharded.render(
            params, batch, chunk_size=64, with_losses=True, retraw=True
        )
        for k in out1:
            np.testing.assert_allclose(out1[k], out8[k], atol=1e-5, rtol=1e-5)
        assert np.isclose(l1["TotalLoss"], l8["TotalLoss"], rtol=1e-5)

    def test_map_losses_match_eager_tiles(self):
        """Losses computed inside the lax.map single-dispatch program must
        merge to the same values (and identical loss maps) as the eager
        per-tile path — the reference's chunk-merge semantics
        (src/Trainer01.py:147-172) with one host dispatch per frame. Checked
        single-device AND mesh-sharded."""
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        batch = _render_batch()
        batch["target_rgb"] = jnp.asarray(
            np.random.default_rng(9).uniform(size=(300, 3)).astype(np.float32)
        )
        batch["indices_mask_nerf"] = jnp.ones((300,), bool)
        batch["num_frames"] = 3
        batch["iter_num"] = 0

        single = TiledRenderer(render_fn, configs, loss_computer=lc)
        sharded = TiledRenderer(
            render_fn, configs, loss_computer=lc, mesh=make_mesh()
        )
        kwargs = dict(
            chunk_size=64, with_losses=True, retraw=True,
            return_loss_maps=True,
        )
        out_eager, l_eager = single.render(
            params, batch, single_dispatch=False, **kwargs
        )
        for renderer in (single, sharded):
            out_map, l_map = renderer.render(
                params, batch, single_dispatch=True, **kwargs
            )
            for k in out_eager:
                np.testing.assert_allclose(
                    out_eager[k], out_map[k], atol=1e-5, rtol=1e-5
                )
            assert set(l_eager) == set(l_map)
            for name, val in l_eager.items():
                if isinstance(val, dict):
                    assert np.isclose(
                        val["loss_value"], l_map[name]["loss_value"],
                        rtol=1e-5, atol=1e-7,
                    ), name
                    assert set(val["loss_maps"]) == set(
                        l_map[name]["loss_maps"]
                    )
                    for mk, mv in val["loss_maps"].items():
                        assert mv.shape == (300,)
                        np.testing.assert_allclose(
                            mv, l_map[name]["loss_maps"][mk],
                            atol=1e-5, rtol=1e-5, err_msg=f"{name}/{mk}",
                        )
                else:
                    assert np.isclose(
                        val, l_map[name], rtol=1e-5, atol=1e-7
                    ), name

    def test_single_dispatch_internal_error_falls_back_to_eager(self):
        """A backend INTERNAL compile failure of the lax.map single-dispatch
        program (seen in practice: libtpu regalloc RET_CHECK on the DTU
        3-view validation render) must not kill the run: the renderer falls
        back to the eager per-tile path with identical outputs/losses, and
        subsequent calls skip the broken program without re-compiling it."""
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        batch = _render_batch()
        batch["target_rgb"] = jnp.asarray(
            np.random.default_rng(9).uniform(size=(300, 3)).astype(np.float32)
        )
        batch["indices_mask_nerf"] = jnp.ones((300,), bool)
        batch["num_frames"] = 3
        batch["iter_num"] = 0
        kwargs = dict(chunk_size=64, with_losses=True, retraw=True)

        ref = TiledRenderer(render_fn, configs, loss_computer=lc)
        out_ref, l_ref = ref.render(
            params, batch, single_dispatch=False, **kwargs
        )

        renderer = TiledRenderer(render_fn, configs, loss_computer=lc)
        key = ("single", False, True, None, False, 64, True, False)
        calls = []

        def broken_program(*a, **k):
            calls.append(1)
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: AOT PJRT error: RET_CHECK failure "
                "(regalloc/lsrav2/live_range_finder.cc:29)"
            )

        renderer._jitted[key] = broken_program
        out, losses = renderer.render(
            params, batch, single_dispatch=True, **kwargs
        )
        assert len(calls) == 1
        assert key in renderer._sd_broken and key not in renderer._jitted
        for k in out_ref:
            np.testing.assert_allclose(out_ref[k], out[k], atol=1e-6)
        assert np.isclose(l_ref["TotalLoss"], losses["TotalLoss"], rtol=1e-6)

        # Second call: straight to eager, no retry of the broken program.
        out2, _ = renderer.render(params, batch, single_dispatch=True, **kwargs)
        assert len(calls) == 1
        np.testing.assert_allclose(out["rgb_coarse"], out2["rgb_coarse"])

        # Non-INTERNAL runtime errors still propagate.
        renderer2 = TiledRenderer(render_fn, configs, loss_computer=lc)

        def oom_program(*a, **k):
            raise jax.errors.JaxRuntimeError("RESOURCE_EXHAUSTED: oom")

        renderer2._jitted[key] = oom_program
        with pytest.raises(jax.errors.JaxRuntimeError, match="RESOURCE"):
            renderer2.render(params, batch, single_dispatch=True, **kwargs)

    def test_losses_tile_size_invariant(self):
        """Pad rays are excluded from the loss and tiles merge weighted by
        real ray count, so the merged loss scalars equal the exact
        whole-frame (single-tile) values for ANY tile size — including ones
        that do not divide the ray count (round-5 ADVICE fix; previously the
        edge-duplicated pad rays biased the final tile's mean)."""
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        batch = _render_batch()
        batch["target_rgb"] = jnp.asarray(
            np.random.default_rng(9).uniform(size=(300, 3)).astype(np.float32)
        )
        batch["indices_mask_nerf"] = jnp.ones((300,), bool)
        batch["num_frames"] = 3
        batch["iter_num"] = 0

        renderer = TiledRenderer(render_fn, configs, loss_computer=lc)
        kwargs = dict(with_losses=True, retraw=True)
        # chunk 300 = one exact tile: the unbiased whole-frame reference
        _, l_exact = renderer.render(
            params, batch, chunk_size=300, single_dispatch=True, **kwargs
        )
        for chunk in (64, 100, 299):  # padding, exact division, 1-ray tail
            for sd in (True, False):
                _, l_tiled = renderer.render(
                    params, batch, chunk_size=chunk, single_dispatch=sd,
                    **kwargs,
                )
                for name, val in l_exact.items():
                    a = val["loss_value"] if isinstance(val, dict) else val
                    bv = l_tiled[name]
                    b = bv["loss_value"] if isinstance(bv, dict) else bv
                    assert np.isclose(a, b, rtol=1e-5, atol=1e-7), (
                        f"{name} chunk={chunk} single_dispatch={sd}: "
                        f"{a} vs {b}"
                    )

    def test_tile_rounding_to_mesh_multiple(self):
        """chunk_size not divisible by the mesh size still works (rounded
        down to a multiple, min one per device)."""
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        batch = _render_batch(n=100)
        sharded = TiledRenderer(render_fn, configs, mesh=make_mesh())
        out, _ = sharded.render(params, batch, chunk_size=50)
        assert out["rgb_coarse"].shape == (100, 3)


class TestSelectDevices:
    """configs['device'] honors the reference's DataParallel device-list
    contract (src/Trainer01.py:517): explicit indices pin devices,
    "all"/None selects every local device."""

    def test_all_and_none(self):
        from vipnerf_tpu.parallel.mesh import select_devices

        assert select_devices("all") == list(jax.devices())
        assert select_devices(None) == list(jax.devices())

    def test_explicit_indices_and_errors(self):
        import pytest

        from vipnerf_tpu.parallel.mesh import select_devices

        devs = jax.devices()
        assert select_devices([0]) == [devs[0]]
        assert select_devices([1, 3]) == [devs[1], devs[3]]
        assert select_devices(2) == [devs[2]]
        with pytest.raises(ValueError, match="out of range"):
            select_devices([len(devs)])

    def test_trainer_honors_device_config(self, tmp_path):
        """A Trainer configured with device=[0] must build a 1-device mesh
        even on a multi-device host (two pinned runs must not contend)."""
        from vipnerf_tpu.parallel.mesh import select_devices

        assert len(select_devices([0])) == 1
        assert len(select_devices("all")) == 8
