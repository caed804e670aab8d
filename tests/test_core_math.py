"""Unit tests for vipnerf_tpu.core: encoding, rays, poses, sampling, rendering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vipnerf_tpu.core import encoding, poses, rays, rendering, sampling


class TestPositionalEncoding:
    def test_dims(self):
        x = jnp.ones((5, 3))
        out = encoding.positional_encoding(x, 10)
        assert out.shape == (5, 63)
        assert encoding.encoding_dim(3, 10) == 63
        assert encoding.encoding_dim(3, 4) == 27

    def test_layout_and_values(self):
        # Layout: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
        x = np.array([[0.3, -0.7, 1.1]], dtype=np.float32)
        out = np.asarray(encoding.positional_encoding(jnp.asarray(x), 3))
        expected = [x[0]]
        for f in [1.0, 2.0, 4.0]:
            expected.append(np.sin(x[0] * f))
            expected.append(np.cos(x[0] * f))
        expected = np.concatenate(expected)
        np.testing.assert_allclose(out[0], expected, atol=1e-6)

    def test_degree_zero_is_identity(self):
        x = jnp.ones((2, 3))
        np.testing.assert_array_equal(encoding.positional_encoding(x, 0), x)

    @pytest.mark.parametrize("degree", [4, 10])
    def test_fast_matches_exact(self, degree):
        # The shipped fast=True option (double-angle recurrence) must match
        # the exact path within its documented ~2^degree * eps amplification.
        x = jnp.asarray(
            np.random.default_rng(0).uniform(-3, 3, (64, 3)), jnp.float32
        )
        exact = encoding.positional_encoding(x, degree, fast=False)
        fast = encoding.positional_encoding(x, degree, fast=True)
        assert fast.shape == exact.shape
        tol = 2.0**degree * np.finfo(np.float32).eps * 4
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(exact), atol=tol
        )


class TestSpherify:
    def test_spherify_ring_rig(self):
        # Inward-looking ring rig (the 360-capture case spherify exists for,
        # reference DataPreprocessor01.py:1001-1057). Unused by shipped
        # configs but part of the API surface.
        n, radius = 8, 4.0
        mats = []
        for th in np.linspace(0, 2 * np.pi, n, endpoint=False):
            eye = np.array([radius * np.cos(th), radius * np.sin(th), 0.7])
            z = eye / np.linalg.norm(eye)  # central ray toward the origin
            x = np.cross([0.0, 0.0, 1.0], z)
            x = x / np.linalg.norm(x)
            y = np.cross(z, x)
            hwf = np.array([48.0, 64.0, 50.0])
            mats.append(
                np.concatenate(
                    [np.stack([x, y, -z], 1), eye[:, None], hwf[:, None]], 1
                )
            )
        c2w = np.stack(mats)  # (n, 3, 5)
        bds = np.array([2.0, 8.0])

        poses_reset, render_poses, new_bds = poses.spherify_poses(c2w, bds)

        # shapes preserve the 5-column layout; 120 render poses
        assert poses_reset.shape == (n, 3, 5)
        assert render_poses.shape == (120, 3, 5)
        # radius normalization: RMS camera distance is exactly 1
        rms = np.sqrt(np.mean(np.sum(poses_reset[:, :3, 3] ** 2, -1)))
        np.testing.assert_allclose(rms, 1.0, rtol=1e-6)
        # bounds scale by the same factor as the cameras
        orig_rms = np.sqrt(np.mean(np.sum(c2w[:, :3, 3] ** 2, -1)))
        np.testing.assert_allclose(new_bds, bds / orig_rms, rtol=1e-2)
        # render path lies on a circle of constant height and radius
        origins = render_poses[:, :3, 3]
        np.testing.assert_allclose(
            origins[:, 2], origins[0, 2], atol=1e-8
        )
        r2d = np.linalg.norm(origins[:, :2], axis=1)
        np.testing.assert_allclose(r2d, r2d[0], rtol=1e-6)
        # hwf column carried through from the input
        np.testing.assert_allclose(
            render_poses[:, :, 4], np.tile(c2w[0, :, 4], (120, 1))
        )
        # render cameras look inward: viewing dir (-z col of c2w) points
        # from the origin toward... the camera z-axis equals the normalized
        # camera origin (reference construction), i.e. cameras face the
        # center through their -z
        np.testing.assert_allclose(
            render_poses[:, :3, 2],
            origins / np.linalg.norm(origins, axis=1, keepdims=True),
            atol=1e-6,
        )


class TestRays:
    def test_principal_ray_looks_down_minus_z(self):
        intrinsic = jnp.asarray(
            [[100.0, 0, 16.0], [0, 100.0, 12.0], [0, 0, 1.0]]
        )
        c2w = jnp.eye(4)
        rays_o, rays_d = rays.get_rays(24, 32, intrinsic, c2w)
        # Pixel at the principal point: direction (0, 0, -1) after y/z flip
        np.testing.assert_allclose(rays_d[12, 16], [0.0, 0.0, -1.0], atol=1e-6)
        np.testing.assert_allclose(rays_o, np.zeros((24, 32, 3)), atol=1e-6)

    def test_rays_rotate_with_pose(self):
        intrinsic = jnp.asarray([[50.0, 0, 8.0], [0, 50.0, 8.0], [0, 0, 1.0]])
        # 90 deg rotation about x and a translation
        c2w = jnp.asarray(
            [
                [1.0, 0, 0, 1.0],
                [0, 0, -1, 2.0],
                [0, 1, 0, 3.0],
                [0, 0, 0, 1.0],
            ]
        )
        rays_o, rays_d = rays.get_rays(16, 16, intrinsic, c2w)
        np.testing.assert_allclose(rays_o[0, 0], [1.0, 2.0, 3.0], atol=1e-6)
        # center dir in camera frame (0,0,-1) -> world: R @ (0,0,-1) = (0,1,0)
        np.testing.assert_allclose(rays_d[8, 8], [0.0, 1.0, 0.0], atol=1e-6)

    def test_view_dirs_unit_norm(self):
        d = jnp.asarray([[3.0, 4.0, 0.0], [0.0, 0.0, -2.0]])
        v = rays.get_view_dirs(d)
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)

    def test_ndc_origin_on_near_plane(self):
        # A ray starting behind the near plane, looking along -z
        rays_o = jnp.asarray([[0.5, -0.2, 0.0]])
        rays_d = jnp.asarray([[0.0, 0.0, -1.0]])
        o_ndc, d_ndc = rays.get_ndc_rays(
            rays_o, rays_d, 100, 100, 50.0, 50.0, near=1.0
        )
        # After shifting to the near plane oz = -near -> o2 = 1 + 2*1/(-1) = -1
        np.testing.assert_allclose(o_ndc[0, 2], -1.0, atol=1e-6)
        # d2 = -2*near/oz = 2
        np.testing.assert_allclose(d_ndc[0, 2], 2.0, atol=1e-6)

    def test_ndc_depth_roundtrip(self):
        rng = np.random.default_rng(0)
        rays_o = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        rays_d = jnp.asarray(
            (rng.normal(size=(10, 3)) - [0, 0, 3.0]).astype(np.float32)
        )
        depths = jnp.asarray(
            rng.uniform(2.0, 50.0, size=(10, 1)).astype(np.float32)
        )
        z_ndc = rays.depth_to_ndc(depths, rays_o, rays_d, near=1.0)
        back = rays.depth_from_ndc(z_ndc, rays_o, rays_d, near=1.0)
        np.testing.assert_allclose(np.asarray(back), np.asarray(depths), rtol=1e-3)

    def test_ndc_z_to_ray_t_matches_depth_from_ndc(self):
        rng = np.random.default_rng(1)
        rays_o = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        rays_d = jnp.asarray(
            (rng.normal(size=(4, 3)) - [0, 0, 3.0]).astype(np.float32)
        )
        z_ndc = jnp.asarray(
            rng.uniform(0.05, 0.9, size=(4, 7)).astype(np.float32)
        )
        t1 = rays.ndc_z_to_ray_t(z_ndc, rays_o, rays_d)
        t2 = rays.depth_from_ndc(z_ndc, rays_o, rays_d)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-3)


class TestPoses:
    def _random_w2c(self, rng, n):
        mats = []
        for _ in range(n):
            q = rng.normal(size=4)
            q = q / np.linalg.norm(q)
            w, x, y, z = q
            r = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                    [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                    [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                ]
            )
            t = rng.normal(size=(3, 1))
            m = np.eye(4)
            m[:3, :3] = r
            m[:3, 3:] = t
            mats.append(m)
        return np.stack(mats)

    def test_coordinate_flip_is_involution(self):
        rng = np.random.default_rng(3)
        p = self._random_w2c(rng, 5)
        flipped = poses.convert_pose_to_standard_coordinates(p)
        back = poses.convert_pose_to_standard_coordinates(flipped)
        np.testing.assert_allclose(back, p, atol=1e-10)

    def test_recenter_single_pose_gives_identity_center(self):
        rng = np.random.default_rng(4)
        p = self._random_w2c(rng, 1)
        avg = poses.compute_average_pose(p)
        rec = poses.recenter_poses(p, avg)
        # The camera center of the recentered pose sits at the origin and
        # the rotation is orthonormal.
        np.testing.assert_allclose(rec[0, :3, 3], 0.0, atol=1e-8)
        np.testing.assert_allclose(
            rec[0, :3, :3] @ rec[0, :3, :3].T, np.eye(3), atol=1e-8
        )

    def test_preprocess_train_scaling(self):
        rng = np.random.default_rng(5)
        p = self._random_w2c(rng, 3)
        bounds = np.array([2.0, 10.0])
        out = poses.preprocess_poses(
            p, train_mode=True, bounds=bounds, bd_factor=0.75, recenter=True
        )
        sc = 1.0 / (2.0 * 0.75)
        assert out["sc"] == pytest.approx(sc)
        np.testing.assert_allclose(out["bounds"], bounds * sc)
        assert out["poses"].shape == (3, 4, 4)
        assert out["poses"].dtype == np.float32

    def test_preprocess_test_mode_matches_train_mode(self):
        rng = np.random.default_rng(6)
        p = self._random_w2c(rng, 4)
        bounds = np.array([1.5, 9.0])
        train_out = poses.preprocess_poses(
            p, train_mode=True, bounds=bounds, bd_factor=0.75, recenter=True
        )
        test_out = poses.preprocess_poses(
            p,
            train_mode=False,
            translation_scale=train_out["sc"],
            average_pose=train_out["average_pose"],
        )
        np.testing.assert_allclose(
            test_out["poses"], train_out["poses"], atol=1e-6
        )


class TestSampling:
    def test_coarse_linear(self):
        near = jnp.full((4, 1), 2.0)
        far = jnp.full((4, 1), 6.0)
        z = sampling.coarse_z_vals(near, far, 5)
        np.testing.assert_allclose(
            np.asarray(z[0]), [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6
        )

    def test_coarse_lindisp(self):
        near = jnp.full((1, 1), 1.0)
        far = jnp.full((1, 1), 4.0)
        z = sampling.coarse_z_vals(near, far, 3, lindisp=True)
        # disparity midpoint: 1/(0.5*(1 + 0.25)) = 1.6
        np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.6, 4.0], atol=1e-5)

    def test_coarse_perturb_within_intervals(self):
        near = jnp.full((16, 1), 1.0)
        far = jnp.full((16, 1), 2.0)
        key = jax.random.PRNGKey(0)
        z = sampling.coarse_z_vals(near, far, 8, perturb=True, key=key)
        z = np.asarray(z)
        assert (z >= 1.0 - 1e-6).all() and (z <= 2.0 + 1e-6).all()
        assert (np.diff(z, axis=-1) > -1e-6).all()
        # and actually different from the deterministic grid
        det = np.asarray(sampling.coarse_z_vals(near, far, 8))
        assert np.abs(z - det).max() > 1e-3

    def test_sample_pdf_uniform_weights(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (4, 9))
        weights = jnp.ones((4, 8))
        samples = sampling.sample_pdf(bins, weights, 100, det=True)
        s = np.asarray(samples)
        # uniform pdf -> quantiles match the u grid
        np.testing.assert_allclose(s[0], np.linspace(0, 1, 100), atol=0.02)

    def test_sample_pdf_concentrates_on_peak(self):
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
        weights = np.full((1, 10), 1e-4, np.float32)
        weights[0, 6] = 1.0  # peak in bin [0.6, 0.7]
        samples = sampling.sample_pdf(
            bins, jnp.asarray(weights), 64, det=False, key=jax.random.PRNGKey(1)
        )
        s = np.asarray(samples)
        frac_in_peak = np.mean((s >= 0.6) & (s <= 0.7))
        assert frac_in_peak > 0.9

    def test_fine_merge_sorted_and_stopgrad(self):
        z_coarse = jnp.broadcast_to(jnp.linspace(1.0, 2.0, 8), (2, 8))
        weights = jnp.ones((2, 8))
        z_fine = sampling.fine_z_vals(z_coarse, weights, 16)
        z = np.asarray(z_fine)
        assert z.shape == (2, 24)
        assert (np.diff(z, axis=-1) >= -1e-6).all()

        # fine z-vals must not propagate gradients into weights
        def f(w):
            return jnp.sum(sampling.fine_z_vals(z_coarse, w, 16))

        g = jax.grad(f)(weights)
        np.testing.assert_allclose(np.asarray(g), 0.0)


class TestVolumeRendering:
    def test_exclusive_cumprod(self):
        x = jnp.asarray([[2.0, 3.0, 4.0]])
        out = np.asarray(rendering.exclusive_cumprod(x))
        np.testing.assert_allclose(out, [[1.0, 2.0, 6.0]])

    def test_opaque_sample_dominates(self):
        nr, ns = 2, 8
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, ns), (nr, ns))
        rays_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (nr, 3))
        rgb = jnp.zeros((nr, ns, 3)).at[:, 3].set(jnp.asarray([1.0, 0.5, 0.25]))
        sigma = jnp.zeros((nr, ns)).at[:, 3].set(1e6)
        out = rendering.volume_rendering(rgb, sigma, z_vals=z, rays_d=rays_d)
        np.testing.assert_allclose(
            np.asarray(out["rgb"][0]), [1.0, 0.5, 0.25], atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(out["acc"]), 1.0, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["depth"][0]), np.asarray(z[0, 3]), atol=1e-3
        )
        np.testing.assert_allclose(np.asarray(out["depth_var"][0]), 0.0, atol=1e-3)

    def test_empty_space_white_background(self):
        nr, ns = 3, 4
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, ns), (nr, ns))
        rays_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (nr, 3))
        rgb = jnp.full((nr, ns, 3), 0.7)
        sigma = jnp.zeros((nr, ns))
        out = rendering.volume_rendering(
            rgb, sigma, z_vals=z, rays_d=rays_d, white_bkgd=True
        )
        np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-5)

    def test_matches_manual_numpy(self):
        rng = np.random.default_rng(7)
        nr, ns = 5, 16
        z = np.sort(rng.uniform(1, 5, (nr, ns)).astype(np.float32), axis=-1)
        d = rng.normal(size=(nr, 3)).astype(np.float32)
        rgb = rng.uniform(size=(nr, ns, 3)).astype(np.float32)
        sigma = rng.uniform(0, 3, (nr, ns)).astype(np.float32)

        out = rendering.volume_rendering(
            jnp.asarray(rgb), jnp.asarray(sigma), z_vals=jnp.asarray(z),
            rays_d=jnp.asarray(d),
        )

        z1 = np.concatenate([z, np.full((nr, 1), 1e10, np.float32)], -1)
        delta = (z1[:, 1:] - z1[:, :-1]) * np.linalg.norm(d, axis=-1, keepdims=True)
        alpha = 1 - np.exp(-sigma * delta)
        trans = np.cumprod(
            np.concatenate([np.ones((nr, 1)), 1 - alpha + 1e-10], -1), -1
        )[:, :-1]
        weights = alpha * trans
        rgb_map = (weights[..., None] * rgb).sum(-2)
        acc = weights.sum(-1)
        depth = (weights * z).sum(-1) / (acc + 1e-6)

        np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_map, rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["weights"]), weights, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["depth"]), depth, rtol=2e-4, atol=1e-5)

    def test_visibility2_aggregation(self):
        nr, ns, nf1 = 2, 6, 3
        z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, ns), (nr, ns))
        rays_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (nr, 3))
        rgb = jnp.zeros((nr, ns, 3))
        sigma = jnp.full((nr, ns), 2.0)
        vis2 = jnp.full((nr, ns, nf1, 1), 0.5)
        out = rendering.volume_rendering(
            rgb, sigma, z_vals=z, rays_d=rays_d, visibility2=vis2
        )
        assert out["visibility2"].shape == (nr, nf1)
        # constant per-point visibility -> pixel visibility ~ 0.5 * acc/(acc+eps)
        np.testing.assert_allclose(np.asarray(out["visibility2"]), 0.5, atol=1e-3)


class TestPreprocessPosesValidation:
    def test_test_mode_requires_average_pose(self):
        from vipnerf_tpu.core.poses import preprocess_poses

        w2c = np.stack([np.eye(4, dtype=np.float64)] * 3)
        with pytest.raises(ValueError, match="average_pose"):
            preprocess_poses(w2c, train_mode=False)

    def test_spherify_requires_bounds(self):
        from vipnerf_tpu.core.poses import preprocess_poses

        w2c = np.stack([np.eye(4, dtype=np.float64)] * 3)
        with pytest.raises(ValueError, match="bounds"):
            preprocess_poses(w2c, train_mode=True, bounds=None, spherify=True)
