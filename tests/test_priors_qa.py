"""Tests for prior generators and QA metrics."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vipnerf_tpu.priors import colmap_io
from vipnerf_tpu.priors.visibility import (
    compute_visibility_weights,
    get_depth_planes,
)
from vipnerf_tpu.qa import metrics


class TestVisibilityPrior:
    def test_depth_planes_inverse_and_linear(self):
        inv = get_depth_planes(1.0, 10.0, 5)
        np.testing.assert_allclose(inv[0], 1.0)
        np.testing.assert_allclose(inv[-1], 10.0)
        # inverse-linspace: midpoints cluster near the camera
        assert inv[2] < 5.5 / 2 + 1

        lin = get_depth_planes(1.0, 10.0, 5, linear=True)
        np.testing.assert_allclose(lin, np.linspace(1, 10, 5))

    def test_identity_pair_gives_full_visibility(self):
        # Same camera, same image: zero photometric error -> weights ~= 1
        rng = np.random.default_rng(0)
        frame = rng.uniform(0, 255, (24, 32, 3)).astype(np.float32)
        e = np.eye(4, dtype=np.float32)
        k = np.array([[30.0, 0, 16], [0, 30.0, 12], [0, 0, 1]], np.float32)
        planes = jnp.asarray(get_depth_planes(1.0, 5.0, 8), jnp.float32)
        weights = np.asarray(
            compute_visibility_weights(
                jnp.asarray(frame), jnp.asarray(frame), jnp.asarray(e),
                jnp.asarray(e), jnp.asarray(k), jnp.asarray(k), planes, 10.0
            )
        )
        np.testing.assert_allclose(weights, 1.0, atol=1e-3)

    def test_translated_plane_recovered(self):
        """A fronto-parallel textured plane at depth D seen from two shifted
        cameras: the PSV at plane D aligns perfectly -> weights ~= 1 in the
        overlapping region."""
        rng = np.random.default_rng(1)
        h, w = 32, 48
        f = 40.0
        k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
        depth = 2.0
        baseline = 0.2
        # texture on the plane: sample a smooth random field
        tex = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        import scipy.ndimage

        tex = scipy.ndimage.gaussian_filter(tex, sigma=(2, 2, 0))

        # camera 2 shifted by `baseline` along +x; for a plane at depth d the
        # image shifts by f*baseline/d pixels. Render frame2 by sampling tex.
        shift = f * baseline / depth
        frame1 = tex
        frame2 = np.zeros_like(tex)
        xs = np.arange(w)
        src = xs + shift  # pixel x in frame1 that lands at x in frame2
        x0 = np.floor(src).astype(int)
        frac = src - x0
        valid = (x0 >= 0) & (x0 + 1 < w)
        f2 = (1 - frac[None, :, None]) * tex[:, np.clip(x0, 0, w - 1)] + \
            frac[None, :, None] * tex[:, np.clip(x0 + 1, 0, w - 1)]
        frame2[:, valid] = f2[:, valid]

        e1 = np.eye(4, dtype=np.float32)
        e2 = np.eye(4, dtype=np.float32)
        e2[0, 3] = -baseline  # w2c: world point shifts by -baseline in cam2
        planes = jnp.asarray(
            get_depth_planes(1.0, 4.0, 64), jnp.float32
        )
        weights = np.asarray(
            compute_visibility_weights(
                jnp.asarray(frame1), jnp.asarray(frame2), jnp.asarray(e1),
                jnp.asarray(e2), jnp.asarray(k), jnp.asarray(k), planes, 10.0
            )
        )
        # interior region (away from the disoccluded border) should be
        # confidently visible
        interior = weights[4:-4, 8 : w - 8]
        assert np.mean(interior > 0.5) > 0.95


class TestColmapIO:
    def test_quaternion_roundtrip(self):
        rng = np.random.default_rng(2)
        for _ in range(10):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            if q[0] < 0:
                q = -q
            r = colmap_io.qvec2rotmat(q)
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)
            q2 = colmap_io.rotmat2qvec(r)
            if q2[0] < 0:
                q2 = -q2
            np.testing.assert_allclose(q2, q, atol=1e-8)

    def test_binary_readers(self, tmp_path):
        import struct

        # hand-craft a cameras.bin with one PINHOLE camera
        with open(tmp_path / "cameras.bin", "wb") as fh:
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<iiQQ", 1, 1, 640, 480))
            fh.write(struct.pack("<4d", 500.0, 500.0, 320.0, 240.0))
        cams = colmap_io.read_cameras_binary(tmp_path / "cameras.bin")
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 640
        np.testing.assert_allclose(cams[1].params, [500, 500, 320, 240])

        # images.bin with one image, two 2D points
        with open(tmp_path / "images.bin", "wb") as fh:
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<idddddddi", 7, 1.0, 0.0, 0.0, 0.0,
                                 0.5, -0.5, 2.0, 1))
            fh.write(b"0001.png\x00")
            # COLMAP's 2D-point record is x(double), y(double), id(INT64)
            # ('ddq', reference colmap_read_model.py:191-192) — a regression
            # here once encoded 'ddd' and masked a reader mis-parse
            fh.write(struct.pack("<Q", 2))
            fh.write(struct.pack("<ddq", 10.0, 20.0, 55))
            fh.write(struct.pack("<ddq", 30.0, 40.0, -1))
        ims = colmap_io.read_images_binary(tmp_path / "images.bin")
        im = ims[7]
        assert im.name == "0001.png"
        np.testing.assert_allclose(im.qvec, [1, 0, 0, 0])
        np.testing.assert_allclose(im.xys, [[10, 20], [30, 40]])
        np.testing.assert_array_equal(im.point3d_ids, [55, -1])
        np.testing.assert_allclose(im.qvec2rotmat(), np.eye(3))

        # points3D.bin with one point tracked in one image
        with open(tmp_path / "points3D.bin", "wb") as fh:
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<QdddBBBd", 55, 1.0, 2.0, 3.0, 255, 0, 0, 0.7))
            fh.write(struct.pack("<Q", 1))
            fh.write(struct.pack("<ii", 7, 0))
        pts = colmap_io.read_points3d_binary(tmp_path / "points3D.bin")
        np.testing.assert_allclose(pts[55].xyz, [1, 2, 3])
        assert pts[55].error == pytest.approx(0.7)
        np.testing.assert_array_equal(pts[55].image_ids, [7])


class TestQaMetrics:
    def test_psnr_rmse_basics(self):
        gt = np.full((16, 16, 3), 100, np.uint8)
        pred = np.full((16, 16, 3), 110, np.uint8)
        assert metrics.compute_rmse(gt, pred) == pytest.approx(10.0)
        assert metrics.compute_psnr(gt, pred) == pytest.approx(
            10 * np.log10(255 ** 2 / 100.0)
        )

    def test_masked_metrics(self):
        gt = np.zeros((16, 16, 3), np.uint8)
        pred = np.zeros((16, 16, 3), np.uint8)
        pred[:8] = 10  # error only in the top half
        mask = np.zeros((16, 16), bool)
        mask[8:] = True  # mask selects the clean half
        assert metrics.compute_rmse(gt, pred, mask) == pytest.approx(0.0)
        mask_top = ~mask
        assert metrics.compute_rmse(gt, pred, mask_top) == pytest.approx(10.0)

    def test_ssim_identity_and_degradation(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        assert metrics.compute_ssim(img, img) == pytest.approx(1.0)
        noisy = np.clip(
            img.astype(int) + rng.normal(0, 25, img.shape), 0, 255
        ).astype(np.uint8)
        very_noisy = np.clip(
            img.astype(int) + rng.normal(0, 80, img.shape), 0, 255
        ).astype(np.uint8)
        s1 = metrics.compute_ssim(img, noisy)
        s2 = metrics.compute_ssim(img, very_noisy)
        assert 0 < s2 < s1 < 1

    def test_ssim_known_value_regression(self):
        # Golden regression: constant-vs-gradient SSIM, locked to the
        # skimage-parameterized algorithm's output.
        gt = np.tile(np.arange(64, dtype=np.uint8)[None] * 4, (64, 1))[..., None]
        gt = np.repeat(gt, 3, axis=2)
        pred = np.clip(gt.astype(int) + 20, 0, 255).astype(np.uint8)
        val = metrics.compute_ssim(gt, pred)
        # uniform +20 offset: structure identical, luminance shifted
        assert 0.7 < val < 1.0
