"""Edge-path coverage: config merge semantics, visibility-weights prior
cache, NDC sparse-depth cache, and DTU masked QA end-to-end.

These are the paths VERDICT round 1 flagged as implemented-but-untested:
- save_configs / save_test_configs merge behavior (reference
  Trainer01.py:440-473, Tester01.py:110-138)
- visibility_prior.load_weights cache + loss consumption
  (DataPreprocessor01.py:465-487, VisibilityPriorLoss01.py:36-44)
- NDC sparse-depth conversion cache (DataPreprocessor01.py:432-447)
- DTU masked metrics over ObjectMasks (qa/05..08_Masked*).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from vipnerf_tpu.data.synthetic import (
    make_dtu_scene,
    write_synthetic_database,
)


def _llff_config(root: Path, **dl_overrides):
    dl = {
        "data_loader_name": "NerfLlffDataLoader01",
        "data_preprocessor_name": "DataPreprocessor01",
        "train_set_num": 2,
        "scene_names": ["synth01"],
        "scene_id": "synth01",
        "resolution_suffix": "",
        "recenter_camera_poses": True,
        "bd_factor": 0.75,
        "spherify": False,
        "ndc": False,
        "batching": True,
        "downsampling_factor": 1,
        "num_rays": 64,
        "precrop_fraction": 1,
        "precrop_iterations": -1,
        "visibility_prior": {
            "load_masks": True,
            "load_weights": False,
            "masks_dirname": "VW02",
        },
        "sparse_depth": {"dirname": "DE02", "num_rays": 32},
    }
    dl.update(dl_overrides)
    return {
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "root_dirpath": str(root),
        "data_loader": dl,
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": {
                "num_samples": 8, "netdepth": 2, "netwidth": 16,
                "points_positional_encoding_degree": 2,
                "views_positional_encoding_degree": 1,
                "use_view_dirs": True, "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            "chunk": 4096, "lindisp": False, "netchunk": 16384,
            "perturb": True, "raw_noise_std": 0.0, "white_bkgd": False,
        },
        "losses": [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityPriorLoss01", "weight": 0.001},
        ],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4, "lr_decay": 250,
            "beta1": 0.9, "beta2": 0.999,
        },
        "num_iterations": 10,
        "seed": 0,
    }


@pytest.fixture(scope="module")
def llff_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("edges")
    write_synthetic_database(
        root / "data/databases",
        scene_name="synth01",
        num_frames=6,
        train_frames=(0, 5),
        val_frames=(2,),
        height=24,
        width=32,
    )
    return root


class TestConfigMergeSemantics:
    def test_save_configs_inherits_and_extends(self, tmp_path):
        from vipnerf_tpu.utils.config import save_configs

        first = {
            "train_num": 3,
            "seed": 42,
            "num_iterations": 100,
            "data_loader": {"scene_names": ["a"]},
            "root_dirpath": "/somewhere",
            "device": [0],
        }
        save_configs(tmp_path, dict(first))
        on_disk = json.loads((tmp_path / "Configs.json").read_text())
        assert "root_dirpath" not in on_disk
        assert on_disk["seed"] == 42

        # Resume attempt: new scenes, longer run, different seed -> seed is
        # INHERITED from disk, scene lists merge, num_iterations extends.
        second = {
            "train_num": 3,
            "seed": 7,
            "num_iterations": 200,
            "data_loader": {"scene_names": ["b"]},
            "device": [1],
        }
        merged = save_configs(tmp_path, second)
        assert merged is second  # in-place merge, reference semantics
        assert merged["seed"] == 42
        assert merged["data_loader"]["scene_names"] == ["a", "b"]
        assert merged["num_iterations"] == 200
        on_disk = json.loads((tmp_path / "Configs.json").read_text())
        assert on_disk["num_iterations"] == 200
        assert on_disk["data_loader"]["scene_names"] == ["a", "b"]

    def test_save_test_configs_scene_merge(self, tmp_path):
        from vipnerf_tpu.infer.tester import save_test_configs

        save_test_configs(
            tmp_path,
            {"test_num": 2, "scene_names": ["x"], "train_num": 1,
             "root_dirpath": "/r"},
        )
        on_disk = json.loads((tmp_path / "Configs.json").read_text())
        assert "root_dirpath" not in on_disk
        save_test_configs(
            tmp_path, {"test_num": 2, "scene_names": ["y"], "device": [0]}
        )
        on_disk = json.loads((tmp_path / "Configs.json").read_text())
        assert on_disk["scene_names"] == ["x", "y"]
        assert on_disk["train_num"] == 1  # inherited


class TestVisibilityWeightsPrior:
    def test_weights_cache_and_loss_path(self, llff_db):
        import jax
        import jax.numpy as jnp

        from vipnerf_tpu.data import get_data_loader, get_data_preprocessor
        from vipnerf_tpu.losses import LossComputer
        from vipnerf_tpu.models import get_model

        configs = _llff_config(
            llff_db,
            visibility_prior={
                "load_masks": False,
                "load_weights": True,
                "weights_dirname": "VW02",
            },
        )
        loader = get_data_loader(
            configs, llff_db / "data/databases/NeRF_LLFF/data", mode="train"
        )
        raw = loader.load_data()
        assert "weights" in raw["visibility_prior_data"]
        prep = get_data_preprocessor(configs, mode="train", raw_data_dict=raw)
        assert "visibility_prior_weights" in prep.cache
        assert "visibility_prior_masks" not in prep.cache
        n, h, w = 2, 24, 32  # 2 train frames
        assert prep.cache["visibility_prior_weights"].shape == (n * h * w, 1)
        # loader wrote weights = fg * 0.9 + 0.05 (synthetic db contract;
        # the shell scene makes every pixel foreground -> 0.95)
        vals = np.unique(np.asarray(prep.cache["visibility_prior_weights"]))
        assert np.all(
            np.isclose(vals, 0.95, atol=1e-6) | np.isclose(vals, 0.05, atol=1e-6)
        )

        # The weights flow into the batch and the VisibilityPriorLoss
        # weights-mode branch produces a finite nonzero loss.
        batch = prep.get_next_batch(0)
        assert "visibility_prior_weights" in batch
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        outputs = render_fn(
            params, configs, batch, train=True, rng=jax.random.PRNGKey(1)
        )
        losses = LossComputer(configs).compute_losses(batch, outputs)
        val = float(losses["VisibilityPriorLoss01"]["loss_value"])
        assert np.isfinite(val) and val > 0


class TestNdcSparseDepthCache:
    def test_cache_values_roundtrip(self, llff_db):
        import jax.numpy as jnp

        from vipnerf_tpu.core.rays import depth_from_ndc
        from vipnerf_tpu.data import get_data_loader, get_data_preprocessor

        configs = _llff_config(llff_db, ndc=True)
        loader = get_data_loader(
            configs, llff_db / "data/databases/NeRF_LLFF/data", mode="train"
        )
        prep = get_data_preprocessor(
            configs, mode="train", raw_data_dict=loader.load_data()
        )
        vals = np.asarray(prep.cache["sparse_depth_values"])[:, 0]
        ndc_vals = np.asarray(prep.cache["sparse_depth_values_ndc"])[:, 0]
        valid = vals != -1
        assert valid.any() and (~valid).any()
        # invalid entries stay -1 in the NDC cache too
        assert np.all(ndc_vals[~valid] == -1)
        assert np.all(ndc_vals[valid] >= 0) and np.all(ndc_vals[valid] <= 1)
        # NDC depths invert back to the metric depths through the same rays
        rays_o = np.asarray(prep.cache["rays_o"])[valid]
        rays_d = np.asarray(prep.cache["rays_d"])[valid]
        back = np.asarray(
            depth_from_ndc(
                jnp.asarray(ndc_vals[valid][:, None]),
                jnp.asarray(rays_o),
                jnp.asarray(rays_d),
                near=1.0,  # the reference's hardcoded NDC near
            )
        )[:, 0]
        assert np.allclose(back, vals[valid], rtol=1e-3, atol=1e-3)


class TestDtuMaskedQa:
    def test_masked_metrics_end_to_end(self, tmp_path):
        from vipnerf_tpu.qa import run_all_qa
        from vipnerf_tpu.utils.io import read_image, save_image

        db_root = tmp_path / "data/databases"
        dtu_scene, dtu_ring = make_dtu_scene()
        gt = write_synthetic_database(
            db_root,
            dataset="DTU",
            scene_name="1",
            num_frames=4,
            train_frames=(0, 3),
            val_frames=(),
            height=24,
            width=32,
            scene=dtu_scene,
            **dtu_ring,
        )
        db_dir = db_root / "DTU/data"
        # DTU scene dirs are zero-padded numbers — the writer now applies
        # utils/naming.scene_dirname itself
        scene_dir05 = db_dir / "all/database_data/00001"
        assert scene_dir05.is_dir()

        # object masks: the nearer ~40% of each frame (geometry-relative —
        # the DTU-contract scene keeps ALL depths inside [0.1, 5], so an
        # absolute threshold would mask everything and leave no "outside"
        # region for the unmasked metrics to see)
        masks_dir = scene_dir05 / "ObjectMasks"
        masks_dir.mkdir()
        rng = np.random.default_rng(0)
        test_frames = [1, 2]
        for f in range(4):
            thresh = np.percentile(gt["depths"][f], 40)
            mask = (gt["depths"][f] < thresh).astype(np.uint8) * 255
            save_image(masks_dir / f"{f:04}.png", mask)

        # predictions: heavy noise outside the mask, near-perfect (+-1 LSB,
        # avoids an infinite masked PSNR) inside
        pred_root = tmp_path / "runs/testing/test0001"
        pred_dir = pred_root / "00001/predicted_frames"
        pred_dir.mkdir(parents=True)
        for f in test_frames:
            img = gt["images"][f].astype(np.int32)
            img = np.clip(img + rng.integers(-1, 2, img.shape), 0, 255)
            img = img.astype(np.uint8)
            mask = np.asarray(read_image(masks_dir / f"{f:04}.png"))
            mask2 = mask if mask.ndim == 2 else mask[..., 0]
            noise = rng.integers(0, 255, img.shape, dtype=np.uint8)
            img = np.where((mask2 > 127)[..., None], img, noise)
            save_image(pred_dir / f"{f:04}.png", img)

        frames_csv = db_dir / "train_test_sets/set02/TestVideosData.csv"
        results = run_all_qa(
            "DTU", pred_root, db_dir, frames_csv,
            mask_folder_name="ObjectMasks",
        )
        # masked metrics see only the near-perfect masked region
        assert results["MaskedRMSE"] < 2
        assert results["MaskedPSNR"] > 40
        # unmasked metrics see the noise
        assert results["RMSE"] > 10
        scores = json.loads((pred_root / "QA_Scores.json").read_text())
        for name in ("MaskedRMSE05", "MaskedPSNR05", "MaskedSSIM05",
                     "RMSE05", "PSNR05", "SSIM05"):
            assert name in scores["predicted_frames"]
        for name in ("MaskedRMSE05", "MaskedPSNR05"):
            csv = (
                pred_root
                / f"QA_Scores/predicted_frames/{name}_FrameWise.csv"
            )
            assert csv.exists()
            scene_csv = (
                pred_root
                / f"QA_Scores/predicted_frames/{name}_SceneWise.csv"
            )
            assert scene_csv.exists()


class TestUncachedBatching:
    """batching=False: the reference's unmaintained no-cache mode
    (DataPreprocessor01.py:726-772) — random rays from one image per
    iteration, regenerated on the fly."""

    def test_uncached_batch_contract_and_render(self, llff_db):
        import jax
        import jax.numpy as jnp

        from vipnerf_tpu.data import get_data_loader, get_data_preprocessor
        from vipnerf_tpu.models import get_model

        configs = _llff_config(llff_db, batching=False, ndc=True)
        loader = get_data_loader(
            configs, llff_db / "data/databases/NeRF_LLFF/data", mode="train"
        )
        prep = get_data_preprocessor(
            configs, mode="train", raw_data_dict=loader.load_data()
        )
        nr = configs["data_loader"]["num_rays"]
        batch = prep.get_next_batch(0)
        assert batch["rays_o"].shape == (nr, 3)
        assert batch["target_rgb"].shape == (nr, 3)
        assert bool(jnp.all(batch["indices_mask_nerf"]))
        for key in ("rays_o_ndc", "rays_d_ndc", "near_ndc", "far_ndc"):
            assert key in batch  # ndc mode populated
        # full-image request returns scanline order of that frame
        full = prep.get_next_batch(0, image_num=5)
        h, w = prep.resolution
        assert full["rays_o"].shape == (h * w, 3)
        # the regenerated rays render through the model end to end —
        # INCLUDING the secondary-view visibility path, which needs the
        # poses + per-ray pixel_id the uncached batch must supply
        assert batch["pixel_id"].shape == (nr, 3)
        assert "poses" in batch
        init_fn, render_fn = get_model(configs)
        params = init_fn(jax.random.PRNGKey(0), configs)
        out = render_fn(
            params, configs, batch, train=False, sec_views_vis=True,
            retraw=True,
        )
        rgb_key = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
        assert np.isfinite(np.asarray(out[rgb_key])).all()
        vis_key = (
            "visibility2_fine" if "visibility2_fine" in out
            else "visibility2_coarse"
        )
        assert np.isfinite(np.asarray(out[vis_key])).all()


class TestPreprocessorEdgeFixes:
    """Regressions from the round-3 core-module review: sparse-depth
    scatter under downsampling, precrop resume, epoch-wrap aliasing, and
    mip-NeRF half-pixel alignment at inference."""

    def _prep(self, root, **dl_overrides):
        from vipnerf_tpu.data import get_data_loader, get_data_preprocessor

        configs = _llff_config(root, **dl_overrides)
        loader = get_data_loader(
            configs, root / "data/databases/NeRF_LLFF/data", mode="train"
        )
        return get_data_preprocessor(
            configs, mode="train", raw_data_dict=loader.load_data()
        )

    def test_downsampled_sparse_depth_edge_feature(self, llff_db):
        """A COLMAP feature near the image edge must not index out of the
        downsampled grid (x=31.9 at factor 2 rounds to 16 == w)."""
        sd_csv = (
            llff_db / "data/databases/NeRF_LLFF/data/all/estimated_depths"
            "/DE02/synth01/estimated_depths/0000.csv"
        )
        original = sd_csv.read_text()
        try:
            sd_csv.write_text(original + "31.9,23.9,3.0,0.5\n")
            prep = self._prep(llff_db, downsampling_factor=2)
            assert tuple(prep.resolution) == (12, 16)
            assert prep._indices_sd.size > 0  # cache built, no IndexError
        finally:
            sd_csv.write_text(original)

    def test_precrop_resume_past_boundary_lifts_crop(self, llff_db):
        """A run resumed PAST precrop_iterations must escape the center
        crop (the numpy fallback previously checked == only)."""
        prep = self._prep(
            llff_db, precrop_fraction=0.5, precrop_iterations=4, num_rays=16
        )
        prep._native_nerf = None  # force the numpy fallback path
        n_full = prep.num_frames * prep.resolution[0] * prep.resolution[1]
        assert prep._indices.size < n_full  # starts cropped
        prep._next_nerf_indices(6)  # resumed past the boundary
        assert prep._indices.size == n_full

    def test_epoch_wrap_serves_old_tail(self, llff_db):
        """The epoch-tail batch must contain the OLD permutation's leftover
        indices; the slice used to alias the reshuffled array."""
        prep = self._prep(llff_db)
        prep._native_nerf = None
        prep._indices = np.arange(100, 110)
        prep._i_batch = 8
        prep.num_rays = 4
        tail = prep._indices[8:].copy()
        out = prep._next_nerf_indices(0)
        np.testing.assert_array_equal(out[:2], tail)
        assert out.size == 4
        # the wrap CONSUMES the fresh permutation's head (cursor advances
        # by the wrapped amount, like the C++ raystream): the next batch
        # must continue from there, not re-serve out[2:4]
        assert prep._i_batch == 2
        nxt = prep._next_nerf_indices(1)
        np.testing.assert_array_equal(nxt, prep._indices[2:6])

    def test_mip_nerf_test_rays_match_training_cache(self, llff_db):
        """mip-NeRF's half-pixel ray centers must apply at inference too:
        create_test_data rays for a training pose == the training cache."""
        prep = self._prep(llff_db, mip_nerf={})
        assert prep.mip_nerf_used
        h, w = prep.resolution
        pose = np.asarray(prep.poses[0])
        pose44 = np.eye(4, dtype=np.float32)
        pose44[: pose.shape[0]] = pose
        batch = prep.create_test_data(pose44, preprocess_pose=False)
        np.testing.assert_allclose(
            np.asarray(batch["rays_d"]),
            np.asarray(prep.cache["rays_d"][: h * w]),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(batch["radii"]),
            np.asarray(prep.cache["radii"][: h * w]),
            atol=1e-7,
        )
