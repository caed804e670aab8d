"""App-layer end-to-end coverage for the DTU and RealEstate entry points.

The LLFF app flow is covered by test_e2e_training / test_apps_videos; these
tests drive the OTHER two dataset apps' distinguishing behavior through the
same DatasetApp surface (reference parity targets, paths relative to
/root/reference/):
- DTU (src/DtuTrainerTester01.py:243-246): no NDC, no recentering, no
  bd_factor, fixed bounds [0.1, 5] (src/data_loaders/DtuDataLoader01.py:66),
  scene dirs {scene_num:05}, and QA with the masked metric quartet over
  ObjectMasks (src/qa/00_Common/src/AllMetrics05_DTU.py:22-31).
- RealEstate10K (src/RealEstateTrainerTester01.py:243-246): NDC + recenter +
  bd_factor 0.75 like LLFF, but the 'test' split dir, fixed bounds [1, 100]
  (src/data_loaders/RealEstateDataLoader01.py:66), and the 01 metric suffix.
"""

import json

import pytest

from vipnerf_tpu.data.synthetic import (
    make_dtu_scene,
    write_synthetic_database,
)


def _tiny_train_configs(database, database_dirpath, scene_key, scene_ids, *,
                        ndc, recenter, bd_factor, train_num, loader_name):
    return {
        "train_num": train_num,
        "database": database,
        "database_dirpath": database_dirpath,
        "data_loader": {
            "data_loader_name": loader_name,
            "data_preprocessor_name": "DataPreprocessor01",
            "train_set_num": 2,
            scene_key: scene_ids,
            "recenter_camera_poses": recenter,
            "bd_factor": bd_factor,
            "spherify": False,
            "ndc": ndc,
            "batching": True,
            "downsampling_factor": 1,
            "num_rays": 128,
            "precrop_fraction": 1,
            "precrop_iterations": -1,
            "visibility_prior": {
                "load_masks": True,
                "load_weights": False,
                "masks_dirname": "VW02",
            },
            "sparse_depth": {"dirname": "DE02", "num_rays": 64},
        },
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
        "losses": [{"name": "MSE01", "weight": 1}],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4, "lr_decay": 250,
            "beta1": 0.9, "beta2": 0.999,
        },
        "resume_training": True,
        "num_iterations": 20,
        "scan_steps": 20,
        "validation_interval": 20,
        "validation_chunk_size": 1024,
        "validation_save_loss_maps": False,
        "model_save_interval": 20,
        "seed": 0,
        "device": [0],
    }


class TestDtuApp:
    @pytest.fixture(scope="class")
    def dtu_env(self, tmp_path_factory):
        import numpy as np

        from vipnerf_tpu.apps.common import DatasetApp
        from vipnerf_tpu.utils.io import save_image

        root = tmp_path_factory.mktemp("dtuapp")
        dtu_scene, dtu_ring = make_dtu_scene()
        gt = write_synthetic_database(
            root / "data/databases",
            dataset="DTU",
            scene_name="00021",
            num_frames=4,
            train_frames=(0, 3),
            val_frames=(1,),
            height=24,
            width=32,
            scene=dtu_scene,
            **dtu_ring,
        )
        # RegNeRF-style object masks for the masked metric quartet
        # (reference MaskedRMSE05_DTU.py:62 reads
        # all/database_data/{scene:05}/ObjectMasks/{frame:04}.png)
        scene_dir = root / "data/databases/DTU/data/all/database_data/00021"
        masks_dir = scene_dir / "ObjectMasks"
        masks_dir.mkdir()
        for f in range(4):
            mask = (gt["depths"][f] > 0).astype(np.uint8) * 255
            save_image(masks_dir / f"{f:04}.png", mask)

        app = DatasetApp("DTU", "scene_num", "all", root_dirpath=root)
        app.start_training(
            _tiny_train_configs(
                "DTU", "databases/DTU/data", "scene_nums", [21],
                ndc=False, recenter=False, bd_factor=None, train_num=41,
                loader_name="DtuDataLoader01",
            )
        )
        return root, app

    def test_train_artifacts(self, dtu_env):
        root, _ = dtu_env
        run_dir = root / "runs/training/train0041"
        # scene dirs are zero-padded scene numbers (reference converts
        # scene_nums to f'{num:05}' ids, DtuTrainerTester01.py:57)
        scene_run = run_dir / "00021"
        assert (scene_run / "saved_models/Model_Iter000020.ckpt").exists()
        assert (scene_run / "ModelConfigs.json").exists()
        cfg = json.loads((run_dir / "Configs.json").read_text())
        # the DTU policy knobs persisted as configured
        assert cfg["data_loader"]["ndc"] is False
        assert cfg["data_loader"]["bd_factor"] is None

    def test_testing_with_masked_qa(self, dtu_env):
        root, app = dtu_env
        out = app.start_testing(
            {
                "test_num": 41,
                "test_set_num": 2,
                "train_num": 41,
                "model_name": "Model_Latest.ckpt",
                "database": "DTU",
                "database_dirpath": "databases/DTU/data",
                "device": [0],
                "chunk_size": 1024,
            },
            run_qa=True,
        )
        assert out == root / "runs/testing/test0041"
        # scene dir is the zero-padded scene number (reference Tester output
        # layout for DTU)
        assert (out / "00021/predicted_frames/0002.png").exists()
        scores = json.loads((out / "QA_Scores.json").read_text())["predicted_frames"]
        # plain quartet with the DTU 05 suffix ...
        for base in ("RMSE05", "PSNR05", "SSIM05"):
            assert isinstance(scores[base], float), scores
        assert "LPIPS05" in scores  # explicit null without weights
        # ... AND the masked quartet over ObjectMasks
        for base in ("MaskedRMSE05", "MaskedPSNR05", "MaskedSSIM05"):
            assert isinstance(scores[base], float), scores
        assert "MaskedLPIPS05" in scores
        assert (
            out / "QA_Scores/predicted_frames/MaskedPSNR05_SceneWise.csv"
        ).exists()


class TestRealEstateApp:
    @pytest.fixture(scope="class")
    def re_env(self, tmp_path_factory):
        from vipnerf_tpu.apps.common import DatasetApp

        root = tmp_path_factory.mktemp("reapp")
        write_synthetic_database(
            root / "data/databases",
            dataset="RealEstate10K",
            scene_name="00003",
            num_frames=4,
            train_frames=(0, 3),
            val_frames=(1,),
            height=24,
            width=32,
        )
        app = DatasetApp("RealEstate10K", "scene_num", "test", root_dirpath=root)
        app.start_training(
            _tiny_train_configs(
                "RealEstate10K", "databases/RealEstate10K/data",
                "scene_nums", [3],
                ndc=True, recenter=True, bd_factor=0.75, train_num=11,
                loader_name="RealEstateDataLoader01",
            )
        )
        return root, app

    def test_train_artifacts(self, re_env):
        root, _ = re_env
        scene_run = root / "runs/training/train0011/00003"
        assert (scene_run / "saved_models/Model_Latest.ckpt").exists()
        cfg = json.loads(
            (root / "runs/training/train0011/Configs.json").read_text()
        )
        assert cfg["data_loader"]["ndc"] is True

    def test_testing_and_qa_suffix(self, re_env):
        root, app = re_env
        out = app.start_testing(
            {
                "test_num": 11,
                "test_set_num": 2,
                "train_num": 11,
                "model_name": "Model_Latest.ckpt",
                "database": "RealEstate10K",
                "database_dirpath": "databases/RealEstate10K/data",
                "device": [0],
                "chunk_size": 1024,
            },
            run_qa=True,
        )
        assert (out / "00003/predicted_frames/0002.png").exists()
        assert (out / "00003/predicted_depths/0002.npy").exists()
        scores = json.loads((out / "QA_Scores.json").read_text())["predicted_frames"]
        # RealEstate metric names carry the 01 suffix
        # (reference AllMetrics01_RealEstate.py:22-27)
        for base in ("RMSE01", "PSNR01", "SSIM01"):
            assert isinstance(scores[base], float), scores
        assert "MaskedRMSE01" not in scores  # masked quartet is DTU-only


class TestDtuSceneContract:
    def test_dtu_scene_depths_inside_fixed_bounds(self, tmp_path):
        """The DTU loader uses FIXED depth bounds [0.1, 5]
        (DtuDataLoader01.py:66) and IGNORES DepthBounds.csv; a synthetic DTU
        scene whose geometry lies outside them is unfittable (samples never
        reach it) — this silently stalled the first DTU protocol run (scene
        depths 3..9 vs far=5) and fed the dead-sigma collapse. Guard the
        contract: make_dtu_scene's geometry must keep every rendered z-depth
        strictly inside the loader's fixed bounds with margin."""
        import numpy as np

        from vipnerf_tpu.data.loaders.base import DTU_SPEC
        from vipnerf_tpu.data.synthetic import make_dtu_scene

        dtu_scene, dtu_ring = make_dtu_scene()
        gt = write_synthetic_database(
            tmp_path / "data/databases",
            dataset="DTU",
            scene_name="00021",
            num_frames=6,
            train_frames=(0, 5),
            val_frames=(2,),
            height=60,
            width=80,
            scene=dtu_scene,
            **dtu_ring,
        )
        near, far = DTU_SPEC.fixed_bounds
        depths = gt["depths"]
        assert np.isfinite(depths).all()
        # margin: the preprocessor samples from 0.9*near (non-NDC policy)
        assert depths.min() > near * 1.5, depths.min()
        assert depths.max() < far * 0.9, depths.max()
