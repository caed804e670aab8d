"""App-layer video rendering end-to-end on the synthetic database.

Covers the reference's start_testing_videos / start_testing_static_videos
flow (NerfLlffTrainerTester01.py:116-225): pose-track CSVs ->
per-frame renders under the _videoNN suffix -> mp4 (or frames-dir fallback
when no codec is available) -> VideoFrameNums.csv subsampling.
"""

import numpy as np
import pytest

from vipnerf_tpu.data.synthetic import make_camera_ring, write_synthetic_database


@pytest.fixture(scope="module")
def app_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("appvid")
    write_synthetic_database(
        root / "data/databases",
        scene_name="synth01",
        num_frames=4,
        train_frames=(0, 3),
        val_frames=(1,),
        height=24,
        width=32,
    )
    # video pose track: first row is the reference/static camera, the rest
    # are rendered frames (apps/common.py uses extrinsics[1:])
    sets_dir = root / "data/databases/NeRF_LLFF/data/train_test_sets/set02"
    poses_dir = sets_dir / "video_poses01"
    poses_dir.mkdir()
    track = make_camera_ring(4, spread_deg=20.0)
    np.savetxt(poses_dir / "synth01.csv", track.reshape(4, 16), delimiter=",")
    np.savetxt(poses_dir / "VideoFrameNums.csv", np.array([0, 2]), delimiter=",")

    from vipnerf_tpu.apps.common import DatasetApp

    app = DatasetApp("NeRF_LLFF", "scene_name", "all", root_dirpath=root)
    app.start_training(
        {
            "train_num": 2,
            "database": "NeRF_LLFF",
            "database_dirpath": "databases/NeRF_LLFF/data",
            "data_loader": {
                "data_loader_name": "NerfLlffDataLoader01",
                "data_preprocessor_name": "DataPreprocessor01",
                "train_set_num": 2,
                "scene_names": ["synth01"],
                "resolution_suffix": "",
                "recenter_camera_poses": True,
                "bd_factor": 0.75,
                "spherify": False,
                "ndc": False,
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
    )
    return root, app


def _test_configs(root):
    return {
        "test_num": 2,
        "test_set_num": 2,
        "train_num": 2,
        "model_name": "Model_Latest.ckpt",
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "root_dirpath": str(root),
        "device": [0],
        "chunk_size": 1024,
    }


class TestAppTesting:
    def test_start_testing_with_qa_subprocess(self, app_env):
        """App-layer start_testing: scenes_data from split CSVs, tester
        with all output kinds, then QA as a subprocess (the reference's
        os.system call, NerfLlffTrainerTester01.py:104-112) exercising the
        standalone `python -m vipnerf_tpu.qa.runner` CLI."""
        import json

        root, app = app_env
        cfg = _test_configs(root)
        cfg["test_num"] = 3
        out = app.start_testing(cfg, run_qa=True)
        assert out == root / "runs/testing/test0003"
        # test frames (2) rendered with depth/var; visibility pairs for
        # train frames (0, 3)
        test_dir = out / "synth01"
        assert (test_dir / "predicted_frames/0002.png").exists()
        assert (test_dir / "predicted_depths/0002.npy").exists()
        assert (test_dir / "predicted_depths_variance/0002.npy").exists()
        assert (test_dir / "predicted_visibilities/0000_0003.npy").exists()
        # QA subprocess wrote scores through the CLI entry point
        scores = json.loads((out / "QA_Scores.json").read_text())
        assert "PSNR02" in scores["predicted_frames"]
        assert (
            out / "QA_Scores/predicted_frames/PSNR02_SceneWise.csv"
        ).exists()


class TestVideoRendering:
    def test_spiral_video(self, app_env):
        root, app = app_env
        app.start_testing_videos(_test_configs(root))
        out = root / "runs/testing/test0002/synth01_video01"
        # 3 rendered frames (track rows 1..3)
        for f in range(3):
            assert (out / f"predicted_frames/{f:04}.png").exists()
        # mp4 written, or the documented frames-dir fallback
        assert (out / "PredictedVideo.mp4").exists() or (
            out / "PredictedVideo_frames"
        ).exists()

    def test_static_camera_video(self, app_env):
        root, app = app_env
        app.start_testing_static_videos(_test_configs(root))
        out = root / "runs/testing/test0002/synth01_video01_static_camera"
        for f in range(3):
            assert (out / f"predicted_frames/{f:04}.png").exists()
        assert (out / "StaticCameraVideo.mp4").exists() or (
            out / "StaticCameraVideo_frames"
        ).exists()

    def test_preview_video_assembles_from_preview_dirs(self, app_env):
        """Preview renders land in {scene}_video01_preview — the video
        assembly must resolve the tester's effective suffix (regression:
        it used to look in the un-suffixed dir and silently skip)."""
        root, app = app_env
        cfg = _test_configs(root)
        cfg["test_num"] = 4
        cfg["preview"] = True
        app.start_testing_videos(cfg)
        out = root / "runs/testing/test0004/synth01_video01_preview"
        for f in range(3):
            assert (out / f"predicted_frames/{f:04}.png").exists()
        assert (out / "PredictedVideo.mp4").exists() or (
            out / "PredictedVideo_frames"
        ).exists()

    def test_preview_testing_skips_qa(self, app_env, capsys):
        """Preview frames live in {scene}_preview dirs QA can't score —
        start_testing must say so instead of silently scoring nothing."""
        root, app = app_env
        cfg = _test_configs(root)
        cfg["test_num"] = 5
        cfg["preview"] = True
        out = app.start_testing(cfg, run_qa=True)
        assert (
            out / "synth01_preview/predicted_frames/0002.png"
        ).exists()
        assert "Skipping QA for preview renders" in capsys.readouterr().out
        assert not (out / "QA_Scores.json").exists()
