"""End-to-end pipeline test: synthetic database -> start_training ->
start_testing -> QA metrics, on the virtual multi-device CPU mesh.

This is the framework's acceptance test (the reference has none; SURVEY.md §4
defines QA-as-test as the de-facto strategy, which this mirrors in miniature).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from vipnerf_tpu.data.synthetic import write_synthetic_database


def small_train_configs(root: Path, num_iterations=1200):
    return {
        "trainer": "VipNerfTpuTrainer",
        "train_num": 1,
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "root_dirpath": str(root),
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
            "num_rays": 256,
            "precrop_fraction": 1,
            "precrop_iterations": -1,
            "visibility_prior": {
                "load_masks": True,
                "load_weights": False,
                "masks_dirname": "VW02",
            },
            "sparse_depth": {"dirname": "DE02", "num_rays": 128},
        },
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": {
                "num_samples": 16,
                "netdepth": 6,
                "netwidth": 32,
                "points_positional_encoding_degree": 4,
                "views_positional_encoding_degree": 2,
                "use_view_dirs": True,
                "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            # Flagship coarse+fine hierarchy, scaled down (reference demo1a
            # uses 64+128 samples; 16+32 keeps the CPU-mesh test fast).
            "fine_mlp": {
                "num_samples": 32,
                "netdepth": 6,
                "netwidth": 32,
                "points_positional_encoding_degree": 4,
                "views_positional_encoding_degree": 2,
                "use_view_dirs": True,
                "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            "chunk": 4096,
            "lindisp": False,
            "netchunk": 16384,
            "perturb": True,
            # raw_noise_std 1.0 (the reference's LLFF value) caps this tiny
            # scene at ~19.5 dB; the acceptance bar needs a clean sigma head.
            "raw_noise_std": 0.0,
            "white_bkgd": False,
        },
        "losses": [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityLoss01", "weight": 0.1},
            {"name": "SparseDepthMSE01", "weight": 0.1},
            {"name": "VisibilityPriorLoss01", "iter_weights": {"0": 0, "30": 0.001}},
        ],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 2e-3,
            "lr_decay": 250,
            "beta1": 0.9,
            "beta2": 0.999,
        },
        "resume_training": True,
        "num_iterations": num_iterations,
        "scan_steps": 100,
        "validation_interval": 600,
        "validation_chunk_size": 1024,
        "validation_save_loss_maps": True,
        "model_save_interval": 600,
        "seed": 0,
        # "all": e2e tests exercise the production DP path on the 8-device
        # virtual CPU mesh (explicit index lists are covered by
        # tests/test_parallel.py::TestSelectDevices)
        "device": "all",
    }


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    db_root = root / "data/databases"
    write_synthetic_database(
        db_root,
        scene_name="synth01",
        num_frames=6,
        train_frames=(0, 5),
        val_frames=(2,),
        height=32,
        width=40,
    )
    return root


class TestEndToEnd:
    def test_full_pipeline(self, synth_root):
        from vipnerf_tpu.infer import start_testing
        from vipnerf_tpu.qa import run_all_qa
        from vipnerf_tpu.train import start_training

        configs = small_train_configs(synth_root)
        start_training(configs)

        train_dir = synth_root / "runs/training/train0001"
        scene_dir = train_dir / "synth01"
        # runs/ output contract
        assert (train_dir / "Configs.json").exists()
        assert (scene_dir / "ModelConfigs.json").exists()
        assert (scene_dir / "saved_models/Model_Iter001200.ckpt").exists()
        assert (scene_dir / "saved_models/Model_Latest.ckpt").is_symlink()
        assert (scene_dir / "logs/scalars.jsonl").exists()
        samples = list((scene_dir / "samples/predicted_frames").glob("*.png"))
        assert len(samples) > 0
        assert len(list((scene_dir / "samples/Losses").glob("*.npy"))) > 0

        mc = json.loads((scene_dir / "ModelConfigs.json").read_text())
        assert mc["resolution"] == [32, 40]
        assert "translation_scale" in mc and "average_pose" in mc

        # losses descend
        scalars = [
            json.loads(line)
            for line in (scene_dir / "logs/scalars.jsonl").read_text().splitlines()
        ]
        total = [s["value"] for s in scalars if s["tag"] == "train/TotalLoss"]
        assert len(total) == 1200
        assert np.mean(total[-10:]) < np.mean(total[:10])

        # ---- testing ----
        test_configs = {
            "tester": "VipNerfTpuTester",
            "test_num": 1,
            "test_set_num": 2,
            "train_num": 1,
            "model_name": "Model_Latest.ckpt",
            "database": "NeRF_LLFF",
            "database_dirpath": "databases/NeRF_LLFF/data",
            "root_dirpath": str(synth_root),
            "device": [0],
            "chunk_size": 1024,
        }
        db_dir = synth_root / "data/databases/NeRF_LLFF/data"
        extr = np.loadtxt(
            db_dir / "all/database_data/synth01/CameraExtrinsics.csv", delimiter=","
        ).reshape(-1, 4, 4)
        intr = np.loadtxt(
            db_dir / "all/database_data/synth01/CameraIntrinsics.csv", delimiter=","
        ).reshape(-1, 3, 3)
        scenes_data = {
            "synth01": {
                "output_dirname": "synth01",
                "frames_data": {
                    f: {
                        "extrinsic": extr[f],
                        "intrinsic": intr[f],
                        "is_train_frame": f in (0, 5),
                    }
                    for f in (0, 1, 3, 4, 5)
                },
            }
        }
        out_dir = start_testing(
            test_configs,
            scenes_data,
            save_depth=True,
            save_depth_var=True,
            save_visibility=True,
        )
        test_dir = synth_root / "runs/testing/test0001/synth01"
        for f in (0, 1, 3, 4, 5):
            assert (test_dir / f"predicted_frames/{f:04}.png").exists()
            assert (test_dir / f"predicted_depths/{f:04}.npy").exists()
            assert (test_dir / f"predicted_depths_variance/{f:04}.npy").exists()
        # visibility only for train frames
        assert (test_dir / "predicted_visibilities/0000_0005.npy").exists()
        assert not (test_dir / "predicted_visibilities/0001_0005.npy").exists()

        # skip-if-exists idempotency: second run should not re-render
        mtime = (test_dir / "predicted_frames/0001.png").stat().st_mtime
        start_testing(test_configs, scenes_data, save_depth=True,
                      save_depth_var=True, save_visibility=True)
        assert (test_dir / "predicted_frames/0001.png").stat().st_mtime == mtime

        # ---- QA ----
        results = run_all_qa(
            "NeRF_LLFF",
            synth_root / "runs/testing/test0001",
            db_dir,
            db_dir / "train_test_sets/set02/TestVideosData.csv",
        )
        # Quality-at-convergence bar: the coarse+fine model must actually
        # learn the scene (QA-as-acceptance, reference PSNR02 semantics).
        # Measured 23.7 dB / 0.87 SSIM at 1200 iters; bars leave margin.
        assert results["PSNR"] is not None and results["PSNR"] > 20
        assert results["RMSE"] is not None
        assert results["SSIM"] > 0.7
        qa_dir = synth_root / "runs/testing/test0001"
        assert (qa_dir / "QA_Scores.json").exists()
        assert (
            qa_dir / "QA_Scores/predicted_frames/PSNR02_FrameWise.csv"
        ).exists()
        assert (
            qa_dir / "QA_Scores/predicted_frames/PSNR02_SceneWise.csv"
        ).exists()
        scores = json.loads((qa_dir / "QA_Scores.json").read_text())
        assert "PSNR02" in scores["predicted_frames"]

    def test_resume_training(self, synth_root):
        from vipnerf_tpu.train import start_training

        configs = small_train_configs(synth_root, num_iterations=1260)
        configs["model_save_interval"] = 60
        start_training(configs)  # resumes from iter 1200
        scene_dir = synth_root / "runs/training/train0001/synth01"
        assert (scene_dir / "saved_models/Model_Iter001260.ckpt").exists()
        latest = scene_dir / "saved_models/Model_Latest.ckpt"
        assert latest.resolve().name == "Model_Iter001260.ckpt"

    def test_resume_regenerates_missing_boundary_validation(self, synth_root):
        """Checkpoints are saved BEFORE validation; if a crash killed a
        boundary's validation, resume must re-render it rather than
        silently skip (trainer resume catch-up)."""
        from vipnerf_tpu.train import start_training

        configs = small_train_configs(synth_root, num_iterations=40)
        configs["train_num"] = 7
        configs["validation_interval"] = 40
        configs["model_save_interval"] = 40
        start_training(configs)
        samples = synth_root / "runs/training/train0007/synth01/samples"
        boundary = list((samples / "predicted_frames").glob("*_Iter00040.png"))
        assert boundary
        for p in boundary:
            p.unlink()
        # resume at the completed checkpoint: training loop is a no-op, but
        # the missing boundary validation must be regenerated
        configs2 = small_train_configs(synth_root, num_iterations=40)
        configs2["train_num"] = 7
        configs2["validation_interval"] = 40
        configs2["model_save_interval"] = 40
        start_training(configs2)
        regenerated = sorted(
            (samples / "predicted_frames").glob("*_Iter00040.png")
        )
        assert regenerated

        # PARTIAL interruption: a crash between the train_images and
        # val_images passes leaves some frames present — the catch-up must
        # still re-run (completeness check, not an any-file glob)
        victim = regenerated[-1]
        victim.unlink()
        start_training(configs2)
        assert victim.exists()

    def test_profiler_window_writes_trace(self, synth_root):
        """configs['profiler'] traces the requested window to logs/profile
        (SURVEY §5: the reference has no tracing; we add jax.profiler)."""
        from vipnerf_tpu.train import start_training

        configs = small_train_configs(synth_root, num_iterations=20)
        configs["train_num"] = 8
        configs["scan_steps"] = 10
        configs["validation_interval"] = 20
        configs["model_save_interval"] = 20
        # deliberately NOT aligned to a scan-chunk start (chunks begin at
        # 0 and 10): the window [15, 18) must still trace the overlapping
        # chunk [10, 20)
        configs["profiler"] = {"start_iter": 15, "num_iters": 3}
        start_training(configs)
        profile_dir = (
            synth_root / "runs/training/train0008/synth01/logs/profile"
        )
        assert profile_dir.exists()
        assert list(profile_dir.rglob("*.trace.json*")) or list(
            profile_dir.rglob("*.xplane.pb")
        )

    def test_visibility_only_ablation(self, synth_root):
        """Reference demo1d-1f: visibility prior only, NO sparse_depth block
        (NerfLlffTrainerTester01.py:616-625) — exercises the no-sparse-depth
        index stream and loss path end to end."""
        import json as _json

        from vipnerf_tpu.train import start_training

        configs = small_train_configs(synth_root, num_iterations=40)
        configs["train_num"] = 9
        del configs["data_loader"]["sparse_depth"]
        configs["losses"] = [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityLoss01", "weight": 0.1},
            {"name": "VisibilityPriorLoss01",
             "iter_weights": {"0": 0, "30": 0.001}},
        ]
        configs["validation_interval"] = 40
        configs["model_save_interval"] = 40
        configs["scan_steps"] = 20
        start_training(configs)
        scene_dir = synth_root / "runs/training/train0009/synth01"
        assert (scene_dir / "saved_models/Model_Iter000040.ckpt").exists()
        scalars = [
            _json.loads(line)
            for line in (scene_dir / "logs/scalars.jsonl").read_text().splitlines()
        ]
        total = [s["value"] for s in scalars if s["tag"] == "train/TotalLoss"]
        assert len(total) == 40
        assert np.mean(total[-5:]) < np.mean(total[:5])
        # no sparse-depth loss logged in the ablation
        assert not any("SparseDepth" in s["tag"] for s in scalars)

    def test_resume_training_minimal_config(self, synth_root):
        """Reference demo2 contract: resume with ONLY {train_num,
        resume_training} — everything else is inherited from the saved
        Configs.json (reference Trainer01.py:440-473,
        NerfLlffTrainerTester01.py:933-940)."""
        from vipnerf_tpu.train import start_training

        minimal = {
            "train_num": 1,
            "resume_training": True,
            "root_dirpath": str(synth_root),
        }
        start_training(minimal)  # must not crash; inherits merged configs
        # The live dict was merged in place from the saved configs.
        assert minimal["database_dirpath"] == "databases/NeRF_LLFF/data"
        assert minimal["num_iterations"] == 1260
        assert minimal["data_loader"]["scene_names"] == ["synth01"]
        # Persisted configs keep the full merged schema (minus path keys).
        saved = json.loads(
            (synth_root / "runs/training/train0001/Configs.json").read_text()
        )
        assert "root_dirpath" not in saved
        assert saved["model"]["name"] == "VipNeRF01"
        assert saved["seed"] == 0

    def test_preview_mode_testing(self, synth_root):
        """Beyond-reference: `test_configs['preview']: true` renders the
        32+8 reduced-budget FULL pipeline through the product Tester with
        the trained coarse+fine checkpoint (coarse-only preview was retired
        with a measurement, BASELINE.md round-5); preview frames must stay
        close to the full renders.

        Like the other methods of this class, depends on test_full_pipeline
        having produced train0001 + test0001 (the class runs in definition
        order). Model_Latest is at iter 1260 after the resume tests while
        test0001 frames were rendered at iter 1200 — the PSNR bar absorbs
        that drift."""
        from vipnerf_tpu.infer import start_testing
        from vipnerf_tpu.utils.io import read_image

        db_dir = synth_root / "data/databases/NeRF_LLFF/data"
        extr = np.loadtxt(
            db_dir / "all/database_data/synth01/CameraExtrinsics.csv",
            delimiter=",",
        ).reshape(-1, 4, 4)
        intr = np.loadtxt(
            db_dir / "all/database_data/synth01/CameraIntrinsics.csv",
            delimiter=",",
        ).reshape(-1, 3, 3)
        test_configs = {
            "tester": "VipNerfTpuTester",
            "test_num": 9,
            "test_set_num": 2,
            "train_num": 1,
            "model_name": "Model_Latest.ckpt",
            "database": "NeRF_LLFF",
            "database_dirpath": "databases/NeRF_LLFF/data",
            "root_dirpath": str(synth_root),
            "device": [0],
            "chunk_size": 1024,
            "preview": True,
        }
        scenes_data = {
            "synth01": {
                "output_dirname": "synth01",
                "frames_data": {
                    1: {"extrinsic": extr[1], "intrinsic": intr[1],
                        "is_train_frame": False},
                },
            }
        }
        start_testing(test_configs, scenes_data)
        # preview output goes to its own scene dir ({scene}_preview) so
        # skip-if-exists never mixes coarse-only and full frames
        prev_path = (
            synth_root
            / "runs/testing/test0009/synth01_preview/predicted_frames/0001.png"
        )
        full_path = (
            synth_root / "runs/testing/test0001/synth01/predicted_frames/0001.png"
        )
        assert prev_path.exists() and full_path.exists()
        prev = read_image(prev_path).astype(np.float32)
        full = read_image(full_path).astype(np.float32)
        mse = np.mean((prev - full) ** 2)
        psnr_vs_full = 10 * np.log10(255.0**2 / mse)
        # The 32+8 budget render approximates the full 64+128 render (the
        # coarse-only preview this mode superseded measured 15.6 dB against
        # the full render on this fixture). The bar guards the plumbing
        # (correct params, real render), not preview quality.
        assert psnr_vs_full > 12, f"preview diverges: {psnr_vs_full:.2f} dB"

    def test_sample_budget_override_testing(self, synth_root):
        """Beyond-reference: test_configs num_samples_coarse/fine override
        the render-time quadrature while loading the full checkpoint
        unchanged (tools/sample_budget_eval.py measures the quality/speed
        tradeoff on the protocol checkpoint)."""
        from vipnerf_tpu.infer import start_testing
        from vipnerf_tpu.utils.io import read_image

        db_dir = synth_root / "data/databases/NeRF_LLFF/data"
        extr = np.loadtxt(
            db_dir / "all/database_data/synth01/CameraExtrinsics.csv",
            delimiter=",",
        ).reshape(-1, 4, 4)
        intr = np.loadtxt(
            db_dir / "all/database_data/synth01/CameraIntrinsics.csv",
            delimiter=",",
        ).reshape(-1, 3, 3)
        test_configs = {
            "tester": "VipNerfTpuTester",
            "test_num": 10,
            "test_set_num": 2,
            "train_num": 1,
            "model_name": "Model_Latest.ckpt",
            "database": "NeRF_LLFF",
            "database_dirpath": "databases/NeRF_LLFF/data",
            "root_dirpath": str(synth_root),
            "device": [0],
            "chunk_size": 1024,
            "num_samples_coarse": 8,
            "num_samples_fine": 8,
        }
        scenes_data = {
            "synth01": {
                "output_dirname": "synth01",
                "frames_data": {
                    1: {"extrinsic": extr[1], "intrinsic": intr[1],
                        "is_train_frame": False},
                },
            }
        }
        start_testing(test_configs, scenes_data)
        budget_path = (
            synth_root
            / "runs/testing/test0010/synth01/predicted_frames/0001.png"
        )
        full_path = (
            synth_root
            / "runs/testing/test0001/synth01/predicted_frames/0001.png"
        )
        assert budget_path.exists()
        budget = read_image(budget_path).astype(np.float32)
        full = read_image(full_path).astype(np.float32)
        assert not np.array_equal(budget, full)  # quadrature really changed
        mse = np.mean((budget - full) ** 2)
        psnr_vs_full = 10 * np.log10(255.0**2 / mse)
        # 8+16 points approximates the 16+48 full render closely on the
        # trained model; the bar guards the plumbing, not the tradeoff
        assert psnr_vs_full > 15, f"budget diverges: {psnr_vs_full:.2f} dB"


def test_validation_complete_requires_all_artifacts(tmp_path):
    """The resume catch-up must re-run a boundary whose PNG exists but whose
    later-written depth/variance artifacts are missing (run_validation
    writes the PNG first; a crash in between must not mark it complete)."""
    from types import SimpleNamespace

    from vipnerf_tpu.train.trainer import Trainer

    prep = SimpleNamespace(frame_nums=[0], mode="train")
    vprep = SimpleNamespace(frame_nums=[1], mode="validation")
    fake = SimpleNamespace(
        configs={
            "model": {"coarse_mlp": {"predict_visibility": False}},
            "data_loader": {"ndc": False},
        },
        train_data_preprocessor=prep,
        val_data_preprocessor=vprep,
    )
    it = 600
    files = [
        "predicted_frames/0000_coarse_Iter00600.png",
        "predicted_depths/0000_coarse_Iter00600.npy",
        "predicted_depths_variance/0000_coarse_Iter00600.npy",
        "predicted_frames/0001_coarse_Iter00600.png",
        "predicted_depths/0001_coarse_Iter00600.npy",
        "predicted_depths_variance/0001_coarse_Iter00600.npy",
    ]
    complete = Trainer._validation_complete
    # write all but the LAST artifact -> incomplete
    for rel in files[:-1]:
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.touch()
    assert not complete(fake, it, tmp_path)
    (tmp_path / files[-1]).touch()
    assert complete(fake, it, tmp_path)
    # ndc mode additionally requires the ndc depth/variance files
    fake.configs["data_loader"]["ndc"] = True
    assert not complete(fake, it, tmp_path)
