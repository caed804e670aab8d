"""Multi-scene batched training on the virtual CPU mesh."""

import json

import numpy as np
import pytest

from vipnerf_tpu.data.synthetic import SphereScene, write_synthetic_database


@pytest.fixture(scope="module")
def two_scene_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("ms") / "data/databases"
    names = ["synth01", "synth02"]
    for i, name in enumerate(names):
        write_synthetic_database(
            root,
            scene_name=name,
            num_frames=6,
            train_frames=(0, 5),
            val_frames=(2,),
            height=24,
            width=32,
            scene=SphereScene(seed=10 + i),
            with_sparse_depth=True,
            with_visibility_prior=True,
        )
    # write_synthetic_database merges split CSVs across per-scene calls;
    # assert both scenes made it into the train split
    sets_dir = root / "NeRF_LLFF/data/train_test_sets/set02"
    train_csv = (sets_dir / "TrainVideosData.csv").read_text()
    assert all(name in train_csv for name in names)
    return root


def configs_for(root):
    return {
        "train_num": 7,
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "root_dirpath": str(root.parent.parent),
        "data_loader": {
            "data_loader_name": "NerfLlffDataLoader01",
            "data_preprocessor_name": "DataPreprocessor01",
            "train_set_num": 2,
            "scene_names": ["synth01", "synth02"],
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
                "load_masks": True, "load_weights": False,
                "masks_dirname": "VW02",
            },
            "sparse_depth": {"dirname": "DE02", "num_rays": 64},
        },
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
            "perturb": True, "raw_noise_std": 1.0, "white_bkgd": False,
        },
        "losses": [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityLoss01", "weight": 0.1},
            {"name": "SparseDepthMSE01", "weight": 0.1},
        ],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4, "lr_decay": 250, "beta1": 0.9, "beta2": 0.999,
        },
        "resume_training": True,
        "num_iterations": 40,
        "validation_interval": 20,
        "validation_chunk_size": 1024,
        "model_save_interval": 20,
        "seed": 0,
    }


class TestMultiSceneTrainer:
    def test_lockstep_training_and_checkpoints(self, two_scene_db):
        import jax

        from vipnerf_tpu.train.multi_scene import start_training_batched

        configs = configs_for(two_scene_db)
        trainer = start_training_batched(configs)

        # scene axis is sharded over 2 devices of the mesh
        assert len(trainer.mesh.devices.ravel()) == 2
        assert trainer.params["coarse"]["pts_linears"][0]["w"].shape[0] == 2

        # Per-scene artifact tree matches the sequential trainer's contract:
        # interval checkpoints + Model_Latest, per-iteration scalars,
        # validation renders under samples/.
        root = two_scene_db.parent.parent
        for scene in ("synth01", "synth02"):
            scene_dir = root / f"runs/training/train0007/{scene}"
            for it in (20, 40):
                assert (
                    scene_dir / f"saved_models/Model_Iter{it:06}.ckpt"
                ).exists()
            latest = scene_dir / "saved_models/Model_Latest.ckpt"
            assert latest.is_symlink()
            assert latest.resolve().name == "Model_Iter000040.ckpt"
            mc = scene_dir / "ModelConfigs.json"
            assert json.loads(mc.read_text())["resolution"] == [24, 32]
            scalars = [
                json.loads(line)
                for line in (scene_dir / "logs/scalars.jsonl")
                .read_text()
                .splitlines()
            ]
            total = [s for s in scalars if s["tag"] == "train/TotalLoss"]
            assert len(total) == 40
            assert any(s["tag"] == "train/lr" for s in scalars)
            assert any(
                s["tag"].startswith("validation/") for s in scalars
            )
            samples = list(
                (scene_dir / "samples/predicted_frames").glob("*.png")
            )
            assert len(samples) > 0

        # scenes trained on different data -> different parameters
        p = jax.device_get(trainer.params)
        w0 = np.asarray(p["coarse"]["pts_linears"][0]["w"])
        assert np.abs(w0[0] - w0[1]).max() > 1e-6

    def test_resume_from_common_checkpoint(self, two_scene_db):
        from vipnerf_tpu.train.multi_scene import start_training_batched

        configs = configs_for(two_scene_db)
        configs["num_iterations"] = 60
        trainer = start_training_batched(configs)  # resumes from iter 40
        root = two_scene_db.parent.parent
        for scene in ("synth01", "synth02"):
            scene_dir = root / f"runs/training/train0007/{scene}"
            assert (
                scene_dir / "saved_models/Model_Iter000060.ckpt"
            ).exists()

    def test_resume_catches_up_incomplete_validation(self, two_scene_db):
        """Checkpoints are written BEFORE validation: resuming over a
        boundary whose validation artifacts are partial (crash between the
        PNG and depth writes) must re-run that boundary's validation."""
        from vipnerf_tpu.train.multi_scene import start_training_batched

        configs = configs_for(two_scene_db)
        configs["num_iterations"] = 60  # same as the resume test: no-op train
        root = two_scene_db.parent.parent
        victim = (
            root / "runs/training/train0007/synth02/samples"
            / "predicted_depths/0000_coarse_Iter00060.npy"
        )
        assert victim.exists()
        victim.unlink()
        start_training_batched(configs)
        assert victim.exists()  # regenerated by the catch-up

    def test_app_entry_batch_scenes_flag(self, two_scene_db):
        """`batch_scenes: true` routes the app start_training to the
        multi-scene trainer (round-3: the feature is app-invocable, not
        test-only)."""
        from vipnerf_tpu.apps.common import DatasetApp

        root = two_scene_db.parent.parent
        configs = configs_for(two_scene_db)
        configs["train_num"] = 8
        configs["num_iterations"] = 10
        configs["validation_interval"] = 10
        configs["model_save_interval"] = 10
        configs["batch_scenes"] = True
        del configs["root_dirpath"]
        app = DatasetApp("NeRF_LLFF", "scene_name", "all", root_dirpath=root)
        app.start_training(configs)
        for scene in ("synth01", "synth02"):
            scene_dir = root / f"runs/training/train0008/{scene}"
            assert (
                scene_dir / "saved_models/Model_Iter000010.ckpt"
            ).exists()
            assert (scene_dir / "logs/scalars.jsonl").exists()
        assert (root / "runs/training/train0008/Configs.json").exists()

    def test_chunked_dispatch_matches_per_step(self, two_scene_db):
        """Scanned K-step chunks produce the same parameters as K=1 chunks
        (the pre-round-3 per-iteration dispatch semantics): RNG folding and
        iter numbering are chunk-size invariant."""
        import jax

        from vipnerf_tpu.train.multi_scene import MultiSceneTrainer

        configs = configs_for(two_scene_db)
        results = []
        for scan_steps in (1, 8):
            cfg = json.loads(json.dumps(configs))
            cfg["scan_steps"] = scan_steps
            trainer = MultiSceneTrainer(
                cfg, ["synth01", "synth02"], two_scene_db / "NeRF_LLFF/data"
            )
            trainer.train(16)
            results.append(jax.device_get(trainer.params))
        for a, b in zip(
            jax.tree_util.tree_leaves(results[0]),
            jax.tree_util.tree_leaves(results[1]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
            )

    def test_losses_decrease_per_scene(self, two_scene_db):
        from vipnerf_tpu.train.multi_scene import MultiSceneTrainer

        configs = configs_for(two_scene_db)
        trainer = MultiSceneTrainer(
            configs,
            ["synth01", "synth02"],
            two_scene_db / "NeRF_LLFF/data",
        )
        first = trainer.train(1)
        last = trainer.train(60)
        assert last["TotalLoss"].shape == (2,)
        assert (last["TotalLoss"] < first["TotalLoss"]).all()
