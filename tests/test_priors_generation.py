"""End-to-end tests for the offline prior-generation workflow.

The reference runs prior generation as standalone scripts before training
(src/prior_generators/*/; see SURVEY.md §3.4). These tests drive our module
CLIs (vipnerf_tpu/priors/cli.py) on tiny synthetic databases and check the
on-disk contract the data loaders consume:
  {split}/visibility_prior/VW{NN}/{scene}/visibility_masks/{f1}_{f2}.npy(+png)
  {split}/visibility_prior/VW{NN}/{scene}/visibility_weights/{f1}_{f2}.npy
  {split}/estimated_depths/DE{NN}/... (needs external COLMAP -> clear error)
"""

import json

import numpy as np
import pytest

from vipnerf_tpu.data.synthetic import (
    make_dtu_scene,
    write_synthetic_database,
)
from vipnerf_tpu.priors.cli import (
    build_sparse_depth_configs,
    build_visibility_configs,
    main_sparse_depth,
    main_visibility,
)


class TestPolicyTables:
    def test_llff_policy_matches_reference_demo(self):
        # VisibilityMask02_NeRF_LLFF.py:289-298
        cfg = build_visibility_configs("NeRF_LLFF", 2)
        assert cfg["gen_set_num"] == 2
        assert cfg["num_depth_planes"] == 64
        assert cfg["temperature"] == 10
        assert cfg["resolution_suffix"] == "_down4"
        assert "fixed_bounds" not in cfg  # per-scene DepthBounds.csv
        assert not cfg.get("depth_planes_linear", False)  # inverse planes

    def test_realestate_policy(self):
        # VisibilityMask01_RealEstate.py:233-236: test split, bounds [1,100]
        cfg = build_visibility_configs("RealEstate10K", 3)
        assert cfg["split_dir"] == "test"
        assert cfg["scene_key"] == "scene_num"
        assert cfg["fixed_bounds"] == [1.0, 100.0]

    def test_dtu_policy(self):
        # VisibilityMask05_DTU.py:38-40,235-238: LINEAR planes, bounds [.1,5],
        # 128 planes (published VW02 Configs.json artifact)
        cfg = build_visibility_configs("DTU", 4)
        assert cfg["depth_planes_linear"] is True
        assert cfg["fixed_bounds"] == [0.1, 5.0]
        assert cfg["split_dir"] == "all"
        assert cfg["num_depth_planes"] == 128

    def test_sparse_depth_policy(self):
        # DepthEstimator02_NeRF_LLFF.py:92-99
        cfg = build_sparse_depth_configs("NeRF_LLFF", 2)
        assert cfg["resolution_suffix"] == "_down4"
        assert cfg["gen_set_num"] == 2


class TestVisibilityGenerationE2E:
    @pytest.fixture(scope="class")
    def generated(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("visgen")
        write_synthetic_database(
            root / "data/databases",
            scene_name="synth01",
            num_frames=4,
            train_frames=(0, 3),
            val_frames=(1,),
            height=24,
            width=32,
            resolution_suffix="_down4",
            with_visibility_prior=False,  # the CLI must create it
            with_sparse_depth=False,
        )
        main_visibility(
            ["--database", "NeRF_LLFF", "--gen_nums", "2",
             "--root_dirpath", str(root)]
        )
        return root / "data/databases/NeRF_LLFF/data/all/visibility_prior/VW02"

    def test_output_contract(self, generated):
        scene = generated / "synth01"
        # both directions for the train pair (0, 3)
        for a, b in ((0, 3), (3, 0)):
            assert (scene / f"visibility_masks/{a:04}_{b:04}.npy").exists()
            assert (scene / f"visibility_masks/{a:04}_{b:04}.png").exists()
            assert (scene / f"visibility_weights/{a:04}_{b:04}.npy").exists()
        cfg = json.loads((generated / "Configs.json").read_text())
        assert cfg["num_depth_planes"] == 64

    def test_weights_sane(self, generated):
        w = np.load(generated / "synth01/visibility_weights/0000_0003.npy")
        assert w.shape == (24, 32)
        assert np.all((w >= 0) & (w <= 1))
        # ring cameras see mostly the same scene: most pixels photoconsistent
        assert w.mean() > 0.3

    def test_mask_is_thresholded_weights(self, generated):
        w = np.load(generated / "synth01/visibility_weights/0003_0000.npy")
        m = np.load(generated / "synth01/visibility_masks/0003_0000.npy")
        assert m.dtype == bool
        np.testing.assert_array_equal(m, w > 0.5)

    def test_idempotent_resume(self, generated):
        # second invocation must be a no-op (skip-if-exists + strict configs)
        root = generated.parents[6]  # .../{root}/data/databases/NeRF_LLFF/...
        before = (generated / "synth01/visibility_weights/0000_0003.npy").stat()
        main_visibility(
            ["--database", "NeRF_LLFF", "--gen_nums", "2",
             "--root_dirpath", str(root)]
        )
        after = (generated / "synth01/visibility_weights/0000_0003.npy").stat()
        assert before.st_mtime == after.st_mtime


class TestVisibilityGenerationDTU:
    def test_dtu_layout_linear_planes(self, tmp_path):
        """DTU path: scene_num keys -> zero-padded dirs, fixed bounds
        [0.1, 5], LINEAR depth planes, full-res rgb (no suffix)."""
        dtu_scene, dtu_ring = make_dtu_scene()
        write_synthetic_database(
            tmp_path / "data/databases",
            dataset="DTU",
            scene_name="00021",
            num_frames=4,
            train_frames=(0, 3),
            val_frames=(1,),
            height=24,
            width=32,
            with_visibility_prior=False,
            with_sparse_depth=False,
            scene=dtu_scene,
            **dtu_ring,
        )
        main_visibility(
            ["--database", "DTU", "--gen_nums", "2",
             "--root_dirpath", str(tmp_path)]
        )
        out = tmp_path / "data/databases/DTU/data/all/visibility_prior/VW02"
        w = np.load(out / "00021/visibility_weights/0000_0003.npy")
        assert w.shape == (24, 32)
        assert np.all((w >= 0) & (w <= 1))
        cfg = json.loads((out / "Configs.json").read_text())
        assert cfg["num_depth_planes"] == 128
        assert cfg["depth_planes_linear"] is True
        assert cfg["fixed_bounds"] == [0.1, 5.0]


class TestSparseDepthCLI:
    def test_clear_error_without_colmap(self, tmp_path):
        from vipnerf_tpu.priors.sparse_depth import ColmapNotFoundError

        write_synthetic_database(
            tmp_path / "data/databases",
            scene_name="synth01",
            num_frames=4,
            train_frames=(0, 3),
            val_frames=(1,),
            height=24,
            width=32,
            resolution_suffix="_down4",
            with_sparse_depth=False,
            with_visibility_prior=False,
        )
        with pytest.raises(ColmapNotFoundError, match="COLMAP binary"):
            main_sparse_depth(
                ["--database", "NeRF_LLFF", "--gen_nums", "2",
                 "--root_dirpath", str(tmp_path)]
            )
