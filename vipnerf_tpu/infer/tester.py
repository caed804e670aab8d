"""Inference runtime: checkpoint loading, per-frame novel-view rendering,
skip-if-exists idempotency, output saving.

Parity target: src/Tester01.py (paths relative to /root/reference/):
- NerfTester: test-mode preprocessor + model + checkpoint load (:39-55),
  predict_frame via create_test_data -> render -> retrieve_inference_outputs
  (:57-66)
- start_testing: per-scene/per-frame orchestration with skip-if-exists
  (:191-198), output tree runs/testing/test{NNNN:04}/{scene}{suffix}/ with
  predicted_frames/{f:04}.png, predicted_depths/{f:04}[_ndc].npy(+png),
  predicted_depths_variance/, predicted_visibilities/{f1:04}_{f2:04}.npy
  (:184-226), config persistence with merge (:110-138).

TPU-first: full images render through the TiledRenderer (fixed-tile jit
compiled once, reused for every frame and scene).
"""

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import simplejson

from vipnerf_tpu.data import get_data_preprocessor
from vipnerf_tpu.infer.renderer import TiledRenderer
from vipnerf_tpu.models import get_model
from vipnerf_tpu.train import checkpoints
from vipnerf_tpu.utils.config import dict_diff
from vipnerf_tpu.utils.io import save_image as _save_image_raw
from vipnerf_tpu.utils.io import save_numpy_array


class NerfTester:
    def __init__(
        self,
        train_configs: Dict[str, Any],
        model_configs: Dict[str, Any],
        test_configs: Dict[str, Any],
        root_dirpath: Path,
    ):
        self.train_configs = train_configs
        self.test_configs = test_configs
        self.root_dirpath = Path(root_dirpath)
        self.model_configs = model_configs
        self.params = None

        # Beyond-reference: `test_configs['preview']` renders a fast preview
        # with the SAME trained params. `true` selects the quality-measured
        # 32+8 reduced-budget FULL pipeline (preview_budget_configs — it
        # superseded coarse-only, which measured 13.5 dB vs 20.5/24.1 on a
        # trained checkpoint, BASELINE.md round-5). An explicit integer N
        # keeps the coarse-only density/debug view at N samples; the
        # preprocessor shares the preview configs so inference outputs are
        # retrieved from the coarse pass in that mode.
        render_configs = train_configs
        preview = test_configs.get("preview")
        if preview:
            from vipnerf_tpu.infer.renderer import (
                preview_budget_configs,
                preview_configs,
            )

            if isinstance(preview, int) and not isinstance(preview, bool):
                render_configs = preview_configs(train_configs, preview)
            else:
                render_configs = preview_budget_configs(train_configs)
        # Beyond-reference: render-time sample-budget overrides. num_samples
        # only shapes the quadrature — the checkpoint loads unchanged.
        # Measured on the 50k protocol checkpoint (tools/sample_budget_eval.py,
        # BASELINE.md round-3): on the sparse-view synthetic scene a reduced
        # budget renders FASTER AND CLEANER (dense quadrature integrates the
        # low-density fog that 2-view training leaves in free space).
        # Defaults unchanged (reference parity).
        sample_overrides = {
            "coarse_mlp": test_configs.get("num_samples_coarse"),
            "fine_mlp": test_configs.get("num_samples_fine"),
        }
        if any(v is not None for v in sample_overrides.values()):
            import copy

            render_configs = copy.deepcopy(render_configs)
            for mlp_key, value in sample_overrides.items():
                if value is not None and mlp_key in render_configs["model"]:
                    render_configs["model"][mlp_key]["num_samples"] = int(value)

        self.data_preprocessor = get_data_preprocessor(
            render_configs, mode="test", model_configs=model_configs
        )
        # params are built from the FULL train configs — a preview must load
        # the trained checkpoint (coarse+fine) unchanged
        init_fn, self.render_fn = get_model(train_configs)
        import jax

        self.params = init_fn(jax.random.PRNGKey(0), train_configs)
        # Multi-chip inference: the reference DataParallel-wraps the model at
        # test time too (src/Tester01.py:42, device list from configs). Here
        # `test_configs['device']` selects mesh devices ("all"/None = every
        # local device, or an explicit index list); with >1 device each
        # render tile's rays shard across the mesh.
        mesh = None
        from vipnerf_tpu.parallel.mesh import make_mesh, select_devices

        devices = select_devices(test_configs.get("device", "all"))
        if len(devices) > 1:
            mesh = make_mesh(devices)
        self.renderer = TiledRenderer(self.render_fn, render_configs, mesh=mesh)
        # Measured render optimum on v5e: small tiles pipeline better after
        # the gather-free sample_pdf rewrite (BASELINE.md round-2 notes).
        self.chunk_size = test_configs.get("chunk_size", 8192)

    def load_model(self, model_path: Path):
        model_path = Path(model_path)
        iter_num, self.params, _ = checkpoints.load_checkpoint(
            model_path, self.params, None
        )
        train_dirname = model_path.parent.parent.parent.stem
        scene_dirname = model_path.parent.parent.stem
        print(
            f"Loaded Model in {train_dirname}/{scene_dirname}/{model_path.stem} "
            f"trained for {iter_num} iterations"
        )

    def predict_frame(
        self,
        camera_pose: np.ndarray,
        view_camera_pose: Optional[np.ndarray] = None,
        secondary_poses: Optional[List[np.ndarray]] = None,
        intrinsic: Optional[np.ndarray] = None,
        view_intrinsic: Optional[np.ndarray] = None,
        secondary_intrinsics: Optional[List[np.ndarray]] = None,
    ) -> Dict[str, np.ndarray]:
        batch = self.data_preprocessor.create_test_data(
            camera_pose,
            view_camera_pose,
            secondary_poses,
            True,
            intrinsic,
            view_intrinsic,
            secondary_intrinsics,
        )
        outputs, _ = self.renderer.render(
            self.params,
            batch,
            chunk_size=self.chunk_size,
            sec_views_vis=secondary_poses is not None,
        )
        return self.data_preprocessor.retrieve_inference_outputs(outputs)

    @staticmethod
    def save_image(path: Path, image: np.ndarray):
        _save_image_raw(path, image)

    @staticmethod
    def save_depth(path: Path, depth: np.ndarray, as_png: bool = False):
        save_numpy_array(path, depth, as_png=as_png)

    @staticmethod
    def save_visibility(path: Path, visibility: np.ndarray, as_png: bool = False):
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        vis_image = np.round(visibility * 255).astype("uint8")
        if path.suffix == ".png":
            _save_image_raw(path, vis_image)
        elif path.suffix == ".npy":
            np.save(path.as_posix(), visibility)
            if as_png:
                _save_image_raw(path.parent / f"{path.stem}.png", vis_image)
        else:
            raise RuntimeError(f"Unknown visibility format: {path.as_posix()}")


def save_test_configs(
    output_dirpath: Path, configs: Dict[str, Any], filename: str = "Configs.json"
):
    """Test-config persistence with scene-list merge (reference :110-138)."""
    configs = {
        k: v for k, v in configs.items() if k not in ("root_dirpath",)
    }
    configs_path = Path(output_dirpath) / filename
    if configs_path.exists():
        with open(configs_path) as f:
            old_configs = json.load(f)
        for key in old_configs:
            if key not in configs:
                configs[key] = old_configs[key]
        scene_id_key = None
        for candidate in ("scene_nums", "scene_names", "scene_ids"):
            if candidate in old_configs:
                scene_id_key = candidate
                break
        if scene_id_key is not None:
            merged = sorted(
                set(old_configs.get(scene_id_key, []))
                | set(configs.get(scene_id_key, []))
            )
            if merged:
                configs[scene_id_key] = merged
                old_configs[scene_id_key] = merged
        if "device" in configs:
            old_configs["device"] = configs["device"]
        if configs != old_configs:
            print(
                "Configs mismatch while resuming testing: "
                + "; ".join(dict_diff(old_configs, configs))
            )
    Path(output_dirpath).mkdir(parents=True, exist_ok=True)
    with open(configs_path, "w") as f:
        simplejson.dump(configs, f, indent=4, default=str)


def effective_output_suffix(
    test_configs: Dict[str, Any], output_dir_suffix: str = ""
) -> str:
    """Scene-dir suffix actually used by start_testing. Preview renders go
    to their own scene dirs (`{scene}{suffix}_preview`) — skip-if-exists
    must never mix coarse-only frames into a full render tree (or vice
    versa). Callers that compute output paths (video assembly, QA) must use
    this same function."""
    if test_configs.get("preview"):
        return f"{output_dir_suffix}_preview"
    return output_dir_suffix


def start_testing(
    test_configs: Dict[str, Any],
    scenes_data: Dict[str, Any],
    output_dir_suffix: str = "",
    save_depth: bool = False,
    save_depth_var: bool = False,
    save_visibility: bool = False,
) -> Optional[Path]:
    """Render all frames of all scenes from a trained run (reference :141-227).

    scenes_data: {scene_id: {'output_dirname': str, 'frames_data':
    {frame_num: {'extrinsic', 'is_train_frame'[, 'intrinsic',
    'extrinsic_viewcam', 'intrinsic_viewcam']}}}}
    """
    root_dirpath = Path(test_configs.get("root_dirpath", "."))
    output_dirpath = root_dirpath / f"runs/testing/test{test_configs['test_num']:04}"
    output_dir_suffix = effective_output_suffix(test_configs, output_dir_suffix)

    train_num = test_configs["train_num"]
    model_name = test_configs["model_name"]
    train_dirpath = root_dirpath / f"runs/training/train{train_num:04}"

    # Train configs live at the train{NNNN:04} level (reference :148-154).
    train_configs_path = train_dirpath / "Configs.json"
    if not train_configs_path.exists():
        print(f"Train Configs does not exist at {train_configs_path}. Skipping.")
        return None
    with open(train_configs_path) as f:
        base_train_configs = json.load(f)

    for scene_id in scenes_data:
        scene_data = scenes_data[scene_id]

        scene_train_dirpath = train_dirpath / f"{scene_id}"
        train_configs = json.loads(json.dumps(base_train_configs))
        train_configs["data_loader"]["scene_id"] = scene_id

        model_configs_path = scene_train_dirpath / "ModelConfigs.json"
        if not model_configs_path.exists():
            print(
                f"Scene {scene_id}: Trained Model Configs does not exist at "
                f"{model_configs_path}. Skipping."
            )
            continue
        with open(model_configs_path) as f:
            trained_model_configs = json.load(f)
        model_path = scene_train_dirpath / f"saved_models/{model_name}"
        if not model_path.exists():
            print(f"Scene {scene_id}: Model does not exist at {model_path}. Skipping.")
            continue

        tester = NerfTester(
            train_configs, trained_model_configs, test_configs, root_dirpath
        )
        tester.load_model(model_path)

        scene_output_dirpath = (
            output_dirpath / f"{scene_data['output_dirname']}{output_dir_suffix}"
        )

        frame_nums = list(scene_data["frames_data"].keys())
        train_frame_nums = [
            f for f in frame_nums if scene_data["frames_data"][f]["is_train_frame"]
        ]
        for frame_num in frame_nums:
            frame_data = scene_data["frames_data"][frame_num]
            frame_output_path = (
                scene_output_dirpath / f"predicted_frames/{frame_num:04}.png"
            )
            depth_output_path = (
                scene_output_dirpath / f"predicted_depths/{frame_num:04}.npy"
            )
            depth_var_output_path = (
                scene_output_dirpath / f"predicted_depths_variance/{frame_num:04}.npy"
            )

            inference_required = not frame_output_path.exists()
            if save_depth:
                inference_required |= not depth_output_path.exists()
            if save_depth_var:
                inference_required |= not depth_var_output_path.exists()
            if save_visibility and frame_data["is_train_frame"]:
                # visibility maps are written LAST — existing frame/depth
                # files must not suppress regenerating missing ones (the
                # reference's skip check predates its visibility outputs)
                inference_required |= any(
                    not (
                        scene_output_dirpath
                        / f"predicted_visibilities/{frame_num:04}_{f:04}.npy"
                    ).exists()
                    for f in train_frame_nums
                    if f != frame_num
                )
            if not inference_required:
                continue

            secondary_poses = None
            secondary_intrinsics = None
            secondary_frame_nums = []
            if save_visibility and frame_data["is_train_frame"]:
                secondary_frame_nums = [
                    f for f in train_frame_nums if f != frame_num
                ]
                secondary_poses = [
                    scene_data["frames_data"][f]["extrinsic"]
                    for f in secondary_frame_nums
                ]
                secondary_intrinsics = [
                    scene_data["frames_data"][f].get("intrinsic")
                    for f in secondary_frame_nums
                ]
                if any(x is None for x in secondary_intrinsics):
                    secondary_intrinsics = None

            predictions = tester.predict_frame(
                frame_data["extrinsic"],
                frame_data.get("extrinsic_viewcam"),
                secondary_poses,
                frame_data.get("intrinsic"),
                frame_data.get("intrinsic_viewcam"),
                secondary_intrinsics,
            )

            tester.save_image(frame_output_path, predictions["image"])
            if save_depth:
                tester.save_depth(depth_output_path, predictions["depth"], as_png=True)
                if "depth_ndc" in predictions:
                    tester.save_depth(
                        scene_output_dirpath / f"predicted_depths/{frame_num:04}_ndc.npy",
                        predictions["depth_ndc"],
                        as_png=True,
                    )
            if save_depth_var:
                tester.save_depth(
                    depth_var_output_path, predictions["depth_var"], as_png=True
                )
                if "depth_var_ndc" in predictions:
                    tester.save_depth(
                        scene_output_dirpath
                        / f"predicted_depths_variance/{frame_num:04}_ndc.npy",
                        predictions["depth_var_ndc"],
                        as_png=True,
                    )
            if (
                save_visibility
                and frame_data["is_train_frame"]
                and "visibility2" in predictions
            ):
                for i, sec in enumerate(secondary_frame_nums):
                    tester.save_visibility(
                        scene_output_dirpath
                        / f"predicted_visibilities/{frame_num:04}_{sec:04}.npy",
                        predictions["visibility2"][i],
                        as_png=True,
                    )
    return output_dirpath
