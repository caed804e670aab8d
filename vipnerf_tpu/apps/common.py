"""Shared app-layer logic for the three per-dataset TrainerTester entry
points.

The reference entry points (src/{NerfLlff,RealEstate,Dtu}TrainerTester01.py,
paths relative to /root/reference/, ~1000 LoC each, ~95% identical) differ in
path templates, scene-id column, and demo config values. This module carries
the shared flow:
- start_training: run-level config save + scene-id resolution + Trainer
  (reference :41-60)
- start_testing: build scenes_data from split CSVs + Tester + QA subprocess
  (reference :63-113)
- start_testing_videos / start_testing_static_videos: render pose tracks to
  mp4 (reference :116-225)
"""

import subprocess
import sys
from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

from vipnerf_tpu.infer import tester as tester_mod
from vipnerf_tpu.utils.naming import scene_dirname
from vipnerf_tpu.train import trainer as trainer_mod
from vipnerf_tpu.utils.io import read_image, save_video


class DatasetApp:
    def __init__(
        self,
        dataset: str,  # 'NeRF_LLFF' | 'RealEstate10K' | 'DTU'
        scene_key: str,  # 'scene_name' | 'scene_num'
        split_dir: str,  # 'all' | 'test'
        root_dirpath: Optional[Path] = None,
    ):
        self.dataset = dataset
        self.scene_key = scene_key
        self.split_dir = split_dir
        self.root_dirpath = Path(root_dirpath) if root_dirpath else Path(".")

    # ------------------------------------------------------------------ utils
    def _scene_dirname(self, scene_id) -> str:
        return scene_dirname(scene_id, self.scene_key)

    def _database_dirpath(self, configs: Dict[str, Any]) -> Path:
        key = configs.get("database_dirpath")
        if not key.startswith("databases/"):
            key = f"databases/{key}"
        return self.root_dirpath / "data" / key

    # --------------------------------------------------------------- training
    def start_training(self, train_configs: Dict[str, Any]):
        """Sequential per-scene training (reference Trainer01.start_training,
        src/Trainer01.py:491-533), or — with `batch_scenes: true` in the
        config — TPU-first multi-scene lockstep training: one NeRF per mesh
        device, all scenes of the train set simultaneously
        (train.multi_scene.MultiSceneTrainer; no reference equivalent)."""
        train_configs = dict(train_configs)
        train_configs["root_dirpath"] = str(self.root_dirpath)
        if train_configs.get("batch_scenes"):
            from vipnerf_tpu.train.multi_scene import start_training_batched

            start_training_batched(train_configs)
        else:
            trainer_mod.start_training(train_configs)

    # ---------------------------------------------------------------- testing
    def build_scenes_data(
        self, test_configs: Dict[str, Any], with_intrinsics: bool = True
    ) -> Dict[str, Any]:
        """scenes_data from split CSVs + camera CSVs (reference :71-100)."""
        database_dirpath = self._database_dirpath(test_configs)
        set_num = test_configs["test_set_num"]
        sets_dir = database_dirpath / f"train_test_sets/set{set_num:02}"
        train_data = pd.read_csv(sets_dir / "TrainVideosData.csv")
        test_data = pd.read_csv(sets_dir / "TestVideosData.csv")
        scene_ids = test_configs.get(
            self.scene_key + "s", test_data[self.scene_key].to_numpy()
        )
        scene_ids = np.unique(scene_ids)

        resolution_suffix = test_configs.get("resolution_suffix", "")
        scenes_data = {}
        for scene_id in scene_ids:
            scene_dir = self._scene_dirname(scene_id)
            base = database_dirpath / f"{self.split_dir}/database_data/{scene_dir}"
            extrinsics = np.loadtxt(
                (base / "CameraExtrinsics.csv").as_posix(), delimiter=","
            ).reshape((-1, 4, 4))
            intrinsics = None
            if with_intrinsics:
                intr_path = base / f"CameraIntrinsics{resolution_suffix}.csv"
                if intr_path.exists():
                    intrinsics = np.loadtxt(
                        intr_path.as_posix(), delimiter=","
                    ).reshape((-1, 3, 3))

            sel_test = test_data[self.scene_key] == scene_id
            sel_train = train_data[self.scene_key] == scene_id
            test_frames = test_data.loc[sel_test]["pred_frame_num"].to_list()
            train_frames = train_data.loc[sel_train]["pred_frame_num"].to_list()
            frames_data = {}
            for frame_num in np.unique(sorted(test_frames + train_frames)):
                frame_num = int(frame_num)
                fd = {
                    "extrinsic": extrinsics[frame_num],
                    "is_train_frame": frame_num in train_frames,
                }
                if intrinsics is not None:
                    fd["intrinsic"] = intrinsics[frame_num]
                frames_data[frame_num] = fd
            # Keyed by the formatted scene id (the reference keys scenes_data
            # by f'{scene_num:05}' for DTU/RealEstate, DtuTrainerTester01.py:
            # 80-81), so the tester resolves the zero-padded train dir.
            scenes_data[scene_dir] = {
                "output_dirname": scene_dir,
                "frames_data": frames_data,
            }
        return scenes_data

    def start_testing(self, test_configs: Dict[str, Any], run_qa: bool = True):
        """Test all scenes + QA (reference :63-113)."""
        test_configs = dict(test_configs)
        test_configs["root_dirpath"] = str(self.root_dirpath)
        output_dirpath = (
            self.root_dirpath / f"runs/testing/test{test_configs['test_num']:04}"
        )
        output_dirpath.mkdir(parents=True, exist_ok=True)
        tester_mod.save_test_configs(output_dirpath, test_configs)

        scenes_data = self.build_scenes_data(test_configs)
        tester_mod.start_testing(
            test_configs,
            scenes_data,
            save_depth=True,
            save_depth_var=True,
            save_visibility=True,
        )

        if run_qa:
            if test_configs.get("preview"):
                # preview frames live in {scene}_preview dirs the QA scene
                # iteration (keyed by database scene names) would not find;
                # coarse-only renders are a quick look, not a benchmark
                print("Skipping QA for preview renders.")
            else:
                self.run_qa(test_configs, output_dirpath)
        return output_dirpath

    def run_qa(self, test_configs: Dict[str, Any], output_dirpath: Path):
        """QA as a subprocess, like the reference's os.system call
        (NerfLlffTrainerTester01.py:104-112) — keeps evaluation decoupled
        from the training/inference process."""
        database_dirpath = self._database_dirpath(test_configs)
        set_num = test_configs["test_set_num"]
        frames_datapath = (
            database_dirpath / f"train_test_sets/set{set_num:02}/TestVideosData.csv"
        )
        cmd = [
            sys.executable,
            "-m",
            "vipnerf_tpu.qa.runner",
            "--database", self.dataset,
            "--pred_videos_dirpath", str(output_dirpath.absolute()),
            "--database_dirpath", str(database_dirpath.absolute()),
            "--frames_datapath", str(frames_datapath.absolute()),
            "--pred_folder_name", "predicted_frames",
            "--resolution_suffix", test_configs.get("resolution_suffix", ""),
        ]
        repo_root = Path(__file__).resolve().parents[2]
        subprocess.run(cmd, cwd=repo_root, check=False)

    # ----------------------------------------------------------------- videos
    def _video_track_testing(
        self,
        test_configs: Dict[str, Any],
        static_camera: bool,
        video_filename: str,
        suffix_template: str,
    ):
        test_configs = dict(test_configs)
        test_configs["root_dirpath"] = str(self.root_dirpath)
        database_dirpath = self._database_dirpath(test_configs)
        output_dirpath = (
            self.root_dirpath / f"runs/testing/test{test_configs['test_num']:04}"
        )
        output_dirpath.mkdir(parents=True, exist_ok=True)
        tester_mod.save_test_configs(output_dirpath, test_configs)

        set_num = test_configs["test_set_num"]
        sets_dir = database_dirpath / f"train_test_sets/set{set_num:02}"
        video_data = pd.read_csv(sets_dir / "TestVideosData.csv")
        scene_ids = np.unique(
            test_configs.get(
                self.scene_key + "s", video_data[self.scene_key].to_numpy()
            )
        )

        for video_num in (1,):
            frame_nums_path = (
                sets_dir / f"video_poses{video_num:02}/VideoFrameNums.csv"
            )
            video_frame_nums = (
                np.loadtxt(frame_nums_path.as_posix(), delimiter=",").astype(int)
                if frame_nums_path.exists()
                else None
            )
            for scene_id in scene_ids:
                scene_dir = self._scene_dirname(scene_id)
                track_path = sets_dir / f"video_poses{video_num:02}/{scene_dir}.csv"
                if not track_path.exists():
                    continue
                extrinsics = np.loadtxt(
                    track_path.as_posix(), delimiter=","
                ).reshape((-1, 4, 4))
                frame_nums = np.arange(extrinsics.shape[0] - 1)
                frames_data = {}
                for f in frame_nums:
                    if static_camera:
                        frames_data[int(f)] = {
                            "extrinsic": extrinsics[0],
                            "extrinsic_viewcam": extrinsics[f + 1],
                            "is_train_frame": False,
                        }
                    else:
                        frames_data[int(f)] = {
                            "extrinsic": extrinsics[f + 1],
                            "is_train_frame": False,
                        }
                scenes_data = {
                    scene_dir: {
                        "output_dirname": scene_dir,
                        "frames_data": frames_data,
                    }
                }
                suffix = suffix_template.format(video_num=video_num)
                out = tester_mod.start_testing(test_configs, scenes_data, suffix)
                if out is None:  # missing train run: tester printed + skipped
                    continue
                # the tester may extend the suffix (preview mode) — resolve
                # the scene dir the same way it does
                eff_suffix = tester_mod.effective_output_suffix(
                    test_configs, suffix
                )
                scene_out = out / f"{scene_dir}{eff_suffix}"
                if not scene_out.exists():
                    continue
                frames = np.stack(
                    [
                        read_image(scene_out / f"predicted_frames/{f:04}.png")
                        for f in frame_nums
                    ]
                )
                if video_frame_nums is not None:
                    frames = frames[video_frame_nums]
                save_video(scene_out / video_filename, frames)

    def start_testing_videos(self, test_configs: Dict[str, Any]):
        self._video_track_testing(
            test_configs, False, "PredictedVideo.mp4", "_video{video_num:02}"
        )

    def start_testing_static_videos(self, test_configs: Dict[str, Any]):
        """View-dirs visualization: fixed camera, moving view dirs
        (reference :169-225)."""
        self._video_track_testing(
            test_configs,
            True,
            "StaticCameraVideo.mp4",
            "_video{video_num:02}_static_camera",
        )


def run_main(demos: Dict[str, Any], default: Optional[List[str]] = None):
    """CLI runner: `python -m vipnerf_tpu.apps.nerf_llff demo1a [demo1b ...]`
    (the reference runs demo functions from main())."""
    import argparse
    import datetime
    import time
    import traceback

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "demo_names", nargs="*", default=default or [],
        help=f"demos to run; available: {sorted(demos)}",
    )
    args = parser.parse_args()

    print("Program started at " + datetime.datetime.now().strftime("%d/%m/%Y %I:%M:%S %p"))
    start_time = time.time()
    try:
        for name in args.demo_names:
            demos[name]()
        run_result = "Program completed successfully!"
    except Exception as e:
        print(e)
        traceback.print_exc()
        run_result = "Error: " + str(e)
    end_time = time.time()
    print(run_result)
    print("Program ended at " + datetime.datetime.now().strftime("%d/%m/%Y %I:%M:%S %p"))
    print("Execution time: " + str(datetime.timedelta(seconds=end_time - start_time)))
