"""Sparse depth prior via external COLMAP triangulation with known poses.

Parity target: src/prior_generators/sparse_depth/ (paths relative to
/root/reference/):
- workflow (Tester01.py:291-296): write images + cameras.txt/images.txt with
  known intrinsics/extrinsics, run colmap feature_extractor /
  exhaustive_matcher / point_triangulator (fixed poses) / model_converter,
  read back the binary model
- per-frame depth bounds from 0.5/99.5 percentiles of triangulated z
  (:184-218), per-feature depth z = r3^T (X - t) with weight
  2*exp(-(err/err_mean)^2) (:232-289)
- outputs per-frame CSV [x, y, depth, reprojection_error, weight] +
  EstimatedBounds.csv under DE{gen_num:02}
  (DepthEstimator02_NeRF_LLFF.py:45-84)

COLMAP stays an external CPU binary exactly as in the reference (it is
classical SfM preprocessing, not a training-path component; SURVEY.md §2.10).
When the binary is absent (as in this container) generation raises a clear
error and the training pipeline runs without the sparse-depth prior.
"""

import shutil
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from vipnerf_tpu.priors import colmap_io


class ColmapNotFoundError(RuntimeError):
    pass


class ColmapTester:
    def __init__(self, tmp_dirpath: Path):
        self.tmp_dirpath = Path(tmp_dirpath)
        self.images_dirpath = self.tmp_dirpath / "images"
        self.db_path = self.tmp_dirpath / "database.db"
        self.sparse_dirpath = self.tmp_dirpath / "sparse/0"

    def _colmap(self, *args: str):
        if shutil.which("colmap") is None:
            raise ColmapNotFoundError(
                "COLMAP binary not found on PATH. Sparse-depth prior "
                "generation requires the external colmap tool (reference "
                "treats it the same way: sparse_depth/Tester01.py:79-118)."
            )
        subprocess.run(["colmap", *args], check=True)

    def clean_tmp_dir(self):
        if self.tmp_dirpath.exists():
            shutil.rmtree(self.tmp_dirpath)
        self.tmp_dirpath.mkdir(parents=True)

    def save_tmp_data(self, images: np.ndarray, intrinsics: np.ndarray):
        """Write images + cameras.txt + empty points3D.txt (reference
        :40-64). All frames must share intrinsics (same reference
        limitation)."""
        from vipnerf_tpu.utils.io import save_image

        for intrinsic in intrinsics:
            assert np.allclose(intrinsic, intrinsics[0])
        intrinsic = intrinsics[0]
        camera_id = 1

        self.sparse_dirpath.mkdir(parents=True, exist_ok=True)
        for frame_num, image in enumerate(images):
            save_image(self.images_dirpath / f"{frame_num:04}.png", image)

        h, w = images[0].shape[:2]
        camera_line = (
            f"{camera_id} FULL_OPENCV {w} {h} "
            f"{intrinsic[0, 0]} {intrinsic[1, 1]} {intrinsic[0, 2]} "
            f"{intrinsic[1, 2]} 0 0 0 0 0 0 0 0 \n"
        )
        (self.sparse_dirpath / "cameras.txt").write_text(camera_line)
        (self.sparse_dirpath / "points3D.txt").touch()
        return {camera_id: intrinsic}

    def run_colmap(self, camera_data: Dict, extrinsics: np.ndarray):
        """feature_extractor -> fix camera params -> images.txt with known
        poses -> exhaustive_matcher -> point_triangulator -> model_converter
        (reference :78-119)."""
        self._colmap(
            "feature_extractor",
            "--database_path", self.db_path.as_posix(),
            "--image_path", self.images_dirpath.as_posix(),
            "--ImageReader.single_camera", "1",
        )

        camera_id, intrinsic = next(iter(camera_data.items()))
        params = np.array(
            [intrinsic[0, 0], intrinsic[1, 1], intrinsic[0, 2], intrinsic[1, 2]]
        )
        colmap_io.update_camera_params(self.db_path, camera_id, params, model=6)

        lines: List[str] = []
        for frame_num, w2c in enumerate(extrinsics):
            q = colmap_io.rotmat2qvec(w2c[:3, :3])
            t = w2c[:3, 3]
            image_id = colmap_io.get_image_id_by_name(
                self.db_path, f"{frame_num:04}.png"
            )
            q_str = " ".join(str(v) for v in q)
            t_str = " ".join(str(v) for v in t)
            lines.append(f"{image_id} {q_str} {t_str} {camera_id} {frame_num:04}.png\n")
            lines.append("\n")
        (self.sparse_dirpath / "images.txt").write_text("".join(lines))

        self._colmap(
            "exhaustive_matcher", "--database_path", self.db_path.as_posix()
        )
        self._colmap(
            "point_triangulator",
            "--database_path", self.db_path.as_posix(),
            "--image_path", self.images_dirpath.as_posix(),
            "--input_path", self.sparse_dirpath.as_posix(),
            "--output_path", self.sparse_dirpath.as_posix(),
            "--Mapper.tri_ignore_two_view_tracks", "0",
            "--Mapper.num_threads", "16",
            "--Mapper.init_min_tri_angle", "4",
            "--Mapper.multiple_models", "0",
            "--Mapper.extract_colors", "0",
        )
        self._colmap(
            "model_converter",
            "--input_path", self.sparse_dirpath.as_posix(),
            "--output_path", self.sparse_dirpath.as_posix(),
            "--output_type", "TXT",
        )

    # --------------------------------------------------- model post-process

    def compute_colmap_depth(
        self,
    ) -> Tuple[Optional[List[pd.DataFrame]], Optional[pd.DataFrame]]:
        """Per-frame (x, y, depth, error, weight) tables (reference
        :232-289)."""
        if not (self.sparse_dirpath / "images.bin").exists():
            return None, None
        images = colmap_io.read_images_binary(self.sparse_dirpath / "images.bin")
        points = colmap_io.read_points3d_binary(
            self.sparse_dirpath / "points3D.bin"
        )
        if not points:
            return None, None

        errs = np.array([p.error for p in points.values()])
        err_mean = errs.mean()

        # depth along the camera z axis: z = r3^T (X - C) in the w2c frame
        poses = {}
        for i, im in images.items():
            w2c = np.eye(4)
            w2c[:3, :3] = im.qvec2rotmat()
            w2c[:3, 3] = im.tvec
            poses[i] = np.linalg.inv(w2c)

        per_image_z: Dict[int, List[float]] = {i: [] for i in images}
        for pt in points.values():
            for i in pt.image_ids:
                c2w = poses[int(i)]
                per_image_z[int(i)].append(c2w[:3, 2].T @ (pt.xyz - c2w[:3, 3]))
        bounds = []
        for i in sorted(images.keys()):
            zs = np.array(per_image_z[i])
            if zs.size == 0:
                return None, None
            bounds.append([np.percentile(zs, 0.5), np.percentile(zs, 99.5)])
        bds_raw = np.array(bounds, np.float32)

        depth_data_list = []
        for idx, image_id in enumerate(sorted(images.keys())):
            im = images[image_id]
            c2w = poses[image_id]
            rows = []
            for xy, pid in zip(im.xys, im.point3d_ids):
                if pid == -1:
                    continue
                pt = points[int(pid)]
                depth = c2w[:3, 2].T @ (pt.xyz - c2w[:3, 3])
                if depth < bds_raw[idx, 0] or depth > bds_raw[idx, 1]:
                    continue
                weight = 2 * np.exp(-((pt.error / err_mean) ** 2))
                rows.append([xy[0], xy[1], depth, pt.error, weight])
            depth_data_list.append(
                pd.DataFrame(
                    rows,
                    columns=["x", "y", "depth", "reprojection_error", "weight"],
                )
            )
        bounds_data = pd.DataFrame(bds_raw, columns=["near", "far"])
        return depth_data_list, bounds_data

    def estimate_sparse_depth(
        self, images: np.ndarray, extrinsics: np.ndarray, intrinsics: np.ndarray
    ):
        """Full pipeline (reference :291-296)."""
        self.clean_tmp_dir()
        camera_data = self.save_tmp_data(images, intrinsics)
        self.run_colmap(camera_data, extrinsics)
        return self.compute_colmap_depth()


def start_generation(gen_configs: Dict, root_dirpath: Optional[Path] = None):
    """Generate sparse-depth priors for every scene of a train set
    (reference DepthEstimator02_NeRF_LLFF.py:45-84)."""
    from vipnerf_tpu.priors.visibility import save_gen_configs
    from vipnerf_tpu.utils.naming import scene_dirname
    from vipnerf_tpu.utils.io import read_image

    root_dirpath = Path(root_dirpath) if root_dirpath else Path(".")
    database_dirpath = root_dirpath / "data/databases" / gen_configs["database_dirpath"]
    tmp_dirpath = root_dirpath / "tmp"

    scene_key = gen_configs.get("scene_key", "scene_name")
    split_dir = gen_configs.get("split_dir", "all")
    output_dirpath = (
        database_dirpath / f"{split_dir}/estimated_depths/DE{gen_configs['gen_num']:02}"
    )
    output_dirpath.mkdir(parents=True, exist_ok=True)
    save_gen_configs(output_dirpath, dict(gen_configs))

    set_num = gen_configs["gen_set_num"]
    video_data = pd.read_csv(
        database_dirpath / f"train_test_sets/set{set_num:02}/TrainVideosData.csv"
    )
    scene_ids = np.unique(video_data[scene_key].to_numpy())
    suffix = gen_configs.get("resolution_suffix", "")

    tester = ColmapTester(tmp_dirpath)
    for scene_id in scene_ids:
        scene_dir = scene_dirname(scene_id, scene_key)
        bounds_path = output_dirpath / f"{scene_dir}/EstimatedBounds.csv"
        if bounds_path.exists():
            continue
        frame_nums = video_data.loc[video_data[scene_key] == scene_id][
            "pred_frame_num"
        ].to_numpy()
        base = database_dirpath / f"{split_dir}/database_data/{scene_dir}"
        frames = np.stack(
            [read_image(base / f"rgb{suffix}/{f:04}.png") for f in frame_nums]
        )
        intrinsics = np.loadtxt(
            (base / f"CameraIntrinsics{suffix}.csv").as_posix(), delimiter=","
        ).reshape((-1, 3, 3))[frame_nums]
        extrinsics = np.loadtxt(
            (base / "CameraExtrinsics.csv").as_posix(), delimiter=","
        ).reshape((-1, 4, 4))[frame_nums]

        depth_data_list, bounds_data = tester.estimate_sparse_depth(
            frames, extrinsics, intrinsics
        )
        if depth_data_list is None:
            continue
        for i, frame_num in enumerate(frame_nums):
            depth_path = (
                output_dirpath
                / f"{scene_dir}/estimated_depths{suffix}/{frame_num:04}.csv"
            )
            depth_path.parent.mkdir(parents=True, exist_ok=True)
            depth_data_list[i].to_csv(depth_path, index=False)
        bounds_path.parent.mkdir(parents=True, exist_ok=True)
        bounds_data.to_csv(bounds_path, index=False)


if __name__ == "__main__":
    from vipnerf_tpu.priors.cli import main_sparse_depth

    main_sparse_depth()
