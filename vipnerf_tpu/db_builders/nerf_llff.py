"""NeRF-LLFF database builder.

Parity targets (paths relative to /root/reference/):
- DataExtractor01 (src/database_utils/nerf_llff/data_organizers/
  DataExtractor01.py): unzip nerf_llff_data.zip, parse the per-scene COLMAP
  binary model -> rgb/, rgb_down4/, rgb_down8/, CameraExtrinsics.csv
  (flattened w2c 4x4), CameraIntrinsics{,_down4,_down8}.csv, DepthBounds.csv
  (from poses_bounds.npy cols 15:17), FrameNamesMapping.csv
- TrainTestCreator01_UniformSparseSampling (.../train_test_creators/...):
  every-8th-frame test split, n uniformly spaced train views among the rest,
  middle test frame as validation (:20-60)
- VideoPoseCreator01_Spiral: the classic LLFF spiral render path in the
  original camera convention, num_frames+1 poses with the average pose
  prepended (:100-166)

These run offline on host (pure numpy + imageio); COLMAP model parsing uses
vipnerf_tpu.priors.colmap_io.
"""

import shutil
from pathlib import Path
from typing import Optional
from zipfile import ZipFile

import numpy as np
import pandas as pd

from vipnerf_tpu.core.poses import (
    change_coordinate_system,
    compute_average_pose,
)
from vipnerf_tpu.priors import colmap_io
from vipnerf_tpu.utils.io import read_image, save_image


def unzip_data(zip_filepath: Path, database_data_dirpath: Path):
    database_data_dirpath.parent.mkdir(parents=True, exist_ok=True)
    with ZipFile(zip_filepath, "r") as zf:
        zf.extractall(database_data_dirpath.parent)
    shutil.move(
        database_data_dirpath.parent / "nerf_llff_data", database_data_dirpath
    )


def extract_scene_data(scene_dirpath: Path):
    """One scene: COLMAP model + image pyramids -> database layout."""
    cams = colmap_io.read_cameras_binary(scene_dirpath / "sparse/0/cameras.bin")
    images = colmap_io.read_images_binary(scene_dirpath / "sparse/0/images.bin")
    bounds = np.load((scene_dirpath / "poses_bounds.npy").as_posix())[:, 15:17]

    names_mapping, intrinsics, extrinsics, bds = [], [], [], []
    down4 = sorted(
        p for p in (scene_dirpath / "images_4").iterdir() if p.is_file()
    )
    down8 = sorted(
        p for p in (scene_dirpath / "images_8").iterdir() if p.is_file()
    )
    for frame_num, key in enumerate(images):
        im = images[key]
        cam = cams[im.camera_id]
        intrinsic = np.eye(3)
        intrinsic[0, 0] = intrinsic[1, 1] = cam.params[0]
        intrinsic[0, 2] = cam.width / 2
        intrinsic[1, 2] = cam.height / 2

        extrinsic = np.eye(4)
        extrinsic[:3, :3] = im.qvec2rotmat()
        extrinsic[:3, 3] = im.tvec

        names_mapping.append([Path(im.name).stem, frame_num])
        intrinsics.append(intrinsic.ravel())
        extrinsics.append(extrinsic.ravel())
        bds.append(bounds[frame_num])

        src = next(scene_dirpath.glob(f"images/{Path(im.name).stem}.*"))
        save_image(scene_dirpath / f"rgb/{frame_num:04}.png", read_image(src))
        save_image(
            scene_dirpath / f"rgb_down4/{frame_num:04}.png",
            read_image(down4[frame_num]),
        )
        save_image(
            scene_dirpath / f"rgb_down8/{frame_num:04}.png",
            read_image(down8[frame_num]),
        )

    pd.DataFrame(
        names_mapping, columns=["OldFrameName", "NewFrameNum"]
    ).to_csv(scene_dirpath / "FrameNamesMapping.csv", index=False)

    intr = np.stack(intrinsics)
    np.savetxt(scene_dirpath / "CameraIntrinsics.csv", intr, delimiter=",")
    for factor in (4, 8):
        scaled = intr.copy()
        for col in (0, 4, 2, 5):  # fx, fy, cx, cy in the flattened 3x3
            scaled[:, col] /= factor
        np.savetxt(
            scene_dirpath / f"CameraIntrinsics_down{factor}.csv",
            scaled,
            delimiter=",",
        )
    np.savetxt(
        scene_dirpath / "CameraExtrinsics.csv", np.stack(extrinsics), delimiter=","
    )
    np.savetxt(scene_dirpath / "DepthBounds.csv", np.stack(bds), delimiter=",")


def extract_data(database_data_dirpath: Path):
    for scene_dirpath in sorted(Path(database_data_dirpath).iterdir()):
        if scene_dirpath.is_dir():
            extract_scene_data(scene_dirpath)


# ------------------------------------------------------- train/test creator

def sample_sparse_train_frames(frame_nums, num_frames: int):
    """n uniformly spaced frames (reference TrainTestCreator01 :20-26)."""
    if num_frames == -1:
        return np.asarray(frame_nums)
    idx = np.round(np.linspace(-1, len(frame_nums), num_frames + 2)).astype(int)
    return np.asarray(frame_nums)[idx[1:-1]]


def create_train_test_set(database_dirpath: Path, set_num: int, num_train_frames: int):
    """Every-8th test split + sparse train sampling (reference :40-70)."""
    database_dirpath = Path(database_dirpath)
    set_dirpath = database_dirpath / f"train_test_sets/set{set_num:02}"
    set_dirpath.mkdir(parents=True, exist_ok=True)

    scenes_dirpath = database_dirpath / "all/database_data"
    scene_names = sorted(p.stem for p in scenes_dirpath.iterdir() if p.is_dir())
    train_rows, val_rows, test_rows = [], [], []
    for scene_name in scene_names:
        frames_dir = scenes_dirpath / f"{scene_name}/rgb"
        frame_nums = sorted(int(p.stem) for p in frames_dir.iterdir())
        test_frames = list(range(0, len(frame_nums), 8))
        train_candidates = sorted(set(frame_nums) - set(test_frames))
        train_frames = sample_sparse_train_frames(train_candidates, num_train_frames)
        val_frames = [test_frames[len(test_frames) // 2]]
        train_rows += [[scene_name, int(f)] for f in train_frames]
        test_rows += [[scene_name, int(f)] for f in test_frames]
        val_rows += [[scene_name, int(f)] for f in val_frames]

    for rows, name in (
        (train_rows, "Train"),
        (val_rows, "Validation"),
        (test_rows, "Test"),
    ):
        pd.DataFrame(rows, columns=["scene_name", "pred_frame_num"]).to_csv(
            set_dirpath / f"{name}VideosData.csv", index=False
        )
    import simplejson

    with open(set_dirpath / "Configs.json", "w") as f:
        simplejson.dump(
            {
                "creator": "TrainTestCreator01_UniformSparseSampling",
                "set_num": set_num,
                "num_train_frames": num_train_frames,
            },
            f,
            indent=4,
        )


# ----------------------------------------------------------- spiral video

def _normalize(x):
    return x / np.linalg.norm(x)


def _view_matrix(z, up, pos):
    vec2 = _normalize(z)
    vec0 = _normalize(np.cross(up, vec2))
    vec1 = _normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, pos], axis=1)


def _poses_avg(poses):
    center = poses[:, :3, 3].mean(0)
    vec2 = _normalize(poses[:, :3, 2].sum(0))
    up = poses[:, :3, 1].sum(0)
    m = _view_matrix(vec2, up, center)
    return np.concatenate([m, np.array([[0, 0, 0, 1.0]])], axis=0)


def render_path_spiral(c2w, up, rads, focal, zrate, rots, n):
    """Classic LLFF helix around the average pose (reference :100-110)."""
    rads = np.array(list(rads) + [1.0])
    poses = []
    for theta in np.linspace(0.0, 2.0 * np.pi * rots, n + 1)[:-1]:
        c = c2w[:3, :4] @ (
            np.array(
                [np.cos(theta), -np.sin(theta), -np.sin(theta * zrate), 1.0]
            )
            * rads
        )
        z = _normalize(c - c2w[:3, :4] @ np.array([0, 0, -focal, 1.0]))
        m = _view_matrix(z, up, c)
        poses.append(np.concatenate([m, np.array([[0, 0, 0, 1.0]])], axis=0))
    return poses


def create_video_poses(
    w2c_mats: np.ndarray, num_frames: int, num_rotations: int,
    bds: np.ndarray, bd_factor: Optional[float],
):
    """Spiral render path in the original (Colmap) convention (reference
    create_video_poses :112-166): convert to NeRF convention, scale, build
    the helix, then invert all preprocessing so the output CSV holds w2c
    extrinsics directly consumable by the tester."""
    avg_pose = compute_average_pose(w2c_mats.copy())

    # to recentered NeRF-convention c2w
    flip = np.diag([1.0, -1.0, -1.0])
    c2w_nerf = change_coordinate_system(
        avg_pose[None] @ np.linalg.inv(w2c_mats), flip
    )

    bds = np.asarray(bds, np.float64).copy()
    sc = 1.0 if bd_factor is None else 1.0 / (float(bds.min()) * bd_factor)
    c2w_nerf[:, :3, 3] *= sc
    bds *= sc

    c2w_avg = _poses_avg(c2w_nerf)
    up = _normalize(c2w_nerf[:, :3, 1].sum(0))

    close_depth, inf_depth = bds.min() * 0.9, bds.max() * 5.0
    dt = 0.75
    focal = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
    tt = c2w_nerf[:, :3, 3]
    rads = np.percentile(np.abs(tt), 90, axis=0)

    render_c2w = np.stack(
        render_path_spiral(
            c2w_avg, up, rads, focal, zrate=0.5, rots=num_rotations, n=num_frames
        )
    )

    # invert: NeRF convention -> Colmap convention -> un-recenter -> unscale
    cv_poses = change_coordinate_system(render_c2w, flip)
    video_w2c = np.linalg.inv(np.linalg.inv(avg_pose)[None] @ cv_poses)
    video_w2c[:, :3, 3] /= sc

    center = _poses_avg(video_w2c)
    return np.concatenate([center[None], video_w2c], axis=0)


def create_spiral_video_poses(
    database_dirpath: Path,
    set_num: int,
    num_frames: int = 120,
    num_rotations: int = 2,
    bd_factor: Optional[float] = 0.75,
    video_num: int = 1,
):
    """Write video_poses{NN}/{scene}.csv + VideoFrameNums.csv (reference
    save_video_poses :184-217)."""
    database_dirpath = Path(database_dirpath)
    out = database_dirpath / f"train_test_sets/set{set_num:02}/video_poses{video_num:02}"
    out.mkdir(parents=True, exist_ok=True)
    train_data = pd.read_csv(
        database_dirpath / f"train_test_sets/set{set_num:02}/TrainVideosData.csv"
    )
    for scene_name in np.unique(train_data["scene_name"]):
        base = database_dirpath / f"all/database_data/{scene_name}"
        w2c = np.loadtxt(
            (base / "CameraExtrinsics.csv").as_posix(), delimiter=","
        ).reshape(-1, 4, 4)
        bds = np.loadtxt((base / "DepthBounds.csv").as_posix(), delimiter=",")
        poses = create_video_poses(w2c, num_frames, num_rotations, bds, bd_factor)
        np.savetxt(
            out / f"{scene_name}.csv",
            poses.reshape(poses.shape[0], -1),
            delimiter=",",
        )
    np.savetxt(
        out / "VideoFrameNums.csv", np.arange(num_frames), fmt="%i", delimiter=","
    )


def main():
    import argparse

    parser = argparse.ArgumentParser(description="NeRF-LLFF database builder")
    parser.add_argument("--database_dirpath", required=True)
    parser.add_argument("--zip_filepath", default=None)
    parser.add_argument("--set_nums", type=int, nargs="*", default=[1, 2, 3, 4])
    parser.add_argument(
        "--num_train_frames", type=int, nargs="*", default=[-1, 2, 3, 4]
    )
    parser.add_argument("--video_poses", action="store_true")
    args = parser.parse_args()

    db = Path(args.database_dirpath)
    if args.zip_filepath:
        unzip_data(Path(args.zip_filepath), db / "all/database_data")
        extract_data(db / "all/database_data")
    for set_num, n in zip(args.set_nums, args.num_train_frames):
        create_train_test_set(db, set_num, n)
        if args.video_poses:
            create_spiral_video_poses(db, set_num)


if __name__ == "__main__":
    main()
