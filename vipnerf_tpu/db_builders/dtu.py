"""DTU database builder.

Parity targets (paths relative to /root/reference/):
- DataExtractor01_PixelNeRF (src/database_utils/dtu/data_organizers/
  DataExtractor01_PixelNeRF.py): pixelNeRF rs_dtu_4 archive -> per-scan
  rgb/{frame:04}.png (300x400) + camera decomposition from world_mat via
  cv2.decomposeProjectionMatrix, principal point forced to the image center,
  focal length averaged over frames, scale_mat normalization applied to the
  translation (:54-92)
- DataExtractor02_RegNeRF: RegNeRF idrmasks -> ObjectMasks/{frame:04}.png
  (downsampled, for the masked QA metrics)
- TrainTestCreator01_PixelNeRF: dense protocol — test frames
  [25, 22, 28, 40, 44, 48, 0, 8, 13], train = the rest of 0..48 (:35-38)
- TrainTestCreator02_PixelNeRF: sparse protocol — train =
  [25, 22, 28, 40, 44, 48, 0, 8, 13][:n], test = the rest, validation =
  [24, 26] (:33-41)
"""

from pathlib import Path
from typing import List, Optional

import numpy as np
import pandas as pd
import simplejson

PIXELNERF_TEST_SCENES = [8, 21, 30, 31, 34, 38, 40, 41, 45, 55, 63, 82, 103, 110, 114]
PIXELNERF_FRAME_ORDER = [25, 22, 28, 40, 44, 48, 0, 8, 13]


def decompose_world_mat(world_mat: np.ndarray, resolution,
                        scale_mat: Optional[np.ndarray] = None):
    """(intrinsic, w2c 4x4) from a 3x4 projection matrix (reference :54-86)."""
    import cv2

    intrinsic_raw, rot, trans = cv2.decomposeProjectionMatrix(world_mat[:3])[:3]
    intrinsic_raw = intrinsic_raw / intrinsic_raw[2, 2]
    intrinsic = np.eye(3)
    intrinsic[0, 0] = intrinsic_raw[0, 0]
    intrinsic[1, 1] = intrinsic_raw[1, 1]
    intrinsic[0, 2] = resolution[1] / 2
    intrinsic[1, 2] = resolution[0] / 2

    c2w = np.eye(4, dtype=np.float64)
    c2w[:3, :3] = rot.T
    c2w[:3, 3] = (trans[:3] / trans[3])[:, 0]
    if scale_mat is not None:
        norm_trans = scale_mat[:3, 3:]
        norm_scale = np.diagonal(scale_mat[:3, :3])[..., None]
        c2w[:3, 3:] -= norm_trans
        c2w[:3, 3:] /= norm_scale
    w2c = np.linalg.inv(c2w)
    return intrinsic, w2c


def extract_pixelnerf_data(unzipped_dirpath: Path, extracted_dirpath: Path):
    """rs_dtu_4 scans -> database layout (reference DataExtractor01)."""
    from vipnerf_tpu.utils.io import read_image, save_image

    unzipped_dirpath = Path(unzipped_dirpath)
    extracted_dirpath = Path(extracted_dirpath)
    for scene_dirpath in sorted(unzipped_dirpath.iterdir()):
        if not scene_dirpath.is_dir():
            continue
        scene_num = int(scene_dirpath.stem[4:])  # 'scanNNN'
        image_paths = sorted((scene_dirpath / "image").iterdir())
        num_frames = len(image_paths)
        resolution = None

        scene_out = extracted_dirpath / f"{scene_num:05}"
        for frame_num in range(num_frames):
            img = read_image(scene_dirpath / f"image/{frame_num:06}.png")
            if resolution is None:
                resolution = img.shape[:2]
            save_image(scene_out / f"rgb/{frame_num:04}.png", img)

        intrinsics, extrinsics = [], []
        with np.load((scene_dirpath / "cameras.npz").as_posix()) as cams:
            for frame_num in range(num_frames):
                scale_mat = cams.get(f"scale_mat_{frame_num}")
                intrinsic, w2c = decompose_world_mat(
                    cams[f"world_mat_{frame_num}"], resolution, scale_mat
                )
                intrinsics.append(intrinsic)
                extrinsics.append(w2c)
        intrinsics = np.stack(intrinsics)
        # shared focal = mean of fx, fy over all frames (reference :88-92)
        focal = np.sum(intrinsics[:, 0, 0] + intrinsics[:, 1, 1]) / (
            2 * num_frames
        )
        intrinsics[:, 0, 0] = focal
        intrinsics[:, 1, 1] = focal
        np.savetxt(
            scene_out / "CameraIntrinsics.csv",
            intrinsics.reshape(-1, 9),
            delimiter=",",
        )
        np.savetxt(
            scene_out / "CameraExtrinsics.csv",
            np.stack(extrinsics).reshape(-1, 16),
            delimiter=",",
        )


def extract_regnerf_masks(
    idrmasks_dirpath: Path, extracted_dirpath: Path, downsampling_factor: int = 4
):
    """RegNeRF idrmasks -> ObjectMasks for masked QA (reference
    DataExtractor02_RegNeRF)."""
    from vipnerf_tpu.utils.io import read_image, rescale_image, save_image

    idrmasks_dirpath = Path(idrmasks_dirpath)
    for scene_dirpath in sorted(idrmasks_dirpath.iterdir()):
        if not scene_dirpath.is_dir():
            continue
        scene_num = int(scene_dirpath.stem[4:])
        frame_num = 0
        while True:
            src = scene_dirpath / f"{frame_num:03}.png"
            if not src.exists():
                src = scene_dirpath / f"mask/{frame_num:03}.png"
            if not src.exists():
                break
            mask = read_image(src)
            if mask.ndim == 3:
                mask = mask[..., 0]
            down = rescale_image(
                (mask > 127).astype(np.float32), downsampling_factor,
                anti_aliasing=False,
            )
            out = (
                Path(extracted_dirpath)
                / f"{scene_num:05}/ObjectMasks/{frame_num:04}.png"
            )
            save_image(out, ((down > 0.5) * 255).astype(np.uint8))
            frame_num += 1


def create_train_test_set(
    database_dirpath: Path,
    set_num: int,
    num_train_frames: int,
    *,
    protocol: str = "sparse",
    scene_nums: Optional[List[int]] = None,
):
    """pixelNeRF-protocol splits (reference TrainTestCreator0{1,2})."""
    scene_nums = scene_nums or PIXELNERF_TEST_SCENES
    if protocol == "sparse":
        train_frames = PIXELNERF_FRAME_ORDER[:num_train_frames]
        test_frames = [f for f in range(49) if f not in PIXELNERF_FRAME_ORDER]
        val_frames = [PIXELNERF_FRAME_ORDER[0] - 1, PIXELNERF_FRAME_ORDER[0] + 1]
    elif protocol == "dense":
        test_frames = PIXELNERF_FRAME_ORDER
        train_frames = [f for f in range(49) if f not in test_frames]
        val_frames = test_frames[:2]
    else:
        raise RuntimeError(f"Unknown protocol: {protocol}")

    set_dirpath = Path(database_dirpath) / f"train_test_sets/set{set_num:02}"
    set_dirpath.mkdir(parents=True, exist_ok=True)

    def table(frames):
        rows = [[s, f] for s in scene_nums for f in sorted(frames)]
        return pd.DataFrame(rows, columns=["scene_num", "pred_frame_num"])

    table(train_frames).to_csv(set_dirpath / "TrainVideosData.csv", index=False)
    table(test_frames).to_csv(set_dirpath / "TestVideosData.csv", index=False)
    table(val_frames).to_csv(
        set_dirpath / "ValidationVideosData.csv", index=False
    )
    with open(set_dirpath / "Configs.json", "w") as f:
        simplejson.dump(
            {
                "creator": f"TrainTestCreator_PixelNeRF_{protocol}",
                "set_num": set_num,
                "num_train_frames": num_train_frames,
            },
            f,
            indent=4,
        )


def main():
    import argparse

    parser = argparse.ArgumentParser(description="DTU database builder")
    parser.add_argument("--database_dirpath", required=True)
    parser.add_argument("--rs_dtu_4_dirpath", default=None)
    parser.add_argument("--idrmasks_dirpath", default=None)
    parser.add_argument("--set_nums", type=int, nargs="*", default=[1, 2, 3, 4])
    parser.add_argument(
        "--num_train_frames", type=int, nargs="*", default=[-1, 2, 3, 4]
    )
    args = parser.parse_args()

    db = Path(args.database_dirpath)
    if args.rs_dtu_4_dirpath:
        extract_pixelnerf_data(args.rs_dtu_4_dirpath, db / "all/database_data")
    if args.idrmasks_dirpath:
        extract_regnerf_masks(args.idrmasks_dirpath, db / "all/database_data")
    for set_num, n in zip(args.set_nums, args.num_train_frames):
        protocol = "dense" if n == -1 else "sparse"
        create_train_test_set(db, set_num, n, protocol=protocol)


if __name__ == "__main__":
    main()
