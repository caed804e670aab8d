"""RealEstate-10K database builder.

Parity targets (paths relative to /root/reference/):
- DataExtractor01 (src/database_utils/real_estate_10k/data_organizers/
  DataExtractor01.py): parse the RealEstate10K per-video camera files
  (lines: timestamp, fx fy px py (normalized), k1 k2, 3x4 w2c pose),
  intrinsics scaled by resolution (:137-148), extrinsics padded to 4x4
  (:151-157), frames extracted from the source video (the reference shells
  out to ffmpeg at exact timestamps — frame extraction here requires cv2's
  VideoCapture or pre-extracted frames; downloading videos is out of scope
  for both implementations, database_utils/README.md:3-5)
- VideoNameMapper (VideoNameMapper.py): map video hash names to scene
  numbers
- TrainTestCreator01: fixed frame-number splits — sparse train frames
  [10, 20, 30, 0, 40][:n], test = the rest of 0..49, validation = 3 frames
  from the test list (:33-48)
- VideoPoseCreator01_Original: the original camera trajectory as the video
  path.
"""

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import simplejson


def parse_camera_file(path: Path) -> Dict[str, np.ndarray]:
    """Parse a RealEstate10K camera file: first line is the video URL, each
    following line is
    timestamp fx fy px py k1 k2 r11..r34 (19 floats after the timestamp)."""
    lines = Path(path).read_text().strip().splitlines()
    url = lines[0].strip()
    rows = np.array([[float(x) for x in line.split()] for line in lines[1:]])
    return {
        "url": url,
        "timestamps": rows[:, 0].astype(np.int64),
        "intrinsics_norm": rows[:, 1:5],
        "poses_3x4": rows[:, 7:19].reshape(-1, 3, 4),
    }


def compute_intrinsic_matrices(
    intrinsics_norm: np.ndarray, resolution
) -> np.ndarray:
    """Normalized (fx, fy, px, py) -> pixel-space 3x3 (reference :137-148)."""
    h, w = resolution
    n = intrinsics_norm.shape[0]
    out = np.zeros((n, 3, 3), np.float32)
    out[:, 0, 0] = w * intrinsics_norm[:, 0]
    out[:, 1, 1] = h * intrinsics_norm[:, 1]
    out[:, 0, 2] = w * intrinsics_norm[:, 2]
    out[:, 1, 2] = h * intrinsics_norm[:, 3]
    out[:, 2, 2] = 1
    return out


def compute_extrinsic_matrices(poses_3x4: np.ndarray) -> np.ndarray:
    """3x4 w2c -> 4x4 (reference :151-157)."""
    n = poses_3x4.shape[0]
    bottom = np.zeros((n, 1, 4), poses_3x4.dtype)
    bottom[:, 0, 3] = 1
    return np.concatenate([poses_3x4, bottom], axis=1)


def map_video_names(camera_files_dirpath: Path, output_path: Path):
    """Video hash -> scene number mapping (reference VideoNameMapper)."""
    names = sorted(p.stem for p in Path(camera_files_dirpath).glob("*.txt"))
    rows = [[name, i] for i, name in enumerate(names)]
    pd.DataFrame(rows, columns=["VideoName", "SceneNum"]).to_csv(
        output_path, index=False
    )


def extract_frames_from_video(
    video_path: Path, timestamps_us: np.ndarray
) -> Optional[np.ndarray]:
    """Grab the frames nearest each (microsecond) timestamp via OpenCV
    (replaces the reference's ffmpeg -ss subprocess per frame, :89-135)."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        return None
    frames = []
    for ts in timestamps_us:
        cap.set(cv2.CAP_PROP_POS_MSEC, ts / 1000.0)
        ok, frame = cap.read()
        if not ok:
            cap.release()
            return None
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames)


def extract_scene(
    camera_file: Path,
    scene_num: int,
    output_dirpath: Path,
    *,
    num_frames: int = 50,
    resolution=(576, 1024),
    video_path: Optional[Path] = None,
):
    """One scene -> test/database_data/{scene:05}/ layout."""
    from vipnerf_tpu.utils.io import save_image

    data = parse_camera_file(camera_file)
    sel = slice(0, num_frames)
    scene_dir = Path(output_dirpath) / f"{scene_num:05}"
    scene_dir.mkdir(parents=True, exist_ok=True)

    intrinsics = compute_intrinsic_matrices(data["intrinsics_norm"][sel], resolution)
    extrinsics = compute_extrinsic_matrices(data["poses_3x4"][sel])
    np.savetxt(
        scene_dir / "CameraIntrinsics.csv",
        intrinsics.reshape(-1, 9),
        delimiter=",",
    )
    np.savetxt(
        scene_dir / "CameraExtrinsics.csv",
        extrinsics.reshape(-1, 16),
        delimiter=",",
    )
    if video_path is not None:
        frames = extract_frames_from_video(video_path, data["timestamps"][sel])
        if frames is not None:
            for i, frame in enumerate(frames):
                save_image(scene_dir / f"rgb/{i:04}.png", frame)


def create_train_test_set(
    database_dirpath: Path,
    set_num: int,
    scene_nums: List[int],
    num_train_frames: int,
    train_views_density: str = "sparse",
):
    """Fixed RealEstate splits (reference TrainTestCreator01 :30-48)."""
    if train_views_density == "sparse":
        train_frames = [10, 20, 30, 0, 40][:num_train_frames]
        train_frames = sorted(train_frames)
        test_frames = sorted(set(range(50)) - set(train_frames))
    elif train_views_density == "dense":
        test_frames = list(range(0, 50, 5))
        train_frames = sorted(set(range(50)) - set(test_frames))
    else:
        raise RuntimeError(f"Unknown train views density: {train_views_density}")
    val_frames = test_frames[:: len(test_frames) // 5][1:4]

    set_dirpath = Path(database_dirpath) / f"train_test_sets/set{set_num:02}"
    set_dirpath.mkdir(parents=True, exist_ok=True)

    def frame_table(frames):
        rows = [[s, f] for s in scene_nums for f in frames]
        return pd.DataFrame(rows, columns=["scene_num", "pred_frame_num"])

    frame_table(train_frames).to_csv(
        set_dirpath / "TrainVideosData.csv", index=False
    )
    frame_table(test_frames).to_csv(set_dirpath / "TestVideosData.csv", index=False)
    frame_table(val_frames).to_csv(
        set_dirpath / "ValidationVideosData.csv", index=False
    )
    with open(set_dirpath / "Configs.json", "w") as f:
        simplejson.dump(
            {
                "creator": "TrainTestCreator01",
                "set_num": set_num,
                "scene_nums": list(scene_nums),
                "num_train_frames": num_train_frames,
                "train_views_density": train_views_density,
            },
            f,
            indent=4,
        )


def create_original_video_poses(
    database_dirpath: Path, set_num: int, video_num: int = 1
):
    """Original camera trajectory as the render path (reference
    VideoPoseCreator01_Original)."""
    database_dirpath = Path(database_dirpath)
    out = (
        database_dirpath
        / f"train_test_sets/set{set_num:02}/video_poses{video_num:02}"
    )
    out.mkdir(parents=True, exist_ok=True)
    test_data = pd.read_csv(
        database_dirpath / f"train_test_sets/set{set_num:02}/TestVideosData.csv"
    )
    for scene_num in np.unique(test_data["scene_num"]):
        scene_dir = database_dirpath / f"test/database_data/{int(scene_num):05}"
        extr = np.loadtxt(
            (scene_dir / "CameraExtrinsics.csv").as_posix(), delimiter=","
        )
        # first row duplicated: tester skips pose 0 (apps video path uses
        # extrinsics[f + 1]); prepend the first pose as the anchor.
        poses = np.concatenate([extr[:1], extr], axis=0)
        np.savetxt(out / f"{int(scene_num):05}.csv", poses, delimiter=",")


def main():
    import argparse

    parser = argparse.ArgumentParser(description="RealEstate10K database builder")
    parser.add_argument("--database_dirpath", required=True)
    parser.add_argument("--camera_files_dirpath", default=None)
    parser.add_argument("--videos_dirpath", default=None)
    parser.add_argument("--scene_nums", type=int, nargs="*",
                        default=[0, 1, 2, 3, 4, 5, 6])
    parser.add_argument("--set_nums", type=int, nargs="*", default=[1, 2, 3, 4])
    parser.add_argument("--num_train_frames", type=int, nargs="*",
                        default=[2, 2, 3, 4])
    args = parser.parse_args()

    db = Path(args.database_dirpath)
    if args.camera_files_dirpath:
        cam_dir = Path(args.camera_files_dirpath)
        map_video_names(cam_dir, db / "test/VideoNameMapping.csv")
        names = sorted(p for p in cam_dir.glob("*.txt"))
        for i, cam_file in enumerate(names):
            if i not in args.scene_nums:
                continue
            video_path = None
            if args.videos_dirpath:
                candidates = list(Path(args.videos_dirpath).glob(f"{cam_file.stem}.*"))
                video_path = candidates[0] if candidates else None
            extract_scene(
                cam_file, i, db / "test/database_data", video_path=video_path
            )
    for set_num, n in zip(args.set_nums, args.num_train_frames):
        create_train_test_set(db, set_num, args.scene_nums, n)
        create_original_video_poses(db, set_num)


if __name__ == "__main__":
    main()
