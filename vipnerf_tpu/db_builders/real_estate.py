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
- SceneSelector01: pre-download scene curation — score camera-motion
  segments per video, keep windows whose motion is primarily x/y (not
  dolly-z) and above a translation threshold, then mix top-scored and
  random scenes (:50-135).
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
    step_size: int = 1,
    start_timestamp: Optional[int] = None,
    resolution=(576, 1024),
    video_path: Optional[Path] = None,
):
    """One scene -> test/database_data/{scene:05}/ layout.

    The extracted window matches the reference DataExtractor01 (:70-73):
    starting at the camera-file line whose timestamp equals the curated
    `start_timestamp` (from SceneSelector's Cache/AllScenesData.csv), taking
    `num_frames` rows strided by `step_size`. Frames are resized to
    `resolution` before saving (:120-124) so the saved pixels match the
    intrinsics computed for that resolution."""
    from vipnerf_tpu.utils.io import save_image

    data = parse_camera_file(camera_file)
    if start_timestamp is None:
        start = 0
    else:
        matches = np.flatnonzero(data["timestamps"] == int(start_timestamp))
        if matches.size == 0:
            raise RuntimeError(
                f"start_timestamp {start_timestamp} not found in {camera_file}"
            )
        start = int(matches[0])
    sel = slice(start, start + num_frames * step_size, step_size)
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
            h, w = resolution
            if frames.shape[1:3] != (h, w):
                import cv2

                frames = np.stack(
                    [
                        cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA)
                        for f in frames
                    ]
                )
            for i, frame in enumerate(frames):
                save_image(scene_dir / f"rgb/{i:04}.png", frame)


def create_train_test_set(
    database_dirpath: Path,
    set_num: int,
    scene_nums: List[int],
    num_train_frames: int,
    train_views_density: str = "sparse",
):
    """Fixed RealEstate splits (reference TrainTestCreator01 :39-49).

    The sparse test split excludes ALL FIVE candidate train frames
    [10, 20, 30, 0, 40] regardless of how many are actually trained on
    (so e.g. set02 with 2 train frames still holds out frames 0 and 40
    entirely — verified against the published set0{2,3,4} CSVs shipped in
    the reference's data/ tree)."""
    candidates = [10, 20, 30, 0, 40]
    if train_views_density == "sparse":
        train_frames = sorted(candidates[:num_train_frames])
        test_frames = sorted(set(range(50)) - set(candidates))
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


def _segment_motion_stats(
    poses_3x4: np.ndarray, step_size: int, num_frames_per_scene: int
) -> Optional[np.ndarray]:
    """Per-segment |relative translation| stats (reference SceneSelector01
    compute_distances + the per-window strided slicing :64-67, :111-123).

    Returns (num_segments, num_frames_per_scene - 1, 4) of abs
    [tx, ty, tz, norm] per step inside each sliding window, or None when the
    video is too short for a single window.
    """
    n = poses_3x4.shape[0]
    num_segments = n - (num_frames_per_scene - 1) * step_size
    if num_segments <= 0:
        return None
    t = compute_extrinsic_matrices(poses_3x4)
    rel = t[step_size:] @ np.linalg.inv(t[:-step_size])
    trans = rel[:, :3, 3]
    steps = np.abs(
        np.concatenate([trans, np.linalg.norm(trans, axis=1, keepdims=True)], 1)
    )
    window = (num_frames_per_scene - 1) * step_size
    return np.stack(
        [steps[i:i + window:step_size] for i in range(num_segments)]
    )


def select_scenes(
    extracted_dirpath: Path,
    output_dirpath: Path,
    *,
    num_scenes: int = 10,
    percentage_xy_motion_scenes: int = 50,
    step_size: int = 1,
    start_offset: int = 15,
    end_offset: int = 0,
    num_frames_per_scene: int = 50,
    translation_threshold: float = 0.01,
    seed: int = 0,
):
    """Motion-based scene curation (reference SceneSelector01).

    For every video under `extracted_dirpath` ({scene}/CameraData.txt), score
    each `num_frames_per_scene`-frame window: keep it when every step moves
    at least `translation_threshold` AND some step moves more in x or y than
    in z (sideways/vertical parallax rather than pure dolly — the motion
    ViP-NeRF's visibility prior benefits from). Select the
    `percentage_xy_motion_scenes`% best-scored scenes plus random scenes for
    the rest, one window per scene (reference select_segments :88-110).

    Writes the reference's output contract into `output_dirpath`:
    Cache/{All,Filtered,Random}ScenesData.csv with
    (scene_name, start_timestamp) and a strict Configs.json.
    """
    extracted_dirpath = Path(extracted_dirpath)
    output_dirpath = Path(output_dirpath)
    rng = np.random.default_rng(seed)

    filtered_rows = []  # (scene, timestamp, mean |translation| score)
    random_rows = []
    for scene_dir in sorted(p for p in extracted_dirpath.iterdir() if p.is_dir()):
        cam_path = scene_dir / "CameraData.txt"
        if not cam_path.exists():
            continue
        data = parse_camera_file(cam_path)
        stop = len(data["timestamps"]) - end_offset
        poses = data["poses_3x4"][start_offset:stop]
        timestamps = data["timestamps"][start_offset:stop]
        stats = _segment_motion_stats(poses, step_size, num_frames_per_scene)
        if stats is None:
            continue
        num_segments = stats.shape[0]
        random_rows.append(
            (scene_dir.name, int(timestamps[rng.integers(0, num_segments)]))
        )
        # segment_filter01 (:140-148): per-window translation floor on the
        # step norms, and any step with |tz| < |tx| or |tz| < |ty|
        keep = (stats[:, :, 3].min(axis=1) >= translation_threshold) & np.any(
            (stats[:, :, 2] < stats[:, :, 0]) | (stats[:, :, 2] < stats[:, :, 1]),
            axis=1,
        )
        if not keep.any():
            continue
        scores = stats[:, :, 3].mean(axis=1)
        best = int(np.flatnonzero(keep)[np.argmax(scores[keep])])
        filtered_rows.append(
            (scene_dir.name, int(timestamps[best]), float(scores[best]))
        )

    num_filtered = num_scenes * percentage_xy_motion_scenes // 100
    num_random = num_scenes - num_filtered
    filtered_rows.sort(key=lambda r: -r[2])
    selected_filtered = [(s, t) for s, t, _ in filtered_rows[:num_filtered]]
    chosen = {s for s, _ in selected_filtered}
    # Reference select_segments (:88-110): the random bucket is the deduped
    # concat [selected_filtered, random] sliced [num_filtered:][:num_random]
    # — when fewer scenes pass the filter than requested, the slice SKIPS
    # the first (num_filtered - len(selected_filtered)) random candidates
    # and the output under-fills num_scenes, rather than topping up.
    random_pool = [(s, t) for s, t in random_rows if s not in chosen]
    skip = num_filtered - len(selected_filtered)
    selected_random = random_pool[skip:skip + num_random]

    cache_dir = output_dirpath / "Cache"
    cache_dir.mkdir(parents=True, exist_ok=True)
    cols = ["scene_name", "start_timestamp"]
    all_df = pd.DataFrame(
        sorted(selected_filtered + selected_random), columns=cols
    )
    all_df.to_csv(cache_dir / "AllScenesData.csv", index=False)
    pd.DataFrame(sorted(selected_filtered), columns=cols).to_csv(
        cache_dir / "FilteredScenesData.csv", index=False
    )
    pd.DataFrame(sorted(selected_random), columns=cols).to_csv(
        cache_dir / "RandomScenesData.csv", index=False
    )
    from vipnerf_tpu.priors.visibility import save_gen_configs

    # The reference SceneSelector back-fills missing keys in BOTH directions
    # before diffing (SceneSelector01.py:150-165), so a key newly added to
    # the code does not block resuming over an older output dir.
    save_gen_configs(
        output_dirpath,
        {
            "SceneSelector": "vipnerf_tpu.db_builders.real_estate",
            "num_scenes": num_scenes,
            "percentage_xy_motion_scenes": percentage_xy_motion_scenes,
            "step_size": step_size,
            "start_offset": start_offset,
            "end_offset": end_offset,
            "num_frames_per_scene": num_frames_per_scene,
            "segment_filter": {
                "name": "segment_filter01",
                "translation_threshold": translation_threshold,
            },
            # persisted so the strict-resume check catches a changed seed
            # (the random bucket depends on it)
            "seed": seed,
        },
        backfill_new_keys=True,
    )
    return all_df


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
                        default=[-1, 2, 3, 4],
                        help="-1 = dense protocol (published set01)")
    parser.add_argument("--select_scenes_from", default=None,
                        help="extracted_data dir: run motion-based scene "
                             "selection (SceneSelector01) instead of building")
    parser.add_argument("--select_output", default=None)
    parser.add_argument("--num_scenes", type=int, default=10)
    parser.add_argument("--scenes_data_csv", default=None,
                        help="Cache/AllScenesData.csv from --select_scenes_from"
                             ": restricts extraction to the curated scenes and"
                             " starts each window at its start_timestamp")
    parser.add_argument("--step_size", type=int, default=1)
    parser.add_argument("--num_frames_per_scene", type=int, default=50)
    args = parser.parse_args()

    db = Path(args.database_dirpath)
    if args.select_scenes_from:
        select_scenes(
            Path(args.select_scenes_from),
            Path(args.select_output or db / "processed_data/test01"),
            num_scenes=args.num_scenes,
        )
        return
    if args.camera_files_dirpath:
        cam_dir = Path(args.camera_files_dirpath)
        map_video_names(cam_dir, db / "test/VideoNameMapping.csv")
        names = sorted(p for p in cam_dir.glob("*.txt"))
        # curated windows keyed by scene name: SceneSelector writes the
        # extracted dir name, which is the video hash (camera-file stem) in
        # this layout or the zero-padded scene number in the reference's
        windows = None
        if args.scenes_data_csv:
            df = pd.read_csv(args.scenes_data_csv)
            windows = {
                str(r["scene_name"]): int(r["start_timestamp"])
                for _, r in df.iterrows()
            }
        for i, cam_file in enumerate(names):
            if i not in args.scene_nums:
                continue
            start_timestamp = None
            if windows is not None:
                for key in (cam_file.stem, f"{i:05}", str(i)):
                    if key in windows:
                        start_timestamp = windows[key]
                        break
                else:
                    continue  # not a curated scene
            video_path = None
            if args.videos_dirpath:
                candidates = list(Path(args.videos_dirpath).glob(f"{cam_file.stem}.*"))
                video_path = candidates[0] if candidates else None
            extract_scene(
                cam_file, i, db / "test/database_data",
                video_path=video_path,
                start_timestamp=start_timestamp,
                step_size=args.step_size,
                num_frames=args.num_frames_per_scene,
            )
    for set_num, n in zip(args.set_nums, args.num_train_frames):
        create_train_test_set(
            db, set_num, args.scene_nums, n,
            train_views_density="dense" if n == -1 else "sparse",
        )
        create_original_video_poses(db, set_num)


if __name__ == "__main__":
    main()
