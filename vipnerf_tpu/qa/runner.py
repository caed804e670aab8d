"""QA runner: per-metric frame-wise evaluation with incremental CSV caching,
QA_Scores.json updates, and scene-wise grouping.

Parity targets (paths relative to /root/reference/):
- the start_qa contract (src/qa/02_PSNR/src/PSNR02_NeRF_LLFF.py:109-151):
  QA_Scores.json at the test dir root; per-metric
  QA_Scores/{pred_folder}/{Metric}_FrameWise.csv with incremental merge
  (skip frames already scored, :56-59); skip missing predictions (:62-63);
  rounding to 4 decimals.
- orchestrators (src/qa/00_Common/src/AllMetrics0{1,2,5}_*.py): RMSE, PSNR,
  SSIM, LPIPS for RealEstate/LLFF; + masked variants for DTU; then scene-wise
  grouping.
- metric naming: per-dataset numeric suffix (RMSE01=RealEstate, 02=LLFF,
  05=DTU; Masked*05=DTU), matching the reference filename-derived names.

Also a standalone CLI (reference scripts are argparse CLIs invoked as
subprocesses from entry points, NerfLlffTrainerTester01.py:104-112):
    python -m vipnerf_tpu.qa.runner --database NeRF_LLFF ...
"""

import argparse
import json
from pathlib import Path
from typing import Callable, Dict, Optional

import numpy as np
import pandas as pd
import simplejson

from vipnerf_tpu.qa import metrics
from vipnerf_tpu.utils.naming import scene_dirname
from vipnerf_tpu.qa.grouper import group_qa_dir
from vipnerf_tpu.utils.io import read_image, read_mask, rescale_image

_DATASET_SUFFIX = {"RealEstate10K": "01", "NeRF_LLFF": "02", "DTU": "05"}
_SCENE_KEY = {
    "RealEstate10K": "scene_num",
    "NeRF_LLFF": "scene_name",
    "DTU": "scene_num",
}
_SPLIT_DIR = {"RealEstate10K": "test", "NeRF_LLFF": "all", "DTU": "all"}


def _scene_dirname(dataset: str, scene_id) -> str:
    return scene_dirname(scene_id, _SCENE_KEY[dataset])


def _downsample_uint8(image: np.ndarray, factor: int) -> np.ndarray:
    out = rescale_image(image.astype(np.float32), factor, anti_aliasing=True)
    return np.round(out).astype(np.uint8)


def start_qa(
    metric_base: str,
    metric_fn: Callable,
    dataset: str,
    pred_videos_dirpath: Path,
    database_dirpath: Path,
    frames_datapath: Path,
    pred_folder_name: str = "predicted_frames",
    resolution_suffix: str = "",
    downsampling_factor: int = 1,
    mask_folder_name: Optional[str] = None,
) -> Optional[float]:
    """Run one metric over all (scene, frame) rows; returns the average.

    metric_fn(gt_uint8, pred_uint8[, mask]) -> float or None (None = metric
    unavailable, e.g. LPIPS without weights: recorded as skipped).
    """
    pred_videos_dirpath = Path(pred_videos_dirpath)
    database_dirpath = Path(database_dirpath)
    if not pred_videos_dirpath.exists():
        print(
            f"Skipping QA of folder: {pred_videos_dirpath.stem}. "
            "Reason: pred_videos_dirpath does not exist"
        )
        return None
    if not database_dirpath.exists():
        print(
            f"Skipping QA of folder: {pred_videos_dirpath.stem}. "
            "Reason: database_dirpath does not exist"
        )
        return None

    masked = mask_folder_name is not None
    metric_name = ("Masked" if masked else "") + metric_base + _DATASET_SUFFIX[dataset]
    scene_key = _SCENE_KEY[dataset]
    split_dir = _SPLIT_DIR[dataset]

    qa_scores_filepath = pred_videos_dirpath / "QA_Scores.json"
    csv_path = (
        pred_videos_dirpath
        / f"QA_Scores/{pred_folder_name}/{metric_name}_FrameWise.csv"
    )
    qa_scores = (
        json.loads(qa_scores_filepath.read_text())
        if qa_scores_filepath.exists()
        else {}
    )
    qa_scores.setdefault(pred_folder_name, {})
    old_data = pd.read_csv(csv_path) if csv_path.exists() else None

    frames_data = pd.read_csv(frames_datapath)[[scene_key, "pred_frame_num"]]

    rows = []
    for _, frame_row in frames_data.iterrows():
        scene_id, frame_num = frame_row[scene_key], int(frame_row["pred_frame_num"])
        if old_data is not None and old_data.loc[
            (old_data[scene_key] == scene_id)
            & (old_data["pred_frame_num"] == frame_num)
        ].size > 0:
            continue
        scene_dir = _scene_dirname(dataset, scene_id)
        gt_path = (
            database_dirpath
            / f"{split_dir}/database_data/{scene_dir}/rgb{resolution_suffix}/{frame_num:04}.png"
        )
        pred_path = (
            pred_videos_dirpath
            / f"{scene_dir}/{pred_folder_name}/{frame_num:04}.png"
        )
        if not pred_path.exists():
            continue
        mask = None
        if masked:
            mask_path = (
                database_dirpath
                / f"{split_dir}/database_data/{scene_dir}/{mask_folder_name}/{frame_num:04}.png"
            )
            if not mask_path.exists():
                continue
            mask = read_mask(mask_path)
            if mask.ndim == 3:
                mask = mask[..., 0]
        gt = read_image(gt_path)[..., :3]
        if downsampling_factor > 1:
            gt = _downsample_uint8(gt, downsampling_factor)
            if mask is not None:
                mask = (
                    _downsample_uint8(
                        mask.astype(np.uint8) * 255, downsampling_factor
                    )
                    > 127
                )
        pred = read_image(pred_path)[..., :3]
        score = metric_fn(gt, pred, mask) if masked else metric_fn(gt, pred)
        if score is None:
            # Metric unavailable (e.g. LPIPS without weights): record a LOUD
            # explicit null in QA_Scores.json rather than silently omitting
            # one of the paper's four metrics.
            print(f"{metric_name}: unavailable (missing weights?); skipping")
            # setdefault: never clobber a previously computed average with
            # null when the metric becomes unavailable on a re-run.
            qa_scores[pred_folder_name].setdefault(metric_name, None)
            with open(qa_scores_filepath, "w") as f:
                simplejson.dump(qa_scores, f, indent=4)
            return None
        rows.append([scene_id, frame_num, score])

    new_data = pd.DataFrame(rows, columns=[scene_key, "pred_frame_num", metric_name])
    if old_data is not None and new_data.size > 0:
        old = old_data.set_index([scene_key, "pred_frame_num"])
        new = new_data.set_index([scene_key, "pred_frame_num"])
        merged = old.combine_first(new).reset_index()
    elif old_data is not None:
        merged = old_data
    else:
        merged = new_data
    merged = merged.round({metric_name: 4})

    if merged.size == 0:
        print(f"{metric_name}: no frames evaluated")
        return None

    avg = float(np.round(np.mean(merged[metric_name]), 4))
    qa_scores[pred_folder_name][metric_name] = avg
    print(
        f"Average {metric_name}: {pred_videos_dirpath.as_posix()} - "
        f"{pred_folder_name}: {avg}"
    )
    with open(qa_scores_filepath, "w") as f:
        simplejson.dump(qa_scores, f, indent=4)
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    merged.to_csv(csv_path, index=False)
    return avg


def run_all_qa(
    dataset: str,
    pred_videos_dirpath: Path,
    database_dirpath: Path,
    frames_datapath: Path,
    pred_folder_name: str = "predicted_frames",
    resolution_suffix: str = "",
    downsampling_factor: int = 1,
    mask_folder_name: str = "ObjectMasks",
) -> Dict[str, Optional[float]]:
    """All metrics for a dataset + scene-wise grouping (reference
    AllMetrics0{1,2,5} orchestrators)."""
    lpips_metric = metrics.LpipsMetric()

    def lpips_fn(gt, pred, mask=None):
        return lpips_metric(gt, pred, mask)

    metric_fns = [
        ("RMSE", metrics.compute_rmse),
        ("PSNR", metrics.compute_psnr),
        ("SSIM", metrics.compute_ssim),
        ("LPIPS", lpips_fn),
    ]

    results: Dict[str, Optional[float]] = {}
    for base, fn in metric_fns:
        results[base] = start_qa(
            base,
            fn,
            dataset,
            pred_videos_dirpath,
            database_dirpath,
            frames_datapath,
            pred_folder_name,
            resolution_suffix,
            downsampling_factor,
        )
    if dataset == "DTU":
        # Masked variants over object masks (AllMetrics05_DTU.py:22-31)
        for base, fn in metric_fns:
            results[f"Masked{base}"] = start_qa(
                base,
                fn,
                dataset,
                pred_videos_dirpath,
                database_dirpath,
                frames_datapath,
                pred_folder_name,
                resolution_suffix,
                downsampling_factor,
                mask_folder_name=mask_folder_name,
            )

    # Scene-wise grouping (SceneWiseGrouper)
    qa_dirpath = Path(pred_videos_dirpath) / "QA_Scores"
    if qa_dirpath.exists():
        group_qa_dir(qa_dirpath)
    return results


def main():
    parser = argparse.ArgumentParser(description="ViP-NeRF TPU QA runner")
    parser.add_argument("--database", required=True,
                        choices=sorted(_DATASET_SUFFIX))
    parser.add_argument("--pred_videos_dirpath", required=True)
    parser.add_argument("--database_dirpath", required=True)
    parser.add_argument("--frames_datapath", required=True)
    parser.add_argument("--pred_folder_name", default="predicted_frames")
    parser.add_argument("--resolution_suffix", default="")
    parser.add_argument("--downsampling_factor", type=int, default=1)
    parser.add_argument("--mask_folder_name", default="ObjectMasks")
    # Accepted for drop-in compatibility with the reference QA CLIs
    # (qa/02_PSNR/src/PSNR02_NeRF_LLFF.py:192-212 takes
    # --demo_function_name demo2); this runner always executes the demo2
    # behavior (score a prediction dir against the database GT).
    parser.add_argument("--demo_function_name", default="demo2",
                        choices=["demo2"])
    args = parser.parse_args()
    run_all_qa(
        args.database,
        Path(args.pred_videos_dirpath),
        Path(args.database_dirpath),
        Path(args.frames_datapath),
        args.pred_folder_name,
        args.resolution_suffix,
        args.downsampling_factor,
        args.mask_folder_name,
    )


if __name__ == "__main__":
    main()
