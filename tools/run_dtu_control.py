"""DTU quality-positive control: demo1b (3 input views) on the SAME scene
as the 2-view protocol run.

The round-4 DTU 50k run (tools/run_dtu_50k.py, demo1a shape, 2 input views)
scored held-out masked PSNR 13.69 dB — far below LLFF's 24.02 — and nothing
separated "2-view generalization gap" from "metric-space branch trains
worse". The reference's DTU protocol also covers 3- and 4-view sets
(/root/reference/src/DtuTrainerTester01.py demo1b/demo1c, set03/set04);
this driver runs demo1b's EXACT surface (train_num 42, set03, sparse_depth,
2048 rays, 50k iterations) on the identical synthetic DTU scene (same seed,
same geometry, same 300x400 resolution, same ObjectMasks) with train views
(0, 2, 5) instead of (0, 5). A held-out masked PSNR substantially above
13.69 dB demonstrates the metric-space branch trains to quality and pins
the 2-view number on the view-count gap.

Restart-safe: kill + re-invoke resumes from the last checkpoint.

Usage: python tools/run_dtu_control.py [--workdir /tmp/dtu_control]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402

SET_NUM = 3  # demo1b = set03 (3 input views)
TRAIN_NUM = 42  # demo1b's train/test num (apps/dtu.py:72-73)
TRAIN_FRAMES = (0, 2, 5)
VAL_FRAMES = (3,)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/dtu_control")
    ap.add_argument("--height", type=int, default=300)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--video_frames", type=int, default=20)
    args = ap.parse_args()

    from vipnerf_tpu.data.synthetic import (
        SphereScene,
        make_camera_ring,
        make_dtu_scene,
        write_synthetic_database,
    )
    from vipnerf_tpu.utils.io import save_image

    workdir = Path(args.workdir)
    db_root = workdir / "data/databases"
    db_dir = db_root / "DTU/data"
    scene_dir = db_dir / "all/database_data/00021"

    t0 = time.time()
    db_marker = db_dir / ".synthetic_db_complete"
    if not db_marker.exists():
        print("generating synthetic DTU database (3-view set03)...", flush=True)
        # IDENTICAL scene to the 2-view run: make_dtu_scene is seeded, so the
        # geometry, images, and masks match tools/run_dtu_50k.py exactly —
        # only the train/val/test split differs.
        scene, ring_kwargs = make_dtu_scene()
        gt = write_synthetic_database(
            db_root,
            dataset="DTU",
            scene_name="00021",
            num_frames=6,
            set_num=SET_NUM,
            train_frames=TRAIN_FRAMES,
            val_frames=VAL_FRAMES,
            height=args.height,
            width=args.width,
            scene=scene,
            # set03 consumes DE03; VW03 comes from the REAL generator below
            # (the DTU linear-plane policy), not hand-written masks — this
            # control run doubles as DTU-branch generator evidence.
            sparse_depth_dirname=f"DE{SET_NUM:02}",
            with_visibility_prior=False,
            **ring_kwargs,
        )
        background = SphereScene(
            seed=0, num_spheres=0, shell_radius=scene.shell_radius
        )
        masks_dir = scene_dir / "ObjectMasks"
        masks_dir.mkdir(exist_ok=True)
        for f in range(6):
            _, shell_depth = background.render(
                gt["extrinsics"][f], gt["intrinsics"][f],
                args.height, args.width,
            )
            mask = (gt["depths"][f] < shell_depth - 1e-6)
            save_image(masks_dir / f"{f:04}.png", mask.astype(np.uint8) * 255)
        poses_dir = db_dir / f"train_test_sets/set{SET_NUM:02}/video_poses01"
        poses_dir.mkdir(parents=True, exist_ok=True)
        track = make_camera_ring(
            args.video_frames + 1,
            spread_deg=60.0,
            radius=ring_kwargs["ring_radius"],
            height=ring_kwargs["ring_height"],
        )
        np.savetxt(
            poses_dir / "00021.csv",
            track.reshape(args.video_frames + 1, 16),
            delimiter=",",
        )
        np.savetxt(
            poses_dir / "VideoFrameNums.csv",
            np.arange(0, args.video_frames, 2),
            delimiter=",",
        )
        db_marker.touch()
    print(f"db ready in {time.time() - t0:.0f}s", flush=True)

    # generate VW03 with the real DTU generator (128 LINEAR planes over the
    # fixed [0.1, 5] bounds, priors/cli.py policy table) — idempotent resume
    from vipnerf_tpu.priors.cli import main_visibility

    t_gen = time.time()
    main_visibility([
        "--database", "DTU", "--gen_nums", str(SET_NUM),
        "--root_dirpath", str(workdir),
    ])
    print(f"DTU PRIOR GENERATION WALL CLOCK: {time.time() - t_gen:.1f}s "
          f"({len(TRAIN_FRAMES)} views)", flush=True)

    os.chdir(workdir)
    from vipnerf_tpu.apps import dtu

    t1 = time.time()
    # demo1b's exact call (apps/dtu.py:72-73), scan list swapped for the
    # synthetic scan:
    dtu._run_full(TRAIN_NUM, SET_NUM, sparse_depth=True, num_rays=2048,
                  scene_nums=[21])
    wall = time.time() - t1
    print(f"DTU DEMO1B WALL CLOCK: {wall:.0f}s", flush=True)

    qa_path = workdir / f"runs/testing/test{TRAIN_NUM:04}/QA_Scores.json"
    if qa_path.exists():
        print("QA_Scores.json:", qa_path.read_text(), flush=True)
    print("SUMMARY:", json.dumps({"wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
