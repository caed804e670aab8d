"""Full demo1a protocol (200k iterations) through the PRODUCT app surface.

The reference's LLFF operating point is demo1a: 200,000 iterations, 2 input
views, 2048 NeRF + 2048 sparse-depth rays, NDC, the full loss stack with the
30k visibility-prior activation, validation + checkpoints every 10k
(/root/reference/src/NerfLlffTrainerTester01.py:228-347,321-325), followed by
start_testing + QA + both video renders (:63-225).

This driver invokes vipnerf_tpu.apps.nerf_llff._run_full with demo1a's EXACT
arguments (train_num 11, set 2, sparse_depth, 2048 rays, 200k iterations) —
the only deviation is the scene list: the real LLFF scenes are not in this
environment (zero egress), so the run uses the synthetic LLFF-layout scene at
the down4 protocol resolution 756x1008 with the full prior/CSV on-disk
contract. Video pose tracks come from the production spiral creator
(db_builders.nerf_llff.create_spiral_video_poses, reference
VideoPoseCreator01_Spiral).

The run is restart-safe (resume_training is demo1a's default here): kill the
process at any point and re-invoke; training resumes from the last 10k
checkpoint, completed test/video frames are skipped.

Usage: python tools/run_demo1a_200k.py [--workdir /tmp/demo1a_200k]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/demo1a_200k")
    ap.add_argument("--iters", type=int, default=200000)
    ap.add_argument("--height", type=int, default=756)
    ap.add_argument("--width", type=int, default=1008)
    ap.add_argument("--video_frames", type=int, default=30,
                    help="spiral track length (reference default is 120; "
                         "30 bounds the video phase on the tunneled backend)")
    args = ap.parse_args()

    from vipnerf_tpu.data.synthetic import write_synthetic_database
    from vipnerf_tpu.db_builders.nerf_llff import create_spiral_video_poses

    workdir = Path(args.workdir)
    db_root = workdir / "data/databases"
    db_dir = db_root / "NeRF_LLFF/data"

    t0 = time.time()
    # restart safety: key on a completion marker written AFTER generation,
    # not on a directory created at the start of it — a kill mid-generation
    # must trigger a clean rebuild on re-invocation
    db_marker = db_dir / ".synthetic_db_complete"
    if not db_marker.exists():
        print("generating synthetic database...", flush=True)
        write_synthetic_database(
            db_root,
            scene_name="synth01",
            num_frames=6,
            train_frames=(0, 5),
            val_frames=(2,),
            height=args.height,
            width=args.width,
            resolution_suffix="_down4",
        )
        create_spiral_video_poses(
            db_dir, set_num=2, num_frames=args.video_frames
        )
        db_marker.touch()
    print(f"db ready in {time.time() - t0:.0f}s", flush=True)

    # The app module resolves root_dirpath='.' at call time — run from the
    # workdir so runs/ and data/ land there, exactly like a user invocation
    # of `python -m vipnerf_tpu.apps.nerf_llff demo1a` from their work tree.
    os.chdir(workdir)
    from vipnerf_tpu.apps import nerf_llff

    t1 = time.time()
    # demo1a's exact call (apps/nerf_llff.py:67-68), scene list swapped for
    # the synthetic scene:
    nerf_llff._run_full(
        11, 2, sparse_depth=True, num_rays=2048,
        num_iterations=args.iters, scene_names=["synth01"],
    )
    wall = time.time() - t1
    print(f"DEMO1A WALL CLOCK: {wall:.0f}s", flush=True)

    qa_path = workdir / "runs/testing/test0011/QA_Scores.json"
    if qa_path.exists():
        print("QA_Scores.json:", qa_path.read_text(), flush=True)
    print("SUMMARY:", json.dumps({"iters": args.iters,
                                  "wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
