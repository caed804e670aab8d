"""Protocol-scale run: demo1a-shaped 50k-iteration training on the TPU.

The reference's minimum paper-reproduction protocol is 50k iterations
(/root/reference/README.md:40) with the demo1a config shape
(src/NerfLlffTrainerTester01.py:228-347): 2048 NeRF + 2048 sparse-depth
rays, 64+128 samples, NDC, full loss stack including the 30k-iteration
visibility-prior activation (iter_weights {0:0, 30000:0.001}), validation
renders + checkpoints every 10k, then testing + QA.

No real LLFF data exists in this environment (zero egress), so the run uses
the synthetic LLFF-layout database at the down4 protocol resolution
(756x1008). NOTE the known dynamics property (BASELINE.md): the published
loss composition has a dead-sigma absorbing state on this synthetic scene at
full model size (collapse ~iter 1.1k at raw_noise_std 1.0), so the QA
numbers of THIS run measure the collapsed model — the run's purpose is to
exercise the trainer at protocol scale (50k-iteration mechanics, chunk/
validation/checkpoint cadence, the 30k prior activation, resume contract,
wall clock) which nothing had ever done past 20k. Quality-protocol numbers
live in the convergence matrix (raw_noise_std 0, <=8k iters).

Usage: python tools/protocol_run.py [--iters 50000] [--workdir /tmp/protocol50k]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50000)
    ap.add_argument("--workdir", default="/tmp/protocol50k")
    ap.add_argument("--height", type=int, default=756)
    ap.add_argument("--width", type=int, default=1008)
    ap.add_argument("--noise", type=float, default=1.0)
    ap.add_argument("--train_num", type=int, default=11)
    ap.add_argument("--val_interval", type=int, default=None,
                    help="default: min(10000, iters)")
    ap.add_argument("--save_interval", type=int, default=None)
    ap.add_argument("--f32", action="store_true",
                    help="f32 storage instead of bf16 matmuls (1.45x step "
                         "cost; avoids the bf16-noise dead-sigma collapse, "
                         "BASELINE.md round-3 precision table)")
    args = ap.parse_args()

    from vipnerf_tpu.apps.common import DatasetApp
    from vipnerf_tpu.apps.configs import build_test_configs, build_train_configs
    from vipnerf_tpu.data.synthetic import write_synthetic_database

    workdir = Path(args.workdir)
    db_root = workdir / "data/databases"

    t0 = time.time()
    if not (db_root / "NeRF_LLFF/data/all/database_data/synth01").exists():
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
    t_db = time.time() - t0
    print(f"db ready in {t_db:.0f}s", flush=True)

    app = DatasetApp("NeRF_LLFF", "scene_name", "all", root_dirpath=workdir)
    train_configs = build_train_configs(
        entry_name="NerfLlffTrainerTester01",
        train_num=args.train_num,
        database="NeRF_LLFF",
        database_dirpath="databases/NeRF_LLFF/data",
        data_loader_name="NerfLlffDataLoader01",
        scene_key="scene_names",
        scene_ids=["synth01"],
        set_num=2,
        ndc=True,
        recenter_camera_poses=True,
        bd_factor=0.75,
        num_iterations=args.iters,
        resolution_suffix="_down4",
        bf16_matmuls=not args.f32,
        validation_interval=(
            args.val_interval if args.val_interval is not None
            else min(10000, args.iters)
        ),
        model_save_interval=(
            args.save_interval if args.save_interval is not None
            else min(10000, args.iters)
        ),
    )
    train_configs["model"]["remat"] = True
    train_configs["model"]["raw_noise_std"] = args.noise
    # Restart-safe: with the checkpoint-before-validation ordering the run
    # resumes from the last 10k boundary if interrupted.
    train_configs["resume_training"] = True

    t1 = time.time()
    app.start_training(train_configs)
    train_wall = time.time() - t1
    print(f"TRAIN WALL CLOCK: {train_wall:.0f}s "
          f"({args.iters / train_wall:.1f} it/s, "
          f"{args.iters * 4096 / train_wall:,.0f} rays/s)", flush=True)

    test_configs = build_test_configs(
        entry_name="NerfLlffTrainerTester01",
        test_num=args.train_num,
        train_num=args.train_num,
        set_num=2,
        database="NeRF_LLFF",
        database_dirpath="NeRF_LLFF/data",
        num_iterations=args.iters,
        scene_key="scene_names",
        scene_ids=["synth01"],
        resolution_suffix="_down4",
    )
    t2 = time.time()
    app.start_testing(test_configs)
    test_wall = time.time() - t2
    print(f"TEST+QA WALL CLOCK: {test_wall:.0f}s", flush=True)

    qa_path = (
        workdir / f"runs/testing/test{args.train_num:04}/QA_Scores.json"
    )
    if qa_path.exists():
        print("QA_Scores.json:", qa_path.read_text(), flush=True)
    summary = {
        "iters": args.iters,
        "train_wall_s": round(train_wall, 1),
        "test_wall_s": round(test_wall, 1),
        "it_per_s": round(args.iters / train_wall, 2),
        "rays_per_s": round(args.iters * 4096 / train_wall, 1),
    }
    print("SUMMARY:", json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
