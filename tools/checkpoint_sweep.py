"""Quality-vs-iteration sweep: demo4-style test + QA per saved checkpoint.

VERDICT round-4 item 3: the 200k demo1a protocol run saved a 20-checkpoint
chain (Model_Iter010000..200000) but QA'd only the final checkpoint; nothing
characterizes whether longer training helps or hurts held-out views. This
driver runs the reference's demo4 surface (test-only over existing
checkpoints, /root/reference/src/NerfLlffTrainerTester01.py:956-972) once per
checkpoint, each into its own test dir (test0901, test0902, ...), then prints
the iteration -> PSNR/SSIM table.

Usage:
    python tools/checkpoint_sweep.py --workdir /tmp/demo1a_200k \
        --train_num 11 [--step 10000] [--max_iter 200000]

Restart-safe: the tester skips frames whose PNGs exist and QA caches
frame-wise CSVs, so a re-invocation only does the remaining work.
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
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--train_num", type=int, default=11)
    ap.add_argument("--scene", default="synth01")
    ap.add_argument("--database", default="NeRF_LLFF",
                    choices=["NeRF_LLFF", "RealEstate10K", "DTU"])
    ap.add_argument("--set_num", type=int, default=2)
    ap.add_argument("--step", type=int, default=10000)
    ap.add_argument("--max_iter", type=int, default=200000)
    ap.add_argument("--test_num_base", type=int, default=900)
    args = ap.parse_args()

    workdir = Path(args.workdir)
    os.chdir(workdir)

    from vipnerf_tpu.apps.configs import build_test_configs

    if args.database == "NeRF_LLFF":
        from vipnerf_tpu.apps.nerf_llff import ENTRY_NAME, app
        scene_key, res_suffix = "scene_names", "_down4"
        scene_ids = [args.scene]
    elif args.database == "RealEstate10K":
        from vipnerf_tpu.apps.real_estate import ENTRY_NAME, app
        scene_key, res_suffix = "scene_nums", None
        scene_ids = [int(args.scene)]
    else:
        from vipnerf_tpu.apps.dtu import ENTRY_NAME, app
        scene_key, res_suffix = "scene_nums", None
        scene_ids = [int(args.scene)]

    ckpt_dir = (workdir / f"runs/training/train{args.train_num:04}")
    results = []
    for it in range(args.step, args.max_iter + 1, args.step):
        ckpts = list(ckpt_dir.glob(f"*/saved_models/Model_Iter{it:06}.ckpt"))
        if not ckpts:
            print(f"iter {it}: no checkpoint, skipping", flush=True)
            continue
        test_num = args.test_num_base + it // args.step
        t0 = time.time()
        test_configs = build_test_configs(
            entry_name=ENTRY_NAME,
            test_num=test_num,
            train_num=args.train_num,
            set_num=args.set_num,
            database=args.database,
            database_dirpath=f"{args.database}/data",
            num_iterations=it,
            scene_key=scene_key,
            scene_ids=scene_ids,
            resolution_suffix=res_suffix,
        )
        app.start_testing(test_configs)
        qa_path = workdir / f"runs/testing/test{test_num:04}/QA_Scores.json"
        scores = {}
        if qa_path.exists():
            scores = json.loads(qa_path.read_text()).get(
                "predicted_frames", {}
            )
        results.append({"iter": it, "wall_s": round(time.time() - t0, 1),
                        **scores})
        print(f"iter {it}: {scores} ({results[-1]['wall_s']}s)", flush=True)

    print("SWEEP_TABLE:", json.dumps(results), flush=True)
    # human-readable table for BASELINE.md
    if results:
        keys = [k for k in results[0] if k not in ("iter", "wall_s")]
        print("| iter | " + " | ".join(keys) + " |", flush=True)
        print("|---" * (len(keys) + 1) + "|", flush=True)
        for r in results:
            print("| " + str(r["iter"]) + " | "
                  + " | ".join(str(r.get(k)) for k in keys) + " |",
                  flush=True)


if __name__ == "__main__":
    main()
