"""Render-time sample-budget sweep on a TRAINED protocol checkpoint.

Question (follow-up to tools/occupancy_sampling.py, where quality at toy
scale was insensitive to the fine-sample count while occupancy culling cost
~1.4 dB): how much render-time PSNR does the full protocol model actually
buy with its 128 fine samples? Rendering cost is linear in samples/ray
(HBM-roofline, BASELINE.md), so equal PSNR at fewer samples is a direct
fps multiplier.

Loads a demo1a-shaped trained run (default: the round-3 50k protocol run at
/tmp/protocol50k, QA 24.02 dB) and renders held-out views with the fine
sample count swept, reporting PSNR vs the synthetic GT + time/frame.
num_samples only affects sampling — the checkpoint loads unchanged.

Run: python tools/sample_budget_eval.py [--downsample 4] [--fines 128 64 32 16]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", default="/tmp/protocol50k/runs/training/train0013")
    ap.add_argument("--scene", default="synth01")
    ap.add_argument("--db_root",
                    default="/tmp/protocol50k/data/databases/NeRF_LLFF/data")
    ap.add_argument("--ckpt", default="Model_Iter050000.ckpt")
    ap.add_argument("--downsample", type=int, default=4,
                    help="render at train_res / this (CPU tractability)")
    ap.add_argument("--fines", type=int, nargs="*", default=[128, 64, 32, 16, 8])
    ap.add_argument("--coarse", type=int, default=None,
                    help="optionally also override the coarse sample count")
    ap.add_argument("--previews", type=int, nargs="*", default=[],
                    help="also score coarse-ONLY preview renders at these "
                    "coarse sample counts (0 = the trained count) — gives "
                    "the preview mode the PSNR measurement the budget sweep "
                    "gave 32+8")
    ap.add_argument("--frames", type=int, nargs="*", default=[2])
    args = ap.parse_args()

    import jax

    from vipnerf_tpu.utils.device import backend_probe_alive

    if not backend_probe_alive():
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")

    from vipnerf_tpu.infer.tester import NerfTester
    from vipnerf_tpu.utils.io import read_image, rescale_image

    run_dir = Path(args.run_dir)
    scene_dir = run_dir / args.scene
    train_configs = json.loads((run_dir / "Configs.json").read_text())
    model_configs = json.loads((scene_dir / "ModelConfigs.json").read_text())
    db_root = Path(args.db_root)

    d = args.downsample
    if d > 1:
        model_configs["resolution"] = [
            x // d for x in model_configs["resolution"]
        ]
    h, w = model_configs["resolution"]
    print(f"render resolution: {h}x{w} (downsample {d})")

    suffix = train_configs["data_loader"].get("resolution_suffix", "")
    extr = np.loadtxt(
        db_root / f"all/database_data/{args.scene}/CameraExtrinsics.csv",
        delimiter=",",
    ).reshape(-1, 4, 4)
    intr = np.loadtxt(
        db_root
        / f"all/database_data/{args.scene}/CameraIntrinsics{suffix}.csv",
        delimiter=",",
    ).reshape(-1, 3, 3).copy()
    if d > 1:
        intr[:, :2] /= d

    def psnr(a, b):
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
        return 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))

    gts = {}
    for f in args.frames:
        gt = read_image(
            db_root / f"all/database_data/{args.scene}/rgb{suffix}/{f:04}.png"
        )
        if d > 1:
            gt = np.round(
                rescale_image(gt.astype(np.float32), d, anti_aliasing=True)
            )
        gts[f] = gt.astype(np.float64)

    base_coarse = train_configs["model"]["coarse_mlp"]["num_samples"]
    base_fine = train_configs["model"]["fine_mlp"]["num_samples"]
    print(f"trained with {base_coarse} coarse + {base_fine} fine samples")
    print(f"\n{'coarse':>7}{'fine':>6}{'points/ray':>11}{'PSNR':>8}{'s/frame':>9}")

    sweep = [(base_coarse, base_fine)]
    for k in args.fines:
        if k == base_fine and args.coarse is None:
            continue
        sweep.append((args.coarse or base_coarse, k))

    def score(test_configs, n_coarse, n_fine, label=""):
        cfg = json.loads(json.dumps(train_configs))  # deep copy
        if n_fine is not None:
            cfg["model"]["coarse_mlp"]["num_samples"] = n_coarse
            cfg["model"]["fine_mlp"]["num_samples"] = n_fine
        cfg["root_dirpath"] = str(Path(args.db_root).parents[3])
        tester = NerfTester(
            cfg, model_configs, test_configs, Path(cfg["root_dirpath"]),
        )
        tester.load_model(scene_dir / f"saved_models/{args.ckpt}")
        scores, dts = [], []
        for f in args.frames:
            t0 = time.time()
            pred = tester.predict_frame(
                extr[f], intrinsic=intr[f]
            )
            dts.append(time.time() - t0)
            scores.append(psnr(pred["image"].astype(np.float64), gts[f]))
        # cost model: coarse pass + merged (coarse+fine) fine pass
        pts = n_coarse if n_fine is None else n_coarse + (n_coarse + n_fine)
        print(f"{n_coarse:>7}{n_fine if n_fine is not None else '--':>6}"
              f"{pts:>11}{np.mean(scores):>8.2f}{np.mean(dts):>9.1f}  {label}",
              flush=True)

    for n_coarse, n_fine in sweep:
        score({"device": "all", "chunk_size": 8192}, n_coarse, n_fine)

    for n in args.previews:
        # the tester's own preview mode: coarse-only render configs via
        # preview_configs, trained checkpoint loaded unchanged
        preview = int(n) if n else True
        score(
            {"device": "all", "chunk_size": 8192, "preview": preview},
            int(n) or base_coarse, None, label="coarse-only preview",
        )


if __name__ == "__main__":
    main()
