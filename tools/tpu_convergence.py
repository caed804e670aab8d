"""Full-size ViP-NeRF convergence run on real TPU hardware.

Trains the flagship configuration (8x256 coarse+fine MLPs, PE degrees 10/4,
64+128 samples, 2048 NeRF + 2048 sparse-depth rays, full loss stack — the
reference demo1a architecture, /root/reference/src/NerfLlffTrainerTester01.py:
234-330) on an exactly-ray-traced synthetic scene, then renders the held-out
views and scores PSNR against the analytic ground truth. This is the
strongest available stand-in for the paper-parity target while the real LLFF
datasets are absent from the environment (BASELINE.md "Quality" row).

Usage (on a TPU host):
    python tools/tpu_convergence.py [--iters 3000] [--height 96] [--width 128]

Prints one JSON line: {"iters": N, "psnr": X, "ssim": Y, "seconds": T}.
Record the result in BASELINE.md.
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np


def full_size_configs(root: Path, num_iterations: int, raw_noise_std: float,
                      ndc: bool = False, num_rays: int = 2048,
                      sd_rays: int = 2048, lr: float = 5e-4,
                      vp_start: int = 30000, seed: int = 0,
                      bf16: bool = True):
    mlp = {
        "num_samples": 64,
        "netdepth": 8,
        "netwidth": 256,
        "points_positional_encoding_degree": 10,
        "views_positional_encoding_degree": 4,
        "use_view_dirs": True,
        "view_dependent_rgb": True,
        "predict_visibility": True,
    }
    fine = dict(mlp)
    fine["num_samples"] = 128
    return {
        "trainer": "VipNerfTpuTrainer",
        "train_num": 1,
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "root_dirpath": str(root),
        "data_loader": {
            "data_loader_name": "NerfLlffDataLoader01",
            "data_preprocessor_name": "DataPreprocessor01",
            "train_set_num": 2,
            "scene_names": ["synth01"],
            "resolution_suffix": "",
            "recenter_camera_poses": True,
            "bd_factor": 0.75,
            "spherify": False,
            "ndc": ndc,
            "batching": True,
            "num_rays": num_rays,
            "precrop_fraction": 1,
            "precrop_iterations": -1,
            "visibility_prior": {
                "load_masks": True,
                "load_weights": False,
                "masks_dirname": "VW02",
            },
            "sparse_depth": {"dirname": "DE02", "num_rays": sd_rays},
            "downsampling_factor": 1,
        },
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": mlp,
            "fine_mlp": fine,
            "chunk": 4096,
            "lindisp": False,
            "netchunk": 16384,
            "netchunk_map": 16384,
            "netchunk_map_infer": 262144,
            "perturb": True,
            "raw_noise_std": raw_noise_std,
            "white_bkgd": False,
            "bf16_matmuls": bf16,
        },
        "losses": [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityLoss01", "weight": 0.1},
            {"name": "SparseDepthMSE01", "weight": 0.1},
            {"name": "VisibilityPriorLoss01",
             "iter_weights": {"0": 0, str(vp_start): 0.001}},
        ],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": lr,
            "lr_decay": 250,
            "beta1": 0.9,
            "beta2": 0.999,
        },
        "resume_training": True,
        "num_iterations": num_iterations,
        "scan_steps": 100,
        "validation_interval": num_iterations * 10,  # skip (test+QA score below)
        "validation_chunk_size": 65536,
        "validation_save_loss_maps": False,
        "model_save_interval": num_iterations,
        "seed": seed,
        "device": [0],
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=3000)
    parser.add_argument("--height", type=int, default=96)
    parser.add_argument("--width", type=int, default=128)
    parser.add_argument("--raw_noise_std", type=float, default=1.0)
    parser.add_argument("--grad_clip_norm", type=float, default=None)
    parser.add_argument("--vis_loss_weight", type=float, default=0.1)
    parser.add_argument("--loss_guard", action="store_true")
    parser.add_argument("--ndc", action="store_true")
    parser.add_argument("--test_frames", type=int, default=3)
    parser.add_argument("--root", default=None)
    parser.add_argument("--num_rays", type=int, default=2048)
    parser.add_argument("--sd_rays", type=int, default=2048)
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--vp_start", type=int, default=30000,
                        help="visibility-prior activation iteration")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--f32_heads", action="store_true",
                        help="bf16 trunk + f32 head layers (mixed precision)")
    parser.add_argument("--no_bf16", action="store_true",
                        help="f32 matmuls (pair with "
                             "JAX_DEFAULT_MATMUL_PRECISION=highest for true "
                             "f32 MXU passes when probing precision effects)")
    args = parser.parse_args()

    from vipnerf_tpu.data.synthetic import write_synthetic_database
    from vipnerf_tpu.infer import start_testing
    from vipnerf_tpu.qa import run_all_qa
    from vipnerf_tpu.train import start_training

    root = Path(args.root or tempfile.mkdtemp(prefix="tpu_conv_"))
    db_root = root / "data/databases"
    write_synthetic_database(
        db_root,
        scene_name="synth01",
        num_frames=6,
        train_frames=(0, 5),
        val_frames=(2,),
        height=args.height,
        width=args.width,
    )
    configs = full_size_configs(root, args.iters, args.raw_noise_std,
                                ndc=args.ndc, num_rays=args.num_rays,
                                sd_rays=args.sd_rays, lr=args.lr,
                                vp_start=args.vp_start, seed=args.seed,
                                bf16=not args.no_bf16)
    if args.f32_heads:
        configs["model"]["f32_heads"] = True
    if args.grad_clip_norm:
        configs["optimizer"]["grad_clip_norm"] = args.grad_clip_norm
    for loss in configs["losses"]:
        if loss["name"] == "VisibilityLoss01":
            loss["weight"] = args.vis_loss_weight
    if args.loss_guard:
        configs["optimizer"]["loss_guard"] = {}

    t0 = time.time()
    start_training(configs)
    train_secs = time.time() - t0
    print(f"# trained {args.iters} iters in {train_secs:.0f}s", file=sys.stderr)

    test_configs = {
        "tester": "VipNerfTpuTester",
        "test_num": 1,
        "test_set_num": 2,
        "train_num": 1,
        "model_name": "Model_Latest.ckpt",
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "root_dirpath": str(root),
        "device": [0],
        "chunk_size": 65536,
    }
    db_dir = root / "data/databases/NeRF_LLFF/data"
    extr = np.loadtxt(
        db_dir / "all/database_data/synth01/CameraExtrinsics.csv", delimiter=","
    ).reshape(-1, 4, 4)
    intr = np.loadtxt(
        db_dir / "all/database_data/synth01/CameraIntrinsics.csv", delimiter=","
    ).reshape(-1, 3, 3)
    scenes_data = {
        "synth01": {
            "output_dirname": "synth01",
            "frames_data": {
                f: {"extrinsic": extr[f], "intrinsic": intr[f],
                    "is_train_frame": False}
                for f in (1, 3, 4)[: args.test_frames]
            },
        }
    }
    start_testing(test_configs, scenes_data)
    results = run_all_qa(
        "NeRF_LLFF",
        root / "runs/testing/test0001",
        db_dir,
        db_dir / "train_test_sets/set02/TestVideosData.csv",
    )
    print(json.dumps({
        "iters": args.iters,
        "psnr": results["PSNR"],
        "ssim": results["SSIM"],
        "seconds": round(train_secs, 1),
        "raw_noise_std": args.raw_noise_std,
        "resolution": [args.height, args.width],
    }))


if __name__ == "__main__":
    main()
