"""Render tile / netchunk sweep at the 32+8 sample budget (and preview).

The 8192-ray tile / 32768-point netchunk_map_infer render optimum was tuned
at 256 points/ray (round 2, BASELINE.md); the quality-validated 32+8 budget
runs 72 points/ray, where the optimum may differ (VERDICT round-4 item 7).
This sweeps chunk_size x netchunk_map_infer for the budget renderer (and
optionally the coarse-only preview) on the bench workload — fps does not
depend on trained weights, so random params at the full 8x256 flagship size
are used, exactly like bench.py.

Run: python tools/budget_tile_sweep.py [--tiles 4096 8192 16384]
     [--netchunks 16384 32768 65536] [--preview]
"""

import argparse
import copy
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, nargs="*",
                    default=[4096, 8192, 16384, 32768])
    ap.add_argument("--netchunks", type=int, nargs="*",
                    default=[16384, 32768, 65536])
    ap.add_argument("--coarse", type=int, default=32)
    ap.add_argument("--fine", type=int, default=8)
    ap.add_argument("--preview", action="store_true",
                    help="also sweep the coarse-only preview configs")
    ap.add_argument("--repeats", type=int, default=1,
                    help="timed renders per config (median reported) — the "
                    "tunneled backend adds ~±5%% single-shot jitter, so "
                    "re-measure the shortlisted candidates with >=5")
    args = ap.parse_args()

    import jax

    from vipnerf_tpu.utils.device import backend_probe_alive

    if not backend_probe_alive():
        print("# TPU down; CPU numbers are not meaningful for this sweep",
              flush=True)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from vipnerf_tpu.data.preprocessor import DataPreprocessor
    from vipnerf_tpu.data.synthetic import make_camera_ring
    from vipnerf_tpu.infer.renderer import TiledRenderer, preview_configs
    from vipnerf_tpu.models import get_model

    # bench.py's exact render workload: flagship model, 756x1008 frame
    h, w = 756, 1008
    n_train = 2
    extrinsics = make_camera_ring(n_train)
    focal = 0.9 * w
    intrinsic = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    configs = {
        "data_loader": {
            "data_loader_name": "NerfLlffDataLoader01",
            "data_preprocessor_name": "DataPreprocessor01",
            "recenter_camera_poses": True,
            "bd_factor": 0.75,
            "spherify": False,
            "ndc": True,
            "batching": True,
            "downsampling_factor": 1,
            "num_rays": 2048,
        },
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": {
                "num_samples": args.coarse, "netdepth": 8, "netwidth": 256,
                "points_positional_encoding_degree": 10,
                "views_positional_encoding_degree": 4,
                "use_view_dirs": True, "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            "fine_mlp": {
                "num_samples": args.fine, "netdepth": 8, "netwidth": 256,
                "points_positional_encoding_degree": 10,
                "views_positional_encoding_degree": 4,
                "use_view_dirs": True, "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            "chunk": 4096, "lindisp": False, "netchunk": 16384,
            "perturb": True, "raw_noise_std": 1.0, "white_bkgd": False,
            "bf16_matmuls": True, "f32_heads": True,
        },
        "losses": [{"name": "MSE01", "weight": 1}],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4, "lr_decay": 250, "beta1": 0.9, "beta2": 0.999,
        },
        "seed": 0,
    }
    raw = {
        "frame_nums": np.arange(n_train),
        "nerf_data": {
            "images": rng.integers(0, 255, size=(n_train, h, w, 3),
                                   dtype=np.uint8),
            "extrinsics": extrinsics,
            "intrinsics": np.tile(intrinsic[None], (n_train, 1, 1)),
            "resolution": (h, w),
            "bounds": np.array([1.8, 5.5]),
        },
    }
    prep = DataPreprocessor(configs, "train", raw)
    init_fn, render_fn = get_model(configs)
    params = init_fn(jax.random.PRNGKey(0), configs)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -1.0
    test_batch = prep.create_test_data(pose, preprocess_pose=False)

    modes = [(f"budget {args.coarse}+{args.fine}", configs,
              ("rgb_fine", "depth_fine"))]
    if args.preview:
        modes.append(
            ("preview coarse-only", preview_configs(configs),
             ("rgb_coarse", "depth_coarse"))
        )

    print(f"{'mode':>22}{'tile':>8}{'netchunk':>10}{'compile_s':>11}"
          f"{'fps':>8}", flush=True)
    best = {}
    for label, base_cfg, keep in modes:
        for nc in args.netchunks:
            cfg = copy.deepcopy(base_cfg)
            cfg["model"]["netchunk_map_infer"] = nc
            renderer = TiledRenderer(render_fn, cfg)
            for tile in args.tiles:
                kwargs = dict(chunk_size=tile, keep=keep, uint8_rgb=True)
                t0 = time.time()
                renderer.render(params, test_batch, **kwargs)  # compile+warm
                compile_s = time.time() - t0
                times = []
                for _ in range(args.repeats):
                    t0 = time.time()
                    renderer.render(params, test_batch, **kwargs)
                    times.append(time.time() - t0)
                fps = 1.0 / float(np.median(times))
                print(f"{label:>22}{tile:>8}{nc:>10}{compile_s:>11.1f}"
                      f"{fps:>8.4f}", flush=True)
                if fps > best.get(label, (0, None))[0]:
                    best[label] = (fps, (tile, nc))
    for label, (fps, combo) in best.items():
        print(f"BEST {label}: tile={combo[0]} netchunk={combo[1]} "
              f"fps={fps:.4f}", flush=True)


if __name__ == "__main__":
    main()
