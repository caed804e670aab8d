"""Occupancy-grid-guided sampling experiment (NerfAcc-style, TPU-adapted).

Motivation: the train/render steps are HBM-roofline-bound (BASELINE.md
round-3) — the one lever left is evaluating FEWER MLP samples per ray, not
making each sample cheaper. NerfAcc (arxiv 2305.04966) and NeuSample
(arxiv 2111.15552) show most samples land in empty space. This experiment
asks, on this codebase's synthetic scene: after training a standard
ViP-NeRF, can a coarse occupancy grid (sigma EMA over a lattice) replace
the coarse-MLP pass at RENDER time and concentrate a reduced fine-sample
budget, at equal PSNR?

Static-shape adaptation (unlike NerfAcc's dynamic ray packing, which XLA
cannot compile): every ray keeps a fixed sample budget K; the grid only
reshapes the per-ray sampling PDF (occupied bins get the mass), so the
whole render stays one fixed-shape jitted program.

Run (CPU, ~6 min):   python tools/occupancy_sampling.py
Run (TPU, full res): python tools/occupancy_sampling.py --height 378 --width 504

Prints a table: sample budget K vs PSNR and (on TPU) ms/frame for
  - standard pipeline (coarse MLP + merged fine, the reference path)
  - naive reduction (standard pipeline, smaller fine count)
  - grid-guided (no coarse MLP; K samples from the occupancy PDF)
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--grid", type=int, default=64, help="grid resolution per axis")
    ap.add_argument("--tau", type=float, default=1.0, help="occupancy sigma threshold")
    ap.add_argument("--netwidth", type=int, default=64)
    ap.add_argument("--netdepth", type=int, default=6)
    ap.add_argument("--coarse_samples", type=int, default=32)
    ap.add_argument("--fine_samples", type=int, default=64)
    ap.add_argument("--num_rays", type=int, default=1024)
    ap.add_argument("--budgets", type=int, nargs="*",
                    default=[96, 64, 48, 32, 24, 16])
    ap.add_argument("--root", default="/tmp/occupancy_exp")
    args = ap.parse_args()

    import jax

    from vipnerf_tpu.utils.device import backend_probe_alive

    if not backend_probe_alive():
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")

    import jax.numpy as jnp

    from vipnerf_tpu.core.rendering import volume_rendering  # noqa: F401 (parity ref)
    from vipnerf_tpu.core.sampling import coarse_z_vals, sample_pdf
    from vipnerf_tpu.data import get_data_loader, get_data_preprocessor
    from vipnerf_tpu.data.synthetic import write_synthetic_database
    from vipnerf_tpu.losses import LossComputer
    from vipnerf_tpu.models import get_model
    from vipnerf_tpu.models.vip_nerf import _render_one_level, init_params
    from vipnerf_tpu.train.step import (
        make_optimizer,
        make_scan_train,
        make_train_step,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    root = Path(args.root)
    db_root = root / "data/databases"
    gt = write_synthetic_database(
        db_root, scene_name="synth01", num_frames=6, train_frames=(0, 5),
        val_frames=(2,), height=args.height, width=args.width,
    )

    mlp = {
        "num_samples": args.coarse_samples,
        "netdepth": args.netdepth,
        "netwidth": args.netwidth,
        "points_positional_encoding_degree": 6,
        "views_positional_encoding_degree": 2,
        "use_view_dirs": True,
        "view_dependent_rgb": True,
        "predict_visibility": True,
    }
    fine = dict(mlp)
    fine["num_samples"] = args.fine_samples
    configs = {
        "train_num": 1,
        "database": "NeRF_LLFF",
        "database_dirpath": "databases/NeRF_LLFF/data",
        "root_dirpath": str(root),
        "data_loader": {
            "data_loader_name": "NerfLlffDataLoader01",
            "data_preprocessor_name": "DataPreprocessor01",
            "train_set_num": 2,
            "scene_names": ["synth01"],
            "scene_id": "synth01",
            "resolution_suffix": "",
            "recenter_camera_poses": True,
            "bd_factor": 0.75,
            "spherify": False,
            "ndc": False,
            "batching": True,
            "downsampling_factor": 1,
            "num_rays": args.num_rays,
            "precrop_fraction": 1,
            "precrop_iterations": -1,
            "sparse_depth": {"dirname": "DE02", "num_rays": args.num_rays // 2},
            "visibility_prior": {
                "load_masks": True, "load_weights": False,
                "masks_dirname": "VW02",
            },
        },
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": mlp,
            "fine_mlp": fine,
            "chunk": 4096,
            "lindisp": False,
            "netchunk": 16384,
            "netchunk_map": 16384 if on_tpu else 0,
            "perturb": True,
            "raw_noise_std": 0.0,
            "white_bkgd": False,
            "bf16_matmuls": on_tpu,
            "f32_heads": on_tpu,
        },
        "losses": [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityLoss01", "weight": 0.1},
            {"name": "SparseDepthMSE01", "weight": 0.1},
        ],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4, "lr_decay": 250, "beta1": 0.9, "beta2": 0.999,
        },
        "seed": 0,
    }

    # ---- train the standard model
    loader = get_data_loader(configs, db_root / "NeRF_LLFF/data", mode="train")
    prep = get_data_preprocessor(
        configs, mode="train", raw_data_dict=loader.load_data()
    )
    init_fn, render_fn = get_model(configs)
    del init_fn
    params = init_params(jax.random.PRNGKey(0), configs)
    loss_computer = LossComputer(configs)
    tx = make_optimizer(configs)
    opt_state = tx.init(params)
    step = make_train_step(configs, render_fn, loss_computer, tx)
    scan = make_scan_train(configs, prep.gather_batch, step)
    import flax.serialization

    ckpt = root / f"params_{args.iters}_{args.netwidth}_{args.height}.msgpack"
    if ckpt.exists():
        params = flax.serialization.from_bytes(params, ckpt.read_bytes())
        print(f"reusing trained params from {ckpt}", flush=True)
    else:
        key = jax.random.PRNGKey(0)
        t0 = time.time()
        k_chunk = 100
        for it in range(0, args.iters, k_chunk):
            nerf_idx, sd_idx = prep.get_index_chunk(it, k_chunk)
            params, opt_state, scalars = scan(
                params, opt_state, key, it,
                jnp.asarray(nerf_idx), jnp.asarray(sd_idx),
            )
            if it % 500 == 0:
                tl = float(np.asarray(scalars["TotalLoss"])[-1])
                print(f"iter {it + k_chunk}: TotalLoss {tl:.4f}", flush=True)
        print(f"trained {args.iters} iters in {time.time() - t0:.0f}s",
              flush=True)
        ckpt.write_bytes(
            flax.serialization.to_bytes(jax.device_get(params))
        )

    # ---- scene AABB from the training rays' near/far span
    cache = jax.device_get(prep.cache)
    ro, rd = cache["rays_o"], cache["rays_d"]
    pts_near = ro + rd * prep.near
    pts_far = ro + rd * prep.far
    lo = np.minimum(pts_near.min(0), pts_far.min(0)).astype(np.float32)
    hi = np.maximum(pts_near.max(0), pts_far.max(0)).astype(np.float32)
    print(f"AABB: {lo} .. {hi}")

    # ---- occupancy grid: fine-MLP sigma on a lattice, threshold + dilate
    from vipnerf_tpu.models.mlp import apply_mlp

    g = args.grid
    axes = [np.linspace(lo[d], hi[d], g, dtype=np.float32) for d in range(3)]
    lattice = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)

    def sigma_at(pts):
        out = apply_mlp(
            params["fine"], configs["model"]["fine_mlp"],
            jnp.asarray(pts), jnp.zeros_like(jnp.asarray(pts)),
        )
        return out["sigma"][..., 0]

    sig = []
    bs = 65536
    jsig = jax.jit(sigma_at)
    for i in range(0, lattice.shape[0], bs):
        sig.append(np.asarray(jsig(lattice[i:i + bs])))
    sigma_grid = np.concatenate(sig).reshape(g, g, g)
    pct = np.percentile(sigma_grid, [50, 75, 90, 95, 99, 99.9])
    print("sigma percentiles 50/75/90/95/99/99.9:",
          np.round(pct, 3), flush=True)
    occ = sigma_grid > args.tau
    # dilate by 1 cell (max pool) so surfaces at cell borders stay covered
    occ_d = occ.copy()
    for axis in range(3):
        occ_d |= np.roll(occ, 1, axis) | np.roll(occ, -1, axis)
    occ_frac = occ_d.mean()
    print(f"occupied cells: {occ_frac:.1%} (pre-dilate {occ.mean():.1%})")
    occ_grid = jnp.asarray(occ_d.astype(np.float32))

    cell = (hi - lo) / g
    lo_j, cell_j = jnp.asarray(lo), jnp.asarray(cell)

    def grid_lookup(pts):
        """Nearest-cell occupancy for (..., 3) points (0 outside the AABB)."""
        idx = jnp.floor((pts - lo_j) / cell_j).astype(jnp.int32)
        inside = jnp.all((idx >= 0) & (idx < g), axis=-1)
        idx = jnp.clip(idx, 0, g - 1)
        flat = (idx[..., 0] * g + idx[..., 1]) * g + idx[..., 2]
        return jnp.where(inside, occ_grid.reshape(-1)[flat], 0.0)

    # ---- renderers
    model_cfg = configs["model"]
    common = dict(
        ndc=False, white_bkgd=False, sec_views_vis=False,
        raw_noise_std=0.0, noise_key=None,
        bf16=model_cfg.get("bf16_matmuls", False),
        remat=False, netchunk_map=model_cfg.get("netchunk_map", 0),
        f32_heads=model_cfg.get("f32_heads", False),
    )

    def render_standard(params, batch, n_fine):
        """Reference path: coarse MLP -> merged fine (n_fine) -> fine MLP."""
        cfg = {**configs, "model": {**model_cfg}}
        cfg["model"]["fine_mlp"] = {**fine, "num_samples": n_fine}
        out = render_fn(
            params, cfg, batch, train=False, sec_views_vis=False,
            retraw=False,
        )
        return out["rgb_fine"]

    def render_grid(params, batch, n_budget):
        """Grid-guided: occupancy PDF over coarse bins -> K fine samples ->
        fine MLP only (the coarse MLP is never evaluated)."""
        rays_o, rays_d = batch["rays_o"], batch["rays_d"]
        near, far = batch["near"], batch["far"]
        nb = args.coarse_samples * 2  # PDF resolution (cheap: grid lookups)
        edges = coarse_z_vals(near, far, nb + 1, lindisp=False, perturb=False)
        mids = 0.5 * (edges[..., 1:] + edges[..., :-1])
        pts = rays_o[..., None, :] + rays_d[..., None, :] * mids[..., :, None]
        w = grid_lookup(pts) + 1e-3  # floor: empty rays still sample
        z = sample_pdf(edges, w, n_budget, det=True)
        z = jnp.sort(z, axis=-1)
        outputs, _ = _render_one_level(
            params["fine"], fine, z, rays_o, rays_d, rays_o, rays_d,
            batch["view_dirs"], None, **common,
        )
        return outputs["rgb"]

    # ---- evaluate on held-out frames
    test_frames = [1, 3]
    h, w_ = args.height, args.width
    extr = np.loadtxt(
        db_root / "NeRF_LLFF/data/all/database_data/synth01/CameraExtrinsics.csv",
        delimiter=",",
    ).reshape(-1, 4, 4)

    def psnr(a, b):
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    def eval_renderer(fn, label, *fn_args):
        jfn = jax.jit(lambda p, b: fn(p, b, *fn_args))
        scores, dts = [], []
        for f in test_frames:
            batch = prep.create_test_data(extr[f])
            img = np.asarray(jfn(params, batch))  # compile+run
            t1 = time.time()
            img = np.asarray(jfn(params, batch))
            dts.append(time.time() - t1)
            scores.append(psnr(np.clip(img.reshape(h, w_, 3), 0, 1),
                               gt["images"][f] / 255.0))
        return float(np.mean(scores)), float(np.mean(dts)) * 1e3

    print(f"\n{'mode':<28}{'K':>5}{'PSNR':>8}{'ms/frame':>10}")
    base_psnr, base_ms = eval_renderer(
        render_standard, "standard", args.fine_samples
    )
    print(f"{'standard (reference path)':<28}{args.coarse_samples + args.fine_samples:>5}"
          f"{base_psnr:>8.2f}{base_ms:>10.1f}")
    for k in args.budgets:
        n_psnr, n_ms = eval_renderer(render_standard, "naive", k)
        g_psnr, g_ms = eval_renderer(render_grid, "grid", k)
        print(f"{'naive fine reduction':<28}{args.coarse_samples + k:>5}"
              f"{n_psnr:>8.2f}{n_ms:>10.1f}")
        print(f"{'grid-guided (no coarse MLP)':<28}{k:>5}"
              f"{g_psnr:>8.2f}{g_ms:>10.1f}")


if __name__ == "__main__":
    main()
