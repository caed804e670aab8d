"""Headline benchmark: ViP-NeRF training throughput on one TPU chip.

Reference workload (BASELINE.md): 2048 NeRF rays + 2048 sparse-depth rays per
iteration, 64 coarse + 64+128 fine samples, two 8x256 MLPs (PE 10/4), full
ViP-NeRF loss stack, Adam. The reference runs this on 2 CUDA GPUs with
torch.nn.DataParallel and Python-loop chunking; here it's one jitted
lax.scan over K iterations with an on-device ray cache.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": value / 5e6}   # 5M rays/s/chip = BASELINE.json north star

Env knobs: BENCH_BF16=0 to disable bf16 matmuls, BENCH_STEPS, BENCH_REMAT=1.
"""

import json
import os
import sys
import time


def _wait_for_tpu():
    """Block until the axon TPU tunnel answers, or fall back to CPU.

    The tunnel goes down for hours at a time (observed 2026-08-17); a bare
    ``jax.devices()`` then hangs forever, which would swallow the whole
    bench run. Probe in a subprocess with a timeout, retry for
    BENCH_TPU_WAIT_S (default 30 min), then run on CPU with the fallback
    recorded in the output rather than report nothing at all.

    Returns (backend, reason): ("tpu", "") on a live tunnel;
    ("cpu", "requested") when the caller pinned JAX_PLATFORMS=cpu
    deliberately (no tunnel claim is made); ("cpu", "tpu_tunnel_down")
    after the wait expires.
    """
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        return "cpu", "requested"
    from vipnerf_tpu.utils.device import backend_probe_alive

    deadline = time.time() + float(os.environ.get("BENCH_TPU_WAIT_S", "1800"))
    while True:
        if backend_probe_alive():
            return "tpu", ""
        if time.time() > deadline:
            print("# TPU tunnel unreachable for BENCH_TPU_WAIT_S; "
                  "falling back to CPU", file=sys.stderr)
            return "cpu", "tpu_tunnel_down"
        print("# TPU tunnel down; retrying in 120s", file=sys.stderr)
        time.sleep(120)


# Set by _init_backend(); referenced throughout main(). Kept out of import
# time: merely importing this module must never block on the TPU probe.
_BACKEND = "cpu"
_CPU_REASON = "requested"


def _init_backend():
    """Probe the tunnel (possibly waiting), then import+configure jax."""
    global _BACKEND, _CPU_REASON, jax, jnp, np
    _BACKEND, _CPU_REASON = _wait_for_tpu()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if _BACKEND == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    _init_backend()
    from vipnerf_tpu.data.preprocessor import DataPreprocessor
    from vipnerf_tpu.data.synthetic import make_camera_ring
    from vipnerf_tpu.losses import LossComputer
    from vipnerf_tpu.models import get_model
    from vipnerf_tpu.train.step import (
        default_step_dispatch,
        make_host_loop_train,
        make_optimizer,
        make_scan_train,
        make_train_step,
    )

    bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    # remat default ON: recomputing the (cheap, fast-PE) forward beats
    # saving ~10 activation tensors to HBM (measured 77 -> 60 ms/step).
    remat = os.environ.get("BENCH_REMAT", "1") == "1"
    netchunk_map = int(os.environ.get("BENCH_NCMAP", "16384"))
    # 100 = the product Trainer's scan_steps default (train/trainer.py), so
    # the published step time is measured at the chunk size the product
    # actually dispatches (VERDICT round-3 weak #5 asked for this parity).
    k_steps = int(os.environ.get("BENCH_STEPS", "100" if _BACKEND == "tpu" else "2"))
    num_rays = 2048
    num_rays_sd = 2048

    # Reference-scale workload: 2 train views at LLFF down4 resolution
    # 756x1008. Pixels are random noise (throughput doesn't depend on image
    # content); dryrun_multichip is the one that renders a real scene.
    h, w = 756, 1008
    extrinsics = make_camera_ring(2)
    focal = 0.9 * w
    intrinsic = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(2, h, w, 3), dtype=np.uint8)

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
            "num_rays": num_rays,
            "visibility_prior": {
                "load_masks": True, "load_weights": False, "masks_dirname": "VW02",
            },
            "sparse_depth": {"dirname": "DE02", "num_rays": num_rays_sd},
        },
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": {
                "num_samples": 64, "netdepth": 8, "netwidth": 256,
                "points_positional_encoding_degree": 10,
                "views_positional_encoding_degree": 4,
                "use_view_dirs": True, "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            "fine_mlp": {
                "num_samples": 128, "netdepth": 8, "netwidth": 256,
                "points_positional_encoding_degree": 10,
                "views_positional_encoding_degree": 4,
                "use_view_dirs": True, "view_dependent_rgb": True,
                "predict_visibility": True,
            },
            "chunk": 4096, "lindisp": False, "netchunk": 16384,
            "perturb": True, "raw_noise_std": 1.0, "white_bkgd": False,
            "bf16_matmuls": bf16, "remat": remat,
            # stability-rescue mixed precision (BASELINE.md round-3):
            # bf16 trunk + f32 heads survives where pure bf16 collapses;
            # default ON to bench the shipping config (1.9% cost measured)
            "f32_heads": os.environ.get("BENCH_F32_HEADS", "1") == "1",
            # measured optimum on v5e: bounds live activations per map
            # iteration; also dodges the backend's regalloc failure on very
            # large fused bodies
            "netchunk_map": netchunk_map,
        },
        "losses": [
            {"name": "MSE01", "weight": 1},
            {"name": "VisibilityLoss01", "weight": 0.1},
            {"name": "VisibilityPriorLoss01",
             "iter_weights": {"0": 0, "30000": 0.001}},
            {"name": "SparseDepthMSE01", "weight": 0.1},
        ],
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4, "lr_decay": 250, "beta1": 0.9, "beta2": 0.999,
        },
        "seed": 0,
    }

    # Synthetic raw data in the loader's output format -> real preprocessor
    bounds = np.array([1.8, 5.5])
    n_train = 2
    depths = np.full((n_train, h, w), 3.0)
    raw = {
        "frame_nums": np.arange(n_train),
        "nerf_data": {
            "images": images,
            "extrinsics": extrinsics,
            "intrinsics": np.tile(intrinsic[None], (n_train, 1, 1)),
            "resolution": (h, w),
            "bounds": bounds,
        },
        "sparse_depth_data": {
            f: _fake_sparse_depth(rng, h, w, depths[f]) for f in range(n_train)
        },
        "visibility_prior_data": {
            "masks": rng.random((n_train, n_train - 1, h, w)) > 0.3,
        },
    }

    prep = DataPreprocessor(configs, "train", raw)
    init_fn, render_fn = get_model(configs)
    params = init_fn(jax.random.PRNGKey(0), configs)
    loss_computer = LossComputer(configs)
    tx = make_optimizer(configs)
    opt_state = tx.init(params)
    train_step = make_train_step(configs, render_fn, loss_computer, tx)
    dispatch = os.environ.get("BENCH_DISPATCH", default_step_dispatch())
    if dispatch == "host":
        scan_train = make_host_loop_train(
            configs, prep.gather_batch, train_step, with_sd=True
        )
    else:
        scan_train = make_scan_train(configs, prep.gather_batch, train_step)
    key = jax.random.PRNGKey(0)

    # Warmup / compile. The axon TPU backend currently fails register
    # allocation on the bf16 fused train step (Mosaic RET_CHECK in
    # live_range_finder) — fall back to f32 so the bench always reports.
    def warmup(params, opt_state, scan_fn):
        nerf_idx, sd_idx = prep.get_index_chunk(0, k_steps)
        t0 = time.time()
        params, opt_state, scalars = scan_fn(
            params, opt_state, key, 0, jnp.asarray(nerf_idx), jnp.asarray(sd_idx)
        )
        jax.block_until_ready(scalars)
        return params, opt_state, time.time() - t0

    try:
        params, opt_state, compile_time = warmup(params, opt_state, scan_train)
    except Exception as e:  # noqa: BLE001 - backend compile failure
        if not bf16:
            raise
        print(f"# bf16 compile failed ({type(e).__name__}); retrying f32",
              file=sys.stderr)
        bf16 = False
        configs["model"]["bf16_matmuls"] = False
        params = init_fn(jax.random.PRNGKey(0), configs)
        opt_state = tx.init(params)
        train_step = make_train_step(configs, render_fn, loss_computer, tx)
        if dispatch == "host":
            scan_train = make_host_loop_train(
                configs, prep.gather_batch, train_step, with_sd=True
            )
        else:
            scan_train = make_scan_train(configs, prep.gather_batch, train_step)
        params, opt_state, compile_time = warmup(params, opt_state, scan_train)

    # Timed runs (one is enough for the CPU fallback's order-of-magnitude)
    times = []
    it = k_steps
    for _ in range(3 if _BACKEND == "tpu" else 1):
        nerf_idx, sd_idx = prep.get_index_chunk(it, k_steps)
        nerf_idx = jnp.asarray(nerf_idx)
        sd_idx = jnp.asarray(sd_idx)
        jax.block_until_ready((nerf_idx, sd_idx))
        t0 = time.time()
        params, opt_state, scalars = scan_train(
            params, opt_state, key, it, nerf_idx, sd_idx
        )
        jax.block_until_ready(scalars)
        times.append(time.time() - t0)
        it += k_steps

    best = min(times)
    rays_per_step = num_rays + num_rays_sd
    value = k_steps * rays_per_step / best

    # ---- render throughput (BASELINE tracked metric: fps at 1008x756) ----
    # Full-image inference through the single-dispatch TiledRenderer path
    # (reference chunked eval: /root/reference/src/Tester01.py:57-66).
    render_fps = render_rays_s = None
    if os.environ.get("BENCH_RENDER", "1" if _BACKEND == "tpu" else "0") == "1":
        try:
            from vipnerf_tpu.infer.renderer import TiledRenderer

            # Measured optimum (v5e, post sample_pdf rewrite): small tiles
            # pipeline better — 8192/32768 gives 0.344 fps vs 0.245 at
            # 65536/262144.
            configs["model"]["netchunk_map_infer"] = int(
                os.environ.get("BENCH_NCMAP_INFER", "32768")
            )
            renderer = TiledRenderer(render_fn, configs)
            pose = np.eye(4, dtype=np.float32)
            pose[2, 3] = -1.0
            test_batch = prep.create_test_data(pose, preprocess_pose=False)
            n_render_rays = h * w
            kwargs = dict(
                chunk_size=int(os.environ.get("BENCH_RENDER_TILE", "8192")),
                keep=("rgb_fine", "depth_fine"),
                uint8_rgb=True,
            )
            renderer.render(params, test_batch, **kwargs)  # compile+warm
            t0 = time.time()
            outputs, _ = renderer.render(params, test_batch, **kwargs)
            dt = time.time() - t0
            render_fps = 1.0 / dt
            render_rays_s = n_render_rays / dt
        except Exception as e:  # noqa: BLE001 - keep the headline metric alive
            print(f"# render bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # ---- quality-validated reduced sample budget (32 coarse + 8 fine) ----
    # Measured on trained checkpoints (tools/sample_budget_eval.py,
    # BASELINE.md): on the sparse-view scenes the reduced budget renders
    # ~3.6x cheaper AND scores HIGHER PSNR than the trained 64+128 config
    # (dense quadrature integrates the free-space "fog" sparse-view training
    # leaves; a reduced budget skips it). Defaults everywhere stay at
    # reference parity (/root/reference/src/NerfLlffTrainerTester01.py:267,
    # 277); this metric surfaces the documented test-time operating point
    # (MIGRATION.md "Render-time sample budget").
    budget_fps = None
    if os.environ.get("BENCH_BUDGET", "1") == "1" and render_fps is None:
        print("# budget bench skipped: render bench did not run "
              "(it provides the test batch)", file=sys.stderr)
    if os.environ.get("BENCH_BUDGET", "1") == "1" and render_fps is not None:
        try:
            import copy as _copy

            bcfg = _copy.deepcopy(configs)
            bcfg["model"]["coarse_mlp"]["num_samples"] = 32
            bcfg["model"]["fine_mlp"]["num_samples"] = 8
            budget_renderer = TiledRenderer(render_fn, bcfg)
            budget_renderer.render(params, test_batch, **kwargs)  # compile
            t0 = time.time()
            budget_renderer.render(params, test_batch, **kwargs)
            budget_fps = 1.0 / (time.time() - t0)
        except Exception as e:  # noqa: BLE001
            print(f"# budget render bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # ---- preview mode (beyond-reference feature) ----
    # `preview: true` IS the 32+8 reduced-budget full pipeline since round 5:
    # coarse-only preview was retired with a measurement (13.5 dB held-out vs
    # 20.5 at 32+8 / 24.1 at full 64+128 on a trained 3-view DTU checkpoint,
    # bit-identical to the full render's own rgb_coarse map — the coarse MLP
    # is an importance-sampling field, not a usable image; BASELINE.md
    # round-5). The budget measurement above therefore IS the preview
    # operating point; measure it through preview_budget_configs so the
    # metric exercises the product path.
    preview_fps = None
    if os.environ.get("BENCH_PREVIEW", "1") == "1" and render_fps is None:
        print("# preview bench skipped: render bench did not run "
              "(it provides the test batch)", file=sys.stderr)
    if os.environ.get("BENCH_PREVIEW", "1") == "1" and render_fps is not None:
        try:
            from vipnerf_tpu.infer.renderer import (
                TiledRenderer,
                preview_budget_configs,
            )

            pcfg = preview_budget_configs(configs)
            previewer = TiledRenderer(render_fn, pcfg)
            kwargs_p = dict(
                chunk_size=int(os.environ.get("BENCH_RENDER_TILE", "8192")),
                keep=("rgb_fine", "depth_fine"),
                uint8_rgb=True,
            )
            previewer.render(params, test_batch, **kwargs_p)  # compile+warm
            t0 = time.time()
            previewer.render(params, test_batch, **kwargs_p)
            preview_fps = 1.0 / (time.time() - t0)
        except Exception as e:  # noqa: BLE001
            print(f"# preview bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / 5e6, 4),
    }
    if _BACKEND == "cpu":
        # never mistake a CPU number for a TPU regression — and never claim
        # the tunnel was down when the caller pinned JAX_PLATFORMS=cpu
        result["metric"] = (
            "train_rays_per_sec_CPU_FALLBACK_tpu_tunnel_down"
            if _CPU_REASON == "tpu_tunnel_down"
            else "train_rays_per_sec_CPU"
        )
    if render_fps is not None:
        result["render_fps_1008x756"] = round(render_fps, 4)
        result["render_rays_per_sec"] = round(render_rays_s, 1)
        # second standalone line so the render metric is driver-visible on
        # its own as well
        print(json.dumps({
            "metric": "render_fps_1008x756",
            "value": round(render_fps, 4),
            "unit": "fps",
            "vs_baseline": round(render_fps / 30.0, 6),  # 30 fps = real-time
        }))
    if budget_fps is not None:
        result["render_fps_budget32p8_1008x756"] = round(budget_fps, 4)
        print(json.dumps({
            "metric": "render_fps_budget32p8_1008x756",
            "value": round(budget_fps, 4),
            "unit": "fps",
            "vs_baseline": round(budget_fps / 30.0, 6),
        }))
        print(
            "# render_fps_budget32p8: 32 coarse + 8 fine samples — the "
            "quality-validated test-time budget (BASELINE.md sample-budget "
            "sweeps on trained protocol checkpoints: +1.81 dB over 64+128 "
            "on the LLFF 50k scene; see the round-4 DTU entry for the "
            "second-scene validation). Training and default test configs "
            "remain at reference-parity 64+128.",
            file=sys.stderr,
        )
    if preview_fps is not None:
        result["preview_fps_1008x756"] = round(preview_fps, 4)
        print(json.dumps({
            "metric": "preview_fps_1008x756",  # preview = 32+8 budget pipeline
            "value": round(preview_fps, 4),
            "unit": "fps",
            "vs_baseline": round(preview_fps / 30.0, 6),
        }))
        print(
            "# preview mode = the 32+8 budget pipeline since round 5; "
            "coarse-only preview retired with measurement (13.5 dB held-out "
            "vs 20.5 at 32+8 / 24.1 at full, trained 3-view DTU checkpoint; "
            "BASELINE.md round-5). preview: <int> keeps a coarse-only "
            "density/debug view.",
            file=sys.stderr,
        )
    print(json.dumps(result))
    # diagnostics to stderr-adjacent lines (driver reads the JSON line)

    print(
        f"# device={jax.devices()[0].device_kind} bf16={bf16} remat={remat} "
        f"steps/chunk={k_steps} compile={compile_time:.1f}s "
        f"step={best / k_steps * 1e3:.2f}ms total_loss={float(scalars['TotalLoss'][-1]):.4f}",
        file=sys.stderr,
    )
    if _BACKEND != "tpu":
        return
    print(
        "# step breakdown (K-fold isolation, BASELINE.md round-3): "
        "MLP fwd 14.0ms / fwd+bwd 46.3ms (HBM-roofline-bound: intensity "
        "N/2=128 FLOP/B vs chip ~400-500; padding K dims + remat policies "
        "measured no-ops; fused Pallas retired, see experiments/); "
        "render+losses non-MLP ~5.4ms; gather 0.2ms; adam+scan ~4ms. "
        "Shipping mode = bf16 trunk + f32 heads (stability fix, +1.9% vs "
        "pure bf16; BENCH_F32_HEADS=0 for the pure-bf16 number)",
        file=sys.stderr,
    )


def _fake_sparse_depth(rng, h, w, depth_img):
    import pandas as pd

    k = 300
    xs = rng.integers(0, w, k)
    ys = rng.integers(0, h, k)
    return pd.DataFrame(
        {
            "x": xs,
            "y": ys,
            "depth": depth_img[ys, xs],
            "reprojection_error": rng.uniform(0.1, 1.0, k),
        }
    )


if __name__ == "__main__":
    main()
