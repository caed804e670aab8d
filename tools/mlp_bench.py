"""Microbenchmark: the ViP-NeRF MLP forward / forward+backward on one chip.

Round-2 breakdown (BASELINE.md): at the bench workload the MLP costs
fwd 14.7 ms (~45% MXU) and bwd ~38 ms of the 55.8 ms step. This tool
isolates the MLP across the optimization variants so each lever is measured
independently:

  --pad {0,1}     pad_contractions (63->64, 319->320, 283->288 K dims)
  --remat {none,full,dots}
  --ncmap N       on-device point-chunk size (0 = no chunking)
  --mode {fwd,bwd,both}

Workload mirrors bench.py: coarse 4096x64 pts + fine 4096x192 pts, both
8x256 MLPs with view dirs + 1 secondary view, bf16 matmuls.

Usage: python tools/mlp_bench.py --pad 1 --remat dots --ncmap 16384
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vipnerf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from kfold_timing import kfold_time  # noqa: E402

from vipnerf_tpu.models.mlp import init_mlp_params  # noqa: E402
from vipnerf_tpu.models.vip_nerf import _run_mlp_on_samples  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pad", type=int, default=0)
    ap.add_argument("--remat", default="full", choices=["none", "full", "dots"])
    ap.add_argument("--ncmap", type=int, default=16384)
    ap.add_argument("--mode", default="both", choices=["fwd", "bwd", "both"])
    ap.add_argument("--bf16", type=int, default=1)
    ap.add_argument("--nr", type=int, default=4096)
    ap.add_argument("--noise", type=float, default=1.0)
    args = ap.parse_args()

    mlp_cfg = {
        "netdepth": 8,
        "netwidth": 256,
        "points_positional_encoding_degree": 10,
        "views_positional_encoding_degree": 4,
        "use_view_dirs": True,
        "view_dependent_rgb": True,
        "predict_visibility": True,
        "pad_contractions": bool(args.pad),
    }
    remat = {"none": False, "full": True, "dots": "dots"}[args.remat]

    key = jax.random.PRNGKey(0)
    kc, kf, kd = jax.random.split(key, 3)
    params = {
        "coarse": init_mlp_params(kc, mlp_cfg),
        "fine": init_mlp_params(kf, mlp_cfg),
    }
    nr = args.nr
    levels = {"coarse": 64, "fine": 192}
    data = {}
    for name, ns in levels.items():
        ks = jax.random.split(jax.random.fold_in(kd, ns), 3)
        data[name] = {
            "pts": jax.random.normal(ks[0], (nr, ns, 3), jnp.float32),
            "vd": jax.random.normal(ks[1], (nr, 3), jnp.float32),
            "vd2": jax.random.normal(ks[2], (nr, ns, 1, 3), jnp.float32),
        }
    data = jax.device_put(data)
    params = jax.device_put(params)

    def fwd_all(params, data):
        outs = {}
        for name in levels:
            d = data[name]
            vd = d["vd"] / jnp.linalg.norm(d["vd"], axis=-1, keepdims=True)
            outs[name] = _run_mlp_on_samples(
                params[name],
                mlp_cfg,
                d["pts"],
                vd,
                d["vd2"],
                raw_noise_std=args.noise,
                noise_key=jax.random.PRNGKey(7),
                bf16_matmuls=bool(args.bf16),
                remat=remat,
                netchunk_map=args.ncmap,
            )
        return outs

    def loss_fn(params, data):
        outs = fwd_all(params, data)
        total = 0.0
        for level in outs.values():
            for v in level.values():
                total = total + jnp.sum(jnp.square(v.astype(jnp.float32)))
        return total

    results = {}
    if args.mode in ("fwd", "both"):
        r = kfold_time(fwd_all, (params, data))
        results["fwd_ms"] = round(r["seconds"] * 1e3, 2)
    if args.mode in ("bwd", "both"):
        grad_fn = jax.grad(loss_fn)
        r = kfold_time(grad_fn, (params, data))
        results["fwdbwd_ms"] = round(r["seconds"] * 1e3, 2)
        if "fwd_ms" in results:
            results["bwd_ms"] = round(
                results["fwdbwd_ms"] - results["fwd_ms"], 2
            )

    results.update(
        pad=args.pad, remat=args.remat, ncmap=args.ncmap, bf16=args.bf16,
        device=jax.devices()[0].device_kind,
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
