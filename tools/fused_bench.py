"""Benchmark the fused Pallas MLP kernel vs the XLA path at a given TILE.

Usage: VIPNERF_FUSED_TILE=4096 python tools/fused_bench.py --mode fwd
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
sys.path.insert(0, "/root/repo/experiments")
import fused_mlp as fm  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fwd", choices=["fwd", "bwd", "both"])
    ap.add_argument("--nr", type=int, default=4096)
    args = ap.parse_args()

    mlp_cfg = {
        "netdepth": 8,
        "netwidth": 256,
        "points_positional_encoding_degree": 10,
        "views_positional_encoding_degree": 4,
        "use_view_dirs": True,
        "view_dependent_rgb": True,
        "predict_visibility": True,
    }
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

    def fwd_all(params, data):
        outs = {}
        for name, ns in levels.items():
            d = data[name]
            vd = d["vd"] / jnp.linalg.norm(d["vd"], axis=-1, keepdims=True)
            vd_flat = jnp.broadcast_to(
                vd[:, None, :], (nr, ns, 3)
            ).reshape(nr * ns, 3)
            outs[name] = fm.apply_fused_mlp(
                params[name],
                mlp_cfg,
                d["pts"].reshape(nr * ns, 3),
                vd_flat,
                d["vd2"].reshape(nr * ns, 1, 3),
                raw_noise_std=1.0,
                noise_key=jax.random.PRNGKey(7),
            )
        return outs

    def loss_fn(params, data):
        outs = fwd_all(params, data)
        return sum(
            jnp.sum(jnp.square(v.astype(jnp.float32)))
            for lvl in outs.values()
            for v in lvl.values()
        )

    results = {"tile": fm.TILE, "nr": nr}
    if args.mode in ("fwd", "both"):
        r = kfold_time(fwd_all, (params, data))
        results["fused_fwd_ms"] = round(r["seconds"] * 1e3, 2)
    if args.mode in ("bwd", "both"):
        r = kfold_time(jax.grad(loss_fn), (params, data))
        results["fused_fwdbwd_ms"] = round(r["seconds"] * 1e3, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
