"""Where does the MLP time actually go? Piecewise isolation on one chip.

Measures, at the bench workload (1.05M points through the 8x256 MLP):
  matmul_chain : pure trunk-shaped matmul chain (the MXU ceiling)
  trunk        : PE + trunk + sigma head only
  no_vis2      : + feature/view branch, primary views only
  full         : everything incl. secondary-view visibility branch

Each measured fwd and fwd+bwd with the production remat/ncmap settings, so
the deltas attribute time to PE, heads, and the vis2 re-run.
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
from vipnerf_tpu.models.vip_nerf import _remat_wrap, _run_mlp_on_samples  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="full", choices=["none", "full", "dots"])
    ap.add_argument("--ncmap", type=int, default=16384)
    ap.add_argument("--nr", type=int, default=4096)
    ap.add_argument(
        "--piece", default="all",
        choices=["all", "matmul_chain", "trunk", "no_vis2", "full"],
    )
    args = ap.parse_args()
    remat = {"none": False, "full": True, "dots": "dots"}[args.remat]

    nr = args.nr
    npts = nr * 64 + nr * 192  # coarse + fine points

    key = jax.random.PRNGKey(0)

    results = {"npts": npts, "remat": args.remat, "ncmap": args.ncmap}

    # ---- pure matmul chain: trunk shapes, chunked like production --------
    if args.piece in ("all", "matmul_chain"):
        ws = [
            jax.random.normal(jax.random.fold_in(key, i), shp, jnp.bfloat16)
            for i, shp in enumerate(
                [(64, 256)] + [(256, 256)] * 4 + [(320, 256)] + [(256, 256)] * 2
            )
        ]
        x0 = jax.random.normal(jax.random.fold_in(key, 99), (npts, 64), jnp.bfloat16)

        def chain(ws, x0):
            n_chunks = npts // args.ncmap

            def body(x):
                h = x
                for i, w in enumerate(ws):
                    if w.shape[0] == 320:
                        h = jnp.pad(h, ((0, 0), (0, 64)))
                    h = jax.nn.relu(
                        jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
                    )
                return h

            inner = _remat_wrap(body, remat)
            xs = x0.reshape(n_chunks, args.ncmap, 64)
            return jax.lax.map(inner, xs)

        r = kfold_time(chain, (ws, x0))
        results["matmul_chain_fwd_ms"] = round(r["seconds"] * 1e3, 2)

        def chain_loss(ws, x0):
            return jnp.sum(chain(ws, x0).astype(jnp.float32) ** 2)

        r = kfold_time(jax.grad(chain_loss), (ws, x0))
        results["matmul_chain_fwdbwd_ms"] = round(r["seconds"] * 1e3, 2)

    # ---- MLP pieces ------------------------------------------------------
    def piece_cfg(view_dep, vis2):
        return {
            "netdepth": 8,
            "netwidth": 256,
            "points_positional_encoding_degree": 10,
            "views_positional_encoding_degree": 4,
            "use_view_dirs": view_dep,
            "view_dependent_rgb": view_dep,
            "predict_visibility": view_dep,
        }, vis2

    pieces = {
        "trunk": piece_cfg(False, False),
        "no_vis2": piece_cfg(True, False),
        "full": piece_cfg(True, True),
    }
    levels = {"coarse": 64, "fine": 192}
    for name, (cfg, vis2) in pieces.items():
        if args.piece not in ("all", name):
            continue
        params = {
            lvl: init_mlp_params(jax.random.fold_in(key, 7 + j), cfg)
            for j, lvl in enumerate(levels)
        }
        data = {}
        for lvl, ns in levels.items():
            ks = jax.random.split(jax.random.fold_in(key, ns), 3)
            data[lvl] = {
                "pts": jax.random.normal(ks[0], (nr, ns, 3), jnp.float32),
                "vd": jax.random.normal(ks[1], (nr, 3), jnp.float32),
                "vd2": jax.random.normal(ks[2], (nr, ns, 1, 3), jnp.float32),
            }

        def fwd_all(params, data):
            outs = {}
            for lvl in levels:
                d = data[lvl]
                outs[lvl] = _run_mlp_on_samples(
                    params[lvl],
                    cfg,
                    d["pts"],
                    d["vd"] if cfg["use_view_dirs"] else None,
                    d["vd2"] if vis2 else None,
                    raw_noise_std=1.0,
                    noise_key=jax.random.PRNGKey(7),
                    bf16_matmuls=True,
                    remat=remat,
                    netchunk_map=args.ncmap,
                )
            return outs

        def loss_fn(params, data):
            outs = fwd_all(params, data)
            return sum(
                jnp.sum(jnp.square(v.astype(jnp.float32)))
                for lvl in outs.values()
                for v in lvl.values()
            )

        r = kfold_time(fwd_all, (params, data))
        results[f"{name}_fwd_ms"] = round(r["seconds"] * 1e3, 2)
        r = kfold_time(jax.grad(loss_fn), (params, data))
        results[f"{name}_fwdbwd_ms"] = round(r["seconds"] * 1e3, 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
