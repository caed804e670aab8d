"""The ViP-NeRF renderer: hierarchical coarse+fine NeRF with a visibility head.

Composes core sampling / encoding / MLP / compositing into a single pure
function over a statically-shaped ray batch. Behavioral parity target:
src/models/VipNeRF01.py:34-226 `VipNeRF.render_rays` (paths relative to
/root/reference/), with these TPU-first differences:

- No ray `chunk` / point `netchunk` Python loops (reference :47-72, 295-329):
  the whole batch renders in one traced computation; XLA handles tiling.
  Full-image inference tiles rays *outside* jit (vipnerf_tpu.infer).
- Conditional dict keys become static config branches, so each (ndc, fine,
  visibility, retraw) combination compiles once with a fixed output pytree.
- RNG is an explicit key (reference uses global torch RNG).
- Optional rematerialization of the MLP (`configs['model']['remat']`) trades
  recompute for HBM during backprop.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vipnerf_tpu.core.rays import ndc_z_to_ray_t
from vipnerf_tpu.core.rendering import volume_rendering
from vipnerf_tpu.core.sampling import coarse_z_vals, fine_z_vals
from vipnerf_tpu.models.mlp import apply_mlp, init_mlp_params

Params = Dict[str, Any]


def init_params(key: jax.Array, configs: Dict[str, Any]) -> Params:
    """Init coarse/fine MLP parameter pytrees per `configs['model']`."""
    if "fine_mlp" in configs["model"] and "coarse_mlp" not in configs["model"]:
        # hierarchical fine sampling inverts the coarse weights' CDF; a
        # fine-only config cannot render (the reference constructor also
        # fails on it, VipNeRF01.py:19 reads coarse_mlp unconditionally)
        raise RuntimeError("fine_mlp requires coarse_mlp")
    params: Params = {}
    keys = jax.random.split(key, 2)
    if "coarse_mlp" in configs["model"]:
        params["coarse"] = init_mlp_params(keys[0], configs["model"]["coarse_mlp"])
    if "fine_mlp" in configs["model"]:
        params["fine"] = init_mlp_params(keys[1], configs["model"]["fine_mlp"])
    return params


def num_params(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def _gather_secondary_origins(
    poses: jnp.ndarray, pixel_id: jnp.ndarray
) -> jnp.ndarray:
    """Per-ray other-view camera centers (reference :84-98).

    poses: (nf, 4, 4) preprocessed c2w; pixel_id: (nr, 3) with [:, 0] = image
    id. For each ray and j in [0, nf-2]: other_id = j + (j >= image_id).
    Returns (nr, nf-1, 3).
    """
    nf = poses.shape[0]
    image_id = pixel_id[:, 0].astype(jnp.int32)  # (nr,)
    j = jnp.arange(nf - 1, dtype=jnp.int32)  # (nf-1,)
    other_ids = j[None, :] + (j[None, :] >= image_id[:, None]).astype(jnp.int32)
    origins = poses[:, :3, 3]  # (nf, 3)
    return origins[other_ids]  # (nr, nf-1, 3)


def _compute_other_view_dirs(
    z_vals: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_o2: jnp.ndarray,
    ndc: bool,
) -> jnp.ndarray:
    """Unit dirs from secondary camera centers to ray points (reference
    :218-226). z_vals are NDC z' in NDC mode (converted to metric t here,
    near=1 hard-coded as in the reference)."""
    if ndc:
        t = ndc_z_to_ray_t(z_vals, rays_o, rays_d)
    else:
        t = z_vals
    pts = rays_o[..., None, :] + t[..., None] * rays_d[..., None, :]  # (nr, ns, 3)
    d = pts[:, :, None, :] - rays_o2[:, None, :, :]  # (nr, ns, nf-1, 3)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _remat_wrap(fn, remat):
    """Wrap `fn` in jax.checkpoint per the model's `remat` config.

    remat: False/None = no rematerialization; True = full remat (recompute
    the whole forward in the backward pass); "dots" = save matmul outputs,
    recompute only elementwise ops (positional encodings, relu, concats) —
    the backward then never re-runs the MXU work.
    """
    if not remat:
        return fn
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.dots_saveable
        )
    return jax.checkpoint(fn)


def _run_mlp_on_samples(
    mlp_params: Params,
    mlp_cfg: Dict[str, Any],
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray],
    view_dirs2: Optional[jnp.ndarray],
    *,
    raw_noise_std: float,
    noise_key: Optional[jax.Array],
    bf16_matmuls: bool,
    remat: bool,
    netchunk_map: int = 0,
    f32_heads: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Flatten (nr, ns, ...) sample tensors, run the MLP, reshape back
    (reference run_network :264-293; the host netchunk loop becomes an
    optional on-device lax.map).

    A fused Pallas MLP was evaluated and RETIRED after exhaustive
    measurement (round 3): the XLA path here is at its HBM roofline
    (~14 ms fwd for the 1.05M-point bench workload) and the Pallas
    alternative measures slower (23.7 ms) because the per-matmul dependency
    floor (~1.5 us) plus out-of-kernel positional encodings eat the
    activation-traffic savings. Full analysis + the kernel live in
    experiments/fused_mlp.py."""
    nr, ns = pts.shape[0], pts.shape[1]
    pts_flat = pts.reshape(nr * ns, 3)
    vd_flat = None
    if view_dirs is not None:
        vd_flat = jnp.broadcast_to(view_dirs[:, None, :], (nr, ns, 3)).reshape(
            nr * ns, 3
        )
    vd2_flat = None
    if view_dirs2 is not None:
        nf_m1 = view_dirs2.shape[2]
        vd2_flat = view_dirs2.reshape(nr * ns, nf_m1, 3)

    def fwd(key):
        # one shared (remat-wrapped) MLP application, parameterized on the
        # sigma-noise key so the chunked path can fold in a per-chunk key
        return _remat_wrap(
            lambda p, pf, vf, v2f: apply_mlp(
                p, mlp_cfg, pf, vf, v2f,
                raw_noise_std=raw_noise_std, noise_key=key,
                bf16_matmuls=bf16_matmuls, f32_heads=f32_heads,
            ),
            remat,
        )

    if netchunk_map and nr * ns > netchunk_map:
        # On-device point chunking: lax.map over fixed-size chunks. Unlike
        # the reference's host-side netchunk loop (VipNeRF01.py:295-329) this
        # stays one compiled program; it bounds live activation memory and
        # keeps each loop-body program small (the axon TPU backend chokes on
        # very large fused bodies).
        npts = nr * ns
        chunk = netchunk_map
        n_chunks = -(-npts // chunk)
        padded = n_chunks * chunk

        def pad0(x):
            if x is None:
                return None
            return jnp.pad(
                x, [(0, padded - npts)] + [(0, 0)] * (x.ndim - 1)
            ).reshape((n_chunks, chunk) + x.shape[1:])

        xs = (jnp.arange(n_chunks), pad0(pts_flat), pad0(vd_flat), pad0(vd2_flat))
        xs = tuple(x for x in xs if x is not None)

        def body(chunk_inputs):
            idx = chunk_inputs[0]
            pf = chunk_inputs[1]
            vf = chunk_inputs[2] if vd_flat is not None else None
            v2f = chunk_inputs[-1] if vd2_flat is not None else None
            # distinct sigma noise per chunk
            key = (
                jax.random.fold_in(noise_key, idx)
                if noise_key is not None
                else None
            )
            return fwd(key)(mlp_params, pf, vf, v2f)

        raw = jax.lax.map(body, xs)
        raw = {
            k: v.reshape((padded,) + v.shape[2:])[:npts]
            for k, v in raw.items()
        }
    else:
        raw = fwd(noise_key)(mlp_params, pts_flat, vd_flat, vd2_flat)
    return {
        k: v.reshape((nr, ns) + v.shape[1:]) for k, v in raw.items()
    }


def _scale_infer_netchunk(netchunk: int, num_sec_views: int) -> int:
    """Hold the inference point-chunk body's footprint at the proven level
    as the secondary-view count grows.

    The compiled chunk body's work and vmem footprint grow linearly with the
    secondary-view count (vd2 is (chunk, nf-1, 3) and each view adds a
    visibility MLP branch). netchunk_map_infer's 262144 default was proven
    at <=1 secondary view; at 2 (3 input views, DTU demo1b) the same chunk
    RET_CHECKed this environment's libtpu regalloc (live_range_finder.cc:29,
    tile-size-independent — see tools/resume_dtu_control.py). 131072 at 2
    views is the dodge validated live on the TPU; the floor never scales an
    already-small explicit chunk further down."""
    scaled = netchunk // max(1, num_sec_views)
    return max(min(netchunk, 16384), scaled)


def render_rays(
    params: Params,
    configs: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    *,
    train: bool,
    sec_views_vis: bool = False,
    retraw: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a batch of rays through coarse (+ fine) MLPs.

    `batch` fields (all (nr, ...)): rays_o, rays_d, view_dirs, near, far;
    NDC mode adds rays_o_ndc, rays_d_ndc, near_ndc, far_ndc. For secondary
    visibility either `rays_o2` (nr, nf-1, 3) (test path, reference :85-86)
    or `pixel_id` + `poses` (nf, 4, 4) (train path, reference :88-98).

    Output contract matches reference render_rays (:126-171):
    {rgb, acc, alpha, visibility, weights, depth, depth_var
     [, depth_ndc, depth_var_ndc][, visibility2]}_{coarse,fine} + z_vals_* and
    raw_* network outputs when retraw; intermediates dropped when not retraw.
    """
    mcfg = configs["model"]
    ndc = configs["data_loader"]["ndc"]
    retraw = retraw or train
    sec_views_vis = sec_views_vis or train
    coarse_needed = "coarse_mlp" in mcfg
    fine_needed = "fine_mlp" in mcfg
    predict_visibility = (
        coarse_needed and mcfg["coarse_mlp"]["predict_visibility"]
    ) or (fine_needed and mcfg["fine_mlp"]["predict_visibility"])
    perturb = bool(mcfg["perturb"]) and train
    raw_noise_std = mcfg["raw_noise_std"] if train else 0.0
    bf16 = mcfg.get("bf16_matmuls", False)
    f32_heads = mcfg.get("f32_heads", False)
    remat = mcfg.get("remat", False)
    # Training chunks small (bounds live fwd+bwd activations); inference
    # fwd-only can take much larger chunks — sequential-loop overhead
    # dominates otherwise (measured 9s/frame at 16k vs ~2s at 256k).
    if train:
        netchunk_map = mcfg.get("netchunk_map", 0)
    else:
        netchunk_map = mcfg.get("netchunk_map_infer", 0)
    white_bkgd = mcfg["white_bkgd"]

    rays_o = batch["rays_o"]
    rays_d = batch["rays_d"]
    view_dirs = batch.get("view_dirs")
    if ndc:
        rays_o_s, rays_d_s = batch["rays_o_ndc"], batch["rays_d_ndc"]
        near, far = batch["near_ndc"], batch["far_ndc"]
    else:
        rays_o_s, rays_d_s = rays_o, rays_d
        near, far = batch["near"], batch["far"]

    rays_o2 = None
    if predict_visibility and sec_views_vis:
        if "rays_o2" in batch:
            rays_o2 = batch["rays_o2"]
        else:
            rays_o2 = _gather_secondary_origins(batch["poses"], batch["pixel_id"])

    if not train and netchunk_map and rays_o2 is not None:
        netchunk_map = _scale_infer_netchunk(netchunk_map, rays_o2.shape[1])

    keys = (
        jax.random.split(rng, 4)
        if rng is not None
        else [None, None, None, None]
    )

    out: Dict[str, jnp.ndarray] = {}

    z_coarse = None
    weights_coarse = None
    if coarse_needed:
        z_coarse = coarse_z_vals(
            near,
            far,
            mcfg["coarse_mlp"]["num_samples"],
            lindisp=mcfg["lindisp"],
            perturb=perturb,
            key=keys[0],
        )
        out_c, raw_c = _render_one_level(
            params["coarse"],
            mcfg["coarse_mlp"],
            z_coarse,
            rays_o,
            rays_d,
            rays_o_s,
            rays_d_s,
            view_dirs,
            rays_o2,
            ndc=ndc,
            white_bkgd=white_bkgd,
            sec_views_vis=sec_views_vis,
            raw_noise_std=raw_noise_std,
            noise_key=keys[1],
            bf16=bf16,
            remat=remat,
            netchunk_map=netchunk_map,
            f32_heads=f32_heads,
        )
        weights_coarse = out_c["weights"]
        out["z_vals_coarse"] = z_coarse
        for k, v in out_c.items():
            out[f"{k}_coarse"] = v
        if retraw:
            for k, v in raw_c.items():
                out[f"raw_{k}_coarse"] = v

    if fine_needed:
        z_fine = fine_z_vals(
            z_coarse,
            weights_coarse,
            mcfg["fine_mlp"]["num_samples"],
            perturb=perturb,
            key=keys[2],
        )
        out_f, raw_f = _render_one_level(
            params["fine"],
            mcfg["fine_mlp"],
            z_fine,
            rays_o,
            rays_d,
            rays_o_s,
            rays_d_s,
            view_dirs,
            rays_o2,
            ndc=ndc,
            white_bkgd=white_bkgd,
            sec_views_vis=sec_views_vis,
            raw_noise_std=raw_noise_std,
            noise_key=keys[3],
            bf16=bf16,
            remat=remat,
            netchunk_map=netchunk_map,
            f32_heads=f32_heads,
        )
        out["z_vals_fine"] = z_fine
        for k, v in out_f.items():
            out[f"{k}_fine"] = v
        if retraw:
            for k, v in raw_f.items():
                out[f"raw_{k}_fine"] = v

    if not retraw:
        # Pure-inference contract drops intermediates (reference :168-171).
        for suffix in ("coarse", "fine"):
            for k in ("z_vals", "visibility", "weights"):
                out.pop(f"{k}_{suffix}", None)
    return out


def _render_one_level(
    mlp_params: Params,
    mlp_cfg: Dict[str, Any],
    z_vals: jnp.ndarray,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_o_s: jnp.ndarray,
    rays_d_s: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray],
    rays_o2: Optional[jnp.ndarray],
    *,
    ndc: bool,
    white_bkgd: bool,
    sec_views_vis: bool,
    raw_noise_std: float,
    noise_key: Optional[jax.Array],
    bf16: bool,
    remat: bool,
    netchunk_map: int = 0,
    f32_heads: bool = False,
):
    """One MLP evaluation + compositing pass (coarse or fine)."""
    # Sample points in the sampling space (NDC coords in NDC mode, :104-107)
    pts = rays_o_s[..., None, :] + rays_d_s[..., None, :] * z_vals[..., :, None]

    view_dirs2 = None
    if mlp_cfg["predict_visibility"] and sec_views_vis and rays_o2 is not None:
        view_dirs2 = _compute_other_view_dirs(z_vals, rays_o, rays_d, rays_o2, ndc)

    raw = _run_mlp_on_samples(
        mlp_params,
        mlp_cfg,
        pts,
        view_dirs if mlp_cfg["use_view_dirs"] else None,
        view_dirs2,
        raw_noise_std=raw_noise_std,
        noise_key=noise_key,
        bf16_matmuls=bf16,
        remat=remat,
        netchunk_map=netchunk_map,
        f32_heads=f32_heads,
    )

    if not ndc:
        outputs = volume_rendering(
            raw["rgb"],
            raw["sigma"][..., 0],
            z_vals=z_vals,
            rays_d=rays_d,
            white_bkgd=white_bkgd,
            ndc=False,
            visibility2=raw.get("visibility2"),
        )
    else:
        outputs = volume_rendering(
            raw["rgb"],
            raw["sigma"][..., 0],
            z_vals_ndc=z_vals,
            rays_d_ndc=rays_d_s,
            rays_o=rays_o,
            rays_d=rays_d,
            white_bkgd=white_bkgd,
            ndc=True,
            visibility2=raw.get("visibility2"),
        )
    return outputs, raw
