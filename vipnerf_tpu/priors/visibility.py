"""Dense visibility prior: plane-sweep-volume photometric consistency.

Parity target: src/prior_generators/visibility/VisibilityMask0{1,2,5}_*.py
(paths relative to /root/reference/):
- depth planes: inverse-linspace for LLFF/RealEstate (:37-39), LINEAR for DTU
  (VisibilityMask05_DTU.py:39-40)
- for each ordered view pair: warp frame2 to frame1 through each depth plane
  (full K/E matrix chain, :43-79), masked bilinear sampling with zero padding
  (:82-162), per-pixel min-over-planes mean-abs color error, weights =
  exp(-err / temperature) (:27-35), mask = weights > 0.5 (:278-279)
- outputs visibility_masks/{f1:04}_{f2:04}.npy+png and visibility_weights/...
  under VW{gen_num:02} with a strict Configs.json (:214-227, :233-254)

This is an ideal TPU workload (dense gathers + reductions). TPU-first
differences from the reference numpy implementation:
- the whole per-pair computation is one jitted function, scanning over depth
  planes with a running min instead of materializing the full (h, w, d, 3)
  PSV (the reference allocates ~2 GB per pair at LLFF resolution)
- the reference uses extrinsics[0]/extrinsics[1] for EVERY pair (a latent
  indexing bug that only matters for 3/4-view sets,
  VisibilityMask02_NeRF_LLFF.py:275-276); here each pair uses its own poses.
"""

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import simplejson


from vipnerf_tpu.utils.naming import scene_dirname


def get_depth_planes(
    min_depth: float, max_depth: float, num_planes: int, linear: bool = False
) -> np.ndarray:
    if linear:
        return np.linspace(min_depth, max_depth, num_planes)
    return 1.0 / np.linspace(1.0 / min_depth, 1.0 / max_depth, num_planes)


def _warp_coords_for_plane(
    depth: jnp.ndarray,
    k1_inv: jnp.ndarray,
    k2: jnp.ndarray,
    t21: jnp.ndarray,
    h: int,
    w: int,
) -> jnp.ndarray:
    """Pixel coords in frame2 for every frame1 pixel at one depth plane
    (reference compute_transformed_coordinates :49-79)."""
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    pix = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # (h, w, 3)
    # HIGHEST precision: TPU f32 matmuls default to bf16 passes, which is
    # ~0.04 px of warp error — enough to corrupt the photometric test.
    hi = jax.lax.Precision.HIGHEST
    cam_dirs = jnp.matmul(pix, k1_inv.T, precision=hi)  # (h, w, 3)
    pts = depth * cam_dirs  # camera-1 coords at this plane
    pts2 = jnp.matmul(pts, t21[:3, :3].T, precision=hi) + t21[:3, 3]
    proj = jnp.matmul(pts2, k2.T, precision=hi)
    return proj[..., :2] / proj[..., 2:3]  # (h, w, 2) x,y in frame2


def _bilinear_sample_masked(frame2: jnp.ndarray, coords: jnp.ndarray):
    """Masked, zero-padded bilinear sampling (reference :82-162).

    frame2: (h, w, 3); coords: (h, w, 2) target positions. Returns warped
    (h, w, 3) with out-of-frame contributions dropped via the pad mask and
    weight renormalization.
    """
    h, w = frame2.shape[:2]
    f2 = jnp.pad(frame2, ((1, 1), (1, 1), (0, 0)))
    m2 = jnp.pad(jnp.ones((h, w), frame2.dtype), ((1, 1), (1, 1)))

    pos = coords + 1.0
    x = jnp.clip(pos[..., 0], 0.0, w + 1.0)
    y = jnp.clip(pos[..., 1], 0.0, h + 1.0)
    x0 = jnp.clip(jnp.floor(pos[..., 0]), 0, w + 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(pos[..., 1]), 0, h + 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(pos[..., 0]), 0, w + 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(pos[..., 1]), 0, h + 1).astype(jnp.int32)

    w_nw = (1 - (y - y0)) * (1 - (x - x0))
    w_sw = (1 - (y1 - y)) * (1 - (x - x0))
    w_ne = (1 - (y - y0)) * (1 - (x1 - x))
    w_se = (1 - (y1 - y)) * (1 - (x1 - x))

    def gather(img, yy, xx):
        return img[yy, xx]

    nr = (
        w_nw[..., None] * gather(f2, y0, x0) * gather(m2, y0, x0)[..., None]
        + w_sw[..., None] * gather(f2, y1, x0) * gather(m2, y1, x0)[..., None]
        + w_ne[..., None] * gather(f2, y0, x1) * gather(m2, y0, x1)[..., None]
        + w_se[..., None] * gather(f2, y1, x1) * gather(m2, y1, x1)[..., None]
    )
    dr = (
        w_nw * gather(m2, y0, x0)
        + w_sw * gather(m2, y1, x0)
        + w_ne * gather(m2, y0, x1)
        + w_se * gather(m2, y1, x1)
    )
    return jnp.where(dr[..., None] > 0, nr / jnp.maximum(dr[..., None], 1e-12), 0.0)


def compute_visibility_weights(
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    extrinsic1: jnp.ndarray,
    extrinsic2: jnp.ndarray,
    intrinsic1: jnp.ndarray,
    intrinsic2: jnp.ndarray,
    depth_planes: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """Per-pixel visibility weights of frame1 w.r.t. frame2 (reference
    compute_weights :27-35). frames: (h, w, 3) float in [0, 255]."""
    h, w = frame1.shape[:2]
    k1_inv = jnp.linalg.inv(intrinsic1)
    t21 = extrinsic2 @ jnp.linalg.inv(extrinsic1)

    def plane_error(min_err, depth):
        coords = _warp_coords_for_plane(depth, k1_inv, intrinsic2, t21, h, w)
        warped = _bilinear_sample_masked(frame2, coords)
        err = jnp.mean(jnp.abs(warped - frame1), axis=-1)  # (h, w)
        return jnp.minimum(min_err, err), None

    init = jnp.full((h, w), jnp.inf, frame1.dtype)
    min_err, _ = jax.lax.scan(plane_error, init, depth_planes)
    return jnp.exp(-min_err / temperature)


_compute_visibility_weights_jit = jax.jit(
    compute_visibility_weights, static_argnames=("temperature",)
)


def save_gen_configs(
    output_dirpath: Path, configs: Dict, *, backfill_new_keys: bool = False
):
    """Strict config persistence (reference :214-227 raises on mismatch).

    The prior generators' reference save_configs only back-fills old->new
    keys, so a key newly added to the code raises on resume
    (VisibilityMask02_NeRF_LLFF.py:214-227) -- the default here. The
    database-builder variants (SceneSelector01.py:150-165,
    DataExtractor01.py:200-213) back-fill both directions before diffing, so
    resuming over an older output dir keeps working when the code gains a
    config key; `backfill_new_keys=True` selects those semantics."""
    configs_path = Path(output_dirpath) / "Configs.json"
    if configs_path.exists():
        old = simplejson.load(open(configs_path))
        for key in old:
            if key not in configs:
                configs[key] = old[key]
        if backfill_new_keys:
            for key in configs:
                if key not in old:
                    old[key] = configs[key]
        if configs != old:
            raise RuntimeError("Configs mismatch while resuming generation")
    with open(configs_path, "w") as f:
        simplejson.dump(configs, f, indent=4)


def start_generation(gen_configs: Dict, root_dirpath: Optional[Path] = None):
    """Generate visibility priors for all scenes of a train set
    (reference start_generation :229-285).

    gen_configs: {generator, gen_num, gen_set_num, database_name,
    database_dirpath, num_depth_planes, temperature[, resolution_suffix]
    [, depth_planes_linear][, fixed_bounds]}.
    """
    from vipnerf_tpu.utils.io import read_image, save_image, save_numpy_array

    root_dirpath = Path(root_dirpath) if root_dirpath else Path(".")
    database_dirpath = root_dirpath / "data/databases" / gen_configs["database_dirpath"]

    scene_key = gen_configs.get("scene_key", "scene_name")
    split_dir = gen_configs.get("split_dir", "all")
    output_dirpath = (
        database_dirpath / f"{split_dir}/visibility_prior/VW{gen_configs['gen_num']:02}"
    )
    output_dirpath.mkdir(parents=True, exist_ok=True)
    save_gen_configs(output_dirpath, dict(gen_configs))

    set_num = gen_configs["gen_set_num"]
    video_data = pd.read_csv(
        database_dirpath / f"train_test_sets/set{set_num:02}/TrainVideosData.csv"
    )
    scene_ids = np.unique(video_data[scene_key].to_numpy())
    suffix = gen_configs.get("resolution_suffix", "")
    linear = gen_configs.get("depth_planes_linear", False)
    fixed_bounds = gen_configs.get("fixed_bounds")
    temperature = gen_configs["temperature"]
    num_planes = gen_configs["num_depth_planes"]

    for scene_id in scene_ids:
        scene_dir = scene_dirname(scene_id, scene_key)
        frame_nums = video_data.loc[video_data[scene_key] == scene_id][
            "pred_frame_num"
        ].to_numpy()
        base = database_dirpath / f"{split_dir}/database_data/{scene_dir}"
        extrinsics = np.loadtxt(
            (base / "CameraExtrinsics.csv").as_posix(), delimiter=","
        ).reshape((-1, 4, 4))[frame_nums]
        intrinsics = np.loadtxt(
            (base / f"CameraIntrinsics{suffix}.csv").as_posix(), delimiter=","
        ).reshape((-1, 3, 3))[frame_nums]
        if fixed_bounds is not None:
            min_depth, max_depth = fixed_bounds
        else:
            bds = np.loadtxt(
                (base / "DepthBounds.csv").as_posix(), delimiter=","
            )[frame_nums]
            min_depth, max_depth = bds.min(), bds.max()
        depth_planes = jnp.asarray(
            get_depth_planes(min_depth, max_depth, num_planes, linear),
            jnp.float32,
        )

        scene_out = output_dirpath / scene_dir
        frame_cache: Dict[int, jnp.ndarray] = {}  # read each frame once

        def load_frame(f: int) -> jnp.ndarray:
            if f not in frame_cache:
                frame_cache[f] = jnp.asarray(
                    read_image(base / f"rgb{suffix}/{f:04}.png")[..., :3],
                    jnp.float32,
                )
            return frame_cache[f]

        for i1, f1 in enumerate(frame_nums):
            for i2, f2 in enumerate(frame_nums):
                if f2 <= f1:
                    continue
                paths = {
                    "m1": scene_out / f"visibility_masks/{f1:04}_{f2:04}.npy",
                    "m2": scene_out / f"visibility_masks/{f2:04}_{f1:04}.npy",
                    "w1": scene_out / f"visibility_weights/{f1:04}_{f2:04}.npy",
                    "w2": scene_out / f"visibility_weights/{f2:04}_{f1:04}.npy",
                }
                if all(p.exists() for p in paths.values()):
                    continue
                t_pair = time.time()
                frame1 = load_frame(f1)
                frame2 = load_frame(f2)
                e1 = jnp.asarray(extrinsics[i1], jnp.float32)
                e2 = jnp.asarray(extrinsics[i2], jnp.float32)
                k1 = jnp.asarray(intrinsics[i1], jnp.float32)
                k2 = jnp.asarray(intrinsics[i2], jnp.float32)

                weights1 = np.asarray(
                    _compute_visibility_weights_jit(
                        frame1, frame2, e1, e2, k1, k2, depth_planes, temperature
                    )
                )
                weights2 = np.asarray(
                    _compute_visibility_weights_jit(
                        frame2, frame1, e2, e1, k2, k1, depth_planes, temperature
                    )
                )
                print(
                    f"  {scene_dir} pair {f1:04}<->{f2:04}: both directions "
                    f"({num_planes} planes, {frame1.shape[0]}x{frame1.shape[1]}) "
                    f"in {time.time() - t_pair:.2f}s",
                    flush=True,
                )
                for w_arr, wp, mp in (
                    (weights1, paths["w1"], paths["m1"]),
                    (weights2, paths["w2"], paths["m2"]),
                ):
                    mask = w_arr > 0.5
                    mp.parent.mkdir(parents=True, exist_ok=True)
                    np.save(mp.as_posix(), mask)
                    save_image(mp.parent / f"{mp.stem}.png",
                               mask.astype(np.uint8) * 255)
                    save_numpy_array(wp, w_arr, as_png=True)


if __name__ == "__main__":
    from vipnerf_tpu.priors.cli import main_visibility

    main_visibility()
