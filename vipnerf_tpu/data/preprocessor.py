"""Preprocessing + device-resident ray cache + batch assembly.

Functional redesign of the reference workhorse
src/data_preprocessors/DataPreprocessor01.py (1106 LoC; paths relative to
/root/reference/). Responsibilities and parity anchors:

- image preprocessing (uint8 -> [0,1], white-bkgd composite, downsampling):
  reference :898-904, :112-115
- pose preprocessing + near/far policy: :123-158 (via core.poses)
- per-image ray cache (rays, NDC rays, view dirs, pixel ids, target rgb):
  :268-333 — here vectorized with vmapped core.rays instead of a Python loop
- sparse-depth scatter into (h, w) grids + NDC conversion: :161-183, :420-447
- dense-depth and visibility-prior caches: :185-223, :449-487
- dual shuffled index streams (NeRF rays + sparse-depth rays) with epoch
  reshuffle and precrop: :248-266, :532-564. (The reference discards the
  regenerated index stream when precrop ends (:536-537) — a latent bug, moot
  because all shipped configs disable precrop; here the stream is actually
  replaced.)
- batch gather with -1 fills + boolean masks: :566-724
- inference batches + output reshaping: :776-894

TPU-first differences:
- The cache lives on device as jnp arrays; `gather_batch` is a pure function
  (device gather) usable inside a jitted, scanned train loop. The host only
  reshuffles a permutation once per epoch.
- near/far are scene constants, materialized per batch instead of cached as
  (N, 1) arrays.
- `get_index_chunk` hands the training loop a (K, batch) block of indices so
  K steps run inside one `lax.scan` without host involvement.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vipnerf_tpu.core import poses as pose_ops
from vipnerf_tpu.core import rays as ray_ops
from vipnerf_tpu.utils.io import rescale_image


def get_data_preprocessor(configs, mode, raw_data_dict=None, model_configs=None):
    """Factory (reference DataPreprocessorFactory.py:14-26); the single
    implementation accepts the reference name 'DataPreprocessor01'."""
    name = configs["data_loader"]["data_preprocessor_name"]
    if name != "DataPreprocessor01":
        raise RuntimeError(f"Unknown data preprocessor: {name}")
    return DataPreprocessor(configs, mode, raw_data_dict, model_configs)


def _get_radii(rays_d: jnp.ndarray) -> jnp.ndarray:
    """mip-NeRF pixel cone radii from x-neighbor ray-direction spacing
    (reference get_radii :398-405). rays_d: (n, h, w, 3) -> (n, h, w, 1)."""
    dx = jnp.sqrt(jnp.sum((rays_d[:, :-1] - rays_d[:, 1:]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[:, -2:-1]], axis=1)
    return dx[..., None] * 2.0 / jnp.sqrt(12.0)


def _get_radii_ndc(rays_o_ndc: jnp.ndarray) -> jnp.ndarray:
    """NDC radii from origin spacing (reference get_radii_ndc :407-418)."""
    dx = jnp.sqrt(jnp.sum((rays_o_ndc[:, :-1] - rays_o_ndc[:, 1:]) ** 2, -1))
    dx = jnp.concatenate([dx, dx[:, -2:-1]], axis=1)
    dy = jnp.sqrt(jnp.sum((rays_o_ndc[:, :, :-1] - rays_o_ndc[:, :, 1:]) ** 2, -1))
    dy = jnp.concatenate([dy, dy[:, :, -2:-1]], axis=2)
    return (0.5 * (dx + dy))[..., None] * 2.0 / jnp.sqrt(12.0)

class DataPreprocessor:
    def __init__(
        self,
        configs: Dict[str, Any],
        mode: str,
        raw_data_dict: Optional[dict] = None,
        model_configs: Optional[dict] = None,
    ):
        self.configs = configs
        self.mode = mode.lower()
        dl = configs["data_loader"]
        self.bd_factor = dl["bd_factor"]
        self.ndc = dl["ndc"]
        self.downsampling_factor = dl["downsampling_factor"]
        self.use_batching = dl.get("batching", True)
        self.num_rays = dl["num_rays"]

        self.mip_nerf_used = "mip_nerf" in dl
        self.sparse_depth_needed = "sparse_depth" in dl
        self.dense_depth_needed = "dense_depth" in dl
        self.visibility_prior_needed = "visibility_prior" in dl
        # The renderer needs per-ray secondary camera origins (gathered from
        # poses by image id) whenever visibility is predicted during training
        # (reference VipNeRF01.py:84-98 reads common_data['poses']).
        model_cfg = configs.get("model", {})
        self.poses_needed = any(
            model_cfg.get(m, {}).get("predict_visibility", False)
            for m in ("coarse_mlp", "fine_mlp")
        )
        if self.sparse_depth_needed:
            self.num_rays_sparse_depth = dl["sparse_depth"]["num_rays"]

        self.raw_data_dict = raw_data_dict
        self.model_configs = model_configs

        seed = configs.get("seed", 0)
        self._rng = np.random.default_rng(None if seed is None else seed)

        # Host-side index-stream state (reference i_batch / i_batch_sparse_depth)
        self._indices: Optional[np.ndarray] = None
        self._i_batch = 0
        self._indices_sd: Optional[np.ndarray] = None
        self._i_batch_sd = 0

        # Optional native (C++) index-stream runtime; numpy fallback.
        self._native_nerf = None
        self._native_sd = None
        self._use_native = dl.get("native_raystream", True)

        self.cache: Dict[str, jnp.ndarray] = {}
        if self.mode in ("train", "validation"):
            self._preprocess_all()
            if self.mode == "train":
                self.model_configs = self._create_model_configs()
            if self._use_native and self.mode == "train":
                self._init_native_streams(seed if seed is not None else 0)

    def _init_native_streams(self, seed: int):
        """Back the index streams with the C++ runtime when available
        (vipnerf_tpu/native). RNG differs from numpy (xorshift vs MT) —
        stream semantics and epoch behavior are identical."""
        try:
            from vipnerf_tpu.native import NativeRayStream, native_available
        except Exception:
            return
        if not native_available():
            return
        if self._indices is not None and len(self._indices):
            self._native_nerf = NativeRayStream(
                len(self._indices), seed, candidates=self._indices
            )
        if self._indices_sd is not None and len(self._indices_sd):
            self._native_sd = NativeRayStream(
                len(self._indices_sd), seed + 1, candidates=self._indices_sd
            )

    # ------------------------------------------------------------ preprocess

    def _preprocess_all(self):
        raw = self.raw_data_dict
        nerf_raw = raw["nerf_data"]

        images = self._preprocess_images(np.asarray(nerf_raw["images"]))
        intrinsics = np.asarray(nerf_raw["intrinsics"], dtype=np.float64).copy()
        resolution = [int(x) for x in nerf_raw["resolution"]]
        if self.downsampling_factor > 1:
            images = np.stack(
                [
                    rescale_image(im, self.downsampling_factor, anti_aliasing=True)
                    for im in images
                ]
            )
            resolution = [x // self.downsampling_factor for x in resolution]
            intrinsics[:, :2] /= self.downsampling_factor

        self.frame_nums = np.asarray(raw["frame_nums"])
        self.num_frames = len(self.frame_nums)
        self.resolution = resolution
        self.intrinsics = intrinsics.astype(np.float32)

        if self.mode == "train":
            pp = pose_ops.preprocess_poses(
                np.asarray(nerf_raw["extrinsics"]),
                train_mode=True,
                bounds=np.asarray(nerf_raw["bounds"], dtype=np.float64),
                bd_factor=self.bd_factor,
                recenter=self.configs["data_loader"]["recenter_camera_poses"],
                spherify=self.configs["data_loader"]["spherify"],
            )
            self.sc = float(pp.get("sc", 1.0))
            self.average_pose = pp["average_pose"]
        else:
            pp = pose_ops.preprocess_poses(
                np.asarray(nerf_raw["extrinsics"]),
                train_mode=False,
                bounds=np.asarray(nerf_raw["bounds"], dtype=np.float64),
                translation_scale=self.model_configs["translation_scale"],
                average_pose=np.asarray(self.model_configs["average_pose"]),
            )
            self.sc = float(self.model_configs["translation_scale"])
            self.average_pose = np.asarray(self.model_configs["average_pose"])
        self.poses = pp["poses"]  # (n, 4, 4) c2w, float32
        bds = pp["bounds"]
        self.bounds = bds

        # Near/far policy (reference :143-158)
        if not self.ndc:
            self.near = float(bds[0] * 0.9)
            self.far = float(bds[1])
            self.near_ndc = None
            self.far_ndc = None
        else:
            if self.bd_factor is None:
                # bd_factor scaling is what makes the train scene's NDC
                # near land at exactly 1, the value hard-coded into the
                # NDC<->metric depth conversions (reference VipNeRF01.py:220,
                # :396 — and the reference's sc computation crashes outright
                # on ndc + bd_factor None, DataPreprocessor01.py:910-921).
                # Without it, depth/visibility outputs would be silently
                # wrong rather than loudly rejected.
                raise RuntimeError("ndc mode requires data_loader.bd_factor")
            self.near = float(bds[0] * self.bd_factor)
            self.far = float(bds[1])
            self.near_ndc = 0.0
            self.far_ndc = 1.0

        self.images = images.astype(np.float32)

        if self.use_batching:
            self._build_ray_cache()
            if self.sparse_depth_needed and self.mode == "train":
                self._build_sparse_depth_cache(raw)
            if self.dense_depth_needed and self.mode == "train":
                self._build_dense_depth_cache(raw)
            if self.visibility_prior_needed and self.mode == "train":
                self._build_visibility_prior_cache(raw)
            self._indices = self._generate_indices(iter_num=0)

    def _preprocess_images(self, images: np.ndarray) -> np.ndarray:
        """uint8 -> [0, 1] float; optional white-background composite
        (reference :898-904)."""
        images = images.astype(np.float32) / 255.0
        if self.configs["model"]["white_bkgd"]:
            images = images[..., :3] * images[..., -1:] + (1.0 - images[..., -1:])
        else:
            images = images[..., :3]
        return images

    def _ray_intrinsic(self, intr: np.ndarray) -> np.ndarray:
        """Intrinsic actually used for ray generation. mip-NeRF uses
        half-pixel ray centers (reference :341-343) — equivalently a -0.5
        principal-point shift — and it must apply on EVERY ray-generation
        path (training cache, create_test_data, uncached batch), or test
        rays would be half a pixel off the geometry the model trained on."""
        if not self.mip_nerf_used:
            return np.asarray(intr)
        intr = np.asarray(intr).copy()
        intr[..., 0, 2] -= 0.5
        intr[..., 1, 2] -= 0.5
        return intr

    def _build_ray_cache(self):
        """Vectorized replacement for the reference per-image loop (:276-333)."""
        h, w = self.resolution
        n = self.num_frames

        intrinsics = self._ray_intrinsic(self.intrinsics)
        get_rays_batched = jax.vmap(
            lambda intr, pose: ray_ops.get_rays(h, w, intr, pose)
        )
        rays_o, rays_d = get_rays_batched(
            jnp.asarray(intrinsics), jnp.asarray(self.poses)
        )  # (n, h, w, 3) each
        view_dirs = ray_ops.get_view_dirs(rays_d)

        image_id = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None, None], (n, h, w)
        )
        gx, gy = jnp.meshgrid(
            jnp.arange(w, dtype=jnp.int32), jnp.arange(h, dtype=jnp.int32),
            indexing="xy",
        )
        pixel_id = jnp.stack(
            [image_id, jnp.broadcast_to(gx, (n, h, w)), jnp.broadcast_to(gy, (n, h, w))],
            axis=-1,
        )

        cache = {
            "rays_o": rays_o.reshape(-1, 3).astype(jnp.float32),
            "rays_d": rays_d.reshape(-1, 3).astype(jnp.float32),
            "view_dirs": view_dirs.reshape(-1, 3).astype(jnp.float32),
            "pixel_id": pixel_id.reshape(-1, 3),
            "target_rgb": jnp.asarray(self.images.reshape(-1, 3)),
        }

        if self.ndc:
            fx = jnp.asarray(self.intrinsics[:, 0, 0])
            fy = jnp.asarray(self.intrinsics[:, 1, 1])
            ndc_fn = jax.vmap(
                lambda o, d, fxi, fyi: ray_ops.get_ndc_rays(
                    o, d, h, w, fxi, fyi, self.near
                )
            )
            rays_o_ndc, rays_d_ndc = ndc_fn(rays_o, rays_d, fx, fy)
            cache["rays_o_ndc"] = rays_o_ndc.reshape(-1, 3).astype(jnp.float32)
            cache["rays_d_ndc"] = rays_d_ndc.reshape(-1, 3).astype(jnp.float32)

        if self.mip_nerf_used:
            # Per-pixel cone radii (reference :380-418): x-neighbor direction
            # distances * 2/sqrt(12); NDC variant uses origin spacing.
            rays_d_img = rays_d  # (n, h, w, 3)
            cache["radii"] = _get_radii(rays_d_img).reshape(-1, 1).astype(jnp.float32)
            if self.ndc:
                o_ndc_img = rays_o_ndc  # (n, h, w, 3)
                cache["radii_ndc"] = _get_radii_ndc(o_ndc_img).reshape(-1, 1).astype(jnp.float32)

        cache["poses"] = jnp.asarray(self.poses)
        self.cache = jax.device_put(cache)

    def _build_sparse_depth_cache(self, raw: dict):
        """Scatter COLMAP points into (h, w) grids (:161-183) and flatten with
        a shuffled valid-index stream (:420-447)."""
        h, w = self.resolution
        depths = -np.ones((self.num_frames, h, w), np.float32)
        errors = -np.ones((self.num_frames, h, w), np.float32)
        for i, frame_num in enumerate(self.frame_nums):
            fd = raw["sparse_depth_data"].get(int(frame_num))
            if fd is None:
                continue
            x = np.asarray(fd["x"], dtype=np.float64)
            y = np.asarray(fd["y"], dtype=np.float64)
            if self.downsampling_factor > 1:
                x = x / self.downsampling_factor
                y = y / self.downsampling_factor
            xi = np.round(x).astype(int)
            yi = np.round(y).astype(int)
            # Downsampled coords can round onto the grid edge (x=W-0.2 ->
            # xi==w); drop out-of-bounds features instead of crashing. The
            # reference never downsamples here (it scatters into the native
            # grid, :165), so this path is ours alone.
            keep = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            depths[i, yi[keep], xi[keep]] = (
                np.asarray(fd["depth"], np.float64) * self.sc
            )[keep]
            errors[i, yi[keep], xi[keep]] = np.asarray(
                fd["reprojection_error"], np.float64
            )[keep]

        flat_depths = depths.reshape(-1, 1)
        flat_errors = errors.reshape(-1, 1)
        valid = np.where(flat_depths[:, 0] > 0)[0]
        self._rng.shuffle(valid)
        self._indices_sd = valid

        self.cache["sparse_depth_values"] = jnp.asarray(flat_depths)
        self.cache["sparse_depth_errors"] = jnp.asarray(flat_errors)
        if self.ndc:
            d_ndc = np.array(
                ray_ops.depth_to_ndc(
                    jnp.asarray(flat_depths),
                    self.cache["rays_o"],
                    self.cache["rays_d"],
                    near=1.0,
                )
            )
            d_ndc[flat_depths == -1] = -1
            self.cache["sparse_depth_values_ndc"] = jnp.asarray(d_ndc)

    def _build_dense_depth_cache(self, raw: dict):
        """Dense depth prior cache (:185-198, :449-463)."""
        depths = np.asarray(raw["dense_depth_data"]["depth_values"], np.float32) * self.sc
        weights = np.asarray(raw["dense_depth_data"]["depth_weights"], np.float32)
        if self.downsampling_factor > 1:
            depths = np.stack([rescale_image(d, self.downsampling_factor) for d in depths])
            weights = np.stack([rescale_image(x, self.downsampling_factor) for x in weights])
        flat = depths.reshape(-1, 1)
        self.cache["dense_depth_values"] = jnp.asarray(flat)
        self.cache["dense_depth_weights"] = jnp.asarray(weights.reshape(-1, 1))
        if self.ndc:
            d_ndc = np.array(
                ray_ops.depth_to_ndc(
                    jnp.asarray(flat),
                    self.cache["rays_o"],
                    self.cache["rays_d"],
                    near=self.near,
                )
            )
            d_ndc[flat == -1] = -1
            self.cache["dense_depth_values_ndc"] = jnp.asarray(d_ndc)

    def _build_visibility_prior_cache(self, raw: dict):
        """(n, n-1, h, w) masks/weights -> (n*h*w, n-1) (:200-223, :465-487)."""
        if self.num_frames < 2:
            return
        vp_cfg = self.configs["data_loader"]["visibility_prior"]
        vp_raw = raw["visibility_prior_data"]
        for key, enabled in (("masks", vp_cfg.get("load_masks")),
                             ("weights", vp_cfg.get("load_weights"))):
            if not enabled:
                continue
            arr = np.asarray(vp_raw[key], np.float32)  # (n, n-1, h, w)
            n, nm1, h, w = arr.shape
            if self.downsampling_factor > 1:
                flat = arr.reshape(n * nm1, h, w)
                if key == "masks":
                    flat = np.stack(
                        [rescale_image(m, self.downsampling_factor) for m in flat]
                    ).astype(bool).astype(np.float32)
                else:
                    flat = np.stack(
                        [
                            rescale_image(m, self.downsampling_factor, anti_aliasing=True)
                            for m in flat
                        ]
                    )
                h, w = flat.shape[1:]
                arr = flat.reshape(n, nm1, h, w)
            per_pixel = np.transpose(arr, (0, 2, 3, 1)).reshape(-1, nm1)
            self.cache[f"visibility_prior_{key}"] = jnp.asarray(per_pixel)

    def _create_model_configs(self) -> dict:
        """Model configs persisted next to checkpoints (reference :63-78)."""
        mc = {
            "resolution": list(self.resolution),
            "bounds": np.asarray(self.bounds).tolist(),
            "translation_scale": self.sc,
            f"{self.mode}_frame_nums": np.asarray(self.frame_nums).tolist(),
            "intrinsic": np.mean(self.intrinsics, axis=0).tolist(),
            "average_pose": np.asarray(self.average_pose).tolist(),
            "near": self.near,
            "far": self.far,
        }
        if self.ndc:
            mc["near_ndc"] = self.near_ndc
            mc["far_ndc"] = self.far_ndc
        return mc

    def get_model_configs(self):
        return self.model_configs

    # -------------------------------------------------------- index streams

    def _generate_indices(self, iter_num: int) -> np.ndarray:
        """Shuffled global ray-index stream, with optional precrop window
        (reference generate_indices :248-266)."""
        n = self.num_frames
        h, w = self.resolution
        indices = np.arange(n * h * w)
        dl = self.configs["data_loader"]
        if (
            "precrop_fraction" in dl
            and dl["precrop_fraction"] < 1
            and iter_num < dl.get("precrop_iterations", -1)
        ):
            frac = dl["precrop_fraction"]
            h1 = int(round(h / 2 * (1 - frac)))
            h2 = int(round(h / 2 * (1 + frac)))
            w1 = int(round(w / 2 * (1 - frac)))
            w2 = int(round(w / 2 * (1 + frac)))
            indices = indices.reshape(n, h, w)[:, h1:h2, w1:w2].ravel().copy()
        self._rng.shuffle(indices)
        return indices

    def _next_nerf_indices(self, iter_num: int) -> np.ndarray:
        dl = self.configs["data_loader"]
        precrop_end = dl.get("precrop_iterations", -1)
        n_full = self.num_frames * self.resolution[0] * self.resolution[1]
        if precrop_end > 0 and iter_num >= precrop_end and (
            self._indices.size < n_full
        ):
            # Precrop window ended: regenerate the full stream. `>=` with a
            # still-cropped-stream check (not `==`) so a run RESUMED past the
            # boundary also escapes the crop. (The reference discards this
            # regeneration entirely — :536-537 — a latent bug.)
            self._indices = self._generate_indices(iter_num)
            self._i_batch = 0
        # .copy(): the slice is a view into self._indices, and the epoch
        # reshuffle below mutates it in place — without the copy, a wrapped
        # tail batch would silently serve the NEW permutation's window
        out = self._indices[self._i_batch : self._i_batch + self.num_rays].copy()
        self._i_batch += self.num_rays
        if self._i_batch >= self._indices.size:
            self._rng.shuffle(self._indices)
            self._i_batch = 0
        if out.size < self.num_rays:  # epoch tail: wrap (reference returns short)
            # consume (not just peek) the fresh permutation's head, or the
            # next batch would re-serve those rays — and the C++ raystream
            # (native/raystream.cpp raystream_next_block) advances its
            # cursor through the wrap; the two streams must agree.
            wrap = self.num_rays - out.size
            out = np.concatenate([out, self._indices[:wrap]])
            self._i_batch = wrap
        return out

    def _next_sd_indices(self) -> np.ndarray:
        k = self.num_rays_sparse_depth
        # .copy() for the same view-aliasing reason as _next_nerf_indices
        out = self._indices_sd[self._i_batch_sd : self._i_batch_sd + k].copy()
        self._i_batch_sd += k
        if self._i_batch_sd >= self._indices_sd.size:
            self._rng.shuffle(self._indices_sd)
            self._i_batch_sd = 0
        if out.size < k:
            wrap = k - out.size  # consume the wrap, as in _next_nerf_indices
            out = np.concatenate([out, self._indices_sd[:wrap]])
            self._i_batch_sd = wrap
        return out

    def get_index_chunk(self, start_iter: int, num_iters: int):
        """Index blocks for `num_iters` scanned steps.

        Returns (nerf_indices (K, num_rays) int32,
                 sd_indices (K, num_rays_sd) int32 or None).
        Host-side epoch reshuffles happen transparently between rows.
        """
        if self._native_nerf is not None:
            dl = self.configs["data_loader"]
            precrop_end = dl.get("precrop_iterations", -1)
            if start_iter >= precrop_end > 0 and self._native_nerf.size < (
                self.num_frames * self.resolution[0] * self.resolution[1]
            ):
                # precrop window ended: restore the full index stream
                self._native_nerf.reset(
                    count=self.num_frames
                    * self.resolution[0]
                    * self.resolution[1]
                )
            nerf = self._native_nerf.next_block(num_iters, self.num_rays)
            sd = None
            if self._native_sd is not None:
                sd = self._native_sd.next_block(
                    num_iters, self.num_rays_sparse_depth
                )
            return nerf, sd

        nerf = np.stack(
            [self._next_nerf_indices(start_iter + i) for i in range(num_iters)]
        ).astype(np.int32)
        sd = None
        if self.sparse_depth_needed and self.mode == "train":
            sd = np.stack(
                [self._next_sd_indices() for _ in range(num_iters)]
            ).astype(np.int32)
        return nerf, sd

    # ----------------------------------------------------------- batch build

    def gather_batch(
        self,
        nerf_indices: jnp.ndarray,
        sd_indices: Optional[jnp.ndarray],
        iter_num,
        *,
        cache: Optional[Dict[str, jnp.ndarray]] = None,
        near=None,
        far=None,
    ) -> Dict[str, Any]:
        """Pure device gather of a training batch (reference :566-724).

        The batch layout is [nerf rays; sparse-depth rays]; boolean stream
        masks replace the reference's -1-fill + mask bookkeeping (prior fields
        are still -1 off-stream to match loss semantics).

        `cache`/`near`/`far` default to this preprocessor's own; the
        multi-scene trainer passes per-scene rows of a stacked cache (and
        traced per-scene bounds) so both trainers share ONE gather code path.
        """
        cache = self.cache if cache is None else cache
        near = self.near if near is None else near
        far = self.far if far is None else far
        if sd_indices is not None:
            indices = jnp.concatenate([nerf_indices, sd_indices])
            mask_nerf = jnp.concatenate(
                [
                    jnp.ones(nerf_indices.shape[0], bool),
                    jnp.zeros(sd_indices.shape[0], bool),
                ]
            )
            mask_sd = ~mask_nerf
        else:
            indices = nerf_indices
            mask_nerf = jnp.ones(nerf_indices.shape[0], bool)
            mask_sd = None

        nr = indices.shape[0]
        batch: Dict[str, Any] = {
            "iter_num": iter_num,
            "num_frames": self.num_frames,
            "indices": indices,
            "indices_mask_nerf": mask_nerf,
            "rays_o": cache["rays_o"][indices],
            "rays_d": cache["rays_d"][indices],
            "view_dirs": cache["view_dirs"][indices],
            "pixel_id": cache["pixel_id"][indices],
            "target_rgb": jnp.where(
                mask_nerf[:, None], cache["target_rgb"][indices], -1.0
            ),
            "near": jnp.full((nr, 1), 1.0, jnp.float32) * near,
            "far": jnp.full((nr, 1), 1.0, jnp.float32) * far,
        }
        if self.ndc:
            batch["rays_o_ndc"] = cache["rays_o_ndc"][indices]
            batch["rays_d_ndc"] = cache["rays_d_ndc"][indices]
            batch["near_ndc"] = jnp.full((nr, 1), self.near_ndc, jnp.float32)
            batch["far_ndc"] = jnp.full((nr, 1), self.far_ndc, jnp.float32)

        if self.mip_nerf_used:
            batch["radii"] = jnp.where(
                mask_nerf[:, None], cache["radii"][indices], -1.0
            )
            if self.ndc:
                batch["radii_ndc"] = jnp.where(
                    mask_nerf[:, None], cache["radii_ndc"][indices], -1.0
                )

        if mask_sd is not None:
            batch["indices_mask_sparse_depth"] = mask_sd
            batch["sparse_depth_values"] = jnp.where(
                mask_sd[:, None], cache["sparse_depth_values"][indices], -1.0
            )
            batch["sparse_depth_errors"] = jnp.where(
                mask_sd[:, None], cache["sparse_depth_errors"][indices], -1.0
            )
            if self.ndc:
                batch["sparse_depth_values_ndc"] = jnp.where(
                    mask_sd[:, None],
                    cache["sparse_depth_values_ndc"][indices],
                    -1.0,
                )

        if self.dense_depth_needed and self.mode == "train":
            batch["dense_depth_values"] = jnp.where(
                mask_nerf[:, None], cache["dense_depth_values"][indices], -1.0
            )
            batch["dense_depth_weights"] = jnp.where(
                mask_nerf[:, None], cache["dense_depth_weights"][indices], -1.0
            )
            if self.ndc:
                batch["dense_depth_values_ndc"] = jnp.where(
                    mask_nerf[:, None],
                    cache["dense_depth_values_ndc"][indices],
                    -1.0,
                )

        if self.poses_needed and self.mode == "train":
            batch["poses"] = cache["poses"]

        if self.visibility_prior_needed and self.mode == "train":
            if "visibility_prior_masks" in cache:
                batch["visibility_prior_masks"] = jnp.where(
                    mask_nerf[:, None],
                    cache["visibility_prior_masks"][indices],
                    -1.0,
                )
            if "visibility_prior_weights" in cache:
                batch["visibility_prior_weights"] = jnp.where(
                    mask_nerf[:, None],
                    cache["visibility_prior_weights"][indices],
                    -1.0,
                )
        return batch

    def load_uncached_next_batch(
        self, iter_num: int, image_num: Optional[int] = None
    ) -> Dict[str, Any]:
        """Non-batched path: random rays from one image (reference :726-772;
        unmaintained there, functional here). Regenerates rays on the fly
        instead of using the cache."""
        h, w = self.resolution
        if image_num is None:
            img_i = int(self._rng.integers(0, self.num_frames))
        else:
            img_i = int(np.where(self.frame_nums == image_num)[0].item())

        rays_o_img, rays_d_img = ray_ops.get_rays(
            h, w,
            jnp.asarray(self._ray_intrinsic(self.intrinsics[img_i])),
            jnp.asarray(self.poses[img_i]),
        )  # (h, w, 3) each
        rays_o = rays_o_img.reshape(-1, 3)
        rays_d = rays_d_img.reshape(-1, 3)
        target = jnp.asarray(self.images[img_i].reshape(-1, 3))
        gx, gy = np.meshgrid(
            np.arange(w, dtype=np.int32), np.arange(h, dtype=np.int32),
            indexing="xy",
        )
        pixel_id = jnp.asarray(
            np.stack([np.full((h, w), img_i, np.int32), gx, gy], axis=-1)
            .reshape(-1, 3)
        )
        if image_num is None:
            sel = self._rng.choice(h * w, size=self.num_rays, replace=False)
            sel = jnp.asarray(np.sort(sel))
            rays_o, rays_d, target = rays_o[sel], rays_d[sel], target[sel]
            pixel_id = pixel_id[sel]
        nr = rays_o.shape[0]
        batch = {
            "iter_num": iter_num,
            "num_frames": self.num_frames,
            "rays_o": rays_o,
            "rays_d": rays_d,
            "view_dirs": ray_ops.get_view_dirs(rays_d),
            "target_rgb": target,
            "pixel_id": pixel_id,
            "indices_mask_nerf": jnp.ones((nr,), bool),
            "near": jnp.full((nr, 1), self.near, jnp.float32),
            "far": jnp.full((nr, 1), self.far, jnp.float32),
        }
        if self.ndc:
            intr = self.intrinsics[img_i]
            o_ndc, d_ndc = ray_ops.get_ndc_rays(
                rays_o, rays_d, h, w, float(intr[0, 0]), float(intr[1, 1]),
                self.near,
            )
            batch["rays_o_ndc"] = o_ndc
            batch["rays_d_ndc"] = d_ndc
            batch["near_ndc"] = jnp.full((nr, 1), self.near_ndc, jnp.float32)
            batch["far_ndc"] = jnp.full((nr, 1), self.far_ndc, jnp.float32)
        if self.mip_nerf_used:
            radii = _get_radii(rays_d_img[None]).reshape(-1, 1)
            batch["radii"] = (
                radii[sel] if image_num is None else radii
            ).astype(jnp.float32)
            if self.ndc:
                o_ndc_img, _ = ray_ops.get_ndc_rays(
                    rays_o_img.reshape(-1, 3), rays_d_img.reshape(-1, 3),
                    h, w, float(self.intrinsics[img_i][0, 0]),
                    float(self.intrinsics[img_i][1, 1]), self.near,
                )
                radii_ndc = _get_radii_ndc(
                    o_ndc_img.reshape(1, h, w, 3)
                ).reshape(-1, 1)
                batch["radii_ndc"] = (
                    radii_ndc[sel] if image_num is None else radii_ndc
                ).astype(jnp.float32)
        if self.poses_needed and self.mode == "train":
            # secondary-view origins need every pose + the per-ray image id
            batch["poses"] = jnp.asarray(self.poses)
        return batch

    def get_next_batch(self, iter_num: int, image_num: Optional[int] = None):
        """Reference-compatible per-iteration batch (reference :491-530).

        With image_num: all h*w rays of that image in scanline order (the
        validation/full-image path, reference :543-546) — no sparse-depth
        stream, matching the reference.
        """
        if not self.use_batching:
            return self.load_uncached_next_batch(iter_num, image_num)
        if image_num is None:
            nerf_idx = jnp.asarray(self._next_nerf_indices(iter_num))
            sd_idx = None
            if self.sparse_depth_needed and self.mode == "train":
                sd_idx = jnp.asarray(self._next_sd_indices())
            return self.gather_batch(nerf_idx, sd_idx, iter_num)
        h, w = self.resolution
        image_index = int(np.where(self.frame_nums == image_num)[0].item())
        indices = jnp.arange(h * w, dtype=jnp.int32) + image_index * h * w
        return self.gather_batch(indices, None, iter_num)

    # ------------------------------------------------------------- inference

    def create_test_data(
        self,
        pose: np.ndarray,
        view_pose: Optional[np.ndarray] = None,
        secondary_poses: Optional[List[np.ndarray]] = None,
        preprocess_pose: bool = True,
        intrinsic: Optional[np.ndarray] = None,
        view_intrinsic: Optional[np.ndarray] = None,
        secondary_intrinsics: Optional[List[np.ndarray]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Full-image ray batch for an arbitrary pose (reference :776-864)."""
        mc = self.model_configs
        h, w = mc["resolution"]

        def prep(p):
            if not preprocess_pose:
                return p.astype(np.float32)
            return pose_ops.preprocess_poses(
                p[None],
                train_mode=False,
                translation_scale=mc["translation_scale"],
                average_pose=np.asarray(mc["average_pose"]),
            )["poses"][0]

        processed_pose = prep(pose.copy()) if preprocess_pose else pose.astype(np.float32)
        if intrinsic is None:
            intrinsic = np.array(mc["intrinsic"])
        intrinsic = intrinsic.astype(np.float32)

        rays_o, rays_d = ray_ops.get_rays(
            h, w,
            jnp.asarray(self._ray_intrinsic(intrinsic).astype(np.float32)),
            jnp.asarray(processed_pose),
        )
        if view_pose is not None:
            processed_view_pose = prep(view_pose.copy())
            vi = np.array(mc["intrinsic"]) if view_intrinsic is None else view_intrinsic
            _, view_rays_d = ray_ops.get_rays(
                h, w,
                jnp.asarray(self._ray_intrinsic(vi).astype(np.float32)),
                jnp.asarray(processed_view_pose),
            )
            view_dirs = ray_ops.get_view_dirs(view_rays_d)
        else:
            view_dirs = ray_ops.get_view_dirs(rays_d)

        nr = h * w
        batch = {
            "rays_o": rays_o.reshape(-1, 3),
            "rays_d": rays_d.reshape(-1, 3),
            "view_dirs": view_dirs.reshape(-1, 3),
            "near": jnp.full((nr, 1), mc["near"], jnp.float32),
            "far": jnp.full((nr, 1), mc["far"], jnp.float32),
        }
        if self.ndc:
            o_ndc, d_ndc = ray_ops.get_ndc_rays(
                rays_o, rays_d, h, w, float(intrinsic[0, 0]), float(intrinsic[1, 1]),
                mc["near"],
            )
            batch["rays_o_ndc"] = o_ndc.reshape(-1, 3)
            batch["rays_d_ndc"] = d_ndc.reshape(-1, 3)
            batch["near_ndc"] = jnp.full((nr, 1), mc["near_ndc"], jnp.float32)
            batch["far_ndc"] = jnp.full((nr, 1), mc["far_ndc"], jnp.float32)

        if self.mip_nerf_used:
            batch["radii"] = _get_radii(
                jnp.asarray(rays_d)[None]
            )[0].reshape(-1, 1)
            if self.ndc:
                batch["radii_ndc"] = _get_radii_ndc(o_ndc[None])[0].reshape(-1, 1)

        if secondary_poses is not None:
            sec = [prep(p.copy()) for p in secondary_poses]
            if secondary_intrinsics is None:
                secondary_intrinsics = [np.array(mc["intrinsic"]) for _ in sec]
            origins = []
            for sp, si in zip(sec, secondary_intrinsics):
                o2, _ = ray_ops.get_rays(
                    h, w, jnp.asarray(si.astype(np.float32)), jnp.asarray(sp)
                )
                origins.append(o2.reshape(-1, 3))
            batch["rays_o2"] = jnp.stack(origins, axis=1)  # (nr, nf-1, 3)

        return jax.device_put(batch)

    def retrieve_inference_outputs(self, outputs: Dict[str, Any]) -> Dict[str, np.ndarray]:
        """Pick fine (else coarse) outputs and reshape/post-process
        (reference :866-894)."""
        h, w = self.model_configs["resolution"]
        if "fine_mlp" in self.configs["model"]:
            suffix = "_fine"
        elif "coarse_mlp" in self.configs["model"]:
            suffix = "_coarse"
        else:
            raise RuntimeError("no mlp configured")
        np_out = {k: np.asarray(v) for k, v in outputs.items()}
        result = {
            "image": self.post_process_image(np_out[f"rgb{suffix}"].reshape(h, w, 3)),
            "depth": self.post_process_depth(np_out[f"depth{suffix}"].reshape(h, w)),
            "depth_var": self.post_process_depth(
                np_out[f"depth_var{suffix}"].reshape(h, w)
            ),
        }
        if self.ndc:
            result["depth_ndc"] = self.post_process_depth(
                np_out[f"depth_ndc{suffix}"].reshape(h, w)
            )
            result["depth_var_ndc"] = self.post_process_depth(
                np_out[f"depth_var_ndc{suffix}"].reshape(h, w)
            )
        if f"visibility2{suffix}" in np_out:
            vis2 = np_out[f"visibility2{suffix}"].reshape(h, w, -1)
            result["visibility2"] = vis2.transpose(2, 0, 1).astype(np.float32)
        return result

    @staticmethod
    def post_process_image(rgb: np.ndarray) -> np.ndarray:
        return np.round(np.clip(rgb, 0.0, 1.0) * 255).astype(np.uint8)

    @staticmethod
    def post_process_depth(depth: np.ndarray) -> np.ndarray:
        return np.clip(depth, 0.0, np.inf).astype(np.float32)
