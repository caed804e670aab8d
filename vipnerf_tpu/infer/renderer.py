"""Tiled full-image rendering, optionally sharded over a device mesh.

TPU-native replacement for the reference's chunked inference loops
(src/models/VipNeRF01.py:47-72 `batchify_rays` and
src/Trainer01.py:130-221 validation chunking, paths relative to
/root/reference/): rays are padded to a static tile size and rendered by ONE
jitted tile function (compiled once per config), looping tiles on host and
assembling numpy outputs — device memory stays bounded by the tile, and every
tile runs the identical XLA program.

Multi-chip: the reference wraps the model in torch.nn.DataParallel at test
time too (/root/reference/src/Tester01.py:42), scattering each chunk's rays
over its 2 GPUs. The TPU equivalent here: pass `mesh` and each tile's ray
axis is sharded over the mesh devices (params replicated) — full-image
rendering is embarrassingly parallel over rays, so XLA partitions the tile
program with zero collectives beyond the output gather.

Only user-facing output keys are fetched to host (the reference instead
deletes ~50 intermediate keys after the fact, Trainer01.py:197-221).
"""

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vipnerf_tpu.parallel.mesh import RAY_AXIS
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Keys worth returning to host from a tile render (superset; missing ones are
# skipped). Everything else (raw_*, weights, alpha, z_vals) stays on device.
_KEEP_KEYS = (
    "rgb_coarse", "rgb_fine",
    "acc_coarse", "acc_fine",
    "depth_coarse", "depth_fine",
    "depth_var_coarse", "depth_var_fine",
    "depth_ndc_coarse", "depth_ndc_fine",
    "depth_var_ndc_coarse", "depth_var_ndc_fine",
    "visibility2_coarse", "visibility2_fine",
)


# The default-preview sample budget (coarse, fine). Measured on trained
# protocol checkpoints (tools/sample_budget_eval.py, BASELINE.md rounds 3-5):
# 32+8 is quality-validated on three scenes/checkpoints and renders FASTER
# than a coarse-only pass at the trained count (1.22 vs 1.10 fps at
# 1008x756), so it superseded coarse-only as the `preview: true` mode.
PREVIEW_BUDGET = (32, 8)


def preview_budget_configs(configs: Dict[str, Any]) -> Dict[str, Any]:
    """Default-preview render configs: the reduced 32+8 sample budget
    through the FULL coarse+fine pipeline (beyond-reference).

    This superseded the coarse-only preview after the round-5 measurement
    (BASELINE.md): on a trained 3-view DTU checkpoint the coarse field
    renders 13.5 dB vs 20.5 (32+8) / 24.1 (full 64+128) — the coarse MLP is
    an importance-sampling field, not a usable image — and coarse-only at
    the trained count is also slower than 32+8. Checkpoints load unchanged;
    only the quadrature shrinks.
    """
    import copy

    out = copy.deepcopy(configs)
    coarse, fine = PREVIEW_BUDGET
    # Never EXCEED the trained quadrature (a model trained below the budget
    # is already cheaper than the budget); tolerate coarse-only models.
    coarse_mlp = out["model"]["coarse_mlp"]
    coarse_mlp["num_samples"] = min(coarse, coarse_mlp["num_samples"])
    fine_mlp = out["model"].get("fine_mlp")
    if fine_mlp is not None:
        fine_mlp["num_samples"] = min(fine, fine_mlp["num_samples"])
    return out


def preview_configs(
    configs: Dict[str, Any], num_samples: Optional[int] = None
) -> Dict[str, Any]:
    """Coarse-only render configs — a density/debug view (beyond-reference).

    Drops the fine pass and renders the coarse field alone, optionally at an
    overridden `num_samples`. NOT a quality mode: the coarse MLP is trained
    as the fine pass's importance sampler and its held-out renders measure
    ~10 dB below the full pipeline (BASELINE.md round-5, bit-identical to
    the full render's own `rgb_coarse` map). The product's `preview: true`
    uses `preview_budget_configs` instead; an explicit integer
    `preview: N` selects this coarse-only view.

    Returns a new configs dict safe to hand to TiledRenderer alongside the
    FULL model params (the unused `fine` subtree is simply not evaluated).
    """
    import copy

    out = copy.deepcopy(
        {k: v for k, v in configs.items() if k != "model"}
    )
    model = {k: v for k, v in configs["model"].items() if k != "fine_mlp"}
    model["coarse_mlp"] = dict(model["coarse_mlp"])
    if num_samples is not None:
        model["coarse_mlp"]["num_samples"] = int(num_samples)
    out["model"] = model
    return out


# Boolean ray masks the losses select on; pad rows must be zeroed here or the
# edge-duplicated pad rays bias the final tile's loss mean (the reference
# slices exact chunks instead, Trainer01.py divide_input_batch_). `ray_valid`
# is injected by render() for loss renders so unmasked losses
# (VisibilityLoss01) can also exclude pad rows.
_LOSS_MASK_KEYS = ("indices_mask_nerf", "indices_mask_sparse_depth",
                   "ray_valid")


def _tile_ray_counts(num_rays: int, tile: int) -> np.ndarray:
    """Real (non-pad) ray count per tile; only the last tile is partial."""
    num_tiles = (num_rays + tile - 1) // tile
    counts = np.full((num_tiles,), tile, np.float64)
    counts[-1] = num_rays - (num_tiles - 1) * tile
    return counts


def _split_batch(batch: Dict[str, Any], num_rays: int, tile: int):
    """Pad ray-axis fields to a multiple of `tile` and yield tiles."""
    num_tiles = (num_rays + tile - 1) // tile
    padded = num_tiles * tile

    ray_keys = [
        k
        for k, v in batch.items()
        if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == num_rays
    ]
    padded_batch = {}
    for k, v in batch.items():
        if k in ray_keys and padded != num_rays:
            pad_width = [(0, padded - num_rays)] + [(0, 0)] * (v.ndim - 1)
            if k in _LOSS_MASK_KEYS:
                padded_batch[k] = jnp.pad(v, pad_width)  # pads masked OUT
            else:
                padded_batch[k] = jnp.pad(v, pad_width, mode="edge")
        else:
            padded_batch[k] = v

    for t in range(num_tiles):
        tile_batch = {}
        for k, v in padded_batch.items():
            if k in ray_keys:
                tile_batch[k] = jax.lax.slice_in_dim(v, t * tile, (t + 1) * tile)
            else:
                tile_batch[k] = v
        yield tile_batch


class TiledRenderer:
    """Renders arbitrary-size ray batches through a fixed-tile jitted fn."""

    def __init__(
        self,
        render_fn: Callable,
        configs: Dict[str, Any],
        params_example=None,
        loss_computer=None,
        mesh: Optional[Mesh] = None,
    ):
        """`mesh`: optional 1-D device mesh (parallel.mesh.make_mesh). When
        given with >1 device, every tile's ray axis is sharded across the
        mesh and parameters are replicated — the DataParallel-at-test-time
        equivalent (reference Tester01.py:42)."""
        self.render_fn = render_fn
        self.configs = configs
        self.loss_computer = loss_computer
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self._jitted: Dict[Tuple, Callable] = {}
        # Single-dispatch program keys that tripped an INTERNAL backend
        # compiler error; such keys permanently delegate to the eager path
        # (retrying would re-pay the failed multi-minute compile per frame).
        self._sd_broken: set = set()

    # ------------------------------------------------------------- sharding

    def _shard_tile_batch(self, tiled_batch, const_batch, params):
        """Place (n_tiles, tile, ...) ray fields sharded over the in-tile ray
        axis; params and per-frame constants replicated. jit propagates the
        shardings through the tile program."""
        mesh = self.mesh
        shard = lambda ndim, axis: NamedSharding(  # noqa: E731
            mesh, P(*[RAY_AXIS if i == axis else None for i in range(ndim)])
        )
        repl = NamedSharding(mesh, P())
        tiled_batch = {
            k: jax.device_put(v, shard(v.ndim, 1))
            for k, v in tiled_batch.items()
        }
        const_batch = {
            k: jax.device_put(v, repl) if hasattr(v, "shape") else v
            for k, v in const_batch.items()
        }
        params = jax.device_put(params, repl)
        return tiled_batch, const_batch, params

    def _tile_multiple(self) -> int:
        """Tiles must divide evenly across mesh devices."""
        return self.mesh.size if self.mesh is not None else 1

    def _get_tile_fn(
        self, sec_views_vis: bool, retraw: bool, with_losses: bool,
        return_loss_maps: bool, keep: Optional[Tuple[str, ...]],
        uint8_rgb: bool,
    ) -> Callable:
        key = (sec_views_vis, retraw, with_losses, return_loss_maps, keep,
               uint8_rgb)
        if key in self._jitted:
            return self._jitted[key]
        keep_keys = keep if keep is not None else _KEEP_KEYS

        def tile_fn(params, tile_batch):
            out = self.render_fn(
                params,
                self.configs,
                tile_batch,
                train=False,
                sec_views_vis=sec_views_vis,
                retraw=retraw,
            )
            kept = {k: out[k] for k in keep_keys if k in out}
            if uint8_rgb:
                # Quantize on device: host transfers can dominate (the axon
                # tunnel moves device->host at ~14 MB/s) and rgb is 3/4 of
                # the bytes. Matches post_process_image rounding.
                for k in list(kept):
                    if k.startswith("rgb_"):
                        kept[k] = jnp.round(
                            jnp.clip(kept[k], 0.0, 1.0) * 255.0
                        ).astype(jnp.uint8)
            losses = None
            if with_losses and self.loss_computer is not None:
                losses = self.loss_computer.compute_losses(
                    tile_batch, out, return_loss_maps=return_loss_maps
                )
            return kept, losses

        fn = jax.jit(tile_fn)
        self._jitted[key] = fn
        return fn

    def render(
        self,
        params,
        batch: Dict[str, Any],
        *,
        chunk_size: int = 65536,
        sec_views_vis: bool = False,
        retraw: bool = False,
        with_losses: bool = False,
        return_loss_maps: bool = False,
        keep: Optional[Tuple[str, ...]] = None,
        uint8_rgb: bool = False,
        single_dispatch: Optional[bool] = None,
    ):
        """Render `batch` (nr rays), returning (outputs, losses).

        outputs: dict of numpy arrays (nr, ...). losses: averaged loss dict
        over tiles (reference merge semantics, Trainer01.py:147-172) with loss
        maps concatenated, or None.

        single_dispatch (default: on) runs the whole tile loop on device via
        lax.map — one host dispatch per frame instead of ~8 eager slices + 1
        call per tile (each eager op is a full round trip on remote-tunnel
        backends). Losses ride inside the map: per-tile loss values are
        device-side and averaged on host once (the same per-tile-mean merge
        the eager path uses, matching the reference's chunk merge,
        Trainer01.py:147-172), loss maps are gathered in one transfer.
        """
        nr = int(batch["rays_o"].shape[0])
        if with_losses and "ray_valid" not in batch:
            # Pad rows get ray_valid=False (zero-padded via _LOSS_MASK_KEYS)
            # so losses without an indices mask also skip them.
            batch = {**batch, "ray_valid": jnp.ones((nr,), bool)}
        mult = self._tile_multiple()
        tile = min(chunk_size, nr)
        tile = max(mult, (tile // mult) * mult)  # divisible across the mesh
        if single_dispatch is None:
            single_dispatch = True
        if single_dispatch and (
            not with_losses or self.loss_computer is not None
        ):
            return self._render_single_dispatch(
                params, batch, nr, tile, sec_views_vis, retraw,
                tuple(keep) if keep is not None else None, uint8_rgb,
                with_losses=with_losses, return_loss_maps=return_loss_maps,
            )
        return self._render_eager(
            params, batch, nr, tile, sec_views_vis, retraw,
            tuple(keep) if keep is not None else None, uint8_rgb,
            with_losses=with_losses, return_loss_maps=return_loss_maps,
        )

    def _render_eager(
        self, params, batch, nr, tile, sec_views_vis, retraw, keep, uint8_rgb,
        with_losses=False, return_loss_maps=False,
    ):
        """Per-tile host loop: one jitted single-tile program, dispatched
        eagerly per tile (fetch once at the end). Slower than the lax.map
        single-dispatch path on remote-tunnel backends (one host round trip
        per tile) but compiles a structurally simpler XLA program — also the
        automatic fallback when the single-dispatch program trips an internal
        backend compiler error (see _render_single_dispatch)."""
        fn = self._get_tile_fn(
            sec_views_vis, retraw, with_losses, return_loss_maps,
            keep, uint8_rgb,
        )

        if self.mesh is not None:
            repl = NamedSharding(self.mesh, P())
            ray_shard = NamedSharding(self.mesh, P(RAY_AXIS))
            params = jax.device_put(params, repl)

        # Dispatch all tiles asynchronously, fetch once at the end: a
        # synchronous per-tile device_get serializes compute with (slow)
        # device->host transfers and kills pipelining.
        tile_results: List[Any] = []
        for tile_batch in _split_batch(batch, nr, tile):
            if self.mesh is not None:
                tile_batch = {
                    k: jax.device_put(
                        v,
                        ray_shard
                        if hasattr(v, "shape")
                        and v.ndim >= 1
                        and v.shape[0] == tile
                        else repl,
                    )
                    if hasattr(v, "shape")
                    else v
                    for k, v in tile_batch.items()
                }
            tile_results.append(fn(params, tile_batch))
        tile_results = jax.device_get(tile_results)

        out_parts: Dict[str, List[np.ndarray]] = {}
        loss_parts: List[Any] = []
        for kept, losses in tile_results:
            for k, v in kept.items():
                out_parts.setdefault(k, []).append(np.asarray(v))
            if losses is not None:
                loss_parts.append(losses)

        outputs = {k: np.concatenate(v, axis=0)[:nr] for k, v in out_parts.items()}

        merged_losses = None
        if loss_parts:
            # Ray-count-weighted merge: pad rays are masked out of each
            # tile's mean above, and weighting by real ray count makes the
            # merged scalar tile-size-invariant (equal to the whole-frame
            # masked mean), unlike the reference's unweighted chunk-mean
            # merge which over-weights a partial final chunk.
            wts = _tile_ray_counts(nr, tile)
            wmean = lambda vals: float(  # noqa: E731
                np.sum(wts * np.asarray(vals, np.float64)) / np.sum(wts)
            )
            merged_losses = {}
            for name, val in loss_parts[0].items():
                if isinstance(val, dict):
                    merged_losses[name] = {
                        "loss_value": wmean(
                            [p[name]["loss_value"] for p in loss_parts]
                        )
                    }
                    if return_loss_maps and "loss_maps" in val:
                        merged_losses[name]["loss_maps"] = {
                            mk: np.concatenate(
                                [np.asarray(p[name]["loss_maps"][mk]) for p in loss_parts]
                            )[:nr]
                            for mk in val["loss_maps"]
                        }
                else:  # TotalLoss scalar
                    merged_losses[name] = wmean(
                        [p[name] for p in loss_parts]
                    )
        return outputs, merged_losses

    def _render_single_dispatch(
        self, params, batch, nr, tile, sec_views_vis, retraw, keep, uint8_rgb,
        with_losses=False, return_loss_maps=False,
    ):
        """One jitted program for the whole frame: pad + reshape ray fields to
        (n_tiles, tile, ...) and lax.map the tile render on device. Losses
        (when requested) are computed per tile INSIDE the map — the stacked
        per-tile loss values come back in the same single transfer as the
        render outputs and are merged on host exactly like the eager per-tile
        path (mean over tiles; loss maps concatenated and cropped)."""
        key = ("single", sec_views_vis, retraw, keep, uint8_rgb, tile,
               with_losses, return_loss_maps)
        if key in self._sd_broken:
            return self._render_eager(
                params, batch, nr, tile, sec_views_vis, retraw, keep,
                uint8_rgb, with_losses=with_losses,
                return_loss_maps=return_loss_maps,
            )
        fn = self._jitted.get(key)
        if fn is None:
            keep_keys = keep if keep is not None else _KEEP_KEYS
            render_fn = self.render_fn
            configs = self.configs
            loss_computer = self.loss_computer

            def whole_frame(params, padded_batch, const_batch):
                def tile_body(tile_batch):
                    full_tile = {**tile_batch, **const_batch}
                    out = render_fn(
                        params,
                        configs,
                        full_tile,
                        train=False,
                        sec_views_vis=sec_views_vis,
                        retraw=retraw,
                    )
                    kept = {k: out[k] for k in keep_keys if k in out}
                    if uint8_rgb:
                        for k in list(kept):
                            if k.startswith("rgb_"):
                                kept[k] = jnp.round(
                                    jnp.clip(kept[k], 0.0, 1.0) * 255.0
                                ).astype(jnp.uint8)
                    if with_losses:
                        losses = loss_computer.compute_losses(
                            full_tile, out, return_loss_maps=return_loss_maps
                        )
                        return kept, losses
                    return kept

                return jax.lax.map(tile_body, padded_batch)

            fn = jax.jit(whole_frame)
            self._jitted[key] = fn

        num_tiles = (nr + tile - 1) // tile
        padded = num_tiles * tile
        tiled_batch, const_batch = {}, {}
        for k, v in batch.items():
            if hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == nr:
                if padded != nr:
                    pad_width = [(0, padded - nr)] + [(0, 0)] * (v.ndim - 1)
                    # pad rows are masked OUT of the losses (_LOSS_MASK_KEYS
                    # zero-padded) so the final tile's loss mean covers only
                    # real rays
                    mode = "constant" if k in _LOSS_MASK_KEYS else "edge"
                    v = jnp.pad(v, pad_width, mode=mode)
                tiled_batch[k] = v.reshape((num_tiles, tile) + v.shape[1:])
            else:
                const_batch[k] = v
        if self.mesh is not None:
            tiled_batch, const_batch, params = self._shard_tile_batch(
                tiled_batch, const_batch, params
            )
        try:
            result = jax.device_get(fn(params, tiled_batch, const_batch))
        except jax.errors.JaxRuntimeError as e:
            # Backend compiler bugs (e.g. libtpu regalloc RET_CHECK failures,
            # surfaced as INTERNAL) are program-shape-specific: the lax.map
            # whole-frame program can fail where the standalone single-tile
            # program compiles fine. Fall back to the eager tile loop rather
            # than killing the run — correctness is identical (same tile
            # body, same ray-count-weighted merge), only dispatch differs.
            if "INTERNAL" not in str(e):
                raise
            print(
                "WARNING: single-dispatch render program failed to compile "
                f"(key={key}): {str(e).splitlines()[0]}\n"
                "Falling back to the eager per-tile render path for this "
                "program; set validation_tile_size to a different tile to "
                "retry single-dispatch with a new program shape.",
                flush=True,
            )
            self._sd_broken.add(key)
            self._jitted.pop(key, None)
            return self._render_eager(
                params, batch, nr, tile, sec_views_vis, retraw, keep,
                uint8_rgb, with_losses=with_losses,
                return_loss_maps=return_loss_maps,
            )
        stacked, stacked_losses = result if with_losses else (result, None)
        outputs = {
            k: np.asarray(v).reshape((padded,) + v.shape[2:])[:nr]
            for k, v in stacked.items()
        }
        merged_losses = None
        if with_losses:
            # Same ray-count-weighted merge as the eager path (see there).
            wts = _tile_ray_counts(nr, tile)
            wmean = lambda vals: float(  # noqa: E731
                np.sum(wts * np.asarray(vals, np.float64)) / np.sum(wts)
            )
            merged_losses = {}
            for name, val in stacked_losses.items():
                if isinstance(val, dict):
                    merged_losses[name] = {
                        "loss_value": wmean(val["loss_value"])
                    }
                    if return_loss_maps and "loss_maps" in val:
                        merged_losses[name]["loss_maps"] = {
                            mk: np.asarray(mv).reshape(
                                (padded,) + np.asarray(mv).shape[2:]
                            )[:nr]
                            for mk, mv in val["loss_maps"].items()
                        }
                else:  # TotalLoss scalar -> (num_tiles,)
                    merged_losses[name] = wmean(val)
        return outputs, merged_losses
