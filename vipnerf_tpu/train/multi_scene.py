"""Multi-scene batched training: one NeRF per device, trained in lockstep.

The reference trains scenes strictly sequentially (src/Trainer01.py:497-532,
paths relative to /root/reference/): 8 LLFF scenes x 200k iterations, one
after another. On a TPU pod slice the natural layout is different — ViP-NeRF
is per-scene (separate parameters per scene, no cross-scene state), so train
S scenes SIMULTANEOUSLY by stacking every per-scene array (params, optimizer
state, ray cache, index blocks) along a leading scene axis, sharding that
axis over the mesh, and vmapping the train step. Each device then runs its
own scene's optimization with ZERO inter-chip collectives — perfect scaling
(this is BASELINE.json config #5, "multi-scene batched training").

Requirements: all scenes share resolution / frame count / static config
(true within an LLFF/RealEstate/DTU train set).
"""

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vipnerf_tpu.data import get_data_loader, get_data_preprocessor
from vipnerf_tpu.losses import LossComputer
from vipnerf_tpu.models import get_model
from vipnerf_tpu.train import checkpoints
from vipnerf_tpu.train.step import make_optimizer, make_train_step
from vipnerf_tpu.utils.config import init_seeds, save_configs, save_model_configs

SCENE_AXIS = "scenes"


def _stack_pytrees(trees: Sequence[Any]):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _unstack_pytree(tree: Any, i: int):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


class MultiSceneTrainer:
    """Trains S same-shaped scenes in lockstep on an S-device mesh."""

    def __init__(
        self,
        configs: Dict[str, Any],
        scene_ids: List,
        database_dirpath: Path,
        devices: Optional[Sequence[jax.Device]] = None,
    ):
        self.configs = configs
        self.scene_ids = list(scene_ids)
        s = len(self.scene_ids)

        devices = list(devices if devices is not None else jax.devices())
        if len(devices) > s:
            devices = devices[:s]
        self.mesh = Mesh(np.asarray(devices), (SCENE_AXIS,))
        assert s % len(devices) == 0, (
            f"{s} scenes must divide {len(devices)} devices"
        )

        # Per-scene data
        self.preprocessors = []
        for scene_id in self.scene_ids:
            cfg = dict(configs)
            cfg["data_loader"] = dict(configs["data_loader"])
            cfg["data_loader"]["scene_id"] = scene_id
            loader = get_data_loader(cfg, database_dirpath, mode="train")
            prep = get_data_preprocessor(
                cfg, mode="train", raw_data_dict=loader.load_data()
            )
            self.preprocessors.append(prep)

        res = {tuple(p.resolution) for p in self.preprocessors}
        frames = {p.num_frames for p in self.preprocessors}
        assert len(res) == 1 and len(frames) == 1, (
            "multi-scene batching requires identical resolution and frame "
            f"count across scenes (got resolutions {res}, frames {frames})"
        )

        scene_sharded = NamedSharding(self.mesh, P(SCENE_AXIS))

        # Stacked device state: cache arrays (S, ...), near/far (S,)
        cache_keys = self.preprocessors[0].cache.keys()
        self.stacked_cache = {
            k: jax.device_put(
                jnp.stack([p.cache[k] for p in self.preprocessors]),
                scene_sharded,
            )
            for k in cache_keys
        }
        self.near = jax.device_put(
            jnp.asarray([p.near for p in self.preprocessors], jnp.float32),
            scene_sharded,
        )
        self.far = jax.device_put(
            jnp.asarray([p.far for p in self.preprocessors], jnp.float32),
            scene_sharded,
        )
        self.ndc = configs["data_loader"]["ndc"]
        if self.ndc:
            self.near_ndc = jax.device_put(
                jnp.asarray(
                    [p.near_ndc for p in self.preprocessors], jnp.float32
                ),
                scene_sharded,
            )
            self.far_ndc = jax.device_put(
                jnp.asarray(
                    [p.far_ndc for p in self.preprocessors], jnp.float32
                ),
                scene_sharded,
            )

        # Stacked model/optimizer state
        init_fn, self.render_fn = get_model(configs)
        seed = configs.get("seed", 0) or 0
        per_scene_params = [
            init_fn(jax.random.PRNGKey(seed), configs) for _ in self.scene_ids
        ]
        self.params = jax.device_put(
            _stack_pytrees(per_scene_params), scene_sharded
        )
        self.tx = make_optimizer(configs)
        self.opt_state = jax.device_put(
            jax.vmap(self.tx.init)(self.params), scene_sharded
        )

        loss_computer = LossComputer(configs)
        train_step = make_train_step(
            configs, self.render_fn, loss_computer, self.tx
        )
        self._gather = self._make_gather()

        def scene_step(params, opt_state, cache, near, far, nerf_i, sd_i,
                       iter_num, key):
            batch = self._gather(cache, near, far, nerf_i, sd_i, iter_num)
            return train_step(params, opt_state, batch, key)

        in_axes = (0, 0, 0, 0, 0, 0, 0 if self.with_sd else None, None, 0)

        def stepped(params, opt_state, cache, near, far, nerf_idx, sd_idx,
                    iter_num, keys):
            return jax.vmap(scene_step, in_axes=in_axes)(
                params, opt_state, cache, near, far, nerf_idx, sd_idx,
                iter_num, keys,
            )

        self._step = jax.jit(stepped, donate_argnums=(0, 1))
        self.base_key = jax.random.PRNGKey(seed)
        self.scene_sharded = scene_sharded

    @property
    def with_sd(self) -> bool:
        return self.preprocessors[0].sparse_depth_needed

    def _make_gather(self):
        """Pure per-scene batch gather over a stacked cache row.

        near/far arrive as per-scene scalars ((,) after vmap slicing);
        everything else mirrors DataPreprocessor.gather_batch.
        """
        prep0 = self.preprocessors[0]
        num_frames = prep0.num_frames
        ndc = self.ndc
        with_sd = self.with_sd
        poses_needed = prep0.poses_needed
        vis_needed = prep0.visibility_prior_needed

        def gather(cache, near, far, nerf_idx, sd_idx, iter_num):
            if with_sd:
                indices = jnp.concatenate([nerf_idx, sd_idx])
                mask_nerf = jnp.concatenate(
                    [
                        jnp.ones(nerf_idx.shape[0], bool),
                        jnp.zeros(sd_idx.shape[0], bool),
                    ]
                )
                mask_sd = ~mask_nerf
            else:
                indices = nerf_idx
                mask_nerf = jnp.ones(nerf_idx.shape[0], bool)
                mask_sd = None
            nr = indices.shape[0]
            batch = {
                "iter_num": iter_num,
                "num_frames": num_frames,
                "indices_mask_nerf": mask_nerf,
                "rays_o": cache["rays_o"][indices],
                "rays_d": cache["rays_d"][indices],
                "view_dirs": cache["view_dirs"][indices],
                "pixel_id": cache["pixel_id"][indices],
                "target_rgb": jnp.where(
                    mask_nerf[:, None], cache["target_rgb"][indices], -1.0
                ),
                "near": jnp.full((nr, 1), 1.0) * near,
                "far": jnp.full((nr, 1), 1.0) * far,
            }
            if ndc:
                batch["rays_o_ndc"] = cache["rays_o_ndc"][indices]
                batch["rays_d_ndc"] = cache["rays_d_ndc"][indices]
                batch["near_ndc"] = jnp.zeros((nr, 1), jnp.float32)
                batch["far_ndc"] = jnp.ones((nr, 1), jnp.float32)
            if mask_sd is not None:
                batch["indices_mask_sparse_depth"] = mask_sd
                batch["sparse_depth_values"] = jnp.where(
                    mask_sd[:, None],
                    cache["sparse_depth_values"][indices],
                    -1.0,
                )
            if poses_needed:
                batch["poses"] = cache["poses"]
            if vis_needed and "visibility_prior_masks" in cache:
                batch["visibility_prior_masks"] = jnp.where(
                    mask_nerf[:, None],
                    cache["visibility_prior_masks"][indices],
                    -1.0,
                )
            if vis_needed and "visibility_prior_weights" in cache:
                batch["visibility_prior_weights"] = jnp.where(
                    mask_nerf[:, None],
                    cache["visibility_prior_weights"][indices],
                    -1.0,
                )
            return batch

        return gather

    def train(self, num_iterations: int, log_every: int = 100):
        """Run all scenes in lockstep; returns per-scene final loss scalars."""
        s = len(self.scene_ids)
        scalars = None
        for it in range(num_iterations):
            nerf_rows, sd_rows = [], []
            for p in self.preprocessors:
                n, d = p.get_index_chunk(it, 1)
                nerf_rows.append(n[0])
                sd_rows.append(d[0] if d is not None else None)
            nerf_idx = jax.device_put(
                np.stack(nerf_rows).astype(np.int32), self.scene_sharded
            )
            sd_idx = (
                jax.device_put(
                    np.stack(sd_rows).astype(np.int32), self.scene_sharded
                )
                if self.with_sd
                else None
            )
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.fold_in(self.base_key, i), it)
            )(jnp.arange(s))
            with self.mesh:
                self.params, self.opt_state, scalars = self._step(
                    self.params,
                    self.opt_state,
                    self.stacked_cache,
                    self.near,
                    self.far,
                    nerf_idx,
                    sd_idx,
                    it,
                    keys,
                )
        return jax.device_get(scalars)

    def save_checkpoints(self, output_dirpath: Path, iteration_num: int):
        """Per-scene checkpoints with the standard naming contract."""
        params_host = jax.device_get(self.params)
        opt_host = jax.device_get(self.opt_state)
        for i, scene_id in enumerate(self.scene_ids):
            scene_dir = Path(output_dirpath) / f"{scene_id}/saved_models"
            checkpoints.save_checkpoint(
                scene_dir,
                iteration_num,
                _unstack_pytree(params_host, i),
                _unstack_pytree(opt_host, i),
            )


def start_training_batched(configs: Dict[str, Any]):
    """Multi-scene entry point mirroring start_training's contract."""
    root_dirpath = Path(configs.get("root_dirpath", "."))
    database_dirpath = root_dirpath / "data" / configs["database_dirpath"]
    output_dirpath = root_dirpath / f"runs/training/train{configs['train_num']:04}"
    output_dirpath.mkdir(parents=True, exist_ok=True)
    save_configs(output_dirpath, dict(configs))
    init_seeds(configs.get("seed", 0))

    from vipnerf_tpu.train.trainer import resolve_scene_ids

    scene_ids = resolve_scene_ids(configs, database_dirpath)
    trainer = MultiSceneTrainer(configs, scene_ids, database_dirpath)
    for i, scene_id in enumerate(scene_ids):
        scene_dir = output_dirpath / f"{scene_id}"
        scene_dir.mkdir(parents=True, exist_ok=configs.get("resume_training", True))
        save_model_configs(
            scene_dir, trainer.preprocessors[i].get_model_configs()
        )
    trainer.train(configs["num_iterations"])
    trainer.save_checkpoints(output_dirpath, configs["num_iterations"])
    return trainer
