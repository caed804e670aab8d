"""Training runtime: per-scene orchestration, scanned training loop,
validation renders, checkpointing, logging.

Parity target: src/Trainer01.py (paths relative to /root/reference/):
- output contract: runs/training/train{NNNN:04}/{scene_id}/ with Configs.json
  (:471-473), ModelConfigs.json (:523), logs/ (:55), samples/ (:278),
  saved_models/Model_Iter{NNNNNN:06} + Model_Latest (:352-366)
- loop: per-iter lr (in-graph here), validation every validation_interval
  (:301-305), checkpoint every model_save_interval (:310-311), resume (:290)
- validation: full train+val image renders with losses and loss-map dumps
  (:109-263), file naming {frame:04}_{mode}_Iter{iter:05}.png etc.

TPU-first differences:
- The inner loop runs K iterations per host dispatch via the jitted
  `lax.scan` chunk (vipnerf_tpu.train.step); scan boundaries are aligned to
  validation/save intervals so observable behavior matches the reference's
  per-iteration loop.
- Multi-chip: when >1 device is visible, batch index blocks are sharded over
  the ray axis of a 1-D mesh and parameters are replicated (the TPU-native
  equivalent of the reference's DataParallel, SURVEY.md §2.9).
"""

import time
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vipnerf_tpu.data import get_data_loader, get_data_preprocessor
from vipnerf_tpu.utils.naming import scene_dirname
from vipnerf_tpu.infer.renderer import TiledRenderer
from vipnerf_tpu.losses import LossComputer
from vipnerf_tpu.models import get_model
from vipnerf_tpu.parallel.mesh import (
    make_mesh,
    ray_sharding,
    replicate,
    select_devices,
)
from vipnerf_tpu.train import checkpoints
from vipnerf_tpu.train.logging import ScalarLogger
from vipnerf_tpu.train.lr_schedules import get_lr_schedule
from vipnerf_tpu.train.step import (
    default_step_dispatch,
    make_host_loop_train,
    make_optimizer,
    make_scan_train,
    make_train_step,
)
from vipnerf_tpu.utils.config import init_seeds, save_configs, save_model_configs
from vipnerf_tpu.utils.io import save_image, save_numpy_array


class Trainer:
    def __init__(
        self,
        configs: Dict[str, Any],
        model_configs: Dict[str, Any],
        train_data_preprocessor,
        val_data_preprocessor,
        params,
        loss_computer: LossComputer,
        output_dirpath: Path,
        verbose_log: bool = True,
    ):
        self.configs = configs
        self.model_configs = model_configs
        self.train_data_preprocessor = train_data_preprocessor
        self.val_data_preprocessor = val_data_preprocessor
        self.loss_computer = loss_computer
        self.output_dirpath = Path(output_dirpath)
        self.verbose_log = verbose_log

        self.params = params
        _, self.render_fn = get_model(configs)
        self.tx = make_optimizer(configs)
        self.opt_state = self.tx.init(params)
        self.lr_schedule = get_lr_schedule(configs)

        # Honor configs['device'] like the reference's DataParallel device
        # list (src/Trainer01.py:517): "all"/None = every local device.
        self.mesh = make_mesh(select_devices(configs.get("device")))
        self.multi_device = len(self.mesh.devices.ravel()) > 1

        train_step = make_train_step(
            configs, self.render_fn, loss_computer, self.tx
        )
        gather = train_data_preprocessor.gather_batch
        with_sd = train_data_preprocessor.sparse_depth_needed
        dispatch = configs.get("step_dispatch", default_step_dispatch())
        if dispatch == "host":
            self.scan_train = make_host_loop_train(
                configs, gather, train_step, with_sd=with_sd
            )
        else:
            self.scan_train = make_scan_train(
                configs, gather, train_step, with_sd=with_sd
            )

        # Validation renders shard each tile's rays over the same mesh the
        # train step uses (reference DataParallel covers validation too).
        self.renderer = TiledRenderer(
            self.render_fn, configs, loss_computer=loss_computer,
            mesh=self.mesh if self.multi_device else None,
        )
        self.logger = ScalarLogger(self.output_dirpath / "logs")
        self.base_key = jax.random.PRNGKey(configs.get("seed", 0) or 0)

        # Scan chunk length: how many train iterations per host dispatch.
        self.scan_steps = int(configs.get("scan_steps", 100))

        # Optional on-device profiling (SURVEY.md §5: the reference has no
        # tracing; we add jax.profiler hooks): configs['profiler'] =
        # {'start_iter': N, 'num_iters': K} traces that window to
        # <output>/logs/profile for TensorBoard / trace-viewer analysis.
        self.profiler_cfg = configs.get("profiler")

    # --------------------------------------------------------------- training

    def _place_indices(self, arr: np.ndarray) -> jax.Array:
        if self.multi_device and arr.shape[1] % len(self.mesh.devices.ravel()) == 0:
            return jax.device_put(arr, ray_sharding(self.mesh, axis=1, ndim=arr.ndim))
        return jnp.asarray(arr)

    def train(self):
        train_num = self.configs["train_num"]
        scene_id = self.configs["data_loader"]["scene_id"]
        print(f"Training {train_num}/{scene_id} begins...")
        sample_images_dirpath = self.output_dirpath / "samples"
        saved_models_dirpath = self.output_dirpath / "saved_models"
        sample_images_dirpath.mkdir(parents=True, exist_ok=True)
        saved_models_dirpath.mkdir(parents=True, exist_ok=True)

        validation_interval = self.configs["validation_interval"]
        model_save_interval = self.configs["model_save_interval"]
        total_num_iters = self.configs["num_iterations"]
        precrop_end = self.configs["data_loader"].get("precrop_iterations", -1)

        start_iter = self.load_model(saved_models_dirpath)

        if self.multi_device:
            rep = replicate(self.mesh)
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)

        # Resume catch-up: checkpoints are written BEFORE validation (crash
        # safety), so an interruption during a boundary's validation leaves
        # a checkpoint whose validation artifacts are missing or partial.
        # Re-run that boundary's validation unless EVERY expected frame
        # (train_images AND val_images passes both write into samples/,
        # distinguished only by frame number) is already on disk — a crash
        # between the two passes must not orphan the val_images half.
        if (
            start_iter > 0
            and start_iter % validation_interval == 0
            and not self._validation_complete(start_iter, sample_images_dirpath)
        ):
            self._boundary_validation(start_iter, sample_images_dirpath)

        def next_k(it: int) -> int:
            # Align scan chunks to every host-observable boundary.
            boundaries = [total_num_iters]
            for interval in (validation_interval, model_save_interval):
                boundaries.append(((it // interval) + 1) * interval)
            if it < precrop_end:
                boundaries.append(precrop_end)
            return min(min(boundaries) - it, self.scan_steps)

        def fetch_chunk(it: int, k: int):
            nerf_idx, sd_idx = self.train_data_preprocessor.get_index_chunk(
                it, k
            )
            placed_sd = (
                self._place_indices(sd_idx) if sd_idx is not None else None
            )
            return self._place_indices(nerf_idx), placed_sd, nerf_idx, sd_idx

        it = start_iter
        t_start = time.time()
        rays_done = 0
        k = next_k(it) if it < total_num_iters else 0
        pending = fetch_chunk(it, k) if k else None
        while it < total_num_iters:
            nerf_dev, sd_dev, nerf_idx, sd_idx = pending

            # Trace any scan chunk whose [it, it+k) range OVERLAPS the
            # requested window — chunk starts rarely coincide with
            # start_iter exactly (the trace covers the whole chunk; scan
            # iterations cannot be traced individually).
            profiling = (
                self.profiler_cfg is not None
                and it < self.profiler_cfg["start_iter"]
                + self.profiler_cfg.get("num_iters", 1)
                and it + k > self.profiler_cfg["start_iter"]
            )
            if profiling:
                import jax.profiler as _prof

                _prof.start_trace(
                    (self.output_dirpath / "logs/profile").as_posix()
                )
            if sd_dev is not None:
                self.params, self.opt_state, scalars = self.scan_train(
                    self.params, self.opt_state, self.base_key, it,
                    nerf_dev, sd_dev,
                )
            else:
                self.params, self.opt_state, scalars = self.scan_train(
                    self.params, self.opt_state, self.base_key, it, nerf_dev,
                )
            # Prefetch the NEXT chunk's index block while this chunk computes:
            # the host->device upload (~1 ms/step worth on the tunneled
            # backend) rides under the scan instead of serializing after it.
            it_next = it + k
            k_next = next_k(it_next) if it_next < total_num_iters else 0
            pending_next = fetch_chunk(it_next, k_next) if k_next else None
            scalars = jax.device_get(scalars)
            if profiling:
                import jax.profiler as _prof

                _prof.stop_trace()
            rays_done += k * (
                nerf_idx.shape[1] + (sd_idx.shape[1] if sd_idx is not None else 0)
            )

            # Per-iteration scalars (reference logs every iter, :297-299).
            for j in range(k):
                step = it + j + 1
                for name, vals in scalars.items():
                    self.logger.add_scalar(f"train/{name}", float(vals[j]), step)
                self.logger.add_scalar(
                    "train/lr", float(self.lr_schedule(it + j)), step
                )
            it, k, pending = it_next, k_next, pending_next

            if self.verbose_log:
                elapsed = time.time() - t_start
                print(
                    f"iter {it}/{total_num_iters} "
                    f"TotalLoss {float(scalars['TotalLoss'][-1]):.5f} "
                    f"({rays_done / max(elapsed, 1e-9):,.0f} rays/s)",
                    flush=True,
                )

            # Checkpoint BEFORE validation (the reference validates first,
            # Trainer01.py:301-311; same-boundary artifacts are identical on
            # success, but saving first means a validation-render failure or
            # backend hang can never lose a full save-interval of training).
            # (Also at the final iteration even off-boundary: the reference
            # only saves on boundaries, Trainer01.py:310-311, so a
            # num_iterations not divisible by the interval silently trains a
            # model it never saves; for divisible configs artifacts are
            # identical.)
            if it % model_save_interval == 0 or it == total_num_iters:
                self.save_model(it, saved_models_dirpath)

            if it % validation_interval == 0:
                self._boundary_validation(it, sample_images_dirpath)

        self.logger.flush()

    def _validation_complete(
        self, it: int, sample_images_dirpath: Path
    ) -> bool:
        """True iff the iteration-`it` boundary validation left every
        expected artifact (coarse always; fine when the model has a fine
        MLP) for both the train and val preprocessors.

        Checks the full unconditional per-frame chain — PNG, depth .npy,
        depth-variance .npy (+ the NDC variants in ndc mode, + the
        per-secondary-view visibilities on the train pass) — not just the
        PNG: run_validation writes the PNG FIRST, so a crash between writes
        must still trigger the catch-up."""
        modes = ["coarse"]
        if self.configs["model"].get("fine_mlp"):
            modes.append("fine")
        ndc = self.configs["data_loader"].get("ndc", False)
        predicts_vis = any(
            self.configs["model"].get(m, {}).get("predict_visibility", False)
            for m in ("coarse_mlp", "fine_mlp")
        )
        for prep in (
            self.train_data_preprocessor, self.val_data_preprocessor
        ):
            frame_nums = prep.frame_nums
            for frame_num in frame_nums:
                f = int(frame_num)
                for mode in modes:
                    tag = f"{mode}_Iter{it:05}"
                    expected = [
                        f"predicted_frames/{f:04}_{tag}.png",
                        f"predicted_depths/{f:04}_{tag}.npy",
                        f"predicted_depths_variance/{f:04}_{tag}.npy",
                    ]
                    if ndc:
                        expected += [
                            f"predicted_depths/{f:04}_{mode}_ndc_Iter{it:05}.npy",
                            f"predicted_depths_variance/{f:04}_{mode}_ndc_Iter{it:05}.npy",
                        ]
                    if predicts_vis and prep.mode == "train":
                        expected += [
                            f"predicted_visibilities/{f:04}_{int(sec):04}_{tag}.npy"
                            for sec in frame_nums
                            if int(sec) != f
                        ]
                    for rel in expected:
                        if not (sample_images_dirpath / rel).exists():
                            return False
        return True

    def _boundary_validation(self, it: int, sample_images_dirpath: Path):
        for tag, prep in (
            ("train_images", self.train_data_preprocessor),
            ("val_images", self.val_data_preprocessor),
        ):
            if self.verbose_log:
                print(f"validation/{tag} @ iter {it}...", flush=True)
            t_val = time.time()
            val_losses = self.run_validation(
                it - 1, prep, sample_images_dirpath
            )
            self.logger.add_scalars(f"validation/{tag}", val_losses, it)
            if self.verbose_log:
                print(
                    f"validation/{tag} done in {time.time() - t_val:.0f}s",
                    flush=True,
                )

    # ------------------------------------------------------------- validation

    def run_validation(
        self, iter_num: int, data_preprocessor, save_dirpath: Path
    ) -> Dict[str, float]:
        """Full-image renders of every frame with losses (reference :109-263).

        Tile size: `validation_tile_size` if set, else the smaller of
        `validation_chunk_size` and 8192 — the measured-optimal render tile
        on v5e (BASELINE.md round-2 tile sweep; small tiles pipeline better),
        now safe for the loss path too since losses ride inside the lax.map
        single-dispatch program (one host round trip per frame either way).
        `validation_chunk_size` keeps its reference meaning
        (src/Trainer01.py:181) as an upper bound. Validation loss scalars are
        TILE-SIZE-INVARIANT: the renderer excludes pad rays and merges tiles
        weighted by real ray count, so the logged value equals the
        whole-frame masked mean regardless of the tile choice (round-5 fix;
        values logged by earlier rounds used an unweighted per-tile-mean
        merge and can differ in the last digits)."""
        chunk_size = self.configs.get("validation_tile_size") or min(
            self.configs["validation_chunk_size"], 8192
        )
        # Escape hatch for backend compiler bugs: validation_single_dispatch
        # False forces the eager per-tile path (the renderer also falls back
        # automatically when the single-dispatch compile fails INTERNAL).
        single_dispatch = self.configs.get("validation_single_dispatch")
        save_loss_maps = self.configs.get("validation_save_loss_maps", False)
        h, w = data_preprocessor.resolution
        is_train_data = data_preprocessor.mode == "train"
        frame_nums = data_preprocessor.frame_nums

        total: Dict[str, float] = {}
        for frame_num in frame_nums:
            frame_num = int(frame_num)
            if self.verbose_log:
                print(f"  rendering frame {frame_num:04}...", flush=True)
            batch = data_preprocessor.get_next_batch(iter_num, image_num=frame_num)
            outputs, losses = self.renderer.render(
                self.params,
                batch,
                chunk_size=chunk_size,
                sec_views_vis=is_train_data,
                retraw=True,
                with_losses=True,
                return_loss_maps=save_loss_maps,
                single_dispatch=single_dispatch,
            )
            for name, val in losses.items():
                v = val["loss_value"] if isinstance(val, dict) else val
                total[name] = total.get(name, 0.0) + float(v)

            for mode in ("coarse", "fine"):
                if f"rgb_{mode}" not in outputs:
                    continue
                tag = f"{mode}_Iter{iter_num + 1:05}"
                save_image(
                    save_dirpath / f"predicted_frames/{frame_num:04}_{tag}.png",
                    np.clip(outputs[f"rgb_{mode}"].reshape(h, w, 3), 0, 1),
                )
                save_numpy_array(
                    save_dirpath / f"predicted_depths/{frame_num:04}_{tag}.npy",
                    outputs[f"depth_{mode}"].reshape(h, w),
                    as_png=True,
                )
                save_numpy_array(
                    save_dirpath
                    / f"predicted_depths_variance/{frame_num:04}_{tag}.npy",
                    outputs[f"depth_var_{mode}"].reshape(h, w),
                    as_png=True,
                )
                if f"depth_ndc_{mode}" in outputs:
                    save_numpy_array(
                        save_dirpath
                        / f"predicted_depths/{frame_num:04}_{mode}_ndc_Iter{iter_num + 1:05}.npy",
                        outputs[f"depth_ndc_{mode}"].reshape(h, w),
                        as_png=True,
                    )
                    save_numpy_array(
                        save_dirpath
                        / f"predicted_depths_variance/{frame_num:04}_{mode}_ndc_Iter{iter_num + 1:05}.npy",
                        outputs[f"depth_var_ndc_{mode}"].reshape(h, w),
                        as_png=True,
                    )
                if f"visibility2_{mode}" in outputs:
                    others = [x for x in frame_nums if x != frame_num]
                    for j, sec in enumerate(others):
                        save_numpy_array(
                            save_dirpath
                            / f"predicted_visibilities/{frame_num:04}_{int(sec):04}_{tag}.npy",
                            outputs[f"visibility2_{mode}"][:, j].reshape(h, w),
                            as_png=True,
                        )

            if save_loss_maps:
                for name, val in losses.items():
                    if not isinstance(val, dict) or "loss_maps" not in val:
                        continue
                    for full_name, loss_map in val["loss_maps"].items():
                        save_numpy_array(
                            save_dirpath
                            / f"Losses/{full_name}_{frame_num:04}_Iter{iter_num + 1:05}.npy",
                            np.asarray(loss_map).reshape(h, w),
                            as_png=True,
                        )
        return {k: v / max(len(frame_nums), 1) for k, v in total.items()}

    def save_sample_images(self, iter_num: int, save_dirpath: Path):
        """Render every train/val frame from its own pose and dump
        frames/depths (reference save_sample_images :319-350 — defined but
        not called by the loop there either; exposed for API parity)."""
        for data_preprocessor in (
            self.train_data_preprocessor,
            self.val_data_preprocessor,
        ):
            for frame_num, pose in zip(
                data_preprocessor.frame_nums, data_preprocessor.poses
            ):
                pose44 = np.eye(4, dtype=np.float32)
                pose44[:3] = np.asarray(pose)[:3]
                batch = self.train_data_preprocessor.create_test_data(
                    pose44, preprocess_pose=False
                )
                outputs, _ = self.renderer.render(
                    self.params,
                    batch,
                    chunk_size=self.configs["validation_chunk_size"],
                )
                predictions = (
                    self.train_data_preprocessor.retrieve_inference_outputs(
                        outputs
                    )
                )
                frame_num = int(frame_num)
                save_image(
                    save_dirpath / f"predicted_frames/{frame_num:04}_Iter{iter_num:05}.png",
                    predictions["image"],
                )
                save_numpy_array(
                    save_dirpath / f"predicted_depths/{frame_num:04}_Iter{iter_num:05}.png",
                    predictions["depth"],
                )
                save_numpy_array(
                    save_dirpath
                    / f"predicted_depths_variance/{frame_num:04}_Iter{iter_num:05}.png",
                    predictions["depth_var"],
                )

    # ------------------------------------------------------------ checkpoints

    def save_model(self, iter_num: int, save_dirpath: Path):
        checkpoints.save_checkpoint(
            save_dirpath, iter_num, self.params, self.opt_state
        )

    def load_model(self, saved_models_dirpath: Path) -> int:
        latest = checkpoints.latest_checkpoint(saved_models_dirpath)
        if latest is None:
            return 0
        iter_num, self.params, self.opt_state = checkpoints.load_checkpoint(
            latest, self.params, self.opt_state
        )
        print(f"Resuming Training from iteration {iter_num + 1}")
        return iter_num


def resolve_scene_ids(configs: Dict[str, Any], database_dirpath: Path):
    """scene_ids from scene_names/scene_nums, else all scenes in the train
    split CSV (reference entry-point behavior,
    NerfLlffTrainerTester01.py:50-58)."""
    dl = configs["data_loader"]
    for key in ("scene_ids", "scene_names", "scene_nums"):
        if dl.get(key):
            ids = list(np.unique(dl[key]))
            if key == "scene_nums":
                # The reference entry points convert scene numbers to
                # zero-padded scene ids before training, so DTU/RealEstate
                # run dirs are '00021'-style (DtuTrainerTester01.py:57,
                # RealEstateTrainerTester01.py:57).
                ids = [scene_dirname(n, "scene_num") for n in ids]
            return ids
    import pandas as pd

    set_num = dl["train_set_num"]
    csv = database_dirpath / f"train_test_sets/set{set_num:02}/TrainVideosData.csv"
    data = pd.read_csv(csv)
    if "scene_name" in data.columns:
        return list(np.unique(data["scene_name"].to_numpy()))
    return [
        scene_dirname(n, "scene_num")
        for n in np.unique(data["scene_num"].to_numpy())
    ]


def start_training(configs: Dict[str, Any]):
    """Per-scene training orchestration (reference start_training :491-533)."""
    root_dirpath = Path(configs.get("root_dirpath", "."))
    output_dirpath = root_dirpath / f"runs/training/train{configs['train_num']:04}"

    # Run-level config persistence (reference entry points call
    # Trainer.save_configs at the train{NNNN:04} level before the scene loop,
    # e.g. NerfLlffTrainerTester01.py:49). On resume the saved configs are
    # merged into the live dict, so a minimal {train_num, resume_training}
    # config (reference demo2) inherits everything else from disk — all reads
    # below MUST use the merged dict.
    output_dirpath.mkdir(parents=True, exist_ok=True)
    configs = save_configs(output_dirpath, configs)
    database_dirpath = root_dirpath / "data" / configs["database_dirpath"]

    scene_ids = resolve_scene_ids(configs, database_dirpath)
    for scene_id in scene_ids:
        init_seeds(configs.get("seed", 0))
        scene_output_dirpath = output_dirpath / f"{scene_id}"
        scene_output_dirpath.mkdir(
            parents=True, exist_ok=configs.get("resume_training", False)
        )

        configs["data_loader"]["scene_id"] = scene_id

        train_data_loader = get_data_loader(configs, database_dirpath, mode="train")
        train_data_preprocessor = get_data_preprocessor(
            configs, mode="train", raw_data_dict=train_data_loader.load_data()
        )
        val_data_loader = get_data_loader(configs, database_dirpath, mode="validation")
        val_data_preprocessor = get_data_preprocessor(
            configs,
            mode="validation",
            raw_data_dict=val_data_loader.load_data(),
            model_configs=train_data_preprocessor.get_model_configs(),
        )
        model_configs = train_data_preprocessor.get_model_configs()

        init_fn, _ = get_model(configs)
        params = init_fn(jax.random.PRNGKey(configs.get("seed", 0) or 0), configs)
        loss_computer = LossComputer(configs)

        save_model_configs(scene_output_dirpath, model_configs)

        trainer = Trainer(
            configs,
            model_configs,
            train_data_preprocessor,
            val_data_preprocessor,
            params,
            loss_computer,
            scene_output_dirpath,
        )
        try:
            trainer.train()
        finally:
            # Release the scene's jsonl handle and TensorBoard writer
            # threads — a multi-scene run must not accumulate one of each
            # per scene for the process lifetime.
            trainer.logger.close()
