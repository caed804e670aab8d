"""Demo config builders mirroring the reference entry-point config dicts.

The values replicate the shipped demo configs (e.g.
src/NerfLlffTrainerTester01.py:233-345, paths relative to /root/reference/):
2048+2048 rays, 64+128 samples, 8x256 MLPs with PE 10/4, Adam(5e-4,
decay 250), the full ViP-NeRF loss stack with the visibility prior enabled
from iteration 30k.

Framework-specific additions (not in the reference schema):
- scan_steps: train iterations per host dispatch (TPU step batching)
- model.bf16_matmuls / model.remat: precision/memory knobs
Checkpoints use the .ckpt extension (the reference's .tar is a torch format).
"""

import copy
from typing import Any, Dict, List, Optional


def mlp_config(num_samples: int) -> Dict[str, Any]:
    return {
        "num_samples": num_samples,
        "netdepth": 8,
        "netwidth": 256,
        "points_positional_encoding_degree": 10,
        "views_positional_encoding_degree": 4,
        "use_view_dirs": True,
        "view_dependent_rgb": True,
        "predict_visibility": True,
    }


def build_train_configs(
    *,
    entry_name: str,
    train_num: int,
    database: str,
    database_dirpath: str,
    data_loader_name: str,
    scene_key: str,
    scene_ids: List,
    set_num: int,
    ndc: bool,
    recenter_camera_poses: bool,
    bd_factor: Optional[float],
    num_iterations: int,
    resolution_suffix: Optional[str] = None,
    num_rays: int = 2048,
    sparse_depth: bool = True,
    sparse_depth_rays: int = 2048,
    visibility_prior_start_iter: int = 30000,
    validation_interval: int = 10000,
    model_save_interval: int = 10000,
    seed: int = 0,
    device: Optional[List[int]] = None,
    scan_steps: int = 100,
    # Shipping precision mode (BASELINE.md round-3): bf16 trunk + f32 heads
    # is 1.42x faster than f32 storage and converged the demo1a-shaped 50k
    # protocol run to PSNR 24.02 / SSIM 0.964 (tools/protocol_run.py, which
    # uses the same default). The reference's `mixed_precision_training`
    # key is declared but never read (SURVEY §2.1); here it reflects the
    # real knob. Pass bf16_matmuls=False for f32 storage.
    bf16_matmuls: bool = True,
) -> Dict[str, Any]:
    masks_dirname = f"VW{set_num:02}"
    data_loader: Dict[str, Any] = {
        "data_loader_name": data_loader_name,
        "data_preprocessor_name": "DataPreprocessor01",
        "train_set_num": set_num,
        scene_key: list(scene_ids),
        "recenter_camera_poses": recenter_camera_poses,
        "bd_factor": bd_factor,
        "spherify": False,
        "ndc": ndc,
        "batching": True,
        "downsampling_factor": 1,
        "num_rays": num_rays,
        "precrop_fraction": 1,
        "precrop_iterations": -1,
        "visibility_prior": {
            "load_masks": True,
            "load_weights": False,
            "masks_dirname": masks_dirname,
        },
    }
    if resolution_suffix is not None:
        data_loader["resolution_suffix"] = resolution_suffix
    if sparse_depth:
        data_loader["sparse_depth"] = {
            "dirname": f"DE{set_num:02}",
            "num_rays": sparse_depth_rays,
        }

    losses = [
        {"name": "MSE01", "weight": 1},
        {"name": "VisibilityLoss01", "weight": 0.1},
        {
            "name": "VisibilityPriorLoss01",
            "iter_weights": {"0": 0, str(visibility_prior_start_iter): 0.001},
        },
    ]
    if sparse_depth:
        losses.append({"name": "SparseDepthMSE01", "weight": 0.1})

    return {
        "trainer": f"{entry_name}/VipNerfTpuTrainer",
        "train_num": train_num,
        "database": database,
        "database_dirpath": database_dirpath,
        "data_loader": data_loader,
        "model": {
            "name": "VipNeRF01",
            "coarse_mlp": mlp_config(64),
            "fine_mlp": mlp_config(128),
            "chunk": 4 * 1024,
            "lindisp": False,
            "netchunk": 16 * 1024,
            "perturb": True,
            "raw_noise_std": 1.0,
            "white_bkgd": False,
            "bf16_matmuls": bf16_matmuls,
            # stability default (BASELINE.md round-3 precision study):
            # pure-bf16 activation noise can drive the dead-sigma collapse;
            # f32 heads rescue it at a measured 1.9% step cost (72.0k vs
            # 73.4k rays/s) with f32-grade convergence (PSNR 19.0 at the
            # matched probe config)
            "f32_heads": bf16_matmuls,
            # full rematerialization of the MLP backward: measured FASTER on
            # v5e (recomputing the cheap-PE forward beats writing ~10
            # activation tensors to HBM; 60 vs 77 ms/step, BASELINE.md
            # round-2) and the setting every protocol-scale run (round-3
            # 50k x2, round-4 200k/DTU) and bench.py ship with
            "remat": True,
            # measured optimum on TPU v5e (see bench.py): bounds live
            # activation memory per on-device map iteration
            "netchunk_map": 16384,
            # inference/validation point-chunk: REQUIRED on the axon TPU
            # backend — an unchunked 64k-ray validation tile is a ~12.6M
            # point fused MLP body, which hits the backend's pathological
            # compile / Mosaic regalloc failure (round-1 finding; re-hit in
            # the round-3 protocol run when this default was missing)
            "netchunk_map_infer": 262144,
        },
        "losses": losses,
        "optimizer": {
            "lr_decayer_name": "NeRFLearningRateDecayer01",
            "lr_initial": 5e-4,
            "lr_decay": 250,
            "beta1": 0.9,
            "beta2": 0.999,
        },
        "resume_training": True,
        "num_iterations": num_iterations,
        "scan_steps": scan_steps,
        "validation_interval": validation_interval,
        # reference default is 64k (Trainer01.py validation chunking); on the
        # axon TPU backend smaller tiles BOTH render faster (measured: 8-16k
        # tiles pipeline better post sample_pdf rewrite, see bench.py) AND
        # keep each with-losses tile program small enough to dodge the
        # backend's pathological-compile mode (a 64k-ray retraw+losses tile
        # hung XLA compilation >40 min in the round-3 protocol run)
        "validation_chunk_size": 16384,
        "validation_save_loss_maps": False,
        "model_save_interval": model_save_interval,
        "mixed_precision_training": bf16_matmuls,
        "seed": seed,
        # "all" = every local device (reference demo1a pins its 2 CUDA
        # ids, src/NerfLlffTrainerTester01.py:329; on TPU the whole mesh
        # is the DataParallel equivalent). Pass an index list to pin.
        "device": device or "all",
    }


def build_test_configs(
    *,
    entry_name: str,
    test_num: int,
    train_num: int,
    set_num: int,
    database: str,
    database_dirpath: str,
    num_iterations: int,
    scene_key: str,
    scene_ids: List,
    resolution_suffix: Optional[str] = None,
    device: Optional[List[int]] = None,
) -> Dict[str, Any]:
    cfg = {
        "tester": f"{entry_name}/VipNerfTpuTester",
        "test_num": test_num,
        "test_set_num": set_num,
        "train_num": train_num,
        "model_name": f"Model_Iter{num_iterations:06}.ckpt",
        "database_name": database,
        "database_dirpath": database_dirpath,
        scene_key: list(scene_ids),
        # "all" = every local device (reference demo1a pins its 2 CUDA
        # ids, src/NerfLlffTrainerTester01.py:329; on TPU the whole mesh
        # is the DataParallel equivalent). Pass an index list to pin.
        "device": device or "all",
    }
    if resolution_suffix is not None:
        cfg["resolution_suffix"] = resolution_suffix
    return cfg


def clone(cfg: Dict[str, Any], **overrides) -> Dict[str, Any]:
    out = copy.deepcopy(cfg)
    out.update(overrides)
    return out
