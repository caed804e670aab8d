"""Train the REFERENCE torch implementation (CPU, /root/reference read-only)
on the synthetic scene, to compare training DYNAMICS with the TPU framework
— beyond the forward golden-parity test (tests/test_reference_parity.py),
this checks that loss trajectories under optimization match.

Usage:
  python tools/reference_dynamics.py [iters] [raw_noise_std]        # small
  python tools/reference_dynamics.py 2500 1.0 --full_size \
      --num_rays 128 --sd_rays 128 --height 96 --width 128 --lr 5e-4

--full_size runs the flagship 8x256 MLPs (PE 10/4, 64+192 samples) into the
dead-sigma regime (BASELINE.md: our framework collapses ~iter 1.1k at noise
1.0) to measure whether the reference shares the attractor — single-core
torch needs ~5 s/step at 128+128 rays, so expect hours.
Writes per-iteration scalars to /tmp/ref_scalars.jsonl; compare against the
scalars.jsonl a matching vipnerf_tpu run produces.

Measured (1200 iters, noise 1.0, identical configs, independent RNG):
    loss              reference    vipnerf_tpu
    MSE01 (last10)      0.0114       0.0128
    SparseDepthMSE      0.529        0.404
    VisibilityLoss      0.0812       0.0735
    VisibilityPrior     0.428        0.517
    TotalLoss           0.0729       0.0611
Same ordering, same trajectory shape — dynamics parity within RNG noise.

Missing deps (deepdiff, skimage, tensorboard) and CUDA-only DataParallel are
stubbed via sys.modules shims; the reference code itself is untouched.
"""
import json
import sys
import tempfile
import time
import types
from pathlib import Path

if __name__ != "__main__":
    # The whole file is a straight-line measurement script (it starts a
    # multi-minute torch training run); importing it as a module would
    # execute that immediately. Run it directly instead.
    raise ImportError(
        "tools/reference_dynamics.py is a script, not an importable module; "
        "run `python tools/reference_dynamics.py --help`"
    )

# ---------------- shims for missing packages ----------------
import numpy as np
import imageio.v2 as imageio
import cv2

deepdiff = types.ModuleType("deepdiff")
deepdiff.DeepDiff = lambda a, b, **k: {}
sys.modules["deepdiff"] = deepdiff

skimage = types.ModuleType("skimage")
skimage_io = types.ModuleType("skimage.io")
skimage_io.imread = lambda p: np.asarray(imageio.imread(str(p)))
skimage_io.imsave = lambda p, im: imageio.imwrite(str(p), im)
skimage_tr = types.ModuleType("skimage.transform")

def _rescale(image, scale, anti_aliasing=True, multichannel=None, **k):
    h, w = image.shape[:2]
    out = cv2.resize(
        image.astype(np.float32),
        (int(round(w * scale)), int(round(h * scale))),
        interpolation=cv2.INTER_AREA if scale < 1 else cv2.INTER_LINEAR,
    )
    return out

skimage_tr.rescale = _rescale
skimage.io = skimage_io
skimage.transform = skimage_tr
sys.modules["skimage"] = skimage
sys.modules["skimage.io"] = skimage_io
sys.modules["skimage.transform"] = skimage_tr

tb_mod = types.ModuleType("torch.utils.tensorboard")

class _FakeWriter:
    out_path = "/tmp/ref_scalars.jsonl"
    def __init__(self, *a, **k):
        open(self.out_path, "w").close()
    def add_scalar(self, tag, value, step):
        with open(self.out_path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value),
                                "step": int(step)}) + "\n")
    def add_text(self, *a, **k):
        pass
    def flush(self):
        pass

tb_mod.SummaryWriter = _FakeWriter
sys.modules["torch.utils.tensorboard"] = tb_mod

# ---------------- args ----------------
import argparse

ap = argparse.ArgumentParser()
ap.add_argument("iters", nargs="?", type=int, default=1200)
ap.add_argument("noise", nargs="?", type=float, default=0.0)
ap.add_argument("--full_size", action="store_true",
                help="flagship 8x256 MLPs, PE 10/4, 64+192 samples")
ap.add_argument("--num_rays", type=int, default=None)
ap.add_argument("--sd_rays", type=int, default=None)
ap.add_argument("--height", type=int, default=32)
ap.add_argument("--width", type=int, default=40)
ap.add_argument("--lr", type=float, default=None)
ap.add_argument("--torch_threads", type=int, default=1,
                help="cap torch threads (the host has 1 core)")
ap.add_argument("--save_interval", type=int, default=None,
                help="reference model_save_interval: write real "
                     "Model_Iter*.tar checkpoints (for conversion tests)")
args = ap.parse_args()

# ---------------- build synthetic database ----------------
sys.path.insert(0, "/root/repo")
from vipnerf_tpu.data.synthetic import write_synthetic_database

root = Path(tempfile.mkdtemp(prefix="ref_dyn_"))
db_root = root / "data/databases"
write_synthetic_database(db_root, scene_name="synth01", num_frames=6,
                         train_frames=(0, 5), val_frames=(2,),
                         height=args.height, width=args.width)

# reference resolves paths relative to its own file locations: it uses
# this_filepath.parent.parent.parent / 'data' ... check Trainer01 start_training
sys.path.insert(0, "/root/reference/src")
import torch
torch.manual_seed(0)
torch.set_num_threads(args.torch_threads)


class _FakeDataParallel(torch.nn.Module):
    """CPU passthrough standing in for torch.nn.DataParallel (no CUDA here).
    Keeps the `.module` attribute contract and the single-replica
    common_data semantics (device=[0] -> one replica)."""

    def __init__(self, module, device_ids=None, **k):
        super().__init__()
        self.module = module
        self.device_ids = device_ids or []

    def forward(self, *args, **kwargs):
        return self.module(*args, **kwargs)


torch.nn.DataParallel = _FakeDataParallel

num_iters = args.iters
noise = args.noise

if args.full_size:
    mlp_kwargs = dict(
        netdepth=8, netwidth=256,
        points_positional_encoding_degree=10,
        views_positional_encoding_degree=4,
    )
    coarse_samples, fine_samples = 64, 128
    num_rays = args.num_rays or 128
    sd_rays = args.sd_rays or 128
    lr = args.lr or 5e-4
else:
    mlp_kwargs = dict(
        netdepth=6, netwidth=32,
        points_positional_encoding_degree=4,
        views_positional_encoding_degree=2,
    )
    coarse_samples, fine_samples = 16, 32
    num_rays = args.num_rays or 256
    sd_rays = args.sd_rays or 128
    lr = args.lr or 2e-3

train_configs = {
    "trainer": "ref_dynamics",
    "train_num": 1,
    "database": "NeRF_LLFF",
    "database_dirpath": "databases/NeRF_LLFF/data",
    "data_loader": {
        "data_loader_name": "NerfLlffDataLoader01",
        "data_preprocessor_name": "DataPreprocessor01",
        "train_set_num": 2,
        "scene_names": ["synth01"],
        "resolution_suffix": "",
        "recenter_camera_poses": True,
        "bd_factor": 0.75,
        "spherify": False,
        "ndc": False,
        "batching": True,
        "downsampling_factor": 1,
        "num_rays": num_rays,
        "precrop_fraction": 1,
        "precrop_iterations": -1,
        "visibility_prior": {
            "load_masks": True,
            "load_weights": False,
            "masks_dirname": "VW02",
        },
        "sparse_depth": {"dirname": "DE02", "num_rays": sd_rays},
        "scene_ids": ["synth01"],
    },
    "model": {
        "name": "VipNeRF01",
        "coarse_mlp": {
            "num_samples": coarse_samples,
            "use_view_dirs": True, "view_dependent_rgb": True,
            "predict_visibility": True,
            **mlp_kwargs,
        },
        "fine_mlp": {
            "num_samples": fine_samples,
            "use_view_dirs": True, "view_dependent_rgb": True,
            "predict_visibility": True,
            **mlp_kwargs,
        },
        "chunk": 4096, "lindisp": False, "netchunk": 16384,
        "perturb": True, "raw_noise_std": noise, "white_bkgd": False,
    },
    "losses": [
        {"name": "MSE01", "weight": 1},
        {"name": "VisibilityLoss01", "weight": 0.1},
        {"name": "SparseDepthMSE01", "weight": 0.1},
        {"name": "VisibilityPriorLoss01", "iter_weights": {"0": 0, "30": 0.001}},
    ],
    "optimizer": {
        "lr_decayer_name": "NeRFLearningRateDecayer01",
        "lr_initial": lr, "lr_decay": 250, "beta1": 0.9, "beta2": 0.999,
    },
    "resume_training": False,
    "num_iterations": num_iters,
    "validation_interval": 10 ** 9,
    "validation_chunk_size": 65536,
    "validation_save_loss_maps": False,
    "model_save_interval": args.save_interval or 10 ** 9,
    "sample_save_interval": 10 ** 9,
    "mixed_precision_training": False,
    "seed": 0,
    "device": [0],
}

import Trainer01
from utils import CommonUtils01
orig_move = CommonUtils01.move_to_device

def _move_and_downcast(tensor_data, device):
    moved = orig_move(tensor_data, device)
    def fix(x):
        if isinstance(x, torch.Tensor) and x.dtype == torch.float64:
            return x.float()
        if isinstance(x, dict):
            return {k: fix(v) for k, v in x.items()}
        if isinstance(x, list):
            return [fix(v) for v in x]
        return x
    return fix(moved)

CommonUtils01.move_to_device = _move_and_downcast

t0 = time.time()
import os
# The reference resolves everything from Path('../') relative to CWD
# (Trainer01.py:492); give it a working dir one level under our tmp root.
cwd = root / "cwd"
cwd.mkdir(exist_ok=True)
os.chdir(cwd)
# The reference writes Configs.json from its ENTRY POINTS, not from
# Trainer01.start_training (NerfLlffTrainerTester01.py:49) — mirror that so
# the run tree is complete (checkpoint conversion auto-discovers it there).
_out_dirpath = Path(f'../runs/training/train{train_configs["train_num"]:04}')
_out_dirpath.mkdir(parents=True, exist_ok=True)
Trainer01.save_configs(_out_dirpath, train_configs)
Trainer01.start_training(train_configs)
print(f"ref training {num_iters} iters: {time.time() - t0:.0f}s")
print(f"per-iteration scalars written to {_FakeWriter.out_path}")
print(f"run root: {root}")
