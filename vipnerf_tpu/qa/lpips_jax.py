"""LPIPS (Learned Perceptual Image Patch Similarity) with an AlexNet backbone,
in JAX.

Parity target: the `lpips.LPIPS(net='alex')` model used by the reference QA
(src/qa/04_LPIPS/src/LPIPS02_NeRF_LLFF.py:32, paths relative to
/root/reference/): inputs in [-1, 1] NCHW, ImageNet-stat shift/scale, AlexNet
features at the 5 ReLU stages, channel-unit-normalized, squared diffs through
learned non-negative 1x1 "lin" weights, spatial mean, summed over stages.

Pretrained weights: this environment has no network egress, so weights must
be supplied as an .npz at $VIPNERF_LPIPS_WEIGHTS or
<repo>/data/weights/lpips_alex.npz. Convert from the torch `lpips` package
with tools/convert_lpips_weights.py on a machine that has it. Without the
file, `load_default_lpips()` returns None and the QA runner records LPIPS as
skipped (the reference hard-depends on the lpips package instead).
"""

import os
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature extractor config (torchvision alexnet.features):
# (out_channels, kernel, stride, padding) conv layers with ReLU; 'M' = maxpool
_ALEXNET_CFG = [
    ("conv", 64, 11, 4, 2),
    ("relu",),
    ("pool",),
    ("conv", 192, 5, 1, 2),
    ("relu",),
    ("pool",),
    ("conv", 384, 3, 1, 1),
    ("relu",),
    ("conv", 256, 3, 1, 1),
    ("relu",),
    ("conv", 256, 3, 1, 1),
    ("relu",),
]
# ReLU stage indices after which LPIPS taps features (5 stages)
_NUM_STAGES = 5

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv2d(x, w, b, stride, padding):
    """NCHW conv with torch-style symmetric int padding."""
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, 3, 3),
        window_strides=(1, 1, 2, 2),
        padding="VALID",
    )


def _alexnet_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
    """Run AlexNet features; return the activations after each ReLU stage."""
    feats = []
    conv_i = 0
    h = x
    pending_relu_is_stage = False
    for layer in _ALEXNET_CFG:
        if layer[0] == "conv":
            _, _, k, stride, pad = layer
            h = _conv2d(
                h, params[f"conv{conv_i}_w"], params[f"conv{conv_i}_b"], stride, pad
            )
            conv_i += 1
            pending_relu_is_stage = True
        elif layer[0] == "relu":
            h = jax.nn.relu(h)
            if pending_relu_is_stage:
                feats.append(h)
                pending_relu_is_stage = False
        elif layer[0] == "pool":
            h = _maxpool(h)
    assert len(feats) == _NUM_STAGES
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=1, keepdims=True))
    return x / (norm + eps)


class LpipsAlex:
    def __init__(self, params: Dict[str, np.ndarray]):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self._jitted = jax.jit(self._distance)

    def _distance(self, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
        """img0/img1: (1, 3, h, w) in [-1, 1]."""
        shift = jnp.asarray(_SHIFT)[None, :, None, None]
        scale = jnp.asarray(_SCALE)[None, :, None, None]
        x0 = (img0 - shift) / scale
        x1 = (img1 - shift) / scale
        f0 = _alexnet_features(self.params, x0)
        f1 = _alexnet_features(self.params, x1)
        total = 0.0
        for i in range(_NUM_STAGES):
            d = (_normalize_tensor(f0[i]) - _normalize_tensor(f1[i])) ** 2
            lin_w = self.params[f"lin{i}_w"]  # (1, C, 1, 1)
            val = jnp.sum(d * lin_w[0, :, 0, 0][None, :, None, None], axis=1)
            total = total + jnp.mean(val, axis=(1, 2))
        return total[0]

    def distance(self, gt_uint8: np.ndarray, pred_uint8: np.ndarray) -> float:
        """uint8 HWC images -> LPIPS score (reference im2tensor scaling,
        LPIPS02_NeRF_LLFF.py:45-50)."""
        def to_tensor(im):
            x = im.astype(np.float32) * 2 / 255 - 1
            return jnp.asarray(np.moveaxis(x, -1, 0)[None])

        return float(self._jitted(to_tensor(gt_uint8), to_tensor(pred_uint8)))


def default_weights_path() -> Path:
    env = os.environ.get("VIPNERF_LPIPS_WEIGHTS")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "data/weights/lpips_alex.npz"


def load_default_lpips() -> Optional[LpipsAlex]:
    path = default_weights_path()
    if not path.exists():
        return None
    data = np.load(path.as_posix())
    return LpipsAlex({k: data[k] for k in data.files})
