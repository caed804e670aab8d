"""Image quality metrics.

Parity targets (paths relative to /root/reference/):
- RMSE: sqrt(mean((gt - pred)^2)) on uint8-as-float
  (src/qa/01_RMSE/src/RMSE02_NeRF_LLFF.py:33-38)
- PSNR: 10*log10(255^2 / mse) (src/qa/02_PSNR/src/PSNR02_NeRF_LLFF.py:32-39)
- SSIM: skimage structural_similarity(multichannel, gaussian_weights=True,
  sigma=1.5, use_sample_covariance=False)
  (src/qa/03_SSIM/src/SSIM02_NeRF_LLFF.py:34-39) — skimage isn't in this
  environment, so the exact algorithm is reimplemented here (11x11 gaussian
  window, truncate 3.5, border crop, population covariance).
- Masked RMSE/PSNR/SSIM/LPIPS (DTU object masks):
  src/qa/05_MaskedRMSE/src/MaskedRMSE05_DTU.py:33-40 etc.
- LPIPS(AlexNet): src/qa/04_LPIPS/src/LPIPS02_NeRF_LLFF.py:27-50, inputs
  scaled to [-1, 1] CHW. Reimplemented in JAX in
  vipnerf_tpu.qa.lpips_jax (pretrained weights required — see that module).
"""

from typing import Optional

import numpy as np
from scipy.ndimage import gaussian_filter


def compute_rmse(
    gt: np.ndarray, pred: np.ndarray, mask: Optional[np.ndarray] = None
) -> float:
    error = gt.astype(np.float64) - pred.astype(np.float64)
    if mask is None:
        return float(np.sqrt(np.mean(np.square(error))))
    mask3 = np.stack([mask] * 3, axis=2).astype(np.float64)
    return float(np.sqrt(np.sum(np.square(mask3 * error)) / np.sum(mask3)))


def compute_psnr(
    gt: np.ndarray, pred: np.ndarray, mask: Optional[np.ndarray] = None
) -> float:
    error = gt.astype(np.float64) - pred.astype(np.float64)
    if mask is None:
        mse = np.mean(np.square(error))
    else:
        # Masked PSNR: 10*log10(255^2 / (sum(mask*err^2)/sum(mask)))
        # (MaskedPSNR05_DTU.py:33-40)
        mask3 = np.stack([mask] * 3, axis=2).astype(np.float64)
        mse = np.sum(mask3 * np.square(error)) / np.sum(mask3)
    return float(10 * np.log10(255 ** 2 / mse))


def _ssim_single_channel(
    im1: np.ndarray, im2: np.ndarray, data_range: float, sigma: float = 1.5
) -> np.ndarray:
    """SSIM map for one channel, skimage-equivalent (gaussian_weights=True,
    use_sample_covariance=False). Returns the full S map; caller crops."""
    truncate = 3.5
    filt = lambda im: gaussian_filter(im, sigma=sigma, truncate=truncate)

    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ux = filt(im1)
    uy = filt(im2)
    uxx = filt(im1 * im1)
    uyy = filt(im2 * im2)
    uxy = filt(im1 * im2)
    vx = uxx - ux * ux  # population covariance (use_sample_covariance=False)
    vy = uyy - uy * uy
    vxy = uxy - ux * uy

    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux ** 2 + uy ** 2 + c1
    b2 = vx + vy + c2
    return (a1 * a2) / (b1 * b2)


def compute_ssim(
    gt: np.ndarray,
    pred: np.ndarray,
    mask: Optional[np.ndarray] = None,
    data_range: float = 255.0,
    sigma: float = 1.5,
) -> float:
    """Multichannel SSIM; with `mask`, the masked-weighted mean over the SSIM
    map (MaskedSSIM05_DTU semantics)."""
    truncate = 3.5
    r = int(truncate * sigma + 0.5)  # skimage window radius: 5
    pad = r  # crop that many pixels from each border

    if gt.ndim == 2:
        gt = gt[..., None]
        pred = pred[..., None]
    maps = np.stack(
        [
            _ssim_single_channel(gt[..., c], pred[..., c], data_range, sigma)
            for c in range(gt.shape[-1])
        ],
        axis=-1,
    )
    cropped = maps[pad:-pad, pad:-pad]
    if mask is None:
        return float(cropped.mean())
    m = mask[pad:-pad, pad:-pad].astype(np.float64)
    m3 = np.stack([m] * cropped.shape[-1], axis=2)
    return float(np.sum(m3 * cropped) / np.sum(m3))


class LpipsMetric:
    """LPIPS(AlexNet) wrapper; None-scores when pretrained weights are
    unavailable (no network egress in this environment)."""

    def __init__(self):
        from vipnerf_tpu.qa.lpips_jax import load_default_lpips

        self.model = load_default_lpips()  # None if weights missing

    @property
    def available(self) -> bool:
        return self.model is not None

    def __call__(
        self, gt: np.ndarray, pred: np.ndarray, mask: Optional[np.ndarray] = None
    ) -> Optional[float]:
        if self.model is None:
            return None
        if mask is not None:
            # Masked LPIPS multiplies both images by the mask
            # (MaskedLPIPS05_DTU.py:37-44).
            m = mask.astype(gt.dtype)[..., None]
            gt = (gt * m).astype(gt.dtype)
            pred = (pred * m).astype(pred.dtype)
        return float(self.model.distance(gt, pred))
