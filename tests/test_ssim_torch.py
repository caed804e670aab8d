"""SSIM cross-validation against an independent torch implementation.

The reference scores SSIM via skimage.metrics.structural_similarity with
multichannel=True, gaussian_weights=True, sigma=1.5,
use_sample_covariance=False on uint8 frames
(/root/reference/src/qa/03_SSIM/src/SSIM02_NeRF_LLFF.py:34-39), and the DTU
masked variant weights the SSIM map by the object mask
(/root/reference/src/qa/07_MaskedSSIM/src/MaskedSSIM05_DTU.py). skimage is
absent from this environment, so vipnerf_tpu.qa.metrics reimplements the
algorithm with scipy filters; until now its regression test locked in its own
output. This module derives the published algorithm A SECOND TIME, from
scratch, in torch — its own gaussian kernel construction, its own symmetric
("reflect" in scipy terms) boundary handling via index_select, separable
depthwise convolutions, population covariance, the Wang et al. constants, the
skimage border crop — and requires the two implementations to agree to 1e-9
on random and structured uint8 image pairs, exactly the cross-validation
treatment LPIPS received (tests/test_lpips.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vipnerf_tpu.qa.metrics import compute_ssim  # noqa: E402


def _gaussian_kernel(sigma: float, truncate: float):
    """scipy.ndimage._gaussian_kernel1d for order 0: exp(-x^2/(2s^2)),
    radius int(truncate*sigma + 0.5), normalized to sum 1."""
    r = int(truncate * sigma + 0.5)
    x = np.arange(-r, r + 1, dtype=np.float64)
    phi = np.exp(-0.5 * x * x / (sigma * sigma))
    return phi / phi.sum(), r


def _pad_symmetric(t: torch.Tensor, dim: int, r: int) -> torch.Tensor:
    """scipy mode='reflect' == numpy 'symmetric': (d c b a | a b c d | d c b a)
    — the edge sample IS duplicated (torch's own 'reflect' pad is scipy's
    'mirror' and would NOT match)."""
    n = t.shape[dim]
    front = t.index_select(dim, torch.arange(r - 1, -1, -1))
    back = t.index_select(dim, torch.arange(n - 1, n - r - 1, -1))
    return torch.cat([front, t, back], dim)


def _gaussian_filter_torch(img: torch.Tensor, kernel: np.ndarray, r: int):
    """Separable gaussian correlation with symmetric boundaries, float64."""
    k = torch.from_numpy(kernel)
    t = _pad_symmetric(img, 0, r)
    t = _pad_symmetric(t, 1, r)
    t4 = t[None, None]
    t4 = torch.nn.functional.conv2d(t4, k.view(1, 1, -1, 1))
    t4 = torch.nn.functional.conv2d(t4, k.view(1, 1, 1, -1))
    return t4[0, 0]


def torch_ssim(
    gt: np.ndarray,
    pred: np.ndarray,
    mask: np.ndarray = None,
    data_range: float = 255.0,
    sigma: float = 1.5,
) -> float:
    """Independent SSIM: Wang et al. 2004 with skimage's parameterization
    (gaussian_weights=True, truncate=3.5 -> 11-tap window, sigma=1.5,
    use_sample_covariance=False -> population covariance, crop the filter
    radius from every border, mean over channels)."""
    truncate = 3.5
    kernel, r = _gaussian_kernel(sigma, truncate)
    if gt.ndim == 2:
        gt = gt[..., None]
        pred = pred[..., None]
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    maps = []
    for c in range(gt.shape[-1]):
        x = torch.from_numpy(gt[..., c].astype(np.float64))
        y = torch.from_numpy(pred[..., c].astype(np.float64))
        filt = lambda im: _gaussian_filter_torch(im, kernel, r)  # noqa: E731
        ux, uy = filt(x), filt(y)
        vx = filt(x * x) - ux * ux
        vy = filt(y * y) - uy * uy
        vxy = filt(x * y) - ux * uy
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
            (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)
        )
        maps.append(s[r:-r, r:-r])
    smap = torch.stack(maps, dim=-1)
    if mask is None:
        return float(smap.mean())
    m = torch.from_numpy(mask.astype(np.float64))[r:-r, r:-r]
    m3 = m[..., None].expand_as(smap)
    return float((m3 * smap).sum() / m3.sum())


def _image_pairs():
    """Random and structured uint8 pairs covering the metric's range."""
    rng = np.random.default_rng(7)
    h, w = 48, 64
    pairs = []
    # pure noise vs independent noise (low SSIM)
    a = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    b = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    pairs.append(("noise_vs_noise", a, b))
    # structured gradient vs noisy copy (high SSIM) — render-like content
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            127 + 80 * np.sin(xx / 7.0),
            127 + 80 * np.cos(yy / 9.0),
            (xx + yy) * 255.0 / (h + w),
        ],
        axis=-1,
    )
    noisy = np.clip(base + rng.normal(0, 12, base.shape), 0, 255)
    pairs.append(("gradient_vs_noisy", base.round(), noisy.round()))
    # identical images (SSIM == 1)
    pairs.append(("identical", base.round(), base.round().copy()))
    # shifted content (structural change)
    pairs.append(("shifted", base.round(), np.roll(base.round(), 3, axis=1)))
    return pairs


class TestSsimCrossValidation:
    @pytest.mark.parametrize(
        "name,gt,pred", _image_pairs(), ids=[p[0] for p in _image_pairs()]
    )
    def test_matches_independent_torch(self, name, gt, pred):
        ours = compute_ssim(gt, pred)
        theirs = torch_ssim(gt, pred)
        assert ours == pytest.approx(theirs, abs=1e-9), name
        if name == "identical":
            assert ours == pytest.approx(1.0, abs=1e-12)

    def test_masked_matches_independent_torch(self):
        """MaskedSSIM05_DTU semantics: mask-weighted mean of the SSIM map."""
        rng = np.random.default_rng(11)
        pairs = _image_pairs()
        _, gt, pred = pairs[1]
        mask = (rng.uniform(size=gt.shape[:2]) > 0.4).astype(np.float64)
        ours = compute_ssim(gt, pred, mask=mask)
        theirs = torch_ssim(gt, pred, mask=mask)
        assert ours == pytest.approx(theirs, abs=1e-9)
        # and the mask genuinely changes the score on this pair
        assert ours != pytest.approx(compute_ssim(gt, pred), abs=1e-6)

    def test_grayscale_path(self):
        rng = np.random.default_rng(3)
        gt = rng.integers(0, 256, (40, 52)).astype(np.float64)
        pred = np.clip(gt + rng.normal(0, 20, gt.shape), 0, 255).round()
        assert compute_ssim(gt, pred) == pytest.approx(
            torch_ssim(gt, pred), abs=1e-9
        )

    def test_float01_data_range(self):
        """sigma/data_range parameters flow through both implementations."""
        rng = np.random.default_rng(5)
        gt = rng.uniform(size=(40, 52, 3))
        pred = np.clip(gt + rng.normal(0, 0.1, gt.shape), 0, 1)
        assert compute_ssim(gt, pred, data_range=1.0) == pytest.approx(
            torch_ssim(gt, pred, data_range=1.0), abs=1e-9
        )
