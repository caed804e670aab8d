"""LPIPS(AlexNet) architecture validation against torch.

The environment has no network egress, so pretrained LPIPS weights cannot be
fetched; what CAN be validated end to end is that the JAX implementation in
vipnerf_tpu.qa.lpips_jax computes exactly the same function as the torch
LPIPS-alex computation (reference usage:
/root/reference/src/qa/04_LPIPS/src/LPIPS02_NeRF_LLFF.py:32-50) for ANY
weights. These tests build random weights in the torch `lpips` state-dict
layout, run a torch reimplementation of the published LPIPS forward pass, and
require the JAX path (through the same .npz key naming that
tools/convert_lpips_weights.py emits) to agree to float32 precision.
With correct converted pretrained weights the outputs are therefore identical
to the reference metric.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


# AlexNet-features conv layout: (out_ch, in_ch, kernel, stride, pad), with
# maxpool(3, stride 2) after convs 0 and 1 (torchvision alexnet.features).
_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _random_params(seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    for i, (out_ch, in_ch, k, _, _) in enumerate(_CONVS):
        params[f"conv{i}_w"] = rng.normal(
            0, 0.1, size=(out_ch, in_ch, k, k)
        ).astype(np.float32)
        params[f"conv{i}_b"] = rng.normal(0, 0.1, size=(out_ch,)).astype(
            np.float32
        )
    for i, ch in enumerate([64, 192, 384, 256, 256]):
        # lpips lin layers are 1x1 convs with non-negative weights
        params[f"lin{i}_w"] = np.abs(
            rng.normal(0, 0.1, size=(1, ch, 1, 1))
        ).astype(np.float32)
    return params


def _torch_alexnet_feats(params, x):
    feats = []
    h = x
    for i, (_, _, _, stride, pad) in enumerate(_CONVS):
        w = torch.from_numpy(params[f"conv{i}_w"])
        b = torch.from_numpy(params[f"conv{i}_b"])
        h = torch.nn.functional.conv2d(h, w, b, stride=stride, padding=pad)
        h = torch.relu(h)
        feats.append(h)
        if i in (0, 1):
            h = torch.nn.functional.max_pool2d(h, 3, stride=2)
    return feats


def _torch_lpips(params, im0, im1):
    """The published LPIPS forward: scale inputs, AlexNet relu-stage features,
    channel-unit-normalize, squared diff, 1x1 lin conv, spatial mean, sum."""
    x0 = (im0 - _SHIFT) / _SCALE
    x1 = (im1 - _SHIFT) / _SCALE
    f0 = _torch_alexnet_feats(params, x0)
    f1 = _torch_alexnet_feats(params, x1)
    total = torch.zeros(())
    for i in range(5):
        n0 = f0[i] / (f0[i].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        n1 = f1[i] / (f1[i].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (n0 - n1) ** 2
        lin = torch.from_numpy(params[f"lin{i}_w"])
        val = torch.nn.functional.conv2d(d, lin)
        total = total + val.mean(dim=(2, 3)).squeeze()
    return float(total)


class TestLpipsArchitecture:
    def test_jax_matches_torch_random_weights(self):
        from vipnerf_tpu.qa.lpips_jax import LpipsAlex

        params = _random_params(seed=0)
        rng = np.random.default_rng(1)
        gt = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
        pred = np.clip(
            gt.astype(np.int32) + rng.integers(-30, 30, gt.shape), 0, 255
        ).astype(np.uint8)

        model = LpipsAlex(params)
        jax_score = model.distance(gt, pred)

        def to_tensor(im):
            x = im.astype(np.float32) * 2 / 255 - 1
            return torch.from_numpy(np.moveaxis(x, -1, 0)[None])

        torch_score = _torch_lpips(params, to_tensor(gt), to_tensor(pred))
        assert np.isfinite(jax_score)
        assert abs(jax_score - torch_score) < 1e-5 * max(1.0, abs(torch_score))

    def test_identical_images_zero(self):
        from vipnerf_tpu.qa.lpips_jax import LpipsAlex

        params = _random_params(seed=2)
        model = LpipsAlex(params)
        img = np.random.default_rng(3).integers(
            0, 256, size=(48, 48, 3), dtype=np.uint8
        )
        assert model.distance(img, img) == pytest.approx(0.0, abs=1e-7)

    def test_npz_roundtrip_and_loader(self, tmp_path, monkeypatch):
        """The exact npz produced by the converter's key naming loads through
        load_default_lpips and scores."""
        from vipnerf_tpu.qa import lpips_jax

        params = _random_params(seed=4)
        path = tmp_path / "lpips_alex.npz"
        np.savez(path, **params)
        monkeypatch.setenv("VIPNERF_LPIPS_WEIGHTS", str(path))
        model = lpips_jax.load_default_lpips()
        assert model is not None
        rng = np.random.default_rng(5)
        a = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        b = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        assert np.isfinite(model.distance(a, b))

    def test_qa_scores_explicit_null_when_unavailable(self, tmp_path):
        """QA runner records LPIPS as explicit null (not absence) in
        QA_Scores.json when weights are missing."""
        import json

        from vipnerf_tpu.qa.runner import start_qa

        # minimal database + predictions with one frame
        db = tmp_path / "db"
        scene = db / "all/database_data/scn01/rgb"
        scene.mkdir(parents=True)
        pred_dir = tmp_path / "preds/scn01/predicted_frames"
        pred_dir.mkdir(parents=True)
        img = np.random.default_rng(0).integers(
            0, 256, size=(16, 16, 3), dtype=np.uint8
        )
        from vipnerf_tpu.utils.io import save_image

        save_image(scene / "0000.png", img)
        save_image(pred_dir / "0000.png", img)
        frames_csv = tmp_path / "frames.csv"
        frames_csv.write_text("scene_name,pred_frame_num\nscn01,0\n")

        result = start_qa(
            "LPIPS",
            lambda gt, pred: None,  # unavailable metric
            "NeRF_LLFF",
            tmp_path / "preds",
            db,
            frames_csv,
        )
        assert result is None
        scores = json.loads((tmp_path / "preds/QA_Scores.json").read_text())
        assert "LPIPS02" in scores["predicted_frames"]
        assert scores["predicted_frames"]["LPIPS02"] is None
