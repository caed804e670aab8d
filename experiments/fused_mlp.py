"""Fused ViP-NeRF MLP forward as a Pallas TPU kernel (v2).

Why a fused FORWARD only (round-3 measurements, tools/mlp_bench.py +
/tmp/pallas_probe*.py on the v5e, DCE-proof K-fold timing):

- The XLA path is HBM-roofline-bound: each (chunk, 256) @ (256, 256) layer
  has arithmetic intensity N/2 = 128 FLOP/byte against the chip's measured
  ~400-500 ratio (>=319 TFLOPS bf16 matmul, ~800 GB/s HBM), capping the
  forward at ~95 TFLOPS effective (14 ms for the 1.05M-point bench workload).
  Padding contraction dims and remat-policy changes do nothing (measured).
- A Pallas chain keeping activations in VMEM runs the same trunk at
  122-174 TFLOPS (8 layers: 8.7 ms; 32 layers: 88% of the dependent-chain
  asymptote) — bounded by a ~1.5-1.7 us/matmul dependency floor, not DMA:
  tile size (512..8192), 2/4-way interleaving and weight reuse all change
  <5%. So fused forward ~= 9 ms vs XLA 14 ms.
- A fused BACKWARD is retired: the backward's ~30 dependent matmuls at the
  same ~1.7 us floor project to ~28 ms vs XLA's measured 32 ms (whose grad
  matmuls already run at ~145 TFLOPS effective) — a marginal win that does
  not justify the VMEM pressure (the round-2 backward kernel failed Mosaic
  above TILE=512 holding the activation set). Instead the custom VJP
  recomputes the forward with XLA ops bit-equivalent to models/mlp.apply_mlp
  (bf16 path) and lets autodiff produce the gradients — the training
  backward is exactly the XLA backward.

Net: training forward 14 -> ~9 ms; inference (rendering is pure forward,
~190 TFLOP/frame) gains the full ratio.

Layout contract (one MLP, the flagship config: view-dependent rgb +
visibility, netdepth 8, skip at layer 4 — other configs fall back to the XLA
path in models/mlp.py):

  xe  (N, 64)  padded point encodings (63 real + 1 zero), bf16
  ve  (N, 32)  padded view encodings (27 real + 5 zeros), bf16
  ve2 (N, 32 * n_sec) padded secondary-view encodings, n_sec in {0, 1, 2, 3}
  out (N, 128) bf16: [0]=sigma_raw, [1:4]=rgb_raw, [4]=vis_raw,
               [5:5+n_sec]=vis2_raw, rest zero

Numerics match models/mlp.apply_mlp with bf16_matmuls=True: f32 MXU
accumulation rounded to bf16, bias added in bf16, relu in bf16 (reference
hot loop: /root/reference/src/models/VipNeRF01.py:295-329, 537-596).
Activation epilogues (sigma noise+relu, sigmoids) run outside in f32.
"""

import functools
import os as _os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PTS_IN = 64  # padded PE(pts) dim (63 real)
VIEW_IN = 32  # padded PE(views) dim (27 real)
WIDTH = 256
VWIDTH = 128  # view branch width (netwidth // 2)
SKIP_IN = PTS_IN + WIDTH  # 320
VIEW_CAT = WIDTH + VIEW_IN  # 288
HEAD_OUT = 384  # feature (256) + sigma (1) + pad
OUT_LANES = 128

TILE = int(_os.environ.get("VIPNERF_FUSED_TILE", "2048"))  # points per step


def pack_weights(params: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Pad/concat the param pytree (models/mlp.py layout) into kernel layout.

    Biases are bf16 (matching the XLA bf16 path's bias add); padded
    rows/columns are zeros so outputs are unchanged.
    """
    pl_ = params["pts_linears"]

    def pad_to(x, rows=None, cols=None):
        r = rows - x.shape[0] if rows else 0
        c = cols - x.shape[1] if cols else 0
        return jnp.pad(x, ((0, r), (0, c)))

    packed = {}
    packed["w0"] = pad_to(pl_[0]["w"], rows=PTS_IN).astype(dtype)
    packed["b0"] = pl_[0]["b"][None, :].astype(dtype)
    for i in (1, 2, 3, 4):
        packed[f"w{i}"] = pl_[i]["w"].astype(dtype)
        packed[f"b{i}"] = pl_[i]["b"][None, :].astype(dtype)
    # skip concat happens after layer index 4's relu, so layer 5 consumes
    # (enc_pts | h): pad ITS weight to 320 rows, first 64 aligned to xe
    w5 = pl_[5]["w"]  # (319, 256)
    w5_enc = pad_to(w5[: PTS_IN - 1], rows=PTS_IN)  # (64, 256), row 63 zero
    packed["w5"] = jnp.concatenate([w5_enc, w5[PTS_IN - 1 :]], axis=0).astype(dtype)
    packed["b5"] = pl_[5]["b"][None, :].astype(dtype)
    for i in (6, 7):
        packed[f"w{i}"] = pl_[i]["w"].astype(dtype)
        packed[f"b{i}"] = pl_[i]["b"][None, :].astype(dtype)

    # combined feature + sigma head: (256, 384)
    w_feat = params["feature_linear"]["w"]  # (256, 256)
    w_sig = params["pts_output_linear"]["w"]  # (256, 1)
    packed["wsf"] = pad_to(
        jnp.concatenate([w_feat, w_sig], axis=1), cols=HEAD_OUT
    ).astype(dtype)
    packed["bsf"] = jnp.pad(
        jnp.concatenate(
            [params["feature_linear"]["b"], params["pts_output_linear"]["b"]]
        ),
        (0, HEAD_OUT - WIDTH - 1),
    )[None, :].astype(dtype)

    # view branch: concat([feature(256), enc_views(27->32)])
    wv = params["views_linears"][0]["w"]  # (283, 128)
    packed["wv"] = jnp.concatenate(
        [wv[:WIDTH], pad_to(wv[WIDTH:], rows=VIEW_IN)], axis=0
    ).astype(dtype)
    packed["bv"] = params["views_linears"][0]["b"][None, :].astype(dtype)
    packed["wvo"] = pad_to(
        params["views_output_linear"]["w"], cols=OUT_LANES
    ).astype(dtype)
    packed["bvo"] = jnp.pad(
        params["views_output_linear"]["b"],
        (0, OUT_LANES - params["views_output_linear"]["b"].shape[0]),
    )[None, :].astype(dtype)
    return packed


_WEIGHT_NAMES = (
    "w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
    "w5", "b5", "w6", "b6", "w7", "b7", "wsf", "bsf", "wv", "bv",
    "wvo", "bvo",
)


def _make_fwd_kernel(n_sec: int, dtype):
    """Whole-MLP-per-tile kernel: activations never leave VMEM."""

    def kernel(xe_ref, ve_ref, ve2_ref, *refs):
        w_refs = refs[: len(_WEIGHT_NAMES)]
        out_ref = refs[len(_WEIGHT_NAMES)]
        ws = {name: r[...] for name, r in zip(_WEIGHT_NAMES, w_refs)}
        xe = xe_ref[...]

        def dense(x, w, b):
            # f32 MXU accumulation rounded to dtype, then dtype bias add —
            # bitwise-matching models/mlp._dense with bf16_matmuls=True.
            acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return acc.astype(dtype) + b

        h = jnp.maximum(dense(xe, ws["w0"], ws["b0"]), 0)
        for i in (1, 2, 3, 4):
            h = jnp.maximum(dense(h, ws[f"w{i}"], ws[f"b{i}"]), 0)
        cat = jnp.concatenate([xe, h], axis=1)  # (T, 320)
        h = jnp.maximum(dense(cat, ws["w5"], ws["b5"]), 0)
        for i in (6, 7):
            h = jnp.maximum(dense(h, ws[f"w{i}"], ws[f"b{i}"]), 0)
        sf = dense(h, ws["wsf"], ws["bsf"])  # (T, 384)
        feature = sf[:, :WIDTH]
        sigma = sf[:, WIDTH : WIDTH + 1]

        def view_branch(enc_v):
            catv = jnp.concatenate([feature, enc_v], axis=1)  # (T, 288)
            hv = jnp.maximum(dense(catv, ws["wv"], ws["bv"]), 0)
            return dense(hv, ws["wvo"], ws["bvo"])  # (T, 128)

        o = view_branch(ve_ref[...])
        cols = [sigma, o[:, 0:3], o[:, 3:4]]
        for j in range(n_sec):
            o2 = view_branch(ve2_ref[:, j * VIEW_IN : (j + 1) * VIEW_IN])
            cols.append(o2[:, 3:4])
        packed_out = jnp.concatenate(cols, axis=1)
        pad = OUT_LANES - packed_out.shape[1]
        out_ref[...] = jnp.pad(packed_out, ((0, 0), (0, pad)))

    return kernel


def _tile_spec(lanes):
    return pl.BlockSpec((TILE, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _fwd_pallas(packed, xe, ve, ve2, n_sec, dtype):
    """xe (N, 64), ve (N, 32), ve2 (N, 32*max(n_sec,1)), all `dtype`.
    N must be a multiple of TILE. Returns (N, 128) `dtype`."""
    n = xe.shape[0]
    assert n % TILE == 0, f"N={n} must be a multiple of TILE={TILE}"
    grid = (n // TILE,)
    weights = [packed[k] for k in _WEIGHT_NAMES]
    return pl.pallas_call(
        _make_fwd_kernel(n_sec, dtype),
        grid=grid,
        in_specs=[
            _tile_spec(PTS_IN),
            _tile_spec(VIEW_IN),
            _tile_spec(ve2.shape[1]),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _WEIGHT_NAMES],
        ],
        out_specs=_tile_spec(OUT_LANES),
        out_shape=jax.ShapeDtypeStruct((n, OUT_LANES), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (1918 * WIDTH + WIDTH * HEAD_OUT
                           + (1 + n_sec) * (VIEW_CAT * VWIDTH + VWIDTH * 4)),
            bytes_accessed=n * (PTS_IN + VIEW_IN * (1 + n_sec) + OUT_LANES) * 2,
            transcendentals=0,
        ),
    )(xe, ve, ve2, *weights)


def _raw_xla(params, xe, ve, ve2, n_sec, dt):
    """XLA recompute of the kernel's packed raw output, numerically
    equivalent to the kernel and to apply_mlp's path at dtype `dt`. Used as
    the custom-VJP backward (autodiff of THIS function is the training
    backward — identical to the XLA path's)."""

    def dense(x, layer, w_pad=None):
        w = layer["w"]
        if w_pad is not None:
            at, n_rows = w_pad
            w = jnp.concatenate(
                [w[:at], jnp.zeros((n_rows, w.shape[1]), w.dtype), w[at:]],
                axis=0,
            )
        y = jnp.dot(x, w.astype(dt), preferred_element_type=dt)
        return y + layer["b"].astype(dt)

    pl_ = params["pts_linears"]
    h = jnp.maximum(dense(xe, pl_[0], w_pad=(63, 1)), 0)
    for i in (1, 2, 3, 4):
        h = jnp.maximum(dense(h, pl_[i]), 0)
    cat = jnp.concatenate([xe, h], axis=1)
    h = jnp.maximum(dense(cat, pl_[5], w_pad=(63, 1)), 0)
    for i in (6, 7):
        h = jnp.maximum(dense(h, pl_[i]), 0)
    feature = dense(h, params["feature_linear"])
    sigma = dense(h, params["pts_output_linear"])  # (N, 1)

    def view_branch(enc_v):
        catv = jnp.concatenate([feature, enc_v], axis=1)
        hv = jnp.maximum(
            dense(catv, params["views_linears"][0], w_pad=(WIDTH + 27, 5)), 0
        )
        return dense(hv, params["views_output_linear"])  # (N, 4)

    o = view_branch(ve)
    cols = [sigma, o[:, 0:3], o[:, 3:4]]
    for j in range(n_sec):
        o2 = view_branch(ve2[:, j * VIEW_IN : (j + 1) * VIEW_IN])
        cols.append(o2[:, 3:4])
    packed_out = jnp.concatenate(cols, axis=1)
    return jnp.pad(
        packed_out, ((0, 0), (0, OUT_LANES - packed_out.shape[1]))
    )


@functools.lru_cache(maxsize=8)
def _make_fused_raw(n_sec: int, dtype):
    @jax.custom_vjp
    def fused_raw(params, xe, ve, ve2):
        return _fwd_pallas(pack_weights(params, dtype), xe, ve, ve2, n_sec,
                           dtype)

    def fwd(params, xe, ve, ve2):
        out = fused_raw(params, xe, ve, ve2)
        return out, (params, xe, ve, ve2)

    def bwd(res, g):
        params, xe, ve, ve2 = res
        _, vjp = jax.vjp(
            lambda p, a, b, c: _raw_xla(p, a, b, c, n_sec, dtype),
            params, xe, ve, ve2,
        )
        return vjp(g.astype(dtype))

    fused_raw.defvjp(fwd, bwd)
    return fused_raw


# --------------------------------------------------------------- integration

def supports_config(mlp_cfg: Dict[str, Any]) -> bool:
    """The kernel implements the flagship architecture; anything else falls
    back to the XLA path in models/mlp.py."""
    return (
        mlp_cfg["netdepth"] == 8
        and mlp_cfg["netwidth"] == 256
        and mlp_cfg["points_positional_encoding_degree"] == 10
        and mlp_cfg["views_positional_encoding_degree"] == 4
        and mlp_cfg["use_view_dirs"]
        and mlp_cfg["view_dependent_rgb"]
        and mlp_cfg["predict_visibility"]
    )


def backend_supported() -> bool:
    """Pallas TPU kernels only run on the TPU backend (tests use interpret
    mode explicitly)."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001 - uninitialized backend
        return False
    return platform not in ("cpu",)


def apply_fused_mlp(
    params: Dict[str, Any],
    mlp_cfg: Dict[str, Any],
    pts: jnp.ndarray,
    view_dirs: jnp.ndarray,
    view_dirs2: Optional[jnp.ndarray] = None,
    *,
    raw_noise_std: float = 0.0,
    noise_key=None,
    dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Drop-in replacement for models.mlp.apply_mlp on the flagship config.

    pts (npts, 3), view_dirs (npts, 3), view_dirs2 (npts, n_sec, 3) or None.
    Returns the same output dict (sigma, rgb, rgb_view_dependent, visibility
    [, visibility2]) with identical epilogue semantics. Differentiable: the
    backward recomputes via XLA (see module docstring).
    """
    from vipnerf_tpu.core.encoding import positional_encoding

    assert supports_config(mlp_cfg), "unsupported config for the fused kernel"
    npts = pts.shape[0]
    n_sec = view_dirs2.shape[1] if view_dirs2 is not None else 0

    enc_pts = positional_encoding(pts, 10)  # (npts, 63)
    enc_views = positional_encoding(view_dirs, 4)  # (npts, 27)
    xe = jnp.pad(enc_pts, ((0, 0), (0, PTS_IN - 63))).astype(dtype)
    ve = jnp.pad(enc_views, ((0, 0), (0, VIEW_IN - 27))).astype(dtype)
    if n_sec:
        enc2 = positional_encoding(view_dirs2.reshape(npts * n_sec, 3), 4)
        enc2 = jnp.pad(enc2, ((0, 0), (0, VIEW_IN - 27)))
        ve2 = enc2.reshape(npts, n_sec * VIEW_IN).astype(dtype)
    else:
        ve2 = jnp.zeros((npts, VIEW_IN), dtype)

    n_pad = (-npts) % TILE
    if n_pad:
        xe = jnp.pad(xe, ((0, n_pad), (0, 0)))
        ve = jnp.pad(ve, ((0, n_pad), (0, 0)))
        ve2 = jnp.pad(ve2, ((0, n_pad), (0, 0)))

    raw = _make_fused_raw(n_sec, dtype)(params, xe, ve, ve2)[:npts].astype(
        jnp.float32
    )

    sigma = raw[:, 0:1]
    if noise_key is not None and raw_noise_std > 0.0:
        sigma = sigma + raw_noise_std * jax.random.normal(
            noise_key, sigma.shape, sigma.dtype
        )
    out = {
        "sigma": jax.nn.relu(sigma),
        "rgb_view_dependent": jax.nn.sigmoid(raw[:, 1:4]),
        "visibility": jax.nn.sigmoid(raw[:, 4:5]),
    }
    out["rgb"] = out["rgb_view_dependent"]
    if n_sec:
        out["visibility2"] = jax.nn.sigmoid(raw[:, 5 : 5 + n_sec])[..., None]
    return out
