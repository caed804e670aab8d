"""Fused ViP-NeRF MLP as Pallas TPU kernels (forward + custom-VJP backward).

STATUS (round 2, measured with DCE-proof K-fold timing on the v5e): the XLA
path in models/mlp.py runs the same 1M-point workload at 14.7 ms forward /
53 ms forward+backward (~45% MXU on the forward), while this kernel measures
26.8 ms forward at TILE=2048 and the backward kernel fails Mosaic compilation
above TILE=512 (VMEM pressure from the resident activation set). The kernel
therefore stays OPT-IN (`use_fused_kernel`) and is NOT on the production
path; the numerics are parity-tested (tests/test_fused_mlp.py) and the
structure is kept as the starting point for a pipelined rewrite (the gap is
per-tile serialization of the many small matmuls, not numerics).

The hot loop of training (SURVEY.md §3.1) is ~1M point evaluations per step
through the 8x256 trunk + heads. This kernel:

- pads the contraction dims to 64 / 320 / 288 once at weight-packing time,
- keeps the entire per-tile computation (8 trunk layers + skip concat +
  sigma/feature head + primary and secondary view branches) in VMEM,
- computes in bfloat16 with f32 MXU accumulation,
- implements the backward pass as a second kernel that recomputes the
  forward per tile (remat) and accumulates weight gradients across the
  sequential TPU grid — activations never round-trip to HBM.

Layout contract (one MLP, the flagship config: view-dependent rgb +
visibility, netdepth 8, skip at layer 4 — other configs fall back to the XLA
path in models/mlp.py):

  xe  (N, 64)  padded point encodings (63 real + 1 zero)
  ve  (N, 32)  padded view encodings (27 real + 5 zeros)
  ve2 (N, 32 * n_sec) padded secondary-view encodings, n_sec in {0, 1, 2, 3}
  out (N, 128): [0]=sigma_raw, [1:4]=rgb_raw, [4]=vis_raw,
                [5:5+n_sec]=vis2_raw, rest zero

Activation epilogues (sigma noise+relu, sigmoids) and the positional
encodings stay outside the kernel so semantics match models/mlp.apply_mlp
bit-for-bit modulo bf16 rounding.
"""

import functools
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

import os as _os
TILE = int(_os.environ.get("VIPNERF_FUSED_TILE", "1024"))  # points per grid step


def pack_weights(params: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Pad/concat the param pytree (models/mlp.py layout) into kernel layout.

    Runs inside the jitted step (pure jnp ops over ~1.2M params, negligible).
    """
    pl_ = params["pts_linears"]
    f32 = jnp.float32

    def pad_to(x, rows=None, cols=None):
        r = rows - x.shape[0] if rows else 0
        c = cols - x.shape[1] if cols else 0
        return jnp.pad(x, ((0, r), (0, c)))

    packed = {}
    packed["w0"] = pad_to(pl_[0]["w"], rows=PTS_IN).astype(dtype)
    packed["b0"] = pl_[0]["b"][None, :].astype(f32)
    for i in (1, 2, 3):
        packed[f"w{i}"] = pl_[i]["w"].astype(dtype)
        packed[f"b{i}"] = pl_[i]["b"][None, :].astype(f32)
    # layer 4 input is concat([enc_pts(63), h(256)]) in apply_mlp order;
    # padded here to [enc_pts(64) | h(256)] = 320 rows
    packed["w4"] = pl_[4]["w"].astype(dtype)  # (256, 256)
    packed["b4"] = pl_[4]["b"][None, :].astype(f32)
    # NOTE: in apply_mlp the skip concat happens after layer index 4's relu,
    # so layer 5 consumes (enc_pts | h): pad ITS weight to 320 rows with the
    # first 63 rows aligned to the padded 64-lane encodings.
    w5 = pl_[5]["w"]  # (319, 256)
    w5_enc = pad_to(w5[:PTS_IN - 1], rows=PTS_IN)  # (64, 256), row 63 zero
    packed["w5"] = jnp.concatenate([w5_enc, w5[PTS_IN - 1:]], axis=0).astype(dtype)
    packed["b5"] = pl_[5]["b"][None, :].astype(f32)
    for i in (6, 7):
        packed[f"w{i}"] = pl_[i]["w"].astype(dtype)
        packed[f"b{i}"] = pl_[i]["b"][None, :].astype(f32)

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
    )[None, :].astype(f32)

    # view branch: apply_mlp feeds concat([feature(256), enc_views(27)]), so
    # rows 0:256 of wv are the feature block and 256:283 the view block;
    # pad the view block to 32 rows -> (288, 128)
    wv = params["views_linears"][0]["w"]  # (256 + 27, 128)
    packed["wv"] = jnp.concatenate(
        [wv[:WIDTH], pad_to(wv[WIDTH:], rows=VIEW_IN)], axis=0
    ).astype(dtype)
    packed["bv"] = params["views_linears"][0]["b"][None, :].astype(f32)
    packed["wvo"] = pad_to(
        params["views_output_linear"]["w"], cols=OUT_LANES
    ).astype(dtype)
    packed["bvo"] = jnp.pad(
        params["views_output_linear"]["b"],
        (0, OUT_LANES - params["views_output_linear"]["b"].shape[0]),
    )[None, :].astype(f32)
    return packed


_WEIGHT_NAMES = (
    "w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
    "w5", "b5", "w6", "b6", "w7", "b7", "wsf", "bsf", "wv", "bv",
    "wvo", "bvo",
)


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t_a(a, b):
    """a^T @ b without materializing the transpose: contract over rows."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_t_b(a, b):
    """a @ b^T without materializing the transpose: contract over cols."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _trunk(xe, ws, dtype):
    """Shared trunk computation; returns all post-relu activations + sf."""
    hs = []
    h = jnp.maximum(_dot(xe, ws["w0"]) + ws["b0"], 0.0).astype(dtype)
    hs.append(h)
    for i in (1, 2, 3, 4):
        h = jnp.maximum(_dot(h, ws[f"w{i}"]) + ws[f"b{i}"], 0.0).astype(dtype)
        hs.append(h)
    # skip concat after layer 4: [xe | h]
    cat = jnp.concatenate([xe, h], axis=1)
    h = jnp.maximum(_dot(cat, ws["w5"]) + ws["b5"], 0.0).astype(dtype)
    hs.append(h)
    for i in (6, 7):
        h = jnp.maximum(_dot(h, ws[f"w{i}"]) + ws[f"b{i}"], 0.0).astype(dtype)
        hs.append(h)
    sf = _dot(h, ws["wsf"]) + ws["bsf"]  # (T, 384) f32
    return hs, cat, sf


def _make_fwd_kernel(n_sec: int):
    def kernel(xe_ref, ve_ref, ve2_ref, *refs):
        w_refs = refs[: len(_WEIGHT_NAMES)]
        out_ref = refs[len(_WEIGHT_NAMES)]
        ws = {name: r[...] for name, r in zip(_WEIGHT_NAMES, w_refs)}
        dtype = ws["w0"].dtype
        xe = xe_ref[...].astype(dtype)

        _, _, sf = _trunk(xe, ws, dtype)
        feature = sf[:, :WIDTH].astype(dtype)
        sigma = sf[:, WIDTH : WIDTH + 1]

        def view_branch(enc_v):
            catv = jnp.concatenate([feature, enc_v], axis=1)
            hv = jnp.maximum(_dot(catv, ws["wv"]) + ws["bv"], 0.0).astype(dtype)
            return _dot(hv, ws["wvo"]) + ws["bvo"]  # (T, 128) f32

        o = view_branch(ve_ref[...].astype(dtype))
        cols = [sigma, o[:, 0:3], o[:, 3:4]]
        for j in range(n_sec):
            enc2 = ve2_ref[:, j * VIEW_IN : (j + 1) * VIEW_IN].astype(dtype)
            o2 = view_branch(enc2)
            cols.append(o2[:, 3:4])
        packed_out = jnp.concatenate(cols, axis=1)
        pad = OUT_LANES - packed_out.shape[1]
        out_ref[...] = jnp.pad(packed_out, ((0, 0), (0, pad)))

    return kernel


def _make_bwd_kernel(n_sec: int):
    """Recompute-forward backward kernel: emits dxe/dve/dve2 per tile and
    accumulates weight grads across the (sequential) grid."""

    def kernel(xe_ref, ve_ref, ve2_ref, dout_ref, *refs):
        w_refs = refs[: len(_WEIGHT_NAMES)]
        out_refs = refs[len(_WEIGHT_NAMES) :]
        (dxe_ref, dve_ref, dve2_ref), dw_refs = out_refs[:3], out_refs[3:]
        ws = {name: r[...] for name, r in zip(_WEIGHT_NAMES, w_refs)}
        dtype = ws["w0"].dtype
        xe = xe_ref[...].astype(dtype)
        ve = ve_ref[...].astype(dtype)
        dout = dout_ref[...]

        # ---- recompute forward, keeping activations
        hs, cat, sf = _trunk(xe, ws, dtype)
        feature = sf[:, :WIDTH].astype(dtype)

        dws = {name: None for name in _WEIGHT_NAMES}

        def accum(name, val):
            dws[name] = val if dws[name] is None else dws[name] + val

        dfeature = jnp.zeros(feature.shape, jnp.float32)

        def view_branch_bwd(enc_v, d_o):
            """d_o: (T, 128) f32 grad wrt view-branch output (pre-epilogue).
            Returns (dfeat, denc, dwv, dbv, dwvo, dbvo)."""
            catv = jnp.concatenate([feature, enc_v], axis=1)
            pre = _dot(catv, ws["wv"]) + ws["bv"]
            hv = jnp.maximum(pre, 0.0).astype(dtype)
            dwvo = _dot_t_a(hv, d_o.astype(dtype))
            dbvo = jnp.sum(d_o, axis=0, keepdims=True)
            dhv = _dot_t_b(d_o.astype(dtype), ws["wvo"])
            dhv = jnp.where(pre.astype(jnp.float32) > 0.0, dhv, 0.0)
            dwv = _dot_t_a(catv, dhv.astype(dtype))
            dbv = jnp.sum(dhv, axis=0, keepdims=True)
            dcat = _dot_t_b(dhv.astype(dtype), ws["wv"])
            return dcat[:, :WIDTH], dcat[:, WIDTH:], dwv, dbv, dwvo, dbvo

        # primary view branch: rgb cols 1:4 -> out cols 0:3, vis col 4 -> 3
        d_o = jnp.pad(
            jnp.concatenate([dout[:, 1:4], dout[:, 4:5]], axis=1),
            ((0, 0), (0, OUT_LANES - 4)),
        )
        dfeat_p, dve, dwv, dbv, dwvo, dbvo = view_branch_bwd(ve, d_o)
        dfeature += dfeat_p
        accum("wv", dwv)
        accum("bv", dbv)
        accum("wvo", dwvo)
        accum("bvo", dbvo)

        dve2_cols = []
        for j in range(n_sec):
            enc2 = ve2_ref[:, j * VIEW_IN : (j + 1) * VIEW_IN].astype(dtype)
            zeros3 = jnp.zeros((dout.shape[0], 3), jnp.float32)
            d_o2 = jnp.pad(
                jnp.concatenate([zeros3, dout[:, 5 + j : 6 + j]], axis=1),
                ((0, 0), (0, OUT_LANES - 4)),
            )
            dfeat_j, denc2, dwv, dbv, dwvo, dbvo = view_branch_bwd(enc2, d_o2)
            dfeature += dfeat_j
            dve2_cols.append(denc2)
            accum("wv", dwv)
            accum("bv", dbv)
            accum("wvo", dwvo)
            accum("bvo", dbvo)
        if n_sec:
            dve2_ref[...] = jnp.concatenate(dve2_cols, axis=1)
        else:
            dve2_ref[...] = jnp.zeros_like(dve2_ref)

        # ---- sigma/feature head
        dsf = jnp.pad(
            jnp.concatenate([dfeature, dout[:, 0:1]], axis=1),
            ((0, 0), (0, HEAD_OUT - WIDTH - 1)),
        )
        accum("wsf", _dot_t_a(hs[7], dsf.astype(dtype)))
        accum("bsf", jnp.sum(dsf, axis=0, keepdims=True))
        dh = _dot_t_b(dsf.astype(dtype), ws["wsf"])  # (T, 256)

        # ---- trunk layers 7, 6 (inputs hs[6], hs[5])
        for i, h_in in ((7, hs[6]), (6, hs[5])):
            dh = jnp.where(hs[i].astype(jnp.float32) > 0.0, dh, 0.0)
            accum(f"w{i}", _dot_t_a(h_in, dh.astype(dtype)))
            accum(f"b{i}", jnp.sum(dh, axis=0, keepdims=True))
            dh = _dot_t_b(dh.astype(dtype), ws[f"w{i}"])

        # ---- layer 5 consumes cat = [xe | hs[4]]
        dh = jnp.where(hs[5].astype(jnp.float32) > 0.0, dh, 0.0)
        accum("w5", _dot_t_a(cat, dh.astype(dtype)))
        accum("b5", jnp.sum(dh, axis=0, keepdims=True))
        dcat = _dot_t_b(dh.astype(dtype), ws["w5"])  # (T, 320)
        dxe = dcat[:, :PTS_IN]
        dh = dcat[:, PTS_IN:]

        # ---- layers 4..1 (inputs hs[i-1])
        for i in (4, 3, 2, 1):
            dh = jnp.where(hs[i].astype(jnp.float32) > 0.0, dh, 0.0)
            accum(f"w{i}", _dot_t_a(hs[i - 1], dh.astype(dtype)))
            accum(f"b{i}", jnp.sum(dh, axis=0, keepdims=True))
            dh = _dot_t_b(dh.astype(dtype), ws[f"w{i}"])

        # ---- layer 0 (input xe)
        dh = jnp.where(hs[0].astype(jnp.float32) > 0.0, dh, 0.0)
        accum("w0", _dot_t_a(xe, dh.astype(dtype)))
        accum("b0", jnp.sum(dh, axis=0, keepdims=True))
        dxe = dxe + _dot_t_b(dh.astype(dtype), ws["w0"])

        dxe_ref[...] = dxe
        dve_ref[...] = dve

        # ---- accumulate weight grads across the sequential grid
        is_first = pl.program_id(0) == 0
        for name, r in zip(_WEIGHT_NAMES, dw_refs):
            val = dws[name].astype(jnp.float32)

            @pl.when(is_first)
            def _(r=r, val=val):
                r[...] = val

            @pl.when(jnp.logical_not(is_first))
            def _(r=r, val=val):
                r[...] = r[...] + val

    return kernel


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _WEIGHT_NAMES]


def _tile_spec(lanes):
    return pl.BlockSpec((TILE, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_mlp(packed, xe, ve, ve2, n_sec: int):
    """Forward through the fused MLP. xe (N, 64) f32, ve (N, 32) f32,
    ve2 (N, 32 * max(n_sec, 1)) f32 (zeros when n_sec == 0).
    Returns (N, 128) f32 raw outputs (layout in module docstring)."""
    return _fused_fwd_impl(packed, xe, ve, ve2, n_sec)


def _fused_fwd_impl(packed, xe, ve, ve2, n_sec):
    n = xe.shape[0]
    assert n % TILE == 0, f"N={n} must be a multiple of TILE={TILE}"
    grid = (n // TILE,)
    weights = [packed[k] for k in _WEIGHT_NAMES]
    return pl.pallas_call(
        _make_fwd_kernel(n_sec),
        grid=grid,
        in_specs=[
            _tile_spec(PTS_IN),
            _tile_spec(VIEW_IN),
            _tile_spec(ve2.shape[1]),
            *_weight_specs(),
        ],
        out_specs=_tile_spec(OUT_LANES),
        out_shape=jax.ShapeDtypeStruct((n, OUT_LANES), jnp.float32),
    )(xe, ve, ve2, *weights)


def _fused_fwd_rule(packed, xe, ve, ve2, n_sec):
    out = _fused_fwd_impl(packed, xe, ve, ve2, n_sec)
    return out, (packed, xe, ve, ve2)


def _fused_bwd_rule(n_sec, residuals, dout):
    packed, xe, ve, ve2 = residuals
    n = xe.shape[0]
    grid = (n // TILE,)
    weights = [packed[k] for k in _WEIGHT_NAMES]

    def dw_shape(k):
        return jax.ShapeDtypeStruct(packed[k].shape, jnp.float32)

    def dw_spec(k):
        return pl.BlockSpec(
            packed[k].shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    out_shapes = (
        jax.ShapeDtypeStruct((n, PTS_IN), jnp.float32),
        jax.ShapeDtypeStruct((n, VIEW_IN), jnp.float32),
        jax.ShapeDtypeStruct((n, ve2.shape[1]), jnp.float32),
        *[dw_shape(k) for k in _WEIGHT_NAMES],
    )
    out_specs = (
        _tile_spec(PTS_IN),
        _tile_spec(VIEW_IN),
        _tile_spec(ve2.shape[1]),
        *[dw_spec(k) for k in _WEIGHT_NAMES],
    )
    results = pl.pallas_call(
        _make_bwd_kernel(n_sec),
        grid=grid,
        in_specs=[
            _tile_spec(PTS_IN),
            _tile_spec(VIEW_IN),
            _tile_spec(ve2.shape[1]),
            _tile_spec(OUT_LANES),
            *_weight_specs(),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(xe, ve, ve2, dout, *weights)

    dxe, dve, dve2 = results[:3]
    dpacked = {
        k: dw.astype(packed[k].dtype)
        for k, dw in zip(_WEIGHT_NAMES, results[3:])
    }
    return dpacked, dxe, dve, dve2


fused_mlp.defvjp(_fused_fwd_rule, _fused_bwd_rule)


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
    [, visibility2]) with identical epilogue semantics.
    """
    from vipnerf_tpu.core.encoding import positional_encoding

    assert supports_config(mlp_cfg), "unsupported config for the fused kernel"
    npts = pts.shape[0]
    n_sec = view_dirs2.shape[1] if view_dirs2 is not None else 0

    enc_pts = positional_encoding(pts, 10)  # (npts, 63)
    enc_views = positional_encoding(view_dirs, 4)  # (npts, 27)
    xe = jnp.pad(enc_pts, ((0, 0), (0, PTS_IN - 63)))
    ve = jnp.pad(enc_views, ((0, 0), (0, VIEW_IN - 27)))
    if n_sec:
        enc2 = positional_encoding(
            view_dirs2.reshape(npts * n_sec, 3), 4
        )  # (npts * n_sec, 27)
        enc2 = jnp.pad(enc2, ((0, 0), (0, VIEW_IN - 27)))
        ve2 = enc2.reshape(npts, n_sec * VIEW_IN)
    else:
        ve2 = jnp.zeros((npts, VIEW_IN), jnp.float32)

    n_pad = (-npts) % TILE
    if n_pad:
        xe = jnp.pad(xe, ((0, n_pad), (0, 0)))
        ve = jnp.pad(ve, ((0, n_pad), (0, 0)))
        ve2 = jnp.pad(ve2, ((0, n_pad), (0, 0)))

    packed = pack_weights(params, dtype)
    raw = fused_mlp(packed, xe, ve, ve2, n_sec)[:npts]

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
        out["visibility2"] = jax.nn.sigmoid(
            raw[:, 5 : 5 + n_sec]
        )[..., None]
    return out
