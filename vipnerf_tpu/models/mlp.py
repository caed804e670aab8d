"""The ViP-NeRF MLP as a parameter pytree + pure apply function.

Architecture parity target: src/models/VipNeRF01.py:451-596 (paths relative
to /root/reference/):
- trunk: `netdepth` x `netwidth` linear+ReLU with a skip at layer 4 that
  concatenates [encoded_pts, h] (:466, 472-475, 537-544)
- pts head: 1 sigma channel (+ optional 3 view-independent rgb) (:479-488);
  training-time gaussian noise on raw sigma before ReLU (:549-553)
- view branch (when view-dependent rgb or visibility prediction): feature
  linear (W->W), concat encoded view dirs, one (W+views_in)->W/2 ReLU layer,
  output linear -> [3 rgb sigmoid][1 visibility sigmoid] (:476-491, 568-596)
- secondary views: the view branch is re-run with per-other-view encodings
  against broadcast features -> per-point visibility2 (:527-530, 571-576).

TPU-first design decisions:
- Parameters are a plain nested-dict pytree (init matches torch.nn.Linear's
  U(-1/sqrt(fan_in), +1/sqrt(fan_in)) so optimization dynamics match).
- Apply is a pure function over flattened points; all matmuls go through
  `_dense`, which optionally casts operands to bfloat16 for the MXU with
  float32 accumulation (`preferred_element_type`) — toggled by
  `bf16_matmuls` in the model config.
- Weights are stored (in, out) so the hot matmul is (npts, in) @ (in, out)
  with npts the large dimension — the natural MXU layout.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vipnerf_tpu.core.encoding import encoding_dim, positional_encoding

Params = Dict[str, Any]


def _linear_init(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    wk, bk = jax.random.split(key)
    w = jax.random.uniform(wk, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(bk, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def mlp_feature_dims(mlp_cfg: Dict[str, Any]) -> Dict[str, int]:
    """Static dims derived from an mlp config block (coarse_mlp / fine_mlp)."""
    pts_in = encoding_dim(3, mlp_cfg["points_positional_encoding_degree"])
    views_in = (
        encoding_dim(3, mlp_cfg["views_positional_encoding_degree"])
        if mlp_cfg["use_view_dirs"]
        else 0
    )
    view_dep_rgb = mlp_cfg["view_dependent_rgb"]
    predict_visibility = mlp_cfg["predict_visibility"]
    pts_out = 1 + (0 if view_dep_rgb else 3)  # sigma [+ rgb]
    views_out = (3 if view_dep_rgb else 0) + (1 if predict_visibility else 0)
    return {
        "pts_in": pts_in,
        "views_in": views_in,
        "pts_out": pts_out,
        "views_out": views_out,
    }


def init_mlp_params(key: jax.Array, mlp_cfg: Dict[str, Any]) -> Params:
    """Build the parameter pytree for one MLP (coarse or fine)."""
    if not mlp_cfg["use_view_dirs"] and (
        mlp_cfg["view_dependent_rgb"] or mlp_cfg["predict_visibility"]
    ):
        # the rgb/visibility view branch consumes encoded view directions;
        # without use_view_dirs the forward pass has none to feed it (the
        # reference crashes mid-forward on this combination too,
        # VipNeRF01.py:563-596) — reject before parameters are built
        raise RuntimeError(
            "view_dependent_rgb / predict_visibility require use_view_dirs"
        )
    depth = mlp_cfg["netdepth"]
    width = mlp_cfg["netwidth"]
    dims = mlp_feature_dims(mlp_cfg)
    skips = (4,)
    view_dep_outputs = mlp_cfg["view_dependent_rgb"] or mlp_cfg["predict_visibility"]

    keys = jax.random.split(key, depth + 4)
    params: Params = {"pts_linears": []}
    in_dim = dims["pts_in"]
    for i in range(depth):
        params["pts_linears"].append(_linear_init(keys[i], in_dim, width))
        # skip concat happens AFTER layer i's relu when i in skips
        in_dim = width + dims["pts_in"] if i in skips else width
    params["pts_output_linear"] = _linear_init(keys[depth], width, dims["pts_out"])
    if view_dep_outputs:
        params["feature_linear"] = _linear_init(keys[depth + 1], width, width)
        params["views_linears"] = [
            _linear_init(keys[depth + 2], dims["views_in"] + width, width // 2)
        ]
        params["views_output_linear"] = _linear_init(
            keys[depth + 3], width // 2, dims["views_out"]
        )
    return params


def _ceil_to(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def _pad_cols(x: jnp.ndarray, to: int) -> jnp.ndarray:
    """Zero-pad the last axis of `x` out to width `to`."""
    if x.shape[-1] == to:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, to - x.shape[-1])])


def _pad_rows_at(
    layer: Dict[str, jnp.ndarray], idx: int, n: int
) -> Dict[str, jnp.ndarray]:
    """Insert `n` zero rows into layer's weight at row `idx`.

    Aligns the layer with an input whose feature block at [idx-?, idx) was
    zero-padded: the zero rows multiply the zero columns, so the output is
    bitwise-unchanged while the contraction dim becomes MXU-tile aligned.
    Under autodiff the transpose of the concatenate is a slice, so parameter
    gradients land on the original unpadded weight.
    """
    if n == 0:
        return layer
    w = layer["w"]
    zeros = jnp.zeros((n, w.shape[1]), w.dtype)
    wp = jnp.concatenate([w[:idx], zeros, w[idx:]], axis=0)
    return {"w": wp, "b": layer["b"]}


def _dense(
    x: jnp.ndarray, layer: Dict[str, jnp.ndarray], bf16: bool
) -> jnp.ndarray:
    """x @ w + b on the MXU.

    With bf16=True the whole computation (activations included) runs in
    bfloat16 with float32 master weights: casting only the forward operands
    is useless because autodiff's backward matmuls then mix f32 gradients
    with bf16 weights and XLA upcasts them back to f32 (measured: no speedup).
    Keeping activations bf16 makes fwd AND bwd matmuls bf16; the MXU still
    accumulates in f32 internally before rounding the output.
    """
    if bf16:
        w = layer["w"].astype(jnp.bfloat16)
        b = layer["b"].astype(jnp.bfloat16)
        y = jnp.dot(
            x.astype(jnp.bfloat16), w, preferred_element_type=jnp.bfloat16
        )
        return y + b
    return jnp.dot(x, layer["w"], preferred_element_type=jnp.float32) + layer["b"]


def apply_mlp(
    params: Params,
    mlp_cfg: Dict[str, Any],
    pts: jnp.ndarray,
    view_dirs: Optional[jnp.ndarray] = None,
    view_dirs2: Optional[jnp.ndarray] = None,
    *,
    raw_noise_std: float = 0.0,
    noise_key: Optional[jax.Array] = None,
    bf16_matmuls: bool = False,
    f32_heads: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Evaluate the MLP on flattened points.

    pts: (npts, 3); view_dirs: (npts, 3) or None; view_dirs2:
    (npts, nf-1, 3) or None. Returns a dict mirroring the reference MLP
    forward (:509-535): sigma (npts, 1), rgb (npts, 3), plus
    rgb_view_independent / rgb_view_dependent / visibility / visibility2 as
    configured. sigma noise is applied when noise_key is given (training).

    f32_heads (with bf16_matmuls): keep the trunk's 8 wide matmuls in
    bfloat16 (the HBM bulk) but run every output-adjacent layer
    (pts_output, feature, views) in float32 on a float32-upcast trunk
    activation — a mixed-precision mode probing whether the bf16-noise
    dead-sigma collapse (BASELINE.md round-3) is triggered at the heads.
    """
    skips = (4,)
    view_dep_rgb = mlp_cfg["view_dependent_rgb"]
    predict_visibility = mlp_cfg["predict_visibility"]
    view_dep_outputs = view_dep_rgb or predict_visibility
    # fast_encoding swaps 2*degree transcendentals for a double-angle
    # recurrence. Measured SLOWER on the v5e (the 21 narrow-lane concats cost
    # more in relayouts than the sin/cos cost on the VPU) — default OFF;
    # kept as an option for backends where transcendentals dominate.
    fast_pe = mlp_cfg.get("fast_encoding", False)
    # pad_contractions: zero-pad the positional encodings (and the matching
    # weight rows) so every matmul contraction dim is a multiple of 16 —
    # 63->64, 319->320 (skip concat), 283->288 (view concat). The unpadded
    # dims force XLA into misaligned MXU tilings; outputs are bitwise
    # identical because the padded rows/cols are zeros.
    pad_k = mlp_cfg.get("pad_contractions", False)

    enc_pts = positional_encoding(
        pts, mlp_cfg["points_positional_encoding_degree"], fast=fast_pe
    )
    pts_in = enc_pts.shape[-1]
    if pad_k:
        enc_pts = _pad_cols(enc_pts, _ceil_to(pts_in, 16))

    out: Dict[str, jnp.ndarray] = {}

    # Trunk (reference get_view_independent_outputs :537-544)
    h = enc_pts
    for i, layer in enumerate(params["pts_linears"]):
        if pad_k and (i == 0 or (i - 1) in skips):
            # layers that consume enc_pts (directly or via the skip concat)
            layer = _pad_rows_at(layer, pts_in, enc_pts.shape[-1] - pts_in)
        h = jax.nn.relu(_dense(h, layer, bf16_matmuls))
        if i in skips:
            h = jnp.concatenate([enc_pts, h], axis=-1)

    head_bf16 = bf16_matmuls and not f32_heads
    if bf16_matmuls and f32_heads:
        h = h.astype(jnp.float32)

    pts_output = _dense(h, params["pts_output_linear"], head_bf16)
    sigma = pts_output[..., 0:1]
    if noise_key is not None and raw_noise_std > 0.0:
        sigma = sigma + raw_noise_std * jax.random.normal(
            noise_key, sigma.shape, sigma.dtype
        )
    out["sigma"] = jax.nn.relu(sigma)

    if not view_dep_rgb:
        rgb = jax.nn.sigmoid(pts_output[..., 1:4])
        out["rgb_view_independent"] = rgb

    if view_dep_outputs:
        assert view_dirs is not None, "view-dependent outputs need view_dirs"
        feature = _dense(h, params["feature_linear"], head_bf16)

        def view_branch(enc_views: jnp.ndarray, feat: jnp.ndarray):
            """Reference get_view_dependent_outputs (:568-596)."""
            views_in = enc_views.shape[-1]
            if pad_k:
                enc_views = _pad_cols(enc_views, _ceil_to(views_in, 16))
            hv = jnp.concatenate([feat, enc_views], axis=-1)
            for li, layer in enumerate(params["views_linears"]):
                if pad_k and li == 0:
                    # enc_views sits at the END of the concat: appended rows
                    layer = _pad_rows_at(
                        layer,
                        feat.shape[-1] + views_in,
                        enc_views.shape[-1] - views_in,
                    )
                hv = jax.nn.relu(_dense(hv, layer, head_bf16))
            view_out = _dense(hv, params["views_output_linear"], head_bf16)
            branch: Dict[str, jnp.ndarray] = {}
            ch = 0
            if view_dep_rgb:
                branch["rgb_view_dependent"] = jax.nn.sigmoid(view_out[..., ch:ch + 3])
                ch += 3
            if predict_visibility:
                branch["visibility"] = jax.nn.sigmoid(view_out[..., ch:ch + 1])
            return branch

        enc_views = positional_encoding(
            view_dirs, mlp_cfg["views_positional_encoding_degree"],
            fast=fast_pe,
        )
        primary = view_branch(enc_views, feature)
        out.update(primary)
        if view_dep_rgb:
            rgb = primary["rgb_view_dependent"]

        if predict_visibility and view_dirs2 is not None:
            # (npts, nf-1, 3): fold the other-view axis into the batch so the
            # view-branch matmuls stay (big, C) @ (C, W/2) — a 3-D operand
            # with a tiny middle axis tiles poorly onto the 128x128 MXU.
            # (broadcast_to + reshape here trips the axon TPU backend's
            # register allocator; squeeze / jnp.repeat lower cleanly.)
            nf_m1 = view_dirs2.shape[-2]
            npts = view_dirs2.shape[0]
            enc_views2 = positional_encoding(
                view_dirs2.reshape(npts * nf_m1, 3),
                mlp_cfg["views_positional_encoding_degree"],
                fast=fast_pe,
            )
            if nf_m1 == 1:
                feat2 = feature
            else:
                feat2 = jnp.repeat(feature, nf_m1, axis=0)
            vis2 = view_branch(enc_views2, feat2)["visibility"]
            out["visibility2"] = vis2.reshape(npts, nf_m1, 1)

    out["rgb"] = rgb
    if bf16_matmuls:
        # Compositing / losses stay f32: cast head outputs back up.
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
    return out
