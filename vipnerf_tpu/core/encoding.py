"""Sinusoidal positional encoding.

Behavioral parity with the reference encoder
(src/models/VipNeRF01.py:416-448 `PositionalEncoder`): include_input=True,
log-sampled frequencies 2^0 .. 2^(degree-1), and per-frequency [sin, cos]
blocks, i.e. the output layout is

    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]

with each block spanning the full input dimensionality.

TPU notes: this is pure VPU work; XLA fuses it into the consumer matmul's
producer. The retired fused Pallas MLP kernel (experiments/fused_mlp.py) re-derives
the same layout in-kernel so the encoded features never round-trip to HBM.
"""

import jax.numpy as jnp


def encoding_dim(input_dim: int, degree: int) -> int:
    """Output dim: input + sin/cos per frequency (reference :429,442)."""
    return input_dim * (1 + 2 * degree)


def positional_encoding(
    x: jnp.ndarray, degree: int, fast: bool = False
) -> jnp.ndarray:
    """Encode `x` (..., d) -> (..., d * (1 + 2*degree)).

    Frequencies are 2^0 .. 2^(degree-1) (log-sampled; reference :434-437 with
    max_freq_log2 = degree - 1, num_freqs = degree; :494-507).

    fast=True replaces the 2*degree transcendentals per element with ONE
    sin/cos pair plus the double-angle recurrence
    (sin 2a = 2 sin a cos a, cos 2a = cos^2 a - sin^2 a). The recurrence
    amplifies f32 rounding by ~2^degree (~6e-5 absolute at degree 10), far
    below bfloat16 input resolution. On the v5e the mode measured SLOWER
    than exact (the 2*degree+1 narrow concats cost more in relayouts than
    the transcendentals save on the VPU), so it is opt-in via the model
    config `fast_encoding` and OFF by default — kept for backends where
    sin/cos dominate.
    """
    if degree <= 0:
        return x
    d = x.shape[-1]
    if not fast:
        freqs = 2.0 ** jnp.arange(degree, dtype=x.dtype)  # (degree,)
        xf = x[..., None, :] * freqs[:, None]  # (..., degree, d)
        # (..., degree, 2, d) -> flatten: each frequency contributes [sin, cos]
        enc = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)
        enc = enc.reshape(x.shape[:-1] + (degree * 2 * d,))
        return jnp.concatenate([x, enc], axis=-1)

    s, c = jnp.sin(x), jnp.cos(x)
    blocks = [x]
    for _ in range(degree):
        blocks.append(s)
        blocks.append(c)
        s, c = 2.0 * s * c, (c - s) * (c + s)
    return jnp.concatenate(blocks, axis=-1)
