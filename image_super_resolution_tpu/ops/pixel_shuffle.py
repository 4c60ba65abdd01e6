"""NHWC pixel shuffle (depth-to-space), torch-semantics-compatible.

torch.nn.PixelShuffle on NCHW maps channel index c*r^2 + i*r + j to output
pixel offset (i, j) of channel c. The NHWC equivalent treats the channel dim
as (C, r, r) and interleaves — this exact ordering matters for porting
reference checkpoints (the Scaler's conv emits channels in that order,
utils/models.py:572-589).

On TPU this lowers to a reshape+transpose that XLA fuses into the producing
convolution's output layout — no copy in the steady state.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(N, H, W, C*r*r) -> (N, H*r, W*r, C) with torch channel ordering."""
    n, h, w, c = x.shape
    r = scale
    if c % (r * r) != 0:
        raise ValueError(f"channels {c} not divisible by scale^2={r * r}")
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r_h, w, r_w, oc
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Inverse: (N, H*r, W*r, C) -> (N, H, W, C*r*r)."""
    n, hr, wr, c = x.shape
    r = scale
    if hr % r or wr % r:
        raise ValueError(f"spatial dims {(hr, wr)} not divisible by {r}")
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, r_h, r_w
    return x.reshape(n, h, w, c * r * r)
