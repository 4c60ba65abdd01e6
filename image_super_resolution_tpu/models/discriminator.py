"""SRGAN discriminator.

Parity with reference Discriminator (utils/models.py:513-569): 8 conv blocks —
the first without BN — where even blocks (0,2,4,..) grow channels at stride 1
and odd blocks keep channels at stride 2 (what the code actually does at
models.py:534-537, contradicting its own docstring; we follow the code), then
AdaptiveAvgPool(6x6) -> FC(out*36 -> fc_size) + LeakyReLU(0.2) -> FC(-> 1)
logit. Golden param count: 23,563,649 (SURVEY.md §2.4).

NHWC note: the flatten order before fc1 is H*W*C (torch flattens C*H*W), so
fc1 kernels are a permutation of the torch layout — irrelevant for fresh
training, documented for checkpoint converters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import ConvBlock, DenseBlock


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics on NHWC with static shapes.

    Bin i covers rows [floor(i*H/out), ceil((i+1)*H/out)). All shapes are
    static under jit, so the Python loop unrolls at trace time; for the
    common 96-px training patch (H=W=6 here) it is a no-op reshape-mean.
    """
    n, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    if h % out_h == 0 and w % out_w == 0:
        return x.reshape(n, out_h, h // out_h, out_w, w // out_w, c).mean(axis=(2, 4))
    rows = []
    for i in range(out_h):
        r0, r1 = (i * h) // out_h, -(-(i + 1) * h // out_h)
        cols = []
        for j in range(out_w):
            c0, c1 = (j * w) // out_w, -(-(j + 1) * w // out_w)
            cols.append(x[:, r0:r1, c0:c1, :].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)


class Discriminator(nn.Module):
    """SRGAN discriminator producing a real/fake logit per image."""

    kernel: int = 3
    channels: int = 64
    n_blocks: int = 8
    fc_size: int = 1024
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)
        in_ch = 3
        out_ch = self.channels
        for i in range(self.n_blocks):
            out_ch = (self.channels if i == 0 else in_ch * 2) if i % 2 == 0 else in_ch
            x = ConvBlock(
                out_ch, self.kernel, stride=1 if i % 2 == 0 else 2,
                act=("leaky_relu", 0.2), use_bn=i != 0, name=f"block{i}", **kw,
            )(x, train)
            in_ch = out_ch
        x = adaptive_avg_pool(x, 6, 6)
        x = x.reshape(x.shape[0], -1)
        x = DenseBlock(self.fc_size, act=("leaky_relu", 0.2), name="fc1", **kw)(x)
        x = DenseBlock(1, act=None, name="fc2", **kw)(x)
        return x.astype(jnp.float32)
