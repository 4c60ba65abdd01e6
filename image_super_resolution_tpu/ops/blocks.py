"""Residual / dense building blocks.

TPU-native counterparts of the reference zoo (utils/models.py):
- ResidualBlock  <- ResidualBlock1 (models.py:202-209): x + conv(act)->conv.
- RDB            <- RDB (models.py:245-271): 4 growth convs with dense
  concatenation + fusion conv, residual-scaled.
- RRDB           <- RRDB (models.py:298-317): 3 sequential RDBs,
  residual-scaled, growth = filters // 2.
- Upsampler      <- Scaler (models.py:572-589): conv -> pixel_shuffle -> act.

Dead reference blocks (ConvAIPE, ConvTranspose, FullyConnected wrapper,
ResidualBlock2, RDB_PixelShuffle, elan, Inception, Mixed_7a/b — SURVEY.md §7
"fix" list) are intentionally not rebuilt.

NHWC means the dense concatenations are last-axis concats, which XLA folds
into the consuming convolution's input window — no copies materialize.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .activations import ActSpec, apply_act
from .conv import ConvBlock
from .pixel_shuffle import pixel_shuffle


class ResidualBlock(nn.Module):
    """x + conv(act) -> conv(no act). Reference ResidualBlock1."""

    features: int
    hidden: int
    kernel: int = 3
    act: ActSpec = ("leaky_relu", 0.2)
    use_bn: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(use_bn=self.use_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        h = ConvBlock(self.hidden, self.kernel, act=self.act, name="conv0", **kw)(x, train)
        h = ConvBlock(self.features, self.kernel, act=None, name="conv1", **kw)(h, train)
        return x + h


class RDB(nn.Module):
    """Residual Dense Block with residual scaling (reference RDB)."""

    growth: int
    kernel: int = 3
    act: ActSpec = ("leaky_relu", 0.01)
    add_rate: float = 0.2
    use_bn: bool = True
    weight_scale: float = 1.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kw = dict(
            use_bn=self.use_bn,
            weight_scale=self.weight_scale,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        feats = [x]
        for i in range(4):
            y = ConvBlock(self.growth, self.kernel, act=self.act, name=f"conv{i}", **kw)(
                jnp.concatenate(feats, axis=-1) if len(feats) > 1 else x, train
            )
            feats.append(y)
        fused = ConvBlock(in_ch, self.kernel, act=None, name="conv_fuse", **kw)(
            jnp.concatenate(feats, axis=-1), train
        )
        return fused * jnp.asarray(self.add_rate, fused.dtype) + x


class RRDB(nn.Module):
    """Residual-in-Residual Dense Block: 3 x RDB, residual-scaled."""

    features: int
    kernel: int = 3
    act: ActSpec = ("leaky_relu", 0.01)
    add_rate: float = 0.2
    use_bn: bool = True
    weight_scale: float = 1.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not 0.0 < self.add_rate <= 1.0:
            raise ValueError(f"add_rate must be in (0, 1], got {self.add_rate}")
        h = x
        for i in range(3):
            h = RDB(
                growth=self.features // 2,
                kernel=self.kernel,
                act=self.act,
                add_rate=self.add_rate,
                use_bn=self.use_bn,
                weight_scale=self.weight_scale,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"rdb{i}",
            )(h, train)
        return h * jnp.asarray(self.add_rate, h.dtype) + x


class Upsampler(nn.Module):
    """Sub-pixel x``scale`` upsampler: conv(C -> C*s^2) -> pixel_shuffle -> act.

    Reference Scaler (utils/models.py:572-589). Sub-pixel conv keeps all the
    FLOPs at low resolution — the right trade for the MXU (cf. ESPCN,
    arXiv:1609.05158).
    """

    features: int
    scale: int = 2
    kernel: int = 3
    act: ActSpec = ("leaky_relu", 0.01)
    weight_scale: float = 1.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ConvBlock(
            self.features * self.scale**2,
            self.kernel,
            act=None,
            use_bn=False,
            weight_scale=self.weight_scale,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x, train)
        x = pixel_shuffle(x, self.scale)
        return apply_act(x, self.act)
