"""Same-size denoiser.

Parity with reference ``Denoise`` (utils/models.py:672-706): 9x9 head conv ->
(n/2) residual blocks @64 -> stride-2 conv to 256 -> 2 residual blocks @256 ->
pixel_shuffle(2) (256 -> 64, back to full res) + LeakyReLU -> (n/2) residual
blocks @64 -> 3x3 conv (BN) -> global skip add -> 9x9 tail conv -> tanh.
Input and output are the same spatial size (the bundled model.pt artifact is
this family). Golden param count: 3,760,963 at depth=16 (SURVEY.md §2.4).

The stride-2 trunk is a deliberate TPU win too: 3/4 of the residual FLOPs run
at quarter resolution with 256 channels — bigger, more MXU-friendly matmuls.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.blocks import ResidualBlock
from ..ops.conv import ConvBlock
from ..ops.pixel_shuffle import pixel_shuffle


class Denoiser(nn.Module):
    """x1-scale denoise/restoration net, output in [-1, 1]."""

    depth: int = 16
    width: int = 64
    fused: bool = False  # BN-free twin for deployment (BN folded into convs)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        act = ("leaky_relu", 0.2)
        use_bn = not self.fused
        x = x.astype(self.dtype)
        x = ConvBlock(self.width, 9, act=act, use_bn=False, name="head", **kw)(x, train)
        h = x
        for i in range(self.depth // 2):
            h = ResidualBlock(self.width, self.width, 3, act=act, use_bn=use_bn,
                              name=f"res0_{i}", **kw)(h, train)
        h = ConvBlock(self.width * 4, 3, stride=2, act=act, use_bn=False, name="down", **kw)(h, train)
        for i in range(2):
            h = ResidualBlock(self.width * 4, self.width * 4, 3, act=act, use_bn=use_bn,
                              name=f"res1_{i}", **kw)(h, train)
        h = jax.nn.leaky_relu(pixel_shuffle(h, 2), 0.2)
        for i in range(self.depth // 2):
            h = ResidualBlock(self.width, self.width, 3, act=act, use_bn=use_bn,
                              name=f"res2_{i}", **kw)(h, train)
        h = ConvBlock(self.width, 3, act=None, use_bn=use_bn, name="trunk_conv", **kw)(h, train)
        x = x + h
        x = ConvBlock(3, 9, act="tanh", use_bn=False, name="tail", **kw)(x, train)
        return x.astype(jnp.float32)


class LegacyDenoiser(nn.Module):
    """The OLDER Denoise revision baked into the reference's bundled
    ``model.pt`` (dissected in SURVEY.md §2.7): 9x9 head -> ``depth`` x
    ResidualBlock(width, hidden) -> 3x3 trunk conv -> global skip add ->
    9x9 tanh tail. No down/up-sampling trunk, narrow (``hidden``-channel)
    residual bottlenecks. Exists so reference-trained model.pt weights can be
    imported bit-faithfully (interop/torch_import.py)."""

    depth: int = 8
    width: int = 64
    hidden: int = 32
    fused: bool = True  # model.pt ships BN-folded; unfused supported for training
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        act = ("leaky_relu", 0.2)
        use_bn = not self.fused
        x = x.astype(self.dtype)
        x = ConvBlock(self.width, 9, act=act, use_bn=False, name="head", **kw)(x, train)
        h = x
        for i in range(self.depth):
            h = ResidualBlock(self.width, self.hidden, 3, act=act, use_bn=use_bn,
                              name=f"res{i}", **kw)(h, train)
        h = ConvBlock(self.width, 3, act=None, use_bn=use_bn, name="trunk_conv", **kw)(h, train)
        x = x + h
        x = ConvBlock(3, 9, act="tanh", use_bn=False, name="tail", **kw)(x, train)
        return x.astype(jnp.float32)
