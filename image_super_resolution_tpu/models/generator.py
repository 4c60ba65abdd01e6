"""SR generator family.

One Flax module covers both reference generators (utils/models.py:592-650):

- ``enchant=False`` -> reference ``ResNet``: BN inside the RRDB trunk and the
  post-trunk conv, head LeakyReLU(0.2).
- ``enchant=True``  -> reference ``EResNet``: no BN anywhere, default-slope
  LeakyReLU, and every conv weight scaled by 0.2 at init (ESRGAN MSRA-scaled
  init, utils/models.py:639-640).

Topology (both): 9x9 head conv -> depth x RRDB(64) -> 3x3 conv -> global skip
add -> (scale//2) x sub-pixel x2 upsamplers -> 9x9 tail conv -> tanh.
Output range [-1, 1]. scale in {2, 4} (scale // 2 upsample stages,
utils/models.py:595).

Golden param counts (SURVEY.md §2.4, acceptance-tested in tests/):
  depth=16, add_rate=0.2: x2 = 11,735,875 / x4 = 11,883,587 / enchant x2 =
  11,726,595.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.blocks import RRDB, Upsampler
from ..ops.conv import ConvBlock


class SRGenerator(nn.Module):
    """SRResNet/ESRGAN-hybrid generator (reference ResNet / EResNet)."""

    depth: int = 16
    add_rate: float = 0.2
    scale: int = 2
    width: int = 64
    enchant: bool = False
    fused: bool = False  # BN-free twin for deployment (BN folded into convs)
    remat: bool = False  # rematerialize each RRDB's activations in backward
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.scale not in (1, 2, 4, 8):
            raise ValueError(f"scale must be a power of two >= 1, got {self.scale}")
        use_bn = not self.enchant and not self.fused
        wscale = 0.2 if self.enchant else 1.0
        head_act = ("leaky_relu", 0.01 if self.enchant else 0.2)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        x = x.astype(self.dtype)
        x = ConvBlock(
            self.width, 9, act=head_act, use_bn=False, weight_scale=wscale,
            name="head", **kw,
        )(x, train)
        # jax.checkpoint on each RRDB trades ~35% more FLOPs in backward for
        # O(depth) less activation HBM — enables bigger batch/patch training.
        rrdb_cls = nn.remat(RRDB, static_argnums=(2,)) if self.remat else RRDB
        h = x
        for i in range(self.depth):
            h = rrdb_cls(
                self.width, 3, act=("leaky_relu", 0.01), add_rate=self.add_rate,
                use_bn=use_bn, weight_scale=wscale, name=f"rrdb{i}", **kw,
            )(h, train)
        h = ConvBlock(
            self.width, 3, act=None, use_bn=use_bn, weight_scale=wscale,
            name="trunk_conv", **kw,
        )(h, train)
        x = x + h  # global residual (utils/models.py:615)
        for i in range(self.scale // 2):
            x = Upsampler(
                self.width, 2, 3, act=("leaky_relu", 0.01), weight_scale=wscale,
                name=f"up{i}", **kw,
            )(x, train)
        x = ConvBlock(
            3, 9, act="tanh", use_bn=False, weight_scale=wscale, name="tail", **kw,
        )(x, train)
        return x.astype(jnp.float32)
