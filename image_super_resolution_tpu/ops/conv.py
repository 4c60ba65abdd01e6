"""Core convolution building block.

TPU-native counterpart of the reference's ``Conv`` (conv+BN+act, bias-free
conv — utils/models.py:75-111) and ``ConvWithoutBN`` (biased conv+act —
utils/models.py:174-199), unified behind one NHWC Flax module with a
``use_bn`` switch, exactly as the reference's blocks toggle between the two.

Design notes (TPU-first):
- NHWC layout: XLA's TPU conv emitter wants channels-last; C=64 trunks tile
  cleanly onto the MXU as (spatial, C_in) x (C_in, C_out) contractions.
- bf16 compute / fp32 params via the dtype/param_dtype pair; no GradScaler
  needed (cf. reference train.py:54-61).
- BN is a training-time construct; deployment folds it into the conv
  (ops/fuse.py), mirroring the reference's fuse_conv_and_bn
  (utils/models.py:366-406) but as a pure param-tree transform.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .activations import ActSpec, PReLU, apply_act, is_prelu
from .initializers import torch_bias_init, torch_kernel_init
from ..utils.general import autopad


class ConvBlock(nn.Module):
    """conv('same') [+ BN] [+ dropout] + act.

    use_bn=True  -> bias-free conv + BatchNorm (reference ``Conv``).
    use_bn=False -> biased conv, no norm   (reference ``ConvWithoutBN``).
    """

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: ActSpec = None
    use_bn: bool = True
    dropout: float = 0.0
    weight_scale: float = 1.0  # 0.2 for the "enchant" ESRGAN-style init
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not 0.0 <= self.dropout <= 1.0:
            raise ValueError(f"dropout must be in [0, 1], got {self.dropout}")
        in_ch = x.shape[-1]
        pad = autopad(self.kernel, None, self.dilation)
        fan_in = self.kernel * self.kernel * (in_ch // self.groups)
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=not self.use_bn,
            kernel_init=torch_kernel_init(self.weight_scale),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if self.use_bn:
            # torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax
            # momentum is the complement: running = m*running + (1-m)*batch).
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="bn",
            )(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if is_prelu(self.act):
            # Learnable activation: "prelu" = torch's single shared slope;
            # ("prelu", n) with n != 1 = one slope per OUT channel — the
            # reference Conv's channel-fix (utils/models.py:92-94) collapses
            # any multi-parameter PReLU to exactly that.
            per_channel = (
                isinstance(self.act, tuple) and len(self.act) > 1
                and self.act[1] not in (None, 1)
            )
            return PReLU(
                channelwise=per_channel,
                param_dtype=self.param_dtype,
                name="prelu",
            )(x)
        return apply_act(x, self.act)


class DenseBlock(nn.Module):
    """Linear [+ act] — reference Discriminator FC head (utils/models.py:549-551)."""

    features: int
    act: ActSpec = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        x = nn.Dense(
            features=self.features,
            kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="dense",
        )(x)
        return apply_act(x, self.act)
