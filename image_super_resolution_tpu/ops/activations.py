"""Declarative activation specs.

The reference passes live ``nn.Module`` activation instances around and
re-instantiates them via ``eval(str(act))`` (reference: utils/general.py:28-37
— a quirk SURVEY.md §7 says to keep out of the rebuild). Here an activation is
a plain hashable spec: ``None``, a string name, or ``(name, param)``.
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

ActSpec = Union[None, str, Tuple[str, float]]

# The reference whitelists these activation classes (utils/general.py:10-12):
# LeakyReLU, Hardswish, ReLU, ReLU6, SiLU, Tanh, Sigmoid, ELU, PReLU,
# Softmax, Hardsigmoid, GELU, Softsign, Softplus. All have spec names here;
# PReLU is LEARNABLE and therefore a module (ops.activations.PReLU), applied
# by ConvBlock when the spec names it.

# Reference activation uses (utils/models.py): LeakyReLU(0.2) heads /
# discriminator, LeakyReLU() [slope 0.01] trunks, Tanh tails, SiLU default.
LEAKY_02: ActSpec = ("leaky_relu", 0.2)
LEAKY: ActSpec = ("leaky_relu", 0.01)
TANH: ActSpec = "tanh"
SILU: ActSpec = "silu"


def apply_act(x: jnp.ndarray, act: ActSpec) -> jnp.ndarray:
    """Apply an activation spec. ``None``/``False`` -> identity."""
    if act is None or act is False:
        return x
    if act is True:  # reference default act=True means SiLU (utils/models.py:95)
        act = "silu"
    name, param = (act, None) if isinstance(act, str) else act
    if name == "leaky_relu":
        return jax.nn.leaky_relu(x, negative_slope=0.01 if param is None else param)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "tanh":
        return jnp.tanh(x)
    if name == "silu":
        return jax.nn.silu(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    if name == "gelu":  # exact erf form — torch nn.GELU's default
        return jax.nn.gelu(x, approximate=False)
    if name == "elu":
        return jax.nn.elu(x)
    if name == "relu6":
        return jax.nn.relu6(x)
    if name == "hardswish":
        return jax.nn.hard_swish(x)
    if name == "hardsigmoid":  # torch Hardsigmoid == relu6(x+3)/6
        return jax.nn.hard_sigmoid(x)
    if name == "softsign":
        return jax.nn.soft_sign(x)
    if name == "softplus":
        return jax.nn.softplus(x)
    if name == "softmax":
        return jax.nn.softmax(x, axis=-1)
    raise ValueError(f"unknown activation spec: {act!r}")


def is_prelu(act: ActSpec) -> bool:
    """True when the spec names the learnable PReLU (handled as a module)."""
    return act == "prelu" or (isinstance(act, tuple) and act[0] == "prelu")


class PReLU(nn.Module):
    """Learnable leaky slope: max(0, x) + alpha * min(0, x).

    torch ``nn.PReLU`` parity (init 0.25, fp32 parameter). The reference's
    Conv re-instantiates any multi-parameter PReLU with one slope per OUT
    channel (utils/models.py:92-94); ``channelwise=True`` reproduces that,
    the default is torch's single shared slope.
    """

    channelwise: bool = False
    init_value: float = 0.25
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[-1] if self.channelwise else 1
        alpha = self.param(
            "alpha",
            lambda _key: jnp.full((n,), self.init_value, self.param_dtype),
        )
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)
