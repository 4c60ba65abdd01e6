"""Declarative activation specs.

The reference passes live ``nn.Module`` activation instances around and
re-instantiates them via ``eval(str(act))`` (reference: utils/general.py:28-37
— a quirk SURVEY.md §7 says to keep out of the rebuild). Here an activation is
a plain hashable spec: ``None``, a string name, or ``(name, param)``.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

ActSpec = Union[None, str, Tuple[str, float]]

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
    if name == "gelu":
        return jax.nn.gelu(x)
    if name == "elu":
        return jax.nn.elu(x)
    raise ValueError(f"unknown activation spec: {act!r}")
