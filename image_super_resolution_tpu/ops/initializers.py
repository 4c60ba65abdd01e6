"""Torch-compatible initializers.

The reference relies on PyTorch's default ``kaiming_uniform_(a=sqrt(5))``
conv/linear init, which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias. The "enchant" (ESRGAN-style) generator additionally scales
every conv weight by 0.2 after init (reference: utils/models.py:639-640).
Matching the init distribution keeps early-training dynamics comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_kernel_init(scale: float = 1.0):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * scale for HWIO conv kernels /
    (in, out) dense kernels. fan_in = prod(shape[:-1])."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        w = jax.random.uniform(key, shape, jnp.float32, -bound, bound) * scale
        return w.astype(dtype)

    return init


def torch_bias_init(fan_in: int, scale: float = 1.0):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); fan_in must be passed explicitly
    because bias initializers don't see the kernel shape."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(jnp.asarray(max(fan_in, 1), jnp.float32))
        b = jax.random.uniform(key, shape, jnp.float32, -bound, bound) * scale
        return b.astype(dtype)

    return init
