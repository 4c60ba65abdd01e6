"""Tensor-parallel (channel-sharded) convolution.

The reference has no model parallelism (SURVEY.md §2.11) and at 12M params
none is *needed* — TP is provided as a first-class capability for wider
variants: conv kernels are sharded over OUTPUT channels across the mesh axis,
activations stay replicated, each chip computes its channel slice, and an
``all_gather`` over ICI reassembles the feature map. For a channels-last
conv this is the canonical Megatron-style column split; the backward pass's
``psum`` falls out of shard_map automatically.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import TILE_AXIS


def tp_conv(
    mesh: Mesh,
    axis: str = TILE_AXIS,
) -> Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Returns fn(x, kernel_hwio, bias) computing a 'same' conv with the
    output channels sharded over ``axis`` and gathered at the end.

    kernel/bias must have output channels divisible by the axis size; they
    are laid out sharded on that dim, x replicated.
    """

    def local_fn(x, k, b):
        pad = k.shape[0] // 2
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    # Each chip produces its channel slice; the out_spec stitches the full
    # logical array (channel-sharded in HBM — the consumer decides whether
    # to all_gather or keep computing sharded).
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, None, axis), P(axis)),
        out_specs=P(None, None, None, axis),
    )

    def apply(x, kernel, bias):
        x = jax.device_put(x, NamedSharding(mesh, P()))
        kernel = jax.device_put(kernel, NamedSharding(mesh, P(None, None, None, axis)))
        bias = jax.device_put(bias, NamedSharding(mesh, P(axis)))
        return fn(x, kernel, bias)

    return apply
