"""Mixed-precision policy.

The reference uses CUDA autocast fp16 + per-net GradScaler (reference:
train.py:54-61, 93-125). On TPU the idiomatic policy is bf16 compute with
fp32 parameters and optimizer state — bf16 has fp32's exponent range, so no
loss scaling is needed (SURVEY.md §2.11, mixed-precision row).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through every module."""

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32

    def cast_to_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)
