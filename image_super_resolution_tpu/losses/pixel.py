"""Pixel-space losses.

Reference: nn.MSELoss for the non-enchant resnet phase and denoise phase
(train.py:233, 264); ``L1Loss`` with a learnable-but-never-optimized weight
(utils/loss.py:32-39 — effectively plain L1, SURVEY.md §2.5). The weight is
kept as an explicit argument here instead of an inert parameter.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    return weight * jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def charbonnier_loss(
    pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """Smooth L1 used by modern SR work (not in the reference; additive)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


PIXEL_LOSSES = {"mse": mse_loss, "l1": l1_loss, "charbonnier": charbonnier_loss}
