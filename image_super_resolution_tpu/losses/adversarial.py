"""Adversarial (BCE-with-logits) losses.

Exact parity with the reference's gen_loss BCE pair (utils/loss.py:16-29):
- generator adversarial: BCE(D(sr), 1)
- discriminator:         BCE(D(sr), 0) + BCE(D(hr), 1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (numerically stable)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*t + log(1+exp(-|x|))
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def generator_adversarial_loss(sr_logits: jnp.ndarray) -> jnp.ndarray:
    return bce_with_logits(sr_logits, jnp.ones_like(sr_logits))


def discriminator_loss(sr_logits: jnp.ndarray, hr_logits: jnp.ndarray) -> jnp.ndarray:
    return bce_with_logits(sr_logits, jnp.zeros_like(sr_logits)) + bce_with_logits(
        hr_logits, jnp.ones_like(hr_logits)
    )
