"""VGG perceptual (content) loss.

Parity with reference gen_loss.calc_contentLoss (utils/loss.py:16-24):
content = dist(VGG(sr), stop_grad(VGG(hr))) where dist is MSE for the SRGAN
flavor (post-activation features) and L1 for the ESRGAN/--enchant flavor
(pre-activation features, beforeAct=opt.enchant at train.py:357);
perceptual = content + beta * BCE(D(sr), 1) with beta = 1e-3.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.vgg import TruncatedVGG19
from .adversarial import generator_adversarial_loss
from .pixel import l1_loss, mse_loss


class PerceptualLoss:
    """Frozen truncated-VGG feature distance + adversarial term."""

    def __init__(
        self,
        vgg_params: Dict[str, Any],
        vgg_i: int = 5,
        vgg_j: int = 4,
        beta: float = 1e-3,
        before_act: bool = False,
        feature_norm: bool = False,
        dtype: Any = jnp.bfloat16,
    ):
        """``feature_norm=True`` divides both feature maps by the HR features'
        RMS before the distance — calibrates the content-loss magnitude when
        the extractor runs on RANDOM weights (no ImageNet checkpoint in the
        environment), where raw He-init features make ``loss/content``
        vanishingly small relative to the reference's. With real VGG weights
        leave it off for exact reference parity (utils/loss.py:16-24)."""
        self.model = TruncatedVGG19(i=vgg_i, j=vgg_j, before_act=before_act, dtype=dtype)
        self.params = jax.lax.stop_gradient(vgg_params)
        self.beta = beta
        self.feature_norm = feature_norm
        self._dist = l1_loss if before_act else mse_loss

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.model.apply({"params": self.params}, x)

    def __call__(
        self,
        sr_norm: jnp.ndarray,
        hr_norm: jnp.ndarray,
        sr_logits: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (perceptual, adversarial, content) like calc_contentLoss."""
        sr_feat = self.features(sr_norm)
        hr_feat = jax.lax.stop_gradient(self.features(hr_norm))
        if self.feature_norm:
            scale = jax.lax.stop_gradient(
                jnp.sqrt(jnp.mean(jnp.square(hr_feat))) + 1e-6
            )
            sr_feat = sr_feat / scale
            hr_feat = hr_feat / scale
        content = self._dist(sr_feat, hr_feat)
        adversarial = generator_adversarial_loss(sr_logits)
        return content + self.beta * adversarial, adversarial, content
