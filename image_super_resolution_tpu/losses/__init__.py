from .adversarial import (
    bce_with_logits,
    discriminator_loss,
    generator_adversarial_loss,
)
from .perceptual import PerceptualLoss
from .pixel import PIXEL_LOSSES, charbonnier_loss, l1_loss, mse_loss

__all__ = [
    "bce_with_logits",
    "discriminator_loss",
    "generator_adversarial_loss",
    "PerceptualLoss",
    "PIXEL_LOSSES",
    "charbonnier_loss",
    "l1_loss",
    "mse_loss",
]
