"""PSNR / SSIM evaluation metrics.

The reference has NO evaluation loop at all (SURVEY.md §5 — its Ychannel
module was never called). Here PSNR/SSIM (optionally on the BT.601 Y channel
with the standard 4-px border crop) are first-class and feed the eval CLI and
bench harness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.transforms import y_channel


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over the full tensor (dB)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def psnr_y(a01: jnp.ndarray, b01: jnp.ndarray, border: int = 4) -> jnp.ndarray:
    """PSNR on the BT.601 Y channel of NHWC [0,1] batches, border-cropped —
    the standard SR benchmark protocol."""
    ya = y_channel(a01, border)
    yb = y_channel(b01, border)
    return psnr(ya / 255.0, yb / 255.0, max_val=1.0)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(r**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """SSIM (Wang et al.) on NHWC batches, 11x11 Gaussian window."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    win = _gaussian_kernel()[:, :, None, None]
    ch = a.shape[-1]
    kernel = jnp.tile(win, (1, 1, 1, ch))

    def filt(img):
        # HIGHEST precision: TPU's default bf16 conv MACs make the variance
        # terms (E[x^2]-E[x]^2) go negative and blow up the SSIM ratio.
        return jax.lax.conv_general_dilated(
            img, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch,
            precision=jax.lax.Precision.HIGHEST,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = filt(a * a) - mu_aa
    sig_b = filt(b * b) - mu_bb
    sig_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * sig_ab + c2)
    den = (mu_aa + mu_bb + c1) * (sig_a + sig_b + c2)
    return jnp.mean(num / den)
