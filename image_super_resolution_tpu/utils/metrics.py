"""PSNR / SSIM / texture evaluation metrics.

The reference has NO evaluation loop at all (SURVEY.md §5 — its Ychannel
module was never called). Here PSNR/SSIM (optionally on the BT.601 Y channel
with the standard 4-px border crop) are first-class and feed the eval CLI and
bench harness.

Beyond PSNR/SSIM, two texture measures make the GAN phase falsifiable
(VERDICT r4 item 2 — the adversarial objective deliberately sacrifices
PSNR, so a fidelity-only table cannot distinguish "traded distortion for
texture" from "added noise"):

- ``hf_energy_ratio`` — reference-based high-frequency fidelity: the ratio
  of HF-band RMS energy (Y channel minus its Gaussian blur) in the output
  vs ground truth. 1.0 = texture energy matched; <1 oversmoothed (the
  canonical pixel-loss failure); >1 over-sharpened/noisy.
- ``gradient_hist_distance`` — total-variation distance between the
  gradient-magnitude histograms of output and ground truth Y channels:
  0 = identical edge/texture statistics. A GAN phase that restores texture
  moves hf_ratio toward 1 *and* shrinks this distance; one that merely adds
  noise pushes hf_ratio past 1 while the distance grows.

``sharpness`` is the no-reference companion (RMS gradient magnitude of Y),
reported for both output and ground truth so its scale is interpretable.
All are pure jnp on fixed shapes — jit-safe, no new dependencies.
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


def psnr_y_per_image(
    a01: jnp.ndarray, b01: jnp.ndarray, border: int = 4
) -> jnp.ndarray:
    """Per-image PSNR-Y over an NHWC [0,1] batch -> shape (N,) dB.

    The scalar ``psnr_y`` averages the MSE over the whole batch; this keeps
    each image separate so the eval CLI can report dispersion (mean +/-
    min/max/std over val crops) instead of a single scalar — VERDICT r4
    item 4's evidence-strength requirement for the n=1-photograph gates.
    """
    ya = y_channel(a01, border) / 255.0
    yb = y_channel(b01, border) / 255.0
    mse = jnp.mean((ya - yb) ** 2, axis=(1, 2))
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def _grad_mag(y: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude of an (N,H,W) luma stack on the common interior."""
    gx = y[:, 1:, 1:] - y[:, 1:, :-1]
    gy = y[:, 1:, 1:] - y[:, :-1, 1:]
    return jnp.sqrt(gx**2 + gy**2)


def sharpness(x01: jnp.ndarray, border: int = 4) -> jnp.ndarray:
    """No-reference sharpness: RMS gradient magnitude of the Y channel
    (in [0,1] luma units). Higher = more high-frequency content; only
    meaningful next to the ground truth's own value."""
    y = y_channel(x01, border) / 255.0
    return jnp.sqrt(jnp.mean(_grad_mag(y) ** 2))


def _blur_y(y: jnp.ndarray, size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Gaussian blur of an (N,H,W) luma stack, SAME padding."""
    win = _gaussian_kernel(size, sigma)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        y[..., None], win, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )[..., 0]


def hf_energy_ratio(
    a01: jnp.ndarray, b01: jnp.ndarray, border: int = 4, sigma: float = 1.5
) -> jnp.ndarray:
    """Reference-based high-frequency fidelity: RMS energy of the HF band
    (Y minus its Gaussian blur) in ``a`` divided by that of ground truth
    ``b``. 1.0 = texture energy matched; <1 oversmoothed; >1 noisy."""
    ya = y_channel(a01, border) / 255.0
    yb = y_channel(b01, border) / 255.0
    hf_a = ya - _blur_y(ya, sigma=sigma)
    hf_b = yb - _blur_y(yb, sigma=sigma)
    ea = jnp.sqrt(jnp.mean(hf_a**2))
    eb = jnp.sqrt(jnp.mean(hf_b**2))
    return ea / jnp.maximum(eb, 1e-8)


def gradient_hist_distance(
    a01: jnp.ndarray,
    b01: jnp.ndarray,
    border: int = 4,
    bins: int = 32,
    max_grad: float = 0.5,
) -> jnp.ndarray:
    """Total-variation distance (0..1) between the gradient-magnitude
    histograms of the Y channels of ``a`` and ``b``. 0 = identical
    edge/texture statistics. Fixed bin edges over [0, max_grad] (the last
    bin catches everything above) keep it jit-static."""
    ya = y_channel(a01, border) / 255.0
    yb = y_channel(b01, border) / 255.0
    ga = jnp.clip(_grad_mag(ya), 0.0, max_grad).ravel()
    gb = jnp.clip(_grad_mag(yb), 0.0, max_grad).ravel()
    edges = jnp.linspace(0.0, max_grad, bins + 1)
    ha, _ = jnp.histogram(ga, bins=edges)
    hb, _ = jnp.histogram(gb, bins=edges)
    ha = ha.astype(jnp.float32) / ga.size
    hb = hb.astype(jnp.float32) / gb.size
    return 0.5 * jnp.sum(jnp.abs(ha - hb))


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
