"""On-device degradation kernels (pure jnp, NHWC, jit-friendly).

The reference degrades on CPU dataloader workers with albumentations
(utils/datasets.py:291-305, 374-377): bilinear Resize for the SR pairs and
GaussNoise + ISONoise + JPEG compression for the denoiser pairs. Here every
degradation runs on-device inside the jitted input pipeline — the host only
ships uint8 crops — which removes the CPU-worker bottleneck and keeps the
whole step compiled (SURVEY.md §7, build plan item 4).

All functions take/return float [0,1] NHWC batches with static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- resize ---

def downscale(
    x01: jnp.ndarray,
    scale: int,
    method: str = "bilinear",
    antialias: bool = False,
) -> jnp.ndarray:
    """Downscale an NHWC [0,1] batch by an integer factor.

    Default (bilinear, no antialias) matches the reference's live LR
    degradation — albumentations.Resize == cv2.INTER_LINEAR without
    prefiltering (utils/datasets.py:302). ``bicubic`` + antialias gives the
    standard-benchmark (MATLAB-style) kernel.

    The default path has an exact closed form for integer factors: with
    half-pixel centers the sample lands midway between the two middle pixels
    of each block (even factor) or on the center pixel (odd factor). It is
    computed with reshapes — jax.image.resize's gather-based no-antialias
    path is pathologically slow on TPU (measured ~2.2 s for a training batch
    vs ~0 for this form).
    """
    n, h, w, c = x01.shape
    if method == "bilinear" and not antialias and h % scale == 0 and w % scale == 0:
        if scale == 1:
            return x01
        blocks = x01.reshape(n, h // scale, scale, w // scale, scale, c)
        m = scale // 2
        if scale % 2:  # odd factor: sample point is the exact center pixel
            return blocks[:, :, m, :, m, :]
        rows = (blocks[:, :, m - 1] + blocks[:, :, m]) * 0.5  # (n,H/s,W/s,s,c)
        return (rows[:, :, :, m - 1] + rows[:, :, :, m]) * 0.5
    out_shape = (n, h // scale, w // scale, c)
    return jax.image.resize(x01, out_shape, method=method, antialias=antialias)


def upscale(x01: jnp.ndarray, scale: int, method: str = "bicubic") -> jnp.ndarray:
    n, h, w, c = x01.shape
    return jax.image.resize(
        x01, (n, h * scale, w * scale, c), method=method, antialias=False
    )


# ----------------------------------------------------------------- noise ---

def gaussian_noise(
    rng: jax.Array,
    x01: jnp.ndarray,
    var_range: Tuple[float, float] = (10.0, 50.0),
) -> jnp.ndarray:
    """Additive Gaussian noise; variance drawn per-image on the 0-255 scale
    (albumentations GaussNoise defaults)."""
    k_var, k_noise = jax.random.split(rng)
    n = x01.shape[0]
    var = jax.random.uniform(
        k_var, (n, 1, 1, 1), minval=var_range[0], maxval=var_range[1]
    )
    sigma = jnp.sqrt(var) / 255.0
    noise = jax.random.normal(k_noise, x01.shape, x01.dtype) * sigma
    return jnp.clip(x01 + noise, 0.0, 1.0)


def iso_noise(
    rng: jax.Array,
    x01: jnp.ndarray,
    color_shift: Tuple[float, float] = (0.01, 0.05),
    intensity: Tuple[float, float] = (0.1, 0.5),
) -> jnp.ndarray:
    """Camera-sensor (ISO) noise: signal-dependent (Poisson-like) luminance
    noise plus chrominance shift — albumentations.ISONoise semantics."""
    k_i, k_c, k_lum, k_col = jax.random.split(rng, 4)
    n = x01.shape[0]
    inten = jax.random.uniform(k_i, (n, 1, 1, 1), minval=intensity[0], maxval=intensity[1])
    cshift = jax.random.uniform(k_c, (n, 1, 1, 1), minval=color_shift[0], maxval=color_shift[1])
    luma = x01.mean(axis=-1, keepdims=True)
    # Poisson shot noise approximated as sqrt(luma)-scaled Gaussian.
    shot = jax.random.normal(k_lum, luma.shape, x01.dtype) * jnp.sqrt(
        jnp.maximum(luma, 1e-6)
    ) * inten * 0.1
    chroma = jax.random.normal(k_col, x01.shape, x01.dtype) * cshift
    return jnp.clip(x01 + shot + chroma, 0.0, 1.0)


# ---------------------------------------------------------------- JPEG -----

# Standard Annex-K luminance / chrominance quantization tables.
_Q_LUMA = jnp.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], jnp.float32)
_Q_CHROMA = jnp.asarray([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], jnp.float32)


def _make_dct_matrix():
    """8x8 DCT-II orthonormal basis (as a matmul — rides the MXU)."""
    import numpy as np

    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0, :] = m[0, :] / np.sqrt(2.0)
    return (m * 0.5).astype("float32")


_DCT_MATRIX = _make_dct_matrix()  # plain numpy: safe to close over in any trace


def _quality_tables(quality: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """libjpeg quality scaling: scale = 5000/q (q<50) else 200-2q."""
    q = jnp.clip(quality, 1.0, 100.0)
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)

    def scaled(base):
        t = jnp.floor((base[None] * scale[:, None, None] + 50.0) / 100.0)
        return jnp.clip(t, 1.0, 255.0)

    return scaled(_Q_LUMA), scaled(_Q_CHROMA)


def _rgb_to_ycbcr(x01: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray([
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ], x01.dtype)
    y = x01 @ m.T * 255.0
    return y + jnp.asarray([0.0, 128.0, 128.0], x01.dtype)


def _ycbcr_to_rgb(y: jnp.ndarray) -> jnp.ndarray:
    m = jnp.asarray([
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ], y.dtype)
    x = (y - jnp.asarray([0.0, 128.0, 128.0], y.dtype)) @ m.T / 255.0
    return jnp.clip(x, 0.0, 1.0)


def jpeg_compress(
    rng: jax.Array,
    x01: jnp.ndarray,
    quality_range: Tuple[float, float] = (50.0, 75.0),
) -> jnp.ndarray:
    """Differentiable-ish JPEG round trip: YCbCr -> 8x8 DCT -> quantize with
    per-image quality -> dequantize -> IDCT -> RGB.

    Matches the *distribution* of albumentations.ImageCompression
    (quality 50-75, utils/datasets.py:376) without a host round-trip; uses
    4:4:4 (no chroma subsampling) — documented approximation. The blockwise
    DCT is two 8x8 matmuls per block, MXU-friendly.
    """
    n, h, w, c = x01.shape
    if c != 3:
        raise ValueError("jpeg_compress expects RGB input")
    ph = (-h) % 8
    pw = (-w) % 8
    quality = jax.random.uniform(
        rng, (n,), minval=quality_range[0], maxval=quality_range[1]
    )
    q_luma, q_chroma = _quality_tables(quality)  # (N,8,8)
    qtab = jnp.stack([q_luma, q_chroma, q_chroma], axis=1)  # (N,3,8,8)

    ycc = _rgb_to_ycbcr(x01) - 128.0
    if ph or pw:
        ycc = jnp.pad(ycc, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    hb, wb = ycc.shape[1] // 8, ycc.shape[2] // 8
    # (N, hb, 8, wb, 8, C) -> (N, C, hb, wb, 8, 8)
    blocks = ycc.reshape(n, hb, 8, wb, 8, 3).transpose(0, 5, 1, 3, 2, 4)
    d = jnp.asarray(_DCT_MATRIX)
    coeffs = jnp.einsum("ij,nchwjk,lk->nchwil", d, blocks, d)
    qt = qtab[:, :, None, None, :, :]
    coeffs = jnp.round(coeffs / qt) * qt
    blocks = jnp.einsum("ji,nchwjk,kl->nchwil", d, coeffs, d)
    ycc = blocks.transpose(0, 2, 4, 3, 5, 1).reshape(n, hb * 8, wb * 8, 3)
    ycc = ycc[:, :h, :w, :] + 128.0
    return _ycbcr_to_rgb(ycc)


# Named severity presets for the denoise chain: (gauss var range on the
# 0-255 scale, ISO intensity range, JPEG quality range). "default" is the
# reference's training distribution (utils/datasets.py:374-377 /
# albumentations defaults); "light"/"heavy" bracket it so quality gates can
# report a dose-response curve instead of one operating point (VERDICT r4
# item 4).
DENOISE_SEVERITIES: dict = {
    "light": ((5.0, 15.0), (0.05, 0.2), (75.0, 90.0)),
    "default": ((10.0, 50.0), (0.1, 0.5), (50.0, 75.0)),
    "heavy": ((50.0, 100.0), (0.5, 1.0), (25.0, 50.0)),
}


def denoise_degradation(
    rng: jax.Array,
    x01: jnp.ndarray,
    quality_range: Tuple[float, float] = (50.0, 75.0),
    var_range: Tuple[float, float] = (10.0, 50.0),
    intensity: Tuple[float, float] = (0.1, 0.5),
) -> jnp.ndarray:
    """The reference denoiser's LR chain: GaussNoise -> ISONoise -> JPEG
    (utils/datasets.py:374-377). The range arguments default to the
    reference/albumentations training distribution; pass a
    ``DENOISE_SEVERITIES`` triple to evaluate off the training severity."""
    k1, k2, k3 = jax.random.split(rng, 3)
    x = gaussian_noise(k1, x01, var_range)
    x = iso_noise(k2, x, intensity=intensity)
    return jpeg_compress(k3, x, quality_range)
