"""Device-side image transforms (pure jnp, NHWC).

TPU-native equivalents of the reference's torch transform Modules
(utils/datasets.py:50-166) and I/O adapters (utils/models.py:409-451). These
run *inside* jit on device — the reference ran them per-sample on CPU
dataloader workers.

Behavior contracts replicated exactly (SURVEY.md §7):
- normalize: uint8 -> /255 -> (x - mean) / std   (datasets.py:50-71)
- to_tanh: x/255 * 2 - 1                          (datasets.py:96-106)
- tanh_to_uint8: round((x+1)/2 * 255), banker's rounding like torch
  (utils/models.py:443-451 — baked into the deployed artifact)
- tanh_to_norm: tanh -> [0,1] -> (x - mean)/std   (utils/models.py:409-419,
  the GAN phase's re-normalization dance, train.py:96-97)
- y_channel: ITU-R BT.601 Y with 4-px border crop (datasets.py:159-166; the
  standard SR PSNR-on-Y transform — defined but never used in the reference;
  here it feeds the eval loop).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _c(vals: Sequence[float], dtype) -> jnp.ndarray:
    return jnp.asarray(vals, dtype=dtype).reshape((1,) * 3 + (-1,))[0]  # (1,1,C) broadcast


def to_float01(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] (or float) -> float [0,1]."""
    if x.dtype == jnp.uint8:
        return x.astype(dtype) / 255.0
    return x.astype(dtype)


def normalize(
    x: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    """uint8/float image -> ((x/255) - mean) / std, channels-last."""
    x = to_float01(x)
    return (x - _c(mean, x.dtype)) / _c(std, x.dtype)


def denormalize(
    x: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    max_pixel_value: float = 255.0,
) -> jnp.ndarray:
    """Inverse of normalize, back to [0, max_pixel_value]."""
    return (x * _c(std, x.dtype) + _c(mean, x.dtype)) * max_pixel_value


def to_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """uint8/[0,1] float -> [-1, 1]."""
    return to_float01(x) * 2.0 - 1.0


def tanh_to_01(x: jnp.ndarray) -> jnp.ndarray:
    return (x + 1.0) / 2.0


def tanh_to_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] -> uint8 with round-half-to-even (torch .round() semantics)."""
    y = jnp.clip(tanh_to_01(x) * 255.0, 0.0, 255.0)
    return jnp.round(y).astype(jnp.uint8)


def tanh_to_norm(
    x: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> jnp.ndarray:
    """tanh output -> [0,1] -> (x - mean)/std (GAN-phase re-normalization)."""
    y = tanh_to_01(x)
    return (y - _c(mean, y.dtype)) / _c(std, y.dtype)


def rgb_to_bgr(x: jnp.ndarray) -> jnp.ndarray:
    """Swap the channel order (last axis), any rank."""
    return x[..., ::-1]


def decode_prediction(x: jnp.ndarray) -> jnp.ndarray:
    """Model output (auto-detected tanh [-1,1] or [0,1]) -> rounded [0,255].

    Parity with the reference's Decode_tensor_from_predict
    (utils/datasets.py:127-140), without its sticky first-call state: the
    range is detected per call (jit-safe via where, no python branch)."""
    is_tanh = jnp.min(x) < 0.0
    x01 = jnp.where(is_tanh, (x + 1.0) / 2.0, x)
    return jnp.round(jnp.clip(x01 * 255.0, 0.0, 255.0))


def to_pil_images(tanh_batch) -> list:
    """[-1,1] NHWC batch -> list of PIL images (reference Tanh2PIL,
    utils/models.py:422-440). Host-side utility."""
    from PIL import Image
    import numpy as np

    arr = np.asarray(tanh_to_uint8(jnp.asarray(tanh_batch)))
    if arr.ndim == 3:
        arr = arr[None]
    return [Image.fromarray(frame) for frame in arr]


def color_jitter(
    rng,
    x01: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    p: float = 0.5,
) -> jnp.ndarray:
    """Per-image probabilistic brightness/contrast/saturation jitter on an
    NHWC [0,1] batch — on-device analog of the reference's (never-wired)
    ColorJitter (utils/datasets.py:169-215), available as a training aug."""
    import jax

    n = x01.shape[0]
    k_apply, k_b, k_c, k_s = jax.random.split(rng, 4)
    apply = jax.random.uniform(k_apply, (n, 1, 1, 1)) <= p

    def factor(key, strength):
        return jax.random.uniform(
            key, (n, 1, 1, 1), minval=1.0 - strength, maxval=1.0 + strength
        )

    y = x01 * factor(k_b, brightness)  # brightness
    mean_lum = y.mean(axis=(1, 2, 3), keepdims=True)
    y = (y - mean_lum) * factor(k_c, contrast) + mean_lum  # contrast
    gray = y.mean(axis=-1, keepdims=True)
    y = (y - gray) * factor(k_s, saturation) + gray  # saturation
    y = jnp.clip(y, 0.0, 1.0)
    return jnp.where(apply, y, x01)


def y_channel(x01: jnp.ndarray, border: int = 4) -> jnp.ndarray:
    """ITU-R BT.601 luma from an NHWC [0,1] batch, cropping ``border`` px.

    y = (255*x) . [65.481, 128.553, 24.966] / 255 + 16, the standard
    SR-evaluation Y channel (in [16, 235]).
    """
    w = jnp.asarray([65.481, 128.553, 24.966], x01.dtype)
    if border:
        x01 = x01[:, border:-border, border:-border, :]
    return (255.0 * x01) @ w / 255.0 + 16.0
