"""Jitted train steps, one per phase.

Each step is a single pure function (uint8 batch in, new state + metrics out)
so the entire iteration — on-device degradation, forward, backward, optimizer,
EMA — compiles into ONE XLA program. The reference's per-batch Python loop
body (train.py:50-66, 91-127) had separate host-synchronized stages.

Data parallelism: steps are written sharding-agnostic. Under a mesh, shard
the batch over the ``data`` axis (core.mesh.batch_sharding) and keep states
replicated; XLA inserts the gradient psum automatically from the shardings.
The same code runs single-chip with no mesh at all.

Phases mirror reference train.py wiring (SURVEY.md §2.6):
- pixel  : resnet pretrain (MSE, or L1 with --enchant) — train.py:258-302
- denoise: denoiser with on-device noise chain        — train.py:204-243
- gan    : SRGAN alternating G/D                      — train.py:70-129
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..data.pipeline import make_denoise_batch_fn, make_sr_batch_fn
from ..data.transforms import tanh_to_norm
from ..losses import discriminator_loss, l1_loss, mse_loss
from ..losses.perceptual import PerceptualLoss
from .state import TrainState

Metrics = Dict[str, jnp.ndarray]


def _apply_train(state: TrainState, params, x):
    """Forward in train mode, returning (out, new_batch_stats)."""
    variables = {"params": params, "batch_stats": state.batch_stats}
    out, mutated = state.apply_fn(variables, x, train=True, mutable=["batch_stats"])
    return out, mutated.get("batch_stats", state.batch_stats)


def make_pixel_train_step(
    scale: int,
    hr_mode: str = "tanh",
    pixel_loss: str = "mse",
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
    degrade_cfg=None,
) -> Callable[[TrainState, jnp.ndarray], Tuple[TrainState, Metrics]]:
    """Generator/denoiser pretraining step on uint8 HR crops."""
    from ..data.pipeline import DegradeConfig

    batch_fn = make_sr_batch_fn(
        scale, hr_mode, mean, std, degrade_cfg or DegradeConfig()
    )
    loss_fn = mse_loss if pixel_loss == "mse" else l1_loss

    @jax.jit
    def step(state: TrainState, batch_u8: jnp.ndarray) -> Tuple[TrainState, Metrics]:
        hr, lr = batch_fn(batch_u8)

        def loss(params):
            sr, new_stats = _apply_train(state, params, lr)
            return loss_fn(sr, hr), new_stats

        (loss_val, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, {"loss": loss_val}

    return step


def make_denoise_train_step(
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
) -> Callable[[TrainState, jnp.ndarray, jax.Array], Tuple[TrainState, Metrics]]:
    """Denoiser step: the noise/JPEG degradation runs on-device with its own rng."""
    batch_fn = make_denoise_batch_fn(mean, std)

    @jax.jit
    def step(
        state: TrainState, batch_u8: jnp.ndarray, rng: jax.Array
    ) -> Tuple[TrainState, Metrics]:
        hr, lr = batch_fn(rng, batch_u8)

        def loss(params):
            out, new_stats = _apply_train(state, params, lr)
            return mse_loss(out, hr), new_stats

        (loss_val, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_stats)
        return new_state, {"loss": loss_val}

    return step


def make_gan_train_step(
    scale: int,
    perceptual: PerceptualLoss,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
    degrade_cfg=None,
) -> Callable[
    [TrainState, TrainState, jnp.ndarray], Tuple[TrainState, TrainState, Metrics]
]:
    """SRGAN alternating step — G then D, compiled as one program.

    Replicates the reference loop exactly (train.py:91-127):
      sr = G(lr); sr_norm = (sr+1)/2 re-normalized with the DATASET mean/std
      (train.py:96-97); perceptual = VGG content + 1e-3 * BCE(D(sr_norm), 1);
      G adam step; then D trained on (stop_grad(sr_norm), hr_norm) with
      BCE(sr,0)+BCE(hr,1). HR arrives already normalized (set_transform_hr,
      datasets.py:339-342). Metrics use the reference's TensorBoard tags.
    """
    from ..data.pipeline import DegradeConfig

    batch_fn = make_sr_batch_fn(scale, "norm", mean, std, degrade_cfg or DegradeConfig())
    mean_t = tuple(float(v) for v in mean)
    std_t = tuple(float(v) for v in std)

    @jax.jit
    def step(
        g_state: TrainState, d_state: TrainState, batch_u8: jnp.ndarray
    ) -> Tuple[TrainState, TrainState, Metrics]:
        hr_norm, lr = batch_fn(batch_u8)

        # ---- generator update -------------------------------------------
        def g_loss(g_params):
            sr, g_stats = _apply_train(g_state, g_params, lr)
            sr_norm = tanh_to_norm(sr, mean_t, std_t)
            # D forward in train mode, but its stat updates are NOT kept for
            # the G step (reference keeps them; immaterial — D never runs in
            # eval mode. Documented deviation.)
            sr_logits, _ = _apply_train(d_state, d_state.params, sr_norm)
            perceptual_l, adv_l, content_l = perceptual(sr_norm, hr_norm, sr_logits)
            return perceptual_l, (g_stats, sr_norm, adv_l, content_l)

        (_, (g_stats, sr_norm, adv_l, content_l)), g_grads = jax.value_and_grad(
            g_loss, has_aux=True
        )(g_state.params)
        new_g = g_state.apply_gradients(g_grads, g_stats)

        # ---- discriminator update ---------------------------------------
        sr_detached = jax.lax.stop_gradient(sr_norm)

        def d_loss(d_params):
            sr_logits, d_stats = _apply_train(d_state, d_params, sr_detached)
            mid = d_state.replace(batch_stats=d_stats)
            hr_logits, d_stats = _apply_train(mid, d_params, hr_norm)
            return discriminator_loss(sr_logits, hr_logits), d_stats

        (d_loss_val, d_stats), d_grads = jax.value_and_grad(d_loss, has_aux=True)(
            d_state.params
        )
        new_d = d_state.apply_gradients(d_grads, d_stats)

        metrics = {
            "loss/content": content_l,
            "loss/adv": adv_l,
            "loss/dis": d_loss_val,
        }
        return new_g, new_d, metrics

    return step


def make_eval_step(
    scale: int,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
    degrade_cfg=None,
) -> Callable[[TrainState, jnp.ndarray], Metrics]:
    """PSNR/PSNR-Y/SSIM eval on uint8 HR crops (the loop the reference never
    had — SURVEY.md §5 metrics row)."""
    from ..data.pipeline import DegradeConfig
    from ..data.transforms import tanh_to_01
    from ..utils.metrics import psnr, psnr_y, ssim

    batch_fn = make_sr_batch_fn(scale, "tanh", mean, std, degrade_cfg or DegradeConfig())

    @jax.jit
    def step(state: TrainState, batch_u8: jnp.ndarray) -> Metrics:
        hr_tanh, lr = batch_fn(batch_u8)
        params = state.ema.params if state.ema is not None else state.params
        variables = {"params": params}
        if state.batch_stats:
            stats = state.ema.batch_stats if state.ema is not None else state.batch_stats
            variables["batch_stats"] = stats
        sr = state.apply_fn(variables, lr, train=False)
        sr01 = tanh_to_01(sr)
        hr01 = tanh_to_01(hr_tanh)
        return {
            "psnr": psnr(sr01, hr01),
            "psnr_y": psnr_y(sr01, hr01),
            "ssim": ssim(sr01, hr01),
        }

    return step
