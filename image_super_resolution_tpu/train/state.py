"""Train state, EMA, and optimizer construction.

EMA parity with the reference ModelEMA (utils/models.py:17-40): ramped decay
d(u) = decay * (1 - exp(-u / tau)) applied as an in-place lerp over the FULL
model state (params AND BN running stats), with tau = epochs * steps_per_epoch
for the SR phases (train.py:262, 308) and the 2000 default for the denoise
phase (train.py:206).

Optimizer parity with train.py:265-269: Adam(b1=0.9, b2=0.999) under a
global-norm-10 gradient clip (train.py:59) with a per-step linear LR decay
from lr to lr*lr2 over all steps (LinearLR stepped per batch, train.py:62).
No GradScaler: bf16 on TPU needs no loss scaling.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class EMAState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    updates: jnp.ndarray  # int32 step counter (reference ModelEMA.updates)


def ema_decay(updates: jnp.ndarray, tau: float, decay: float = 0.9999) -> jnp.ndarray:
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def init_ema(params: Any, batch_stats: Any) -> EMAState:
    as_f32 = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), t)
    return EMAState(as_f32(params), as_f32(batch_stats), jnp.zeros((), jnp.int32))


def ema_update(
    ema: EMAState, params: Any, batch_stats: Any, tau: float, decay: float = 0.9999
) -> EMAState:
    updates = ema.updates + 1
    d = ema_decay(updates, tau, decay)

    def lerp(e, p):
        return e * d + p.astype(e.dtype) * (1.0 - d)

    return EMAState(
        jax.tree_util.tree_map(lerp, ema.params, params),
        jax.tree_util.tree_map(lerp, ema.batch_stats, batch_stats),
        updates,
    )


class TrainState(struct.PyTreeNode):
    """One network's training state (generator, discriminator, or denoiser)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Optional[EMAState]
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_tau: float = struct.field(pytree_node=False, default=2000.0)

    def apply_gradients(self, grads: Any, new_batch_stats: Any) -> "TrainState":
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        ema = self.ema
        if ema is not None:
            ema = ema_update(ema, params, new_batch_stats, self.ema_tau)
        return self.replace(
            step=self.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            opt_state=opt_state,
            ema=ema,
        )


def build_optimizer(
    lr: float = 1e-4,
    lr2: float = 0.01,
    total_steps: int = 1,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    clip_norm: float = 10.0,
) -> optax.GradientTransformation:
    """clip_by_global_norm(10) -> Adam with linear 1 -> lr2 factor decay.

    ``weight_decay`` replicates torch.optim.Adam's COUPLED L2 semantics
    (reference train.py:265: wd*w is added to the clipped gradient BEFORE
    the moment update) — not decoupled AdamW, which would change training
    for any user passing --weight_decay. Step-parity with the reference
    optimizer is tested (tests/test_train.py)."""
    schedule = optax.linear_schedule(
        init_value=lr, end_value=lr * lr2, transition_steps=max(total_steps, 1)
    )
    chain = [optax.clip_by_global_norm(clip_norm)]
    if weight_decay > 0.0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.adam(schedule, b1=b1, b2=b2))
    return optax.chain(*chain)


def create_train_state(
    model,
    input_shape,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    ema_tau: Optional[float] = 2000.0,
    with_ema: bool = True,
) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=init_ema(params, batch_stats) if with_ema else None,
        apply_fn=model.apply,
        tx=tx,
        ema_tau=float(ema_tau or 2000.0),
    )
