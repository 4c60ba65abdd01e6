"""Optional Orbax checkpoint backend.

The default checkpoint format is a single msgpack file (train/checkpoint.py)
— atomic, dependency-light, and byte-stable. For production multi-host
training, Orbax adds sharded / async saves and directory-based versioning;
this module exposes the same payload through ``orbax.checkpoint`` so either
backend can restore the other's state via the common dict layout.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax


def _payload_from_state(state, epoch, mean, std, loss_history, final):
    from .checkpoint import _to_fp16  # shared fp16 storage policy

    payload: Dict[str, Any] = {
        "params": _to_fp16(jax.device_get(state.params)),
        "batch_stats": _to_fp16(jax.device_get(state.batch_stats)),
        "meta": {
            "epoch": int(epoch),
            "mean": [float(v) for v in mean],
            "std": [float(v) for v in std],
            "loss": [float(v) for v in (loss_history or [])],
            "step": int(jax.device_get(state.step)),
        },
    }
    if state.ema is not None:
        payload["ema_params"] = _to_fp16(jax.device_get(state.ema.params))
        payload["ema_batch_stats"] = _to_fp16(jax.device_get(state.ema.batch_stats))
        payload["ema_updates"] = int(jax.device_get(state.ema.updates))
    if not final:
        from flax import serialization

        payload["opt_state"] = jax.device_get(
            serialization.to_state_dict(state.opt_state)
        )
    return payload


def save_checkpoint_orbax(
    directory: str | Path, state, epoch, mean, std, loss_history=None, final=False
) -> None:
    """Save to an Orbax directory (overwritten per epoch like the reference)."""
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    payload = _payload_from_state(state, epoch, mean, std, loss_history, final)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)


def load_checkpoint_orbax(directory: str | Path) -> Dict[str, Any]:
    """Load an Orbax directory into the common checkpoint dict layout
    (consumable by train/checkpoint.resume_state)."""
    import orbax.checkpoint as ocp

    from .checkpoint import _to_fp32

    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(Path(directory).absolute())
    for key in ("params", "batch_stats", "ema_params", "ema_batch_stats"):
        if key in raw and raw[key] is not None:
            raw[key] = _to_fp32(raw[key])
    meta = raw.get("meta", {})
    raw["meta"] = {k: meta[k] for k in meta}
    return raw
