"""Checkpoint save / tolerant resume / GAN warm start.

Lifecycle parity with the reference (SURVEY.md §5 checkpoint row):
- one file per phase, overwritten every epoch, named
  ``{res|gen|denoise}_{save_name}_{rs_deep}_{add_rate}.ckpt``
  (train.py:171-176);
- payload = params + EMA (+updates) + optimizer state + epoch + dataset
  mean/std + loss history (train.py:294-302, 376-387); the optimizer state is
  dropped on the final epoch like the reference (train.py:295);
- resume restores shape-matched leaves (intersect semantics,
  utils/general.py:129-131) and the optimizer/epoch only when EVERY leaf
  matched (train.py:281-285);
- the GAN phase warm-starts its generator from the pretrain phase's EMA
  weights (utils/models.py:659-665, train.py:306).

Format: a single msgpack file (flax.serialization) with fp16 param storage
matching the reference's ``.half()`` checkpoint compression (train.py:294),
plus a JSON-encoded meta blob. Atomic tmp+rename writes so a crash mid-save
never corrupts the only checkpoint.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..utils.general import intersect_trees
from .state import TrainState, init_ema


def checkpoint_name(phase: str, save_name: str, depth: int, add_rate: float) -> str:
    prefix = {"pixel": "res", "gan": "gen", "denoise": "denoise"}[phase]
    return f"{prefix}_{save_name}_{depth}_{add_rate}.ckpt"


def _to_fp16(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: x.astype(np.float16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _fetch_fp16(tree: Any) -> Any:
    """device tree -> host fp16 numpy, casting ON DEVICE first.

    The checkpoint stores fp16 anyway (reference .half() parity); casting
    before the fetch halves the host<->device wire traffic — significant
    through a ~34 ms-RTT PJRT relay where per-epoch GAN saves move hundreds
    of MB (measured ~80 s/epoch fetched fp32, PERF.md).
    """
    casted = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
    return jax.tree_util.tree_map(np.asarray, jax.device_get(casted))


def _to_fp32(tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: x.astype(np.float32)
        if hasattr(x, "dtype") and x.dtype == np.float16
        else x,
        tree,
    )


def save_checkpoint(
    path: str | Path,
    state: TrainState,
    epoch: int,
    mean,
    std,
    loss_history=None,
    final: bool = False,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    payload: Dict[str, Any] = {
        "params": _fetch_fp16(state.params),
        "batch_stats": _fetch_fp16(state.batch_stats),
        "meta": json.dumps(
            {
                "epoch": int(epoch),
                "mean": [float(v) for v in mean],
                "std": [float(v) for v in std],
                "loss": [float(v) for v in (loss_history or [])],
                "step": int(jax.device_get(state.step)),
            }
        ),
    }
    if state.ema is not None:
        payload["ema_params"] = _fetch_fp16(state.ema.params)
        payload["ema_batch_stats"] = _fetch_fp16(state.ema.batch_stats)
        payload["ema_updates"] = int(jax.device_get(state.ema.updates))
    if not final:  # reference drops optimizer state on the last epoch
        # Optimizer moments stay fp32: Adam's second moment underflows fp16.
        payload["opt_state"] = jax.device_get(
            serialization.to_state_dict(state.opt_state)
        )
    for k, v in (extra or {}).items():
        payload[k] = v

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.msgpack_serialize(payload)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(blob)
    old = path.with_name(path.name + ".old")
    if path.is_dir():
        # A previous run with --ckpt_backend orbax left a checkpoint
        # DIRECTORY at this name (os.replace onto it would raise); swap it
        # out with the same two-rename dance the orbax saver uses, so no
        # instant is left without a checkpoint on disk.
        import shutil

        if old.exists():
            shutil.rmtree(old) if old.is_dir() else old.unlink()
        path.rename(old)
        os.replace(tmp, path)
        shutil.rmtree(old)
    else:
        os.replace(tmp, path)
        if old.is_dir():
            # stale survivor of an orbax-era crash, superseded by this save
            import shutil

            shutil.rmtree(old)


def load_checkpoint(path: str | Path) -> Dict[str, Any]:
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    raw["meta"] = json.loads(raw["meta"])
    for key in ("params", "batch_stats", "ema_params", "ema_batch_stats"):
        if key in raw:
            raw[key] = _to_fp32(raw[key])
    return raw


def resume_state(
    state: TrainState, ckpt: Dict[str, Any], verbose: bool = True,
    epoch_policy: str = "opt",
) -> Tuple[TrainState, int]:
    """Tolerant resume. Returns (state, start_epoch).

    ``epoch_policy`` mirrors the reference's THREE per-phase rules for
    continuing the epoch counter when resuming (the final-epoch checkpoint
    drops optimizer state in both codebases):

    - ``"opt"``    — continue only when the optimizer chain was restored
      (denoise phase, /root/reference/train.py:217-219: ``start_epoch``
      is set inside ``if ckpt['optimizer'] is not None``); a final
      checkpoint restarts at epoch 0.
    - ``"matched"`` — continue whenever every parameter matched, optimizer
      restored or not (pixel phase, /root/reference/train.py:282-285:
      ``start_epoch`` is set under the full-match check but OUTSIDE the
      optimizer-presence check). Resuming a completed run with the same
      ``--epochs`` is therefore a no-op, and a larger ``--epochs`` tops
      the run up with a fresh optimizer.
    - ``"always"`` — continue unconditionally (GAN phase,
      /root/reference/train.py:337-346: no match guard at all).
    """
    params, matched, total = intersect_trees(ckpt["params"], state.params)
    stats, _, _ = intersect_trees(ckpt.get("batch_stats", {}), state.batch_stats)
    as_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    state = state.replace(params=as_dev(params), batch_stats=as_dev(stats))

    if state.ema is not None and "ema_params" in ckpt:
        e_params, _, _ = intersect_trees(ckpt["ema_params"], state.ema.params)
        e_stats, _, _ = intersect_trees(
            ckpt.get("ema_batch_stats", {}), state.ema.batch_stats
        )
        state = state.replace(
            ema=state.ema.replace(
                params=as_dev(e_params),
                batch_stats=as_dev(e_stats),
                updates=jnp.asarray(ckpt.get("ema_updates", 0), jnp.int32),
            )
        )

    start_epoch = 0
    if matched == total and "opt_state" in ckpt:
        try:
            opt_state = serialization.from_state_dict(
                state.opt_state, ckpt["opt_state"]
            )
        except (ValueError, KeyError) as e:
            # e.g. a checkpoint saved before the coupled-L2 weight-decay fix
            # serialized a different optax chain structure — resume the
            # WEIGHTS tolerantly instead of crashing, like a final-epoch
            # checkpoint (fresh optimizer, epochs restart).
            print(
                "WARNING: optimizer state in checkpoint is incompatible with "
                f"the current optimizer ({e}); resuming weights only"
            )
        else:
            state = state.replace(
                opt_state=opt_state,
                step=jnp.asarray(ckpt["meta"].get("step", 0), jnp.int32),
            )
            start_epoch = int(ckpt["meta"]["epoch"]) + 1
    if start_epoch == 0 and "epoch" in ckpt.get("meta", {}):
        if epoch_policy == "always" or (
            epoch_policy == "matched" and matched == total
        ):
            start_epoch = int(ckpt["meta"]["epoch"]) + 1
    if verbose:
        print(f"Loaded pre-trained {matched}/{total} model")
    return state, start_epoch


def warm_start_generator(
    g_state: TrainState, pretrain_ckpt_path: str | Path, verbose: bool = True,
    load_fn=None,
) -> TrainState:
    """Initialize the GAN generator from the pretrain phase's EMA weights.

    ``load_fn`` selects the checkpoint backend (default msgpack
    ``load_checkpoint``; the CLI passes the Orbax loader under
    ``--ckpt_backend orbax``)."""
    try:
        ckpt = (load_fn or load_checkpoint)(pretrain_ckpt_path)
    except Exception:
        if verbose:
            print("Could not load pretrain checkpoint.")
        return g_state
    source = ckpt.get("ema_params", ckpt.get("params"))
    params, matched, total = intersect_trees(source, g_state.params)
    stats_src = ckpt.get("ema_batch_stats", ckpt.get("batch_stats", {}))
    stats, _, _ = intersect_trees(stats_src, g_state.batch_stats)
    as_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    params, stats = as_dev(params), as_dev(stats)
    state = g_state.replace(params=params, batch_stats=stats)
    if state.ema is not None:
        state = state.replace(ema=init_ema(params, stats))
    if verbose:
        print(f"loaded pre-trained generator ({matched}/{total} leaves)")
    return state


def checkpoint_exists(path: str | Path) -> bool:
    """True if a checkpoint can be loaded from ``path`` — including an Orbax
    directory parked at ``<path>.old`` by a crash between the save-swap's
    two renames (orbax_io.save_checkpoint_orbax). Resume gates must use
    this rather than ``path.exists()`` or the crash-recovery path is
    unreachable (the run would restart from scratch instead of resuming
    from the survivor, which the next save then overwrites)."""
    p = Path(path)
    return p.exists() or p.with_name(p.name + ".old").is_dir()


def load_any_checkpoint(path: str | Path) -> Dict[str, Any]:
    """Backend-agnostic load: an Orbax checkpoint is a DIRECTORY, a msgpack
    checkpoint is a file — dispatch on which one ``path`` is, so consumers
    (export, eval) accept either format without a flag. A missing path with
    an Orbax ``.old`` sibling reads the survivor IN PLACE (crash between the
    save-swap's renames) — loads never mutate disk, because a rename here
    races concurrent loaders and an in-flight save's swap window; the next
    save (orbax_io.save_checkpoint_orbax) promotes ``.old`` back itself."""
    p = Path(path)
    old = p.with_name(p.name + ".old")
    if not p.exists() and old.is_dir():
        p = old
    if p.is_dir():
        from .orbax_io import load_checkpoint_orbax

        return load_checkpoint_orbax(p)
    return load_checkpoint(p)
