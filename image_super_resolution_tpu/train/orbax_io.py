"""Optional Orbax checkpoint backend.

The default checkpoint format is a single msgpack file (train/checkpoint.py)
— atomic, dependency-light, and byte-stable. Orbax stores the SAME payload
as a directory tree instead (``orbax.checkpoint.PyTreeCheckpointer``), which
some fleets prefer for tooling reasons; ``cli/train.py --ckpt_backend orbax``
switches saves and resume to this module.

Scope and semantics (matching the msgpack path exactly):
- per-epoch overwrite of one directory per phase, reference lifecycle;
- fp16 param storage, optimizer state dropped on the final epoch;
- GAN extras (discriminator params/stats/optimizer) via ``extra``;
- in multi-host runs process 0 is the only writer (the CLI gates the call)
  and resume broadcasts proc 0's loaded state to every host — the same
  one-writer rule the msgpack path uses, exercised end-to-end by the
  2-process run in tests/test_multihost.py.

Both backends load into the common checkpoint dict layout, so
``train.checkpoint.resume_state`` / ``warm_start_generator`` consume either.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax


def _payload_from_state(
    state, epoch, mean, std, loss_history, final,
    extra: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    from .checkpoint import _fetch_fp16  # shared fp16 storage policy

    payload: Dict[str, Any] = {
        "params": _fetch_fp16(state.params),
        "batch_stats": _fetch_fp16(state.batch_stats),
        "meta": {
            "epoch": int(epoch),
            "mean": [float(v) for v in mean],
            "std": [float(v) for v in std],
            "loss": [float(v) for v in (loss_history or [])],
            "step": int(jax.device_get(state.step)),
        },
    }
    if state.ema is not None:
        payload["ema_params"] = _fetch_fp16(state.ema.params)
        payload["ema_batch_stats"] = _fetch_fp16(state.ema.batch_stats)
        payload["ema_updates"] = int(jax.device_get(state.ema.updates))
    if not final:  # reference drops optimizer state on the last epoch
        from flax import serialization

        payload["opt_state"] = jax.device_get(
            serialization.to_state_dict(state.opt_state)
        )
    for k, v in (extra or {}).items():
        payload[k] = v
    return payload


def _remove_any(path: Path) -> None:
    """Remove a checkpoint at ``path`` whatever its format — an Orbax
    DIRECTORY or a msgpack FILE left by a run with the other
    ``--ckpt_backend`` (rmtree alone raises NotADirectoryError on files)."""
    import shutil

    if path.is_dir():
        shutil.rmtree(path)
    elif path.exists():
        path.unlink()


def _local_checkpointer():
    """A Checkpointer whose barriers involve ONLY the calling process.

    The payload is host-local numpy by the time orbax sees it (fetched via
    the shared fp16 policy), and the CLI's one-writer rule means only
    process 0 calls save in multi-host runs — but orbax's default
    ``Checkpointer`` calls ``sync_global_processes`` across ALL processes
    when ``jax.process_count() > 1``, so a proc-0-only save would block at
    that barrier forever. Scoping ``active_processes`` to the caller makes
    the save/restore single-process, which is exactly the msgpack path's
    semantics this backend mirrors.
    """
    import orbax.checkpoint as ocp

    me = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"isr_ckpt_p{me}",
        ),
    )


def save_checkpoint_orbax(
    directory: str | Path, state, epoch, mean, std, loss_history=None,
    final: bool = False, extra: Optional[Dict[str, Any]] = None,
) -> None:
    """Save to an Orbax directory (overwritten per epoch like the reference).

    Same signature as ``checkpoint.save_checkpoint`` so the CLI can switch
    backends with one name binding. Call on ONE process in multi-host runs.
    """
    path = Path(directory).absolute()
    payload = _payload_from_state(state, epoch, mean, std, loss_history,
                                  final, extra)
    # Crash-safe overwrite. Orbax's own ``save(force=True)`` rmtree's the
    # existing checkpoint BEFORE serializing the new one (verified in orbax
    # 0.11.32), so a crash mid-save would destroy the phase's ONLY
    # checkpoint — the exact guarantee the msgpack backend's tmp+os.replace
    # provides. Write to a sibling tmp dir, then swap with two renames: at
    # every instant either the old or the new checkpoint exists on disk.
    tmp = path.with_name(path.name + ".tmp")
    old = path.with_name(path.name + ".old")
    # A crash between a previous save's two renames can leave the phase's
    # ONLY checkpoint parked at .old — promote it back before the stale
    # cleanup below would delete it. Loads read .old in place and never
    # rename (they must not mutate disk); this, the single write path
    # (the CLI gates saves to one process), owns the recovery rename.
    if old.exists() and not path.exists():
        old.rename(path)
    for stale in (tmp, old):  # leftovers from a previous crash — either a
        _remove_any(stale)  # dir (orbax) or a FILE (a msgpack-era .ckpt)
    _local_checkpointer().save(tmp, payload, force=True)
    if path.exists():  # a dir, or a msgpack file when --ckpt_backend changed
        path.rename(old)
    tmp.rename(path)
    _remove_any(old)


def load_checkpoint_orbax(directory: str | Path) -> Dict[str, Any]:
    """Load an Orbax directory into the common checkpoint dict layout
    (consumable by train/checkpoint.resume_state)."""
    from .checkpoint import _to_fp32

    path = Path(directory).absolute()
    if not path.exists():
        # A crash between the save's two renames leaves the previous
        # checkpoint at .old — read it IN PLACE rather than failing the
        # resume. No rename here: a load-path rename races concurrent
        # loaders (two resuming hosts on a shared FS) and an in-flight
        # save's swap window; the next save promotes .old back itself.
        old = path.with_name(path.name + ".old")
        if old.is_dir():
            path = old
    raw = _local_checkpointer().restore(path)
    for key in ("params", "batch_stats", "ema_params", "ema_batch_stats",
                "d_params", "d_batch_stats"):
        if key in raw and raw[key] is not None:
            raw[key] = _to_fp32(raw[key])
    meta = raw.get("meta", {})
    raw["meta"] = {k: meta[k] for k in meta}
    return raw
