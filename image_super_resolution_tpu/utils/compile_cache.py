"""Persistent XLA compilation cache across CLI invocations.

The reference runs eager torch/CUDA and pays no compile cost; under jit
the first call compiles the whole serving or train-step graph (~20-40 s
on a TPU chip). Every CLI here is a short-lived process (rs.py per
image/folder/video, eval.py, export.py smoke paths, train.py restarts),
so without persistence each invocation pays that cost again. JAX's
persistent compilation cache — keyed on the HLO, compile options, and
platform version — makes repeat invocations skip straight to execution.

No reference counterpart (torch caches nothing across processes;
/root/reference/rs.py:16-27 just loads weights): this is TPU-native
ergonomics for the same repeat-CLI workflow.
"""

from __future__ import annotations

import os
from pathlib import Path

_DISABLE = {"", "0", "none", "off", "false", "disable", "disabled"}

#: Used when neither the --compile_cache flag nor $ISR_COMPILE_CACHE is set.
DEFAULT_DIR = "~/.cache/image_super_resolution_tpu/xla_cache"

#: LRU size cap for the cache directory (JAX evicts least-recently-used
#: entries past this). Override with $ISR_COMPILE_CACHE_MAX_BYTES
#: (-1 = unbounded). A single serving graph is ~10-100 MB serialized, so
#: 4 GiB holds every shape/model variant a workstation realistically cycles
#: through while bounding ~/.cache growth on long-lived production hosts.
DEFAULT_MAX_BYTES = 4 << 30


def resolve_max_bytes() -> int:
    """Cache size cap: $ISR_COMPILE_CACHE_MAX_BYTES or DEFAULT_MAX_BYTES."""
    raw = os.environ.get("ISR_COMPILE_CACHE_MAX_BYTES")
    if raw is None:
        return DEFAULT_MAX_BYTES
    try:
        return int(raw)
    except ValueError:
        return DEFAULT_MAX_BYTES


def resolve_cache_dir(cache_dir: str | None = None) -> str | None:
    """Resolve the cache directory without touching JAX.

    Resolution order: explicit value -> $ISR_COMPILE_CACHE -> DEFAULT_DIR.
    Any of them set to "off"/"none"/"0" (case-insensitive) disables the
    cache and resolves to None.
    """
    resolved = cache_dir
    if resolved is None:
        resolved = os.environ.get("ISR_COMPILE_CACHE")
    if resolved is None:
        resolved = DEFAULT_DIR
    if str(resolved).strip().lower() in _DISABLE:
        return None
    return str(Path(resolved).expanduser())


def _backfill_atimes(path: str) -> None:
    """Give legacy cache entries the ``-atime`` companion the LRU needs.

    Entries written while the cache was unbounded have no ``-atime`` file;
    JAX's LRUCache reads one for EVERY ``*-cache`` entry during eviction, so
    a single legacy entry makes every subsequent put() fail (surfacing as a
    "FileNotFoundError: ...-atime" warning and a cache that never grows).
    Stamp missing ones with the entry file's mtime for a truthful LRU order.
    """
    try:
        names = os.listdir(path)
    except OSError:
        return
    have = set(names)
    for name in names:
        if not name.endswith("-cache"):
            continue
        atime_name = name[: -len("-cache")] + "-atime"
        if atime_name in have:
            continue
        entry = Path(path) / name
        try:
            stamp = int(entry.stat().st_mtime_ns).to_bytes(8, "little")
            (Path(path) / atime_name).write_bytes(stamp)
        except (OSError, OverflowError):  # pragma: no cover - racing eviction
            pass


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at the resolved directory.

    Must run before the process's first jit compilation to cover it (later
    compilations are still cached); calling again is safe. Returns the
    directory in use, or None when disabled or unusable (an unwritable
    location falls back to running uncached rather than failing — the
    cache is an accelerator, never a requirement).
    """
    path = resolve_cache_dir(cache_dir)
    if path is None:
        return None
    try:
        Path(path).mkdir(parents=True, exist_ok=True)
    except OSError:
        return None
    import jax

    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
        # JAX opens the file cache at most once per process, at the first
        # compile; a later dir change is silently ignored unless the cache
        # object is dropped. Matters for library use (a host process that
        # already jitted something before calling into us).
        try:
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:  # pragma: no cover - private API moved/absent
            pass
    # The LRU bound is read when JAX (re)opens the file cache.
    max_bytes = resolve_max_bytes()
    jax.config.update("jax_compilation_cache_max_size", max_bytes)
    if max_bytes != -1:
        _backfill_atimes(path)
    return path
