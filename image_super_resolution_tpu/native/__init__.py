"""ctypes binding for the native C++ loader (native/loader.cpp).

Builds lazily with g++ on first use (cached next to the source, keyed on the
source mtime) and degrades gracefully: ``available()`` returns False when the
toolchain or libjpeg/libpng are absent, and data/pipeline.py falls back to
its pure-Python (cv2/PIL) backend. Nothing here imports jax — the loader is
pure host-side runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).with_name("loader.cpp")
_SO = Path(__file__).with_name("_isr_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    # Compile to a process-unique temp name, then os.replace (atomic on
    # POSIX): concurrent first-use from several processes must never dlopen
    # a half-written .so.
    tmp = _SO.with_name(f".{_SO.name}.{os.getpid()}.tmp")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(tmp), "-ljpeg", "-lpng", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        tmp.unlink(missing_ok=True)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("ISR_NO_NATIVE"):
            return None
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                if not _build():
                    return None
            lib = ctypes.CDLL(str(_SO))
            lib.isr_version.restype = ctypes.c_int
            lib.isr_decode_dims.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.isr_decode_rgb.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
            ]
            lib.isr_load_patches.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            lib.isr_load_patches.restype = ctypes.c_int
            if lib.isr_version() != 2:
                return None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    """True when the native loader compiled and loaded on this host."""
    return _load() is not None


def decode_rgb(path: str) -> Optional[np.ndarray]:
    """Decode a JPEG/PNG to an (H, W, 3) uint8 RGB array; None on failure."""
    lib = _load()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    p = str(path).encode()
    if lib.isr_decode_dims(p, ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.isr_decode_rgb(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h.value, w.value
    )
    return out if rc == 0 else None


def load_patches(
    paths: Sequence[str], patch: int, seeds: Sequence[int], threads: int = 4
) -> Optional[np.ndarray]:
    """Batched decode + seeded random crop into one (N, patch, patch, 3)
    uint8 array. Slots the C++ library cannot decode (formats beyond
    JPEG/PNG — bmp/webp/tiff/... — or corrupt files) are re-decoded in
    Python (cv2/PIL) per image; only images unreadable by BOTH backends
    become zero patches, with a warning (matching the Python backend's
    train-time substitution). None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    assert len(seeds) == n
    out = np.empty((n, patch, patch, 3), np.uint8)
    status = np.zeros(n, np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_seeds = np.ascontiguousarray(np.asarray(seeds, np.uint64))
    not_ok = lib.isr_load_patches(
        c_paths,
        n,
        patch,
        c_seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        int(threads),
    )
    if not_ok:
        # Python fallback per not-OK slot (lazy import: pipeline imports us).
        from ..data.pipeline import _random_crop, _read_rgb

        unreadable = []
        for i in np.nonzero(status)[0]:
            img = _read_rgb(str(paths[i]))
            if img is None:
                unreadable.append(str(paths[i]))  # stays a zero patch
                continue
            rng = np.random.default_rng(np.uint64(seeds[i]))
            out[i] = _random_crop(img, patch, rng)
        if unreadable:
            import warnings

            warnings.warn(
                f"{len(unreadable)} image(s) unreadable by both the native "
                f"and Python decoders; substituted zero patches "
                f"(first: {unreadable[0]})"
            )
    return out
