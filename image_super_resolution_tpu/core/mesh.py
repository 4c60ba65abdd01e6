"""Device mesh and sharding foundation.

The reference trains on exactly one device (reference: train.py:179-190) and
has no distributed communication at all (SURVEY.md §2.11). Here parallelism is
first-class: a ``jax.sharding.Mesh`` with a ``data`` axis for DP training
(gradient ``psum`` rides ICI) and a ``tile`` axis for spatially-sharded
inference with halo exchange (see parallel/spatial.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TILE_AXIS = "tile"
# 2-D spatial-parallel axes (parallel/spatial.py spatial_apply_2d): at 8+
# devices 1-D row bands of a square image go thin relative to the halo, so a
# near-square (tile_y, tile_x) grid halves halo overhead.
TILE_Y_AXIS = "tile_y"
TILE_X_AXIS = "tile_x"


def distributed_init() -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    Safe no-op on a single host. The reference has no multi-host story at
    all; here DCN-connected multi-host slices work through
    ``jax.distributed.initialize`` + the same mesh abstractions.
    """
    try:
        if jax.process_count() > 1:
            return  # already initialized by the launcher
        jax.distributed.initialize()
    except Exception:
        # Single-process run (the common case in tests / single chip).
        pass


def make_mesh(
    n_data: Optional[int] = None,
    n_tile: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, tile) mesh.

    ``data`` is the DP axis (batch sharding + gradient psum), ``tile`` the
    spatial-parallel axis used by halo-exchange tiled inference. Defaults to
    all available devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    n_total = len(devices)
    if n_data is None:
        if n_total % n_tile != 0:
            raise ValueError(f"{n_total} devices not divisible by n_tile={n_tile}")
        n_data = n_total // n_tile
    use = n_data * n_tile
    if use > n_total:
        raise ValueError(f"requested {use} devices, only {n_total} available")
    dev_array = np.asarray(devices[:use]).reshape(n_data, n_tile)
    return Mesh(dev_array, (DATA_AXIS, TILE_AXIS))


def make_spatial_mesh(
    n_y: int, n_x: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D (tile_y, tile_x) mesh for spatially-sharded inference."""
    if n_y < 1 or n_x < 1:
        raise ValueError(f"spatial grid must be >= 1 per axis, got ({n_y}, {n_x})")
    if devices is None:
        devices = jax.devices()
    use = n_y * n_x
    if use > len(devices):
        raise ValueError(f"requested {use} devices, only {len(devices)} available")
    dev_array = np.asarray(devices[:use]).reshape(n_y, n_x)
    return Mesh(dev_array, (TILE_Y_AXIS, TILE_X_AXIS))


def local_mesh() -> Mesh:
    """All-device 1-D data mesh — the default for single-slice training."""
    return make_mesh(n_tile=1)


def largest_divisible_device_count(batch_size: int, n_devices: int) -> int:
    """Largest device count <= n_devices that divides batch_size — the DP
    mesh-shrink rule (keep the user's batch, drop chips only as needed;
    gcd would under-use chips, e.g. batch 6 on 8 devices: gcd 2 vs 6)."""
    return max(d for d in range(1, max(n_devices, 1) + 1) if batch_size % d == 0)


def serving_data_mesh(n_devices: int) -> Mesh:
    """Data mesh over LOCAL devices for serving paths (0 = all local).

    Serving meshes must come from ``jax.local_devices()``: ``jax.devices()``
    orders process 0's devices first, so slicing it on another process of a
    multi-process program would pick non-addressable devices. One definition
    keeps rs.py / eval.py / TiledUpscaler policy aligned.
    """
    local = jax.local_devices()
    n = n_devices or len(local)
    if n < 1:
        raise ValueError(f"data_devices must be >= 0, got {n_devices}")
    if n > len(local):
        raise ValueError(
            f"data_devices={n} but only {len(local)} local devices available"
        )
    return make_mesh(n_data=n, n_tile=1, devices=local)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, small state)."""
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard image rows (axis 1 of NHWC) over the tile axis for spatial SR."""
    return NamedSharding(mesh, P(None, TILE_AXIS))
