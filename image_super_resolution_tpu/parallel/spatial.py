"""Multi-chip spatially-sharded inference with halo exchange.

The 2-D analog of sequence/context parallelism for this conv workload
(SURVEY.md §2.11 SP row): a large image is sharded row-band-wise over the
``tile`` mesh axis; each chip upscales its band plus a ``halo`` of rows
borrowed from its neighbors over ICI (``jax.lax.ppermute``), then crops the
halo from its output. With halo >= the network's receptive-field radius the
result is bit-identical to single-chip whole-image inference; smaller halos
are a documented approximation (the 16-RRDB trunk's theoretical radius is
~248 px — SURVEY.md §5 long-context row).

This replaces the reference's only scaling story — a single-device python
tile loop (rs.py:90-111) — with an SPMD program whose communication rides
the interconnect inside one XLA program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.mesh import TILE_AXIS


def spatial_apply(
    net_apply: Callable[[Dict[str, Any], jnp.ndarray], jnp.ndarray],
    params: Dict[str, Any],
    image: jnp.ndarray,
    mesh: Mesh,
    halo: int = 32,
    scale: int = 2,
) -> jnp.ndarray:
    """Run ``net_apply(params, x)`` on an NHWC image sharded over rows.

    image: (N, H, W, C) with H divisible by the ``tile`` axis size.
    Returns (N, H*scale, W*scale, C') with the same row sharding.
    """
    n_tile = mesh.shape[TILE_AXIS]
    if image.shape[1] % n_tile:
        raise ValueError(f"H={image.shape[1]} not divisible by tile axis {n_tile}")
    band = image.shape[1] // n_tile
    if halo >= band:
        raise ValueError(f"halo {halo} must be < band height {band}")

    def local_fn(params, x):
        # x: (N, band, W, C) local shard.
        idx = jax.lax.axis_index(TILE_AXIS)
        up = [(i, i - 1) for i in range(1, n_tile)]    # send my TOP rows up
        down = [(i, i + 1) for i in range(n_tile - 1)]  # send my BOTTOM rows down

        top_rows = x[:, :halo]        # what my upper neighbor needs as its bottom halo
        bottom_rows = x[:, -halo:]    # what my lower neighbor needs as its top halo

        halo_from_above = jax.lax.ppermute(bottom_rows, TILE_AXIS, down)
        halo_from_below = jax.lax.ppermute(top_rows, TILE_AXIS, up)

        # Mesh edges receive zeros from ppermute; substitute reflect padding
        # (np.pad mode='reflect' semantics, edge row excluded) so border
        # behavior matches the single-chip reflect-tiled path bit-for-bit.
        reflect_top = x[:, 1 : halo + 1][:, ::-1]
        reflect_bottom = x[:, -halo - 1 : -1][:, ::-1]
        is_first = (idx == 0)
        is_last = (idx == n_tile - 1)
        halo_from_above = jnp.where(is_first, reflect_top, halo_from_above)
        halo_from_below = jnp.where(is_last, reflect_bottom, halo_from_below)

        extended = jnp.concatenate([halo_from_above, x, halo_from_below], axis=1)
        out = net_apply(params, extended)
        return out[:, halo * scale : (halo + band) * scale]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, TILE_AXIS)),
        out_specs=P(None, TILE_AXIS),
    )
    image = jax.device_put(image, NamedSharding(mesh, P(None, TILE_AXIS)))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return fn(params, image)
