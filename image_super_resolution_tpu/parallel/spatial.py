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

from ..core.mesh import TILE_AXIS, TILE_X_AXIS, TILE_Y_AXIS


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


def _halo_exchange(x, axis_name: str, n: int, halo: int, dim: int):
    """Exchange ``halo``-wide slabs along spatial ``dim`` with both mesh
    neighbors on ``axis_name``; mesh edges get reflect padding (np.pad
    'reflect' semantics, edge row/col excluded) to match the single-chip
    reflect-padded path bit-for-bit. Returns x extended by halo on both
    sides of ``dim``."""
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]   # send my LAST slab forward
    bwd = [(i, i - 1) for i in range(1, n)]    # send my FIRST slab backward
    size = x.shape[dim]

    def take(lo, hi):
        return jax.lax.slice_in_dim(x, lo, hi, axis=dim)

    first = take(0, halo)
    last = take(size - halo, size)
    from_before = jax.lax.ppermute(last, axis_name, fwd)
    from_after = jax.lax.ppermute(first, axis_name, bwd)
    reflect_before = jnp.flip(take(1, halo + 1), axis=dim)
    reflect_after = jnp.flip(take(size - halo - 1, size - 1), axis=dim)
    from_before = jnp.where(idx == 0, reflect_before, from_before)
    from_after = jnp.where(idx == n - 1, reflect_after, from_after)
    return jnp.concatenate([from_before, x, from_after], axis=dim)


def spatial_apply_2d(
    net_apply: Callable[[Dict[str, Any], jnp.ndarray], jnp.ndarray],
    params: Dict[str, Any],
    image: jnp.ndarray,
    mesh: Mesh,
    halo: int = 32,
    scale: int = 2,
) -> jnp.ndarray:
    """2-D spatial parallelism: shard (H, W) over a (tile_y, tile_x) mesh
    (core.mesh.make_spatial_mesh) with halo exchange in BOTH dimensions.

    At 8+ devices, 1-D row bands of a square image go thin relative to the
    halo (band ~H/8 vs 2*halo of recompute); a near-square grid halves the
    halo-to-band ratio. Corner halos come for free from exchange ordering:
    the column exchange runs on the row-EXTENDED block, so the slabs
    received from x-neighbors already carry those neighbors' own row halos.

    image: (N, H, W, C), H % tile_y == 0 and W % tile_x == 0.
    Equality with single-device reflect-padded inference is tested
    (tests/test_infer.py::test_spatial_2d_matches_whole_image_reflect_pad).
    """
    n_y = mesh.shape[TILE_Y_AXIS]
    n_x = mesh.shape[TILE_X_AXIS]
    if image.shape[1] % n_y or image.shape[2] % n_x:
        raise ValueError(
            f"H={image.shape[1]}, W={image.shape[2]} not divisible by "
            f"tile grid ({n_y}, {n_x})"
        )
    band_h = image.shape[1] // n_y
    band_w = image.shape[2] // n_x
    if halo >= band_h or halo >= band_w:
        raise ValueError(f"halo {halo} must be < band ({band_h}, {band_w})")

    def local_fn(params, x):
        # x: (N, band_h, band_w, C) local shard.
        x = _halo_exchange(x, TILE_Y_AXIS, n_y, halo, dim=1)
        x = _halo_exchange(x, TILE_X_AXIS, n_x, halo, dim=2)
        out = net_apply(params, x)
        return out[
            :,
            halo * scale : (halo + band_h) * scale,
            halo * scale : (halo + band_w) * scale,
        ]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, TILE_Y_AXIS, TILE_X_AXIS)),
        out_specs=P(None, TILE_Y_AXIS, TILE_X_AXIS),
    )
    image = jax.device_put(
        image, NamedSharding(mesh, P(None, TILE_Y_AXIS, TILE_X_AXIS))
    )
    params = jax.device_put(params, NamedSharding(mesh, P()))
    return fn(params, image)
