"""Batched tiled inference engine over a deployed model.

Replaces the reference's per-tile python loop with autocast + CPU stitching
(rs.py:90-111): tiles are batched into one compiled program, stitched with
overlap cropping (infer/tiling.py), and optionally sharded across chips —
either by batch (data axis) or by image rows with halo exchange
(parallel/spatial.py) for single huge images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.deploy import DeployedModel
from .tiling import upscale_tiled


def _xla_runtime_errors() -> tuple:
    """Exception classes that can carry a device OOM. Narrow on purpose: an
    unrelated Python error that merely QUOTES 'Out of memory' must not latch
    the engine into tiling mode."""
    errs = []
    try:
        from jax.errors import JaxRuntimeError

        errs.append(JaxRuntimeError)
    except ImportError:
        pass
    try:
        from jaxlib.xla_extension import XlaRuntimeError

        errs.append(XlaRuntimeError)
    except ImportError:
        pass
    return tuple(errs) or (RuntimeError,)


def _check_reflect_fit(dims, pads, grid_desc: str, halo: int) -> None:
    """np.pad(mode='reflect') requires pad <= dim-1; images small relative to
    the device grid / halo would otherwise crash deep inside numpy with an
    unhelpful message (or be silently skipped in folder-batch mode)."""
    for size, pad in zip(dims, pads):
        if pad > size - 1:
            overlap_hint = (
                " or a smaller --overlap" if halo > 8 else
                " (the halo is floored at 8 px, so --overlap cannot go lower)"
            )
            raise ValueError(
                f"image dimension {size} px is too small for {grid_desc} with "
                f"halo {halo} (needs {pad} px of reflect padding, max is "
                f"{size - 1}); use fewer spatial devices{overlap_hint}, or "
                f"the tiled/data-axis path for small images"
            )


class TiledUpscaler:
    def __init__(
        self,
        deployed: DeployedModel,
        window: int = 96,
        overlap: int = 8,
        batch_size: int = 8,
        spatial_devices: int = 1,
        data_devices: int = 1,
        spatial_grid=None,
    ):
        """window=0 selects whole-image (untiled) inference — fastest when
        the image fits HBM (no overlap recompute, one dispatch).

        ``data_devices > 1`` shards tile/frame BATCHES over a ``data`` mesh
        axis (the serving analog of DP training): each tile batch in
        ``upscale_image`` and each frame batch in ``upscale_batch`` splits
        across chips, with XLA keeping the whole computation on-device.
        Mutually exclusive with ``spatial_devices`` (which row-shards ONE
        huge image with halo exchange instead); ``data_devices=0`` means
        all local devices.

        ``spatial_grid=(ny, nx)`` is the 2-D generalization of
        ``spatial_devices``: shard ONE image over a (tile_y, tile_x) device
        grid with halo exchange in both dimensions — at 8+ devices a
        near-square grid halves halo overhead vs 1-D row bands.
        """
        self.deployed = deployed
        self.window = window
        self.overlap = overlap
        self.batch_size = batch_size
        self.spatial_devices = spatial_devices
        self.spatial_grid = tuple(spatial_grid) if spatial_grid else None
        # downshuffle>1 models (denoise_fast) are translation-variant with
        # period f: every tile must start on the same f-grid as the image
        # origin or adjacent tiles are computed on different space_to_depth
        # phases (visible seams). window/overlap multiples of f keep every
        # fixed-grid tile position (k*stride - overlap) on phase 0; spatial
        # band sharding cannot guarantee band offsets on the grid at all, so
        # it is rejected here at the engine (not just the CLI).
        # Geometry that plan_tiles would reject deep inside upscale_image
        # (where folder-batch mode downgrades it to a per-image warning)
        # fails at construction instead, where the CLI turns it into a
        # clean one-line exit.
        if self.overlap < 0:
            raise ValueError(f"overlap must be >= 0, got {self.overlap}")
        if self.window and self.overlap * 2 >= self.window:
            raise ValueError(
                f"need overlap < window/2, got {self.overlap}/{self.window}"
            )
        self._grid = getattr(getattr(deployed, "spec", None),
                             "downshuffle", 1) or 1
        if self._grid > 1:
            if spatial_devices > 1 or self.spatial_grid not in (None, (1, 1)):
                raise ValueError(
                    "spatial sharding cannot serve a downshuffle>1 artifact "
                    "(denoise_fast): band offsets shift the model's "
                    "space_to_depth grid; use data_devices instead"
                )
            if self.window and self.window % self._grid:
                raise ValueError(
                    f"window {self.window} must be a multiple of the "
                    f"artifact's downshuffle factor {self._grid} so tiles "
                    f"stay on the model's space_to_depth grid"
                )
            if self.overlap % self._grid:
                raise ValueError(
                    f"overlap {self.overlap} must be a multiple of the "
                    f"artifact's downshuffle factor {self._grid} so tiles "
                    f"stay on the model's space_to_depth grid"
                )
        if self.spatial_grid:
            if min(self.spatial_grid) < 1:
                raise ValueError(
                    f"spatial_grid must be >= 1 per axis, got {self.spatial_grid}"
                )
            if self.spatial_grid == (1, 1):
                self.spatial_grid = None  # single device: plain path
        self._spatial_mesh = None
        self._spatial_mesh_2d = None
        if data_devices == 0:
            data_devices = jax.local_device_count()
        self.data_devices = data_devices
        self._data_sharding = None
        self._chunk_sharding = None
        n_modes = sum(
            [spatial_devices > 1, data_devices > 1, self.spatial_grid is not None]
        )
        if n_modes > 1:
            raise ValueError(
                "spatial_devices, spatial_grid, and data_devices are mutually "
                "exclusive: shard one huge image (1-D rows or 2-D grid) OR "
                "batch-shard many tiles/frames"
            )
        # Serving meshes are built from LOCAL devices: jax.devices() orders
        # process 0's devices first, so slicing it on another process of a
        # multi-process program would pick non-addressable devices and
        # device_put would fail.
        if self.spatial_grid is not None:
            from ..core.mesh import make_spatial_mesh

            self._spatial_mesh_2d = make_spatial_mesh(
                *self.spatial_grid, devices=jax.local_devices()
            )
        elif spatial_devices > 1:
            from ..core.mesh import make_mesh

            self._spatial_mesh = make_mesh(
                n_data=1, n_tile=spatial_devices, devices=jax.local_devices()
            )
        elif data_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..core.mesh import DATA_AXIS, batch_sharding, serving_data_mesh

            mesh = serving_data_mesh(data_devices)
            self._data_sharding = batch_sharding(mesh)
            # tile chunks are (n_chunks, batch, h, w, c): shard the
            # WITHIN-chunk batch dim so lax.map over chunks keeps every
            # device busy on every dispatch
            self._chunk_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
            # equal per-device work requires batch % data_devices == 0
            self.batch_size = -(-batch_size // data_devices) * data_devices

    # -- whole frames (video path): fixed shape, one compiled program -------
    def upscale_batch_device(self, batch_u8: np.ndarray):
        """Dispatch only: uint8 NHWC in -> (device result, n_input_frames).

        Returns without the blocking host fetch, so callers can pipeline —
        fetch/encode batch k-1 on the host while batch k computes on the
        device (cli/rs.py video path). Call ``np.asarray(out)[:n]`` to
        materialize."""
        n = batch_u8.shape[0]
        if self._data_sharding is None:
            return self.deployed(jnp.asarray(batch_u8)), n
        pad = -n % self.data_devices
        if pad:  # fixed per-device shapes: repeat the last frame, crop after
            batch_u8 = np.concatenate(
                [batch_u8, np.repeat(batch_u8[-1:], pad, axis=0)]
            )
        # device_put straight from numpy: each shard ships host->device once
        # (jnp.asarray first would copy the whole batch to device 0 and then
        # reshard device-to-device — double transfer in a relay-bound env).
        arr = jax.device_put(np.ascontiguousarray(batch_u8), self._data_sharding)
        return self.deployed(arr), n

    def upscale_batch(self, batch_u8: np.ndarray) -> np.ndarray:
        """uint8 NHWC RGB -> uint8 NHWC RGB at the model scale."""
        out, n = self.upscale_batch_device(batch_u8)
        return np.asarray(out)[:n]

    # -- arbitrary-size single images: overlap tiling ------------------------
    def upscale_image(self, image_u8: np.ndarray) -> np.ndarray:
        """uint8 HWC RGB of any size -> uint8 HWC RGB."""
        if self._spatial_mesh_2d is not None:
            return self._upscale_spatial_2d(image_u8)
        if self._spatial_mesh is not None:
            return self._upscale_spatial(image_u8)
        if self.window == 0:  # whole-image mode
            try:
                return np.asarray(self.deployed(jnp.asarray(image_u8[None])))[0]
            except _xla_runtime_errors() as e:  # HBM OOM on huge images: tile
                msg = str(e)
                if "RESOURCE_EXHAUSTED" not in msg and "Out of memory" not in msg:
                    raise
                import warnings

                warnings.warn(
                    f"whole-image inference exhausted device memory for "
                    f"{image_u8.shape}; falling back to overlap tiling "
                    f"(latched for this engine)"
                )
                # latch: don't re-attempt the doomed allocation per image in
                # batch runs over equally huge inputs (window kept on the
                # model's downshuffle grid and above 2*overlap — the
                # overlap was never validated against a window in
                # whole-image mode)
                w = max(96, 2 * self.overlap + 2)
                self.window = -(-w // self._grid) * self._grid
        return upscale_tiled(
            self.deployed, image_u8,
            window=self.window or 96, overlap=self.overlap,
            batch_size=self.batch_size, sharding=self._chunk_sharding,
            grid=self._grid,
        )

    def _upscale_spatial(self, image_u8: np.ndarray) -> np.ndarray:
        """Row-band sharding with halo exchange over the tile mesh axis."""
        from ..parallel.spatial import spatial_apply

        spec = self.deployed.spec
        mesh = self._spatial_mesh
        n_tile = self.spatial_devices
        halo = max(self.overlap, 8)
        h, w = image_u8.shape[:2]
        # Pad rows so H divides the tile axis (band > halo for reflect halos).
        band = -(-h // n_tile)
        band = max(band, halo + 1)
        ph = band * n_tile
        _check_reflect_fit((h,), (ph - h,), f"spatial_devices={n_tile}", halo)
        padded = np.pad(
            image_u8, ((0, ph - h), (0, 0), (0, 0)), mode="reflect"
        )
        # raw_apply IS the deployed graph (normalize -> layout-matching model
        # -> tanh_to_uint8): the single definition serves the plain, 1-D, and
        # 2-D paths, so deploy-time changes can never diverge between them.
        out = spatial_apply(
            self.deployed.raw_apply, self.deployed.params,
            jnp.asarray(padded[None]), mesh, halo=halo,
            scale=spec.output_scale,
        )
        s = spec.output_scale
        return np.asarray(out[0])[: h * s, : w * s]

    def _upscale_spatial_2d(self, image_u8: np.ndarray) -> np.ndarray:
        """2-D (tile_y, tile_x) grid sharding with halo exchange in both
        dimensions (parallel/spatial.py spatial_apply_2d)."""
        from ..parallel.spatial import spatial_apply_2d

        spec = self.deployed.spec
        mesh = self._spatial_mesh_2d
        ny, nx = self.spatial_grid
        halo = max(self.overlap, 8)
        h, w = image_u8.shape[:2]
        band_h = max(-(-h // ny), halo + 1)
        band_w = max(-(-w // nx), halo + 1)
        _check_reflect_fit(
            (h, w), (band_h * ny - h, band_w * nx - w),
            f"spatial_grid=({ny}, {nx})", halo,
        )
        padded = np.pad(
            image_u8,
            ((0, band_h * ny - h), (0, band_w * nx - w), (0, 0)),
            mode="reflect",
        )
        out = spatial_apply_2d(
            self.deployed.raw_apply, self.deployed.params,
            jnp.asarray(padded[None]), mesh, halo=halo,
            scale=spec.output_scale,
        )
        s = spec.output_scale
        return np.asarray(out[0])[: h * s, : w * s]
