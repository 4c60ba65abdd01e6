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


class TiledUpscaler:
    def __init__(
        self,
        deployed: DeployedModel,
        window: int = 96,
        overlap: int = 8,
        batch_size: int = 8,
        spatial_devices: int = 1,
    ):
        """window=0 selects whole-image (untiled) inference — fastest when
        the image fits HBM (no overlap recompute, one dispatch)."""
        self.deployed = deployed
        self.window = window
        self.overlap = overlap
        self.batch_size = batch_size
        self.spatial_devices = spatial_devices
        self._spatial_mesh = None
        if spatial_devices > 1:
            from ..core.mesh import make_mesh

            self._spatial_mesh = make_mesh(n_data=1, n_tile=spatial_devices)

    # -- whole frames (video path): fixed shape, one compiled program -------
    def upscale_batch(self, batch_u8: np.ndarray) -> np.ndarray:
        """uint8 NHWC RGB -> uint8 NHWC RGB at the model scale."""
        return np.asarray(self.deployed(jnp.asarray(batch_u8)))

    # -- arbitrary-size single images: overlap tiling ------------------------
    def upscale_image(self, image_u8: np.ndarray) -> np.ndarray:
        """uint8 HWC RGB of any size -> uint8 HWC RGB."""
        if self._spatial_mesh is not None:
            return self._upscale_spatial(image_u8)
        if self.window == 0:  # whole-image mode
            try:
                return np.asarray(self.deployed(jnp.asarray(image_u8[None])))[0]
            except Exception as e:  # HBM OOM on huge images: tile instead
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
                # batch runs over equally huge inputs
                self.window = 96
        return upscale_tiled(
            self.deployed, image_u8,
            window=self.window or 96, overlap=self.overlap, batch_size=self.batch_size,
        )

    def _upscale_spatial(self, image_u8: np.ndarray) -> np.ndarray:
        """Row-band sharding with halo exchange over the tile mesh axis."""
        from ..data.transforms import normalize, tanh_to_uint8
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
        padded = np.pad(
            image_u8, ((0, ph - h), (0, 0), (0, 0)), mode="reflect"
        )
        mean = tuple(float(v) for v in spec.mean)
        std = tuple(float(v) for v in spec.std)
        # The module matching self.deployed.params' layout — the params are in
        # the optimized scatter/tail-folded form when optimize=True, so
        # rebuilding the standard graph here would mismatch (round-1 bug).
        model = self.deployed.model

        def net_apply(params, u8):
            x = normalize(u8, mean, std)
            return tanh_to_uint8(model.apply({"params": params}, x))

        out = spatial_apply(
            net_apply, self.deployed.params, jnp.asarray(padded[None]),
            mesh, halo=halo, scale=spec.output_scale,
        )
        s = spec.output_scale
        return np.asarray(out[0])[: h * s, : w * s]
