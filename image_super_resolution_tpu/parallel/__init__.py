from ..core.mesh import (
    DATA_AXIS,
    TILE_AXIS,
    batch_sharding,
    local_mesh,
    make_mesh,
    replicated_sharding,
    spatial_sharding,
)
from .spatial import spatial_apply
from .tensor import tp_conv

__all__ = [
    "DATA_AXIS",
    "TILE_AXIS",
    "batch_sharding",
    "local_mesh",
    "make_mesh",
    "replicated_sharding",
    "spatial_sharding",
    "spatial_apply",
    "tp_conv",
]
