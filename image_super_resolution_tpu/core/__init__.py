from .mesh import make_mesh, local_mesh, batch_sharding, replicated_sharding
from .precision import Policy, DEFAULT_POLICY

__all__ = [
    "make_mesh",
    "local_mesh",
    "batch_sharding",
    "replicated_sharding",
    "Policy",
    "DEFAULT_POLICY",
]
